"""Query registry: the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a named
query ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__`` simply re-exports these
dicts, and ``tests/test_oracle_parity.py`` replays the exact driver
comparison locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query recipe; ``oracle`` is DuckDB SQL over the
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings). Omit oracle only for
    genuinely non-SQL-expressible ops (driver then does rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run."""
    import dynamodb_streaming_datalake_spark.operators.relational  # noqa: F401
    import dynamodb_streaming_datalake_spark.operators.state  # noqa: F401

    for mod in (
        "cdc_zone",
        "tpch_ext",
        "analytics_ext",
        "dedup",
        "similarity",
        "text",
        "multimodal",
        "udf",
        "sampling",
        "contamination",
        "privacy",
    ):
        try:
            __import__(f"dynamodb_streaming_datalake_spark.operators.{mod}")
        except ImportError:
            pass
    try:
        import dynamodb_streaming_datalake_spark.streaming.windows  # noqa: F401
    except ImportError:
        pass


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracle_sql() -> dict[str, str]:
    load_all()
    return dict(ORACLE)
