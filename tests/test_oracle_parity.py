"""Every registered query vs its DuckDB oracle at sf0.001 (fast) —
the local twin of the driver's sf0.01 t2 gate."""

from __future__ import annotations

import pytest

from dynamodb_streaming_datalake_spark.registry import all_oracle_sql, all_queries
from tests.oracle_utils import compare_query

QUERIES = all_queries()
ORACLE = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, sf_smoke, name):
    if name not in ORACLE:
        # rows-only contract: just prove it runs and returns a schema
        df = QUERIES[name](spark, sf_smoke)
        assert df.columns
        df.limit(5).collect()
        return
    compare_query(spark, sf_smoke, name, QUERIES[name], ORACLE[name])


@pytest.mark.oracle_full
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity_sf001(spark, sf_oracle, name):
    """Same comparison at sf0.01 — the exact scale the driver gate runs.

    Opt-in (``pytest -m oracle_full``): slower, but catches float/tie-break
    divergences that only appear beyond the sf0.001 smoke fixture. Run this
    once before any registry freeze / snapshot.
    """
    if name not in ORACLE:
        df = QUERIES[name](spark, sf_oracle)
        assert df.columns
        df.limit(5).collect()
        return
    compare_query(spark, sf_oracle, name, QUERIES[name], ORACLE[name])
