"""Local replica of the driver's t2 oracle comparison.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables, then compares row count + sorted-column-name schema +
order-insensitive values — the same contract CORRECTNESS_r{N}.json
grades, so a green run here predicts a green driver run.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from dynamodb_streaming_datalake_spark.sources.readers import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # exact float identity is the goal; repr keeps full precision
        return repr(v)
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = df[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in out.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple("" if v is None else v for v in r))


def compare_query(spark, sf_dir: str, name: str, query_fn, oracle_sql: str):
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    try:
        duck_pdf = con.execute(oracle_sql).df()
    finally:
        con.close()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    s_rows = canonicalize(spark_pdf)
    d_rows = canonicalize(duck_pdf)
    if s_rows != d_rows:
        diff = [
            (a, b) for a, b in zip(s_rows, d_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diff}")
