"""Data-quality report: oracle parity, and proof the checks actually
COUNT violations (clean fixtures alone would let a constant-zero
report pass)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.quality import (
    fk_contained,
    pk_unique,
    predicate,
    q_data_quality_report,
)
from dynamodb_streaming_datalake_spark.registry import ORACLE
from tests.oracle_utils import compare_query


def test_q_data_quality_report_oracle_parity(spark, sf_smoke):
    compare_query(
        spark, sf_smoke, "q_data_quality_report", q_data_quality_report,
        ORACLE["q_data_quality_report"],
    )


def test_checks_count_injected_violations(spark):
    """Each check builder must report exact violation counts on dirty
    synthetic inputs — 3 duplicate keys, 2 orphans, 4 bad values."""
    dirty = spark.createDataFrame(
        [(1,), (1,), (2,), (2,), (3,), (3,), (4,)], "k long"
    )
    r = pk_unique(dirty, "t", "k").collect()[0]
    assert (r["n_checked"], r["n_violations"]) == (7, 3)

    child = spark.createDataFrame([(1,), (2,), (8,), (9,)], "ck long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = fk_contained(child, "ck", parent, "pk", "fk", "t").collect()[0]
    assert (r["n_checked"], r["n_violations"]) == (4, 2)

    vals = spark.createDataFrame(
        [(-1.0,), (-2.0,), (0.0,), (5.0,), (-0.5,), (-9.0,)], "v double"
    )
    r = predicate(vals, F.col("v") < 0, "nonneg", "t").collect()[0]
    assert (r["n_checked"], r["n_violations"]) == (6, 4)


def test_report_is_all_green_on_driver_fixtures(spark, sf_smoke):
    """The shipped fixtures satisfy every constraint (and the report
    carries real checked-row counts, not zeros)."""
    rows = q_data_quality_report(spark, sf_smoke).collect()
    assert len(rows) == 7
    assert all(r["n_violations"] == 0 for r in rows)
    assert all(r["n_checked"] > 0 for r in rows)
