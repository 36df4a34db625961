"""Sketch-operator invariants that the oracle hash can't express:
mergeability (the whole point of a sketch in a sharded lake) and the
one-sided / bounded error contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.sketches import (
    HLL_M,
    cms_build,
    q_cms_heavy_hitters,
    q_hll_distinct,
)
from dynamodb_streaming_datalake_spark.sources.readers import read_table


def _cells(df) -> dict:
    return {(r["depth"], r["col"]): r["cnt"] for r in df.collect()}


def test_cms_sketch_is_mergeable(spark, sf_smoke):
    """Sharded build: sketch(A) + sketch(B) cell-summed == sketch(A∪B).
    This is the property that lets per-day shards merge without raw
    re-scans; it holds exactly, not approximately."""
    ev = read_table(spark, sf_smoke, "events")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged = (
        cms_build(a, "user_id")
        .unionByName(cms_build(b, "user_id"))
        .groupBy("depth", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert _cells(merged) == _cells(cms_build(ev, "user_id"))


def test_cms_error_is_one_sided(spark, sf_smoke):
    """CMS never undercounts: est >= exact on every reported key."""
    rows = q_cms_heavy_hitters(spark, sf_smoke).collect()
    assert rows
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)


def test_hll_estimate_within_tolerance(spark, sf_smoke):
    """Raw HLL with m=512 has ~1.04/sqrt(m) ≈ 4.6% std error; assert a
    generous 3-sigma band against the exact count computed in the same
    result row."""
    row = q_hll_distinct(spark, sf_smoke).first()
    assert row["n_registers"] == HLL_M
    rel = abs(row["hll_estimate"] - row["exact_distinct"]) / row["exact_distinct"]
    assert rel < 0.15, (row["hll_estimate"], row["exact_distinct"])
