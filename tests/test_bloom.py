"""Bloom pre-join mechanics: no false negatives ever, pruning actually
prunes, and the operator is result-invisible vs the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.bloom import (
    bloom_build,
    bloom_prejoin,
    bloom_prune,
)
from dynamodb_streaming_datalake_spark.sources.readers import read_table


def test_bloom_has_no_false_negatives(spark, sf_smoke):
    """Every inserted key must test positive — a bloom filter's one hard
    guarantee."""
    orders = read_table(spark, sf_smoke, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    bitmap = bloom_build(orders.select("o_orderkey"), "o_orderkey")
    kept = bloom_prune(orders, "o_orderkey", bitmap).count()
    assert kept == orders.count()


def test_bloom_prunes_most_non_members(spark, sf_smoke):
    """With 8 KB / 3 hashes over the fixture's dim the FP rate must be
    tiny: the pruned fact should be close to the exact semi-join size."""
    orders = read_table(spark, sf_smoke, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = read_table(spark, sf_smoke, "lineitem")
    bitmap = bloom_build(orders.select("o_orderkey"), "o_orderkey")
    pruned = bloom_prune(li, "l_orderkey", bitmap).count()
    exact = li.join(
        orders.select("o_orderkey"),
        li["l_orderkey"] == orders["o_orderkey"],
        "left_semi",
    ).count()
    total = li.count()
    assert pruned >= exact  # superset (no false negatives)
    # prunes the clear majority of non-members
    assert (pruned - exact) <= max(10, int(0.05 * (total - exact)))


def test_bloom_prejoin_equals_plain_join(spark, sf_smoke):
    """The operator contract: bloom pruning is result-invisible."""
    orders = read_table(spark, sf_smoke, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = read_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    dim = orders.select("o_orderkey")
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in bloom_prejoin(li, dim, "l_orderkey", "o_orderkey").collect()
    )
    want = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.join(dim, li["l_orderkey"] == dim["o_orderkey"]).collect()
    )
    assert got == want and len(got) > 0


def test_bloom_probe_never_shuffles_the_fact(spark, sf_smoke):
    """The membership probes are broadcast word-table lookups: the fact
    side must reach the filter with NO shuffle exchange and no
    sort-merge join — only tiny BroadcastHashJoins."""
    li = read_table(spark, sf_smoke, "lineitem").select("l_orderkey")
    orders = read_table(spark, sf_smoke, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    bitmap = bloom_build(orders.select("o_orderkey"), "o_orderkey")
    plan = (
        bloom_prune(li, "l_orderkey", bitmap)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan
