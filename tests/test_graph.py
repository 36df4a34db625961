"""PageRank: fixed-point cross-engine exactness, rank-mass invariants,
and the per-iteration join shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.graph import (
    PR_ITERS,
    PR_SCALE,
    PR_TOP,
    _trade_edges,
    pagerank,
    q_pagerank,
)
from dynamodb_streaming_datalake_spark.registry import ORACLE
from tests.oracle_utils import compare_query


def test_q_pagerank_oracle_parity(spark, sf_smoke):
    compare_query(
        spark, sf_smoke, "q_pagerank", q_pagerank, ORACLE["q_pagerank"]
    )


def test_pagerank_mass_and_shape(spark, sf_smoke):
    """Total fixed-point rank mass stays within the floor-division leak
    bound of PR_SCALE, every rank is positive, and the top list is
    exactly PR_TOP rows in strictly ordered (rank desc, node)."""
    edges = _trade_edges(spark, sf_smoke)
    ranks = pagerank(edges).collect()
    n = len(ranks)
    total = sum(r["rank_fp"] for r in ranks)
    # each of the PR_ITERS iterations can leak < 1 unit per node per
    # division (contrib floor + damp floor + base floor)
    leak_bound = PR_ITERS * 3 * n + n
    assert 0 < total <= PR_SCALE
    assert total >= PR_SCALE - leak_bound * 10  # generous integer bound
    assert all(r["rank_fp"] > 0 for r in ranks)

    top = q_pagerank(spark, sf_smoke).collect()
    assert len(top) == PR_TOP
    keys = [(-r["rank_fp"], r["node"]) for r in top]
    assert keys == sorted(keys)


def test_pagerank_is_partitioning_invariant(spark, sf_smoke):
    """The fixed-point claim: values are independent of physical
    partitioning (the thing IEEE-double PageRank cannot promise)."""
    edges = _trade_edges(spark, sf_smoke)
    a = {r["node"]: r["rank_fp"] for r in pagerank(edges).collect()}
    b = {
        r["node"]: r["rank_fp"]
        for r in pagerank(edges.repartition(7, "dst")).collect()
    }
    assert a == b


def test_pagerank_favors_high_degree_nodes(spark, sf_smoke):
    """Sanity: the max-degree node's rank is above the mean rank."""
    edges = _trade_edges(spark, sf_smoke)
    deg = (
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        .orderBy(F.col("d").desc(), "src")
    )
    top_node = deg.first()["src"]
    ranks = {r["node"]: r["rank_fp"] for r in pagerank(edges).collect()}
    mean = sum(ranks.values()) / len(ranks)
    assert ranks[top_node] > mean


def test_q_triangle_count_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.graph import (
        q_triangle_count,
    )
    from dynamodb_streaming_datalake_spark.registry import ORACLE

    compare_query(
        spark, sf_smoke, "q_triangle_count", q_triangle_count,
        ORACLE["q_triangle_count"],
    )


def test_triangle_count_on_known_graph(spark, sf_smoke):
    """Hand-checkable pin: a K4 plus a pendant edge has exactly 4
    triangles, each K4 node in 3 of them — built as 'orders' whose
    co-purchase pairs realize exactly that edge set. K4 edges get two
    orders each (passing the support prune); the pendant edge gets
    only one and must be pruned away entirely."""
    from dynamodb_streaming_datalake_spark.operators.graph import (
        TRI_MIN_COOCCUR,
        q_triangle_count,
    )

    assert TRI_MIN_COOCCUR == 2  # the fixture plants exactly 2 orders
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    rows = [
        (10 * ok + rep, p)
        for ok, (u, v) in enumerate(edges)
        for rep in (0, 1)           # two orders per K4 edge
        for p in (u, v)
    ]
    rows += [(999, 4), (999, 5)]    # pendant edge, ONE order: pruned
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    import os

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        # q_triangle_count reads lineitem from an sf_dir; fabricate one
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        got = {
            (r["part_key"], r["n_triangles"], r["total_triangles"])
            for r in q_triangle_count(spark, d).collect()
        }
    assert got == {(1, 3, 4), (2, 3, 4), (3, 3, 4), (4, 3, 4)}


def test_link_prediction_returns_only_nonedges(spark, sf_smoke):
    """Every predicted pair must be absent from the support-pruned
    edge set (in either orientation), meet the common-neighbor floor,
    and carry a Jaccard in (0, 1]."""
    from dynamodb_streaming_datalake_spark.operators.graph import (
        LP_MIN_CN,
        TRI_MIN_COOCCUR,
        q_link_prediction,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    li = read_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = {
        (r["u"], r["v"])
        for r in (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .groupBy(
                F.col("a.l_partkey").alias("u"),
                F.col("b.l_partkey").alias("v"),
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= TRI_MIN_COOCCUR)
            .collect()
        )
    }
    for r in q_link_prediction(spark, sf_smoke).collect():
        pair = (r["part_a"], r["part_b"])
        assert pair not in edges and pair[::-1] not in edges
        assert r["common_neighbors"] >= LP_MIN_CN
        assert 0 < r["jaccard"] <= 1


def test_hits_fixture_and_invariants(spark, sf_smoke):
    """HITS semantics on a hand-checkable fixture plus corpus
    invariants. Fixture: c1 buys from s1 and s2, c2 buys only from s1
    — s1 must out-rank s2 (bought by both), c1 must out-rank c2 (buys
    from more/better suppliers), and each side's maximum sits exactly
    at HITS_SCALE (the normalization contract)."""
    from dynamodb_streaming_datalake_spark.operators.graph import (
        HITS_SCALE,
        hits,
    )
    from dynamodb_streaming_datalake_spark.registry import all_queries

    edges = spark.createDataFrame(
        [("c1", "s1"), ("c1", "s2"), ("c2", "s1")], "src string, dst string"
    )
    got = {(r["side"], r["node"]): r["score_fp"] for r in hits(edges).collect()}
    assert got[("authority", "s1")] == HITS_SCALE
    assert got[("hub", "c1")] == HITS_SCALE
    assert got[("authority", "s2")] < got[("authority", "s1")]
    assert got[("hub", "c2")] < got[("hub", "c1")]

    rows = all_queries()["q_hits"](spark, sf_smoke).collect()
    sides = {r["side"] for r in rows}
    assert sides == {"hub", "authority"}
    for side in sides:
        scores = [r["score_fp"] for r in rows if r["side"] == side]
        assert max(scores) == HITS_SCALE
        assert all(0 <= s <= HITS_SCALE for s in scores)
        assert scores == sorted(scores, reverse=True)


def test_copurchase_pairs_matches_self_join_multiset(spark):
    """The round-17 in-row pair expansion must reproduce the lineitem
    self-join's pair MULTISET exactly — including the multiplicity a
    duplicated part key inside one order creates ((#p in order) * (#q
    in order) rows per p < q), which the sf corpora never exercise.
    Order 1 holds parts [5, 5, 7, 9]: the join emits (5,7) twice,
    (5,9) twice, (7,9) once; order 2's lone row emits nothing; order
    3's identical-part pair [4, 4] emits nothing (x < y never holds)."""
    from dynamodb_streaming_datalake_spark.operators.graph import (
        copurchase_pairs,
    )

    rows = [(1, 5), (1, 5), (1, 7), (1, 9), (2, 3), (3, 4), (3, 4)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")

    a, b = li.alias("a"), li.alias("b")
    joined = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    inrow = copurchase_pairs(li).groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    want = {(r["u"], r["v"]): r["c"] for r in joined.collect()}
    got = {(r["u"], r["v"]): r["c"] for r in inrow.collect()}
    assert want == {(5, 7): 2, (5, 9): 2, (7, 9): 1}
    assert got == want
