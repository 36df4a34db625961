"""Hybrid retrieval (BM25 + dense cosine, RRF fusion): oracle parity,
fusion semantics, and the bounded-window scale shape."""

from __future__ import annotations

from dynamodb_streaming_datalake_spark.operators.similarity import (
    HY_LIST,
    HY_TOP,
    q_hybrid_search,
)
from dynamodb_streaming_datalake_spark.registry import ORACLE
from tests.oracle_utils import compare_query


def test_q_hybrid_search_oracle_parity(spark, sf_smoke):
    compare_query(
        spark, sf_smoke, "q_hybrid_search", q_hybrid_search,
        ORACLE["q_hybrid_search"],
    )


def test_hybrid_fusion_semantics(spark, sf_smoke):
    """RRF invariants: exactly HY_TOP rows; rrf descending; every row
    appears in at least one list (rank 0 means absent, never both);
    a doc present in BOTH lists scores above the best single-list-only
    doc at comparable ranks."""
    rows = q_hybrid_search(spark, sf_smoke).collect()
    assert len(rows) == HY_TOP
    rrfs = [r["rrf"] for r in rows]
    assert rrfs == sorted(rrfs, reverse=True)
    for r in rows:
        assert 0 <= r["lex_rank"] <= HY_LIST
        assert 0 <= r["dense_rank"] <= HY_LIST
        assert r["lex_rank"] > 0 or r["dense_rank"] > 0
    both = [r for r in rows if r["lex_rank"] > 0 and r["dense_rank"] > 0]
    only = [r for r in rows if (r["lex_rank"] > 0) != (r["dense_rank"] > 0)]
    if both and only:
        # 1/(K+1) + 1/(K+L) > 1/(K+1): any doc in both lists beats a
        # single-list doc whose one rank is no better than both of its
        for b in both:
            for o in only:
                o_rank = max(o["lex_rank"], o["dense_rank"])
                if o_rank >= max(b["lex_rank"], b["dense_rank"]):
                    assert b["rrf"] > o["rrf"]


def test_hybrid_plan_uses_bounded_topk(spark, sf_smoke):
    """Scale shape: candidate lists come from TakeOrderedAndProject
    (distributed partial top-k), not a global Sort feeding a window
    over the whole corpus."""
    plan = q_hybrid_search(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_kcenter_seeds_are_genuinely_diverse(spark, sf_smoke):
    """Structural k-center properties: ranks 1..8, distinct seeds, the
    selection distances are non-increasing (each new pick is the
    farthest remaining, so the max-min radius shrinks monotonically),
    and the greedy picks are more spread than the first-8-by-id
    baseline (mean pairwise cosine distance strictly larger)."""
    import numpy as np

    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    rows = sorted(
        all_queries()["q_kcenter_seeds"](spark, sf_smoke).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, 9))
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 8
    d = [r["min_dist_at_selection"] for r in rows[1:]]
    assert d == sorted(d, reverse=True)

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in read_table(spark, sf_smoke, "embeddings").collect()
    }

    def mean_pairwise_dist(vecs):
        ds = []
        for i in range(len(vecs)):
            for j in range(i + 1, len(vecs)):
                a, b = vecs[i], vecs[j]
                ds.append(
                    1 - a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
                )
        return sum(ds) / len(ds)

    greedy = mean_pairwise_dist([emb[i] for i in ids])
    baseline = mean_pairwise_dist(
        [emb[i] for i in sorted(emb)[:8]]
    )
    assert greedy > baseline
