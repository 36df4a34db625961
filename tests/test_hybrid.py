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
