"""Registry integrity: the PRIORITY window is part of the proof surface
(the driver checks exactly the first 50 of all_queries()), so a typo'd
name must fail loudly, not silently fall out of the ordering."""

from __future__ import annotations

from dynamodb_streaming_datalake_spark.registry import (
    PRIORITY,
    all_oracle_sql,
    all_queries,
)


def test_priority_names_are_registered_and_unique():
    q = all_queries()
    missing = [n for n in PRIORITY if n not in q]
    assert not missing, f"PRIORITY names not in registry: {missing}"
    assert len(set(PRIORITY)) == len(PRIORITY), "duplicate PRIORITY names"


def test_every_query_has_oracle_sql():
    """The repo's standing bar: zero rows-only entries — every operator
    is value-hash-checkable against DuckDB."""
    q, o = all_queries(), all_oracle_sql()
    assert set(q) == set(o), set(q) ^ set(o)


def test_window_prefers_unproven_queries():
    """Round-5 rotation: the 44 queries whose most recent driver row is
    rounds 1-2 must sit inside the driver's 50-row window (their proof had
    gone stale); round-4's freshly-proven additions rotate to the tail."""
    names = list(all_queries())[:50]
    for n in (
        "q2_min_cost_supplier",
        "q9_product_profit",
        "q18_large_volume_customers",
        "q_asof_join",
        "q_range_join_clicks",
        "q_pivot_event_matrix",
        "q_funnel_conversion",
        "q_distinct_counts",
        "q_sql_entrypoint",
        "q_histogram_value",
    ):
        assert n in names, n
    for n in ("q_dedup_embedding_trained", "q_corpus_curation"):
        assert n not in names, f"{n} should have rotated out of the window"
