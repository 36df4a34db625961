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
    """Round-6 rotation: the nine round-5 additions that never got a driver
    row must LEAD the 50-row window, followed by the round-4-proven cohort
    whose proof is now the stalest; round-5's freshly-proven 50 rotate to
    the tail."""
    names = list(all_queries())[:50]
    never_proven = (
        "q_salted_join",
        "q_pq_quantize",
        "q_ann_pq",
        "q_media_bmp",
        "q_ann_pq_rerank",
        "q_doc_cdc_chunks",
        "q_zorder_scan",
        "q_mvcc_timetravel",
        "q_compact_scan",
    )
    for i, n in enumerate(never_proven):
        assert names[i] == n, f"position {i}: expected {n}, got {names[i]}"
    # every round-6 registration (never driver-checked) must sit inside
    # the window, ahead of any re-proof — find them structurally: they
    # are the PRIORITY entries between the r5 block and q_dedup_exact
    # (the start of the r4 re-proof cohort)
    r4_start = PRIORITY.index("q_dedup_exact")
    r6_new = PRIORITY[len(never_proven):r4_start]
    assert len(r6_new) >= 7
    for n in r6_new:
        assert n in names, f"{n} (new this round) should be in window"
    # remaining slots go to the stalest (r4-proven) cohort, in order
    n_left = 50 - len(never_proven) - len(r6_new)
    assert names[-n_left:] == list(PRIORITY[r4_start:r4_start + n_left])
    for n in ("q_tfidf_terms", "q_bloom_prejoin", "q_sql_entrypoint",
              "q_histogram_value"):
        assert n not in names, f"{n} (r5-proven) should have rotated out"
