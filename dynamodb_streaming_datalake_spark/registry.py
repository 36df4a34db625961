"""Query registry: the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a named
query ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__`` simply re-exports these
dicts, and ``tests/test_oracle_parity.py`` replays the exact driver
comparison locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Deliberate driver-facing ordering. The driver's CORRECTNESS gate records
# exactly the first 50 entries of ``all_queries()``, so ordering is part of
# the proof surface, not cosmetics: rounds 1-2 proved positions 1-50 (the
# relational/CDC core) twice while the LLM-pipeline surface (dedup, ANN,
# text, multimodal, sampling, privacy, streaming windows) sat unchecked at
# 51+. Round 3 put those never-checked queries first; round 4 inserted its
# six new queries (trained IVF, filtered ANN, quantize, token budget,
# curation, stateful twin) inside the window, ejecting only twice-proven
# anchors. Rotation rule for future rounds: UNPROVEN first, once-proven
# next, twice-proven tail last — rotate twice-proven window members out to
# make room, never the converse. Names not listed here order after the
# listed ones, in registration order — so a future registration can never
# silently eject a listed query from the window.
PRIORITY: tuple[str, ...] = (
    # -- 1-36: never driver-checked through round 2 --------------------
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_simhash_pairs",
    "q_dedup_embedding",
    "q_dedup_embedding_trained",  # new in round 4 — unproven first
    "q_dedup_clusters",
    "q_dedup_apply",
    "q_dedup_apply_clustered",
    "q_ann_topk",
    "q_ann_lsh",
    "q_ann_ivf",
    "q_ann_filtered",  # new in round 4 — unproven first
    "q_kmeans",
    "q_text_stats",
    "q_text_langid",
    "q_text_fingerprint",
    "q_text_repetition",
    "q_doc_chunks",  # new in round 4 — unproven first
    "q_lang_distribution",
    "q_media_decode",
    "q_media_frame_stats",
    "q_media_audio_stats",
    "q_udf_vector_norms",
    "q_embedding_quantize",  # new in round 4 — unproven first
    "q_sample_deterministic",
    "q_training_mix",
    "q_token_budget",  # new in round 4 — unproven first
    "q_decontaminate",
    "q_corpus_curation",  # new in round 4 — unproven first
    "q_k_anonymize",
    "q_pii_redact",
    "q_window_tumbling",
    "q_window_sliding",
    "q_window_session",
    "q_window_time_range",
    "q_grouping_sets",
    "q_unpivot_event_matrix",  # new in round 4 — unproven first
    "q_sessionize",
    "q_user_last_event",
    "q_user_value_deciles",
    "q_gap_fill_hourly",
    # -- 37-50: core anchors, one per operator family ------------------
    "q1_pricing_summary",        # hash agg + partial/final
    "q3_shipping_priority",      # multi-join + top-k
    "q_cdc_zone_roundtrip",      # A3-A9 CDC lifecycle + pruned read
    "q_stateful_latest_state",   # new in round 4 — B19 driver row
    "q_latest_state_per_key",    # B6 latest-state dedup
    "q_merge_snapshot_cdc",      # B7 snapshot ⊕ CDC merge
    "q_scd2_intervals",          # window-based SCD2
    "q_customers_without_orders",  # anti join
    "q_rollup_events",           # rollup
    "q_user_event_history",      # window functions
    "q_topk_orders",             # TakeOrderedAndProject
    "q_set_reconcile_customers",  # set ops
    "q_json_props",              # JSON fns
    "q_top_words",               # array/map HOFs
    "q_sql_entrypoint",          # SQL surface
)


def _ordered(d: dict) -> dict:
    listed = [n for n in PRIORITY if n in d]
    rest = [n for n in d if n not in set(PRIORITY)]
    return {n: d[n] for n in (*listed, *rest)}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query recipe; ``oracle`` is DuckDB SQL over the
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings). Omit oracle only for
    genuinely non-SQL-expressible ops (driver then does rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run."""
    import dynamodb_streaming_datalake_spark.operators.relational  # noqa: F401
    import dynamodb_streaming_datalake_spark.operators.state  # noqa: F401

    for mod in (
        "cdc_zone",
        "tpch_ext",
        "analytics_ext",
        "dedup",
        "similarity",
        "text",
        "multimodal",
        "udf",
        "sampling",
        "contamination",
        "privacy",
        "curation",
    ):
        try:
            __import__(f"dynamodb_streaming_datalake_spark.operators.{mod}")
        except ImportError:
            pass
    try:
        import dynamodb_streaming_datalake_spark.streaming.windows  # noqa: F401
    except ImportError:
        pass


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return _ordered(QUERIES)


def all_oracle_sql() -> dict[str, str]:
    load_all()
    return _ordered(ORACLE)
