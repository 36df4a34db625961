"""Physical-plan assertions for the extended TPC-H and event-analytics
queries — each new operator's scale claim, verified on the real plan."""

from __future__ import annotations

from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
    q_asof_join,
    q_pivot_event_matrix,
    q_range_join_clicks,
)
from dynamodb_streaming_datalake_spark.operators.tpch_ext import (
    q7_volume_shipping,
    q9_product_profit,
    q10_returned_items,
    q19_disjunctive_revenue,
    q22_idle_rich_customers,
)
from dynamodb_streaming_datalake_spark.plans import explain_str, has_node


def test_q9_q19_dims_broadcast_no_fact_shuffle(spark, sf_oracle):
    """Q9/Q19 join lineitem only against dimensions: every join must be
    broadcast — an SMJ would shuffle the full fact table for a dim."""
    for q in (q9_product_profit, q19_disjunctive_revenue):
        df = q(spark, sf_oracle)
        assert has_node(df, "BroadcastHashJoin"), explain_str(df)
        assert not has_node(df, "SortMergeJoin"), explain_str(df)


def test_q7_nation_pair_prunes_before_fact_join(spark, sf_oracle):
    """Q7's supplier/customer/nation lookups broadcast; only the
    orders<->lineitem fact join may shuffle."""
    df = q7_volume_shipping(spark, sf_oracle)
    p = explain_str(df)
    assert p.count("BroadcastHashJoin") >= 3, p
    assert not has_node(df, "CartesianProduct"), p


def test_q10_topk_is_take_ordered(spark, sf_oracle):
    assert has_node(q10_returned_items(spark, sf_oracle), "TakeOrderedAndProject")


def test_q22_anti_join_and_scalar_broadcast(spark, sf_oracle):
    """The NOT EXISTS is a left-anti join; the AVG threshold arrives as
    a broadcast, never via a driver collect."""
    p = explain_str(q22_idle_rich_customers(spark, sf_oracle))
    assert "LeftAnti" in p, p
    assert "Broadcast" in p, p


def test_range_join_is_equi_not_nested_loop(spark, sf_oracle):
    """The bucketed rewrite must plan as a hash/sort-merge equi-join on
    (user_id, bucket) — a raw time-band theta join would fall back to
    BroadcastNestedLoopJoin, which is quadratic and unusable at scale."""
    df = q_range_join_clicks(spark, sf_oracle)
    p = explain_str(df)
    assert not has_node(df, "BroadcastNestedLoopJoin"), p
    assert not has_node(df, "CartesianProduct"), p


def test_asof_join_is_single_user_partitioning(spark, sf_oracle):
    """The as-of composition is union + one window over user_id: no
    join node at all, and exactly one hash exchange (user_id) feeds the
    sort-within-partition."""
    df = q_asof_join(spark, sf_oracle)
    p = explain_str(df)
    assert has_node(df, "Window"), p
    assert "Join" not in p, p
    simple = explain_str(df, "simple")
    assert simple.count("Exchange hashpartitioning") == 1, simple


def test_pivot_is_single_aggregate(spark, sf_oracle):
    """A declared-value pivot compiles to one partial+final aggregate —
    no extra distinct-discovery pass, no join."""
    df = q_pivot_event_matrix(spark, sf_oracle)
    p = explain_str(df)
    assert p.count("HashAggregate") >= 2, p
    assert "Join" not in p, p


def test_quantize_is_map_only_no_exchange(spark, sf_oracle):
    """int8 quantization is row-local HOFs end to end: any Exchange in
    the plan means an accidental shuffle crept into a map-only pass."""
    from dynamodb_streaming_datalake_spark.operators.similarity import (
        q_embedding_quantize,
    )

    df = q_embedding_quantize(spark, sf_oracle)
    p = explain_str(df)
    assert "Exchange" not in p, p
    assert not has_node(df, "BatchEvalPython"), p


def test_token_budget_no_global_per_lang_sort(spark, sf_oracle):
    """The prefix sum must window on (lang, block), never lang alone —
    a global per-lang sort funnels a whole language through one
    reducer. Every Sort's partition spec must include block."""
    import re

    from dynamodb_streaming_datalake_spark.operators.sampling import (
        q_token_budget,
    )

    df = q_token_budget(spark, sf_oracle)
    p = explain_str(df)
    # the doc-level window (ordered by bucket/doc_id) must partition by
    # lang AND block; the only lang-alone window allowed is over the
    # tiny block-sums table (ordered by block)
    specs = re.findall(
        r"windowspecdefinition.*?\], \[([^\]]*)\], \[([^\]]*)\]", p
    )
    doc_windows = [
        part for part, order in specs if "bucket" in order or "doc_id" in order
    ]
    assert doc_windows, p
    for part in doc_windows:
        assert "block" in part, (part, p)


def test_curation_anti_joins_broadcast(spark, sf_oracle):
    """Both exclusion sets (LSH losers, contaminated docs) are small by
    construction and must arrive as broadcast anti-joins, never a
    shuffled SMJ of the corpus against them."""
    from dynamodb_streaming_datalake_spark.operators.curation import (
        q_corpus_curation,
    )

    df = q_corpus_curation(spark, sf_oracle)
    p = explain_str(df)
    assert p.count("BroadcastHashJoin") + p.count(
        "BroadcastNestedLoop"
    ) >= 2 or "LeftAnti" in p, p
    assert "CartesianProduct" not in p, p


def test_tfidf_df_join_is_broadcast(spark, sf_oracle):
    """TF-IDF's df-side join is vocabulary-sized — it must broadcast;
    a shuffled join here would re-exchange the tf frame for a frame
    that is vocab-small at any corpus scale."""
    from dynamodb_streaming_datalake_spark.operators.text import q_tfidf_terms

    df = q_tfidf_terms(spark, sf_oracle)
    p = explain_str(df)
    assert p.count("BroadcastHashJoin") >= 1, p
    assert not has_node(df, "SortMergeJoin"), p


def test_heavy_hitters_recount_join_is_broadcast(spark, sf_oracle):
    """The exact-recount semi-join against the candidate set must
    broadcast (candidates are <= k x partitions rows by construction);
    shuffling the token stream to meet the tiny candidate frame would
    throw away the sketch's whole point."""
    from dynamodb_streaming_datalake_spark.operators.text import q_heavy_hitters

    df = q_heavy_hitters(spark, sf_oracle)
    p = explain_str(df)
    assert p.count("BroadcastHashJoin") >= 1, p
    assert not has_node(df, "SortMergeJoin"), p


def test_salted_join_key_is_key_plus_salt(spark, sf_oracle):
    """The salted join's physical join keys must include the salt
    column — the whole mechanism — and no nested-loop fallback."""
    from dynamodb_streaming_datalake_spark.registry import all_queries

    df = all_queries()["q_salted_join"](spark, sf_oracle)
    p = explain_str(df)
    assert "__salt" in p, p
    assert not has_node(df, "BroadcastNestedLoopJoin"), p
    assert not has_node(df, "CartesianProduct"), p


def test_sequence_pack_no_global_sort(spark, sf_oracle):
    """Round-6 packing: the per-doc running sum must window on block
    (bounded ~N/blocks rows), never a single global ordering — the
    only blockless window allowed is over the tiny block-sums table."""
    import re

    from dynamodb_streaming_datalake_spark.operators.sampling import (
        q_sequence_pack,
    )

    df = q_sequence_pack(spark, sf_oracle)
    p = explain_str(df)
    specs = re.findall(
        r"windowspecdefinition.*?\], \[([^\]]*)\], \[([^\]]*)\]", p
    )
    doc_windows = [
        part for part, order in specs if "bucket" in order or "doc_id" in order
    ]
    assert doc_windows, p
    for part in doc_windows:
        assert "block" in part, (part, p)


def test_bm25_topk_is_take_ordered_and_df_broadcast(spark, sf_oracle):
    """BM25's global top-k must plan as TakeOrderedAndProject (partial
    per-partition top-k, no full sort), and the |terms|-row df table
    must broadcast."""
    from dynamodb_streaming_datalake_spark.operators.text import q_bm25_search

    df = q_bm25_search(spark, sf_oracle)
    p = explain_str(df)
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastHashJoin" in p, p


def test_quality_classifier_weights_broadcast(spark, sf_oracle):
    """The hashed-classifier weight table is constant-size and must
    arrive as a broadcast join; the only shuffle is the doc_id
    aggregate."""
    from dynamodb_streaming_datalake_spark.operators.text import (
        q_quality_classifier,
    )

    df = q_quality_classifier(spark, sf_oracle)
    p = explain_str(df)
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_stream_attribution_is_equi_join(spark, sf_oracle):
    """The interval join must key on user_id (hash/SMJ) with the time
    band as residual — never a nested-loop over the band alone."""
    from dynamodb_streaming_datalake_spark.streaming.windows import (
        q_stream_attribution,
    )

    df = q_stream_attribution(spark, sf_oracle)
    p = explain_str(df)
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_round7_new_queries_plan_shapes(spark, sf_oracle):
    """Round-7 scale claims on the real plans: the retrieval-eval
    ground-truth scan broadcasts the bounded query sample (never
    shuffles the corpus against it); entity resolution's candidate
    join and the span-dedup back-join are shuffled equi-joins (no
    nested loops); triangle counting's three joins are equi-joins;
    the top-k outputs use TakeOrderedAndProject."""
    from dynamodb_streaming_datalake_spark.operators.curation import (
        q_entity_resolution,
    )
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        q_dedup_spans,
    )
    from dynamodb_streaming_datalake_spark.operators.graph import (
        q_triangle_count,
    )
    from dynamodb_streaming_datalake_spark.operators.similarity import (
        q_retrieval_eval,
    )

    ev = q_retrieval_eval(spark, sf_oracle)
    p = explain_str(ev)
    assert "BroadcastHashJoin" in p, p  # query sample broadcast
    assert "CartesianProduct" not in p, p

    for q in (q_entity_resolution, q_dedup_spans):
        df = q(spark, sf_oracle)
        p = explain_str(df)
        assert "CartesianProduct" not in p and "NestedLoop" not in p, p

    tri = q_triangle_count(spark, sf_oracle)
    p = explain_str(tri)
    assert "CartesianProduct" not in p, p
    assert "TakeOrderedAndProject" in p, p  # bounded top output


# ---------------------------------------------------------------------------
# round-8 operators: each scale claim pinned on the real physical plan
# ---------------------------------------------------------------------------


def test_geo_join_is_broadcast_equi_with_residual(spark, sf_oracle):
    """The spatial join must plan as a broadcast HASH join on the grid
    cell keys with the exact-distance refine as the join residual —
    never a nested-loop over the raw distance predicate."""
    from dynamodb_streaming_datalake_spark.operators.geo import q_geo_join

    df = q_geo_join(spark, sf_oracle)
    p = explain_str(df)
    assert has_node(df, "BroadcastHashJoin"), p
    assert not has_node(df, "BroadcastNestedLoopJoin"), p
    assert not has_node(df, "CartesianProduct"), p


def test_cms_estimation_broadcasts_the_sketch(spark, sf_oracle):
    """The D*W sketch table is broadcast into the probe join; the raw
    events shuffle only into the map-side-combined cell/exact aggs."""
    from dynamodb_streaming_datalake_spark.operators.sketches import (
        q_cms_heavy_hitters,
    )

    df = q_cms_heavy_hitters(spark, sf_oracle)
    p = explain_str(df)
    assert has_node(df, "BroadcastHashJoin"), p
    assert has_node(df, "TakeOrderedAndProject"), p


def test_skew_diagnose_is_takeordered_over_one_agg(spark, sf_oracle):
    """The report is a partial+final aggregate + top-k — never a global
    sort of the key space."""
    from dynamodb_streaming_datalake_spark.registry import all_queries

    df = all_queries()["q_skew_diagnose"](spark, sf_oracle)
    p = explain_str(df)
    assert has_node(df, "TakeOrderedAndProject"), p
    assert "partial" in p.lower(), p


def test_anomaly_zscore_scans_events_once_broadcast_stats(spark, sf_oracle):
    """Per-type stats broadcast back over the stream: a single events
    scan feeds the flag filter; the top-k is a TakeOrdered."""
    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        q_anomaly_zscore,
    )

    df = q_anomaly_zscore(spark, sf_oracle)
    p = explain_str(df)
    assert has_node(df, "BroadcastHashJoin"), p
    assert has_node(df, "TakeOrderedAndProject"), p


def test_unigram_dp_joins_broadcast_the_vocab(spark, sf_oracle):
    """Every DP round joins the frontier against the BROADCAST piece
    vocabulary — a shuffled join per round would serialize the loop on
    exchange latency."""
    from dynamodb_streaming_datalake_spark.operators.bpe import (
        q_unigram_tokenize,
    )

    df = q_unigram_tokenize(spark, sf_oracle)
    p = explain_str(df)
    assert has_node(df, "BroadcastHashJoin"), p
    assert not has_node(df, "CartesianProduct"), p


def test_ann_serve_prunes_index_partitions_dynamically(spark, sf_smoke):
    """The build/serve split's scale claim: the serving query's scan of
    the cid-partitioned inverted file must carry a dynamic-pruning
    partition filter (only probed lists' files are read), and its
    result must equal the inline q_ann_ivf build row-for-row."""
    from dynamodb_streaming_datalake_spark.registry import all_queries

    df = all_queries()["q_ann_serve"](spark, sf_smoke)
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in p.lower(), p
    got = sorted(map(tuple, df.collect()))
    want = sorted(
        map(tuple, all_queries()["q_ann_ivf"](spark, sf_smoke).collect())
    )
    assert got == want


def test_ann_serve_pq_prunes_code_partitions_dynamically(spark, sf_smoke):
    """The IVF-PQ build/serve split (round 12): the serving query's
    scan of the cid-partitioned PQ code store must carry a
    dynamic-pruning partition filter (only probed lists' code files
    are read), and its result must equal the inline q_ann_ivfpq build
    row-for-row — build/serve result-invisibility for the compressed
    index."""
    from dynamodb_streaming_datalake_spark.registry import all_queries

    df = all_queries()["q_ann_serve_pq"](spark, sf_smoke)
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in p.lower(), p
    got = sorted(map(tuple, df.collect()))
    want = sorted(
        map(tuple, all_queries()["q_ann_ivfpq"](spark, sf_smoke).collect())
    )
    assert got == want
