"""Physical-plan assertions: the scale claims the operator docstrings
make (broadcast dim joins, TakeOrderedAndProject top-k, partial
aggregation, parquet filter pushdown + column pruning, whole-stage
codegen) verified via the ``plans`` introspection layer — the "would
this plan survive 100x data" gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.relational import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_nation_revenue,
    q_customers_without_orders,
    q_top_words,
    q_topk_orders,
)
from dynamodb_streaming_datalake_spark.plans import (
    codegen_subtree_count,
    explain_str,
    has_node,
    pushed_filters,
    read_schema_line,
)
from dynamodb_streaming_datalake_spark.sources.readers import read_table


def test_dim_joins_are_broadcast(spark, sf_oracle):
    """Q3/Q5 join TPC-H dims onto the fact table: every join must be a
    BroadcastHashJoin — a SortMergeJoin here would shuffle the 100 TB
    fact side on the join key."""
    for q in (q3_shipping_priority, q5_nation_revenue):
        df = q(spark, sf_oracle)
        assert has_node(df, "BroadcastHashJoin"), explain_str(df)
        assert not has_node(df, "SortMergeJoin"), explain_str(df)


def test_anti_join_is_broadcast(spark, sf_oracle):
    df = q_customers_without_orders(spark, sf_oracle)
    p = explain_str(df)
    assert "LeftAnti" in p and "Broadcast" in p, p


def test_topk_plans_take_ordered(spark, sf_oracle):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    heap), never a global Sort of the full table."""
    for q in (q_topk_orders, q_top_words):
        assert has_node(q(spark, sf_oracle), "TakeOrderedAndProject")


def test_aggregation_is_partial_plus_final(spark, sf_oracle):
    """Q1 must show two HashAggregate nodes (partial then final) so the
    shuffle carries combined groups, not raw rows; and the pipeline runs
    inside WholeStageCodegen."""
    df = q1_pricing_summary(spark, sf_oracle)
    assert explain_str(df).count("HashAggregate") >= 2
    # AQE's pre-execution plan hides codegen spans; flip it off to see them
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert codegen_subtree_count(q1_pricing_summary(spark, sf_oracle)) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_filter_pushdown_reaches_parquet(spark, sf_oracle):
    """A predicate on a scanned column must appear in PushedFilters —
    rows are skipped at the parquet reader, not post-scan."""
    o = read_table(spark, sf_oracle, "orders").where(F.col("o_orderkey") < 100)
    assert "LessThan(o_orderkey,100)" in pushed_filters(o)


def test_column_pruning_reaches_parquet(spark, sf_oracle):
    """A 2-column projection must scan 2 columns (ReadSchema), not the
    whole table."""
    o = read_table(spark, sf_oracle, "orders").select("o_orderkey", "o_totalprice")
    rs = read_schema_line(o)
    assert "o_orderkey" in rs and "o_totalprice" in rs
    assert "o_comment" not in rs and "o_orderdate" not in rs


def test_approx_count_distinct_accuracy(spark, sf_oracle):
    """B10's approximate variant: HLL++ within 5% of exact per group
    (its value is engine-specific so it lives here, not in the oracle)."""
    e = read_table(spark, sf_oracle, "events")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id").alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.05, r


def test_partition_pruning_on_hive_layout(spark, tmp_path):
    """B3: a predicate on the y/m/d/h partition columns of the lake
    layout must prune directories (PartitionFilters), not scan-and-drop."""
    src = read_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "h", F.hour("ts")
    )
    path = str(tmp_path / "lake")
    src.write.partitionBy("h").parquet(path)
    df = spark.read.parquet(path).where(F.col("h") == 3)
    p = explain_str(df)
    assert "PartitionFilters" in p and "(h" in p, p


def test_fact_fact_join_sort_merges_without_broadcast(spark, sf_oracle):
    """B8's other half: with broadcast unavailable (the 100 TB fact-fact
    case), the orders x lineitem join must plan as SortMergeJoin on the
    shuffled key — never a nested loop."""
    from dynamodb_streaming_datalake_spark.operators.relational import (
        q_order_lineitem_join,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = q_order_lineitem_join(spark, sf_oracle)
        p = explain_str(df)
        assert "SortMergeJoin" in p, p
        assert "BroadcastNestedLoopJoin" not in p, p
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """The 100 TB fact-fact endgame: both sides bucketed on the join key
    -> SortMergeJoin with NO shuffle exchange (co-located buckets)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        from dynamodb_streaming_datalake_spark.sources.writers import (
            write_bucketed,
        )

        o = read_table(spark, "/root/testdata/sf0.001", "orders")
        l = read_table(spark, "/root/testdata/sf0.001", "lineitem")
        write_bucketed(o, "orders_b", ("o_orderkey",), 8)
        write_bucketed(l, "lineitem_b", ("l_orderkey",), 8)
        ob = spark.table("orders_b")
        lb = spark.table("lineitem_b")
        joined = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"]).select(
            "l_orderkey", "l_quantity", "o_orderpriority"
        )
        p = explain_str(joined)
        assert "SortMergeJoin" in p, p
        assert "Exchange" not in p, p  # co-located: no shuffle at all
        # sanity: result matches the unbucketed join
        plain = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
            "l_orderkey", "l_quantity", "o_orderpriority"
        )
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salting_equalizes_genuinely_skewed_join(spark, sf_oracle):
    """Scale story: a hot key owning 60% of one join side must not
    strand a single task. The engine's explicit mechanism is the salted
    join (AQE skew-join is on as defense-in-depth, but a single KEY
    beyond executor memory is exactly the case AQE cannot split —
    partitions split, keys don't). Assert: the salt really spreads the
    hot key across tasks AND the result is row-identical to the plain
    join under broadcast-disabled SMJ."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.operators.skew import (
        SALT_COL,
        salt_probe_side,
        salted_join,
    )

    l = read_table(spark, sf_oracle, "lineitem").select("l_orderkey", "l_quantity")
    skewed = l.withColumn(
        "l_orderkey",
        F.when(F.rand(seed=7) < 0.6, F.lit(1)).otherwise(F.col("l_orderkey")),
    )
    o = read_table(spark, sf_oracle, "orders").select("o_orderkey", "o_orderpriority")
    build = o.withColumnRenamed("o_orderkey", "l_orderkey")

    # the hot key's rows spread over all 8 salts, roughly evenly
    hot = salt_probe_side(skewed, skewed.columns, 8).where(F.col("l_orderkey") == 1)
    per_salt = {r[SALT_COL]: r["n"] for r in hot.groupBy(SALT_COL).agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert len(per_salt) == 8
    # spread is as even as the row fingerprint's entropy allows — the
    # hot key's rows differ only in l_quantity (~50 distinct values),
    # so buckets are lumpy but every salt carries a real share vs the
    # unsalted single-task pile-up
    assert max(per_salt.values()) < 4 * min(per_salt.values()), per_salt

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = skewed.join(build, ["l_orderkey"])
        salted = salted_join(skewed, build, ["l_orderkey"], n_salts=8)
        assert salted.count() == plain.count()
        assert (
            salted.agg(F.sum(F.col("l_quantity").cast("decimal(18,6)"))).first()[0]
            == plain.agg(F.sum(F.col("l_quantity").cast("decimal(18,6)"))).first()[0]
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_adaptive_salted_join_sizes_salts_from_measured_skew(spark, sf_oracle):
    """Round-13 operator: the diagnose pass must pick n_salts from the
    MEASURED hottest key — 1 (plain join, zero build blow-up) on a
    uniform probe side, ceil(hot/target) on a skewed one, capped at
    max_salts — and the joined rows must be identical to the plain
    join either way (the registered query's oracle is the plain
    join; this pins the mechanism at controlled skew levels)."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.operators.skew import (
        adaptive_salted_join,
    )

    o = read_table(spark, sf_oracle, "orders").select("o_orderkey", "o_orderpriority")
    build = o.withColumnRenamed("o_orderkey", "k").limit(200)
    # uniform probe: every key appears once -> measured max 1 -> plain
    uni = o.select(F.col("o_orderkey").alias("k"), F.lit(1.0).alias("v"))
    j, n = adaptive_salted_join(uni, build, ["k"], target_rows=50)
    assert n == 1
    assert j.count() == uni.join(build, ["k"]).count()
    # skewed probe: one key owns 130 rows -> ceil(130/50) = 3 salts
    skewed = uni.withColumn(
        "k", F.when(F.col("k") <= 130, F.lit(1)).otherwise(F.col("k"))
    )
    j2, n2 = adaptive_salted_join(skewed, build, ["k"], target_rows=50)
    assert n2 == 3
    plain = skewed.join(build, ["k"])
    assert sorted(map(tuple, j2.collect())) == sorted(map(tuple, plain.collect()))
    # cap: a tiny target would demand hundreds of salts; max_salts wins
    _, n3 = adaptive_salted_join(skewed, build, ["k"], target_rows=1, max_salts=16)
    assert n3 == 16


def test_adaptive_salted_agg_sizes_salts_from_measured_skew(spark, sf_oracle):
    """Round-14 operator (r13 verdict #5): the aggregation twin of the
    adaptive join — n_salts from the MEASURED hottest key's row count,
    1 (plain one-phase COUNT(DISTINCT), zero extra shuffle) on uniform
    keys, ceil(hot/target) on a skewed one, capped at max_salts — and
    the per-key (n_distinct, n_rows) must equal the one-phase answer
    either way (the registered query's oracle is the one-phase
    aggregate; this pins the mechanism at controlled skew levels)."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.operators.skew import (
        adaptive_salted_agg,
    )

    o = read_table(spark, sf_oracle, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    # uniform: every key appears once -> measured max 1 -> plain path
    uni = o.select(F.col("o_orderkey").alias("k"), F.col("o_orderdate").alias("item"))
    a, n = adaptive_salted_agg(uni, ["k"], "item", target_rows=50)
    assert n == 1
    # skewed: one key owns 130 rows -> ceil(130/50) = 3 salts
    skewed = uni.withColumn(
        "k", F.when(F.col("k") <= 130, F.lit(1)).otherwise(F.col("k"))
    )
    a2, n2 = adaptive_salted_agg(skewed, ["k"], "item", target_rows=50)
    assert n2 == 3
    plain = skewed.groupBy("k").agg(
        F.countDistinct("item").cast("bigint").alias("n_distinct"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    assert sorted(map(tuple, a2.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # cap honored
    _, n3 = adaptive_salted_agg(
        skewed, ["k"], "item", target_rows=1, max_salts=16
    )
    assert n3 == 16


def test_no_accidental_nested_loops_anywhere(spark, sf_oracle):
    """Plan hygiene across the ENTIRE registry: no CartesianProduct or
    BroadcastNestedLoopJoin in any query's plan, except the whitelisted
    intentional cross products whose broadcast side is constant-sized
    (ANN query sets, IVF centroids, simhash band table, funnel's
    single-row aggregates). A new query that accidentally joins without
    an equi-condition fails here before it fails at 100 TB."""
    from dynamodb_streaming_datalake_spark.registry import all_queries

    INTENTIONAL_CROSS = {
        "q_holt_trend",  # 1-row folded (level, trend) state x 7 horizons
        "q_grouped_forecast",  # per-type folded states x 3 horizons
        "q_lift_deciles",  # 1-row (total users, positives) crossed into 10
        "q_markov_eval",  # 1-row epoch midpoint crossed into the LAG scan
        "q_srm_check",  # 1-row user total crossed into 2 arm rows
        "q_hits",  # 1-row max-normalizer crossed into the score vector
        "q_vocab_growth",  # 1-row doc_id bounds (and 4-row cutoffs) crossed
        "q_ngram_novelty",  # 1-row doc_id midpoint crossed into the scan
        "q_dedup_incremental",  # 1-row doc_id midpoint crossed into the scan
        "q_benford_audit",  # 1-row digit grand total crossed into 9 rows
        "q_ann_topk",  # broadcast N_QUERIES rows x corpus scan
        "q_retrieval_eval",  # broadcast IVF_QUERIES rows x corpus (truth)
        "q_ann_ivf",  # broadcast 16 centroids x corpus (assignment)
        "q_ann_serve",  # broadcast 16 stored centroids x query panel
        "q_ann_serve_pq",  # broadcast 16 stored coarse centroids x panel
        "q_ann_index_stream",  # broadcast 16 frozen centroids x panel
        "q_ann_codes_stream",  # same shared ivfpq_serve centroid panel cross
        "q_ann_ivfpq",  # broadcast 16 coarse centroids x corpus (assignment)
        "q_dedup_simhash_pairs",  # broadcast 4-row band table
        "q_funnel_conversion",  # three 1-row aggregates crossed
        "q_kmeans",  # broadcast K=8 centroids x corpus (assignment)
        "q22_idle_rich_customers",  # 1-row AVG threshold crossed
        "q_assoc_rules",  # 1-row basket-total N crossed into rule frame
        "q_exact_quantile_twopass",  # 3-row quantile panel x bucket hist
        "q_grouped_weighted_quantile",  # 2-row quantile panel x hist
        "q_quantile_normalize",  # 1-row pooled grid crossed into rows
        "q_bandit_posterior",  # |arms|-row aggregate x literal grid
        "q_bandit_stream",  # same bandit_readout arms x grid cross
        "q_t_closeness",  # 25-row sensitive-domain histogram crossed
        "q_blocking_eval",  # 1-row part-count denominator crossed
        "q_pacf",  # 8-row lag frame x daily series (the ACF pattern)
        "q_isotonic_calibration",  # B-row bin lattice range joins
        "q_hill_tail",  # 1-row threshold crossed into the k-row top
        "q_join_order_dp",  # four 1-row stats aggregates crossed
        "q_lsh_planner",  # 5-row config panel x literal grid
        "q11_important_parts",  # 1-row grand-total threshold crossed
        "q_tfidf_terms",  # 1-row corpus doc count crossed
        "q_heavy_hitters",  # 1-row token total crossed
        "q_bm25_search",  # 1-row (n_docs, avgdl) aggregate crossed
        "q_hybrid_search",  # 1-row stats + 1-row query vector crossed
        "q_pagerank",  # 1-row node-count aggregate crossed into init
        "q_data_quality_report",  # 1-row check aggregates crossed
        "q_ri_audit",  # per-edge 1-row total x orphan-count crosses
        "q_bigram_lm",  # 1-row vocabulary-size aggregate crossed
        "q_lm_doc_score",  # 1-row vocabulary-size aggregate crossed
        "q_triangle_count",  # 1-row global-triangle-count crossed
        "q_hll_distinct",  # two 1-row aggregates (sketch sum x exact) crossed
        "q_hll_stream",  # same 1-row estimate cross, streamed registers
        "q_analyze_ndv",  # per-column 1-row estimate crosses (HLL kernel)
        "q_join_estimate",  # three 1-row stat aggregates crossed
        "q_mix_temperature",  # 1-row denominator fold crossed into counts
        "q_quantile_sketch",  # two 1-row percentile aggs x 3-row p table
        "q_skew_diagnose",  # 1-row total/key-count aggregate crossed
        "q_theta_distinct",  # 1-row theta/sample/exact aggregates crossed
        "q_theta_stream",  # same 1-row crosses, streamed sketch view
        "q_kll_quantiles",  # bounded sketch x 1-row totals crossed
        "q_kll_binning",  # 1-row sketch-edge frame crossed into the scan
        "q_group_split",  # 1-row leakage-audit aggregate crossed
        "q_ann_tuning",  # bounded query-panel truth cross + 1-row aggs
        "q_matryoshka_eval",  # bounded query-panel cross per prefix dim
        "q_dedup_threshold_sweep",  # 4-row threshold table theta-joined
        "q_embedding_drift",  # 1-row mean-vector frame x 1-row counts
        "q_distinctive_terms",  # 1-row corpus-total aggregate crossed
        "q_kcore",  # 1-row core-totals aggregate crossed
        "q_shortest_paths",  # 1-row BFS-source aggregate crossed into init
        "q_degree_stats",  # 1-row assortativity aggregate crossed
        "q_tokenizer_eval",  # four 1-row family aggregates crossed
        "q_hard_negatives",  # broadcast N_ANCHORS rows x corpus scan
        "q_survival_km",  # 1-row study-end aggregate crossed into lifetimes
        "q_cuped",  # 1-row epoch-midpoint bound crossed into the scan
        "q_diff_in_diff",  # 1-row epoch-midpoint bound crossed into the scan
        "q_histogram_drift",  # 1-row midpoint + 1-row ref-range crosses
        "q_mmr_diverse",  # broadcast MMR_QUERIES rows x corpus scan
        "q_autocorrelation",  # broadcast 24-row lag table x hourly series
        "q_negative_sampling",  # broadcast N_ANCHORS rows x corpus scan
        "q_semdedup",  # broadcast SEM_K centroids x corpus (assignment)
        "q_zonemap_prune",  # 6-row predicate panel x 128 zone-map rows
        "q_random_projection",  # broadcast JL_NQ query panel x corpus (x2)
        "q_embedding_silhouette",  # broadcast SIL_K centroids x corpus
        "q_cluster_purity",  # broadcast SIL_K centroids + 1-row stat crosses
        "q_feature_hashing",  # broadcast FH_NQ query panel x corpus vectors
        "q_linear_probe",  # 1-row Gram-solve coefficient frame crossed
        "q_linear_probe_k",  # same 1-row cross, generated 5x5 solve
        "q_probe_auc",  # same 1-row coefficient cross, rank scorer
        "q_pps_sample",  # 1-row total-weight frame crossed into the scan
        "q_probe_stream",  # same 1-row coefficient cross, streamed Gram
        "q_quality_resample",  # same 1-row coefficient cross, resampler
        "q_probe_calibration",  # same 1-row coefficient cross, audit
        "q_source_mix_drift",  # 1-row baseline-day aggregate crossed
        "q_dp_quantile",  # |event types| x 32-bin public domain spine
        "q_bitext_mine",  # broadcast BITEXT_NQ panel x en-docs scan
        "q_embedding_outliers",  # 1-row per-dim stats frame crossed
    }
    offenders = {}
    for name, fn in sorted(all_queries().items()):
        p = explain_str(fn(spark, sf_oracle))
        bad = [x for x in ("CartesianProduct", "BroadcastNestedLoopJoin") if x in p]
        if bad and name not in INTENTIONAL_CROSS:
            offenders[name] = bad
    assert not offenders, offenders


def test_approx_percentile_accuracy(spark, sf_oracle):
    """q_value_percentiles' scale variant: t-digest approx_percentile
    within 2% relative of the exact interpolated percentile per group
    (engine-specific value, so tested here rather than oracle-matched)."""
    e = read_table(spark, sf_oracle, "events")
    rows = (
        e.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.9)).alias("exact"),
            F.percentile_approx("value", F.lit(0.9), F.lit(10000)).alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / abs(r["exact"]) < 0.02, r


def test_cdc_zone_roundtrip_prunes_partitions(spark, sf_smoke, tmp_path):
    """The registered round-trip's day predicate must reach the NDJSON
    scan as PartitionFilters (B3) — directory pruning, not scan-and-drop
    — and the declared schema must keep the scan single-pass (B2)."""
    from dynamodb_streaming_datalake_spark.operators.cdc_zone import (
        build_cdc_zone,
        read_day_state,
    )

    path = str(tmp_path / "zone")
    build_cdc_zone(spark, sf_smoke, path)
    state = read_day_state(spark, path)
    p = explain_str(state)
    assert "PartitionFilters" in p, p
    assert "(d" in p and "(m" in p and "(y" in p, p


def test_aqe_splits_skewed_join_partitions(spark, sf_oracle):
    """Defense-in-depth beside the explicit salted join: with AQE's
    skew-join handler forced to see the skew (thresholds lowered to
    test scale), the EXECUTED sort-merge join over a 60%-hot-key build
    must carry skew-split partitions — visible as the skew marker in
    the adaptive final plan. AQE splits PARTITIONS (a single key larger
    than executor memory still needs the salt — the salting test
    above), but for garden-variety skew this is the zero-code path."""
    l = read_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    # AQE splits a skewed REDUCE partition at map-output granularity:
    # a single-file scan is one map task, whose block is indivisible.
    # Spread the probe side over several maps first (any real fact
    # table has thousands).
    skewed = l.repartition(8).withColumn(
        "l_orderkey",
        F.when(F.rand(seed=7) < 0.6, F.lit(1)).otherwise(F.col("l_orderkey")),
    )
    o = read_table(spark, sf_oracle, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    build = o.withColumnRenamed("o_orderkey", "l_orderkey")
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        joined = skewed.join(build, ["l_orderkey"])
        # execute THIS DataFrame's own query (count() would build a
        # separate aggregate execution whose adaptive plan is not ours)
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_interval_join_is_hash_join_with_residual(spark, sf_oracle):
    """q_interval_join's interval-overlap theta join must execute as a
    broadcast HASH join on the day bucket with the overlap predicate
    as a residual condition — never a nested loop (the registry-wide
    BNLJ test guards the same, this pins the positive shape)."""
    from dynamodb_streaming_datalake_spark.registry import all_queries

    plan = (
        all_queries()["q_interval_join"](spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    # the residual overlap predicate rides ON the hash join
    join_line = next(
        ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln
    )
    assert "a_start" in join_line and "b_end" in join_line, join_line


def test_spanning_interval_join_dedup_is_load_bearing(spark, sf_oracle):
    """The bucket-spanning interval join's distinct stage must be
    doing real work: multi-day shared ranges mean the bucket join
    emits strictly more hits than surviving pairs, and the join
    itself must be a hash join on the day bucket."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    e = read_table(spark, sf_oracle, "events")
    a = e.groupBy(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).agg(F.min("ts").alias("a_start"), F.max("ts").alias("a_end"))
    epoch_day = F.datediff(
        F.to_date("ts"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    b = e.groupBy(
        "event_type", (epoch_day - epoch_day % 5).alias("w5")
    ).agg(F.min("ts").alias("b_start"), F.max("ts").alias("b_end"))
    a_days = a.withColumn(
        "day", F.explode(F.sequence(F.to_date("a_start"), F.to_date("a_end")))
    )
    b_days = b.withColumn(
        "day", F.explode(F.sequence(F.to_date("b_start"), F.to_date("b_end")))
    )
    hits = a_days.join(
        F.broadcast(b_days),
        (a_days["day"] == b_days["day"])
        & (F.col("a_start") <= F.col("b_end"))
        & (F.col("b_start") <= F.col("a_end")),
    ).select("user_id", "wk", "event_type", "w5",
             "a_start", "a_end", "b_start", "b_end")
    n_hits = hits.count()
    n_pairs = hits.distinct().count()
    assert n_hits > n_pairs > 0, (n_hits, n_pairs)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "NestedLoop" not in plan


def test_notin_plans_null_aware_hash_anti_join(spark, sf_oracle):
    """q_notin_nullaware must execute its NOT IN subqueries as
    null-aware BroadcastHashJoin anti joins (the NAAJ rewrite) —
    never a nested loop."""
    from dynamodb_streaming_datalake_spark.registry import all_queries

    plan = (
        all_queries()["q_notin_nullaware"](spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    naaj = [
        ln
        for ln in plan.splitlines()
        if "BroadcastHashJoin" in ln and "LeftAnti" in ln
    ]
    assert len(naaj) >= 2, plan  # both NOT INs rewrote
    assert all(ln.rstrip().endswith("true") for ln in naaj), naaj  # NAAJ flag
    assert "NestedLoop" not in plan
