"""Unit tests for training-prep operators: decontamination,
k-anonymization, and near-dup connected components. Oracle parity for
the registered queries is covered by test_oracle_parity.py; these pin
the semantic invariants on tiny, hand-checkable frames."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_connected_components_transitive(spark):
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        connected_components,
    )

    # chain 1-2-3 (no direct 1-3 edge) plus separate pair 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a long, b long"
    )
    got = {
        (r["node"], r["label"]) for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_connected_components_partition_independent(spark):
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)] + [(20, 21), (21, 22)],
        "a long, b long",
    )
    one = {(r["node"], r["label"]) for r in connected_components(edges).collect()}
    many = {
        (r["node"], r["label"])
        for r in connected_components(edges.repartition(13)).collect()
    }
    assert one == many
    assert {lbl for _, lbl in one} == {1, 20}
    # the distributed label-propagation path must agree exactly with the
    # driver union-find fast path on the same graph
    dist = {
        (r["node"], r["label"])
        for r in connected_components(edges, driver_edge_limit=0).collect()
    }
    assert dist == one


def test_contamination_flags_shared_ngram(spark):
    from dynamodb_streaming_datalake_spark.operators.contamination import (
        contaminated_docs,
    )

    eval_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "he saw the quick brown fox jumps away"),  # shares 4-grams
            (2, "completely different words entirely here now"),  # clean
            (3, "quick brown fox jumps"),  # exactly one shared 4-gram
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_overlap"] for r in contaminated_docs(docs, eval_docs).collect()}
    assert set(got) == {1, 3}
    # doc 1 shares 'the quick brown fox' and 'quick brown fox jumps'
    assert got[1] == 2 and got[3] == 1


def test_k_anonymize_suppresses_small_groups(spark):
    from dynamodb_streaming_datalake_spark.operators.privacy import k_anonymize

    rows = [(f"id{i}", "A") for i in range(5)] + [("solo", "B")]
    df = spark.createDataFrame(rows, "pid string, quasi string")
    out = k_anonymize(df, "pid", ["quasi"], k=3).collect()
    assert {r["pid"] for r in out} == {f"id{i}" for i in range(5)}
    assert all(r["group_size"] == 5 for r in out)


def test_k_anonymity_holds_on_released_rows(spark, sf_oracle):
    """Every released quasi-identifier tuple occurs >= K_ANON times —
    the actual privacy guarantee, checked on real data. Runs at sf0.01:
    at sf0.001 every cell is < k and the (correct) release is empty,
    which would make the guarantee vacuous."""
    from dynamodb_streaming_datalake_spark.operators.privacy import (
        K_ANON,
        q_k_anonymize,
    )

    out = q_k_anonymize(spark, sf_oracle)
    small = (
        out.groupBy("c_mktsegment", "acctbal_band")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") < K_ANON)
    )
    assert small.count() == 0
    assert out.count() > 0  # releases something (not vacuous)


def test_connected_components_string_ids_distributed(spark):
    """Regression (ADVICE r1): the distributed path's fixpoint test must
    not depend on numeric node ids — SUM(label) over strings is NULL
    every round and terminated after one iteration with wrong labels."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        connected_components,
    )

    # chain long enough that one propagation round cannot finish
    edges = spark.createDataFrame(
        [(f"doc{i:02d}", f"doc{i + 1:02d}") for i in range(1, 9)]
        + [("x1", "x2"), ("x2", "x3")],
        "a string, b string",
    )
    got = {
        (r["node"], r["label"])
        for r in connected_components(edges, driver_edge_limit=0).collect()
    }
    assert {lbl for _, lbl in got} == {"doc01", "x1"}
    assert all(lbl == "doc01" for n, lbl in got if n.startswith("doc"))


def test_shingle_frequency_cap_bounds_posting_lists(spark):
    """Planted hot shingle: one phrase shared by 60 docs must NOT expand
    into 60*59/2 pairs when the cap is on — the hot shingle is dropped
    before posting lists are built."""
    from dynamodb_streaming_datalake_spark.operators.dedup import jaccard_pairs

    hot = "common boilerplate footer text here"
    rows = [(i, f"unique{i} words{i} only{i} " + hot) for i in range(60)]
    # plus one genuine near-dup pair with NO hot shingle
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon eta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = jaccard_pairs(docs, 0.3, max_shingle_freq=10)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # the 60 boilerplate docs share ONLY capped-out shingles -> no pairs;
    # the genuine near-dup pair survives on its un-capped shingles
    assert got == {(100, 101)}

    # uncapped baseline: the hot shingle really does create pair blowup
    # (boilerplate-only similarity), proving the cap changed behavior
    uncapped = jaccard_pairs(docs, 0.3, max_shingle_freq=None)
    assert uncapped.count() > len(got)


def test_lsh_bucket_cap_drops_degenerate_buckets(spark):
    """Planted identical docs: 40 copies collide into one band bucket;
    with max_bucket_size below 40 the bucket is dropped (no candidate
    blowup), while distinct near-dup pairs elsewhere still surface."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    clone = "identical cloned document body repeated verbatim everywhere"
    rows = [(i, clone) for i in range(40)]
    rows += [(200, "orange banana cherry date elderberry fig grape"),
             (201, "orange banana cherry date elderberry fig plum")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = minhash_lsh_pairs(docs, 0.3, max_bucket_size=10)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert got == {(200, 201)}

    uncapped = minhash_lsh_pairs(docs, 0.3, max_bucket_size=None)
    assert uncapped.count() == 40 * 39 // 2 + 1


def test_minhash_lsh_agrees_with_exact_jaccard_on_fixture(spark, sf_smoke):
    """The registered q_dedup_apply consumes LSH pairs; pin that on the
    fixture corpus LSH recall vs exact Jaccard is total (same pair set)
    so the swap changed scale behavior, not results."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        jaccard_pairs,
        minhash_lsh_pairs,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    d = read_table(spark, sf_smoke, "documents")
    exact = {
        (r["doc_a"], r["doc_b"]) for r in jaccard_pairs(d, JACCARD_THRESHOLD).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(d, JACCARD_THRESHOLD).collect()
    }
    assert lsh == exact and len(exact) > 0


def test_embedding_ivf_pairs_subset_of_exact_with_high_recall(spark, sf_smoke):
    """IVF candidates must be a SUBSET of the exact blocked-GEMM pairs
    (verification is exact, so no false positives) and recall the large
    majority of true near-dups on the fixture."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        EMBED_NEAR_DUP_COS,
        embedding_pairs_blocked,
        embedding_pairs_ivf,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    e = read_table(spark, sf_smoke, "embeddings")
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_pairs_blocked(e, EMBED_NEAR_DUP_COS).collect()
    }
    ivf = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_pairs_ivf(e, EMBED_NEAR_DUP_COS).collect()
    }
    assert ivf <= exact
    assert len(exact) > 0
    assert len(ivf) / len(exact) >= 0.5, (len(ivf), len(exact))


def test_embedding_ivf_trained_subset_of_exact_with_high_recall(
    spark, sf_smoke
):
    """The Lloyd-trained codebook must preserve the IVF contract: no
    false positives (exact verify), and recall at least as usable as
    the fixed-init codebook on the fixture."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        EMBED_NEAR_DUP_COS,
        embedding_pairs_blocked,
        embedding_pairs_ivf_trained,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    e = read_table(spark, sf_smoke, "embeddings")
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_pairs_blocked(e, EMBED_NEAR_DUP_COS).collect()
    }
    trained = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_pairs_ivf_trained(e, EMBED_NEAR_DUP_COS).collect()
    }
    assert trained <= exact
    assert len(exact) > 0
    assert len(trained) / len(exact) >= 0.5, (len(trained), len(exact))


def test_apply_clustered_keeps_one_rep_per_transitive_chain(spark):
    """A~B and B~C with A!~C: pairwise greedy can over/under-drop;
    cluster-canonical dedup must keep exactly min(doc_id) of the chain."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from pyspark.sql import functions as F

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    words = base.split()
    rows = [
        (1, " ".join(words)),                       # A
        (2, " ".join(words[:-1] + ["mu"])),         # B ~ A
        (3, " ".join(["nu"] + words[1:-1] + ["mu"])),  # C ~ B, farther from A
        (9, "completely different text with no overlap at all whatsoever"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(docs, 0.5)
    edges = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    labels = connected_components(edges)
    comp = {(r["node"], r["label"]) for r in labels.collect()}
    # the chain forms ONE component labelled by doc 1
    assert {lbl for _, lbl in comp} == {1}
    drops = {n for n, lbl in comp if n != lbl}
    assert drops == {2, 3}  # doc 9 untouched, doc 1 the survivor


def test_ivf_sizing_scales_sqrt_n():
    """The coarse codebook is derived, not fixed: floor of 16 for
    fixture-sized inputs, ~sqrt(N) beyond (a planted 250k-vector corpus
    must get a 500-centroid codebook)."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        EMB_IVF_CENTROIDS,
        ivf_n_centroids,
    )

    assert ivf_n_centroids(50) == EMB_IVF_CENTROIDS
    assert ivf_n_centroids(256) == EMB_IVF_CENTROIDS
    assert ivf_n_centroids(500) == 22
    assert ivf_n_centroids(250_000) == 500
    assert ivf_n_centroids(0) == EMB_IVF_CENTROIDS


def test_ivf_nprobe_tracks_codebook():
    """nprobe keeps ~1/8 list coverage as K grows (2-of-16 fixture
    default preserved), so derived sizing can't silently trade recall."""
    from dynamodb_streaming_datalake_spark.operators.dedup import ivf_nprobe

    assert ivf_nprobe(16) == 2
    assert ivf_nprobe(22) == 3
    assert ivf_nprobe(44) == 6
    assert ivf_nprobe(500) == 63


def test_ivf_codebook_guard_distributed_path_matches_driver_path(
    spark, sf_smoke
):
    """Extreme-N codebook guard (planted): force the cutover threshold
    below the fixture codebook so `_ivf_pairs_from_centroids` dispatches
    to the distributed two-level quantizer, with super_probe covering
    every super-list — the regime where the candidate-centroid set is
    complete and the assignment must EQUAL the driver-GEMM path's. Same
    pair set out of both paths == the cutover changes execution
    strategy, not semantics."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        EMBED_NEAR_DUP_COS,
        _ivf_pairs_from_centroids,
        ivf_n_centroids,
        ivf_nprobe,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    e = read_table(spark, sf_smoke, "embeddings")
    k = ivf_n_centroids(e.count())
    nprobe = ivf_nprobe(k)
    cents = sorted(
        (
            (r["vec_id"], r["embedding"])
            for r in e.where(F.col("vec_id") < k)
            .select("vec_id", "embedding")
            .collect()
        ),
    )
    driver = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in _ivf_pairs_from_centroids(
            e, cents, EMBED_NEAR_DUP_COS, nprobe
        ).collect()
    }
    # cutover forced: max_driver_codebook below len(cents); super_probe
    # covers all super-lists -> assignment identical to the driver path
    dist = {
        (r["vec_a"], r["vec_b"], r["cos_sim"])
        for r in _ivf_pairs_from_centroids(
            e,
            cents,
            EMBED_NEAR_DUP_COS,
            nprobe,
            max_driver_codebook=2,
            super_probe=len(cents),
        ).collect()
    }
    assert len(driver) > 0
    assert dist == driver


def test_ivf_distributed_default_probe_is_recall_bounded_subset(
    spark, sf_smoke
):
    """With the DEFAULT super_probe (2) the two-level path may miss
    cross-super-list pairs (and can even surface true pairs the driver
    path missed, since home assignments differ); the contract is exact
    verification plus usable recall relative to the driver path."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        EMBED_NEAR_DUP_COS,
        _ivf_pairs_from_centroids,
        ivf_n_centroids,
        ivf_nprobe,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    e = read_table(spark, sf_smoke, "embeddings")
    k = ivf_n_centroids(e.count())
    nprobe = ivf_nprobe(k)
    cents = sorted(
        (
            (r["vec_id"], r["embedding"])
            for r in e.where(F.col("vec_id") < k)
            .select("vec_id", "embedding")
            .collect()
        ),
    )
    driver = {
        (r["vec_a"], r["vec_b"])
        for r in _ivf_pairs_from_centroids(
            e, cents, EMBED_NEAR_DUP_COS, nprobe
        ).collect()
    }
    dist = {
        (r["vec_a"], r["vec_b"])
        for r in _ivf_pairs_from_centroids(
            e, cents, EMBED_NEAR_DUP_COS, nprobe, max_driver_codebook=2
        ).collect()
    }
    assert len(driver) > 0
    assert len(dist) / len(driver) >= 0.5, (len(dist), len(driver))


def test_pq_codes_shape_and_error_vs_scalar_quantization(spark, sf_smoke):
    """PQ invariants: one code per subspace, codes within [0, K), MSE
    finite and nonnegative — and the codebook is actually shared (at
    most M x K distinct codes across the corpus)."""
    from dynamodb_streaming_datalake_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        q_pq_quantize,
    )

    rows = q_pq_quantize(spark, sf_smoke).collect()
    assert len(rows) > 0
    for r in rows:
        codes = [int(c) for c in r["codes"].split(",")]
        assert len(codes) == PQ_M
        assert all(0 <= c < PQ_K for c in codes)
        assert r["mse"] >= 0.0
    # most vectors should NOT be perfectly reconstructed (k << corpus)
    assert sum(1 for r in rows if r["mse"] > 0) > len(rows) * 0.5


def test_ann_pq_returns_full_topk_per_query(spark, sf_smoke):
    """ADC search shape: every query gets exactly PQ_TOPK ranked
    neighbors, never itself, ranks dense from 1."""
    from dynamodb_streaming_datalake_spark.operators.similarity import (
        PQ_NQ,
        PQ_TOPK,
        q_ann_pq,
    )

    rows = q_ann_pq(spark, sf_smoke).collect()
    by_q = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        assert r["approx_dist"] >= 0.0
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert len(by_q) == PQ_NQ
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, PQ_TOPK + 1))


def test_q_stratified_cap_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.sampling import (
        q_stratified_cap,
    )
    from dynamodb_streaming_datalake_spark.registry import ORACLE
    from tests.oracle_utils import compare_query

    compare_query(
        spark, sf_smoke, "q_stratified_cap", q_stratified_cap,
        ORACLE["q_stratified_cap"],
    )


def test_stratified_cap_two_phase_equals_single_window(spark, sf_smoke):
    """The salted pre-reduce must be result-invisible: compare against
    a direct single-window rank."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.operators.sampling import (
        CAP_PER_STRATUM,
        hash_bucket,
        q_stratified_cap,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    d = read_table(spark, sf_smoke, "documents").select(
        "doc_id", "lang", "source", hash_bucket(F.col("doc_id")).alias("b")
    )
    w = Window.partitionBy("lang", "source").orderBy("b", "doc_id")
    direct = (
        d.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= CAP_PER_STRATUM)
        .select("lang", "source", "doc_id", "sample_rank")
    )
    a = {tuple(r) for r in q_stratified_cap(spark, sf_smoke).collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b


def test_q_incr_agg_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.state import q_incr_agg
    from dynamodb_streaming_datalake_spark.registry import ORACLE
    from tests.oracle_utils import compare_query

    compare_query(
        spark, sf_smoke, "q_incr_agg", q_incr_agg, ORACLE["q_incr_agg"]
    )


def test_incr_agg_merge_covers_disjoint_and_overlapping_keys(spark, sf_smoke):
    """Keys present only in base, only in delta, and in both must all
    survive the full-outer merge with correct combined stats."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.operators.state import (
        INCR_SPLIT,
        q_incr_agg,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    ev = read_table(spark, sf_smoke, "events")
    merged = {
        (r["user_id"], r["event_type"]): r["n_events"]
        for r in q_incr_agg(spark, sf_smoke).collect()
    }
    totals = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert merged == totals
    # the split really produces two non-empty sides
    assert ev.where(F.col("event_id") % INCR_SPLIT == 0).count() > 0
    assert ev.where(F.col("event_id") % INCR_SPLIT != 0).count() > 0


def test_q_ewma_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        q_ewma_user_value,
    )
    from dynamodb_streaming_datalake_spark.registry import ORACLE
    from tests.oracle_utils import compare_query

    compare_query(
        spark, sf_smoke, "q_ewma_user_value", q_ewma_user_value,
        ORACLE["q_ewma_user_value"],
    )


def test_ewma_fold_matches_reference_recurrence(spark, sf_smoke):
    """The declarative fold equals the textbook sequential recurrence
    computed driver-side (exact: alpha is a binary fraction)."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        EWMA_ALPHA,
        q_ewma_user_value,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    ev = read_table(spark, sf_smoke, "events")
    rows = (
        ev.select("user_id", "ts", "event_id", F.col("value").cast("double"))
        .collect()
    )
    seqs: dict = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        seqs.setdefault(r["user_id"], []).append(r["value"])
    expected = {}
    for u, vals in seqs.items():
        acc = vals[0]
        for x in vals[1:]:
            acc = EWMA_ALPHA * x + (1 - EWMA_ALPHA) * acc
        expected[u] = (len(vals), acc, vals[-1])
    got = {
        r["user_id"]: (r["n_events"], r["ewma_value"], r["last_value"])
        for r in q_ewma_user_value(spark, sf_smoke).collect()
    }
    assert got == expected  # bit-exact, not approx


def test_minhash_bucket_stats_measures_capped_candidate_volume(spark):
    """The bench's sf1 scale probe (round-6 verdict item 3): on a
    corpus of 12 identical docs plus 2 distinct near-dups with cap 10,
    every band bucket holding the 12 clones is over-cap and dropped,
    so candidate volume counts only the surviving buckets — exactly
    the self-join output the capped pipeline produces."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        MINHASH_SEEDS,
        _ROWS_PER_BAND,
        minhash_bucket_stats,
    )

    clone = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, clone) for i in range(12)]
    rows += [(200, "orange banana cherry date elderberry fig grape"),
             (201, "orange banana cherry date elderberry fig plum")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = minhash_bucket_stats(docs, max_bucket_size=10)
    n_bands = MINHASH_SEEDS // _ROWS_PER_BAND
    # the 12 clones share one over-cap bucket per band: all dropped
    assert stats["n_dropped_buckets"] == n_bands
    assert stats["max_surviving_bucket"] <= 10
    # surviving volume: docs 200/201 collide in some (not necessarily
    # all) bands — at least 1, at most n_bands pairs, nothing from the
    # dropped clone buckets (uncapped volume would be 66 per band)
    assert 1 <= stats["candidate_pairs"] <= n_bands


def test_q_dedup_spans_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.dedup import q_dedup_spans
    from dynamodb_streaming_datalake_spark.registry import ORACLE
    from tests.oracle_utils import compare_query

    compare_query(
        spark, sf_smoke, "q_dedup_spans", q_dedup_spans,
        ORACLE["q_dedup_spans"],
    )


def test_dedup_spans_on_planted_corpus(spark, tmp_path):
    """Hand-checkable span semantics: two docs sharing one 8-token
    sentence inside otherwise-distinct text each count exactly the
    windows that lie fully inside the shared span; a third unrelated
    doc counts zero."""
    import os

    from dynamodb_streaming_datalake_spark.operators.dedup import (
        SPAN_W,
        q_dedup_spans,
    )

    shared = "one two three four five six seven eight"  # exactly W tokens
    rows = [
        (1, f"aa bb cc {shared} dd ee"),
        (2, f"zz yy {shared} xx ww vv"),
        (3, "totally different words with no overlap at all here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in q_dedup_spans(spark, d).collect()
    }
    # doc 1: 13 tokens -> 6 windows, ONE of which is the shared span
    assert got[1] == (13 - SPAN_W + 1, 1)
    assert got[2] == (13 - SPAN_W + 1, 1)
    assert got[3] == (10 - SPAN_W + 1, 0)


def test_q_entity_resolution_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.curation import (
        q_entity_resolution,
    )
    from dynamodb_streaming_datalake_spark.registry import ORACLE
    from tests.oracle_utils import compare_query

    compare_query(
        spark, sf_smoke, "q_entity_resolution", q_entity_resolution,
        ORACLE["q_entity_resolution"],
    )


def test_entity_resolution_has_total_recall(spark, sf_smoke):
    """Every corrupted record must link back to its clean original at
    distance exactly 1 (one dropped character past the blocking
    prefix): recall is total by construction, so a miss is a blocking
    or scoring bug."""
    from dynamodb_streaming_datalake_spark.operators.curation import (
        q_entity_resolution,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    df = q_entity_resolution(spark, sf_smoke)
    true_pairs = df.where("is_true_match").collect()
    n_parts = read_table(spark, sf_smoke, "part").count()
    assert len(true_pairs) == n_parts
    assert all(r["distance"] == 1 for r in true_pairs)


def test_curriculum_is_monotone_and_interleaved(spark, sf_smoke):
    """Stages are non-decreasing along the manifest, and inside any
    stage window the head of the ordering cycles through sources
    (round-robin rank is the primary within-stage key) rather than
    running one source to exhaustion."""
    from dynamodb_streaming_datalake_spark.operators.curation import (
        CURR_MANIFEST,
        CURR_STAGES,
        q_curriculum_order,
    )

    rows = q_curriculum_order(spark, sf_smoke).collect()
    assert len(rows) == min(CURR_MANIFEST, len(rows))
    stages = [r["stage"] for r in rows]
    assert stages == sorted(stages)
    assert all(1 <= s <= CURR_STAGES for s in stages)
    # within the first stage, the first len(sources) rows must all be
    # distinct sources (round-robin head)
    first_stage = [r for r in rows if r["stage"] == stages[0]]
    n_src = len({r["source"] for r in first_stage})
    head = [r["source"] for r in first_stage[:n_src]]
    assert len(set(head)) == n_src


def test_target_encoding_is_leakage_free(spark, sf_smoke):
    """The leakage property itself: for every row, the encoding equals
    the mean target of the OTHER rows in its category (checked against
    a Python recomputation), never the naive category mean when the
    row's own target deviates from it."""
    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    rows = read_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    by_cat = {}
    for r in rows:
        by_cat.setdefault(r["o_orderpriority"], []).append(
            (r["o_orderkey"], round(r["o_totalprice"], 6))
        )
    got = {
        r["o_orderkey"]: r
        for r in all_queries()["q_target_encoding"](spark, sf_smoke).collect()
    }
    import random

    random.seed(11)
    sample = random.sample(rows, min(50, len(rows)))
    for r in sample:
        cat = by_cat[r["o_orderpriority"]]
        if len(cat) == 1:
            assert got[r["o_orderkey"]]["loo_encoding"] is None
            continue
        others = [v for k, v in cat if k != r["o_orderkey"]]
        want = sum(others) / len(others)
        assert abs(got[r["o_orderkey"]]["loo_encoding"] - want) < 1e-3


def test_pack_nextfit_invariants_and_python_replay(spark, sf_smoke):
    """The packing arithmetic against a pure-Python next-fit-decreasing
    replay, plus the structural bounds: lower_bound <= n_bins (packing
    can't beat ceil(total/C)) and utilization = total/(bins*C)."""
    from dynamodb_streaming_datalake_spark.operators.sampling import (
        PACK_CONTEXT,
        q_pack_nextfit,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    docs = read_table(spark, sf_smoke, "documents").select(
        "source", "text"
    ).collect()
    by_src = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(
            min(len(r["text"].split(" ")), PACK_CONTEXT)
        )
    got = {r["source"]: r for r in q_pack_nextfit(spark, sf_smoke).collect()}
    assert set(got) == set(by_src)
    for src, lens in by_src.items():
        lens = sorted(lens, reverse=True)
        bins, rem = 1, PACK_CONTEXT - lens[0]
        for l in lens[1:]:
            if l <= rem:
                rem -= l
            else:
                bins, rem = bins + 1, PACK_CONTEXT - l
        r = got[src]
        assert r["n_bins"] == bins
        assert r["lower_bound"] <= r["n_bins"]
        # Spark round() is HALF_UP; Python round() is banker's —
        # 0.7890625 lands exactly on the boundary, so replicate HALF_UP
        from decimal import ROUND_HALF_UP, Decimal

        want_util = float(
            Decimal(repr(sum(lens) / (bins * PACK_CONTEXT))).quantize(
                Decimal("1e-6"), ROUND_HALF_UP
            )
        )
        assert abs(r["utilization"] - want_util) < 1e-9


def test_pps_sample_hierarchical_cumsum_and_semantics(spark, sf_smoke):
    """q_pps_sample: (a) the two-level cumulative sum equals the plain
    global prefix sum; (b) exactly PPS_K total draws come out; (c)
    every multiplicity matches the floor-difference definition; (d)
    any doc heavier than W/K is guaranteed selected (the PPS
    property)."""
    from dynamodb_streaming_datalake_spark.operators.sampling import (
        PPS_K,
    )
    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    got = {
        r["doc_id"]: r
        for r in all_queries()["q_pps_sample"](spark, sf_smoke).collect()
    }
    docs = sorted(
        (r["doc_id"], len(r["text"].split(" ")))
        for r in read_table(spark, sf_smoke, "documents")
        .select("doc_id", "text")
        .collect()
    )
    total = sum(w for _, w in docs)
    cum = 0
    n_draws = 0
    for doc_id, w in docs:
        before = cum
        cum += w
        m = (cum * PPS_K) // total - (before * PPS_K) // total
        n_draws += m
        if m > 0:
            assert doc_id in got, doc_id
            assert got[doc_id]["multiplicity"] == m, (doc_id, m)
            assert got[doc_id]["weight"] == w
        else:
            assert doc_id not in got, doc_id
        if w * PPS_K > total:
            assert m > 0  # heavier than W/K can never be skipped
    assert n_draws == PPS_K
    assert sum(r["multiplicity"] for r in got.values()) == PPS_K


def test_exact_quantile_twopass_equals_global_sort(spark, sf_smoke):
    """The two-pass bucket-refine selection returns exactly the k-th
    smallest element a naive global sort would: compare every reported
    quantile against the sorted value list at the same rank."""
    import math

    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        EXQ_QS,
    )
    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    got = {
        r["q"]: r
        for r in all_queries()["q_exact_quantile_twopass"](
            spark, sf_smoke
        ).collect()
    }
    vals = sorted(
        r["value"]
        for r in read_table(spark, sf_smoke, "events")
        .select("value")
        .collect()
    )
    n = len(vals)
    assert len(got) == len(EXQ_QS)
    for q in EXQ_QS:
        rank = max(1, math.ceil(q * n))
        g = got[q]
        assert g["n_total"] == n and g["target_rank"] == rank
        assert g["quantile_value"] == round(vals[rank - 1], 6), (q, g)


def test_skyline_is_exactly_the_undominated_set(spark, sf_smoke):
    """Brute-force check of the two-stage skyline: the returned points
    are precisely the undominated (price, date) points of the
    collapsed set."""
    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    got = {
        (r["price"], r["odate"])
        for r in all_queries()["q_skyline"](spark, sf_smoke).collect()
    }
    pts = {}
    for r in (
        read_table(spark, sf_smoke, "orders")
        .select("o_totalprice", "o_orderdate")
        .collect()
    ):
        k = (float(r["o_totalprice"]), r["o_orderdate"])
        pts[k] = pts.get(k, 0) + 1
    want = {
        p
        for p in pts
        if not any(
            (q[0] >= p[0] and q[1] > p[1]) or (q[0] > p[0] and q[1] >= p[1])
            for q in pts
        )
    }
    assert got == want, (got ^ want)


def test_grouped_weighted_quantile_equals_bruteforce(spark, sf_smoke):
    """The two-pass weighted quantile equals the brute-force weighted
    rank: per group, the smallest value whose cumulative quantity
    reaches ceil(q * W)."""
    import math

    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        WQ_QS,
    )
    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    got = {
        (r["group_key"], r["q"]): r
        for r in all_queries()["q_grouped_weighted_quantile"](
            spark, sf_smoke
        ).collect()
    }
    by_g: dict = {}
    for r in (
        read_table(spark, sf_smoke, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    ):
        by_g.setdefault(r["l_returnflag"], []).append(
            (float(r["l_extendedprice"]), int(r["l_quantity"]))
        )
    n_checked = 0
    for g, rows in by_g.items():
        rows.sort()
        total = sum(w for _, w in rows)
        for q in WQ_QS:
            target = max(1, math.ceil(q * total))
            cum = 0
            for val, w in rows:
                cum += w
                if cum >= target:
                    break
            r = got[(g, q)]
            assert r["total_weight"] == total and r["target"] == target
            assert r["quantile_value"] == round(val, 2), (g, q, r, val)
            n_checked += 1
    assert n_checked == len(got) == len(by_g) * len(WQ_QS)


def test_lsh_cap_engages_at_shipped_value_with_recall_price(spark):
    """r14 verdict item 2, executed: on the shared skew fixture (one
    identical-text cluster at 1.5x the cap + 100 organic near-dup
    families) the SHIPPED cap provably engages — every band bucket the
    cluster forms is dropped — while all organic pairs survive, and
    the recall price against UNCAPPED truth is exactly the cluster's
    pair mass. The same probe numbers are recorded per-round in
    bench_calibration.json:minhash_probe.lsh_cap."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        MAX_BUCKET_SIZE,
        MINHASH_SEEDS,
        _ROWS_PER_BAND,
        lsh_skew_fixture,
        minhash_bucket_stats,
        recall_at_cap_probe,
    )

    docs = lsh_skew_fixture(spark)
    stats = minhash_bucket_stats(docs)  # at the shipped cap
    n_bands = MINHASH_SEEDS // _ROWS_PER_BAND
    assert stats["n_dropped_buckets"] == n_bands, stats
    assert stats["max_bucket"] == 3 * MAX_BUCKET_SIZE // 2
    assert stats["max_surviving_bucket"] <= MAX_BUCKET_SIZE

    probe = recall_at_cap_probe(docs)
    n_clique = 3 * MAX_BUCKET_SIZE // 2
    clique_pairs = n_clique * (n_clique - 1) // 2
    organic_pairs = 100
    assert probe["n_truth_uncapped"] == clique_pairs + organic_pairs
    capped = probe[str(MAX_BUCKET_SIZE)]
    uncapped = probe["None"]
    # uncapped LSH finds everything (identical docs share every bucket)
    assert uncapped["recall"] == 1.0
    # the cap drops exactly the clique: every organic pair survives
    assert capped["n_hit"] == organic_pairs
    assert abs(
        capped["recall"] - organic_pairs / (clique_pairs + organic_pairs)
    ) < 1e-6
    # and the clique's loss is no loss at all for the PIPELINE: those
    # docs are byte-identical, which q_dedup_exact removes upstream of
    # any LSH pass — the cap only prices near-dup recall on content
    # exact-dedup cannot fold


def test_bucket_cap_derivation_matches_committed_measurement():
    """The shipped MAX_BUCKET_SIZE must BE the derivation's output on
    the committed fresh-content occupancy measurement — if a future
    calibration measures a bigger organic tail, this ratchet demands
    re-deriving the constant rather than silently outgrowing it."""
    import json
    from pathlib import Path

    from dynamodb_streaming_datalake_spark.operators.dedup import (
        MAX_BUCKET_SIZE,
        derive_bucket_cap,
    )

    cal = json.loads(
        (Path(__file__).resolve().parents[1] / "bench_calibration.json")
        .read_text()
    )
    fresh = cal["minhash_probe"]["sf1_fresh"]
    assert derive_bucket_cap(fresh["max_bucket"]) == MAX_BUCKET_SIZE, fresh
    # the replicated corpus's occupancy (the known 10-clique artifact)
    # must also clear the cap, so the cap never bites a shipped corpus
    assert cal["minhash_probe"]["sf1"]["max_bucket"] <= MAX_BUCKET_SIZE
    lsh_cap = cal["minhash_probe"]["lsh_cap"]
    assert lsh_cap["shipped_cap"] == MAX_BUCKET_SIZE
    assert lsh_cap["derived_cap_from_fresh"] == MAX_BUCKET_SIZE
    # recall-at-cap was recorded at both settings on an engaging fixture
    rac = lsh_cap["skew_fixture_recall_at_cap"]
    assert rac["None"]["recall"] == 1.0
    assert 0 < rac[str(MAX_BUCKET_SIZE)]["recall"] < 1


def test_derive_bucket_cap_properties():
    """The derivation's contract, property-tested: always a power of
    two, never below the floor, always >= headroom x the measurement,
    and monotone in the measurement (a bigger organic tail can only
    raise the cap)."""
    from hypothesis import given, strategies as st

    from dynamodb_streaming_datalake_spark.operators.dedup import (
        BUCKET_CAP_FLOOR,
        BUCKET_CAP_HEADROOM,
        derive_bucket_cap,
    )

    @given(st.floats(min_value=0, max_value=1e6, allow_nan=False))
    def check(x):
        cap = derive_bucket_cap(x)
        assert cap & (cap - 1) == 0 and cap > 0  # power of two
        assert cap >= BUCKET_CAP_FLOOR
        assert cap >= BUCKET_CAP_HEADROOM * max(1.0, x) / 2  # pow2 round-up
        assert cap >= derive_bucket_cap(x / 2) if x > 0 else True

    check()
    # the committed design points, explicitly
    assert derive_bucket_cap(9) == 128   # fresh-content 10x measurement
    assert derive_bucket_cap(1) == 16    # floor engages
    assert derive_bucket_cap(50) == 512  # the replicated-corpus artifact


def test_derive_bucket_cap_sanity_ceiling_warns():
    """A polluted occupancy measurement (r16 ADVICE: e.g. a boilerplate
    clique leaking into the fresh-content probe) must not silently
    disable the cap^2 candidate-join bound: derivations past
    BUCKET_CAP_SANITY_CEILING warn, in-contract ones stay silent."""
    import warnings as _w

    from dynamodb_streaming_datalake_spark.operators.dedup import (
        BUCKET_CAP_HEADROOM,
        BUCKET_CAP_SANITY_CEILING,
        derive_bucket_cap,
    )

    with _w.catch_warnings():
        _w.simplefilter("error")  # any warning -> failure
        assert derive_bucket_cap(9) == 128  # shipped design point: silent
    polluted = 2 * BUCKET_CAP_SANITY_CEILING / BUCKET_CAP_HEADROOM
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        cap = derive_bucket_cap(polluted)
    assert cap > BUCKET_CAP_SANITY_CEILING  # still monotone, not clamped
    assert any("sanity ceiling" in str(c.message) for c in caught)
