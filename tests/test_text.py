"""Text operators: langid branches the synthetic corpus can't reach."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.text import predicted_lang


def test_langid_character_ranges(spark):
    samples = [
        ("这是一个中文句子", "zh"),
        ("el niño está aquí", "es"),
        ("où êtes-vous à cet âge", "fr"),
        ("schöne grüße aus münchen", "de"),
        ("plain english text here", "en"),
        ("mixed 中文 and english", "zh"),  # CJK wins first
    ]
    df = spark.createDataFrame(samples, "text string, expected string")
    out = df.select("expected", predicted_lang(F.col("text")).alias("got")).collect()
    for r in out:
        assert r["got"] == r["expected"], f"{r['expected']} != {r['got']}"


def test_deterministic_sample_is_nested_and_stable(spark, sf_smoke):
    """Sampling invariants the docstring promises: the 5% sample is a
    strict subset of the 10% sample; repartitioning does not change the
    selected rows (rand()-based sample() can guarantee neither)."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.operators.sampling import (
        deterministic_sample,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    d = read_table(spark, sf_smoke, "documents")
    s10 = {r["doc_id"] for r in deterministic_sample(d, F.col("doc_id"), 0.10).collect()}
    s05 = {r["doc_id"] for r in deterministic_sample(d, F.col("doc_id"), 0.05).collect()}
    assert s05 <= s10 and len(s05) < len(s10)
    # partitioning-independent
    s10b = {
        r["doc_id"]
        for r in deterministic_sample(d.repartition(7), F.col("doc_id"), 0.10).collect()
    }
    assert s10b == s10
    # rate lands in the right ballpark
    assert abs(len(s10) / d.count() - 0.10) < 0.03


def test_misra_gries_never_drops_a_true_heavy_hitter(spark):
    """Planted eviction: 5000 distinct cold tokens + two hot tokens,
    k=20 counters — far fewer counters than cardinality, so eviction
    churns constantly, yet every item with global freq > N/k must
    survive in the candidate set (the MG guarantee q_heavy_hitters'
    exactness rests on)."""
    from dynamodb_streaming_datalake_spark.operators.text import (
        misra_gries_candidates,
    )

    rows = (
        [(f"cold{i}",) for i in range(5000)]
        + [("hot_a",)] * 600
        + [("hot_b",)] * 400
    )
    toks = spark.createDataFrame(rows, "token string").repartition(8)
    k = 20
    n = len(rows)
    cands = {
        r["token"] for r in misra_gries_candidates(toks, "token", k).collect()
    }
    # true hitters: freq > N/k = 300
    assert {"hot_a", "hot_b"} <= cands
    # and state stayed bounded: at most k survivors per partition
    assert len(cands) <= k * 8


def test_q_heavy_hitters_matches_exact_recount(spark, sf_smoke):
    """End-to-end: the two-pass sketch+verify output equals a plain
    exact groupBy/HAVING computed with DataFrame ops."""
    from dynamodb_streaming_datalake_spark.operators.text import (
        HH_K,
        q_heavy_hitters,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    got = {
        (r["token"], r["cnt"])
        for r in q_heavy_hitters(spark, sf_smoke).collect()
    }
    toks = read_table(spark, sf_smoke, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    n = toks.count()
    want = {
        (r["token"], r["cnt"])
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > n / float(HH_K))
        .collect()
    }
    assert got == want and len(got) > 0


def test_cdc_chunking_resyncs_after_prefix_insert(spark):
    """THE content-defined-chunking property: prepend one token to a
    long document and the chunk set must re-synchronize — most chunk
    hashes survive (fixed-size chunking would shift every chunk)."""
    import hashlib

    from dynamodb_streaming_datalake_spark.operators.text import (
        CDC_MASK,
        CDC_MIN_START,
        CDC_WINDOW,
    )
    from dynamodb_streaming_datalake_spark.registry import QUERIES

    # deterministic pseudo-random token stream, long enough for many chunks
    words = [
        f"w{int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) % 997}"
        for i in range(400)
    ]
    base = " ".join(words)
    shifted = "INSERTED " + base

    import dynamodb_streaming_datalake_spark.operators.text  # noqa: F401

    fn = QUERIES["q_doc_cdc_chunks"]

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(1, base, "en", "src", len(base)), (2, shifted, "en", "src", len(shifted))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(tmp, "documents.parquet"))
        rows = fn(spark, tmp).collect()
    h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    assert len(h1) > 3, "document too short to chunk — tune CDC_MASK"
    shared = h1 & h2
    # all but the first chunk(s) must re-sync and hash-match
    assert len(shared) >= len(h1) - 2, (len(shared), len(h1))


def test_vocab_growth_is_monotone_and_exact(spark, sf_smoke):
    """Vocabulary and token volume are cumulative, so every column is
    non-decreasing in the quarter index, new_types telescopes to the
    final vocabulary, and the final row covers the whole corpus."""
    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    rows = sorted(
        all_queries()["q_vocab_growth"](spark, sf_smoke).collect(),
        key=lambda r: r["quarter"],
    )
    assert [r["quarter"] for r in rows] == [1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        assert b["vocab"] >= a["vocab"]
        assert b["n_tokens"] >= a["n_tokens"]
        assert b["n_docs"] >= a["n_docs"]
    assert sum(r["new_types"] for r in rows) == rows[-1]["vocab"]
    d = read_table(spark, sf_smoke, "documents")
    assert rows[-1]["n_docs"] == d.count()


def test_ngram_novelty_extremes(spark, tmp_path):
    """Novelty semantics at the poles: a second half that verbatim
    repeats the first scores 0.0; a second half with entirely fresh
    shingles scores 1.0."""
    from dynamodb_streaming_datalake_spark.operators.text import (
        q_ngram_novelty,
    )

    old = "alpha beta gamma delta epsilon zeta"
    fresh = "omicron pi rho sigma tau upsilon"
    for texts, want in [
        ([old, old], 0.0),          # copy: nothing novel
        ([old, fresh], 1.0),        # disjoint: everything novel
    ]:
        sf = str(tmp_path / f"sf_{want}")
        spark.createDataFrame(
            [(i, t, "web", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, source string, n_chars int",
        ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
        rows = q_ngram_novelty(spark, sf).collect()
        assert len(rows) == 1
        assert rows[0]["novelty_rate"] == want


def test_dedup_incremental_finds_planted_lake_duplicates(spark, tmp_path):
    """Dedup-on-ingest semantics: incoming docs that verbatim-copy a
    lake doc are matched to exactly that doc at jaccard 1.0; fresh
    incoming docs produce no pair."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        q_dedup_incremental,
    )

    lake = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine",
        "red orange yellow green blue indigo violet colors",
        "north south east west compass rose navigation map",
    ]
    incoming = [lake[0], lake[2], "totally fresh words nobody wrote before now"]
    rows = [(i, t, "web", len(t)) for i, t in enumerate(lake + incoming)]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars int"
    ).write.parquet(f"{sf}/documents.parquet")

    got = {
        (r["doc_id"], r["lake_doc_id"]): r["jaccard"]
        for r in q_dedup_incremental(spark, sf).collect()
    }
    # mid = 0 + (7-0+1)//2 = 4 -> lake = 0..3, incoming = 4..6
    assert got == {(4, 0): 1.0, (5, 2): 1.0}


def test_rake_keywords_hand_computed_fixture(spark, tmp_path):
    """RAKE semantics on a hand-scored fixture: 'the quick brown fox is
    on a lazy dog' yields phrases 'quick brown fox' (each word deg 3,
    freq 1 -> word score 3, phrase score 9) and 'lazy dog' (deg 2,
    freq 1 -> phrase score 4), ranked in that order."""
    from dynamodb_streaming_datalake_spark.operators.text import (
        q_rake_keywords,
    )

    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        [(0, "the quick brown fox is on a lazy dog", "web", 37)],
        "doc_id long, text string, source string, n_chars int",
    ).write.parquet(f"{sf}/documents.parquet")
    rows = q_rake_keywords(spark, sf).collect()
    assert [(r["rank"], r["phrase"], r["rake_score"]) for r in rows] == [
        (1, "quick brown fox", 9.0),
        (2, "lazy dog", 4.0),
    ]
    assert rows[0]["n_words"] == 3 and rows[1]["n_words"] == 2


def test_chao1_matches_python_spectrum(spark, sf_smoke):
    from collections import Counter

    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    got = all_queries()["q_vocab_chao1"](spark, sf_smoke).collect()[0]
    docs = read_table(spark, sf_smoke, "documents").select("text").collect()
    c = Counter(t for r in docs for t in r["text"].split(" "))
    f1 = sum(1 for v in c.values() if v == 1)
    f2 = sum(1 for v in c.values() if v == 2)
    assert got["n_distinct"] == len(c)
    assert got["n_tokens"] == sum(c.values())
    assert (got["f1"], got["f2"]) == (f1, f2)
    chao1 = len(c) + f1 * (f1 - 1) / (2 * (f2 + 1))
    assert abs(got["chao1_estimate"] - chao1) < 1e-3
    assert got["chao1_estimate"] >= got["n_distinct"]


def test_capture_recapture_estimates_vocabulary(spark, sf_smoke):
    """Chapman from two hash halves should land within a reasonable
    band of the true distinct count (vocabularies overlap heavily, so
    the estimator is only mildly biased on this corpus)."""
    from dynamodb_streaming_datalake_spark.registry import all_queries

    got = all_queries()["q_capture_recapture"](spark, sf_smoke).collect()[0]
    assert got["v_both"] <= min(got["v1"], got["v2"])
    assert max(got["v1"], got["v2"]) <= got["true_distinct"]
    # the estimate must be at least the observed union lower bound and
    # within 3x of truth on this corpus
    assert got["chapman_estimate"] >= got["v_both"]
    assert got["chapman_estimate"] < 3 * got["true_distinct"]
