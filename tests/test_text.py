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
