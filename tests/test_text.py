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
