"""Benchmark decontamination for training corpora.

Before training on a crawled corpus you must remove documents that
overlap the evaluation set, or benchmark scores are meaningless. The
standard recipe (used by GPT-3/PaLM-style pipelines) is n-gram overlap:
a training document is *contaminated* if it shares at least one n-word
shingle with any eval document.

Shape at scale (the part that matters at 100 TB):

* The eval set is small by construction — its distinct shingle hashes
  fit in memory, so the overlap test is a **broadcast semi-join**: the
  corpus side is never shuffled, each task streams its partition once.
* Shingling is row-local (``transform`` over a split array — no UDF,
  stays in whole-stage codegen); shingles are reduced to portable
  60-bit md5 hashes *before* the join so the broadcast table is
  integers, not strings.
* Output is per-doc counts — the only shuffle is a groupBy over the
  (tiny) matched subset.

Here the "eval set" is carved from ``documents`` itself with the
deterministic hash sample (``operators.sampling``): bucket < 5% ⇒ eval,
rest ⇒ training candidates. Reproducible on any cluster size, and the
DuckDB oracle replays the identical definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.functions.texthash import (
    portable_hash60,
    sql_portable_hash60,
    sql_word_shingles,
    word_shingles,
)
from dynamodb_streaming_datalake_spark.operators.sampling import DENOM, hash_bucket
from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

#: shingle width — 4 words: long enough that overlap means real shared
#: phrasing in this corpus, short enough to catch partial copies
NGRAM = 4
#: deterministic hash-sample rate that defines the stand-in eval set
EVAL_RATE = 0.05

_SQL_BUCKET = f"({sql_portable_hash60('CAST(doc_id AS VARCHAR)')} % {DENOM})"
_SQL_SHINGLES = sql_word_shingles("text", NGRAM)


def contaminated_docs(
    docs: DataFrame, eval_docs: DataFrame, n: int = NGRAM
) -> DataFrame:
    """Per-doc overlap counts: (doc_id, n_overlap) for every doc in
    ``docs`` sharing >= 1 n-gram with ``eval_docs``.

    ``eval_docs`` is broadcast as a distinct set of shingle hashes; the
    big side sees one row-local explode + a map-side hash-join.
    """
    def shingle_hashes(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            F.explode(word_shingles("text", n)).alias("sh"),
        ).withColumn("sh_hash", portable_hash60(F.col("sh"))).drop("sh")

    eval_hashes = shingle_hashes(eval_docs).select("sh_hash").distinct()
    return (
        shingle_hashes(docs)
        .join(F.broadcast(eval_hashes), "sh_hash")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh_hash").alias("n_overlap"))
    )


@query(
    "q_decontaminate",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, {_SQL_BUCKET} AS bucket,
               unnest({_SQL_SHINGLES}) AS s
        FROM documents
    ),
    ev AS (
        SELECT DISTINCT {sql_portable_hash60('s')} AS sh_hash
        FROM sh WHERE bucket < {int(EVAL_RATE * DENOM)}
    ),
    tr AS (
        SELECT DISTINCT doc_id, {sql_portable_hash60('s')} AS sh_hash
        FROM sh WHERE bucket >= {int(EVAL_RATE * DENOM)}
    )
    SELECT tr.doc_id, COUNT(DISTINCT tr.sh_hash) AS n_overlap
    FROM tr JOIN ev USING (sh_hash)
    GROUP BY tr.doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs contaminated by {NGRAM}-gram overlap with the
    (deterministic 5%-sample) eval set, with overlap counts. The
    training pipeline drops these doc_ids before mixing."""
    d = read_table(spark, sf_dir, "documents")
    cut = int(EVAL_RATE * DENOM)
    bucket = hash_bucket(F.col("doc_id"))
    eval_docs = d.where(bucket < cut)
    train_docs = d.where(bucket >= cut)
    return contaminated_docs(train_docs, eval_docs, NGRAM)



_fmt(q_decontaminate, NGRAM=NGRAM)
