"""Reproducible sampling & mixture weighting for training-data pipelines.

``df.sample()`` / ``sampleBy()`` use per-partition RNG streams — results
change with partitioning, retries, and cluster size, which is exactly
what a dataset card cannot tolerate. The operators here sample by a
deterministic per-row hash instead: a row is in the p%% sample iff
``portable_hash60(key) %% DENOM < p*DENOM``. Properties that matter:

* **Reproducible anywhere** — same rows selected on 1 core or 1000
  executors, on Spark or (for auditing) in any engine with md5.
* **Nested** — the 5%% sample is a subset of the 10%% sample (same hash,
  smaller cutoff), so scaling a mix up/down never churns rows.
* **Stratifiable** — per-group rates are just a per-group cutoff.

Scale: pure row-local filters (one md5 per row); Catalyst pushes the
surviving columns' pruning into the scan; no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.functions.texthash import portable_hash60
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

#: hash-space denominator for rate cutoffs (1e6 -> rates to 4 decimals)
DENOM = 1_000_000


def hash_bucket(key: Column) -> Column:
    """Deterministic bucket in [0, DENOM) from a row key column."""
    return portable_hash60(key.cast("string")) % DENOM


def deterministic_sample(df: DataFrame, key: Column, rate: float) -> DataFrame:
    """Keep ~rate of rows, selected by key hash (stable + nested)."""
    return df.where(hash_bucket(key) < int(rate * DENOM))


def stratified_sample(
    df: DataFrame, key: Column, strata_col: str, rates: dict[str, float]
) -> DataFrame:
    """Per-stratum rates (the 'training mix' op): each stratum keeps its
    own hash-cutoff; strata missing from ``rates`` are dropped."""
    cutoff = None
    for stratum, rate in rates.items():
        branch = F.when(F.col(strata_col) == stratum, F.lit(int(rate * DENOM)))
        cutoff = branch if cutoff is None else cutoff.when(
            F.col(strata_col) == stratum, F.lit(int(rate * DENOM))
        )
    cutoff = cutoff.otherwise(F.lit(0))
    return df.where(hash_bucket(key) < cutoff)


_SQL_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % 1000000"


@query(
    "q_sample_deterministic",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_SQL_BUCKET} < 100000
    """,
)
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% deterministic sample of documents by doc_id hash — identical
    row set on any cluster size, any engine; the 5% sample would be a
    strict subset."""
    d = read_table(spark, sf_dir, "documents")
    return deterministic_sample(d, F.col("doc_id"), 0.10).select(
        "doc_id", "lang", "source"
    )


@query(
    "q_training_mix",
    oracle=f"""
    SELECT source, COUNT(*) AS n_docs
    FROM documents
    WHERE {_SQL_BUCKET} <
          CASE source
            WHEN 'src0' THEN 500000
            WHEN 'src1' THEN 900000
            WHEN 'src2' THEN 250000
            ELSE 0 END
    GROUP BY source
    """,
)
def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weighting: downsample each source to its target rate
    (src0 50%, src1 90%, src2 25%, rest dropped) with the same
    deterministic hash — the core 'build the training mix' operation,
    fully reproducible."""
    d = read_table(spark, sf_dir, "documents")
    mixed = stratified_sample(
        d, F.col("doc_id"), "source", {"src0": 0.50, "src1": 0.90, "src2": 0.25}
    )
    return mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
