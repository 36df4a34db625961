"""UDF/UDAF surface (SURVEY §2 B20 / A16).

The reference's escape hatch is one opaque per-record Python Lambda
(``/root/reference/resources/firehose_transformation.py:23-39``). The
Spark-native equivalents, each exercised somewhere in this engine:

* scalar ``pandas_udf`` (Arrow-batched, vectorized)      — here
* grouped-agg ``pandas_udf`` (UDAF)                      — here
* grouped-map ``applyInPandas``                          — operators.dedup (GEMM)
* ``mapInPandas``                                        — operators.multimodal
* ``applyInPandasWithState``                             — streaming.stateful

Row-at-a-time Python UDFs are deliberately absent: every hot path in
this engine is either whole-stage-codegen column expressions or
Arrow-batched pandas; a per-row Python UDF is 10-100x slower and is the
one reference behavior we do NOT replicate literally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

# return types as DataType objects: a DDL string here would trigger
# schema parsing at import time, which needs a live SparkSession —
# modules must stay importable session-free (registry.load_all()).


@pandas_udf(DoubleType())
def l2_norm(emb: pd.Series) -> pd.Series:
    """Scalar pandas UDF: L2 norm of an array<float> column, float64.
    One Arrow batch in, one vectorized numpy pass out."""
    m = np.stack(emb.to_numpy()).astype(np.float64)
    return pd.Series(np.sqrt((m * m).sum(axis=1)))


@pandas_udf(DoubleType())
def mean_of(v: pd.Series) -> float:
    """Grouped-agg pandas UDF (UDAF): mean of a double column — the
    group's values arrive as one Series per group."""
    return float(v.to_numpy().mean())


@pandas_udf(LongType())
def count_of(v: pd.Series) -> int:
    """Grouped-agg pandas UDF: group size (pandas UDAFs cannot be mixed
    with built-in aggregates in one ``agg``, so the count is a UDAF too)."""
    return int(len(v))


@query(
    "q_udf_vector_norms",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vectors,
           round(AVG(sqrt(list_dot_product(embedding::DOUBLE[],
                                           embedding::DOUBLE[]))), 6)
             AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
)
def q_udf_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20 end-to-end: scalar pandas UDF (per-vector L2 norm) feeding a
    grouped-agg pandas UDF (per-label mean), rounded to 6dp where both
    engines' float64 summation orders agree."""
    e = read_table(spark, sf_dir, "embeddings")
    norms = e.select("label", l2_norm("embedding").alias("norm"))
    return norms.groupBy("label").agg(
        count_of("norm").alias("n_vectors"),
        F.round(mean_of("norm"), 6).alias("avg_norm"),
    )
