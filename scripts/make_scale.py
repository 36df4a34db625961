#!/usr/bin/env python
"""Build a larger-scale bench dataset by replicating a driver-generated
sf directory with key offsets (default: sf0.1 x 10 ~= sf1).

The driver ships parquet only up to sf0.1 (TESTDATA.md); the scaling
evidence the design review wants — "do the flagship plans stay linear
at 10x?" — needs a bigger input. Replication preserves referential
integrity: every key column in a joined-table family shifts by the same
``rep * STRIDE``, so orders<->lineitem<->customer<->part<->supplier and
documents<->embeddings keep exactly their original join fan-outs, and
fixed dimensions (region, nation) stay fixed like real dimensions do.
Non-key payloads repeat verbatim — which for the dedup family is the
REALISTIC direction (a 10x corpus with 10-way exact duplicates is what
a crawl looks like).

Replication is one narrow pass per table (explode over rep ids), not a
10-way union: reads scale, no driver materialization anywhere.

Usage: python scripts/make_scale.py [--src DIR] [--out DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

#: key columns that shift per replica, grouped so joined families share
#: the same stride multiple
OFFSET_COLUMNS: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
#: fixed dimensions: copied once, never replicated
FIXED_TABLES = ("region", "nation")

STRIDE = 100_000_000  # > any base key at any shipped sf; rep*STRIDE << 2^63


def build(spark, src: str, out: str, reps: int) -> None:
    from dynamodb_streaming_datalake_spark.sources.readers import (
        TABLES,
        read_table,
    )

    rep_col = F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("rep")
    for name in TABLES:
        df = read_table(spark, src, name)
        if name in FIXED_TABLES:
            scaled = df
        else:
            scaled = df.select("*", rep_col)
            for c in OFFSET_COLUMNS.get(name, ()):
                scaled = scaled.withColumn(
                    c, F.col(c) + F.col("rep").cast("bigint") * F.lit(STRIDE)
                )
            scaled = scaled.drop("rep")
        scaled.write.mode("overwrite").parquet(f"{out}/{name}.parquet")


def build_fresh_docs(spark, src: str, out: str, reps: int) -> None:
    """Fresh-CONTENT 10x documents corpus (r15 verdict item 3): the
    replicated sf1 set repeats text verbatim, so every doc is a
    rep-clique and LSH bucket occupancy grows with the replication
    factor BY CONSTRUCTION — useful for exact-dup realism, useless for
    answering "does band-bucket occupancy stay bounded when the corpus
    is 10x of NEW content". Here rep 0 keeps the original text and
    every other replica rewrites EVERY word with a rep-specific suffix
    (one HOF pass, row-local): all shingles differ across replicas, so
    within-replica near-dup structure is preserved 10x over while no
    cross-replica collisions exist — the fresh-crawl shape. The bench
    probes this corpus's occupancy distribution and derives the LSH
    bucket cap from it (operators/dedup.derive_bucket_cap)."""
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    df = read_table(spark, src, "documents")
    rep_col = F.explode(F.sequence(F.lit(0), F.lit(reps - 1))).alias("rep")
    scaled = df.select("*", rep_col)
    scaled = scaled.withColumn(
        "doc_id", F.col("doc_id") + F.col("rep").cast("bigint") * F.lit(STRIDE)
    ).withColumn(
        "text",
        F.when(F.col("rep") == 0, F.col("text")).otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(
                        w, F.lit("~"), F.col("rep").cast("string")
                    ),
                ),
                " ",
            )
        ),
    ).drop("rep")
    scaled.write.mode("overwrite").parquet(f"{out}/documents.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent / ".benchdata" / "sf1"))
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from dynamodb_streaming_datalake_spark.session import get_spark

    spark = get_spark(app_name="make_scale", extra_conf={"spark.ui.enabled": "false"})
    build(spark, args.src, args.out, args.reps)
    print(f"wrote {args.reps}x {args.src} -> {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
