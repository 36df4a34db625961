"""Skew-salted joins and lake compaction: result-identical physical
rewrites (salting spreads hot keys; compaction merges small files —
neither may change a single row)."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.skew import (
    SALT_COL,
    explode_build_side,
    salted_join,
)
from dynamodb_streaming_datalake_spark.sources.maintenance import (
    compact_partitions,
    list_leaf_partitions,
)
from dynamodb_streaming_datalake_spark.sources.readers import read_table


def test_salted_join_matches_plain_join(spark, sf_smoke):
    """Row-identical to the plain join — including a deliberately hot
    key (one order id owns half the probe side)."""
    l = read_table(spark, sf_smoke, "lineitem")
    hot = l.withColumn(
        "l_orderkey",
        F.when(F.col("l_linenumber") % 2 == 0, F.lit(1)).otherwise(
            F.col("l_orderkey")
        ),
    ).select("l_orderkey", "l_quantity", "l_linenumber")
    o = read_table(spark, sf_smoke, "orders").select("o_orderkey", "o_orderpriority")
    build = o.withColumnRenamed("o_orderkey", "l_orderkey")

    plain = hot.join(build, ["l_orderkey"])
    salted = salted_join(hot, build, ["l_orderkey"], n_salts=4)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_distribution_spreads_hot_key(spark, sf_smoke):
    l = read_table(spark, sf_smoke, "lineitem").limit(1000)
    from dynamodb_streaming_datalake_spark.operators.skew import salt_probe_side

    salted = salt_probe_side(l, l.columns, n_salts=8)
    n_buckets = salted.select(SALT_COL).distinct().count()
    assert n_buckets == 8  # every salt value actually used
    build = read_table(spark, sf_smoke, "orders").limit(10)
    assert explode_build_side(build, 8).count() == 80


@pytest.mark.parametrize("fmt", ["json", "parquet"])
def test_compaction_preserves_rows_and_pruning(spark, tmp_path, fmt):
    """Many small files per hour partition -> 1; same rows, layout
    intact — for both lake formats (gzip NDJSON CDC zone, parquet
    snapshot zone)."""
    e = read_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "h", F.hour("ts") % 4
    )
    if fmt == "json":
        e = e.drop("props")  # json round-trips props as string; skip it
    root = str(tmp_path / "lake")
    # 8 writer tasks per partition -> many small files
    e.repartition(8).write.partitionBy("h").mode("overwrite").format(fmt).save(root)
    before = spark.read.format(fmt).load(root)
    before_rows = sorted(map(tuple, before.collect()))
    parts = list_leaf_partitions(spark, root)
    assert len(parts) == 4 and all("h=" in p for p in parts)
    assert all(len(glob.glob(f"{p.removeprefix('file:')}/part-*")) > 1 for p in parts)

    report = compact_partitions(
        spark, root, fmt=fmt, compression="gzip" if fmt == "json" else "snappy"
    )
    assert set(report) == set(parts)
    for p in parts:
        n_data = len(
            [
                f
                for f in glob.glob(f"{p.removeprefix('file:')}/*")
                if not f.split("/")[-1].startswith(("_", "."))
            ]
        )
        assert n_data == 1, p

    after = spark.read.format(fmt).load(root)
    assert sorted(map(tuple, after.collect())) == before_rows
    # partition pruning still works on the compacted layout
    from dynamodb_streaming_datalake_spark.plans import explain_str

    pruned = after.where(F.col("h") == 2)
    assert "PartitionFilters" in explain_str(pruned)
