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


def test_zorder_layout_skips_files_on_both_dimensions(spark, sf_oracle, tmp_path):
    """Z-ordered layout must let parquet min-max pruning skip files for
    a selective predicate on EITHER interleaved column — the
    data-skipping property a single-column sort gives only its own
    column. Measured against that single-sort baseline; row fidelity is
    checked exactly."""
    from dynamodb_streaming_datalake_spark.operators.layout import zorder_write
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    e = read_table(spark, sf_oracle, "events").select("event_id", "user_id", "value")
    zpath = str(tmp_path / "zorder")
    zorder_write(e, ("user_id", "value"), zpath, n_files=16)
    # baseline: same file count, sorted on user_id only
    spath = str(tmp_path / "usersort")
    e.repartitionByRange(16, "user_id").sortWithinPartitions(
        "user_id"
    ).write.mode("overwrite").parquet(spath)

    back = spark.read.parquet(zpath)
    assert back.count() == e.count()
    assert back.exceptAll(e).count() == 0 and e.exceptAll(back).count() == 0

    def touched(df, cond):
        return df.where(cond).select(F.input_file_name()).distinct().count()

    zfiles = back.select(F.input_file_name()).distinct().count()
    sorted_back = spark.read.parquet(spath)
    sfiles = sorted_back.select(F.input_file_name()).distinct().count()
    assert zfiles >= 8 and sfiles >= 8

    pred_u = F.col("user_id").between(10, 12)   # ~2% of users
    pred_v = F.col("value") < 5.0               # ~1-2% of values

    # z-order prunes meaningfully on BOTH dimensions...
    assert touched(back, pred_u) <= zfiles // 2, touched(back, pred_u)
    assert touched(back, pred_v) <= zfiles // 2, touched(back, pred_v)
    # ...whereas the single-column sort cannot prune the off dimension
    assert touched(sorted_back, pred_v) >= sfiles - 2
    # and z-order strictly beats it there
    assert touched(back, pred_v) < touched(sorted_back, pred_v)


def test_salted_join_rejects_outer_how(spark, sf_smoke):
    """right/full outer would emit unmatched build rows n_salts times —
    must be rejected loudly, not silently wrong."""
    o = read_table(spark, sf_smoke, "orders").select("o_orderkey")
    for bad in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="unsupported"):
            salted_join(o, o, ["o_orderkey"], how=bad)
    # supported spellings still work
    assert salted_join(o.limit(5), o, ["o_orderkey"], how="left_semi").count() == 5


def _partition_rows(spark, root, fmt):
    return sorted(map(tuple, spark.read.format(fmt).load(root).collect()))


def test_compaction_recovery_uncommitted_tmp_rolls_back(spark, tmp_path):
    """A crash during the tmp write (no manifest yet) leaves old files
    intact; the next run must drop the orphan tmp and recompact."""
    from dynamodb_streaming_datalake_spark.sources.maintenance import _fs

    e = read_table(spark, "/root/testdata/sf0.001", "events").drop("props")
    root = str(tmp_path / "lake")
    e.withColumn("h", F.hour("ts") % 2).repartition(4).write.partitionBy(
        "h"
    ).mode("overwrite").json(root)
    before = _partition_rows(spark, root, "json")
    part = list_leaf_partitions(spark, root)[0]
    # fake a mid-write crash: partial tmp, no _SUCCESS-backed manifest
    jvm, fs = _fs(spark, root)
    tmp = jvm.org.apache.hadoop.fs.Path(part + "/.compact-tmp")
    fs.mkdirs(tmp)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(tmp, "part-junk.json"), True)
    out.write(bytearray(b"{\"broken\": "))
    out.close()

    report = compact_partitions(spark, root, fmt="json")
    assert _partition_rows(spark, root, "json") == before
    assert part in report
    assert not fs.exists(tmp)


def test_compaction_recovery_committed_tmp_completes_swap(spark, tmp_path):
    """A crash after the manifest was written (but before rename/delete)
    must be rolled FORWARD: new files in, manifest's old files out."""
    from dynamodb_streaming_datalake_spark.sources.maintenance import (
        _fs,
        _write_manifest,
    )

    e = read_table(spark, "/root/testdata/sf0.001", "events").drop("props")
    root = str(tmp_path / "lake")
    e.withColumn("h", F.hour("ts") % 2).repartition(4).write.partitionBy(
        "h"
    ).mode("overwrite").json(root)
    before = _partition_rows(spark, root, "json")
    part = list_leaf_partitions(spark, root)[0]
    jvm, fs = _fs(spark, root)
    ppath = jvm.org.apache.hadoop.fs.Path(part)
    old_names = [
        s.getPath().getName()
        for s in fs.listStatus(ppath)
        if s.isFile() and not s.getPath().getName().startswith(("_", "."))
    ]
    assert len(old_names) > 1
    # committed tmp: real compacted rewrite + manifest, then "crash"
    tmp = part + "/.compact-tmp"
    spark.read.json(part).coalesce(1).write.mode("overwrite").json(tmp)
    tmp_path_h = jvm.org.apache.hadoop.fs.Path(tmp)
    _write_manifest(jvm, fs, tmp_path_h, old_names)

    compact_partitions(spark, root, fmt="json")
    assert _partition_rows(spark, root, "json") == before
    assert not fs.exists(tmp_path_h)
    remaining = [
        s.getPath().getName()
        for s in fs.listStatus(ppath)
        if s.isFile() and not s.getPath().getName().startswith(("_", "."))
    ]
    assert not set(remaining) & set(old_names)  # old files gone


def test_ivm_join_equals_full_recompute(spark, sf_smoke):
    """The incrementally merged join view must equal the from-scratch
    join-aggregate, key for key (the oracle proves it cross-engine;
    this pins it in-engine against an independently built frame)."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    got = {
        r["nation"]: (r["n_orders"], r["revenue"])
        for r in all_queries()["q_ivm_join"](spark, sf_smoke).collect()
    }
    orders = read_table(spark, sf_smoke, "orders")
    cust = read_table(spark, sf_smoke, "customer")
    nation = read_table(spark, sf_smoke, "nation")
    want = {
        r["n_name"]: (r["n"], r["rev"])
        for r in orders.join(
            cust, orders["o_custkey"] == cust["c_custkey"]
        )
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("rev"),
        )
        .collect()
    }
    assert got == want
