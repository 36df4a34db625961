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

    Crash safety (plain-FS, no table format — so read-committed per
    *file*, not per partition): the rewrite lands in
    ``<part>/.compact-tmp`` first, then a manifest of the old file names
    is written, then the new files are renamed INTO the partition
    (fresh UUID part-names, never colliding with the old ones), and only
    then are the old files deleted. The partition is therefore never
    empty; data is never stranded in a dot-dir Spark ignores. A reader
    overlapping the rename->delete window can observe both copies
    briefly (duplicate rows) — acceptable for an append-only CDC zone
    consumed through newest-per-key reconstruction; use Delta/Iceberg
    where snapshot isolation is required. A crash anywhere is repaired
    by ``_recover_partition`` on the next run: with a committed tmp +
    manifest the swap is completed (idempotently); otherwise the tmp is
    rolled back and the old files still hold every row. At 100 TB you
    run this per recently-closed hour partition (the only ones still
    accumulating files), not the whole lake.
    """
    jvm, fs = _fs(spark, root)
    report: dict[str, tuple[int, int]] = {}
    for part in list_leaf_partitions(spark, root):
        ppath = jvm.org.apache.hadoop.fs.Path(part)
        _recover_partition(jvm, fs, ppath)
        data_files = [
            s.getPath()
            for s in fs.listStatus(ppath)
            if s.isFile() and not s.getPath().getName().startswith(("_", "."))
        ]
        if len(data_files) < min_files:
            continue
        df = spark.read.format(fmt).load(part)
        tmp = f"{part}/{_TMP_DIR}"
        (
            df.coalesce(target_files)
            .write.mode("overwrite")
            .format(fmt)
            .option("compression", compression)
            .save(tmp)
        )
        tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
        _write_manifest(
            jvm, fs, tmp_path, [f.getName() for f in data_files]
        )
        n_new = _swap_in(jvm, fs, ppath, tmp_path)
        report[part] = (len(data_files), n_new)
    return report


_TMP_DIR = ".compact-tmp"
_MANIFEST = ".compact-manifest"


def _write_manifest(jvm, fs, tmp_path, old_names: list[str]) -> None:
    """Persist the to-be-deleted file names inside the committed tmp dir.
    Its existence marks the point of no return: from here the swap is
    completed (never rolled back), so every old file is deleted exactly
    once even across crashes."""
    out = fs.create(jvm.org.apache.hadoop.fs.Path(tmp_path, _MANIFEST), True)
    out.write(bytearray("\n".join(old_names).encode("utf-8")))
    out.close()


def _read_manifest(jvm, fs, tmp_path) -> list[str] | None:
    mpath = jvm.org.apache.hadoop.fs.Path(tmp_path, _MANIFEST)
    if not fs.exists(mpath):
        return None
    reader = jvm.java.io.BufferedReader(
        jvm.java.io.InputStreamReader(fs.open(mpath), "UTF-8")
    )
    names: list[str] = []
    line = reader.readLine()
    while line is not None:
        if line:
            names.append(line)
        line = reader.readLine()
    reader.close()
    return names


def _swap_in(jvm, fs, ppath, tmp_path) -> int:
    """Complete a committed compaction: rename new files into the
    partition, then delete the manifest's old files, then drop the tmp
    dir. Idempotent — every step skips already-done work, so it can be
    re-run after a crash at any point."""
    old_names = _read_manifest(jvm, fs, tmp_path) or []
    n_new = 0
    for s in fs.listStatus(tmp_path):
        name = s.getPath().getName()
        if s.isFile() and not name.startswith(("_", ".")):
            fs.rename(s.getPath(), jvm.org.apache.hadoop.fs.Path(ppath, name))
            n_new += 1
    for name in old_names:
        fs.delete(jvm.org.apache.hadoop.fs.Path(ppath, name), False)
    fs.delete(tmp_path, True)
    return n_new


def _recover_partition(jvm, fs, ppath) -> None:
    """Repair an interrupted compaction of ``ppath``. Committed tmp
    (manifest present) -> finish the swap; uncommitted -> roll back by
    deleting the tmp (old files are untouched at that stage)."""
    tmp_path = jvm.org.apache.hadoop.fs.Path(ppath, _TMP_DIR)
    if not fs.exists(tmp_path):
        return
    if _read_manifest(jvm, fs, tmp_path) is not None:
        _swap_in(jvm, fs, ppath, tmp_path)
    else:
        fs.delete(tmp_path, True)
