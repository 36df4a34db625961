"""Lake sinks (SURVEY §2 A9, A14, A15).

* ``write_cdc_zone`` — the Firehose delivery path: gzip NDJSON under an
  hourly partition layout
  (``/root/reference/lib/dynamodb-streaming-datalake-stack.ts:220-222``).
  We use hive-style ``y=/m=/d=/h=`` directories instead of the raw
  ``yyyy/MM/dd/HH`` prefix so the partitioning is self-describing and
  Catalyst prunes it for free (B3).
* ``write_error_zone`` — the ``errorOutputPrefix`` parallel zone
  (stack ``:221``), partitioned by error ``result`` type.
* ``write_snapshot`` — truncate-then-load Parquet, the Glue job's
  ``purge_s3_path`` + ``write_dynamic_frame`` pair
  (``/root/reference/lib/glue_jobs/ddb_full_load.py:74-82``) ==
  ``mode("overwrite")``.

Scale: writers repartition by the partition columns first so each task
writes few files per partition (the small-files problem at 100 TB);
the reference's fixed ``repartition(cpu_count)``
(``ddb_full_load.py:67-69``) is replaced by AQE coalescing + an explicit
``target_partitions`` knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dynamodb_streaming_datalake_spark.operators.cdc import add_hour_partitions

PARTITION_COLS = ("y", "m", "d", "h")


def write_cdc_zone(
    df: DataFrame,
    path: str,
    ts_col: str = "ingestion_timestamp",
    coalesce_per_hour: bool = True,
) -> None:
    """Gzip-NDJSON, hourly hive partitions (A9)."""
    out = add_hour_partitions(df, ts_col)
    if coalesce_per_hour:
        # co-locate rows of one hour in one task -> one file per hour
        # partition instead of num_tasks files (small-files hygiene)
        out = out.repartition(*[c for c in PARTITION_COLS])
    (
        out.write.mode("append")
        .partitionBy(*PARTITION_COLS)
        .option("compression", "gzip")
        .json(path)
    )


def write_error_zone(err: DataFrame, path: str) -> None:
    """Failed records -> ``result=<type>/`` partitions (A8/A9)."""
    err.write.mode("append").partitionBy("result").option("compression", "gzip").json(
        path
    )


def write_snapshot(
    df: DataFrame, path: str, target_partitions: int | None = None
) -> None:
    """Overwrite-Parquet snapshot zone (A14+A15)."""
    if target_partitions:
        df = df.repartition(target_partitions)
    df.write.mode("overwrite").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Bucketed+sorted managed table — the co-located-join layout.

    Two fact tables bucketed the same way (same key, same bucket count)
    join with ZERO exchange and, when ``sort=True``, zero sort: each
    task zips bucket i with bucket i. At 100 TB this turns the recurring
    orders x lineitem (or snapshot x CDC) join from the cluster's
    biggest shuffle into a map-side merge — you pay the shuffle once at
    layout time, not on every query. (Plan asserted shuffle-free in
    ``tests/test_plans.py``.) Bucket count is fixed at table-creation:
    pick it for the TARGET scale (e.g. data_bytes / 256 MB), not the
    current one.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table)
