"""Lake sinks (A9/A14/A15): partition layout, gzip, overwrite, pruning."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.cdc import cdc_transform
from dynamodb_streaming_datalake_spark.sources.cdc_fixture import generate_fixture
from dynamodb_streaming_datalake_spark.sources.writers import (
    write_cdc_zone,
    write_error_zone,
    write_snapshot,
)

ATTRS = ("id", "name", "Designation", "salary", "active", "tags", "address")
def EVENT_TS():
    return F.timestamp_seconds(F.col("env.dynamodb.ApproximateCreationDateTime"))


def _ok_rows(spark, **kw):
    fx = generate_fixture(**kw)
    raw = spark.createDataFrame([(l,) for l in fx.json_lines()], "json string")
    return cdc_transform(raw, attributes=ATTRS, ingestion_ts=EVENT_TS())


def test_cdc_zone_roundtrip_gzip_hourly(spark, tmp_path):
    ok, _ = _ok_rows(spark, n_keys=50, n_events=400, unknown_rate=0.0, hours=6)
    path = str(tmp_path / "cdc")
    write_cdc_zone(ok.drop("event_time"), path)

    gz = glob.glob(f"{path}/y=*/m=*/d=*/h=*/*.json.gz")
    assert gz, "expected gzip ndjson files under hourly hive partitions"

    back = spark.read.json(path)
    assert back.count() == ok.count()
    assert {"y", "m", "d", "h"} <= set(back.columns)


def test_partition_pruning_reads_fewer_files(spark, tmp_path):
    """B3: a predicate on the hour partition columns must prune the
    scan to that hour's files — the whole point of the reference's
    yyyy/MM/dd/HH prefix (stack :222)."""
    ok, _ = _ok_rows(spark, n_keys=50, n_events=400, unknown_rate=0.0, hours=6)
    path = str(tmp_path / "cdc")
    write_cdc_zone(ok.drop("event_time"), path)

    back = spark.read.json(path)
    pruned = back.where(F.col("h") == 2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "(h" in plan.split("PartitionFilters")[1][:80]
    # and the rows really are only hour 2
    assert pruned.select("h").distinct().collect() == [(2,)]


def test_error_zone_partitioned_by_result(spark, tmp_path):
    _, err = _ok_rows(spark, n_keys=20, n_events=200, unknown_rate=0.2)
    path = str(tmp_path / "errors")
    write_error_zone(err, path)
    assert glob.glob(f"{path}/result=UnknownEvent/*.json.gz")


def test_snapshot_overwrite_truncates(spark, tmp_path):
    """A14: purge-then-write == mode('overwrite') — second write wins."""
    ok, _ = _ok_rows(spark, n_keys=30, n_events=200, unknown_rate=0.0)
    path = str(tmp_path / "snap")
    write_snapshot(ok.drop("event_time"), path)
    first = spark.read.parquet(path).count()
    assert first == ok.count()

    subset = ok.drop("event_time").limit(10)
    write_snapshot(subset, path, target_partitions=2)
    assert spark.read.parquet(path).count() == 10
