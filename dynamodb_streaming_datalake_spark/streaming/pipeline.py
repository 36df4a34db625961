"""The CDC hot path as Structured Streaming (SURVEY §3.1 rebuild).

Reference dataflow: Kinesis -> Firehose (buffer 60 s/16 MB) -> Lambda
transform -> gzip NDJSON hourly prefixes + error prefix
(``/root/reference/lib/dynamodb-streaming-datalake-stack.ts:197-245``).

Spark rebuild: ``readStream`` (file source in tests, Kinesis connector
in prod — the source is the ONLY swap point) -> the same
``cdc_transform`` used in batch -> checkpointed partitioned file sinks.

Semantics upgrades over the reference (SURVEY §1.5):
* Firehose buffering -> ``trigger(processingTime=...)`` or
  ``availableNow`` for deterministic drains;
* Firehose at-least-once + 2 retries -> checkpointed exactly-once file
  sink (strictly stronger: replayed micro-batches do not duplicate);
* the ok/error split runs as two independent checkpointed streams over
  the same source, preserving exactly-once on both zones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from dynamodb_streaming_datalake_spark.operators.cdc import (
    add_hour_partitions,
    cdc_transform,
)
from dynamodb_streaming_datalake_spark.sources.writers import PARTITION_COLS


def read_cdc_lines(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stand-in for the Kinesis consumer (A1): each file is
    a batch of JSON-line change events. maxFilesPerTrigger is the
    file-source twin of Firehose's buffer-size knob (A2)."""
    return spark.readStream.text(src_dir).withColumnRenamed("value", "json")


def start_lake_stream(
    spark: SparkSession,
    src_dir: str,
    lake_dir: str,
    checkpoint_dir: str,
    attributes: tuple[str, ...] | None = None,
    ingestion_ts: Column | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
) -> StreamingQuery:
    """ok-rows stream -> gzip NDJSON hourly-partitioned lake (A9).

    ``processing_time`` (e.g. ``"60 seconds"``) is the continuous-run
    cadence — the direct twin of the reference Firehose's 60 s buffer
    hint (``stack.ts:211-214``); it overrides ``available_now``.
    """
    raw = read_cdc_lines(spark, src_dir)
    ok, _ = cdc_transform(raw, attributes=attributes, ingestion_ts=ingestion_ts)
    out = add_hour_partitions(ok.drop("event_time"))
    writer = (
        out.writeStream.format("json")
        .partitionBy(*PARTITION_COLS)
        .option("compression", "gzip")
        .option("path", lake_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    elif available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_error_stream(
    spark: SparkSession,
    src_dir: str,
    err_dir: str,
    checkpoint_dir: str,
    ingestion_ts: Column | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """error-rows stream -> ``result=<type>/`` error zone (A8)."""
    raw = read_cdc_lines(spark, src_dir)
    _, err = cdc_transform(raw, ingestion_ts=ingestion_ts)
    writer = (
        err.writeStream.format("json")
        .partitionBy("result")
        .option("compression", "gzip")
        .option("path", err_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_dual_lake_streams(
    spark: SparkSession,
    src_dir: str,
    primary_dir: str,
    secondary_dir: str,
    primary_checkpoint: str,
    secondary_checkpoint: str,
    attributes: tuple[str, ...] | None = None,
    ingestion_ts: Column | None = None,
    available_now: bool = True,
    processing_time: str | None = None,
) -> tuple[StreamingQuery, StreamingQuery]:
    """Dual-destination delivery: the SAME transformed stream lands in
    two lakes, each behind its own checkpoint.

    Reference behavior: the stack duplicates the Firehose delivery to
    a second, cross-account bucket
    (``/root/reference/lib/dynamodb-streaming-datalake-stack.ts:250,
    424-461``) — two delivery streams fed from one source, so the DR /
    consumer-isolation copy is a full lake, not a sync job. The Spark
    twin is two independent checkpointed ``start_lake_stream``s over
    the same source: independent checkpoints mean one destination
    stalling, failing, or being replayed never blocks or duplicates
    the other (the same isolation the second Firehose stream buys),
    and each sink keeps its own exactly-once guarantee. The cost model
    also matches the reference: the source is read twice — cheap for
    a replayable stream/file source — rather than fanning one write
    out through a single process that would couple the destinations'
    failure domains.

    Returns ``(primary_query, secondary_query)``.
    """
    qs = tuple(
        start_lake_stream(
            spark,
            src_dir,
            lake_dir,
            ck,
            attributes=attributes,
            ingestion_ts=ingestion_ts,
            available_now=available_now,
            processing_time=processing_time,
        )
        for lake_dir, ck in (
            (primary_dir, primary_checkpoint),
            (secondary_dir, secondary_checkpoint),
        )
    )
    return qs[0], qs[1]
