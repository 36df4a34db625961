"""Production stream source: Kinesis (SURVEY §2 A1).

The test harness replays the change stream from JSON-line files
(``streaming.pipeline.read_cdc_lines``); in production the same
pipeline reads the DynamoDB table's Kinesis stream — the reference's
``KinesisStreamAsSource`` hop
(``/root/reference/lib/dynamodb-streaming-datalake-stack.ts:197-203``).
This module is that ONE swap point: it builds the ``readStream`` with
the spark-sql-kinesis connector (not bundled here — any of the
published connectors with format name ``kinesis`` / ``aws-kinesis``
works) and normalizes the record payload to the same ``json: string``
column the file source produces, so everything downstream
(``cdc_transform`` onwards) is byte-for-byte the same code path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class KinesisSourceConfig:
    """Connector options, mirroring the reference's stream wiring:
    stream name ``ddb-exclusive-stream`` with 10 shards
    (``dynamodb-streaming-datalake-stack.ts:59-64``); shard count maps
    to source ``minPartitions`` on our side."""

    stream_name: str
    region: str
    endpoint_url: str | None = None
    starting_position: str = "TRIM_HORIZON"
    min_partitions: int | None = 10
    format_name: str = "aws-kinesis"
    extra: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        opts = {
            "streamName": self.stream_name,
            "region": self.region,
            "startingPosition": self.starting_position,
        }
        if self.endpoint_url:
            opts["endpointUrl"] = self.endpoint_url
        if self.min_partitions:
            opts["minPartitions"] = str(self.min_partitions)
        opts.update(self.extra)
        return opts


def read_kinesis_lines(spark: SparkSession, cfg: KinesisSourceConfig) -> DataFrame:
    """readStream over Kinesis -> one ``json: string`` column per
    record (the connector's ``data`` column is the base64-decoded
    payload bytes; cast to string = the Lambda's b64decode+utf8 step,
    ``firehose_transformation.py:27``).

    Raises a clear error when no Kinesis connector jar is on the
    classpath (this container has none — the file source covers tests).
    """
    reader = spark.readStream.format(cfg.format_name)
    for k, v in cfg.options().items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except Exception as exc:  # connector missing / misconfigured
        raise RuntimeError(
            f"Kinesis connector '{cfg.format_name}' unavailable — add the "
            "spark-sql-kinesis connector jar (spark.jars.packages) in "
            "production; tests use the file source replay instead."
        ) from exc
    return raw.select(F.col("data").cast("string").alias("json"))
