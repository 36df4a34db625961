"""dynamodb_streaming_datalake_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
project ``HsiehShuJeng/dynamodb-streaming-datalake`` (an AWS CDK DynamoDB
CDC -> Kinesis -> Firehose -> S3 data-lake pipeline plus a Glue full-load
job), re-expressed as:

* a batch + Structured-Streaming CDC transform pipeline
  (``operators.cdc``, ``streaming``) with the same observable contract as
  the reference Lambda transform
  (``/root/reference/resources/firehose_transformation.py``),
* partitioned lake sinks and readers (``sources``) mirroring the
  reference's gzip-NDJSON CDC zone and Parquet snapshot zone,
* the downstream relational query surface the lake is designed for
  (``operators.relational``, ``operators.state``) — latest-state dedup,
  snapshot(+)CDC merge, joins/aggregates/windows,
* large-scale training-data-pipeline operators: deduplication
  (``operators.dedup``), similarity search (``operators.similarity``),
  text analysis (``operators.text``), multimodal column plumbing
  (``operators.multimodal``).

Everything is built on the public PySpark DataFrame / SQL / Structured
Streaming APIs; Catalyst + AQE do the physical planning.
"""

__version__ = "0.1.0"
