"""Structured Streaming surface: the reference's Kinesis->Firehose->S3
hot path re-expressed as readStream -> cdc_transform -> partitioned
sink (``pipeline``), plus the watermarked windowing and stateful dedup
the reference lacks (SURVEY §2 B18-B19)."""
