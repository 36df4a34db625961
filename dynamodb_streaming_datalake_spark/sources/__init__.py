"""Lake sources & sinks: parquet snapshot zone, gzip-NDJSON CDC zone."""

from dynamodb_streaming_datalake_spark.sources.readers import (  # noqa: F401
    TABLES,
    load_catalog,
    read_cdc_zone,
    read_table,
)
