"""Data model: DynamoDB change-event envelope & lake schemas.

Reference parity (SURVEY §1): the reference consumes DynamoDB's
Kinesis change-event envelope at
``/root/reference/resources/firehose_transformation.py:6-10`` —
``eventName`` plus ``dynamodb.NewImage`` / ``dynamodb.OldImage`` in
DynamoDB typed-AttributeValue JSON. The key schema is
``id: S`` (partition) + ``name: S`` (sort)
(``/root/reference/lib/dynamodb-streaming-datalake-stack.ts:72-79``).

An AttributeValue is a single-entry ``{typeTag: value}`` map with
typeTag in {S,N,B,BOOL,NULL,M,L,SS,NS,BS}; we model it as
``map<string,string>`` (the value is carried as its string form; M/L
carry JSON strings) — exactly the shape the reference's flatten loop
iterates (``firehose_transformation.py:12-14``).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: DynamoDB typed AttributeValue: {typeTag -> stringified value}
ATTRIBUTE_VALUE = T.MapType(T.StringType(), T.StringType())

#: an item image: {attribute name -> AttributeValue}
ITEM_IMAGE = T.MapType(T.StringType(), ATTRIBUTE_VALUE)

#: CDC ops the reference understands (firehose_transformation.py:6-10)
KNOWN_EVENTS = ("INSERT", "MODIFY", "REMOVE")

#: table key columns (dynamodb-streaming-datalake-stack.ts:72-79)
KEY_COLUMNS = ("id", "name")


def cdc_envelope_schema() -> T.StructType:
    """The Kinesis wire envelope, as the Lambda sees it post json.loads.

    Nested ``dynamodb`` struct mirrors the real DynamoDB stream record;
    ``approx_creation_ts`` carries the envelope's
    ApproximateCreationDateTime (the reference drops it; we keep it as
    event time for watermarking, SURVEY §2 B18).
    """
    return T.StructType(
        [
            T.StructField("eventID", T.StringType()),
            T.StructField("eventName", T.StringType()),
            T.StructField(
                "dynamodb",
                T.StructType(
                    [
                        T.StructField("ApproximateCreationDateTime", T.DoubleType()),
                        T.StructField("Keys", ITEM_IMAGE),
                        T.StructField("NewImage", ITEM_IMAGE),
                        T.StructField("OldImage", ITEM_IMAGE),
                    ]
                ),
            ),
        ]
    )


def lake_row_schema(attributes: tuple[str, ...]) -> T.StructType:
    """Schema of the flattened CDC-zone lake row exactly as
    ``streaming.pipeline.start_lake_stream`` writes it: eventID, the
    declared attributes as strings (the reference str()-coerces all
    types, firehose_transformation.py:12-14), and the two injected
    columns (:18-19). Pass this to ``sources.readers.read_cdc_zone`` so
    the scan is schema-declared, single-pass, and prunable."""
    fields = [T.StructField("eventID", T.StringType())]
    fields += [T.StructField(a, T.StringType()) for a in attributes]
    fields += [
        T.StructField("Event", T.StringType()),
        T.StructField("ingestion_timestamp", T.StringType()),
    ]
    return T.StructType(fields)
