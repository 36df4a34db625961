"""The CDC transform pipeline (SURVEY §2 A3-A8), batch & streaming.

This is the Spark-first rebuild of the reference's Firehose Lambda
(``/root/reference/resources/firehose_transformation.py:5-39``): every
step is a pure DataFrame->DataFrame function built from JVM-side column
expressions — no Python row loop, no UDF — so one code path serves both
``spark.read`` (batch backfill) and ``spark.readStream`` (live CDC), and
whole-stage codegen keeps the hot path compiled.

Observable contract preserved from the reference:

* INSERT/MODIFY take ``NewImage``, REMOVE takes ``OldImage``
  (``firehose_transformation.py:6-10``) — ``select_image``.
* every attribute is flattened to its stringified inner value, type tag
  dropped (``:12-14``) — ``flatten_image``.
* ``Event`` (the op) and ``ingestion_timestamp`` (processing time) are
  appended (``:18-19``) — ``enrich``.

Deliberate divergences (SURVEY §2A quirks, decided not copied):

* an unknown ``eventName`` crashed the Lambda (unbound ``item_json``,
  ``:6-10``); here it is routed to the error output (A8) like Firehose's
  ``errorOutputPrefix`` path
  (``dynamodb-streaming-datalake-stack.ts:221``).
* ``ingestion_timestamp`` ties are broken by a monotonic per-batch
  ``seq`` column so latest-state dedup (B6) is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.model import (
    KNOWN_EVENTS,
    cdc_envelope_schema,
)

# ---------------------------------------------------------------------------
# A3 — decode / deserialize
# ---------------------------------------------------------------------------


def decode_base64(df: DataFrame, col: str = "data", out: str = "json") -> DataFrame:
    """Firehose delivers base64 payloads; the Lambda b64-decodes then
    utf-8 decodes (``firehose_transformation.py:27``)."""
    return df.withColumn(out, F.unbase64(F.col(col)).cast("string"))


def parse_envelope(df: DataFrame, json_col: str = "json") -> DataFrame:
    """``json.loads`` equivalent (``:34``): typed ``from_json`` against
    the declared envelope schema — schema-on-read, no inference pass."""
    return df.withColumn("env", F.from_json(F.col(json_col), cdc_envelope_schema()))


# ---------------------------------------------------------------------------
# A4 — CDC image dispatch (conditional projection)
# ---------------------------------------------------------------------------


def select_image(df: DataFrame, env_col: str = "env") -> DataFrame:
    """INSERT/MODIFY -> NewImage; REMOVE -> OldImage
    (``firehose_transformation.py:6-10``). Unknown events yield a null
    image and are split off by ``route_errors``."""
    e = F.col(f"{env_col}.eventName")
    return df.withColumn(
        "image",
        F.when(e.isin("INSERT", "MODIFY"), F.col(f"{env_col}.dynamodb.NewImage"))
        .when(e == "REMOVE", F.col(f"{env_col}.dynamodb.OldImage"))
        .otherwise(F.lit(None).cast("map<string,map<string,string>>")),
    )


# ---------------------------------------------------------------------------
# A5 — attribute-map flatten
# ---------------------------------------------------------------------------


def flatten_image(df: DataFrame, image_col: str = "image") -> DataFrame:
    """``{attr: {typeTag: val}} -> {attr: val}`` dropping the type tag —
    the reference's per-record dict loop (``:12-14``) as one
    higher-order-function expression (JVM-side, codegen'd)."""
    return df.withColumn(
        "attrs",
        F.transform_values(
            F.col(image_col), lambda _k, v: F.element_at(F.map_values(v), 1)
        ),
    )


def project_attributes(df: DataFrame, attributes: tuple[str, ...]) -> DataFrame:
    """Pivot the attrs map into declared string columns (the lake's
    queryable shape; columns absent in a record become null)."""
    cols = [F.col("attrs").getItem(a).alias(a) for a in attributes]
    keep = [c for c in df.columns if c not in ("attrs",)]
    return df.select(*keep, *cols)


# ---------------------------------------------------------------------------
# A6 — derived-column addition
# ---------------------------------------------------------------------------


def enrich(
    df: DataFrame,
    env_col: str = "env",
    ingestion_ts: Column | None = None,
) -> DataFrame:
    """Append ``Event`` + ``ingestion_timestamp``
    (``firehose_transformation.py:18-19``). Pass a literal/derived
    ``ingestion_ts`` for deterministic tests; default is processing time
    exactly like the reference's ``datetime.now()``."""
    ts = ingestion_ts if ingestion_ts is not None else F.current_timestamp()
    return (
        df.withColumn("Event", F.col(f"{env_col}.eventName"))
        .withColumn("ingestion_timestamp", ts.cast("string"))
        .withColumn(
            "event_time",
            F.timestamp_seconds(F.col(f"{env_col}.dynamodb.ApproximateCreationDateTime")),
        )
    )


def add_hour_partitions(df: DataFrame, ts_col: str = "ingestion_timestamp") -> DataFrame:
    """Derive the hourly lake partition columns — the Firehose prefix
    ``yyyy/MM/dd/HH`` (``dynamodb-streaming-datalake-stack.ts:222``) as
    first-class partition columns so Catalyst prunes them (B3)."""
    t = F.col(ts_col).cast("timestamp")
    return (
        df.withColumn("y", F.year(t))
        .withColumn("m", F.month(t))
        .withColumn("d", F.dayofmonth(t))
        .withColumn("h", F.hour(t))
    )


# ---------------------------------------------------------------------------
# A8 — per-record status routing
# ---------------------------------------------------------------------------


def route_errors(df: DataFrame, env_col: str = "env") -> tuple[DataFrame, DataFrame]:
    """Split ok vs error rows. Errors = unparseable JSON, unknown
    eventName (the reference would crash: NameError on unbound
    ``item_json``), or a missing image. Mirrors Firehose's
    ``result=<type>`` error prefix routing
    (``dynamodb-streaming-datalake-stack.ts:221``)."""
    is_parsed = F.col(env_col).isNotNull() & F.col(f"{env_col}.eventName").isNotNull()
    is_known = F.col(f"{env_col}.eventName").isin(*KNOWN_EVENTS)
    has_image = F.col("image").isNotNull()
    ok = df.where(is_parsed & is_known & has_image)
    err = df.where(~(is_parsed & is_known & has_image)).withColumn(
        "result",
        F.when(~is_parsed, F.lit("MalformedRecord"))
        .when(~is_known, F.lit("UnknownEvent"))
        .otherwise(F.lit("MissingImage")),
    )
    return ok, err


# ---------------------------------------------------------------------------
# composed pipeline
# ---------------------------------------------------------------------------


def cdc_transform(
    raw: DataFrame,
    json_col: str = "json",
    attributes: tuple[str, ...] | None = None,
    ingestion_ts: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full A3-A8 pipeline: raw JSON lines -> (lake rows, error rows).

    Works identically on batch and streaming DataFrames. ``attributes``
    pivots the attrs map into declared columns; None keeps the generic
    ``attrs`` map (schemaless mode, like the reference lake).
    """
    env = parse_envelope(raw, json_col)
    dispatched = select_image(env)
    flat = flatten_image(dispatched)
    enriched = enrich(flat, ingestion_ts=ingestion_ts)
    ok, err = route_errors(enriched)
    keep = ["eventID", "event_time", "attrs", "Event", "ingestion_timestamp"]
    ok = ok.select(F.col("env.eventID").alias("eventID"), *keep[1:])
    if attributes:
        ok = project_attributes(ok, attributes)
    err = err.select(
        F.col(json_col).alias("raw"),
        F.col("env.eventID").alias("eventID"),
        F.col("env.eventName").alias("eventName"),
        "result",
    )
    return ok, err


# ---------------------------------------------------------------------------
# typed attribute decode (SURVEY §7 risk register)
# ---------------------------------------------------------------------------

#: AttributeValue tag -> decoder. The reference str()-coerces everything
#: (``firehose_transformation.py:12-14``) and that stringly contract is
#: what ``flatten_image`` preserves; this is the OTHER half the risk
#: register demands: a lossless typed decode for queries that need real
#: numerics/booleans/structures. ``N`` becomes decimal(38,18) (DynamoDB
#: numbers are decimal strings with up to 38 digits of precision — a
#: double would corrupt them).
_TAG_DECODERS = {
    "S": lambda v: v,
    "N": lambda v: v.cast("decimal(38,18)"),
    "BOOL": lambda v: v == F.lit("true"),
    "NULL": lambda v: F.lit(None).cast("string"),
    "B": lambda v: F.unbase64(v),
    "L": lambda v: F.from_json(v, "array<string>"),
    "M": lambda v: F.from_json(v, "map<string,string>"),
    "SS": lambda v: F.from_json(v, "array<string>"),
    "NS": lambda v: F.transform(
        F.from_json(v, "array<string>"), lambda x: x.cast("decimal(38,18)")
    ),
    "BS": lambda v: F.transform(F.from_json(v, "array<string>"), F.unbase64),
}


def project_attributes_typed(
    df: DataFrame, spec: dict[str, str], image_col: str = "image"
) -> DataFrame:
    """Typed projection straight off the *tagged* image (not the
    stringly ``attrs``): ``spec`` maps attribute -> AttributeValue tag,
    e.g. ``{"salary": "N", "active": "BOOL", "tags": "L"}``. Each column
    gets the tag's native Spark type; a record carrying a different tag
    for the attribute yields null (tag mismatch = schema drift, visible
    instead of silently coerced).
    """
    cols = []
    for attr, tag in spec.items():
        if tag not in _TAG_DECODERS:
            raise ValueError(f"unknown AttributeValue tag {tag!r} for {attr!r}")
        raw = F.col(image_col).getItem(attr).getItem(tag)
        cols.append(_TAG_DECODERS[tag](raw).alias(attr))
    keep = [c for c in df.columns if c not in spec]
    return df.select(*keep, *cols)


def cdc_transform_typed(
    raw: DataFrame,
    spec: dict[str, str],
    json_col: str = "json",
    ingestion_ts: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """A3-A8 with the typed decode: same pipeline, but declared
    attributes land with native types instead of the reference's
    string coercion. Use for analytics zones; use ``cdc_transform`` for
    reference-faithful lake parity."""
    env = parse_envelope(raw, json_col)
    dispatched = select_image(env)
    enriched = enrich(dispatched, ingestion_ts=ingestion_ts)
    ok, err = route_errors(enriched)
    ok = project_attributes_typed(
        ok.select(
            F.col("env.eventID").alias("eventID"),
            "event_time",
            "image",
            "Event",
            "ingestion_timestamp",
        ),
        spec,
    ).drop("image")
    err = err.select(
        F.col(json_col).alias("raw"),
        F.col("env.eventID").alias("eventID"),
        F.col("env.eventName").alias("eventName"),
        "result",
    )
    return ok, err
