"""Driver-gated CDC-zone end-to-end round trip (B2 + B3 + A3-A9).

The reference's lake IS gzip NDJSON under hourly prefixes
(``/root/reference/lib/dynamodb-streaming-datalake-stack.ts:220-222``)
— but every other registered query scans the parquet fixtures, so the
NDJSON write -> prune -> read -> reconstruct path was pytest-only in
round 1. This query runs the WHOLE lake lifecycle inside the driver's
oracle gate:

1. synthesize DynamoDB stream envelopes deterministically FROM the
   ``events`` parquet (pure column expressions, so the DuckDB oracle
   can re-derive the identical records straight from the same parquet);
2. ``cdc_transform`` them (A3-A8: decode, image dispatch, flatten,
   enrich, route);
3. ``write_cdc_zone``: gzip NDJSON, hive ``y=/m=/d=/h=`` partitions (A9);
4. ``read_cdc_zone`` with a declared schema (B2, schema-on-read) and a
   one-day partition predicate (B3 — Catalyst prunes ~29/30 of the
   files; asserted in ``tests/test_plans.py``);
5. ``reconstruct_table``: newest-per-key minus REMOVE tombstones (B4+B6).

The oracle replays steps 1+4's filter+5 in SQL — if any step of the
round trip corrupted, reordered, or dropped a field, the value hash
diverges.

Determinism notes: the envelope's numeric attribute is stringified
through ``decimal(18,2)`` (events.value carries exactly 2 decimals, so
the cast is lossless and both engines print the same digits); event
time is whole-second (ApproximateCreationDateTime is a unix-seconds
epoch, like the real stream); eventID is zero-padded so the
string tie-break is total and engine-identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamodb_streaming_datalake_spark.cache import ensure_cached_build
from dynamodb_streaming_datalake_spark.operators.cdc import cdc_transform
from dynamodb_streaming_datalake_spark.operators.state import reconstruct_table
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import (
    read_cdc_zone,
    read_table,
    read_table_stream,
)
from dynamodb_streaming_datalake_spark.sources.writers import write_cdc_zone

#: attributes the synthetic table declares (id/name are the reference's
#: key schema, stack.ts:72-79; value is the numeric payload)
ZONE_ATTRIBUTES = ("id", "name", "value")


def synth_envelopes(events: DataFrame) -> DataFrame:
    """DynamoDB stream envelope JSON lines derived 1:1 from events rows.

    Mapping (all deterministic in event_id): every 10th event is a
    REMOVE (carrying OldImage, like the real stream), the rest split
    INSERT/MODIFY; the item key is (id=user_id, name=event_type) with a
    decimal-stringified value attribute — the reference's ``id``/
    ``name`` key schema with typed AttributeValue tags.
    """
    ename = (
        F.when(F.col("event_id") % 10 == 0, F.lit("REMOVE"))
        .when(F.col("event_id") % 2 == 0, F.lit("INSERT"))
        .otherwise(F.lit("MODIFY"))
    )
    image = F.create_map(
        F.lit("id"),
        F.create_map(F.lit("S"), F.col("user_id").cast("string")),
        F.lit("name"),
        F.create_map(F.lit("S"), F.col("event_type")),
        F.lit("value"),
        F.create_map(
            F.lit("N"), F.col("value").cast("decimal(18,2)").cast("string")
        ),
    )
    env = F.struct(
        F.format_string("ev-%010d", F.col("event_id")).alias("eventID"),
        ename.alias("eventName"),
        F.struct(
            F.unix_timestamp(F.col("ts").cast("timestamp")).alias(
                "ApproximateCreationDateTime"
            ),
            F.when(ename != "REMOVE", image).alias("NewImage"),
            F.when(ename == "REMOVE", image).alias("OldImage"),
        ).alias("dynamodb"),
    )
    return events.select(F.to_json(env).alias("json"), F.col("ts"))


def zone_row_schema() -> T.StructType:
    """Declared read schema for the round-trip zone (B2: schema-on-read,
    single-pass scan, no inference job)."""
    return T.StructType(
        [
            T.StructField("eventID", T.StringType()),
            T.StructField("event_time", T.TimestampType()),
            T.StructField("Event", T.StringType()),
            T.StructField("ingestion_timestamp", T.StringType()),
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("value", T.StringType()),
        ]
    )


def build_cdc_zone(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Steps 1-3: synthesize, transform, land as gzip NDJSON hive zone.

    The zone covers the log's first week — 168 hourly partitions, of
    which the read-back prunes to 24. (A week bounds the per-run write
    volume; the lifecycle under test — partitioned gzip write, pruned
    schema-declared read, reconstruction — is identical at any span.)
    """
    events = read_table(spark, sf_dir, "events").where(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp_ntz")
    )
    raw = synth_envelopes(events)
    ok, _err = cdc_transform(
        raw, attributes=ZONE_ATTRIBUTES, ingestion_ts=F.col("ts")
    )
    write_cdc_zone(ok, path)


def read_day_state(spark: SparkSession, path: str) -> DataFrame:
    """Steps 4-5: pruned read of one day's partitions, then current-state
    reconstruction (newest per id, REMOVE keys dropped)."""
    zone = read_cdc_zone(spark, path, schema=zone_row_schema())
    day = zone.where(
        (F.col("y") == 2024) & (F.col("m") == 1) & (F.col("d") == 1)
    )
    state = reconstruct_table(
        day.drop("y", "m", "d", "h"),
        keys=["id"],
        order_by=["event_time", "eventID"],
    )
    return state.select(
        "id",
        "name",
        "value",
        "Event",
        F.unix_timestamp("event_time").alias("event_time_s"),
    )


#: zone layout version — bump to invalidate previously cached zones when
#: the synthesis/write contract changes (e.g. the decimal(18,2) widening)
_ZONE_VERSION = "v2"


def ensure_cdc_zone(spark: SparkSession, sf_dir: str) -> str:
    """Build the gzip NDJSON zone for ``sf_dir`` once; reuse thereafter.

    The zone is deterministic in (sf_dir, layout version), so bench +
    correctness + tests share one copy instead of leaking a fresh
    168-partition write per invocation. Commit/sweep discipline is the
    shared one (`cache.ensure_cached_build`); the legacy
    ``cdc_zone_rt_`` layout is swept alongside older versions."""
    return ensure_cached_build(
        "cdc_zone",
        _ZONE_VERSION,
        sf_dir,
        lambda build_dir: build_cdc_zone(spark, sf_dir, build_dir),
        extra_stale_prefixes=("cdc_zone_rt_",),
    )


@query(
    "q_cdc_zone_roundtrip",
    oracle="""
    WITH src AS (
        SELECT CAST(user_id AS VARCHAR) AS id,
               event_type AS name,
               CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value,
               CASE WHEN event_id % 10 = 0 THEN 'REMOVE'
                    WHEN event_id % 2 = 0 THEN 'INSERT'
                    ELSE 'MODIFY' END AS Event,
               CAST(floor(epoch(ts)) AS BIGINT) AS event_time_s,
               'ev-' || lpad(CAST(event_id AS VARCHAR), 10, '0') AS eventID
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-02'
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY id ORDER BY event_time_s DESC, eventID DESC) AS rn
        FROM src
    )
    SELECT id, name, value, Event, event_time_s
    FROM ranked WHERE rn = 1 AND Event <> 'REMOVE'
    """,
)
def q_cdc_zone_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CDC-lake lifecycle, oracle-gated end to end (see module
    docstring). The written zone is cached per sf_dir (`ensure_cdc_zone`),
    so only the first invocation pays the 168-partition gzip write; every
    later run exercises the pruned schema-declared read + reconstruction."""
    path = ensure_cdc_zone(spark, sf_dir)
    return read_day_state(spark, path)


# ---------------------------------------------------------------------------
# B19 driver visibility: batch-reconstructible applyInPandasWithState twin
# ---------------------------------------------------------------------------
import itertools  # noqa: E402

_TWIN_SEQ = itertools.count()


def _zone_day_glob(path: str) -> str:
    """Glob for day 1 of the cached zone (the pruned-read target)."""
    return os.path.join(path, "y=2024", "m=1", "d=1", "h=*")


#: memory-sink view names created by this module, per prefix — dropping
#: by the tracked name avoids a catalog listTables sweep per invocation
#: (~150 ms of py4j/catalog wall, measured; round 18)
_TWIN_VIEWS: dict[str, list[str]] = {}


def _drop_twin_views(spark: SparkSession, prefix: str) -> None:
    """Memory sinks keep their full emission log in driver memory; drop
    leftovers from earlier invocations so repeated bench/correctness
    runs in one session don't accumulate them. Names are tracked at
    registration (`_register_twin_view`) — same-session leftovers are
    exactly the tracked ones, and a FRESH session has nothing to drop."""
    for name in _TWIN_VIEWS.pop(prefix, []):
        spark.catalog.dropTempView(name)


def _register_twin_view(prefix: str, name: str) -> None:
    _TWIN_VIEWS.setdefault(prefix, []).append(name)


@query(
    "q_stateful_latest_state",
    oracle="""
    WITH src AS (
        SELECT CAST(user_id AS VARCHAR) AS id,
               event_type AS name,
               CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value,
               CASE WHEN event_id % 10 = 0 THEN 'REMOVE'
                    WHEN event_id % 2 = 0 THEN 'INSERT'
                    ELSE 'MODIFY' END AS Event,
               CAST(floor(epoch(ts)) AS BIGINT) AS event_time_s,
               'ev-' || lpad(CAST(event_id AS VARCHAR), 10, '0') AS eventID
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-02'
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY id, name
            ORDER BY event_time_s DESC, eventID DESC) AS rn
        FROM src
    )
    SELECT id, name, Event, event_time_s, value
    FROM ranked WHERE rn = 1
    """,
)
def q_stateful_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 (`applyInPandasWithState`) under the driver's oracle gate:
    run the REAL streaming stateful operator — not a batch stand-in —
    over one day of the cached CDC zone with an ``availableNow``
    drain, then reconstruct the final per-key state from its update-
    mode emission log. The oracle replays the same newest-per-(id,name)
    fold in SQL (REMOVE tombstones included: the state op emits them
    like any other newest version — dropping them is `reconstruct`'s
    job, exercised by ``q_cdc_zone_roundtrip``).

    Emissions carry (event_time_us, event_id), so the reconstruction
    (row_number over both, descending) is total even when one key's
    state is emitted in several micro-batches.

    Scale: the state store holds one row per live key, partitioned by
    key across executors; the emission log is at most
    one-row-per-key-per-micro-batch; the final fold shuffles only the
    emission log, never the stream."""
    from pyspark.sql import Window

    from dynamodb_streaming_datalake_spark.streaming.stateful import (
        streaming_latest_state,
    )

    path = ensure_cdc_zone(spark, sf_dir)
    day = _zone_day_glob(path)
    stream = spark.readStream.schema(zone_row_schema()).json(day)
    latest = streaming_latest_state(stream, payload_cols=["value"])
    _drop_twin_views(spark, "stateful_twin_")
    name = f"stateful_twin_{next(_TWIN_SEQ)}"
    _register_twin_view("stateful_twin_", name)
    q = (
        latest.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("stateful twin stream did not drain in 600s")
    out = spark.table(name)
    w = Window.partitionBy("id", "name").orderBy(
        F.col("event_time_us").desc(), F.col("event_id").desc()
    )
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "id",
            "name",
            "Event",
            (F.col("event_time_us") / F.lit(1_000_000))
            .cast("bigint")
            .alias("event_time_s"),
            F.get_json_object("payload", "$.value").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# stream-static enrichment under the driver's oracle gate (round 5)
# ---------------------------------------------------------------------------


@query(
    "q_enrich_stream",
    oracle="""
    WITH src AS (
        SELECT CAST(user_id AS VARCHAR) AS id,
               event_type AS name,
               CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value,
               CASE WHEN event_id % 10 = 0 THEN 'REMOVE'
                    WHEN event_id % 2 = 0 THEN 'INSERT'
                    ELSE 'MODIFY' END AS Event,
               CAST(floor(epoch(ts)) AS BIGINT) AS event_time_s,
               'ev-' || lpad(CAST(event_id AS VARCHAR), 10, '0') AS eventID
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-02'
    ),
    dim AS (
        SELECT CAST(user_id AS VARCHAR) AS id,
               COUNT(*) AS user_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS user_total
        FROM events
        WHERE user_id % 2 = 0
        GROUP BY user_id
    )
    SELECT s.eventID, s.id, s.name, s.Event, s.event_time_s, s.value,
           d.user_events, d.user_total
    FROM src s LEFT JOIN dim d ON s.id = d.id
    """,
)
def q_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment (``streaming/joins.py:enrich_stream``)
    under the driver's oracle gate: the REAL streaming operator — a
    broadcast left join of a CDC-zone day STREAM against a per-user
    dimension snapshot aggregated from the events parquet — drained
    with ``availableNow`` into a memory sink. This is the canonical
    consumer pattern the reference lake serves (landing DynamoDB state
    next to facts, ``/root/reference/README.md:2``).

    The dimension covers only even user ids, so the left join's
    keep-unmatched-stream-rows semantics is itself oracle-checked
    (odd-id rows must survive with NULL enrichment columns).

    Scale: stream-static joins are stateless — the static side is
    re-resolved each micro-batch and ``F.broadcast`` pins it as the
    build side, so the stream is never re-shuffled; at 100 TB/day of
    CDC the per-batch cost is one broadcast of the (bounded) dimension
    delta, no state store growth.
    """
    from dynamodb_streaming_datalake_spark.streaming.joins import enrich_stream

    path = ensure_cdc_zone(spark, sf_dir)
    stream = spark.readStream.schema(zone_row_schema()).json(_zone_day_glob(path))
    dim = (
        read_table(spark, sf_dir, "events")
        .where(F.col("user_id") % 2 == 0)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("user_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("user_total"),
        )
        .select(
            F.col("user_id").cast("string").alias("id"),
            "user_events",
            "user_total",
        )
    )
    enriched = enrich_stream(
        stream.select("eventID", "id", "name", "Event", "event_time", "value"),
        dim,
        ["id"],
    )
    _drop_twin_views(spark, "enrich_twin_")
    name = f"enrich_twin_{next(_TWIN_SEQ)}"
    _register_twin_view("enrich_twin_", name)
    q = (
        enriched.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("enrichment stream did not drain in 600s")
    return spark.table(name).select(
        "eventID",
        "id",
        "name",
        "Event",
        F.unix_timestamp("event_time").alias("event_time_s"),
        "value",
        "user_events",
        "user_total",
    )


# ---------------------------------------------------------------------------
# small-file compaction under the driver's oracle gate (round 5)
# ---------------------------------------------------------------------------

_COMPACT_VERSION = "v1"


def ensure_compacted_zone(spark: SparkSession, sf_dir: str) -> str:
    """One day of the CDC zone written deliberately FRAGMENTED
    (coalesce_per_hour=False -> one file per shuffle task per hour),
    then compacted with the manifest-swap `compact_partitions` — built
    once per (version, sf_dir) via the shared cache discipline. The
    build asserts the compaction actually rewrote multi-file
    partitions, so the query on top is really reading post-swap
    files."""
    from dynamodb_streaming_datalake_spark.sources.maintenance import (
        compact_partitions,
    )

    def build(build_dir: str) -> None:
        events = read_table(spark, sf_dir, "events").where(
            F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp_ntz")
        )
        raw = synth_envelopes(events)
        ok, _err = cdc_transform(
            raw, attributes=ZONE_ATTRIBUTES, ingestion_ts=F.col("ts")
        )
        # force fragmentation: spread every hour's rows over 4 round-
        # robin tasks so each hive partition lands as ~4 small files —
        # the state a busy Firehose prefix is in before compaction
        write_cdc_zone(ok.repartition(4), build_dir, coalesce_per_hour=False)
        report = compact_partitions(
            spark, build_dir, fmt="json", compression="gzip", target_files=1
        )
        compacted = [b for b, _a in report.values() if b >= 2]
        if not compacted:
            raise RuntimeError(
                "compaction build produced no multi-file partitions - "
                "the query would not exercise the swap path"
            )

    return ensure_cached_build("compact", _COMPACT_VERSION, sf_dir, build)


@query(
    "q_compact_scan",
    oracle="""
    WITH src AS (
        SELECT CASE WHEN event_id % 10 = 0 THEN 'REMOVE'
                    WHEN event_id % 2 = 0 THEN 'INSERT'
                    ELSE 'MODIFY' END AS Event,
               CAST(user_id AS VARCHAR) AS id,
               'ev-' || lpad(CAST(event_id AS VARCHAR), 10, '0') AS eventID
        FROM events
        WHERE ts < TIMESTAMP '2024-01-02'
    )
    SELECT Event,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT id) AS n_ids,
           MIN(eventID) AS first_event,
           MAX(eventID) AS last_event
    FROM src GROUP BY Event
    """,
)
def q_compact_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction result-invisibility under the oracle gate: a day of
    CDC zone is written fragmented (one file per task per hour), the
    manifest-swap compactor rewrites every multi-file partition down to
    one file, and the per-Event row/key/eventID-extremum profile of the
    COMPACTED zone must hash-match the oracle computed from the raw
    events — one lost, duplicated, or corrupted row during the swap
    diverges the counts or the extrema.

    Scale: compaction runs per leaf partition (only recently-closed
    hours in production); the swap is rename-based so the partition is
    never empty mid-rewrite."""
    path = ensure_compacted_zone(spark, sf_dir)
    zone = read_cdc_zone(spark, path, schema=zone_row_schema())
    return zone.groupBy("Event").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("id").alias("n_ids"),
        F.min("eventID").alias("first_event"),
        F.max("eventID").alias("last_event"),
    )


# ---------------------------------------------------------------------------
# custom-stateful gap sessionization under the gate (round 11)
# ---------------------------------------------------------------------------

_SESS_SRC_VERSION = "v1"


def _ensure_session_source(spark: SparkSession, sf_dir: str) -> str:
    """Events (4 columns) plus one far-future flush sentinel per user
    (event_id = -1, 3 h past the last real event — beyond the session
    gap, so it closes every open session without ever joining one),
    written once per sf_dir."""
    def build(build_dir: str) -> None:
        ev = read_table(spark, sf_dir, "events").select(
            "ts", "user_id", "event_id", "value"
        )
        sentinel_ts = ev.agg(
            (F.max("ts") + F.expr("INTERVAL 3 HOUR")).alias("ts")
        )
        sentinels = (
            ev.select("user_id")
            .distinct()
            .crossJoin(F.broadcast(sentinel_ts))
            .select(
                "ts",
                "user_id",
                F.lit(-1).cast("long").alias("event_id"),
                F.lit(0.0).alias("value"),
            )
        )
        ev.unionByName(sentinels).repartition(2).write.parquet(
            os.path.join(build_dir, "src")
        )

    return ensure_cached_build("sesssrc", _SESS_SRC_VERSION, sf_dir, build)


@query(
    "q_stream_sessionize",
    oracle=None,  # set below: shares q_sessionize's oracle verbatim
)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization as a CUSTOM stateful streaming operator
    (`applyInPandasWithState`, append mode) under the oracle gate: the
    REAL stream drains with availableNow over the cached
    events+sentinels source, per-user open sessions live in the state
    store across micro-batches, and each session is emitted exactly
    once when a >30 min gap (or the per-user flush sentinel) closes
    it. Hash-equality against batch q_sessionize's oracle IS the
    stream==batch proof — numbering, bounds, counts, and the exact
    decimal value sums all transfer.

    Scale: state is one open session per live user, partitioned by
    user across executors; each micro-batch does one vectorized sort +
    gap walk per touched user; the emission log is sessions, not
    events."""
    from dynamodb_streaming_datalake_spark.streaming.stateful import (
        streaming_sessionize,
    )

    path = _ensure_session_source(spark, sf_dir)
    src = os.path.join(path, "src")
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    sessions = streaming_sessionize(stream)
    _drop_twin_views(spark, "sess_twin_")
    name = f"sess_twin_{next(_TWIN_SEQ)}"
    _register_twin_view("sess_twin_", name)
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("session twin stream did not drain in 600s")
    return spark.table(name).select(
        "user_id",
        "session_no",
        "n_events",
        "start_us",
        "end_us",
        "duration_us",
        "sum_value",
    )


def _share_sessionize_oracle() -> None:
    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        _SQL_SESSIONIZE,
    )
    from dynamodb_streaming_datalake_spark.registry import ORACLE

    ORACLE["q_stream_sessionize"] = _SQL_SESSIONIZE


_share_sessionize_oracle()


# ---------------------------------------------------------------------------
# stream enrichment against an SCD2 dimension AS-OF event time (round 11)
# ---------------------------------------------------------------------------


@query(
    "q_stream_enrich_scd2",
    oracle="""
    WITH scd2 AS (
        SELECT user_id,
               event_id AS version_event_id,
               CAST(ROW_NUMBER() OVER w AS INT) AS version_no,
               CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
               CAST(epoch_us(LEAD(ts) OVER w) AS BIGINT) AS valid_to_us
        FROM events
        WHERE event_type IN ('signup', 'purchase')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    clicks AS (
        SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
        FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.ts_us,
           s.version_no, s.valid_from_us
    FROM clicks c
    LEFT JOIN scd2 s
      ON s.user_id = c.user_id
     AND c.ts_us >= s.valid_from_us
     AND (s.valid_to_us IS NULL OR c.ts_us < s.valid_to_us)
    """,
)
def q_stream_enrich_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment against a VERSIONED dimension: each
    click in the stream joins the SCD2 version that was valid AT its
    event time (interval containment on top of the user_id equi-join)
    — the production dimension-lookup q_enrich_stream's latest-state
    join cannot answer, because "the user's plan when they clicked" is
    not "the user's plan now". Clicks before a user's first version
    survive with NULL enrichment (pinned by the left join under the
    gate). The REAL stream drains with availableNow; stream-static
    joins are stateless, so the SCD2 table re-resolves per micro-batch
    with no state-store growth.

    Scale: the dimension is versions (bounded by change volume, not
    stream volume); the join is equi on user_id with the interval test
    as residual — never a theta join — and the stream side is never
    re-shuffled when the dimension broadcasts."""
    from pyspark.sql.window import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    scd2 = (
        ev.where(F.col("event_type").isin("signup", "purchase"))
        .select(
            F.col("user_id").alias("dim_user_id"),
            F.row_number().over(w).cast("int").alias("version_no"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias(
                "valid_from_us"
            ),
            F.unix_micros(nxt.cast("timestamp")).alias("valid_to_us"),
        )
    )
    stream = (
        read_table_stream(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
    )
    enriched = stream.join(
        F.broadcast(scd2),
        (F.col("user_id") == F.col("dim_user_id"))
        & (F.col("ts_us") >= F.col("valid_from_us"))
        & (
            F.col("valid_to_us").isNull()
            | (F.col("ts_us") < F.col("valid_to_us"))
        ),
        "left",
    )
    _drop_twin_views(spark, "scd2_twin_")
    name = f"scd2_twin_{next(_TWIN_SEQ)}"
    _register_twin_view("scd2_twin_", name)
    q = (
        enriched.select(
            "event_id", "user_id", "ts_us", "version_no", "valid_from_us"
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("scd2 enrichment stream did not drain in 600s")
    return spark.table(name).select(
        "event_id", "user_id", "ts_us", "version_no", "valid_from_us"
    )
