"""Windowed aggregation (SURVEY §2 B18): tumbling / sliding / session.

The reference's only time control is Firehose buffering (60 s / 16 MB,
``/root/reference/lib/dynamodb-streaming-datalake-stack.ts:211-214``) —
no watermarks, no event-time semantics. The idiomatic Spark replacement
is ``window()`` / ``session_window()`` aggregation with
``withWatermark`` for late-data bounds.

Each builder below is a pure DataFrame function that works on BOTH a
batch frame (registered here as oracle-checked queries) and a streaming
frame (exercised with ``trigger(availableNow=True)`` in
``tests/test_streaming.py``). ``withWatermark`` is applied only when the
input is streaming — on batch it would be a no-op anyway.

Scale: windowed aggs shuffle on (window, key) with map-side partial
aggregation; session windows shuffle on user and merge sessions in
state — the streaming state store is the bottleneck dimension at 100 TB
(bounded by watermark horizon x active keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.relational import dsum, _sql_dsum
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

WATERMARK = "30 minutes"


def _with_watermark(df: DataFrame, ts_col: str) -> DataFrame:
    if df.isStreaming:
        # watermarks need TIMESTAMP (ltz); sf fixtures are ntz
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return df.withWatermark(ts_col, WATERMARK)
    return df


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per (hour, event_type) counts + value sums."""
    e = _with_watermark(events, "ts")
    return (
        e.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), "sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Hourly windows every 30 min — each event lands in 2 windows."""
    e = _with_watermark(events, "ts")
    return (
        e.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
        )
    )


def session_counts(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user sessions separated by >= gap of inactivity."""
    e = _with_watermark(events, "ts")
    return (
        e.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )
    )


@query(
    "q_window_tumbling",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {_sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY 1, 2
    """,
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(read_table(spark, sf_dir, "events"))


@query(
    "q_window_sliding",
    oracle="""
    WITH starts AS (
        SELECT to_timestamp(
                 floor(epoch(ts) / 1800) * 1800 - k.k * 1800)::TIMESTAMP AS ws
        FROM events, (SELECT unnest([0, 1]) AS k) k
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events
    FROM starts GROUP BY 1
    """,
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows; the oracle derives each event's two containing
    window starts arithmetically (floor to slide grid, minus one slide)."""
    return sliding_counts(read_table(spark, sf_dir, "events"))


@query(
    "q_window_session",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 10 MINUTE
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-min gap); the oracle is the classic
    gaps-and-islands formulation, which must agree exactly with Spark's
    session_window merging."""
    return session_counts(read_table(spark, sf_dir, "events"))


@query(
    "q_stream_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           epoch_us(c.ts) AS click_ts_us
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts < p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def q_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked STREAM-STREAM interval join
    (``streaming.joins.purchase_click_attribution``): every purchase
    paired with the same user's clicks in the preceding hour. The
    builder is mode-agnostic; ``tests/test_streaming.py`` drains the
    identical builder as a real two-sided streaming join
    (state bounded by watermark + interval) and asserts it equals this
    batch result — so the driver row proves the semantics of both.

    Scale: equi-join on user_id with the band as join residual —
    hash/SMJ, one shuffle per side; the streaming plan holds per-key
    state only for watermark + 1 h of each side."""
    from dynamodb_streaming_datalake_spark.streaming.joins import (
        purchase_click_attribution,
    )

    return purchase_click_attribution(read_table(spark, sf_dir, "events"))


@query(
    "q_stream_attribution_outer",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           epoch_us(c.ts) AS click_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts < p.ts
    """,
)
def q_stream_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the watermarked LEFT OUTER stream-stream interval
    join (``streaming.joins.purchase_click_attribution_outer``):
    q_stream_attribution keeps only attributed purchases; this keeps
    every purchase, null-extending the organic ones — and in streaming
    that null extension is a different state machine (the row may only
    emit once the watermark proves no click can still arrive), which
    is why the outer variant registers separately.
    ``tests/test_streaming.py`` drains the same builder as a genuine
    two-sided outer streaming join and asserts set-equality with this
    batch result.

    Scale: identical shuffle/state bound to the inner join; the
    unmatched side adds only an emit-on-watermark-eviction rule."""
    from dynamodb_streaming_datalake_spark.streaming.joins import (
        purchase_click_attribution_outer,
    )

    return purchase_click_attribution_outer(
        read_table(spark, sf_dir, "events")
    )
