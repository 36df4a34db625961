"""Stream-stream interval join (SURVEY §2 B18 extension).

The reference pipeline has no join capability at all — correlating two
event streams (e.g. attributing purchases to the clicks that preceded
them) requires landing both in the lake and batch-joining later. The
idiomatic Structured Streaming replacement is a watermarked
stream-stream inner join with a time-interval condition: Spark buffers
each side in the state store only up to
``watermark + interval width``, so state is bounded and late rows are
dropped consistently on both sides.

The builder is mode-agnostic (works on batch frames unchanged, which is
how the parity test and the DuckDB-oracle-checked batch twin
``q_range_join_clicks`` pin its semantics).

Scale: the join shuffles both streams on ``user_id``; per-key state is
bounded by the 1-hour band times the per-user click rate. This is the
streaming analogue of the bucketed batch range join — the band bound is
what keeps state (streaming) or duplication (batch) finite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INTERVAL = "INTERVAL 1 HOUR"
WATERMARK = "30 minutes"


def _prep(df: DataFrame, ts_col: str) -> DataFrame:
    if df.isStreaming:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return df.withWatermark(ts_col, WATERMARK)
    return df


def purchase_click_attribution(events: DataFrame) -> DataFrame:
    """Inner interval join: every (purchase, same-user click) pair with
    the click in the hour before the purchase. Output keys are stable
    integers so streaming (ltz) and batch (ntz) runs compare equal."""
    p = _prep(
        events.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        ),
        "p_ts",
    )
    c = _prep(
        events.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        ),
        "c_ts",
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(INTERVAL))
        & (F.col("c_ts") < F.col("p_ts")),
        "inner",
    )
    return joined.select(
        "purchase_id",
        "click_id",
        F.unix_micros(F.col("c_ts").cast("timestamp")).alias("click_ts_us"),
    )


def enrich_stream(stream: DataFrame, dim: DataFrame, keys: list[str]) -> DataFrame:
    """Stream-static enrichment join — the canonical consumer pattern
    the reference lake serves (CDC events + a dimension snapshot).

    Structured Streaming plans a stream-static join stateless-ly: the
    static side is re-resolved every micro-batch (so a dimension
    REFRESHED in place is picked up without restarting the query), and
    no state store is involved. ``F.broadcast`` pins the build side —
    a shuffled join would re-exchange every micro-batch of the stream.

    Mode-agnostic like the other builders: on batch frames it is the
    plain broadcast equi-join, which is how the parity test pins the
    semantics. Left join keeps un-matched stream rows (an event whose
    dimension row is late must not be dropped)."""
    return stream.join(F.broadcast(dim), keys, "left")


def purchase_click_attribution_outer(events: DataFrame) -> DataFrame:
    """LEFT OUTER interval join: every purchase, with its preceding-
    hour same-user clicks when they exist and a NULL click row when
    none do — the attribution report that must also show the
    UN-attributed purchases (organic conversions). Semantically
    distinct state machine from the inner join: Structured Streaming
    can only emit the null-extended row once the watermark proves no
    matching click can still arrive, so unmatched results trail the
    matched ones by the watermark delay — which is why the outer
    variant is its own operator, not a flag.

    Scale: same shuffle and state bound as the inner join (state is
    watermark + interval per side); the null-extension adds no state,
    only an emit-on-eviction rule."""
    p = _prep(
        events.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        ),
        "p_ts",
    )
    c = _prep(
        events.where(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        ),
        "c_ts",
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(INTERVAL))
        & (F.col("c_ts") < F.col("p_ts")),
        "leftOuter",
    )
    return joined.select(
        "purchase_id",
        "click_id",
        F.unix_micros(F.col("c_ts").cast("timestamp")).alias("click_ts_us"),
    )
