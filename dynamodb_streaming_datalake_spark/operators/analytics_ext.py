"""Event-analytics operators beyond plain SQL shapes: as-of join,
range (interval) join, pivot, portable statistical moments, histogram.

These serve the CDC lake's event side (SURVEY.md §2B: the reference's
hourly-partitioned event zone, `/root/reference/lib/
dynamodb-streaming-datalake-stack.ts:222`, exists to answer exactly
this kind of behavioral query). Spark has no built-in as-of or
band-range join, so both are re-expressed as compositions of built-in
operators that keep Catalyst in charge (SURVEY.md §2 guidance:
composition first, UDF last):

* as-of join  -> union + ordered window fill-forward (one shuffle,
  scales as sort-within-partition of user history);
* range join  -> time-bucket equi-join + residual range filter (turns
  an O(n^2) theta join into an equi-join with bounded duplication).

Float determinism: moments are computed from decimal(38,6) power sums
(exact, order-independent) and combined in double with the same
formula in both engines — no reliance on matching the engines'
internal Welford implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

DEC38 = "decimal(38,6)"

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


# --------------------------------------------------------------------------
# As-of join: each purchase matched to the user's latest prior view
# --------------------------------------------------------------------------
@query(
    "q_asof_join",
    oracle="""
    SELECT p.event_id, p.ts AS purchase_ts,
           (SELECT MAX(v.ts) FROM events v
             WHERE v.event_type = 'view'
               AND v.user_id = p.user_id
               AND v.ts <= p.ts) AS asof_view_ts
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward, inclusive): for every purchase, the
    user's most recent view at-or-before the purchase time; NULL when
    the user never viewed before buying.

    Spark lacks a native as-of join; the scalable composition is
    union + window fill-forward: tag both sides, sort each user's
    merged history once, and carry the last view timestamp forward.
    One shuffle on user_id, O(history) per user — versus the oracle's
    correlated subquery, which would rescan views per purchase.
    Ties (view and purchase at the same microsecond) order the view
    first, matching the oracle's ``v.ts <= p.ts``.
    """
    e = read_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .select("user_id", "ts", F.lit(0).alias("is_p"), F.lit(None).cast("long").alias("event_id"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.lit(1).alias("is_p"), "event_id")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = v.unionByName(p).withColumn(
        "asof_view_ts",
        F.last(F.when(F.col("is_p") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return merged.where(F.col("is_p") == 1).select(
        "event_id", F.col("ts").alias("purchase_ts"), "asof_view_ts"
    )


# --------------------------------------------------------------------------
# Range (interval) join: clicks within the hour preceding each purchase
# --------------------------------------------------------------------------
@query(
    "q_range_join_clicks",
    oracle="""
    SELECT p.event_id, COUNT(c.ts) AS n_clicks
    FROM events p
    LEFT JOIN events c
      ON c.event_type = 'click'
     AND c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts <  p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def q_range_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: how many same-user clicks happened in the
    preceding hour (interval join with a [ts-1h, ts) band).

    Spark plans a raw time-band theta join as BroadcastNestedLoop —
    quadratic. The scale path: bucket both sides to the hour and
    equi-join on (user_id, bucket), probing each purchase into its own
    and the previous hour's bucket (a 1-hour band can only span two
    hourly buckets), then apply the exact band as a residual filter.
    Duplication factor is exactly 2 on the probe side; the join is a
    plain hash join on (user_id, bucket).
    """
    e = read_table(spark, sf_dir, "events")
    clicks = (
        e.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.date_trunc("hour", F.col("ts")).alias("c_bucket"),
        )
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.date_trunc("hour", F.col("ts")),
                    F.date_trunc("hour", F.col("ts") - F.expr("INTERVAL 1 HOUR")),
                )
            ),
        )
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("bucket") == F.col("c_bucket"))
        & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("ts")),
        "left",
    )
    return joined.groupBy("event_id").agg(F.count("c_ts").alias("n_clicks"))


# --------------------------------------------------------------------------
# Interval-overlap join: interval x interval, bucket + residual
# --------------------------------------------------------------------------
# q_range_join_clicks joins a POINT into an interval band; the other
# classic shape is interval x interval OVERLAP — sessions vs promo
# windows, downtime vs job runs. A raw overlap theta join
# (a_start <= b_end AND b_start <= a_end) plans as a nested loop; the
# scale pattern is the same bucket trick: both interval sets carry a
# coarse time-bucket key (here the day both derive from), the join is
# a hash join on that key, and the exact overlap predicate runs as a
# residual filter. Both interval sets are built per-day, so no
# interval spans buckets and no dedup pass is needed — when intervals
# may span buckets, explode them to every bucket they touch and
# dedupe pairs, exactly like the purchase side above.


@query(
    "q_interval_join",
    oracle="""
    WITH a AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               min(ts) AS a_start, max(ts) AS a_end
        FROM events GROUP BY 1, 2
    ),
    b AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               min(ts) AS b_start, max(ts) AS b_end
        FROM events GROUP BY 1, 2
    ),
    p AS (
        SELECT b.event_type, a.day,
               (epoch_us(least(a.a_end, b.b_end))
                - epoch_us(greatest(a.a_start, b.b_start))) AS ov_us
        FROM a JOIN b
          ON a.day = b.day
         AND a.a_start <= b.b_end AND b.b_start <= a.a_end
    )
    SELECT event_type,
           CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(ov_us) AS BIGINT) AS total_overlap_us
    FROM p GROUP BY event_type
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: each user's daily activity interval
    [first ts, last ts] against each event type's daily activity
    interval, matched where the intervals overlap, reporting per type
    the days touched, overlapping (user, type) pairs, and the total
    overlap duration in exact epoch microseconds. The overlap length
    is integer microsecond arithmetic (least/greatest of exact
    timestamps), so the sums are bit-identical across engines.

    Scale: never a nested loop — the day is the equi key (Catalyst
    plans a broadcast hash join on it; the type-day side is |types| x
    |days| rows) and the overlap predicate is a residual filter on the
    matched pairs. With intervals that span buckets the same plan adds
    an explode-to-touched-buckets + pair dedup; with two corpus-sized
    interval sets the hash join shuffles on the bucket key instead of
    broadcasting — the shape survives both."""
    e = read_table(spark, sf_dir, "events")
    a = e.groupBy(
        "user_id", F.to_date("ts").alias("a_day")
    ).agg(F.min("ts").alias("a_start"), F.max("ts").alias("a_end"))
    b = e.groupBy(
        "event_type", F.to_date("ts").alias("b_day")
    ).agg(F.min("ts").alias("b_start"), F.max("ts").alias("b_end"))
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    p = a.join(
        F.broadcast(b),
        (F.col("a_day") == F.col("b_day"))
        & (F.col("a_start") <= F.col("b_end"))
        & (F.col("b_start") <= F.col("a_end")),
    ).select(
        "event_type",
        F.col("a_day").alias("day"),
        (
            us(F.least("a_end", "b_end"))
            - us(F.greatest("a_start", "b_start"))
        ).alias("ov_us"),
    )
    return p.groupBy("event_type").agg(
        F.countDistinct("day").cast("long").alias("n_days"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("ov_us").cast("long").alias("total_overlap_us"),
    )


# --------------------------------------------------------------------------
# Pivot: cohort x event_type activity matrix
# --------------------------------------------------------------------------
@query(
    "q_pivot_event_matrix",
    oracle="""
    SELECT (user_id % 50) AS cohort,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY (user_id % 50)
    ORDER BY cohort
    """,
)
def q_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide activity matrix: one row per user cohort, one column per
    event type (relational pivot).

    Scale: the pivot value list is declared (no extra pass to discover
    distinct values), so this is a single partial+final aggregate with
    5 counters per group — same cost as the plain groupBy. Missing
    combinations become 0 to match the oracle's FILTER counts.
    """
    e = read_table(spark, sf_dir, "events")
    out = (
        e.groupBy((F.col("user_id") % 50).alias("cohort"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("cohort")
    )
    return out


# --------------------------------------------------------------------------
# Moments: variance / stddev / correlation from exact power sums
# --------------------------------------------------------------------------
@query(
    "q_event_moments",
    oracle=f"""
    WITH sums AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(EXTRACT(hour FROM ts) AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(EXTRACT(hour FROM ts) * EXTRACT(hour FROM ts)
                    AS DECIMAL(38,6))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(value * EXTRACT(hour FROM ts)
                    AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           sx / n AS mean_value,
           (sxx - sx * sx / n) / (n - 1) AS var_value,
           SQRT((sxx - sx * sx / n) / (n - 1)) AS stddev_value,
           (n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))
             AS corr_value_hour
    FROM sums
    ORDER BY event_type
    """,
)
def q_event_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / variance / stddev of event value, and its correlation
    with hour-of-day, per event type.

    Engine-portable numerics: instead of the built-in VAR_SAMP/CORR
    (whose streaming implementations differ across engines in the last
    ulps), both sides aggregate exact decimal(38,6) power sums —
    order-independent — and apply the identical closed-form double
    formula. Bit-equal results without any rounding fudge.

    Scale: one partial+final aggregate; the power sums are 5 decimal
    accumulators per group — same shuffle as a plain count.
    """
    e = read_table(spark, sf_dir, "events")
    x = F.col("value")
    y = F.hour("ts").cast("double")
    sums = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(DEC38)).cast("double").alias("sx"),
        F.sum((x * x).cast(DEC38)).cast("double").alias("sxx"),
        F.sum(y.cast(DEC38)).cast("double").alias("sy"),
        F.sum((y * y).cast(DEC38)).cast("double").alias("syy"),
        F.sum((x * y).cast(DEC38)).cast("double").alias("sxy"),
    )
    n = F.col("n")
    sx, sxx = F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return sums.select(
        "event_type",
        "n",
        (sx / n).alias("mean_value"),
        ((sxx - sx * sx / n) / (n - 1)).alias("var_value"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_value"),
        (
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("corr_value_hour"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Histogram: fixed-width value binning
# --------------------------------------------------------------------------
@query(
    "q_histogram_value",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(value / 25.0) AS BIGINT) AS bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type, CAST(FLOOR(value / 25.0) AS BIGINT)
    ORDER BY event_type, bin
    """,
)
def q_histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (width 25) of event value per type.

    Scale: binning is a row-local projection, so this stays a single
    partial+final aggregate; cardinality is bounded by
    types x bins, not rows. FLOOR of an identical double division is
    bit-deterministic in both engines.
    """
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type",
            F.floor(F.col("value") / 25.0).alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("event_type", "bin")
    )


# --------------------------------------------------------------------------
# GROUPING SETS with grouping_id (general form of rollup/cube, B11)
# --------------------------------------------------------------------------
@query(
    "q_grouping_sets",
    oracle="""
    SELECT event_type,
           CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(GROUPING(event_type, CAST(dayofweek(ts) + 1 AS INT)) AS BIGINT)
             AS gid,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (CAST(dayofweek(ts) + 1 AS INT)), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup/cube compile to
    (B11): per-type totals, per-day-of-week totals, and the grand total
    in ONE pass, with grouping_id disambiguating which set a row
    belongs to (NULL event_type could otherwise mean 'aggregated away'
    or a genuinely null value).

    Scale: like rollup/cube, Expand multiplies rows only by the number
    of grouping sets (3), and partial aggregation still combines
    map-side before the shuffle.
    """
    e = read_table(spark, sf_dir, "events").withColumn(
        "dow", (F.dayofweek("ts")).cast("int")
    )
    return (
        e.groupingSets(
            [["event_type"], ["dow"], []],
            "event_type",
            "dow",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select("event_type", "dow", "gid", "n_events", "sum_value")
    )


# --------------------------------------------------------------------------
# Time-based RANGE window frame (B12)
# --------------------------------------------------------------------------
@query(
    "q_window_time_range",
    oracle="""
    SELECT event_id,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             AS sum_last_hour
    FROM (SELECT event_id, user_id, value,
                 epoch_us(ts) // 1000000 AS ts_sec FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event: that user's event count and value sum over the
    trailing hour — a value-based RANGE frame, not a row-count frame
    (two events at the same second share a frame; a quiet hour means a
    frame of one).

    Scale: one shuffle on user_id; the RANGE frame is evaluated by a
    sliding aggregate over the sorted partition (no self-join, no
    re-scan per row). The frame bound is on integer epoch seconds so
    batch order never affects membership.
    """
    e = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000))
        .cast("long")
        .alias("ts_sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("sum_last_hour"),
    )


# --------------------------------------------------------------------------
# Distribution ranks: ntile / percent_rank / cume_dist (B12)
# --------------------------------------------------------------------------
@query(
    "q_user_value_deciles",
    oracle="""
    WITH totals AS (
        SELECT user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY user_id
    )
    SELECT user_id, total_value,
           CAST(NTILE(10) OVER w AS INT) AS decile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM totals
    WINDOW w AS (ORDER BY total_value DESC, user_id)
    """,
)
def q_user_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users ranked into deciles by lifetime value, with exact
    percentile position (B12's ranking family beyond row_number/rank).

    Scale: the per-user aggregate is partial+final; the unpartitioned
    ranking window is a single-reducer sort of |users| rows — fine
    because users << events, and the ordered frame is the point. (For
    |users| at billions you'd switch to approx quantile cutoffs.)
    percent_rank/cume_dist are exact rational formulas of (rank, n) —
    engine-portable; the DESC order key is a decimal-derived double,
    identical in both engines.
    """
    e = read_table(spark, sf_dir, "events")
    totals = e.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value")
    )
    w = Window.orderBy(F.col("total_value").desc(), "user_id")
    return totals.select(
        "user_id",
        "total_value",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


# --------------------------------------------------------------------------
# Time-series gap fill / resample (dense hourly spine per series)
# --------------------------------------------------------------------------
@query(
    "q_gap_fill_hourly",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type,
               date_trunc('hour', MIN(ts)) AS mn,
               date_trunc('hour', MAX(ts)) AS mx
        FROM events GROUP BY 1
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_ts
        FROM bounds
    )
    SELECT s.event_type, s.hour_ts,
           COALESCE(h.n, 0) AS n_events,
           COALESCE(h.sv, 0.0) AS sum_value
    FROM spine s
    LEFT JOIN hourly h
      ON s.event_type = h.event_type AND s.hour_ts = h.hour_ts
    """,
)
def q_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample per event series with explicit zero rows for
    silent hours — the dense time spine every monitoring/feature
    pipeline needs (a naive GROUP BY simply omits empty buckets, and
    downstream window/ML code then misreads gaps as missing data).

    Spark shape: aggregate to (type, hour); derive each series' own
    [min_hour, max_hour] from the SAME aggregate; `sequence()` +
    `explode` builds the spine JVM-side (no driver loop, no Python);
    left-join the hourly aggregate back and coalesce zeros.

    Scale: the fact is shuffled once (partial+final agg to |types|×|hours|
    rows); everything after operates on the aggregate, which is smaller
    than the input by the bucket ratio. The spine explode is linear in
    output rows and map-only; the final join keys are identical on both
    sides so AQE broadcasts the smaller (both are aggregate-sized).
    """
    e = read_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sv"),
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour_ts").alias("mn"), F.max("hour_ts").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 hour"))
            ).alias("hour_ts"),
        )
    )
    return spine.join(hourly, ["event_type", "hour_ts"], "left").select(
        "event_type",
        "hour_ts",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.coalesce("sv", F.lit(0.0)).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# Time-series linear interpolation (round 8): the gap-fill spine again,
# but silent hours get the line between their observed neighbors, not a
# zero — the resample mode feature pipelines want for *level* signals
# (a zero-filled gauge reads as a crash; an interpolated one doesn't).
# --------------------------------------------------------------------------
@query(
    "q_interp_linear",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, MIN(hour_ts) AS mn, MAX(hour_ts) AS mx
        FROM hourly GROUP BY 1
    ),
    spine AS (
        SELECT event_type,
               unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_ts
        FROM bounds
    ),
    joined AS (
        SELECT s.event_type, s.hour_ts, h.sv
        FROM spine s
        LEFT JOIN hourly h
          ON s.event_type = h.event_type AND s.hour_ts = h.hour_ts
    ),
    ctx AS (
        SELECT event_type, hour_ts, sv,
               last_value(sv IGNORE NULLS) OVER wp AS prev_v,
               last_value(CASE WHEN sv IS NOT NULL THEN hour_ts END
                          IGNORE NULLS) OVER wp AS prev_t,
               first_value(sv IGNORE NULLS) OVER wf AS next_v,
               first_value(CASE WHEN sv IS NOT NULL THEN hour_ts END
                           IGNORE NULLS) OVER wf AS next_t
        FROM joined
        WINDOW
          wp AS (PARTITION BY event_type ORDER BY hour_ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wf AS (PARTITION BY event_type ORDER BY hour_ts
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hour_ts,
           CAST(sv IS NOT NULL AS INT) AS observed,
           CASE WHEN sv IS NOT NULL THEN sv
                ELSE prev_v + (next_v - prev_v)
                     * (CAST((epoch(hour_ts) - epoch(prev_t)) // 3600
                             AS DOUBLE)
                        / CAST((epoch(next_t) - epoch(prev_t)) // 3600
                               AS DOUBLE))
           END AS value
    FROM ctx
    """,
)
def q_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LINEAR interpolation across silent hours:
    every gap hour gets ``prev + (next-prev) * pos/len`` between its
    observed neighbors (both always exist — the spine spans each
    series' own [first, last] observed hour). The interpolation
    fraction is a ratio of exact integer hour offsets and the
    arithmetic shape is fixed, so Spark and DuckDB produce the
    identical double.

    Scale: same cost profile as q_gap_fill_hourly (one shuffle to the
    hourly aggregate, spine exploded JVM-side) plus two bounded
    windows per series for the neighbor scan — each partition is one
    series' hours, orders of magnitude smaller than the raw events."""
    e = read_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sv")
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour_ts").alias("mn"), F.max("hour_ts").alias("mx"))
        .select(
            "event_type",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 hour"))
            ).alias("hour_ts"),
        )
    )
    joined = spine.join(hourly, ["event_type", "hour_ts"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("sv").isNotNull(), F.col("hour_ts"))
    ctx = joined.select(
        "event_type",
        "hour_ts",
        "sv",
        F.last("sv", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(obs_ts, ignorenulls=True).over(wp).alias("prev_t"),
        F.first("sv", ignorenulls=True).over(wf).alias("next_v"),
        F.first(obs_ts, ignorenulls=True).over(wf).alias("next_t"),
    )
    pos = (
        (F.unix_timestamp("hour_ts") - F.unix_timestamp("prev_t"))
        / F.lit(3600)
    ).cast("bigint").cast("double")
    gap = (
        (F.unix_timestamp("next_t") - F.unix_timestamp("prev_t"))
        / F.lit(3600)
    ).cast("bigint").cast("double")
    return ctx.select(
        "event_type",
        "hour_ts",
        F.col("sv").isNotNull().cast("int").alias("observed"),
        F.when(F.col("sv").isNotNull(), F.col("sv"))
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v")) * (pos / gap)
        )
        .alias("value"),
    )


# --------------------------------------------------------------------------
# Per-key argmax aggregation (max_by / arg_max — top-1 without a window)
# --------------------------------------------------------------------------
@query(
    "q_user_last_event",
    oracle="""
    SELECT user_id,
           arg_max(event_type, ts) AS last_event_type,
           arg_max(value, ts) AS last_value,
           MAX(ts) AS last_ts,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
)
def q_user_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's most recent event attributes as a single aggregate —
    `max_by` (argmax) instead of the row_number-window top-1 used by
    q_latest_state_per_key, trading generality for a cheaper plan.

    Scale: this is the shape to prefer for top-1-per-key at 100 TB:
    partial aggregation keeps ONE candidate row per key per partition
    before the shuffle (the window variant must shuffle and sort every
    row). (user_id, ts) is unique in the fixture, so the argmax is
    deterministic and engine-portable.
    """
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.max_by("event_type", "ts").alias("last_event_type"),
        F.max_by("value", "ts").alias("last_value"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# gap-based sessionization (batch) — the classic clickstream cut
# --------------------------------------------------------------------------
SESSION_GAP_S = 1800

#: shared by q_sessionize and its custom-stateful streaming twin
#: q_stream_sessionize (operators/cdc_zone.py) — hash-equality against
#: the SAME oracle is the stream==batch proof
_SQL_SESSIONIZE = f"""
    WITH marked AS (
        SELECT user_id, event_id, value,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                         - LAG(CAST(epoch_us(ts) AS BIGINT)) OVER w
                         > {SESSION_GAP_S} * 1000000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT *, SUM(is_new) OVER (
            PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events,
           MIN(ts_us) AS start_us,
           MAX(ts_us) AS end_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM sessions
    GROUP BY user_id, session_no
"""


@query("q_sessionize", oracle=_SQL_SESSIONIZE)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (B12 composite): a new session starts
    after a >30 min silence; session ids are per-user running sums of
    the new-session flag — the standard batch formulation (its streaming
    twin is the session window in ``streaming/windows.py``).

    Scale: one shuffle on user_id; LAG and the running SUM share the
    same (user_id, ts) sort, so Catalyst plans a single Window sort,
    and the session aggregate re-uses the same hash partitioning. All
    derived columns are integer microseconds or exact-decimal sums —
    engine-bit-identical.
    """
    e = read_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_new = (
        F.when(
            (ts_us - F.lag(ts_us).over(w) > SESSION_GAP_S * 1_000_000)
            | F.lag("ts").over(w).isNull(),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = e.select(
        "user_id",
        "event_id",
        "value",
        ts_us.alias("ts_us"),
        F.sum(is_new).over(run).alias("session_no"),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


# --------------------------------------------------------------------------
# Unpivot (melt): the inverse of the pivot — wide matrix back to long form
# --------------------------------------------------------------------------
@query(
    "q_unpivot_event_matrix",
    oracle="""
    WITH wide AS (
        SELECT (user_id % 50) AS cohort,
               COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
               COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
               COUNT(*) FILTER (WHERE event_type = 'view')     AS view
        FROM events GROUP BY (user_id % 50)
    )
    SELECT cohort, event_type, CAST(n AS BIGINT) AS n
    FROM wide
    UNPIVOT (n FOR event_type IN (click, error, purchase, signup, view))
    WHERE n > 0
    """,
)
def q_unpivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational unpivot (melt): the wide per-cohort activity matrix
    back to (cohort, event_type, n) long form, zero cells dropped
    (mirroring UNPIVOT's default exclude-nulls contract — the pivot
    filled them in, the unpivot strips them back out).

    Scale: `unpivot` is a row-local Expand (each wide row emits one row
    per measure column) stacked directly on the pivot's single
    partial+final aggregate — no extra shuffle, no UDF. This is the
    standard long<->wide bridge a feature-engineering pipeline crosses
    in both directions."""
    e = read_table(spark, sf_dir, "events")
    wide = (
        e.groupBy((F.col("user_id") % 50).alias("cohort"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
    )
    return (
        wide.unpivot(
            ids=["cohort"],
            values=list(EVENT_TYPES),
            variableColumnName="event_type",
            valueColumnName="n",
        )
        .where(F.col("n") > 0)
        .select("cohort", "event_type", F.col("n").cast("bigint").alias("n"))
    )


# ---------------------------------------------------------------------------
# EWMA time-series smoothing (round 6)
# ---------------------------------------------------------------------------

#: smoothing factor 1/4 — an EXACT binary fraction, so every fold step
#: (0.25*x + 0.75*acc) is two exact-constant multiplies and one add:
#: identical IEEE-754 results on any engine that folds in the same
#: order. An alpha like 0.3 would make cross-engine bit-equality
#: depend on decimal-literal parsing instead.
EWMA_ALPHA = 0.25


@query(
    "q_ewma_user_value",
    oracle=f"""
    WITH seq AS (
        SELECT user_id,
               list_transform(
                 list_sort(list(struct_pack(ts := ts, eid := event_id,
                                            v := CAST(value AS DOUBLE)))),
                 s -> s.v) AS vals
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           list_reduce(vals,
             (acc, x) -> {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * acc)
             AS ewma_value,
           vals[len(vals)] AS last_value
    FROM seq
    """,
)
def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of event value per user,
    ordered by (ts, event_id) — the classic time-series smoother, as a
    declarative fold seeded with the first observation (the
    list_reduce convention on both engines). alpha = 1/4 keeps every
    step exact-constant arithmetic, so the result is bit-identical to
    the oracle with no rounding fudge.

    Scale: one groupBy shuffle on user_id; the fold is row-local over
    each user's (bounded) event list. A user with an unbounded history
    would switch to the associative form of the linear recurrence —
    EWMA steps compose as (mul, add) pairs — and run as a two-phase
    prefix scan like q_token_budget; at this cardinality the direct
    fold is the faster plan."""
    ev = read_table(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("ts"),
                        F.col("event_id").alias("eid"),
                        F.col("value").cast("double").alias("v"),
                    )
                )
            ).alias("s")
        )
        .select(
            "user_id",
            F.expr("transform(s, x -> x.v)").alias("vals"),
        )
    )
    fold = F.expr(
        f"aggregate(slice(vals, 2, greatest(size(vals) - 1, 0)),"
        f" element_at(vals, 1),"
        f" (acc, x) -> {EWMA_ALPHA}D * x + {1 - EWMA_ALPHA}D * acc)"
    )
    return seq.select(
        "user_id",
        F.size("vals").cast("bigint").alias("n_events"),
        fold.alias("ewma_value"),
        F.element_at("vals", -1).alias("last_value"),
    )


# ---------------------------------------------------------------------------
# nested-type roundtrip: order baskets as array<struct> (round 6)
# ---------------------------------------------------------------------------


@query(
    "q_order_baskets",
    # the ORACLE computes every stat FLAT (plain GROUP BY aggregates);
    # the Spark side computes them through the NESTED representation —
    # equality proves collect/sort/fold loses nothing
    oracle="""
    SELECT l_orderkey,
           CAST(COUNT(*) AS INT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS basket_value,
           MAX(struct_pack(p := CAST(l_extendedprice AS DECIMAL(18,2)),
                           k := l_partkey)).k AS top_part,
           md5(string_agg(
                 CAST(l_linenumber AS VARCHAR) || ':'
                 || CAST(l_partkey AS VARCHAR) || ':'
                 || CAST(CAST(l_quantity AS INT) AS VARCHAR),
                 '|' ORDER BY l_linenumber, l_partkey,
                              CAST(l_quantity AS INT),
                              CAST(l_extendedprice AS DECIMAL(18,2))))
             AS items_hash
    FROM lineitem GROUP BY l_orderkey
    """,
)
def q_order_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type roundtrip: nest each order's line items into a
    sorted ``array<struct>`` basket, then answer every question from
    the NESTED form alone — size, a sequential decimal fold for the
    basket value, lexicographic struct array_max for the top part, and
    a canonical item-list hash. The oracle computes the same stats
    FLAT, so the hash match proves the denormalized representation is
    lossless (the contract every doc-store-style consumer of the lake
    depends on).

    Scale: one groupBy shuffle builds the baskets; every downstream
    stat is a row-local HOF over the nested array — no second shuffle.
    Baskets are bounded by order size (TPC-H max 7), the natural
    nesting unit."""
    li = read_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select(
            "l_orderkey",
            F.struct(
                F.col("l_linenumber").alias("ln"),
                F.col("l_partkey").alias("pk"),
                F.col("l_quantity").cast("int").alias("qty"),
                F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
            ).alias("item"),
        )
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("item")).alias("items"))
    )
    return baskets.select(
        "l_orderkey",
        F.size("items").alias("n_items"),
        F.expr(
            "CAST(aggregate(items, CAST(0 AS DECIMAL(18,2)),"
            " (acc, x) -> CAST(acc + x.price AS DECIMAL(18,2)),"
            " acc -> acc) AS DOUBLE)"
        ).alias("basket_value"),
        F.expr(
            "array_max(transform(items, x -> struct(x.price AS p,"
            " x.pk AS k))).k"
        ).alias("top_part"),
        F.md5(
            F.array_join(
                F.expr(
                    "transform(items, x -> concat(CAST(x.ln AS STRING), ':',"
                    " CAST(x.pk AS STRING), ':', CAST(x.qty AS STRING)))"
                ),
                "|",
            )
        ).alias("items_hash"),
    )


# ---------------------------------------------------------------------------
# closed-form linear-model training (round 6)
# ---------------------------------------------------------------------------


@query(
    "q_linreg_train",
    oracle="""
    WITH sums AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(EXTRACT(hour FROM ts) AS DECIMAL(38,6)))
                    AS DOUBLE) AS sx,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(EXTRACT(hour FROM ts) * EXTRACT(hour FROM ts)
                             AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)
                 AS syy,
               CAST(SUM(CAST(value * EXTRACT(hour FROM ts)
                             AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM sums
    -- degenerate groups (single point, constant x, constant y) have a
    -- zero denominator whose division semantics differ across engines
    -- (Spark non-ANSI NULL vs DuckDB inf/NaN): excluded by contract
    WHERE n >= 2 AND n * sxx - sx * sx != 0 AND n * syy - sy * sy != 0
    """,
)
def q_linreg_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed model TRAINING with a closed-form solution: ordinary
    least squares of value on hour-of-day, one model per event type.
    The five power sums aggregate in exact decimal (order-independent,
    the q_event_moments discipline), then slope / intercept / r-squared
    evaluate in double with the identical expression tree on both
    engines. This is the honest distributed-training shape for linear
    models: one partial+final aggregate over the data, zero iterations,
    nothing but five numbers per group crossing the network.

    Scale: identical cost to a plain grouped aggregate at any data
    size; a p-feature model generalizes to p^2 Gram-matrix sums per
    group, still one shuffle."""
    ev = read_table(spark, sf_dir, "events")
    hour = F.hour("ts")
    d38 = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    sums = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38(hour)).cast("double").alias("sx"),
        F.sum(d38(F.col("value"))).cast("double").alias("sy"),
        F.sum(d38(hour * hour)).cast("double").alias("sxx"),
        F.sum(d38(F.col("value") * F.col("value"))).cast("double").alias("syy"),
        F.sum(d38(F.col("value") * hour)).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (
        F.col("n"),
        F.col("sx"),
        F.col("sy"),
        F.col("sxx"),
        F.col("syy"),
        F.col("sxy"),
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    # degenerate groups excluded by contract (zero denominators divide
    # to NULL here but inf/NaN in DuckDB — see the oracle's WHERE)
    sums = sums.where(
        (n >= 2) & (n * sxx - sx * sx != 0) & (n * syy - sy * sy != 0)
    )
    return sums.select(
        "event_type",
        n.cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# cohort retention matrix (round 6)
# ---------------------------------------------------------------------------


@query(
    "q_cohort_retention",
    oracle="""
    WITH firstw AS (
        SELECT user_id,
               MIN(CAST(floor(epoch(ts) / 604800) AS BIGINT)) AS cohort_w
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_w,
               CAST(floor(epoch(e.ts) / 604800) AS BIGINT) - f.cohort_w
                 AS week_offset
        FROM events e JOIN firstw f ON e.user_id = f.user_id
    )
    SELECT cohort_w, week_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity GROUP BY cohort_w, week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted as
    active per week offset — the canonical product-analytics matrix.
    Week ids are integer floor(epoch/604800), so bucketing is exact on
    both engines.

    Scale: one aggregate for first-seen, one distinct-activity shuffle
    joined back on user_id (broadcastable when the user dimension is
    small; co-partitioned SMJ otherwise), one final count. Nothing
    holds more than (user, week) distinct pairs."""
    ev = read_table(spark, sf_dir, "events")
    week = (F.floor(F.unix_timestamp("ts") / F.lit(604800))).cast("bigint")
    # single scan: distinct (user, week) pairs first (the strongest
    # reducer), then the cohort week via a window over each user's
    # handful of active weeks — no second pass over raw events, no
    # self-join
    pairs = ev.select("user_id", week.alias("w")).distinct()
    w_user = Window.partitionBy("user_id")
    activity = pairs.select(
        (F.min("w").over(w_user)).alias("cohort_w"),
        (F.col("w") - F.min("w").over(w_user)).alias("week_offset"),
    )
    return activity.groupBy("cohort_w", "week_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )


# ---------------------------------------------------------------------------
# sequence-pattern mining over session event strings (round 6)
# ---------------------------------------------------------------------------

#: ordered behavioral patterns, matched against each user-day's event
#: sequence; literal tokens + '.*' wildcards only, so the Java and
#: DuckDB regex engines agree by construction
SEQ_PATTERNS = (
    ("view_to_purchase", "view.*purchase"),
    ("error_then_retry", "error.*click"),
    ("signup_first", "^signup"),
)


def _seq_pattern_sql() -> str:
    cases = "\n".join(
        f"SELECT '{name}' AS pattern, seq,"
        f" regexp_matches(seq, '{rx}') AS hit FROM seqs"
        + ("" if i == len(SEQ_PATTERNS) - 1 else " UNION ALL")
        for i, (name, rx) in enumerate(SEQ_PATTERNS)
    )
    return f"""
    WITH ordered AS (
        SELECT user_id, CAST(ts AS DATE) AS day, event_type, ts, event_id
        FROM events
    ),
    seqs AS (
        SELECT user_id, day,
               string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq
        FROM ordered GROUP BY user_id, day
    ),
    matched AS ({cases})
    SELECT pattern,
           CAST(COUNT(*) FILTER (WHERE hit) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM matched GROUP BY pattern
    """


@query("q_sequence_pattern", oracle=_seq_pattern_sql())
def q_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining: each user-day's events collapse to
    an ordered type string (total order: ts then event_id), matched
    against declared patterns — the MATCH_RECOGNIZE-lite that answers
    'how many sessions go view -> ... -> purchase'. Patterns use only
    literals + wildcards so both regex engines agree.

    Scale: one (user, day) aggregate builds the strings; pattern
    matching is row-local; the result is |patterns| rows. Session
    strings are bounded by per-user-day activity — the same unit
    q_sessionize already shuffles."""
    ev = read_table(spark, sf_dir, "events")
    seqs = (
        ev.select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            F.struct("ts", "event_id", "event_type").alias("s"),
        )
        .groupBy("user_id", "day")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("s")),
                    lambda x: x["event_type"],
                ),
                " ",
            ).alias("seq")
        )
    )
    # evaluate every pattern in ONE pass over the session strings — a
    # unionAll of per-pattern selects would re-run the (user, day)
    # aggregation subtree once per pattern
    matches = seqs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("pattern"),
                        F.col("seq").rlike(rx).alias("hit"),
                    )
                    for name, rx in SEQ_PATTERNS
                ]
            )
        ).alias("m")
    ).select("m.pattern", "m.hit")
    return matches.groupBy("pattern").agg(
        F.sum(F.when(F.col("hit"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_sessions"),
        F.count(F.lit(1)).alias("n_total"),
    )


# ---------------------------------------------------------------------------
# equi-depth histogram (optimizer-stats shape) — round 6
# ---------------------------------------------------------------------------

EQD_BUCKETS = 8


@query(
    "q_equidepth_histogram",
    oracle=f"""
    WITH t AS (
        SELECT value,
               NTILE({EQD_BUCKETS}) OVER (ORDER BY value, event_id)
                 AS bucket
        FROM events
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM t GROUP BY bucket
    """,
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram of event value — the statistic cost-based
    optimizers keep per column (equal row counts per bucket, variable
    bucket widths; the complement of q_histogram_value's equi-width
    bins). NTILE over a total order (value, event_id) makes bucket
    assignment deterministic on both engines.

    Scale: NTILE needs a global order — fine for the stats-collection
    context this models (run per column at ANALYZE time over a sample
    or with a range-partitioned sort), and the bucket aggregate behind
    it is tiny. The query models the stats pass, not a per-query op."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.orderBy("value", "event_id")
    t = ev.select("value", F.ntile(EQD_BUCKETS).over(w).alias("bucket"))
    return t.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


# --------------------------------------------------------------------------
# Row-level z-score anomaly flagging (round 8)
# --------------------------------------------------------------------------
#: flag threshold in population standard deviations
ZSCORE_SIGMA = 3.0
ZSCORE_TOP = 50


@query(
    "q_anomaly_zscore",
    oracle=f"""
    WITH sums AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)
                 AS sxx
        FROM events GROUP BY event_type
    ),
    stats AS (
        SELECT event_type, sx / n AS mean_v,
               SQRT((sxx - sx * sx / n) / n) AS sd_v
        FROM sums
    )
    SELECT e.event_id, e.event_type, e.value,
           round((e.value - s.mean_v) / s.sd_v, 6) AS zscore
    FROM events e JOIN stats s USING (event_type)
    WHERE abs((e.value - s.mean_v) / s.sd_v) > {ZSCORE_SIGMA}
    ORDER BY abs(round((e.value - s.mean_v) / s.sd_v, 6)) DESC, e.event_id
    LIMIT {ZSCORE_TOP}
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level anomaly flags: events whose value sits more than
    {ZSCORE_SIGMA} population standard deviations from their event
    type's mean, top-{ZSCORE_TOP} by |z| — the first-pass outlier
    screen every metrics pipeline runs. Same engine-portable numerics
    as q_event_moments: exact decimal(38,6) power sums feed one fixed
    closed-form double expression (never a streaming VAR_POP, whose
    per-engine accumulation order differs in the last ulps).

    Scale: one map-side-combined aggregate to |types| rows, broadcast
    back over the stream — the raw table is scanned once and never
    shuffled; the top-k is a TakeOrdered."""
    e = read_table(spark, sf_dir, "events")
    x = F.col("value")
    sums = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(DEC38)).cast("double").alias("sx"),
        F.sum((x * x).cast(DEC38)).cast("double").alias("sxx"),
    )
    stats = sums.select(
        "event_type",
        (F.col("sx") / F.col("n")).alias("mean_v"),
        F.sqrt(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / F.col("n")
        ).alias("sd_v"),
    )
    z = (F.col("value") - F.col("mean_v")) / F.col("sd_v")
    return (
        e.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > ZSCORE_SIGMA)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(z, 6).alias("zscore"),
        )
        .orderBy(F.abs(F.col("zscore")).desc(), "event_id")
        .limit(ZSCORE_TOP)
    )


_fmt(q_anomaly_zscore, ZSCORE_SIGMA=ZSCORE_SIGMA, ZSCORE_TOP=ZSCORE_TOP)


# --------------------------------------------------------------------------
# Poisson-bootstrap confidence intervals (round 8)
# --------------------------------------------------------------------------
# THE scale-out bootstrap: classic resampling needs the whole dataset
# per replica; the Poisson approximation gives every row an independent
# Poisson(1) weight per replica, so all B replicas stream through ONE
# pass as weighted partial aggregates. Weights here are drawn from the
# deterministic row hash (integer cutoffs at the Poisson(1) CDF), so
# the interval is bit-reproducible on any cluster — a dataset card can
# quote it.

#: bootstrap replicas
BOOT_B = 32
#: Poisson(1) CDF cutoffs in millionths: P(0)=.3679, P(<=1)=.7358,
#: P(<=2)=.9197 — weights capped at 3 (P(>3) ~ 1.9%)
BOOT_CUT = (367879, 735759, 919699)


@query(
    "q_bootstrap_ci",
    oracle=f"""
    WITH w AS (
        SELECT event_type, b.b,
               CASE
                 WHEN (('0x' || substr(md5(CAST(event_id AS VARCHAR)
                         || '_' || CAST(b.b AS VARCHAR)), 1, 15))::BIGINT)
                      % 1000000 < {BOOT_CUT[0]} THEN 0
                 WHEN (('0x' || substr(md5(CAST(event_id AS VARCHAR)
                         || '_' || CAST(b.b AS VARCHAR)), 1, 15))::BIGINT)
                      % 1000000 < {BOOT_CUT[1]} THEN 1
                 WHEN (('0x' || substr(md5(CAST(event_id AS VARCHAR)
                         || '_' || CAST(b.b AS VARCHAR)), 1, 15))::BIGINT)
                      % 1000000 < {BOOT_CUT[2]} THEN 2
                 ELSE 3
               END AS wt,
               value
        FROM events, (SELECT UNNEST(range(0, {BOOT_B})) AS b) b
    ),
    reps AS (
        SELECT event_type, b,
               CAST(SUM(CAST(wt * value AS DECIMAL(38,6))) AS DOUBLE)
                 / SUM(wt) AS mean_b
        FROM w GROUP BY event_type, b
    ),
    point AS (
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*) AS mean_v
        FROM events GROUP BY event_type
    )
    SELECT p.event_type,
           round(p.mean_v, 6) AS point_mean,
           round(quantile_cont(r.mean_b, 0.025), 6) AS ci_lo,
           round(quantile_cont(r.mean_b, 0.975), 6) AS ci_hi,
           CAST({BOOT_B} AS INT) AS n_replicas
    FROM reps r JOIN point p USING (event_type)
    GROUP BY p.event_type, p.mean_v
    """,
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap confidence interval for the mean event
    value per event type, from {BOOT_B} replicas: every (row, replica)
    gets a Poisson(1) weight drawn by integer cutoffs on the portable
    row hash, replica means are exact-decimal weighted sums, and the
    interval is the interpolated 2.5/97.5 percentile of the replica
    means. Deterministic end to end — rerunning on 1 or 1000 executors
    yields the identical interval.

    Scale: the x{BOOT_B} explode happens BEFORE the map-side combine,
    so the shuffle carries |types| x {BOOT_B} partials, not B copies
    of the data — the one-pass property that makes Poisson bootstrap
    the standard at terabyte scale (vs. resampling, which re-reads the
    corpus per replica)."""
    from dynamodb_streaming_datalake_spark.functions.texthash import (
        portable_hash60,
    )

    e = read_table(spark, sf_dir, "events")
    reps = e.select(
        "event_id",
        "event_type",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
    )
    mm = (
        portable_hash60(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit("_"),
                F.col("b").cast("string"),
            )
        )
        % 1_000_000
    )
    wt = (
        F.when(mm < BOOT_CUT[0], 0)
        .when(mm < BOOT_CUT[1], 1)
        .when(mm < BOOT_CUT[2], 2)
        .otherwise(3)
    )
    rep_means = (
        reps.withColumn("wt", wt)
        .groupBy("event_type", "b")
        .agg(
            (
                F.sum((F.col("wt") * F.col("value")).cast(DEC38)).cast(
                    "double"
                )
                / F.sum("wt")
            ).alias("mean_b")
        )
    )
    point = e.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast(DEC38)).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_v")
    )
    return (
        rep_means.groupBy("event_type")
        .agg(
            F.round(F.percentile("mean_b", F.lit(0.025)), 6).alias("ci_lo"),
            F.round(F.percentile("mean_b", F.lit(0.975)), 6).alias("ci_hi"),
        )
        .join(F.broadcast(point), "event_type")
        .select(
            "event_type",
            F.round("mean_v", 6).alias("point_mean"),
            "ci_lo",
            "ci_hi",
            F.lit(BOOT_B).cast("int").alias("n_replicas"),
        )
    )


_fmt(q_bootstrap_ci, BOOT_B=BOOT_B)


# --------------------------------------------------------------------------
# Winsorization (round 9): percentile clipping for robust features
# --------------------------------------------------------------------------
WINS_LO, WINS_HI = 0.01, 0.99


@query(
    "q_winsorize",
    oracle=f"""
    WITH pct AS (
        SELECT event_type,
               quantile_cont(value, {WINS_LO}) AS p_lo,
               quantile_cont(value, {WINS_HI}) AS p_hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(p.p_lo, 6) AS p_lo,
           round(p.p_hi, 6) AS p_hi,
           CAST(SUM(CASE WHEN e.value < p.p_lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_lo,
           CAST(SUM(CASE WHEN e.value > p.p_hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_hi,
           round(CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_raw,
           round(CAST(SUM(CAST(GREATEST(p.p_lo, LEAST(p.p_hi, e.value))
                               AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_winsorized
    FROM events e JOIN pct p USING (event_type)
    GROUP BY e.event_type, p.p_lo, p.p_hi
    ORDER BY e.event_type
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (percentile-clipped) value statistics per event
    type: clip at the exact interpolated p1/p99 (``F.percentile`` ==
    ``quantile_cont``, the proven-portable pair), report clip counts
    and the raw vs winsorized mean — the robust-feature pass of a
    training pipeline, where heavy-tailed raw aggregates would
    otherwise be dominated by outliers.

    Numerics: means go through exact decimal(38,6) sums with one final
    float division (the q_event_moments discipline); the clip itself
    is GREATEST/LEAST over doubles — deterministic on both engines.

    Scale: one percentile aggregate per group (bounded group count),
    broadcast back over one scan — two passes, no extra shuffle."""
    e = read_table(spark, sf_dir, "events")
    pct = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(WINS_LO)).alias("p_lo"),
        F.percentile("value", F.lit(WINS_HI)).alias("p_hi"),
    )
    clipped = F.greatest("p_lo", F.least("p_hi", F.col("value")))
    return (
        e.join(F.broadcast(pct), "event_type")
        .groupBy("event_type", "p_lo", "p_hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # when/otherwise, not a boolean cast: on an all-NULL group
            # (NULL percentiles) the comparison is NULL per row, and a
            # cast-sum would return NULL where the oracle's CASE counts
            # 0 — zero rows clipped is the honest count (r17
            # contract-stress all-NULL sweep)
            F.sum(
                F.when(F.col("value") < F.col("p_lo"), 1).otherwise(0)
            ).alias("n_clip_lo"),
            F.sum(
                F.when(F.col("value") > F.col("p_hi"), 1).otherwise(0)
            ).alias("n_clip_hi"),
            F.sum(F.col("value").cast(DEC38)).cast("double").alias("sraw"),
            F.sum(clipped.cast(DEC38)).cast("double").alias("swins"),
        )
        .select(
            "event_type",
            "n",
            F.round("p_lo", 6).alias("p_lo"),
            F.round("p_hi", 6).alias("p_hi"),
            "n_clip_lo",
            "n_clip_hi",
            F.round(F.col("sraw") / F.col("n"), 6).alias("mean_raw"),
            F.round(F.col("swins") / F.col("n"), 6).alias(
                "mean_winsorized"
            ),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Seasonal decomposition (round 9): trend / hour-of-day seasonal split
# --------------------------------------------------------------------------
#: centered moving-average half-width in observed hours (25-row window)
SEAS_HALF = 12


@query(
    "q_seasonal_decompose",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_ts,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
        FROM events GROUP BY 1, 2
    ),
    trended AS (
        SELECT event_type, hour_ts, sv,
               CASE WHEN COUNT(*) OVER w = {2 * SEAS_HALF + 1}
                    THEN CAST(SUM(CAST(sv AS DECIMAL(38,6))) OVER w
                              AS DOUBLE) / {2 * SEAS_HALF + 1}
               END AS trend
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                     ROWS BETWEEN {SEAS_HALF} PRECEDING
                              AND {SEAS_HALF} FOLLOWING)
    )
    SELECT event_type,
           CAST(EXTRACT(hour FROM hour_ts) AS INT) AS hod,
           CAST(COUNT(trend) AS BIGINT) AS n_obs,
           round(CAST(SUM(CAST(sv - trend AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(trend), 6) AS seasonal,
           round(CAST(SUM(CAST(trend AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(trend), 6) AS mean_trend
    FROM trended
    WHERE trend IS NOT NULL
    GROUP BY event_type, EXTRACT(hour FROM hour_ts)
    ORDER BY event_type, hod
    """,
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of each event type's hourly
    value series: trend = centered {SEAS_WIN}-hour moving average
    (full windows only — edges excluded), seasonal = per hour-of-day
    mean of the detrended series. One row per (event_type, hour-of-
    day) with the seasonal index and the mean trend level — the
    seasonality profile a forecasting pipeline feeds from.

    Numerics: every cross-row sum (the moving-average window AND the
    per-bucket means) goes through exact decimal(38,6) accumulation
    with one float division at the end — window sums over doubles
    would be association-order-dependent across engines (DuckDB's
    segment-tree window vs Spark's sliding aggregation), which is
    precisely the trap the decimal cast removes.

    Scale: one shuffle to the hourly grain (tiny — series-hours, not
    events), then per-series windows partitioned by event_type; at a
    1000x series count the same plan holds since each partition is one
    series."""
    e = read_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour_ts")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sv")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-SEAS_HALF, SEAS_HALF)
    )
    win = 2 * SEAS_HALF + 1
    trended = hourly.select(
        "event_type",
        "hour_ts",
        "sv",
        F.when(
            F.count(F.lit(1)).over(w) == win,
            F.sum(F.col("sv").cast(DEC38)).over(w).cast("double") / win,
        ).alias("trend"),
    ).where(F.col("trend").isNotNull())
    return (
        trended.groupBy(
            "event_type", F.hour("hour_ts").cast("int").alias("hod")
        )
        .agg(
            F.count("trend").alias("n_obs"),
            F.sum((F.col("sv") - F.col("trend")).cast(DEC38))
            .cast("double")
            .alias("sdet"),
            F.sum(F.col("trend").cast(DEC38)).cast("double").alias("str_"),
        )
        .select(
            "event_type",
            "hod",
            "n_obs",
            F.round(F.col("sdet") / F.col("n_obs"), 6).alias("seasonal"),
            F.round(F.col("str_") / F.col("n_obs"), 6).alias("mean_trend"),
        )
        .orderBy("event_type", "hod")
    )


_fmt(q_seasonal_decompose, SEAS_WIN=2 * SEAS_HALF + 1)


# --------------------------------------------------------------------------
# autocorrelation function (round 10): lag structure of the hourly series
# --------------------------------------------------------------------------
# q_seasonal_decompose reports the daily cycle assuming you already
# know the period; the ACF is how you FIND the period (and whether a
# series is forecastable at all): Pearson correlation between the
# hourly revenue series and its own k-hour lag, for k = 1..ACF_MAX_LAG.
# Contract: the series is the dense hourly spine from the first to
# the last observed hour, missing hours as exact 0 (gaps are real
# zeros for revenue, and without the spine each lag pair-set would
# silently skip them). Per-lag Pearson over the overlapping pairs,
# series values held at DECIMAL(18,6) so every product is an exact
# DECIMAL(37,12) and every power sum an exact DECIMAL(38,12) in BOTH
# engines — the q_cuped discipline — so the ACF is engine- and
# partitioning-exact.

ACF_MAX_LAG = 24


@query(
    "q_autocorrelation",
    oracle=f"""
    WITH hourly AS (
        SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS h,
               SUM(CAST(value AS DECIMAL(38,6))) AS v
        FROM events GROUP BY 1
    ),
    bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
    spine AS (
        SELECT UNNEST(range(b.h0, b.h1 + 3600, 3600)) AS h FROM bounds b
    ),
    series AS (
        -- Narrow, not (38,6): the pair products below must stay EXACT
        -- in BOTH engines.  Spark's (38,6)x(38,6) overflows its
        -- 38-digit cap and precision-loss-rounds every product to 6 dp
        -- — a data-dependent hash divergence vs this oracle.  Spark
        -- uses (18,6) (product = exact (37,12)); here (19,6) forces
        -- DuckDB onto hugeint physical ((18,6)x(18,6) would overflow
        -- its int64 kernel) — both exact, hence identical.
        SELECT s.h,
               CAST(COALESCE(hy.v, 0) AS DECIMAL(19,6)) AS v
        FROM spine s LEFT JOIN hourly hy ON hy.h = s.h
    ),
    lags AS (SELECT UNNEST(range(1, {ACF_MAX_LAG + 1})) AS lag),
    pairs AS (
        SELECT l.lag, a.v AS x, b.v AS y
        FROM lags l
        JOIN series a ON TRUE
        JOIN series b ON b.h = a.h + l.lag * 3600
    ),
    sums AS (
        SELECT lag, COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           round((sxy - sx * sy / n)
                 / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)),
                 6) AS acf
    FROM sums
    WHERE sxx - sx * sx / n > 0 AND syy - sy * sy / n > 0
    ORDER BY lag
    """,
)
def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF of hourly revenue, lags 1..{ACF_MAX_LAG}: Pearson r between
    the dense hourly series (missing hours = exact 0) and its k-hour
    lag — the period-detection diagnostic upstream of
    q_seasonal_decompose's fixed daily cycle. A 24-lag peak confirms
    the daily period; a flat ACF says don't bother forecasting.

    Per-lag power sums accumulate in exact decimal (products at scale
    12), and each r is one final double expression rounded to 6 dp;
    degenerate lags (zero variance on either side) are excluded by
    contract.

    Scale: the hourly aggregate is one map-side-combined shuffle of
    the raw events; everything after runs on |hours| rows x
    {ACF_MAX_LAG} lag replicas — constant work per lag regardless of
    event volume, and the spine join is an equi-join on the hour
    key."""
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("h")
    ).agg(F.sum(F.col("value").cast(DEC38)).alias("v"))
    bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.lit(3600))
        ).alias("h")
    )
    # decimal(18,6) so x*x / x*y are exact decimal(37,12) — Spark's
    # (38,6)x(38,6) would overflow the 38-digit cap and round each
    # product to 6 dp, diverging from DuckDB's exact arithmetic.
    series = spine.join(hourly, "h", "left").select(
        "h",
        F.coalesce(F.col("v"), F.lit(0))
        .cast("decimal(18,6)")
        .alias("v"),
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = series.alias("a")
    b = series.alias("b")
    pairs = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(
            b,
            F.col("b.h") == F.col("a.h") + F.col("lag") * F.lit(3600),
        )
        .select("lag", F.col("a.v").alias("x"), F.col("b.v").alias("y"))
    )
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    var_x = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    var_y = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    acf = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.sqrt(var_x) * F.sqrt(var_y)
    )
    return (
        sums.where((var_x > 0) & (var_y > 0))
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.col("n").cast("bigint").alias("n_pairs"),
            F.round(acf, 6).alias("acf"),
        )
        .orderBy("lag")
    )


_fmt(q_autocorrelation, ACF_MAX_LAG=ACF_MAX_LAG)


# ---------------------------------------------------------------------------
# Holt linear-trend smoothing + forecast (round 11)
# ---------------------------------------------------------------------------
# q_ewma_user_value smooths a LEVEL; q_seasonal_decompose explains a
# CYCLE; neither can answer "where is this series heading" — Holt's
# double exponential smoothing tracks level AND trend and forecasts
# h steps out as level + h*trend. alpha = 1/2 and beta = 1/4 are exact
# binary fractions, so with the daily revenue held as scale-6 integers
# every smoothing step is two integral divisions — and Spark's `div`
# and DuckDB's `//` BOTH truncate toward zero (probed: -7 div 2 = -3
# in each), so the whole recurrence is engine-exact with no rounding
# discipline needed beyond the fold itself. The oracle replays the
# identical fold with list_reduce over the identical [level, trend]
# integer pairs.

HOLT_H = 7


@query(
    "q_holt_trend",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
                 AS d,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) * 1000000 AS BIGINT)
                 AS y6
        FROM events GROUP BY 1
    ),
    bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
    spine AS (
        SELECT UNNEST(range(b.d0, b.d1 + 1)) AS d FROM bounds b
    ),
    series AS (
        SELECT s.d, COALESCE(dy.y6, 0) AS y6
        FROM spine s LEFT JOIN daily dy ON dy.d = s.d
    ),
    arr AS (
        SELECT list_transform(list(y6 ORDER BY d), y -> [y, 0::BIGINT])
                 AS ys,
               COUNT(*) AS n_days
        FROM series
    ),
    st AS (
        SELECT list_reduce(ys, (acc, x) -> [
                   (x[1] + acc[1] + acc[2]) // 2,
                   (((x[1] + acc[1] + acc[2]) // 2) - acc[1] + 3 * acc[2])
                     // 4
               ]) AS s,
               n_days
        FROM arr
    )
    SELECT CAST(h.h AS INT) AS h,
           round(CAST(st.s[1] + h.h * st.s[2] AS DOUBLE) / 1000000, 6)
             AS forecast,
           round(CAST(st.s[1] AS DOUBLE) / 1000000, 6) AS level,
           round(CAST(st.s[2] AS DOUBLE) / 1000000, 6) AS trend,
           CAST(st.n_days AS BIGINT) AS n_days
    FROM st, (SELECT UNNEST(range(1, {HOLT_H + 1})) AS h) h
    ORDER BY h
    """,
)
def q_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing of the dense daily revenue
    series (missing days = exact 0): level and trend folded with
    alpha = 1/2, beta = 1/4 over scale-6 integers — each step two
    truncating integral divisions, identical in both engines — then
    {HOLT_H} daily forecasts as level + h * trend. Seed: level = the
    first day's revenue, trend = 0 (the fold's own first element).

    Scale: one map-side-combined daily aggregate over the raw events;
    the fold runs on the |days|-row series collected into ONE array
    cell — bounded by the calendar, not the data (a year is 365
    elements), the same contract as q_changepoint's |days|-row scan.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        (
            F.unix_timestamp(F.date_trunc("day", F.col("ts")))
            / F.lit(86400)
        )
        .cast("bigint")
        .alias("d")
    ).agg(
        (F.sum(F.col("value").cast("decimal(38,6)")) * 1000000)
        .cast("bigint")
        .alias("y6")
    )
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("d")
    )
    series = spine.join(daily, "d", "left").select(
        "d", F.coalesce("y6", F.lit(0)).cast("bigint").alias("y6")
    )
    folded = series.agg(
        F.expr(
            """
            aggregate(
                slice(ts_arr, 2, size(ts_arr) - 1),
                ts_arr[0],
                (acc, x) -> array(
                    (x[0] + acc[0] + acc[1]) div 2,
                    (((x[0] + acc[0] + acc[1]) div 2) - acc[0]
                       + 3 * acc[1]) div 4
                )
            )
            """.replace(
                "ts_arr",
                "transform(array_sort(collect_list(struct(d, y6))),"
                " s -> array(s.y6, 0L))",
            )
        ).alias("s"),
        F.count(F.lit(1)).alias("n_days"),
    )
    horizons = spark.range(1, HOLT_H + 1).select(
        F.col("id").cast("int").alias("h")
    )
    return (
        folded.crossJoin(F.broadcast(horizons))
        .select(
            "h",
            F.round(
                (F.col("s")[0] + F.col("h") * F.col("s")[1]).cast("double")
                / 1000000,
                6,
            ).alias("forecast"),
            F.round(F.col("s")[0].cast("double") / 1000000, 6).alias(
                "level"
            ),
            F.round(F.col("s")[1].cast("double") / 1000000, 6).alias(
                "trend"
            ),
            F.col("n_days").cast("bigint").alias("n_days"),
        )
        .orderBy("h")
    )


_fmt(q_holt_trend, HOLT_H=HOLT_H)


# ---------------------------------------------------------------------------
# cumulative user growth (round 11)
# ---------------------------------------------------------------------------
# The growth-accounting ledger: per day, how many users were seen for
# the FIRST time (acquisition), how many were active at all, and the
# exact running total of distinct users ever seen. q_hll_rolling
# answers the windowed-distinct version approximately from register
# sketches; this is the exact cumulative companion — and it costs one
# first-seen aggregate, never a per-day COUNT(DISTINCT) rescan,
# because "cumulative distinct" telescopes into a running sum of
# first appearances.


@query(
    "q_cumulative_users",
    oracle="""
    WITH days AS (
        SELECT user_id,
               CAST(ts AS DATE) - DATE '1970-01-01' AS day_i
        FROM events
    ),
    firsts AS (
        SELECT user_id, MIN(day_i) AS first_day FROM days GROUP BY user_id
    ),
    active AS (
        SELECT day_i, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
        FROM days GROUP BY day_i
    ),
    news AS (
        SELECT first_day AS day_i, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM firsts GROUP BY first_day
    )
    SELECT CAST(a.day_i AS BIGINT) AS day_i,
           COALESCE(n.new_users, 0) AS new_users,
           a.active_users,
           CAST(a.active_users - COALESCE(n.new_users, 0) AS BIGINT)
             AS returning_users,
           CAST(SUM(COALESCE(n.new_users, 0)) OVER (ORDER BY a.day_i)
                AS BIGINT) AS cumulative_users
    FROM active a LEFT JOIN news n ON n.day_i = a.day_i
    ORDER BY day_i
    """,
)
def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting: new users (first appearance), active
    users, returning users, and the exact cumulative distinct-user
    total as a running sum of first appearances — the telescoping that
    makes 'cumulative distinct' cost ONE aggregate instead of a
    per-day COUNT(DISTINCT) rescan (q_hll_rolling is the sketched
    windowed sibling).

    Scale: one (user, day) projection feeds a per-user MIN and a
    per-day distinct count; the running sum runs over |days| rows."""
    ev = read_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_i")
    )
    firsts = days.groupBy("user_id").agg(F.min("day_i").alias("first_day"))
    active = days.groupBy("day_i").agg(
        F.countDistinct("user_id").cast("bigint").alias("active_users")
    )
    news = firsts.groupBy(F.col("first_day").alias("day_i")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    w = Window.orderBy("day_i")
    return (
        active.join(news, "day_i", "left")
        .na.fill({"new_users": 0})
        .select(
            F.col("day_i").cast("bigint").alias("day_i"),
            "new_users",
            "active_users",
            (F.col("active_users") - F.col("new_users"))
            .cast("bigint")
            .alias("returning_users"),
            F.sum("new_users").over(w).cast("bigint").alias(
                "cumulative_users"
            ),
        )
        .orderBy("day_i")
    )


# ---------------------------------------------------------------------------
# grouped Holt forecasts (round 11): every series at once
# ---------------------------------------------------------------------------
# q_holt_trend forecasts ONE global series; the production shape is
# thousands of per-key series smoothed in parallel — one groupBy, one
# fold per group, no driver loop. Same exact integer recurrence
# (alpha = 1/2, beta = 1/4, truncating integral divisions identical in
# both engines), one output row per (event_type, horizon).

GH_H = 3


@query(
    "q_grouped_forecast",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
                 AS d,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) * 1000000 AS BIGINT)
                 AS y6
        FROM events GROUP BY event_type, 2
    ),
    bounds AS (
        SELECT event_type, MIN(d) AS d0, MAX(d) AS d1
        FROM daily GROUP BY event_type
    ),
    spine AS (
        SELECT b.event_type, UNNEST(range(b.d0, b.d1 + 1)) AS d
        FROM bounds b
    ),
    series AS (
        SELECT s.event_type, s.d, COALESCE(dy.y6, 0) AS y6
        FROM spine s LEFT JOIN daily dy
          ON dy.event_type = s.event_type AND dy.d = s.d
    ),
    arr AS (
        SELECT event_type,
               list_transform(list(y6 ORDER BY d), y -> [y, 0::BIGINT])
                 AS ys,
               COUNT(*) AS n_days
        FROM series GROUP BY event_type
    ),
    st AS (
        SELECT event_type,
               list_reduce(ys, (acc, x) -> [
                   (x[1] + acc[1] + acc[2]) // 2,
                   (((x[1] + acc[1] + acc[2]) // 2) - acc[1] + 3 * acc[2])
                     // 4
               ]) AS s,
               n_days
        FROM arr
    )
    SELECT st.event_type, CAST(h.h AS INT) AS h,
           round(CAST(st.s[1] + h.h * st.s[2] AS DOUBLE) / 1000000, 6)
             AS forecast,
           round(CAST(st.s[1] AS DOUBLE) / 1000000, 6) AS level,
           round(CAST(st.s[2] AS DOUBLE) / 1000000, 6) AS trend,
           CAST(st.n_days AS BIGINT) AS n_days
    FROM st, (SELECT UNNEST(range(1, {GH_H + 1})) AS h) h
    ORDER BY event_type, h
    """,
)
def q_grouped_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt level+trend forecasts for EVERY event type's daily revenue
    series in one pass: groupBy(event_type), dense per-series day
    spine, one exact integer fold per group — the grouped form of
    q_holt_trend, which is how a fleet of thousands of per-key series
    actually gets forecast (no driver loop, no per-series job).

    Scale: the fold parallelizes across groups; per-group state is
    two integers; the spine join is an equi-join on (type, day)."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (
            F.unix_timestamp(F.date_trunc("day", F.col("ts")))
            / F.lit(86400)
        )
        .cast("bigint")
        .alias("d"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(38,6)")) * 1000000)
        .cast("bigint")
        .alias("y6")
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("d0", "d1")).alias("d")
    )
    series = spine.join(daily, ["event_type", "d"], "left").select(
        "event_type",
        "d",
        F.coalesce("y6", F.lit(0)).cast("bigint").alias("y6"),
    )
    folded = series.groupBy("event_type").agg(
        F.expr(
            """
            aggregate(
                slice(ts_arr, 2, size(ts_arr) - 1),
                ts_arr[0],
                (acc, x) -> array(
                    (x[0] + acc[0] + acc[1]) div 2,
                    (((x[0] + acc[0] + acc[1]) div 2) - acc[0]
                       + 3 * acc[1]) div 4
                )
            )
            """.replace(
                "ts_arr",
                "transform(array_sort(collect_list(struct(d, y6))),"
                " s -> array(s.y6, 0L))",
            )
        ).alias("s"),
        F.count(F.lit(1)).alias("n_days"),
    )
    horizons = spark.range(1, GH_H + 1).select(
        F.col("id").cast("int").alias("h")
    )
    return (
        folded.crossJoin(F.broadcast(horizons))
        .select(
            "event_type",
            "h",
            F.round(
                (F.col("s")[0] + F.col("h") * F.col("s")[1]).cast("double")
                / 1000000,
                6,
            ).alias("forecast"),
            F.round(F.col("s")[0].cast("double") / 1000000, 6).alias(
                "level"
            ),
            F.round(F.col("s")[1].cast("double") / 1000000, 6).alias(
                "trend"
            ),
            F.col("n_days").cast("bigint").alias("n_days"),
        )
        .orderBy("event_type", "h")
    )


_fmt(q_grouped_forecast, GH_H=GH_H)


# ---------------------------------------------------------------------------
# OHLC / VWAP bars (round 12)
# ---------------------------------------------------------------------------
# The telemetry-rollup shape finance calls candlesticks and ops calls
# "hourly bars": per (series, hour bucket) the first / highest /
# lowest / last value plus volume and the volume-weighted average.
# Every column is an exactly-mergeable aggregate — open/close are
# argmin/argmax over the unique (ts, event_id) key, high/low are
# MIN/MAX, volume is COUNT, the average is an exact-decimal SUM over
# COUNT — which is precisely what makes the bar table maintainable
# incrementally (streaming twin in streaming.sketchview).


def ohlc_bars(ev: DataFrame) -> DataFrame:
    """One bar per (event_type, hour bucket): the grouped aggregate
    both the batch query and the streaming view's per-batch delta
    run. Open/close ride MIN/MAX over struct(ts_us, event_id, value)
    — lexicographic on the unique event key, so deterministic; the
    vwap numerator accumulates in exact decimal."""
    keyed = ev.select(
        "event_type",
        (F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000)
        .cast("bigint")
        .alias("hour_bucket"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
        "value",
    )
    return keyed.groupBy("event_type", "hour_bucket").agg(
        F.min(F.struct("ts_us", "event_id", "value")).alias("o"),
        F.max(F.struct("ts_us", "event_id", "value")).alias("c"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.count(F.lit(1)).alias("volume"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("vsum"),
    )


@query(
    "q_ohlc_bars",
    oracle="""
    WITH keyed AS (
        SELECT event_type,
               CAST(floor(epoch(ts)) AS BIGINT) * 1000000 AS ts_us0,
               (CAST(floor(epoch(ts)) AS BIGINT) * 1000000
                + CAST(floor((epoch(ts) - floor(epoch(ts))) * 1000000)
                       AS BIGINT)) AS ts_us,
               event_id, value
        FROM events
    ),
    bucketed AS (
        SELECT event_type, ts_us // 3600000000 AS hour_bucket,
               ts_us, event_id, value,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, ts_us // 3600000000
                   ORDER BY ts_us, event_id) AS ra,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, ts_us // 3600000000
                   ORDER BY ts_us DESC, event_id DESC) AS rz
        FROM keyed
    ),
    agg AS (
        SELECT event_type, hour_bucket,
               MAX(CASE WHEN ra = 1 THEN value END) AS open,
               MAX(value) AS high, MIN(value) AS low,
               MAX(CASE WHEN rz = 1 THEN value END) AS close,
               COUNT(*) AS volume,
               SUM(CAST(value AS DECIMAL(38,6))) AS vsum
        FROM bucketed GROUP BY event_type, hour_bucket
    )
    SELECT event_type, CAST(hour_bucket AS BIGINT) AS hour_bucket,
           round(open, 6) AS open, round(high, 6) AS high,
           round(low, 6) AS low, round(close, 6) AS close,
           CAST(volume AS BIGINT) AS volume,
           round(CAST(vsum AS DOUBLE) / volume, 6) AS vwap
    FROM agg ORDER BY event_type, hour_bucket
    """,
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC/VWAP bars per event type: open/high/low/close of
    the value series, event volume, and the exact-decimal mean — the
    candlestick rollup, which is also the canonical "downsample a
    metric for dashboards" operator. Open/close are argmin/argmax
    over the unique (ts_us, event_id) key (struct MIN/MAX — collapses
    map-side, no window over the corpus); the oracle replays them
    with ROW_NUMBER since DuckDB lacks struct-arg aggregates.

    Scale: ONE map-side-combined grouped aggregate — bars are the
    exactly-mergeable summary, which is why the streaming twin
    (q_ohlc_stream) can maintain the same table incrementally without
    ever rescanning history."""
    bars = ohlc_bars(read_table(spark, sf_dir, "events"))
    return bars.select(
        "event_type",
        F.col("hour_bucket").cast("bigint").alias("hour_bucket"),
        F.round(F.col("o.value"), 6).alias("open"),
        F.round("high", 6).alias("high"),
        F.round("low", 6).alias("low"),
        F.round(F.col("c.value"), 6).alias("close"),
        F.col("volume").cast("bigint").alias("volume"),
        F.round(F.col("vsum").cast("double") / F.col("volume"), 6).alias(
            "vwap"
        ),
    ).orderBy("event_type", "hour_bucket")


# ---------------------------------------------------------------------------
# Gini coefficient — concentration audit (round 12)
# ---------------------------------------------------------------------------
# "How concentrated is this metric?" is the first question about any
# per-user/per-key distribution: a Gini near 0 means value is spread
# evenly, near 1 means a handful of whales own it — the number that
# decides whether a mean is even meaningful, and (for a corpus) how
# skewed a sampling key is before partitioning on it. Computed with
# the exact sorted-rank identity G = 2*sum(i*x_i)/(n*sum(x_i))
# - (n+1)/n over per-user value totals, all in exact decimal/integer
# arithmetic until two final double divisions.


@query(
    "q_gini_coefficient",
    oracle="""
    WITH per_user AS (
        SELECT event_type, user_id,
               SUM(CAST(value AS DECIMAL(38,6))) AS s
        FROM events GROUP BY event_type, user_id
    ),
    ranked AS (
        SELECT event_type, s,
               ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY s, user_id) AS i
        FROM per_user
    ),
    sums AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(s) AS total,
               SUM(i * s) AS weighted
        FROM ranked GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_users,
           round(CAST(total AS DOUBLE), 6) AS total_value,
           round(2.0 * CAST(weighted AS DOUBLE)
                 / (n * CAST(total AS DOUBLE))
                 - (n + 1.0) / n, 6) AS gini
    FROM sums ORDER BY event_type
    """,
)
def q_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of per-user value totals, one coefficient
    per event type — the whale-audit that decides whether means are
    meaningful and how badly a key skews before you partition on it
    (companion to q_skew_diagnose's row-count view; this measures
    VALUE concentration).

    Numerics: per-user totals and the rank-weighted sum are exact
    decimal (rank i is an integer); only the final identity
    2*W/(n*T) - (n+1)/n evaluates in double, identically on both
    engines. Rank ties break on user_id, so the sorted order — and
    hence W — is engine-exact.

    Scale: one groupBy(user) then one per-group rank (single shuffle
    each); the per-event-type sort is the order statistic every exact
    quantile here already pays. At extreme cardinality swap the exact
    rank for the KLL-sketch cumulative (q_kll_quantiles) — the audit
    tolerates approximation; the oracle gate does not."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(38,6)")).alias("s")
    )
    w = Window.partitionBy("event_type").orderBy("s", "user_id")
    ranked = per_user.select(
        "event_type", "s", F.row_number().over(w).alias("i")
    )
    sums = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").alias("total"),
        F.sum(F.col("i") * F.col("s")).alias("weighted"),
    )
    n, total, weighted = F.col("n"), F.col("total"), F.col("weighted")
    return sums.select(
        "event_type",
        n.cast("bigint").alias("n_users"),
        F.round(total.cast("double"), 6).alias("total_value"),
        F.round(
            F.lit(2.0) * weighted.cast("double") / (n * total.cast("double"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# corpus composition drift (round 13): is the MIX changing?
# ---------------------------------------------------------------------------
# q_histogram_drift watches a VALUE distribution; the complementary
# pipeline monitor watches COMPOSITION — the share of each event type
# (source, domain, language) per day against the first day's baseline
# mix. A feed that silently doubles one source's share poisons every
# downstream mixture weight before any value-level statistic moves.
# The statistic is the chi-square distance of each day's type counts
# against expected counts under the baseline shares — integer counts,
# one double term per (day, type), folded in type order so the
# per-day statistic is bit-identical across engines.


def _register_mix_drift() -> None:
    from pyspark.sql import Window

    from dynamodb_streaming_datalake_spark.registry import query
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    @query(
        "q_source_mix_drift",
        oracle="""
        WITH c AS (
            SELECT CAST(ts AS DATE) - DATE '1970-01-01' AS day_i,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        d AS (
            SELECT day_i, SUM(n) AS n_day,
                   MIN(day_i) OVER () AS day0
            FROM c GROUP BY day_i
        ),
        base AS (
            SELECT c.event_type,
                   CAST(c.n AS DOUBLE) / d.n_day AS base_share
            FROM c JOIN d USING (day_i)
            WHERE c.day_i = d.day0
        ),
        terms AS (
            SELECT c.day_i, d.n_day, c.event_type,
                   (CAST(c.n AS DOUBLE) - b.base_share * d.n_day)
                   * (CAST(c.n AS DOUBLE) - b.base_share * d.n_day)
                   / (b.base_share * d.n_day) AS t
            FROM c JOIN d USING (day_i) JOIN base b USING (event_type)
        ),
        folded AS (
            SELECT day_i, n_day,
                   SUM(t) OVER (PARTITION BY day_i ORDER BY event_type
                                ROWS UNBOUNDED PRECEDING) AS chi_cum,
                   COUNT(*) OVER (PARTITION BY day_i) AS n_types,
                   ROW_NUMBER() OVER (PARTITION BY day_i
                                      ORDER BY event_type DESC) AS rn
            FROM terms
        )
        SELECT CAST(day_i AS BIGINT) AS day_i,
               CAST(n_day AS BIGINT) AS n_events,
               CAST(n_types AS BIGINT) AS n_types,
               round(chi_cum, 6) AS chi_square
        FROM folded WHERE rn = 1
        """,
    )
    def q_source_mix_drift(spark, sf_dir):
        """Composition-drift monitor: each day's event-type mix scored
        against the FIRST day's baseline shares by chi-square over the
        expected counts — the alarm that fires when a feed silently
        changes the corpus mixture before any value-level statistic
        moves. Counts are exact integers; the per-day statistic folds
        its (observed - expected)^2/expected terms in type order (a
        running window sum), so both engines report the identical
        drift number.

        Scope (deliberate, round-13 ADVICE): the statistic is computed
        over BASELINE-DAY types only — the inner join against the
        day-0 shares means a type absent on day 0 (a newly introduced
        source) contributes no direct chi-square term and is detected
        indirectly, through n_day inflating every baseline type's
        expected count; n_types likewise counts baseline types. This
        is the classical chi-square-against-reference convention (an
        unseen category has expected count 0, where the statistic is
        undefined); a brand-new-source ALARM is a different monitor —
        pair with q_histogram_drift or an anti-join on type for that.

        Scale: one map-side-combined (day, type) count — the only
        data-sized pass — then window math over |days| x |types| rows;
        the baseline is a broadcast |types|-row frame. Swap event_type
        for source/language/domain and day for any window verbatim."""
        from pyspark.sql import functions as F

        e = read_table(spark, sf_dir, "events")
        c = (
            e.select(
                F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day_i"),
                "event_type",
            )
            .groupBy("day_i", "event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        d = c.groupBy("day_i").agg(F.sum("n").alias("n_day"))
        day0 = d.agg(F.min("day_i").alias("day0"))
        base = (
            c.join(d, "day_i")
            .crossJoin(F.broadcast(day0))
            .where(F.col("day_i") == F.col("day0"))
            .select(
                "event_type",
                (F.col("n").cast("double") / F.col("n_day")).alias("base_share"),
            )
        )
        exp = F.col("base_share") * F.col("n_day")
        terms = (
            c.join(d, "day_i")
            .join(F.broadcast(base), "event_type")
            .select(
                "day_i",
                "n_day",
                "event_type",
                (
                    (F.col("n").cast("double") - exp)
                    * (F.col("n").cast("double") - exp)
                    / exp
                ).alias("t"),
            )
        )
        wcum = (
            Window.partitionBy("day_i")
            .orderBy("event_type")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wall = Window.partitionBy("day_i")
        wlast = Window.partitionBy("day_i").orderBy(F.col("event_type").desc())
        folded = terms.select(
            "day_i",
            "n_day",
            F.sum("t").over(wcum).alias("chi_cum"),
            F.count(F.lit(1)).over(wall).alias("n_types"),
            F.row_number().over(wlast).alias("rn"),
        )
        return (
            folded.where(F.col("rn") == 1)
            .select(
                F.col("day_i").cast("bigint").alias("day_i"),
                F.col("n_day").cast("bigint").alias("n_events"),
                F.col("n_types").cast("bigint").alias("n_types"),
                F.round("chi_cum", 6).alias("chi_square"),
            )
        )


_register_mix_drift()


# --------------------------------------------------------------------------
# exact quantiles in two passes: histogram -> bucket refine
# --------------------------------------------------------------------------
# q_value_percentiles buffers each group's values (its docstring says
# so) and the sketch family (KLL) is approximate. The classic exact
# algorithm at lake scale is TWO bounded passes: pass 1 histograms the
# column into coarse buckets and locates, per target rank, the bucket
# containing it (a driver-bounded artifact, |buckets| rows — the
# skew-diagnose pattern); pass 2 scans ONLY those buckets and ranks
# within them. No executor ever buffers more than a bucket, no sort is
# global, and the answer is the exact k-th smallest — not an estimate.

#: target quantiles (lower-rank convention: rank = max(1, ceil(q*n)))
EXQ_QS = (0.5, 0.9, 0.99)
#: sub-bucket fan-out for the second histogram level inside a picked
#: unit bucket (2^-EXQ_SUBW_BITS value width per sub-bucket)
EXQ_SUBW_BITS = 20
EXQ_SUBW = 1 << EXQ_SUBW_BITS


@query(
    "q_exact_quantile_twopass",
    oracle=f"""
    WITH v AS (
        SELECT value, CAST(floor(value) AS BIGINT) AS b FROM events
        WHERE value IS NOT NULL
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    qs AS (SELECT * FROM (VALUES (0.5), (0.9), (0.99)) t(q)),
    tgt AS (
        SELECT qs.q,
               GREATEST(1, CAST(ceil(qs.q * n.n) AS BIGINT)) AS target_rank,
               n.n AS n_total
        FROM qs, n
    ),
    h AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY b),
    hc AS (
        SELECT b, cnt,
               COALESCE(SUM(cnt) OVER (ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cum_before
        FROM h
    ),
    pick AS (
        SELECT t.q, t.target_rank, t.n_total, hc.b, hc.cum_before
        FROM tgt t JOIN hc
          ON t.target_rank > hc.cum_before
         AND t.target_rank <= hc.cum_before + hc.cnt
    ),
    r2 AS (
        SELECT b, value,
               ROW_NUMBER() OVER (PARTITION BY b ORDER BY value) AS rn
        FROM v WHERE b IN (SELECT b FROM pick)
    )
    SELECT p.q, p.target_rank, p.n_total,
           p.b AS bucket,
           round(r2.value, 6) AS quantile_value
    FROM pick p
    JOIN r2 ON r2.b = p.b AND r2.rn = (p.target_rank - p.cum_before)
    """,
)
def q_exact_quantile_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p50/p90/p99 of events.value in two bounded passes: pass 1
    histograms the column into unit buckets and finds, per target rank
    (max(1, ceil(q*n)), the k-th-smallest convention), the bucket
    holding it — the histogram is a driver-bounded artifact of
    |buckets| rows, the same AQE-statistic shape as skew diagnosis;
    pass 2 scans only the picked buckets and row-numbers WITHIN each
    bucket to the exact element. No global sort, no per-group value
    buffering, no estimate: the value returned is the true k-th
    smallest, and the oracle recomputes the identical two-phase
    selection. The whole pipeline is LAZY — pass 1's bucket location
    runs as a |buckets|-row windowed frame joined against the
    {EXQ_QS}-row quantile panel, not a driver collect, so building
    the plan costs nothing and nothing executes twice.

    Scale: pass 1 is one map-side-combined groupBy to |buckets| rows
    (the windowed cumulative over it is the driver-bounded artifact,
    same budget as the AQE statistics the skew queries read); pass 2
    broadcast-semi-joins the picked buckets — a bucket filter
    applied in the scan stage — then RE-HISTOGRAMS inside each
    picked bucket at 2^-{EXQ_SUBW_BITS} width (the shipped second
    level below): the residual rank is located in a sub-bucket via
    the same cumulative-histogram pattern, and only the picked
    SUB-bucket is row-numbered, so a pathological bucket holding
    most of the mass sorts at most the rows inside one
    2^-{EXQ_SUBW_BITS}-wide value band, never the whole bucket
    (pinned by the >90%-mass-in-one-bucket fixture in
    tests/test_oracle_parity.py). Ties always share a sub-bucket and
    are value-exact under any row_number order, so mass concentrated
    finer than the sub-width costs sort size only, never
    exactness."""
    # NULL values are excluded on BOTH engines (quantiles of the
    # non-null population).
    e = (
        read_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("value", F.floor("value").cast("long").alias("b"))
    )
    hist = e.groupBy("b").agg(F.count(F.lit(1)).alias("cnt"))
    # |buckets|-row frame: un-partitioned windows are deliberate
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    hc = hist.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(wcum), F.lit(0))
    ).withColumn("n_total", F.sum("cnt").over(Window.partitionBy()))
    qs = spark.createDataFrame([(q,) for q in EXQ_QS], "q double")
    pick = (
        hc.crossJoin(F.broadcast(qs))
        .withColumn(
            "target_rank",
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("q") * F.col("n_total")).cast("long"),
            ),
        )
        .where(
            (F.col("target_rank") > F.col("cum_before"))
            & (F.col("target_rank") <= F.col("cum_before") + F.col("cnt"))
        )
        .select("q", "target_rank", "n_total", "b", "cum_before")
    )
    sub = e.join(
        F.broadcast(pick.select("b").distinct()), "b", "semi"
    ).withColumn(
        # second histogram level: fractional position inside the unit
        # bucket, at 2^-EXQ_SUBW_BITS width. value - b is exact
        # (b = floor(value)), and v1 < v2 => sb1 <= sb2 (floor of a
        # monotone rounding), so ordering by (sb, value) == ordering
        # by value and within-bucket rank decomposes exactly as
        # cum2_before(sb) + rank-within-sb.
        "sb",
        F.floor((F.col("value") - F.col("b")) * EXQ_SUBW).cast("long"),
    )
    h2 = sub.groupBy("b", "sb").agg(F.count(F.lit(1)).alias("cnt2"))
    w2 = Window.partitionBy("b").orderBy("sb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    hc2 = h2.withColumn(
        "cum2_before", F.coalesce(F.sum("cnt2").over(w2), F.lit(0))
    )
    pick2 = (
        hc2.join(F.broadcast(pick), "b")
        .withColumn("r", F.col("target_rank") - F.col("cum_before"))
        .where(
            (F.col("r") > F.col("cum2_before"))
            & (F.col("r") <= F.col("cum2_before") + F.col("cnt2"))
        )
        .select(
            "q",
            "target_rank",
            "n_total",
            "b",
            "sb",
            (F.col("r") - F.col("cum2_before")).alias("rn_target"),
        )
    )
    sub2 = sub.join(
        F.broadcast(pick2.select("b", "sb").distinct()), ["b", "sb"], "semi"
    )
    r2 = sub2.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("b", "sb").orderBy("value")),
    )
    return (
        r2.join(F.broadcast(pick2), ["b", "sb"])
        .where(F.col("rn") == F.col("rn_target"))
        .select(
            "q",
            "target_rank",
            "n_total",
            F.col("b").alias("bucket"),
            F.round("value", 6).alias("quantile_value"),
        )
    )


_fmt(q_exact_quantile_twopass, EXQ_QS=len(EXQ_QS), EXQ_SUBW_BITS=EXQ_SUBW_BITS)


# --------------------------------------------------------------------------
# interval-overlap join, bucket-SPANNING variant: explode + pair dedup
# --------------------------------------------------------------------------
# q_interval_join's intervals are built per-day, so each lives in one
# bucket. The general case — both interval sets spanning several
# buckets — needs the full pattern: explode each interval to every
# bucket it touches, equi-join on the bucket, DEDUPE the pairs that
# met in more than one shared bucket, then compute the exact overlap
# from the carried endpoints. Here side A is per-user ISO-WEEK
# activity intervals (up to 7 daily buckets) and side B is per-type
# 5-DAY-window intervals (up to 5, deliberately misaligned with
# weeks), so pairs genuinely collide on multiple days and the dedup
# stage is load-bearing. The oracle is the NAIVE overlap theta join —
# the value-hash gate proves the bucketed plan implements exactly the
# quadratic semantics without ever planning a nested loop.


@query(
    "q_interval_join_spanning",
    oracle="""
    WITH a AS (
        SELECT user_id, date_trunc('week', ts) AS wk,
               min(ts) AS a_start, max(ts) AS a_end
        FROM events GROUP BY 1, 2
    ),
    b AS (
        SELECT event_type,
               (CAST(ts AS DATE) - DATE '1970-01-01') // 5 AS w5,
               min(ts) AS b_start, max(ts) AS b_end
        FROM events GROUP BY 1, 2
    ),
    p AS (
        SELECT b.event_type,
               (epoch_us(least(a.a_end, b.b_end))
                - epoch_us(greatest(a.a_start, b.b_start))) AS ov_us
        FROM a JOIN b
          ON a.a_start <= b.b_end AND b.b_start <= a.a_end
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(ov_us) AS BIGINT) AS total_overlap_us
    FROM p GROUP BY event_type
    """,
)
def q_interval_join_spanning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join where BOTH sides span several buckets:
    per-user ISO-week activity intervals against per-type 5-day-window
    intervals (misaligned on purpose). Each interval explodes to the
    daily buckets it touches (bounded fan-out: <= 7 and <= 5), the
    join is a hash join on the day, duplicate pair hits from multiple
    shared days collapse in one distinct on the pair keys + endpoints,
    and the exact overlap microseconds come from the carried
    endpoints. The oracle runs the NAIVE quadratic overlap join — the
    hash gate proves bucket + residual + dedup is semantics-
    preserving, which is the entire trick that makes interval joins
    hash-joinable at 100 TB.

    Scale: fan-out is bounded by interval length / bucket width (the
    tuning knob); the equi-join shuffles (or broadcasts) on the day
    key; dedup is a hash aggregate on pair keys. Nothing is ever
    |A| x |B|."""
    e = read_table(spark, sf_dir, "events")
    a = e.groupBy(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).agg(F.min("ts").alias("a_start"), F.max("ts").alias("a_end"))
    epoch_day = F.datediff(
        F.to_date("ts"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    # 5-day bucket id: (day - day % 5) groups identically to DuckDB's
    # day // 5 (both sides positive; the key is grouping-only)
    b = e.groupBy(
        "event_type",
        (epoch_day - epoch_day % 5).alias("w5"),
    ).agg(F.min("ts").alias("b_start"), F.max("ts").alias("b_end"))
    a_days = a.withColumn(
        "day",
        F.explode(F.sequence(F.to_date("a_start"), F.to_date("a_end"))),
    )
    b_days = b.withColumn(
        "day",
        F.explode(F.sequence(F.to_date("b_start"), F.to_date("b_end"))),
    )
    hits = a_days.join(
        F.broadcast(b_days),
        (a_days["day"] == b_days["day"])
        & (F.col("a_start") <= F.col("b_end"))
        & (F.col("b_start") <= F.col("a_end")),
    ).select(
        "user_id", "wk", "event_type", "w5",
        "a_start", "a_end", "b_start", "b_end",
    )
    pairs = hits.distinct()
    ov_us = F.unix_micros(
        F.least("a_end", "b_end").cast("timestamp")
    ) - F.unix_micros(F.greatest("a_start", "b_start").cast("timestamp"))
    return (
        pairs.select("event_type", ov_us.alias("ov_us"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("ov_us").cast("long").alias("total_overlap_us"),
        )
    )


# --------------------------------------------------------------------------
# skyline (Pareto frontier): bucket-local skyline -> global merge
# --------------------------------------------------------------------------
# The classic multi-criteria operator: rows not DOMINATED by any other
# (another row >= on both dimensions, > on at least one). A naive plan
# is the quadratic NOT EXISTS self-join — which is exactly what the
# ORACLE runs, so the hash gate proves the distributed plan below
# implements the textbook semantics. The scale structure exploits two
# facts: (a) a 2-D skyline is a SORTED-ORDER window — after collapsing
# duplicate points, sort by (x desc, y desc); a point survives iff its
# y strictly exceeds the running max of y over all preceding points;
# (b) skyline distributes over unions — skyline(P) =
# skyline(union of per-bucket skylines) — so stage 1 runs the window
# WITHIN price-range buckets in parallel and stage 2 re-runs it over
# the (tiny) union of survivors. The same two-level shape as the PPS
# prefix sum; a third level covers any scale.


def _skyline_pass(pts: DataFrame, *part_cols: str) -> DataFrame:
    """One sorted-window skyline pass over collapsed (price, odate)
    points, partitioned by ``part_cols`` (empty = global)."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("price").desc(), F.col("odate").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pts.withColumn("prev_max", F.max("odate").over(w))
        .where(
            F.col("prev_max").isNull()
            | (F.col("odate") > F.col("prev_max"))
        )
        .drop("prev_max")
    )


@query(
    "q_skyline",
    oracle="""
    WITH pts AS (
        SELECT o_totalprice AS dprice, o_orderdate AS odate,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1, 2
    )
    SELECT CAST(dprice AS DOUBLE) AS price, odate, n_orders
    FROM pts p WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE (q.dprice >= p.dprice AND q.odate > p.odate)
           OR (q.dprice > p.dprice AND q.odate >= p.odate))
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal orders on (total price, order date): no other
    order is at least as expensive AND at least as recent with one
    strict. Computed distributedly — duplicate points collapse in one
    aggregate, stage 1 runs the sorted-window skyline WITHIN
    price-range buckets in parallel, stage 2 re-runs the same window
    over the union of bucket survivors (skyline distributes over
    unions, so this equals the global skyline). The oracle is the
    textbook quadratic NOT EXISTS domination query, making the gate a
    proof that the two-stage plan implements exactly that semantic.

    Scale: stage 1 is a window over bucket partitions (parallel,
    spill-free); stage 2's input is bounded by the sum of per-bucket
    skyline sizes — for a 2-D skyline that is near the bucket count,
    not the table size. Nothing is ever |P| x |P|."""
    o = read_table(spark, sf_dir, "orders")
    pts = o.groupBy(
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderdate").alias("odate"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    bucketed = pts.withColumn(
        "bkt", F.floor(F.col("price") / 10000).cast("long")
    )
    local = _skyline_pass(bucketed, "bkt").drop("bkt")
    return _skyline_pass(local).select("price", "odate", "n_orders")


# --------------------------------------------------------------------------
# grouped WEIGHTED exact quantile: the two-pass kernel, generalized
# --------------------------------------------------------------------------
# q_exact_quantile_twopass finds the global k-th smallest; the shape a
# pricing/mix pipeline actually asks for is per-group and WEIGHTED —
# "the price level at which half the shipped QUANTITY sits", i.e. the
# smallest value v with cumulative weight(<= v) >= q * W, per group.
# Same two bounded passes: the histogram is per (group, bucket) with
# SUMMED weights (still a driver-bounded artifact), and pass 2 ranks
# by CUMULATIVE WEIGHT within the picked buckets. Ties need one care:
# the running sum must use an explicit ROWS frame (a RANGE frame gives
# every tied row the same cumulative and the crossing row vanishes);
# with ROWS, engines may pick different rows inside a tie run but the
# crossing VALUE — the only thing emitted — is identical.

#: weighted quantiles released per group
WQ_QS = (0.5, 0.9)


@query(
    "q_grouped_weighted_quantile",
    oracle="""
    WITH v AS (
        SELECT l_returnflag AS g,
               CAST(l_extendedprice AS DOUBLE) AS val,
               CAST(l_quantity AS BIGINT) AS w,
               CAST(floor(l_extendedprice / 1000) AS BIGINT) AS b
        FROM lineitem
        WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ),
    tw AS (SELECT g, CAST(SUM(w) AS BIGINT) AS total_weight
           FROM v GROUP BY g),
    qs AS (SELECT * FROM (VALUES (0.5), (0.9)) t(q)),
    tgt AS (
        SELECT tw.g, qs.q, tw.total_weight,
               GREATEST(1, CAST(ceil(qs.q * tw.total_weight) AS BIGINT))
                 AS target
        FROM tw, qs
    ),
    h AS (SELECT g, b, CAST(SUM(w) AS BIGINT) AS bw FROM v GROUP BY g, b),
    hc AS (
        SELECT g, b, bw,
               COALESCE(SUM(bw) OVER (PARTITION BY g ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cum_before
        FROM h
    ),
    pick AS (
        SELECT t.g, t.q, t.total_weight, t.target,
               hc.b, (t.target - hc.cum_before) AS rib
        FROM tgt t JOIN hc
          ON t.g = hc.g
         AND t.target > hc.cum_before
         AND t.target <= hc.cum_before + hc.bw
    ),
    r2 AS (
        SELECT g, b, val, w,
               SUM(w) OVER (PARTITION BY g, b ORDER BY val
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum
        FROM v WHERE (g, b) IN (SELECT (g, b) FROM pick)
    )
    SELECT p.g AS group_key, p.q, p.total_weight, p.target,
           round(r2.val, 2) AS quantile_value
    FROM pick p
    JOIN r2 ON r2.g = p.g AND r2.b = p.b
           AND r2.cum >= p.rib AND r2.cum - r2.w < p.rib
    """,
)
def q_grouped_weighted_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-return-flag EXACT weighted p50/p90 of extended price,
    weighted by shipped quantity — the smallest price v whose
    cumulative quantity reaches q of the group total, found in the
    same two bounded passes as q_exact_quantile_twopass generalized to
    groups and weights: a per-(group, bucket) weight histogram
    (driver-bounded artifact), then a cumulative-weight crossing scan
    inside only the picked buckets. The running sum uses an explicit
    ROWS frame, so tied prices cross deterministically — engines may
    cross on different tied rows but emit the identical VALUE, the
    only column released.

    Scale: pass 1 one map-side-combined groupBy to |groups| x
    |buckets| rows (the per-group cumulative window runs over that
    grouped frame); pass 2 broadcast-semi-joins the |groups| x
    |quantiles| picked buckets — the filter applies in the scan
    stage — then RE-HISTOGRAMS each picked band at 2^-20 of its
    width (the q_exact_quantile_twopass second level, weighted):
    the residual weight target is located in a sub-bucket and only
    that sub-bucket is windowed, so a band holding most of the
    group's mass never sorts as one partition (same fixture pin).
    Exact weighted percentiles with no global sort, no per-group
    value buffering, and no driver-side collect (the whole pipeline
    is lazy)."""
    # NULL prices/weights are excluded on BOTH engines.
    l = (
        read_table(spark, sf_dir, "lineitem")
        .where(
            F.col("l_extendedprice").isNotNull()
            & F.col("l_quantity").isNotNull()
        )
        .select(
            F.col("l_returnflag").alias("g"),
            F.col("l_extendedprice").cast("double").alias("val"),
            F.col("l_quantity").cast("long").alias("w"),
            F.floor(F.col("l_extendedprice") / 1000)
            .cast("long")
            .alias("b"),
        )
    )
    hist = l.groupBy("g", "b").agg(F.sum("w").alias("bw"))
    wg = Window.partitionBy("g")
    wcum = wg.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    hc = hist.withColumn(
        "cum_before", F.coalesce(F.sum("bw").over(wcum), F.lit(0))
    ).withColumn("total_weight", F.sum("bw").over(wg))
    qs = spark.createDataFrame([(q,) for q in WQ_QS], "q double")
    tgt = (
        hc.crossJoin(F.broadcast(qs))
        .withColumn(
            "target",
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("q") * F.col("total_weight")).cast("long"),
            ),
        )
        .where(
            (F.col("target") > F.col("cum_before"))
            & (F.col("target") <= F.col("cum_before") + F.col("bw"))
        )
        .select(
            "g",
            "q",
            "total_weight",
            "target",
            "b",
            (F.col("target") - F.col("cum_before")).alias("rib"),
        )
    )
    sub = l.join(
        F.broadcast(tgt.select("g", "b").distinct()), ["g", "b"], "semi"
    ).withColumn(
        # second histogram level, weighted: fractional position inside
        # the picked 1000-wide band at 2^-EXQ_SUBW_BITS width. Tied
        # values always share a sub-bucket (same val => same sb), so
        # the ROWS-frame crossing semantics decompose exactly as
        # cum2_before(sb) + within-sub-bucket cumulative weight.
        "sb",
        F.floor((F.col("val") / 1000 - F.col("b")) * EXQ_SUBW).cast("long"),
    )
    h2 = sub.groupBy("g", "b", "sb").agg(F.sum("w").alias("bw2"))
    w2 = Window.partitionBy("g", "b").orderBy("sb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    hc2 = h2.withColumn(
        "cum2_before", F.coalesce(F.sum("bw2").over(w2), F.lit(0))
    )
    pick2 = (
        hc2.join(F.broadcast(tgt), ["g", "b"])
        .where(
            (F.col("rib") > F.col("cum2_before"))
            & (F.col("rib") <= F.col("cum2_before") + F.col("bw2"))
        )
        .select(
            "g",
            "q",
            "total_weight",
            "target",
            "b",
            "sb",
            (F.col("rib") - F.col("cum2_before")).alias("rib2"),
        )
    )
    sub2 = sub.join(
        F.broadcast(pick2.select("g", "b", "sb").distinct()),
        ["g", "b", "sb"],
        "semi",
    )
    wcum = (
        Window.partitionBy("g", "b", "sb")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r2 = sub2.withColumn("cum", F.sum("w").over(wcum))
    return (
        r2.join(F.broadcast(pick2), ["g", "b", "sb"])
        .where(
            (F.col("cum") >= F.col("rib2"))
            & (F.col("cum") - F.col("w") < F.col("rib2"))
        )
        .select(
            F.col("g").alias("group_key"),
            "q",
            "total_weight",
            "target",
            F.round("val", 2).alias("quantile_value"),
        )
    )


_fmt(q_grouped_weighted_quantile, WQ_QS=len(WQ_QS))


# --------------------------------------------------------------------------
# partial autocorrelation (Durbin–Levinson), generated cross-engine
# --------------------------------------------------------------------------
# q_autocorrelation answers "which lags correlate"; the PACF answers
# the modeling question behind it — "which lags correlate DIRECTLY,
# net of the shorter lags" — i.e. the AR-order diagnostic (the PACF
# of an AR(p) cuts off after lag p). The Durbin–Levinson recursion
# that produces it is inherently sequential scalar arithmetic, so it
# runs the q_linear_probe_k way: GENERATED once in Python and emitted
# to both engines — a withColumn cascade over a 1-row frame in Spark,
# a chain of MATERIALIZED CTE levels in DuckDB (materialization stops
# the 4^k re-inlining blowup of recursive CTE references). The
# autocovariances feeding it are exact-decimal throughout: rho_k =
# (n^2 A_k - n S (B_k + C_k) + (n-k) S^2) / (same at k=0), every
# product typed to stay inside both engines' exact decimal kernels.

#: PACF depth (AR-order candidates 1..PACF_LAGS)
PACF_LAGS = 7


def _pacf_sql() -> str:
    # Each PRODUCT stays inside both engines' exact decimal kernels
    # (every declared product precision <= 38), then each TERM is cast
    # to DOUBLE once and the terms combine as doubles, left to right —
    # identical IEEE arithmetic in both engines, so no cross-engine
    # drift from differing decimal-overflow policies (Spark silently
    # rescales >38-digit sums; DuckDB hard-errors). Declared caps:
    # n <= 9999, n*S <= 1e14 via (20,6), B_k+C_k <= 1e11 via (17,6)
    # (the binding value-magnitude cap), A_k <= 1e16 via (28,12).
    def _rho_num(k: int, nk: str) -> str:
        return (
            f"CAST(CAST(n2 AS DECIMAL(7,0)) * a{k} AS DOUBLE)"
            f" - CAST(CAST(CAST(n AS DECIMAL(4,0)) * s AS DECIMAL(20,6))"
            f" * CAST(b{k} + c{k} AS DECIMAL(17,6)) AS DOUBLE)"
            f" + CAST(CAST(CAST({nk} AS DECIMAL(4,0)) * s AS DECIMAL(20,6))"
            f" * CAST(s AS DECIMAL(17,6)) AS DOUBLE)"
        )

    rho_cols = ", ".join(
        f"({_rho_num(k, f'n - {k}')}) / ({_rho_num(0, 'n')}) AS rho{k}"
        for k in range(1, PACF_LAGS + 1)
    )
    levels = ["l1 AS MATERIALIZED (SELECT rhos.*, rho1 AS phi_1_1,"
              " 1 - rho1 * rho1 AS v_1 FROM rhos)"]
    for k in range(2, PACF_LAGS + 1):
        num = " - ".join(
            [f"rho{k}"]
            + [f"phi_{k-1}_{j} * rho{k-j}" for j in range(1, k)]
        )
        cols = [f"l{k-1}.*", f"({num}) / v_{k-1} AS phi_{k}_{k}"]
        lvl = (
            f"l{k}a AS MATERIALIZED (SELECT {', '.join(cols)}"
            f" FROM l{k-1})"
        )
        upd = [f"l{k}a.*"] + [
            f"phi_{k-1}_{j} - phi_{k}_{k} * phi_{k-1}_{k-j}"
            f" AS phi_{k}_{j}"
            for j in range(1, k)
        ]
        lvl2 = (
            f"l{k} AS MATERIALIZED (SELECT {', '.join(upd)},"
            f" v_{k-1} * (1 - phi_{k}_{k} * phi_{k}_{k}) AS v_{k}"
            f" FROM l{k}a)"
        )
        levels.append(lvl)
        levels.append(lvl2)
    out = "\nUNION ALL ".join(
        f"SELECT {k} AS lag, round(rho{k}, 6) + 0.0 AS acf,"
        f" round(phi_{k}_{k}, 6) + 0.0 AS pacf FROM l{PACF_LAGS}"
        for k in range(1, PACF_LAGS + 1)
    )
    return f"""
    WITH daily AS (
        SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               SUM(CAST(value AS DECIMAL(18,6))) AS v
        FROM events GROUP BY 1
    ),
    bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
    spine AS (SELECT UNNEST(range(b.d0, b.d1 + 1)) AS d FROM bounds b),
    series AS (
        -- (19,6) forces DuckDB's hugeint kernel: (18,6)x(18,6) pair
        -- products would overflow its int64 multiply (the
        -- q_autocorrelation lesson); Spark stays (18,6), both exact
        SELECT s.d, CAST(COALESCE(dy.v, 0) AS DECIMAL(19,6)) AS v
        FROM spine s LEFT JOIN daily dy ON dy.d = s.d
    ),
    ks AS (SELECT UNNEST(range(0, {PACF_LAGS + 1})) AS k),
    sums AS (
        SELECT ks.k,
               -- (19,6)/(28,12): past 18 digits DuckDB switches to
               -- the hugeint kernel; (14,6)x(14,6) would overflow its
               -- int64 multiply (the q_autocorrelation lesson). 28,12
               -- holds A_k (= SUM v^2) to 1e16 — ~120x the measured
               -- 10x-bench magnitude (8.3e13).
               CAST(SUM(a.v * b.v) AS DECIMAL(28,12)) AS a_,
               CAST(SUM(a.v) AS DECIMAL(19,6)) AS b_,
               CAST(SUM(b.v) AS DECIMAL(19,6)) AS c_
        FROM ks JOIN series a ON TRUE
        JOIN series b ON b.d = a.d + ks.k
        GROUP BY ks.k
    ),
    piv AS (
        SELECT
            {", ".join(f"MAX(CASE WHEN k = {k} THEN a_ END) AS a{k}, "
                       f"MAX(CASE WHEN k = {k} THEN b_ END) AS b{k}, "
                       f"MAX(CASE WHEN k = {k} THEN c_ END) AS c{k}"
                       for k in range(0, PACF_LAGS + 1))},
            (SELECT CAST(COUNT(*) AS BIGINT) FROM series) AS n
        FROM sums
    ),
    piv2 AS (
        SELECT piv.*, CAST(n * n AS BIGINT) AS n2, b0 AS s FROM piv
    ),
    rhos AS MATERIALIZED (SELECT {rho_cols} FROM piv2),
    {",".join(levels)}
    {out}
    """


@query("q_pacf", oracle=_pacf_sql())
def q_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF and PACF of the dense daily revenue series, lags 1..
    {PACF_LAGS}: the AR-order diagnostic — the PACF of an AR(p)
    process cuts off after lag p, so this is the table an analyst
    reads before fitting q_grouped_forecast/q_holt_trend. The
    Durbin–Levinson recursion is GENERATED once in Python and emitted
    to both engines (withColumn cascade on a 1-row frame / chained
    MATERIALIZED CTEs); the autocovariances feeding it are exact
    decimal end to end — rho_k clears its mean-centering denominator
    as (n^2 A_k - n S (B_k+C_k) + (n-k) S^2) over the k=0 value, every
    PRODUCT typed to stay inside both engines' exact decimal kernels,
    each TERM cast to double once and combined left-to-right as
    doubles in the same order in both engines. Two documented caps:
    the 4-digit day-count cap (re-type for >27 years of daily
    history) and the VALUE-MAGNITUDE cap — B_k + C_k (about 2x the
    series total) must fit DECIMAL(17,6), i.e. total daily revenue
    below 5e10, ~160x the measured 10x-bench magnitude; breaching it
    NULLs on Spark and errors on DuckDB rather than silently
    diverging (tests/test_oracle_parity.py pins parity at the
    10x-bench magnitude). Degenerate inputs (constant series,
    v_k -> 0) are out of contract.

    Scale: one map-side-combined daily aggregate; lag pair sums run
    on |days| x {PACF_LAGS} rows; the recursion itself is constant
    work on a 1-row frame."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("v"))
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("d")
    )
    series = spine.join(daily, "d", "left").select(
        "d",
        F.coalesce(F.col("v"), F.lit(0)).cast("decimal(18,6)").alias("v"),
    )
    ks = spark.range(0, PACF_LAGS + 1).select(
        F.col("id").cast("int").alias("k")
    )
    a, b = series.alias("a"), series.alias("b")
    sums = (
        ks.join(a, F.lit(True))
        .join(b, F.col("b.d") == F.col("a.d") + F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(F.col("a.v") * F.col("b.v"))
            .cast("decimal(28,12)")
            .alias("a_"),
            F.sum(F.col("a.v")).cast("decimal(19,6)").alias("b_"),
            F.sum(F.col("b.v")).cast("decimal(19,6)").alias("c_"),
        )
    )
    n_frame = series.agg(F.count(F.lit(1)).cast("long").alias("n"))
    piv = sums.groupBy().agg(
        *[
            agg
            for k in range(0, PACF_LAGS + 1)
            for agg in (
                F.max(F.when(F.col("k") == k, F.col("a_"))).alias(f"a{k}"),
                F.max(F.when(F.col("k") == k, F.col("b_"))).alias(f"b{k}"),
                F.max(F.when(F.col("k") == k, F.col("c_"))).alias(f"c{k}"),
            )
        ]
    ).crossJoin(F.broadcast(n_frame))
    # round 17: the recursion is emitted as SQL-string layers (the
    # _SqlOp / simhash precedent — the Column-op form was ~7400 py4j
    # round trips, ~2.8 s of construction per invocation measured by
    # cProfile). Each string parses to the tree the Column ops built
    # (left-associative -, explicit parens around every numerator /
    # denominator chain), so the optimized plan — and the oracle
    # parity it is pinned to — is unchanged.
    cur = piv.selectExpr("*", "CAST(n * n AS BIGINT) AS n2", "b0 AS s")
    # mirror of the oracle's _rho_num: every product exact decimal
    # (declared precision <= 38 on both engines), each TERM cast to
    # double once, terms combined left-to-right as doubles — identical
    # IEEE arithmetic cross-engine. Caps documented at the oracle.
    _nd = "CAST(n AS DECIMAL(4,0))"
    _n2d = "CAST(n2 AS DECIMAL(7,0))"

    def _rho_num(k: int, nkd: str) -> str:
        t1 = f"CAST({_n2d} * a{k} AS DOUBLE)"
        t2 = (
            f"CAST(CAST({_nd} * s AS DECIMAL(20,6))"
            f" * CAST(b{k} + c{k} AS DECIMAL(17,6)) AS DOUBLE)"
        )
        t3 = (
            f"CAST(CAST({nkd} * s AS DECIMAL(20,6))"
            f" * CAST(s AS DECIMAL(17,6)) AS DOUBLE)"
        )
        return f"({t1} - {t2} + {t3})"

    den = _rho_num(0, _nd)
    cur = cur.selectExpr(
        "*",
        *[
            f"{_rho_num(k, f'CAST(n - {k} AS DECIMAL(4,0))')} / {den}"
            f" AS rho{k}"
            for k in range(1, PACF_LAGS + 1)
        ],
    )
    cur = cur.selectExpr(
        "*", "rho1 AS phi_1_1", "1 - rho1 * rho1 AS v_1"
    )
    for k in range(2, PACF_LAGS + 1):
        num = f"rho{k}" + "".join(
            f" - phi_{k-1}_{j} * rho{k-j}" for j in range(1, k)
        )
        # phi_k_k first (its own layer: the j-columns below read it)
        cur = cur.selectExpr("*", f"({num}) / v_{k-1} AS phi_{k}_{k}")
        cur = cur.selectExpr(
            "*",
            *[
                f"phi_{k-1}_{j} - phi_{k}_{k} * phi_{k-1}_{k-j}"
                f" AS phi_{k}_{j}"
                for j in range(1, k)
            ],
            f"v_{k-1} * (1 - phi_{k}_{k} * phi_{k}_{k}) AS v_{k}",
        )
    stack = "stack({}, {}) as (lag, acf_raw, pacf_raw)".format(
        PACF_LAGS,
        ", ".join(
            f"{k}, rho{k}, phi_{k}_{k}" for k in range(1, PACF_LAGS + 1)
        ),
    )
    return cur.select(F.expr(stack)).select(
        F.col("lag").cast("int").alias("lag"),
        (F.round("acf_raw", 6) + F.lit(0.0)).alias("acf"),
        (F.round("pacf_raw", 6) + F.lit(0.0)).alias("pacf"),
    )


_fmt(q_pacf, PACF_LAGS=PACF_LAGS)


# --------------------------------------------------------------------------
# rolling-origin forecast backtest — round 15
# --------------------------------------------------------------------------
# q_holt_trend fits once and forecasts forward; the question a
# forecast OWNER has to answer is "how wrong has this model been
# lately" — the rolling-origin backtest: for each of the last K days,
# refit on the prefix ending there and score the 1-step-ahead
# forecast against what actually happened. Same exact-integer Holt
# kernel (scale-6 ints, truncating integral divisions — engine-
# identical), re-run per origin over ARRAY PREFIXES of the one
# collected daily series, so K refits cost K bounded folds on a
# 1-row frame — the raw data is scanned once.

#: rolling origins scored (the last BT_ORIGINS days, 1-step ahead)
BT_ORIGINS = 10


@query(
    "q_forecast_backtest",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400
                 AS d,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) * 1000000 AS BIGINT)
                 AS y6
        FROM events GROUP BY 1
    ),
    bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
    spine AS (SELECT UNNEST(range(b.d0, b.d1 + 1)) AS d FROM bounds b),
    series AS (
        SELECT s.d, COALESCE(dy.y6, 0) AS y6
        FROM spine s LEFT JOIN daily dy ON dy.d = s.d
    ),
    arr AS (
        SELECT list_transform(list(y6 ORDER BY d), y -> [y, 0::BIGINT])
                 AS ys,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM series
    ),
    org AS (
        SELECT arr.ys, arr.n_days, o.o
        FROM arr, LATERAL (
            SELECT UNNEST(range(arr.n_days - {BT_ORIGINS},
                                arr.n_days)) AS o
        ) o
    ),
    fit AS (
        SELECT o, n_days,
               list_reduce(ys[1:CAST(o AS INT)], (acc, x) -> [
                   (x[1] + acc[1] + acc[2]) // 2,
                   (((x[1] + acc[1] + acc[2]) // 2) - acc[1] + 3 * acc[2])
                     // 4
               ]) AS s,
               ys[CAST(o AS INT) + 1][1] AS actual6
        FROM org
    ),
    scored AS (
        SELECT CAST(o AS INT) AS origin,
               actual6, s[1] + s[2] AS forecast6,
               ABS(s[1] + s[2] - actual6) AS err6
        FROM fit
    )
    SELECT origin,
           round(CAST(actual6 AS DOUBLE) / 1000000, 6) AS actual,
           round(CAST(forecast6 AS DOUBLE) / 1000000, 6) AS forecast,
           round(CAST(err6 AS DOUBLE) / 1000000, 6) AS abs_err,
           round(CAST(SUM(err6) OVER () AS DOUBLE)
                 / ({BT_ORIGINS} * 1000000.0), 6) AS mae
    FROM scored
    """,
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the Holt forecaster: for each of
    the last {BT_ORIGINS} days, refit the exact-integer Holt fold on
    the prefix ending the day before and score the 1-step-ahead
    forecast against the realized value — per-origin actual/forecast/
    absolute error plus the windowed MAE, the number that says
    whether to trust q_holt_trend's forward curve. Refits are folds
    over ARRAY PREFIXES of the one collected daily series (scale-6
    integers, truncating integral divisions — engine-identical), so
    the error sum is exact and the MAE deterministic.

    Scale: one map-side-combined daily aggregate; {BT_ORIGINS} folds
    on a 1-row array frame, each bounded by the calendar — the
    q_holt_trend contract, K times, with zero additional scans."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        (
            F.unix_timestamp(F.date_trunc("day", F.col("ts")))
            / F.lit(86400)
        )
        .cast("bigint")
        .alias("d")
    ).agg(
        (F.sum(F.col("value").cast("decimal(38,6)")) * 1000000)
        .cast("bigint")
        .alias("y6")
    )
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("d")
    )
    series = spine.join(daily, "d", "left").select(
        "d", F.coalesce("y6", F.lit(0)).cast("bigint").alias("y6")
    )
    arr = series.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, y6))),"
            " s -> array(s.y6, 0L))"
        ).alias("ys"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    org = arr.select(
        "ys",
        "n_days",
        F.explode(
            F.sequence(
                F.col("n_days") - BT_ORIGINS, F.col("n_days") - 1
            )
        ).alias("o"),
    )
    fit = org.select(
        "o",
        F.expr(
            """
            aggregate(
                slice(slice(ys, 1, CAST(o AS INT)), 2, CAST(o AS INT) - 1),
                slice(ys, 1, CAST(o AS INT))[0],
                (acc, x) -> array(
                    (x[0] + acc[0] + acc[1]) div 2,
                    (((x[0] + acc[0] + acc[1]) div 2) - acc[0]
                       + 3 * acc[1]) div 4
                )
            )
            """
        ).alias("s"),
        F.expr("element_at(ys, CAST(o AS INT) + 1)[0]").alias("actual6"),
    )
    scored = fit.select(
        F.col("o").cast("int").alias("origin"),
        "actual6",
        (F.col("s")[0] + F.col("s")[1]).alias("forecast6"),
        F.abs(F.col("s")[0] + F.col("s")[1] - F.col("actual6")).alias(
            "err6"
        ),
    )
    wall = Window.partitionBy()
    return scored.select(
        "origin",
        F.round(F.col("actual6").cast("double") / 1000000, 6).alias(
            "actual"
        ),
        F.round(F.col("forecast6").cast("double") / 1000000, 6).alias(
            "forecast"
        ),
        F.round(F.col("err6").cast("double") / 1000000, 6).alias(
            "abs_err"
        ),
        F.round(
            F.sum("err6").over(wall).cast("double")
            / (BT_ORIGINS * 1000000.0),
            6,
        ).alias("mae"),
    )


_fmt(q_forecast_backtest, BT_ORIGINS=BT_ORIGINS)


# --------------------------------------------------------------------------
# Hill tail-index estimator — round 15
# --------------------------------------------------------------------------
# q_zipf_fit measures the RANK-frequency exponent of tokens; the Hill
# estimator measures the tail exponent of a VALUE distribution — the
# number that decides whether means/variances are even finite and how
# hard p99s will misbehave (alpha <= 2: infinite variance; <= 1:
# infinite mean). alpha-hat = k / sum_{i<=k} ln(x_(i) / x_(k+1)) over
# the k largest order statistics, a pure top-k computation.

#: tail order statistics used by the Hill estimator
HILL_K = 200


@query(
    "q_hill_tail",
    oracle=f"""
    WITH top AS (
        SELECT value FROM events
        WHERE value IS NOT NULL AND value > 0
        ORDER BY value DESC, event_id
        LIMIT {HILL_K + 1}
    ),
    thr AS (SELECT MIN(value) AS xk FROM top),
    terms AS (
        SELECT CAST(round(ln(t.value / thr.xk), 9) AS DECIMAL(20,9))
                 AS lr
        FROM top t CROSS JOIN thr
        WHERE t.value > thr.xk
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
           round((SELECT xk FROM thr), 6) AS threshold,
           round(COUNT(*) / CAST(SUM(lr) AS DOUBLE), 6)
             AS hill_alpha
    FROM terms
    """,
)
def q_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index of events.value from the {HILL_K} largest
    observations: alpha-hat = k / sum ln(x_i / x_(k+1)) — the
    heavy-tail diagnostic that says whether the distribution's
    moments exist at all (alpha <= 2 means the variance the z-score
    monitors assume is INFINITE) and how p99s will scale. The log
    ratios are rounded then summed as exact decimals; ties at the
    threshold are excluded on both engines by the strict
    x > x_(k+1) predicate, so k_used is itself part of the proven
    contract.

    Scale: a global top-(k+1) — per-partition TakeOrdered + a k-row
    merge, no shuffle of the data — then arithmetic on k rows. The
    estimator is re-run at several k in practice; each is the same
    one-pass top-k."""
    top = (
        read_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & (F.col("value") > 0))
        .select("value", "event_id")
        .orderBy(F.desc("value"), "event_id")
        .limit(HILL_K + 1)
    )
    thr = top.agg(F.min("value").alias("xk"))
    terms = (
        top.crossJoin(F.broadcast(thr))
        .where(F.col("value") > F.col("xk"))
        .select(
            F.round(F.log(F.col("value") / F.col("xk")), 9)
            .cast("decimal(20,9)")
            .alias("lr"),
        )
    )
    # threshold comes from thr, NOT from max(xk) over terms: on an
    # all-ties corpus terms is EMPTY and max-over-empty would NULL the
    # threshold while the oracle's scalar subquery (SELECT xk FROM thr)
    # still returns it — the degenerate-input divergence ADVICE r15
    # flagged. The global agg always yields one row, so the 1-row x
    # 1-row cross reproduces the oracle exactly (hill_alpha is NULL on
    # both engines when k_used = 0).
    return (
        terms.agg(
            F.count(F.lit(1)).cast("long").alias("k_used"),
            F.sum("lr").alias("sum_lr"),
        )
        .crossJoin(F.broadcast(thr))
        .select(
            "k_used",
            F.round(F.col("xk"), 6).alias("threshold"),
            F.round(
                F.col("k_used") / F.col("sum_lr").cast("double"), 6
            ).alias("hill_alpha"),
        )
    )


_fmt(q_hill_tail, HILL_K=HILL_K)
