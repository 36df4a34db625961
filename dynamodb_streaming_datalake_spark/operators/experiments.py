"""Decision harnesses: experimentation and model-selection as queries.

The round-9 theme (q_ann_tuning, q_dedup_threshold_sweep) extended to
the classic product/ML decisions a lakehouse answers: did the A/B arm
move the metric (two-sample z), does the model generalize (k-fold CV),
where did the series shift (changepoint scan), and what happens next
(Markov transitions). Each one is a plain grouped/windowed aggregate —
no iteration, no collect — so every harness costs what a report query
costs and scales the same way.

Numerics follow the house discipline (q_event_moments /
q_linreg_train): every cross-row sum accumulates in DECIMAL(38,6)
(order-independent, partitioning-invariant), and doubles appear only in
final per-row expressions evaluated with the identical tree on both
engines, then ``round(_, 6)``.

Reference parity: the reference pipeline (an 84-line Glue snapshot job,
``/root/reference/resources/ddb_full_load.py:56-82``) ends at "write
the table"; these are the analyses a consumer of that table runs next.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dynamodb_streaming_datalake_spark.functions.texthash import (
    portable_hash60,
    sql_portable_hash60,
)
from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

#: experiment salt: prefixed into the unit hash so re-running the
#: "experiment" under a new name re-randomizes assignment — the
#: standard hash-based bucketing contract (unit never flips arms
#: mid-experiment, different experiments are independent).
AB_SALT = "exp-events-v1"
AB_ARMS = 2

#: k-fold cross-validation fold count (hash of the row id, so folds
#: are stable under any partitioning / ordering).
CV_FOLDS = 4

#: changepoint scan: top candidate split points reported.
CP_TOP = 5

#: virtual state for "first event of a user" in the transition matrix.
TRANS_START = "^start"


def _d38(c: F.Column) -> F.Column:
    return c.cast("decimal(38,6)")


# ---------------------------------------------------------------------------
# A/B test analysis: hash-bucketed arms, two-sample z per metric slice
# ---------------------------------------------------------------------------


@query(
    "q_ab_test",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               event_type,
               {sql_portable_hash60(f"'{AB_SALT}:' || CAST(user_id AS VARCHAR)")}
                 % {AB_ARMS} AS arm,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS metric
        FROM events
        GROUP BY user_id, event_type
    ),
    stats AS (
        SELECT event_type,
               COUNT(*) FILTER (WHERE arm = 0) AS n_a,
               COUNT(*) FILTER (WHERE arm = 1) AS n_b,
               CAST(SUM(CAST(metric AS DECIMAL(38,6)))
                      FILTER (WHERE arm = 0) AS DOUBLE) AS s_a,
               CAST(SUM(CAST(metric AS DECIMAL(38,6)))
                      FILTER (WHERE arm = 1) AS DOUBLE) AS s_b,
               CAST(SUM(CAST(metric * metric AS DECIMAL(38,6)))
                      FILTER (WHERE arm = 0) AS DOUBLE) AS ss_a,
               CAST(SUM(CAST(metric * metric AS DECIMAL(38,6)))
                      FILTER (WHERE arm = 1) AS DOUBLE) AS ss_b
        FROM per_user
        GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round(s_a / n_a, 6) AS mean_a,
           round(s_b / n_b, 6) AS mean_b,
           round(s_b / n_b - s_a / n_a, 6) AS lift,
           round((s_b / n_b - s_a / n_a)
                 / sqrt((ss_a - s_a * s_a / n_a) / (n_a - 1) / n_a
                        + (ss_b - s_b * s_b / n_b) / (n_b - 1) / n_b),
                 6) AS z_score
    FROM stats
    WHERE n_a >= 2 AND n_b >= 2
      AND (ss_a - s_a * s_a / n_a) / (n_a - 1) / n_a
          + (ss_b - s_b * s_b / n_b) / (n_b - 1) / n_b > 0
    ORDER BY event_type
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash into {AB_ARMS} stable arms
    (md5 of '{AB_SALT}:<user>' — the portable 60-bit hash, so
    assignment is deterministic, uniform, and identical on any engine),
    the per-user metric is total event value, and each event-type slice
    gets a two-sample Welch z: arm means, lift, and
    ``lift / sqrt(var_a/n_a + var_b/n_b)``. Variances come from the
    same exact-decimal power-sum discipline as q_linreg_train, so the
    z-score is reproducible to the last ulp, not merely close.

    Slices where either arm has <2 users or the pooled standard error
    is zero are excluded by contract (division semantics diverge across
    engines there).

    Scale: two grouped aggregates — (user, type) then (type) — each one
    shuffle with map-side partials; per-slice state is six numbers.
    This is the production experiment-analysis shape: no per-user data
    ever reaches the driver, adding metrics adds columns, not passes."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id", "event_type").agg(
        F.sum(_d38(F.col("value"))).cast("double").alias("metric")
    )
    arm = (
        portable_hash60(
            F.concat(F.lit(f"{AB_SALT}:"), F.col("user_id").cast("string"))
        )
        % AB_ARMS
    )
    per_user = per_user.withColumn("arm", arm)
    m = F.col("metric")
    is_a, is_b = F.col("arm") == 0, F.col("arm") == 1
    stats = per_user.groupBy("event_type").agg(
        F.count(F.when(is_a, 1)).alias("n_a"),
        F.count(F.when(is_b, 1)).alias("n_b"),
        F.sum(F.when(is_a, _d38(m))).cast("double").alias("s_a"),
        F.sum(F.when(is_b, _d38(m))).cast("double").alias("s_b"),
        F.sum(F.when(is_a, _d38(m * m))).cast("double").alias("ss_a"),
        F.sum(F.when(is_b, _d38(m * m))).cast("double").alias("ss_b"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    s_a, s_b = F.col("s_a"), F.col("s_b")
    ss_a, ss_b = F.col("ss_a"), F.col("ss_b")
    lift = s_b / n_b - s_a / n_a
    se2 = (ss_a - s_a * s_a / n_a) / (n_a - 1) / n_a + (
        ss_b - s_b * s_b / n_b
    ) / (n_b - 1) / n_b
    return (
        stats.where((n_a >= 2) & (n_b >= 2) & (se2 > 0))
        .select(
            "event_type",
            n_a.cast("bigint").alias("n_a"),
            n_b.cast("bigint").alias("n_b"),
            F.round(s_a / n_a, 6).alias("mean_a"),
            F.round(s_b / n_b, 6).alias("mean_b"),
            F.round(lift, 6).alias("lift"),
            F.round(lift / F.sqrt(se2), 6).alias("z_score"),
        )
        .orderBy("event_type")
    )


_fmt(q_ab_test, AB_ARMS=AB_ARMS, AB_SALT=AB_SALT)


# ---------------------------------------------------------------------------
# k-fold cross-validation of the closed-form OLS model
# ---------------------------------------------------------------------------


@query(
    "q_linreg_cv",
    oracle=f"""
    WITH rows_f AS (
        SELECT CAST({sql_portable_hash60("'cv:' || CAST(event_id AS VARCHAR)")}
                 % {CV_FOLDS} AS INTEGER) AS fold,
               CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS x,
               CAST(value AS DOUBLE) AS y
        FROM events
    ),
    fold_sums AS (
        SELECT fold,
               COUNT(*) AS n,
               SUM(CAST(x AS DECIMAL(38,6))) AS sx,
               SUM(CAST(y AS DECIMAL(38,6))) AS sy,
               SUM(CAST(x * x AS DECIMAL(38,6))) AS sxx,
               SUM(CAST(x * y AS DECIMAL(38,6))) AS sxy
        FROM rows_f GROUP BY fold
    ),
    train AS (
        SELECT fold,
               CAST(SUM(n) OVER () - n AS BIGINT) AS n_t,
               CAST(CAST(SUM(sx) OVER () - sx AS DECIMAL(38,6)) AS DOUBLE) AS sx_t,
               CAST(CAST(SUM(sy) OVER () - sy AS DECIMAL(38,6)) AS DOUBLE) AS sy_t,
               CAST(CAST(SUM(sxx) OVER () - sxx AS DECIMAL(38,6)) AS DOUBLE) AS sxx_t,
               CAST(CAST(SUM(sxy) OVER () - sxy AS DECIMAL(38,6)) AS DOUBLE) AS sxy_t,
               CAST(n AS BIGINT) AS n_test
        FROM fold_sums
    ),
    coefs AS (
        SELECT fold, n_t, n_test,
               (n_t * sxy_t - sx_t * sy_t) / (n_t * sxx_t - sx_t * sx_t)
                 AS slope,
               (sy_t - (n_t * sxy_t - sx_t * sy_t)
                         / (n_t * sxx_t - sx_t * sx_t) * sx_t) / n_t
                 AS intercept
        FROM train
        WHERE n_t * sxx_t - sx_t * sx_t != 0
    ),
    holdout AS (
        SELECT c.fold, c.n_t, c.n_test, c.slope, c.intercept,
               CAST(SUM(CAST((r.y - (c.intercept + c.slope * r.x))
                             * (r.y - (c.intercept + c.slope * r.x))
                             AS DECIMAL(38,6))) AS DOUBLE) AS ssr
        FROM rows_f r JOIN coefs c ON r.fold = c.fold
        GROUP BY c.fold, c.n_t, c.n_test, c.slope, c.intercept
    )
    SELECT fold,
           n_t AS n_train,
           n_test,
           round(slope, 6) AS slope,
           round(intercept, 6) AS intercept,
           round(sqrt(ssr / n_test), 6) AS rmse
    FROM holdout
    ORDER BY fold
    """,
)
def q_linreg_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{CV_FOLDS}-fold cross-validation of the q_linreg_train model
    (OLS of event value on hour-of-day) without {CV_FOLDS} passes over
    the data: fold membership is a stable hash of the row id, ONE
    grouped aggregate produces per-fold power sums, and each fold's
    TRAINING sums are ``total - own_fold`` — exact, because the sums
    subtract in DECIMAL before ever becoming doubles (the
    leave-one-out-at-the-aggregate-level trick; sufficient statistics
    are additive, so complement-training is subtraction, not a rescan).
    A second pass joins the {CV_FOLDS}-row coefficient table back to
    score each row's own holdout fold, accumulating squared residuals
    in decimal for an exact per-fold RMSE.

    Scale: pass 1 is a {CV_FOLDS}-group aggregate; pass 2 is a
    broadcast join of a {CV_FOLDS}-row frame against the scan plus one
    more grouped aggregate. Cost is ~2 report queries regardless of
    fold count — the window-over-folds runs on {CV_FOLDS} rows, not
    the data."""
    ev = read_table(spark, sf_dir, "events")
    rows_f = ev.select(
        (
            portable_hash60(
                F.concat(F.lit("cv:"), F.col("event_id").cast("string"))
            )
            % CV_FOLDS
        )
        .cast("int")
        .alias("fold"),
        F.hour("ts").cast("double").alias("x"),
        F.col("value").cast("double").alias("y"),
    )
    x, y = F.col("x"), F.col("y")
    fold_sums = rows_f.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_d38(x)).alias("sx"),
        F.sum(_d38(y)).alias("sy"),
        F.sum(_d38(x * x)).alias("sxx"),
        F.sum(_d38(x * y)).alias("sxy"),
    )
    # complement-training sums via a window over the K-row fold frame:
    # the decimal subtraction happens BEFORE the double cast, so each
    # fold's training statistics are exactly the 3-fold aggregate
    w = Window.partitionBy()
    dec = "decimal(38,6)"
    train = fold_sums.select(
        "fold",
        (F.sum("n").over(w) - F.col("n")).cast("bigint").alias("n_t"),
        (F.sum("sx").over(w) - F.col("sx")).cast(dec).cast("double").alias("sx_t"),
        (F.sum("sy").over(w) - F.col("sy")).cast(dec).cast("double").alias("sy_t"),
        (F.sum("sxx").over(w) - F.col("sxx")).cast(dec).cast("double").alias("sxx_t"),
        (F.sum("sxy").over(w) - F.col("sxy")).cast(dec).cast("double").alias("sxy_t"),
        F.col("n").cast("bigint").alias("n_test"),
    )
    n_t = F.col("n_t")
    sx_t, sy_t = F.col("sx_t"), F.col("sy_t")
    sxx_t, sxy_t = F.col("sxx_t"), F.col("sxy_t")
    slope = (n_t * sxy_t - sx_t * sy_t) / (n_t * sxx_t - sx_t * sx_t)
    coefs = train.where(n_t * sxx_t - sx_t * sx_t != 0).select(
        "fold",
        "n_t",
        "n_test",
        slope.alias("slope"),
        ((sy_t - slope * sx_t) / n_t).alias("intercept"),
    )
    resid = y - (F.col("intercept") + F.col("slope") * x)
    holdout = (
        rows_f.join(F.broadcast(coefs), "fold")
        .groupBy("fold", "n_t", "n_test", "slope", "intercept")
        .agg(F.sum(_d38(resid * resid)).cast("double").alias("ssr"))
    )
    return holdout.select(
        "fold",
        F.col("n_t").alias("n_train"),
        "n_test",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
        F.round(F.sqrt(F.col("ssr") / F.col("n_test")), 6).alias("rmse"),
    ).orderBy("fold")


_fmt(q_linreg_cv, CV_FOLDS=CV_FOLDS)


# ---------------------------------------------------------------------------
# changepoint scan: best mean-shift split of the daily revenue series
# ---------------------------------------------------------------------------


@query(
    "q_changepoint",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
        FROM orders GROUP BY day
    ),
    pre AS (
        SELECT day,
               CAST(SUM(rev) OVER (ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,6)) AS cum,
               ROW_NUMBER() OVER (ORDER BY day) AS t,
               COUNT(*) OVER () AS n_days,
               CAST(SUM(rev) OVER () AS DECIMAL(38,6)) AS total
        FROM daily
    ),
    scored AS (
        SELECT day,
               CAST(t AS BIGINT) AS n_before,
               CAST(n_days - t AS BIGINT) AS n_after,
               CAST(cum AS DOUBLE) / t AS mean_before,
               CAST(total - cum AS DOUBLE) / (n_days - t) AS mean_after
        FROM pre WHERE t < n_days
    )
    -- VARCHAR day: pandas renders DuckDB DATE as midnight timestamps,
    -- so the portable output type for a calendar day is its ISO string
    SELECT CAST(day AS VARCHAR) AS split_day, n_before, n_after,
           round(mean_before, 6) AS mean_before,
           round(mean_after, 6) AS mean_after,
           round(abs(mean_after - mean_before), 6) AS abs_shift
    FROM scored
    ORDER BY abs(mean_after - mean_before) DESC, day
    LIMIT {CP_TOP}
    """,
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint scan over the daily order-revenue series: every day
    is a candidate split, scored by the absolute difference between the
    mean revenue before and after it (the single-changepoint
    mean-shift statistic — the CUSUM-family scan evaluated exactly via
    prefix sums instead of recursively). Top-{CP_TOP} candidates
    returned.

    The cumulative and total sums stay DECIMAL through the subtraction
    ``total - cum`` (exact, order-independent); the only doubles are
    the two final divisions per candidate — one fixed expression tree,
    so the ranking is identical on any engine.

    Scale: the series is |days| rows after one grouped aggregate —
    tiny forever (36,500 rows per century). The window scan is a
    single-partition pass over that tiny frame, and the heavy input
    scan is the same one every daily report already does."""
    orders = read_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(_d38(F.col("o_totalprice"))).alias("rev"))
    )
    wday = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    pre = daily.select(
        "day",
        F.sum("rev").over(wday).cast("decimal(38,6)").alias("cum"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.count(F.lit(1)).over(wall).alias("n_days"),
        F.sum("rev").over(wall).cast("decimal(38,6)").alias("total"),
    )
    t, n_days = F.col("t"), F.col("n_days")
    mean_before = F.col("cum").cast("double") / t
    mean_after = (F.col("total") - F.col("cum")).cast("double") / (n_days - t)
    scored = pre.where(t < n_days).select(
        F.col("day").alias("split_day"),
        t.cast("bigint").alias("n_before"),
        (n_days - t).cast("bigint").alias("n_after"),
        mean_before.alias("mb"),
        mean_after.alias("ma"),
    )
    return (
        scored.orderBy(
            F.abs(F.col("ma") - F.col("mb")).desc(), "split_day"
        )
        .limit(CP_TOP)
        .select(
            F.col("split_day").cast("string").alias("split_day"),
            "n_before",
            "n_after",
            F.round("mb", 6).alias("mean_before"),
            F.round("ma", 6).alias("mean_after"),
            F.round(F.abs(F.col("ma") - F.col("mb")), 6).alias("abs_shift"),
        )
    )


_fmt(q_changepoint, CP_TOP=CP_TOP)


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences
# ---------------------------------------------------------------------------


@query(
    "q_event_transitions",
    oracle=f"""
    WITH ordered AS (
        SELECT COALESCE(LAG(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id), '{TRANS_START}')
                 AS prev_type,
               event_type AS next_type
        FROM events
    ),
    counts AS (
        SELECT prev_type, next_type, COUNT(*) AS n
        FROM ordered GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type,
           CAST(n AS BIGINT) AS n_transitions,
           round(CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE),
                 6) AS p_next
    FROM counts
    ORDER BY prev_type, next_type
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: each
    user's events order totally by (ts, event_id), LAG yields the
    previous event type ('{TRANS_START}' for a user's first event),
    and the (prev, next) counts normalize into transition
    probabilities — the model behind next-action prediction and
    funnel-drop analysis. The probability is one integer/integer
    division per output row, so the matrix is engine-exact.

    Scale: one shuffle to order each user's events (the q_sessionize
    partitioning), one grouped aggregate to |types|^2 + |types| rows,
    then a window over that tiny matrix. User history length never
    accumulates in memory — LAG streams each partition."""
    ev = read_table(spark, sf_dir, "events")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.coalesce(
            F.lag("event_type").over(wlag), F.lit(TRANS_START)
        ).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wprev = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        F.col("n").cast("bigint").alias("n_transitions"),
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wprev).cast("double"),
            6,
        ).alias("p_next"),
    ).orderBy("prev_type", "next_type")


_fmt(q_event_transitions, TRANS_START=TRANS_START)


# ---------------------------------------------------------------------------
# session gap-threshold tuning sweep
# ---------------------------------------------------------------------------

#: candidate inactivity gaps (seconds) that end a session
GAP_THRESHOLDS = (900, 1800, 3600)


@query(
    "q_session_gap_sweep",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT)
               - LAG(CAST(floor(epoch(ts)) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS gap_s
        FROM events
    ),
    agg AS MATERIALIZED (
        SELECT COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               {",".join(f"COUNT(*) FILTER (WHERE gap_s > {t}) AS b{t}" for t in GAP_THRESHOLDS)}
        FROM gaps
    )
    {" UNION ALL ".join(
        f'''SELECT {t} AS gap_threshold_s,
               CAST(n_users + b{t} AS BIGINT) AS n_sessions,
               CAST(n_events AS BIGINT) AS n_events,
               round(CAST(n_events AS DOUBLE) / (n_users + b{t}), 6)
                 AS events_per_session
            FROM agg'''
        for t in GAP_THRESHOLDS
    )}
    ORDER BY gap_threshold_s
    """,
)
def q_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-boundary tuning: how many sessions (and how many events
    per session) each candidate inactivity threshold
    {GAP_THRESHOLDS} s would produce — from ONE pass over the
    inter-event gaps. A session starts at a user's first event or
    after a gap strictly greater than the threshold, so
    ``n_sessions(T) = n_users + |gaps > T|`` — counting, not
    re-sessionizing per candidate (the q_dedup_threshold_sweep
    one-pass discipline applied to q_sessionize's parameter).

    Gap seconds come from floor(epoch) on both engines (DuckDB's
    ``epoch()::BIGINT`` rounds, Spark's ``unix_timestamp`` truncates —
    floor reconciles them), so every count is integer-exact.

    Scale: the same single (user)-partitioned LAG shuffle q_sessionize
    already runs, then one global aggregate carrying one counter per
    candidate threshold. Adding thresholds adds counters, not passes."""
    ev = read_table(spark, sf_dir, "events")
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")
    gaps = ev.select(
        "user_id", (sec - F.lag(sec).over(wlag)).alias("gap_s")
    )
    agg = gaps.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        *[
            F.count(F.when(F.col("gap_s") > t, 1)).alias(f"b{t}")
            for t in GAP_THRESHOLDS
        ],
    )
    stack = F.expr(
        "stack({n}, {args}) AS (gap_threshold_s, n_breaks)".format(
            n=len(GAP_THRESHOLDS),
            args=", ".join(
                f"{t}, b{t}" for t in GAP_THRESHOLDS
            ),
        )
    )
    rows = agg.select("n_events", "n_users", stack)
    sessions = F.col("n_users") + F.col("n_breaks")
    return rows.select(
        F.col("gap_threshold_s").cast("int").alias("gap_threshold_s"),
        sessions.cast("bigint").alias("n_sessions"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(F.col("n_events").cast("double") / sessions, 6).alias(
            "events_per_session"
        ),
    ).orderBy("gap_threshold_s")


_fmt(q_session_gap_sweep, GAP_THRESHOLDS=GAP_THRESHOLDS)


# ---------------------------------------------------------------------------
# experiment power analysis: minimum detectable effect vs sample size
# ---------------------------------------------------------------------------

#: two-sided alpha=0.05 and power=0.80 normal quantiles, fixed to 6 dp
#: so both engines use the identical literals (no inverse-CDF calls)
Z_ALPHA = 1.959964
Z_BETA = 0.841621
#: candidate per-arm sample sizes
POWER_NS = (1_000, 10_000, 100_000)


@query(
    "q_power_mde",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, event_type,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS metric
        FROM events GROUP BY user_id, event_type
    ),
    stats AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(metric AS DECIMAL(38,6))) AS DOUBLE) AS s,
               CAST(SUM(CAST(metric * metric AS DECIMAL(38,6))) AS DOUBLE)
                 AS ss
        FROM per_user GROUP BY event_type
    )
    SELECT s.event_type,
           ns.n_per_arm,
           round(s.s / s.n, 6) AS metric_mean,
           round(({Z_ALPHA} + {Z_BETA})
                 * sqrt(2.0 * ((s.ss - s.s * s.s / s.n) / (s.n - 1))
                        / ns.n_per_arm), 6) AS mde_abs,
           round(({Z_ALPHA} + {Z_BETA})
                 * sqrt(2.0 * ((s.ss - s.s * s.s / s.n) / (s.n - 1))
                        / ns.n_per_arm) / (s.s / s.n), 6) AS mde_rel
    FROM stats s
    CROSS JOIN (VALUES {", ".join(f"({n})" for n in POWER_NS)})
         ns(n_per_arm)
    WHERE s.n >= 2 AND s.s != 0
    ORDER BY s.event_type, ns.n_per_arm
    """,
)
def q_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sizing for q_ab_test: the minimum detectable effect
    (two-sided alpha 0.05, power 0.80) at each candidate per-arm
    sample size {POWER_NS}, per event-type metric slice —
    ``MDE = (z_a + z_b) * sqrt(2 * var / n)`` with the metric variance
    measured from the data via the exact-decimal power sums. The z
    quantiles are fixed 6-dp literals, so no inverse-CDF (or any
    transcendental beyond one sqrt) crosses the engines.

    This is the "how long must the experiment run" answer computed
    from the lake itself; the companion q_ab_test reads the result out
    once the experiment finishes.

    Scale: the q_ab_test aggregate minus the arm split — two grouped
    aggregates, then a |types| x {POWER_NS}-row expansion via
    per-row explode (no cross join on the Spark side)."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id", "event_type").agg(
        F.sum(_d38(F.col("value"))).cast("double").alias("metric")
    )
    m = F.col("metric")
    stats = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_d38(m)).cast("double").alias("s"),
        F.sum(_d38(m * m)).cast("double").alias("ss"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    var = (ss - s * s / n) / (n - 1)
    expanded = stats.where((n >= 2) & (s != 0)).select(
        "event_type",
        "n",
        "s",
        var.alias("var"),
        F.explode(F.array(*[F.lit(x) for x in POWER_NS])).alias("n_per_arm"),
    )
    mde = F.lit(Z_ALPHA + Z_BETA) * F.sqrt(
        F.lit(2.0) * F.col("var") / F.col("n_per_arm")
    )
    return expanded.select(
        "event_type",
        "n_per_arm",
        F.round(s / n, 6).alias("metric_mean"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / (s / n), 6).alias("mde_rel"),
    ).orderBy("event_type", "n_per_arm")


_fmt(q_power_mde, POWER_NS=POWER_NS)


# ---------------------------------------------------------------------------
# watermark delay tuning: disorder under a deterministic delivery model
# ---------------------------------------------------------------------------

#: candidate watermark delays (seconds) for the streaming windows
WM_DELAYS = (60, 300, 900)
#: delivery-delay model: each event arrives hash(event_id) % WM_MAX_DELAY
#: seconds after its event time — deterministic, uniform, portable. The
#: events table carries no ingest timestamp (it is perfectly time-
#: ordered), so disorder must be modeled to measure anything; the model
#: is explicit in the result's contract.
WM_MAX_DELAY = 600
#: per-shard ordered delivery (Kinesis semantics): arrival order is a
#: total order WITHIN a shard, interleaved across shards
WM_SHARDS = 8


@query(
    "q_watermark_sweep",
    oracle=f"""
    WITH arr AS (
        SELECT user_id % {WM_SHARDS} AS shard,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               CAST(floor(epoch(ts)) AS BIGINT)
               + {sql_portable_hash60("'wm:' || CAST(event_id AS VARCHAR)")}
                 % {WM_MAX_DELAY} AS arrival_s,
               event_id
        FROM events
    ),
    hw AS (
        SELECT sec,
               MAX(sec) OVER (
                   PARTITION BY shard ORDER BY arrival_s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS hwm
        FROM arr
    ),
    late AS (
        SELECT CASE WHEN hwm IS NULL OR hwm <= sec THEN 0
                    ELSE hwm - sec END AS lateness_s
        FROM hw
    ),
    agg AS MATERIALIZED (
        SELECT COUNT(*) AS n_events,
               CAST(MAX(lateness_s) AS BIGINT) AS max_lateness_s,
               {",".join(f"COUNT(*) FILTER (WHERE lateness_s > {d}) AS d{d}" for d in WM_DELAYS)}
        FROM late
    )
    {" UNION ALL ".join(
        f'''SELECT {d} AS watermark_delay_s,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(d{d} AS BIGINT) AS n_dropped,
               round(CAST(d{d} AS DOUBLE) / n_events, 6) AS drop_rate,
               max_lateness_s
            FROM agg'''
        for d in WM_DELAYS
    )}
    ORDER BY watermark_delay_s
    """,
)
def q_watermark_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark tuning as a measured curve: events reach the engine
    through {WM_SHARDS} shards (shard = user % {WM_SHARDS}, ordered
    within a shard, interleaved across shards — Kinesis delivery
    semantics, matching the reference's shard model in
    ``dynamodb-streaming-datalake-stack.ts:199``) after a deterministic
    transit delay of ``hash(event_id) % {WM_MAX_DELAY}`` seconds; an
    event's LATENESS is how far its event time sits behind its shard's
    running event-time high-water mark at arrival — the quantity a
    ``withWatermark`` delay (B18) must absorb. Each candidate delay
    {WM_DELAYS} s reports the events a watermark that tight would drop
    from windowed aggregation, from ONE pass over the lateness column.

    The events table is perfectly time-ordered (measured: zero native
    disorder), so the delivery model is the explicit part of this
    query's contract: deterministic per-event hash delay, not
    randomness, which is what keeps the whole curve under the hash
    gate.

    Scale: one shard-partitioned window shuffle (running MAX, streamed
    per partition) + one global aggregate with a counter per candidate
    delay; no global ordering anywhere. The engine's actual watermark
    is the min over shards of these high-water marks, so per-shard
    lateness upper-bounds what the delay must absorb."""
    ev = read_table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    delay = (
        portable_hash60(
            F.concat(F.lit("wm:"), F.col("event_id").cast("string"))
        )
        % WM_MAX_DELAY
    )
    arr = ev.select(
        (F.col("user_id") % WM_SHARDS).alias("shard"),
        sec.alias("sec"),
        (sec + delay).alias("arrival_s"),
        "event_id",
    )
    whw = (
        Window.partitionBy("shard")
        .orderBy("arrival_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = arr.select(F.max("sec").over(whw).alias("hwm"), "sec").select(
        F.when(
            F.col("hwm").isNull() | (F.col("hwm") <= F.col("sec")), F.lit(0)
        )
        .otherwise(F.col("hwm") - F.col("sec"))
        .alias("lateness_s")
    )
    agg = late.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("lateness_s").cast("bigint").alias("max_lateness_s"),
        *[
            F.count(F.when(F.col("lateness_s") > d, 1)).alias(f"d{d}")
            for d in WM_DELAYS
        ],
    )
    stack = F.expr(
        "stack({n}, {args}) AS (watermark_delay_s, n_dropped)".format(
            n=len(WM_DELAYS),
            args=", ".join(f"{d}, d{d}" for d in WM_DELAYS),
        )
    )
    rows = agg.select("n_events", "max_lateness_s", stack)
    return rows.select(
        F.col("watermark_delay_s").cast("int").alias("watermark_delay_s"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("n_dropped").cast("bigint").alias("n_dropped"),
        F.round(
            F.col("n_dropped").cast("double") / F.col("n_events"), 6
        ).alias("drop_rate"),
        "max_lateness_s",
    ).orderBy("watermark_delay_s")


_fmt(
    q_watermark_sweep,
    WM_DELAYS=WM_DELAYS,
    WM_MAX_DELAY=WM_MAX_DELAY,
    WM_SHARDS=WM_SHARDS,
)


# ---------------------------------------------------------------------------
# Kaplan-Meier survival: customer churn retention curve
# ---------------------------------------------------------------------------

#: censoring horizon: a customer whose last order is within this many
#: days of the study end is censored (still alive), not churned.
KM_HORIZON_DAYS = 90

#: duration grain: observed lifetime in 30-day "months".
KM_MONTH_DAYS = 30


@query(
    "q_survival_km",
    oracle=f"""
    WITH RECURSIVE bounds AS (
        SELECT MAX(o_orderdate) AS study_end FROM orders
    ),
    life AS (
        SELECT o_custkey,
               CAST(FLOOR(datediff('day', MIN(o_orderdate),
                                   MAX(o_orderdate))
                          / {KM_MONTH_DAYS}) AS INT) AS t,
               CAST(MAX(o_orderdate)
                    < (SELECT study_end FROM bounds)
                      - INTERVAL {KM_HORIZON_DAYS} DAY AS INT) AS churned
        FROM orders GROUP BY o_custkey
    ),
    per_t AS MATERIALIZED (
        SELECT t,
               CAST(SUM(churned) AS BIGINT) AS d,
               CAST(SUM(1 - churned) AS BIGINT) AS c,
               ROW_NUMBER() OVER (ORDER BY t) AS rn
        FROM life GROUP BY t
    ),
    at_risk AS MATERIALIZED (
        SELECT rn, t, d, c,
               SUM(d + c) OVER (ORDER BY t DESC) AS n
        FROM per_t
    ),
    rec AS (
        SELECT rn, t, d, c, n,
               round(1.0 * (1.0 - d / CAST(n AS DOUBLE)), 9) AS s
        FROM at_risk WHERE rn = 1
        UNION ALL
        SELECT k.rn, k.t, k.d, k.c, k.n,
               round(r.s * (1.0 - k.d / CAST(k.n AS DOUBLE)), 9)
        FROM rec r JOIN at_risk k ON k.rn = r.rn + 1
    )
    SELECT CAST(t AS INT) AS t_months,
           CAST(n AS BIGINT) AS n_at_risk,
           d AS n_events, c AS n_censored,
           round(s, 6) AS survival
    FROM rec ORDER BY t_months
    """,
)
def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier customer retention: each customer's observed
    lifetime runs from first to last order ({KM_MONTH_DAYS}-day
    months); a customer whose last order predates the study end by
    more than {KM_HORIZON_DAYS} days churned at that duration, anyone
    still ordering near the end is right-censored. Per duration t the
    curve multiplies the classic (1 - d_t/n_t) risk-set factor, every
    step rounded to 9 dp so the sequential product is bit-identical to
    the oracle's recursive CTE (cumulative float products are
    association-order-dependent; the per-step round pins ONE order).

    Scale shape: lifetimes are one groupBy over orders; the curve
    domain is bounded by distinct month durations (<= decades * 12
    rows at ANY corpus size), so the sorted fold runs over a
    constant-size array — the heavy lifting stays distributed, the
    recursion never touches more than the per-t table."""
    o = read_table(spark, sf_dir, "orders")
    bounds = o.agg(F.max("o_orderdate").alias("study_end"))
    life = (
        o.groupBy("o_custkey")
        .agg(
            F.min("o_orderdate").alias("first_o"),
            F.max("o_orderdate").alias("last_o"),
        )
        .crossJoin(F.broadcast(bounds))
        .select(
            F.floor(
                F.datediff("last_o", "first_o") / KM_MONTH_DAYS
            )
            .cast("int")
            .alias("t"),
            (
                F.col("last_o")
                < F.col("study_end")
                - F.expr(f"INTERVAL {KM_HORIZON_DAYS} DAY")
            )
            .cast("int")
            .alias("churned"),
        )
    )
    per_t = life.groupBy("t").agg(
        F.sum("churned").alias("d"),
        F.sum(F.lit(1) - F.col("churned")).alias("c"),
    )
    w_risk = Window.orderBy(F.col("t").desc()).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = per_t.withColumn("n", F.sum(F.col("d") + F.col("c")).over(w_risk))
    # fold the bounded per-t table in t order, rounding each step:
    # acc = (s, rows); emit (t, s) per step, then join stats back on t
    folded = at_risk.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("t", "d", "n"))
        ).alias("steps")
    )
    step = F.aggregate(
        F.col("steps"),
        F.struct(
            F.lit(1.0).alias("s"),
            F.array().cast("array<struct<t:int,s:double>>").alias("out"),
        ),
        lambda acc, x: F.struct(
            F.round(
                acc["s"] * (F.lit(1.0) - x["d"] / x["n"].cast("double")), 9
            ).alias("s"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["t"].alias("t"),
                        F.round(
                            acc["s"]
                            * (F.lit(1.0) - x["d"] / x["n"].cast("double")),
                            9,
                        ).alias("s"),
                    )
                ),
            ).alias("out"),
        ),
        lambda acc: acc["out"],
    )
    curve = (
        folded.select(F.explode(step).alias("p"))
        .select(F.col("p.t").alias("t"), F.col("p.s").alias("s"))
    )
    return (
        curve.join(at_risk, "t")
        .select(
            F.col("t").cast("int").alias("t_months"),
            F.col("n").cast("long").alias("n_at_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.col("c").cast("long").alias("n_censored"),
            F.round("s", 6).alias("survival"),
        )
        .orderBy("t_months")
    )


_fmt(
    q_survival_km,
    KM_HORIZON_DAYS=KM_HORIZON_DAYS,
    KM_MONTH_DAYS=KM_MONTH_DAYS,
)


# ---------------------------------------------------------------------------
# CUPED variance reduction: pre-period covariate adjustment
# ---------------------------------------------------------------------------
# The production follow-up to q_ab_test: the experiment metric Y is
# adjusted by the unit's PRE-period metric X (Y' = Y - theta*(X -
# mean(X)), theta = cov(X,Y)/var(X)), which shrinks metric variance by
# the squared X-Y correlation without moving the expected lift —
# smaller confidence intervals from the data already in the lake.
# Everything reduces to per-arm exact-decimal power sums (n, Sx, Sy,
# Sxx, Syy, Sxy): var(Y') per arm is var(Y) - 2*theta*cov + theta^2 *
# var(X), so no second pass over units and no float accumulation
# anywhere — doubles appear only in the final per-row expression.

#: period split: the observed time range's integer-epoch midpoint;
#: events strictly before it are the pre-period.


@query(
    "q_cuped",
    oracle=f"""
    WITH bounds AS (
        SELECT (MIN(CAST(floor(epoch(ts)) AS BIGINT))
                + MAX(CAST(floor(epoch(ts)) AS BIGINT))) // 2 AS mid
        FROM events
    ),
    per_user AS (
        -- x/y stay DECIMAL end-to-end: casting an inexact double
        -- product to decimal is NOT portable (Spark converts via the
        -- JVM's shortest-string repr, DuckDB via the exact binary
        -- expansion — they disagree in the last decimal at 10x-bench
        -- magnitude, r17 contract-stress tier). DECIMAL(19,6) forces
        -- DuckDB's hugeint kernel so x*x is exact (the
        -- q_autocorrelation precedent).
        SELECT user_id,
               {sql_portable_hash60(f"'{AB_SALT}:' || CAST(user_id AS VARCHAR)")}
                 % {AB_ARMS} AS arm,
               CAST(SUM(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) < b.mid
                             THEN CAST(value AS DECIMAL(38,6))
                             ELSE CAST(0 AS DECIMAL(38,6)) END)
                    AS DECIMAL(19,6)) AS x,
               CAST(SUM(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) >= b.mid
                             THEN CAST(value AS DECIMAL(38,6))
                             ELSE CAST(0 AS DECIMAL(38,6)) END)
                    AS DECIMAL(19,6)) AS y
        FROM events, bounds b
        GROUP BY user_id, arm
    ),
    arm_sums AS (
        SELECT arm,
               COUNT(*) AS n,
               SUM(x) AS sx_d,
               SUM(y) AS sy_d,
               SUM(x * x) AS sxx_d,
               SUM(y * y) AS syy_d,
               SUM(x * y) AS sxy_d
        FROM per_user
        GROUP BY arm
    ),
    pooled AS (
        -- pooled sums fold DECIMALS, not doubles: a float fold over
        -- the arms is association-ordered and its low bits diverge
        -- cross-engine at 10x-bench magnitude (r17 contract-stress
        -- tier caught var_cuped drifting in the 16th digit).
        -- decimal->double goes THROUGH VARCHAR: DuckDB's direct cast
        -- double-rounds (int128->double, then /10^scale — off by an
        -- output ulp for unscaled values past 2^53), while strtod and
        -- Spark's BigDecimal path round once.
        SELECT arm, n,
               CAST(CAST(sx_d  AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(sy_d  AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(sxx_d AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(syy_d AS VARCHAR) AS DOUBLE) AS syy,
               CAST(CAST(sxy_d AS VARCHAR) AS DOUBLE) AS sxy,
               SUM(n)     OVER () AS np,
               CAST(CAST(SUM(sx_d)  OVER () AS VARCHAR) AS DOUBLE) AS sxp,
               CAST(CAST(SUM(sy_d)  OVER () AS VARCHAR) AS DOUBLE) AS syp,
               CAST(CAST(SUM(sxx_d) OVER () AS VARCHAR) AS DOUBLE) AS sxxp,
               CAST(CAST(SUM(sxy_d) OVER () AS VARCHAR) AS DOUBLE) AS sxyp
        FROM arm_sums
    ),
    calc AS (
        SELECT arm, n, sx, sy, sxx, syy, sxy, np, sxp,
               (sxyp - sxp * syp / np) / (sxxp - sxp * sxp / np) AS theta
        FROM pooled
    )
    SELECT CAST(arm AS INT) AS arm,
           CAST(n AS BIGINT) AS n_users,
           round(theta, 6) AS theta,
           round(mean_raw, 6) AS mean_raw,
           round(mean_cuped, 6) AS mean_cuped,
           round(v_raw, 6) AS var_raw,
           round(v_cuped, 6) AS var_cuped,
           round(100 * (1 - v_cuped / v_raw), 6) AS var_reduction_pct
    FROM (
        SELECT arm, n, theta,
               sy / n AS mean_raw,
               sy / n - theta * (sx / n - sxp / np) AS mean_cuped,
               (syy - sy * sy / n) / (n - 1) AS v_raw,
               (syy - sy * sy / n) / (n - 1)
                 - 2 * theta * (sxy - sx * sy / n) / (n - 1)
                 + theta * theta * (sxx - sx * sx / n) / (n - 1) AS v_cuped
        FROM calc
    )
    ORDER BY arm
    """,
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout: the observed time range
    splits at its integer-epoch midpoint into pre-period (covariate X
    = per-user value sum before the midpoint) and experiment period
    (metric Y after it); arms are the same stable '{AB_SALT}' hash
    buckets as q_ab_test. theta = cov(X,Y)/var(X) is estimated pooled
    across arms (the standard, lift-unbiased choice), and each arm
    reports raw vs CUPED mean and variance plus the realized variance
    reduction — the percentage by which the pre-period covariate
    shrinks the experiment's error bars for free.

    Per-arm adjusted variance expands algebraically to power sums
    (var(Y') = var(Y) - 2*theta*cov(X,Y) + theta^2*var(X)), so one
    grouped aggregate over users computes everything; every cross-row
    sum is exact DECIMAL(38,6) and doubles appear only in the final
    identical-tree expressions, hence the hash gate.

    Scale: one groupBy(user) + one groupBy(arm) over |users| rows; the
    pooled fold is a window over {AB_ARMS} rows. Nothing here grows
    with event volume past the first aggregate, and the period split
    is a scan-local predicate against a broadcast 1-row bound."""
    ev = read_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    bounds = ev.agg(
        ((F.min(epoch) + F.max(epoch)) / 2).cast("bigint").alias("mid")
    )
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            "user_id",
            (
                portable_hash60(
                    F.concat(F.lit(f"{AB_SALT}:"), F.col("user_id").cast("string"))
                )
                % AB_ARMS
            ).alias("arm"),
        )
        .agg(
            # x/y stay DECIMAL end-to-end — a double round-trip here is
            # not portable (Spark's double->decimal cast goes through
            # the JVM shortest-string repr, DuckDB's through the exact
            # binary expansion; r17 contract-stress tier). (18,6)x(18,6)
            # products are exact decimal(37,12) in Spark; the oracle
            # uses DECIMAL(19,6) to force DuckDB's hugeint kernel.
            F.sum(
                F.when(epoch < F.col("mid"), _d38(F.col("value"))).otherwise(
                    _d38(F.lit(0))
                )
            )
            .cast("decimal(18,6)")
            .alias("x"),
            F.sum(
                F.when(epoch >= F.col("mid"), _d38(F.col("value"))).otherwise(
                    _d38(F.lit(0))
                )
            )
            .cast("decimal(18,6)")
            .alias("y"),
        )
    )
    arm_sums = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx_d"),
        F.sum("y").alias("sy_d"),
        F.sum(F.col("x") * F.col("x")).alias("sxx_d"),
        F.sum(F.col("y") * F.col("y")).alias("syy_d"),
        F.sum(F.col("x") * F.col("y")).alias("sxy_d"),
    )
    w = Window.partitionBy()
    # pooled sums fold DECIMALS, not doubles (r17 contract-stress
    # tier: a float fold over arms diverges cross-engine in the 16th
    # digit at 10x-bench magnitude); doubles appear only after the
    # exact pooled fold
    pooled = arm_sums.select(
        "arm",
        "n",
        F.col("sx_d").cast("double").alias("sx"),
        F.col("sy_d").cast("double").alias("sy"),
        F.col("sxx_d").cast("double").alias("sxx"),
        F.col("syy_d").cast("double").alias("syy"),
        F.col("sxy_d").cast("double").alias("sxy"),
        F.sum("n").over(w).alias("np"),
        F.sum("sx_d").over(w).cast("double").alias("sxp"),
        F.sum("sy_d").over(w).cast("double").alias("syp"),
        F.sum("sxx_d").over(w).cast("double").alias("sxxp"),
        F.sum("sxy_d").over(w).cast("double").alias("sxyp"),
    )
    theta = (
        F.col("sxyp") - F.col("sxp") * F.col("syp") / F.col("np")
    ) / (F.col("sxxp") - F.col("sxp") * F.col("sxp") / F.col("np"))
    calc = pooled.withColumn("theta", theta)
    # every tree below mirrors the oracle's association order exactly —
    # a*(b)/(c) parses ((a*b)/c), and float *// are association-sensitive
    var_raw = (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")) / (
        F.col("n") - 1
    )
    var_cuped = (
        var_raw
        - F.lit(2)
        * F.col("theta")
        * (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
        / (F.col("n") - 1)
        + F.col("theta")
        * F.col("theta")
        * (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        / (F.col("n") - 1)
    )
    return (
        calc.select(
            F.col("arm").cast("int").alias("arm"),
            F.col("n").cast("long").alias("n_users"),
            F.round("theta", 6).alias("theta"),
            F.round(F.col("sy") / F.col("n"), 6).alias("mean_raw"),
            F.round(
                F.col("sy") / F.col("n")
                - F.col("theta")
                * (F.col("sx") / F.col("n") - F.col("sxp") / F.col("np")),
                6,
            ).alias("mean_cuped"),
            F.round(var_raw, 6).alias("var_raw"),
            F.round(var_cuped, 6).alias("var_cuped"),
            F.round(F.lit(100) * (F.lit(1) - var_cuped / var_raw), 6).alias(
                "var_reduction_pct"
            ),
        )
        .orderBy("arm")
    )


_fmt(q_cuped, AB_SALT=AB_SALT, AB_ARMS=AB_ARMS)


# ---------------------------------------------------------------------------
# lift / gain deciles (round 11)
# ---------------------------------------------------------------------------
# The model-eval table a targeting decision is read from: users rank
# by a score (here: total click value — deliberately simple, the
# harness is the point), split into deciles, and each decile reports
# its purchase rate, lift over the base rate, and cumulative gain
# (share of all purchasers captured by the top k deciles). Every cell
# is an integer-count ratio with one final division — engine-exact —
# and the decile split is NTILE with a deterministic user_id
# tie-break.

LIFT_BUCKETS = 10


@query(
    "q_lift_deciles",
    oracle=f"""
    WITH users AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'click'
                        THEN CAST(value AS DECIMAL(18,6))
                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS score,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS is_pos
        FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT *, NTILE({LIFT_BUCKETS}) OVER (
            ORDER BY score DESC, user_id) AS decile
        FROM users
    ),
    per AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(is_pos) AS BIGINT) AS n_pos
        FROM ranked GROUP BY decile
    ),
    tot AS (
        SELECT SUM(n_users) AS nu, SUM(n_pos) AS np FROM per
    )
    SELECT CAST(p.decile AS INT) AS decile,
           p.n_users, p.n_pos,
           round(CAST(p.n_pos AS DOUBLE) / p.n_users, 6) AS rate,
           round((CAST(p.n_pos AS DOUBLE) / p.n_users)
                 / (CAST(t.np AS DOUBLE) / t.nu), 6) AS lift,
           round(CAST(SUM(p.n_pos) OVER (ORDER BY p.decile) AS DOUBLE)
                 / t.np, 6) AS cum_gain
    FROM per p, tot t
    ORDER BY decile
    """,
)
def q_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift/gain table for a purchase-propensity ranking: users decile
    by total click value (deterministic NTILE, user_id tie-break);
    each decile reports purchase rate, lift over the base rate, and
    cumulative gain. A useful score shows lift > 1 in the top deciles
    and a gain curve above the diagonal — the decision table behind
    'how deep do we target'.

    Scale: one per-user aggregate; the NTILE runs over |users| score
    rows (the one global sort, on an already-reduced frame); the
    report is {LIFT_BUCKETS} rows."""
    from pyspark.sql.window import Window

    ev = read_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "click",
                F.col("value").cast("decimal(18,6)"),
            ).otherwise(F.lit(0).cast("decimal(18,6)"))
        ).alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("is_pos"),
    )
    ranked = users.withColumn(
        "decile",
        F.ntile(LIFT_BUCKETS).over(
            Window.orderBy(F.col("score").desc(), "user_id")
        ),
    )
    per = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("is_pos").cast("bigint").alias("n_pos"),
    )
    tot = per.agg(
        F.sum("n_users").alias("nu"), F.sum("n_pos").alias("np")
    )
    w = Window.orderBy("decile")
    rate = F.col("n_pos").cast("double") / F.col("n_users")
    base = F.col("np").cast("double") / F.col("nu")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_users",
            "n_pos",
            F.round(rate, 6).alias("rate"),
            F.round(rate / base, 6).alias("lift"),
            F.round(
                F.sum("n_pos").over(w).cast("double") / F.col("np"), 6
            ).alias("cum_gain"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Markov next-event prediction eval (round 11)
# ---------------------------------------------------------------------------
# q_event_transitions FITS the behavior model; this EVALUATES it with
# the time discipline a real model eval needs: transitions whose next
# event lands before the epoch midpoint train the argmax predictor,
# transitions landing after it are held out, and the report is
# per-state top-1 hit rate. A state's prediction is the train-period
# argmax with a lexicographic tie-break — deterministic, so the whole
# eval is integer counting with one division per row.


@query(
    "q_markov_eval",
    oracle=f"""
    WITH bounds AS (
        SELECT (MIN(CAST(floor(epoch(ts)) AS BIGINT))
                + MAX(CAST(floor(epoch(ts)) AS BIGINT))) // 2 AS mid
        FROM events
    ),
    pairs AS (
        SELECT COALESCE(LAG(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id), '{TRANS_START}')
                 AS prev_type,
               event_type AS next_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS next_s
        FROM events
    ),
    train AS (
        SELECT prev_type, next_type, COUNT(*) AS n
        FROM pairs, bounds WHERE next_s < mid
        GROUP BY prev_type, next_type
    ),
    pred AS (
        SELECT prev_type, next_type AS predicted_next FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY prev_type
                        ORDER BY n DESC, next_type) AS r
            FROM train
        ) WHERE r = 1
    ),
    eval_pairs AS (
        SELECT prev_type, next_type
        FROM pairs, bounds WHERE next_s >= mid
    )
    SELECT e.prev_type, p.predicted_next,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(COUNT(*) FILTER (WHERE e.next_type = p.predicted_next)
                AS BIGINT) AS n_hits,
           round(CAST(COUNT(*) FILTER (
                     WHERE e.next_type = p.predicted_next) AS DOUBLE)
                 / COUNT(*), 6) AS hit_rate
    FROM eval_pairs e JOIN pred p USING (prev_type)
    GROUP BY e.prev_type, p.predicted_next
    ORDER BY e.prev_type
    """,
)
def q_markov_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 next-event prediction eval with train/test time
    discipline: the first-order Markov argmax is fit on transitions
    whose next event precedes the epoch midpoint and scored on the
    held-out later transitions — per-state hit rate against the
    predicted next type (count-desc, lexicographic tie-break). States
    unseen in training are excluded by contract (nothing to predict).

    Scale: one LAG shuffle (the q_sessionize partitioning), two
    |types|^2-bounded aggregates, a |types|-row broadcast of the
    predictor — the eval never rescans raw twice."""
    ev = read_table(spark, sf_dir, "events")
    bounds = ev.agg(
        (
            (F.min(F.unix_timestamp("ts")) + F.max(F.unix_timestamp("ts")))
            / 2
        )
        .cast("bigint")
        .alias("mid")
    )
    wlag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.coalesce(
            F.lag("event_type").over(wlag), F.lit(TRANS_START)
        ).alias("prev_type"),
        F.col("event_type").alias("next_type"),
        F.unix_timestamp("ts").alias("next_s"),
    ).crossJoin(F.broadcast(bounds))
    train = (
        pairs.where(F.col("next_s") < F.col("mid"))
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type").orderBy(
        F.col("n").desc(), "next_type"
    )
    pred = (
        train.withColumn("r", F.row_number().over(wp))
        .where(F.col("r") == 1)
        .select("prev_type", F.col("next_type").alias("predicted_next"))
    )
    ev_pairs = pairs.where(F.col("next_s") >= F.col("mid")).select(
        "prev_type", "next_type"
    )
    hit = F.when(
        F.col("next_type") == F.col("predicted_next"), 1
    ).otherwise(0)
    return (
        ev_pairs.join(F.broadcast(pred), "prev_type")
        .groupBy("prev_type", "predicted_next")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.sum(hit).cast("bigint").alias("n_hits"),
        )
        .select(
            "prev_type",
            "predicted_next",
            "n_eval",
            "n_hits",
            F.round(
                F.col("n_hits").cast("double") / F.col("n_eval"), 6
            ).alias("hit_rate"),
        )
        .orderBy("prev_type")
    )


# ---------------------------------------------------------------------------
# sample-ratio mismatch guardrail (round 11)
# ---------------------------------------------------------------------------
# The first thing a trustworthy experiment pipeline checks BEFORE
# reading any metric: do the arm sizes match the designed split? A
# biased assignment (broken hash, filtered logging, bot skew) makes
# every downstream readout invalid no matter how pretty the z-score.
# Arms are q_ab_test's own salted buckets; expected split is uniform;
# the report is per-arm counts plus a one-degree chi-square (rounded
# per-term then decimal-accumulated, the q_histogram_drift
# discipline). The SRM convention: chi2 > 3.841 (95%) means stop.

SRM_CHI2_95 = "3.841459"


@query(
    "q_srm_check",
    oracle=f"""
    WITH assigned AS (
        SELECT DISTINCT user_id,
               {sql_portable_hash60(f"'{AB_SALT}:' || CAST(user_id AS VARCHAR)")}
                 % {AB_ARMS} AS arm
        FROM events
    ),
    counts AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM assigned GROUP BY arm
    ),
    tot AS (SELECT SUM(n_users) AS n FROM counts),
    scored AS (
        SELECT c.arm, c.n_users, t.n,
               CAST(round(
                   (c.n_users - CAST(t.n AS DOUBLE) / {AB_ARMS})
                   * (c.n_users - CAST(t.n AS DOUBLE) / {AB_ARMS})
                   / (CAST(t.n AS DOUBLE) / {AB_ARMS}), 6)
                 AS DECIMAL(38,6)) AS chi_term
        FROM counts c, tot t
    )
    SELECT CAST(arm AS INT) AS arm, n_users,
           round(CAST(n_users AS DOUBLE) / n, 6) AS observed_share,
           CAST(chi_term AS DOUBLE) AS chi_term,
           CAST(SUM(chi_term) OVER () AS DOUBLE) AS chi2,
           CAST(SUM(chi_term) OVER () AS DOUBLE) > {SRM_CHI2_95}
             AS srm_flag
    FROM scored
    ORDER BY arm
    """,
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the q_ab_test assignment:
    per-arm distinct-user counts vs the designed uniform split, with a
    chi-square statistic and the stop/go flag at the 95% critical
    value — the check that invalidates an experiment BEFORE any metric
    is read. Chi terms round to 6 dp then accumulate in decimal.

    Scale: one distinct-user aggregate into {AB_ARMS} rows."""
    ev = read_table(spark, sf_dir, "events")
    arm = (
        portable_hash60(
            F.concat(F.lit(f"{AB_SALT}:"), F.col("user_id").cast("string"))
        )
        % AB_ARMS
    )
    counts = (
        ev.select("user_id")
        .distinct()
        .select(arm.alias("arm"))
        .groupBy("arm")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )
    tot = counts.agg(F.sum("n_users").alias("n"))
    exp = F.col("n").cast("double") / AB_ARMS
    chi_term = F.round(
        (F.col("n_users") - exp) * (F.col("n_users") - exp) / exp, 6
    ).cast("decimal(38,6)")
    w = Window.partitionBy()
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("arm").cast("int").alias("arm"),
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("n"), 6
            ).alias("observed_share"),
            chi_term.alias("chi_term_d"),
        )
        .select(
            "arm",
            "n_users",
            "observed_share",
            F.col("chi_term_d").cast("double").alias("chi_term"),
            F.sum("chi_term_d").over(w).cast("double").alias("chi2"),
            (
                F.sum("chi_term_d").over(w).cast("double")
                > float(SRM_CHI2_95)
            ).alias("srm_flag"),
        )
        .orderBy("arm")
    )


# ---------------------------------------------------------------------------
# sequential probability ratio test monitor (round 12)
# ---------------------------------------------------------------------------
# q_ab_test is the FIXED-horizon analysis: look once, at the end.
# Production experimentation looks CONTINUOUSLY, and repeatedly eyeing
# a fixed-horizon z-test inflates false positives (the peeking
# problem). Wald's SPRT is the sequential answer: walk the events in
# time order, accumulate the log-likelihood ratio of H1 (purchase
# share = SPRT_P1) against H0 (= SPRT_P0), and stop the moment the
# LLR leaves the (log B, log A) corridor. The walk reduces to integer
# counts: LLR_n = k*ln(p1/p0) + (n-k)*ln((1-p1)/(1-p0)) where k =
# cumulative purchases — both cumulatives are exact integer window
# sums, and the two log constants are Python-computed literals shared
# verbatim by both engines, so every checkpointed LLR is a product of
# exact integers with identical doubles. The monitor reports the walk
# at fixed row checkpoints (every SPRT_STRIDE events) with the
# running decision; the first boundary crossing is where a live
# deployment would stop (documented divergence: we keep reporting
# past it, because the report IS the operator).

SPRT_P0 = 0.18
SPRT_P1 = 0.22
#: Python-computed once; inlined into BOTH engines' expressions.
SPRT_L1 = 0.20067069546215124  # ln(p1/p0)
SPRT_L0 = -0.05001042057466142  # ln((1-p1)/(1-p0))
SPRT_BOUND = 2.9444389791664403  # ln((1-beta)/alpha), alpha=beta=0.05
SPRT_STRIDE = 500


@query(
    "q_sprt_monitor",
    oracle=f"""
    WITH walk AS (
        SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id) AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS k
        FROM events
    ),
    cps AS (
        SELECT n, k,
               k * {SPRT_L1!r} + (n - k) * {SPRT_L0!r} AS llr
        FROM walk WHERE n % {SPRT_STRIDE} = 0
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS k,
           round(llr, 6) AS llr,
           CASE WHEN llr >= {SPRT_BOUND!r} THEN 'reject_h0'
                WHEN llr <= -{SPRT_BOUND!r} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cps ORDER BY n
    """,
)
def q_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid experiment monitor: Wald's SPRT of H1 (purchase
    share = {SPRT_P1}) vs H0 ({SPRT_P0}) walked over the event stream
    in time order, reported at every {SPRT_STRIDE}-event checkpoint
    with the running decision against the +/-ln(19) corridor
    (alpha = beta = 0.05) — the peeking-safe companion to
    q_ab_test's fixed-horizon z-test.

    Numerics: the LLR at row n is k*C1 + (n-k)*C0 — two EXACT integer
    window cumulatives times Python-computed double literals shared
    verbatim by both engines; no running double sum exists anywhere,
    so window-sum association order (Spark running fold vs DuckDB
    segment tree) cannot diverge the walk.

    Scale: one global ordered window is a single-task sort at the
    checkpoint GRAIN only after the integer cumulatives — at 100 TB
    you shard the monitor per experiment/segment (the partitionBy the
    other window queries here use); the global walk is the
    single-experiment shape."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id")
    walk = ev.select(
        F.row_number().over(w).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("k"),
    ).where(F.col("n") % SPRT_STRIDE == 0)
    llr = F.col("k") * F.lit(SPRT_L1) + (F.col("n") - F.col("k")) * F.lit(
        SPRT_L0
    )
    return walk.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("k"),
        F.round(llr, 6).alias("llr"),
        F.when(llr >= F.lit(SPRT_BOUND), F.lit("reject_h0"))
        .when(llr <= F.lit(-SPRT_BOUND), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    ).orderBy("n")


_fmt(
    q_sprt_monitor,
    SPRT_P0=SPRT_P0,
    SPRT_P1=SPRT_P1,
    SPRT_STRIDE=SPRT_STRIDE,
)


# ---------------------------------------------------------------------------
# split-conformal prediction intervals (round 12)
# ---------------------------------------------------------------------------
# q_linreg_train fits the model and q_linreg_cv scores its average
# error; neither answers the question a consumer of predictions asks:
# "how wide must the interval around THIS prediction be to contain the
# truth 90% of the time?" Split conformal is the assumption-free
# answer: fit on a train split, take the ceil((m+1)*(1-alpha))-th
# smallest absolute residual on a disjoint calibration split as the
# interval half-width, and the marginal coverage guarantee holds for
# ANY model. The eval split then measures the empirical coverage —
# which the guarantee says should land near 1 - alpha.

CONF_ALPHA_NUM = 1  #: alpha = CONF_ALPHA_NUM / CONF_ALPHA_DEN = 0.1
CONF_ALPHA_DEN = 10


@query(
    "q_conformal_calibrate",
    oracle=f"""
    WITH split AS (
        SELECT event_type, value,
               CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS x,
               event_id % 3 AS part
        FROM events
    ),
    fit AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(value * x AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        FROM split WHERE part = 0
        GROUP BY event_type
        HAVING COUNT(*) >= 2 AND COUNT(*) * sxx - sx * sx != 0
    ),
    model AS (
        SELECT event_type,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
               (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                 AS intercept
        FROM fit
    ),
    calib AS (
        SELECT s.event_type,
               abs(s.value - (m.intercept + m.slope * s.x)) AS resid,
               ROW_NUMBER() OVER (PARTITION BY s.event_type
                   ORDER BY abs(s.value - (m.intercept + m.slope * s.x)),
                            s.value) AS r,
               COUNT(*) OVER (PARTITION BY s.event_type) AS m_cal
        FROM split s JOIN model m ON m.event_type = s.event_type
        WHERE s.part = 1
    ),
    qhat AS (
        SELECT event_type, m_cal, resid AS q_hat
        FROM calib
        WHERE r = ((m_cal + 1) * ({CONF_ALPHA_DEN} - {CONF_ALPHA_NUM})
                   + {CONF_ALPHA_DEN} - 1) // {CONF_ALPHA_DEN}
    ),
    cover AS (
        SELECT s.event_type, q.m_cal, q.q_hat,
               COUNT(*) AS n_test,
               SUM(CASE WHEN abs(s.value - (m.intercept + m.slope * s.x))
                             <= q.q_hat THEN 1 ELSE 0 END) AS n_in
        FROM split s
        JOIN model m ON m.event_type = s.event_type
        JOIN qhat q ON q.event_type = s.event_type
        WHERE s.part = 2
        GROUP BY s.event_type, q.m_cal, q.q_hat
    )
    SELECT event_type,
           CAST(m_cal AS BIGINT) AS n_calib,
           CAST(n_test AS BIGINT) AS n_test,
           round(q_hat, 6) AS q_hat,
           round(n_in * 1.0 / n_test, 6) AS coverage
    FROM cover ORDER BY event_type
    """,
)
def q_conformal_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals per event type: fit the
    hour->value OLS on split 0 (event_id % 3 — deterministic,
    partition-invariant), take the ceil((m+1)*0.9)-th smallest
    absolute calibration residual on split 1 as the interval
    half-width q_hat, and report the EMPIRICAL coverage of
    prediction +/- q_hat on the held-out split 2 — the distribution-
    free 90% interval with its own audit attached.

    Numerics: the OLS sums are exact decimal; slope/intercept and
    every residual evaluate with the identical double tree on both
    engines; the quantile INDEX is pure integer arithmetic
    (ceil(9m/10) = (9m+9) div 10, residual-order tie broken on value);
    the coverage comparison is between identical doubles.

    Scale: two grouped aggregates and one per-group order statistic
    (single shuffle each) — the calibration split is a constant
    fraction, and at 100 TB you'd calibrate on a fixed-size sample
    (exchangeability is all conformal needs)."""
    ev = read_table(spark, sf_dir, "events")
    split = ev.select(
        "event_type",
        "value",
        F.hour("ts").cast("double").alias("x"),
        (F.col("event_id") % 3).alias("part"),
    )
    tr = split.where(F.col("part") == 0)
    fit = tr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_d38(F.col("x"))).cast("double").alias("sx"),
        F.sum(_d38(F.col("value"))).cast("double").alias("sy"),
        F.sum(_d38(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
        F.sum(_d38(F.col("value") * F.col("x"))).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (
        F.col("n"), F.col("sx"), F.col("sy"), F.col("sxx"), F.col("sxy"),
    )
    fit = fit.where((n >= 2) & (n * sxx - sx * sx != 0))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    model = fit.select(
        "event_type",
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )
    resid = F.abs(
        F.col("value") - (F.col("intercept") + F.col("slope") * F.col("x"))
    )
    calib = (
        split.where(F.col("part") == 1)
        .join(F.broadcast(model), "event_type")
        .select("event_type", "value", resid.alias("resid"))
    )
    wr = Window.partitionBy("event_type").orderBy("resid", "value")
    wm = Window.partitionBy("event_type")
    # ceil((m+1)*(1-alpha)) via pure integer arithmetic — `div` is
    # exact at any m_cal, where a double division could misround near
    # representability limits
    k = F.expr(
        f"((m_cal + 1) * {CONF_ALPHA_DEN - CONF_ALPHA_NUM} "
        f"+ {CONF_ALPHA_DEN - 1}) div {CONF_ALPHA_DEN}"
    )
    qhat = (
        calib.select(
            "event_type",
            "resid",
            F.row_number().over(wr).alias("r"),
            F.count(F.lit(1)).over(wm).alias("m_cal"),
        )
        .where(F.col("r") == k)
        .select("event_type", "m_cal", F.col("resid").alias("q_hat"))
    )
    test = (
        split.where(F.col("part") == 2)
        .join(F.broadcast(model), "event_type")
        .join(F.broadcast(qhat), "event_type")
    )
    return (
        test.groupBy("event_type", "m_cal", "q_hat")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(resid <= F.col("q_hat"), 1).otherwise(0)
            ).alias("n_in"),
        )
        .select(
            "event_type",
            F.col("m_cal").cast("bigint").alias("n_calib"),
            F.col("n_test").cast("bigint").alias("n_test"),
            F.round("q_hat", 6).alias("q_hat"),
            F.round(F.col("n_in") / F.col("n_test"), 6).alias("coverage"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# difference-in-differences (round 12)
# ---------------------------------------------------------------------------
# q_ab_test assumes randomized arms; when the "treatment" correlates
# with time (a rollout, a pricing change), the workhorse observational
# estimator is difference-in-differences: compare each group's change
# across the pre/post boundary, and difference the changes — any
# time-invariant group difference and any group-invariant time trend
# cancel. Same stable hash arms as q_ab_test, same integer-epoch
# midpoint split as q_cuped; the estimate is four exact-decimal cell
# means combined in one identical double expression.


@query(
    "q_diff_in_diff",
    oracle=f"""
    WITH bounds AS (
        SELECT (MIN(CAST(floor(epoch(ts)) AS BIGINT))
                + MAX(CAST(floor(epoch(ts)) AS BIGINT))) // 2 AS mid
        FROM events
    ),
    cells AS (
        SELECT {sql_portable_hash60(f"'{AB_SALT}:' || CAST(user_id AS VARCHAR)")}
                 % {AB_ARMS} AS arm,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) >= b.mid
                    THEN 1 ELSE 0 END AS post,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sv
        FROM events, bounds b
        GROUP BY arm, post
    ),
    means AS (
        SELECT arm,
               MAX(CASE WHEN post = 0 THEN n END) AS n_pre,
               MAX(CASE WHEN post = 1 THEN n END) AS n_post,
               MAX(CASE WHEN post = 0 THEN sv / n END) AS pre_mean,
               MAX(CASE WHEN post = 1 THEN sv / n END) AS post_mean
        FROM cells GROUP BY arm
    ),
    deltas AS (
        SELECT arm, n_pre, n_post, pre_mean, post_mean,
               post_mean - pre_mean AS delta
        FROM means
    )
    SELECT CAST(arm AS INT) AS arm,
           CAST(n_pre AS BIGINT) AS n_pre,
           CAST(n_post AS BIGINT) AS n_post,
           round(pre_mean, 6) AS pre_mean,
           round(post_mean, 6) AS post_mean,
           round(delta, 6) AS delta,
           round(MAX(CASE WHEN arm = 1 THEN delta END) OVER ()
                 - MAX(CASE WHEN arm = 0 THEN delta END) OVER (), 6)
             AS did_estimate
    FROM deltas ORDER BY arm
    """,
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout: per hash arm, the mean event
    value before and after the observed range's integer-epoch midpoint
    and its change; the DiD estimate (treatment delta minus control
    delta) cancels time-invariant arm differences and arm-invariant
    time trends — the observational companion to q_ab_test's
    randomized z-test, sharing its arms and q_cuped's period split.

    Numerics: four exact-decimal cell sums; every derived mean and
    the final 2x2 combination evaluate with identical double trees.

    Scale: one grouped aggregate over (arm, period) — four cells
    forever; the midpoint is a broadcast 1-row bound."""
    ev = read_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    bounds = ev.agg(
        ((F.min(epoch) + F.max(epoch)) / 2).cast("bigint").alias("mid")
    )
    arm = (
        portable_hash60(
            F.concat(F.lit(f"{AB_SALT}:"), F.col("user_id").cast("string"))
        )
        % AB_ARMS
    )
    cells = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            arm.alias("arm"),
            F.when(epoch >= F.col("mid"), 1).otherwise(0).alias("post"),
            "value",
        )
        .groupBy("arm", "post")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_d38(F.col("value"))).cast("double").alias("sv"),
        )
    )
    means = cells.groupBy("arm").agg(
        F.max(F.when(F.col("post") == 0, F.col("n"))).alias("n_pre"),
        F.max(F.when(F.col("post") == 1, F.col("n"))).alias("n_post"),
        F.max(
            F.when(F.col("post") == 0, F.col("sv") / F.col("n"))
        ).alias("pre_mean"),
        F.max(
            F.when(F.col("post") == 1, F.col("sv") / F.col("n"))
        ).alias("post_mean"),
    )
    deltas = means.withColumn(
        "delta", F.col("post_mean") - F.col("pre_mean")
    )
    w = Window.partitionBy()
    did = F.max(F.when(F.col("arm") == 1, F.col("delta"))).over(w) - F.max(
        F.when(F.col("arm") == 0, F.col("delta"))
    ).over(w)
    return deltas.select(
        F.col("arm").cast("int").alias("arm"),
        F.col("n_pre").cast("bigint").alias("n_pre"),
        F.col("n_post").cast("bigint").alias("n_post"),
        F.round("pre_mean", 6).alias("pre_mean"),
        F.round("post_mean", 6).alias("post_mean"),
        F.round("delta", 6).alias("delta"),
        F.round(did, 6).alias("did_estimate"),
    ).orderBy("arm")


# ---------------------------------------------------------------------------
# Thompson-sampling readout: Beta posteriors + P(best) on a grid
# ---------------------------------------------------------------------------
# The frequentist readouts above (q_ab_test, q_sprt_monitor,
# q_power_mde) answer "is B better than A"; a bandit asks "what is
# the probability EACH arm is best", the number Thompson sampling
# allocates by. With Beta(1+s, 1+f) posteriors this is an integral
# with no closed form for >2 arms; the standard numeric answer is a
# grid: P(i best) = sum_j w_ij * prod_{k!=i} CDF_k(x_j). Everything
# here is engineered to be cross-engine REPRODUCIBLE: posterior
# weights normalize through exact-decimal folds (never unordered
# float sums — DuckDB's segment-tree window summation and Spark's
# running fold add in different orders), and the product over arms
# runs as an exact-decimal sum of clamped log-CDFs.

#: conversion threshold: an event converts when value > BND_THRESH
BND_THRESH = 100.0

#: posterior grid resolution (midpoint rule on (0,1))
BND_GRID = 512


def bandit_oracle_sql(where: str = "TRUE") -> str:
    """The grid-integration posterior as DuckDB SQL over events rows
    matching ``where`` — shared by the batch oracle and the streaming
    view's per-version oracles."""
    return f"""
    WITH arms AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN value > {BND_THRESH} THEN 1 ELSE 0 END)
                    AS BIGINT) AS s
        FROM events WHERE {where} GROUP BY event_type
    ),
    g AS (
        SELECT a.event_type, a.n, a.s, t.j,
               (t.j + 0.5) / {BND_GRID} AS x,
               a.s * ln((t.j + 0.5) / {BND_GRID})
               + (a.n - a.s) * ln(1 - (t.j + 0.5) / {BND_GRID}) AS logw
        FROM arms a CROSS JOIN generate_series(0, {BND_GRID - 1}) t(j)
    ),
    w AS (
        SELECT g.*,
               CAST(round(exp(logw - MAX(logw) OVER (
                   PARTITION BY event_type)), 15) AS DECIMAL(18,15))
                 AS wp
        FROM g
    ),
    c AS (
        SELECT w.*,
               SUM(wp) OVER (PARTITION BY event_type ORDER BY j
                   ROWS UNBOUNDED PRECEDING) AS cumw,
               SUM(wp) OVER (PARTITION BY event_type) AS z
        FROM w
    ),
    p AS (
        SELECT c.*,
               CAST(wp AS DOUBLE) / CAST(z AS DOUBLE) AS wnorm,
               CAST(round(ln(GREATEST(
                   (CAST(cumw AS DOUBLE) - CAST(wp AS DOUBLE) / 2)
                     / CAST(z AS DOUBLE), 1e-300)),
                   12) AS DECIMAL(28,12)) AS lncdf
        FROM c
    ),
    q AS (
        SELECT p.*,
               SUM(lncdf) OVER (PARTITION BY j) AS lnall
        FROM p
    )
    SELECT event_type, n, s,
           round((1.0 + s) / (2.0 + n), 6) AS post_mean,
           round(CAST(SUM(CAST(round(
               wnorm * exp(CAST(lnall - lncdf AS DOUBLE)), 12)
               AS DECIMAL(18,12))) AS DOUBLE), 6) AS p_best
    FROM q GROUP BY event_type, n, s
    """


@query("q_bandit_posterior", oracle=bandit_oracle_sql())
def q_bandit_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thompson-sampling readout: each event type is an arm whose
    conversion (value > {BND_THRESH}) follows Beta(1+s, 1+f), and the
    report is every arm's posterior mean plus P(arm is best) — the
    allocation weights of a bandit — computed by midpoint-rule
    integration on a {BND_GRID}-point grid: P(i best) =
    sum_j w_ij * prod_k!=i CDF_k(x_j) with the midpoint CDF
    convention (cum - w/2, so grid ties split instead of double-
    counting and the p_best column sums to ~1). The cross-engine
    discipline is
    the point: posterior weights exponentiate against a per-arm max
    (no underflow at s in the thousands), normalize and accumulate
    through EXACT-DECIMAL folds (an unordered float sum differs
    between DuckDB's segment-tree window aggregation and Spark's
    running fold), and the across-arm product is an exact-decimal sum
    of clamped rounded log-CDFs — so both engines integrate to the
    same 6 decimals by construction, not by luck.

    Scale: one map-side-combined aggregate to |arms| rows, then all
    arithmetic on the |arms| x {BND_GRID} grid frame — constant-size
    whatever the event volume. Arms x grid is the broadcast cross of
    a |arms|-row aggregate with a literal range."""
    arms = bandit_arm_counts(read_table(spark, sf_dir, "events"))
    return bandit_readout(spark, arms)


def bandit_arm_counts(events: DataFrame) -> DataFrame:
    """Per-arm (n, s) trial/success counts — the MERGEABLE state of
    the bandit (counts add), shared by the batch readout and the
    streaming view fold."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("value") > BND_THRESH, 1).otherwise(0))
        .cast("long")
        .alias("s"),
    )


def bandit_readout(spark: SparkSession, arms: DataFrame) -> DataFrame:
    """Grid-integrated posterior readout from an (event_type, n, s)
    arm frame — the q_bandit_posterior kernel (see its docstring for
    the cross-engine discipline)."""
    grid = spark.range(BND_GRID).select(F.col("id").alias("j"))
    x = (F.col("j") + 0.5) / BND_GRID
    g = arms.crossJoin(F.broadcast(grid)).withColumn(
        "logw",
        F.col("s") * F.log(x) + (F.col("n") - F.col("s")) * F.log(1 - x),
    )
    warm = Window.partitionBy("event_type")
    wrun = warm.orderBy("j").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w = g.withColumn(
        "wp",
        F.round(F.exp(F.col("logw") - F.max("logw").over(warm)), 15).cast(
            "decimal(18,15)"
        ),
    )
    c = w.withColumn("cumw", F.sum("wp").over(wrun)).withColumn(
        "z", F.sum("wp").over(warm)
    )
    p = c.withColumn(
        "wnorm", F.col("wp").cast("double") / F.col("z").cast("double")
    ).withColumn(
        "lncdf",
        F.round(
            F.log(
                F.greatest(
                    (
                        F.col("cumw").cast("double")
                        - F.col("wp").cast("double") / 2
                    )
                    / F.col("z").cast("double"),
                    F.lit(1e-300),
                )
            ),
            12,
        ).cast("decimal(28,12)"),
    )
    q = p.withColumn("lnall", F.sum("lncdf").over(Window.partitionBy("j")))
    out = q.groupBy("event_type", "n", "s").agg(
        F.sum(
            F.round(
                F.col("wnorm")
                * F.exp((F.col("lnall") - F.col("lncdf")).cast("double")),
                12,
            ).cast("decimal(18,12)")
        )
        .cast("double")
        .alias("p_raw"),
    )
    return out.select(
        "event_type",
        "n",
        "s",
        F.round((1.0 + F.col("s")) / (2.0 + F.col("n")), 6).alias(
            "post_mean"
        ),
        F.round("p_raw", 6).alias("p_best"),
    )


_fmt(q_bandit_posterior, BND_THRESH=BND_THRESH, BND_GRID=BND_GRID)


# ---------------------------------------------------------------------------
# standardized effect size (Cohen's d / Hedges g) — round 15
# ---------------------------------------------------------------------------
# q_ab_test answers "is the difference real"; the decision-maker's
# next question is "is it BIG" — the standardized effect size, which
# is comparable across metrics and experiments. Same hashed arms and
# per-user metric as q_ab_test; per-arm moments accumulate as exact
# decimals (rounded per-user metrics), so d, the small-sample Hedges
# correction, and the normal-approximation CI are engine-exact.

#: the q_ab_test arm salt (same assignment, deliberately)
_ES_SALT = "exp-events-v1:"


def _es_oracle() -> str:
    h = (
        "(('0x' || substr(md5('" + _ES_SALT + "' || "
        "CAST(user_id AS VARCHAR)), 1, 15))::BIGINT) % 2"
    )
    return f"""
    WITH per_user AS (
        SELECT user_id, event_type, {h} AS arm,
               -- (19,6): DuckDB's int64 decimal kernel overflows on
               -- (18,6)x(18,6) products (q_autocorrelation lesson)
               CAST(round(CAST(SUM(CAST(value AS DECIMAL(38,6)))
                    AS DOUBLE), 6) AS DECIMAL(19,6)) AS m
        FROM events GROUP BY user_id, event_type
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_a,
               CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_b,
               CAST(SUM(m) FILTER (WHERE arm = 0) AS DOUBLE) AS s_a,
               CAST(SUM(m) FILTER (WHERE arm = 1) AS DOUBLE) AS s_b,
               CAST(SUM(m * m) FILTER (WHERE arm = 0) AS DOUBLE) AS q_a,
               CAST(SUM(m * m) FILTER (WHERE arm = 1) AS DOUBLE) AS q_b
        FROM per_user GROUP BY event_type
    ),
    mo AS (
        SELECT event_type, n_a, n_b,
               s_a / n_a AS m_a, s_b / n_b AS m_b,
               (q_a - s_a * s_a / n_a) / (n_a - 1) AS v_a,
               (q_b - s_b * s_b / n_b) / (n_b - 1) AS v_b
        FROM s
    ),
    eff AS (
        SELECT event_type, n_a, n_b, m_a, m_b,
               (m_b - m_a) / sqrt(((n_a - 1) * v_a + (n_b - 1) * v_b)
                                  / (n_a + n_b - 2)) AS d
        FROM mo
    )
    SELECT event_type, n_a, n_b,
           round(m_a, 6) AS mean_a, round(m_b, 6) AS mean_b,
           round(d, 6) AS cohens_d,
           round(d * (1.0 - 3.0 / (4.0 * (n_a + n_b) - 9.0)), 6)
             AS hedges_g,
           round(d - 1.959963984540054
                 * sqrt((n_a + n_b) / (CAST(n_a AS DOUBLE) * n_b)
                        + d * d / (2.0 * (n_a + n_b))), 6) AS ci_lo,
           round(d + 1.959963984540054
                 * sqrt((n_a + n_b) / (CAST(n_a AS DOUBLE) * n_b)
                        + d * d / (2.0 * (n_a + n_b))), 6) AS ci_hi
    FROM eff
    """


def _register_effect_size() -> None:
    @query("q_effect_size", oracle=_es_oracle())
    def q_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Standardized effect size per event type between the hashed
        experiment arms (the q_ab_test assignment): Cohen's d on the
        per-user metric, the Hedges small-sample correction, and the
        normal-approximation 95% CI — the "is it big" companion to
        q_ab_test's "is it real". Per-arm sums and sums of squares
        accumulate as exact decimals over rounded per-user metrics,
        so every released number is a deterministic function of the
        data on both engines.

        Scale: one per-user aggregate (partial+final), one
        |types|-row moment fold — the q_ab_test cost exactly."""
        ev = read_table(spark, sf_dir, "events")
        per_user = ev.groupBy("user_id", "event_type").agg(
            F.round(
                F.sum(F.col("value").cast("decimal(38,6)")).cast(
                    "double"
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("m")
        ).withColumn(
            "arm",
            portable_hash60(
                F.concat(
                    F.lit(_ES_SALT), F.col("user_id").cast("string")
                )
            )
            % 2,
        )
        s = per_user.groupBy("event_type").agg(
            F.count(F.when(F.col("arm") == 0, 1)).cast("long").alias("n_a"),
            F.count(F.when(F.col("arm") == 1, 1)).cast("long").alias("n_b"),
            F.sum(F.when(F.col("arm") == 0, F.col("m")))
            .cast("double")
            .alias("s_a"),
            F.sum(F.when(F.col("arm") == 1, F.col("m")))
            .cast("double")
            .alias("s_b"),
            F.sum(F.when(F.col("arm") == 0, F.col("m") * F.col("m")))
            .cast("double")
            .alias("q_a"),
            F.sum(F.when(F.col("arm") == 1, F.col("m") * F.col("m")))
            .cast("double")
            .alias("q_b"),
        )
        mo = s.select(
            "event_type",
            "n_a",
            "n_b",
            (F.col("s_a") / F.col("n_a")).alias("m_a"),
            (F.col("s_b") / F.col("n_b")).alias("m_b"),
            (
                (F.col("q_a") - F.col("s_a") * F.col("s_a") / F.col("n_a"))
                / (F.col("n_a") - 1)
            ).alias("v_a"),
            (
                (F.col("q_b") - F.col("s_b") * F.col("s_b") / F.col("n_b"))
                / (F.col("n_b") - 1)
            ).alias("v_b"),
        )
        d = (F.col("m_b") - F.col("m_a")) / F.sqrt(
            (
                (F.col("n_a") - 1) * F.col("v_a")
                + (F.col("n_b") - 1) * F.col("v_b")
            )
            / (F.col("n_a") + F.col("n_b") - 2)
        )
        eff = mo.withColumn("d", d)
        se = F.sqrt(
            (F.col("n_a") + F.col("n_b"))
            / (F.col("n_a").cast("double") * F.col("n_b"))
            + F.col("d") * F.col("d")
            / (2.0 * (F.col("n_a") + F.col("n_b")))
        )
        z = F.lit(1.959963984540054)
        return eff.select(
            "event_type",
            "n_a",
            "n_b",
            F.round("m_a", 6).alias("mean_a"),
            F.round("m_b", 6).alias("mean_b"),
            F.round("d", 6).alias("cohens_d"),
            F.round(
                F.col("d")
                * (
                    1.0
                    - 3.0 / (4.0 * (F.col("n_a") + F.col("n_b")) - 9.0)
                ),
                6,
            ).alias("hedges_g"),
            F.round(F.col("d") - z * se, 6).alias("ci_lo"),
            F.round(F.col("d") + z * se, 6).alias("ci_hi"),
        )


_register_effect_size()


# ---------------------------------------------------------------------------
# delete-one-cluster jackknife for a ratio metric — round 15
# ---------------------------------------------------------------------------
# Ratio metrics (revenue per event, CTR) violate the iid assumption
# behind q_ab_test's variance: events cluster within users. The
# standard production fix is the delete-one-CLUSTER jackknife — refit
# the ratio with each user removed, read the spread. Leave-one-out is
# EXACT here: r_{-u} = (S - s_u)/(N - n_u) needs only per-user
# partials against the totals, so the G refits cost one aggregate,
# and every sum that crosses users is an exact decimal of rounded
# doubles (float order cleared).


def _register_jackknife() -> None:
    from pyspark.sql import Window

    @query(
        "q_jackknife_ratio",
        oracle="""
        WITH per_user AS (
            SELECT event_type, user_id,
                   CAST(SUM(CAST(value AS DECIMAL(38,6)))
                        AS DECIMAL(28,6)) AS s_u,
                   CAST(COUNT(*) AS BIGINT) AS n_u
            FROM events GROUP BY event_type, user_id
        ),
        tot AS (
            SELECT event_type,
                   CAST(SUM(s_u) AS DECIMAL(28,6)) AS s,
                   CAST(SUM(n_u) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS g
            FROM per_user GROUP BY event_type
        ),
        loo AS (
            SELECT p.event_type, t.s, t.n, t.g,
                   CAST(round(CAST(CAST(t.s - p.s_u AS VARCHAR) AS DOUBLE)
                              / (t.n - p.n_u), 9)
                        AS DECIMAL(28,9)) AS r_loo
            FROM per_user p JOIN tot t USING (event_type)
        ),
        rbar AS (
            SELECT event_type, s, n, g,
                   CAST(CAST(SUM(r_loo) AS VARCHAR) AS DOUBLE) / g AS rb
            FROM loo GROUP BY event_type, s, n, g
        ),
        dev AS (
            SELECT loo.event_type, rbar.g, rbar.s, rbar.n,
                   CAST(round((CAST(CAST(loo.r_loo AS VARCHAR) AS DOUBLE) - rbar.rb)
                              * (CAST(CAST(loo.r_loo AS VARCHAR) AS DOUBLE) - rbar.rb),
                              12) AS DECIMAL(38,12)) AS d2
            FROM loo JOIN rbar USING (event_type)
        )
        SELECT event_type,
               MAX(g) AS n_users,
               round(CAST(CAST(MAX(s) AS VARCHAR) AS DOUBLE) / MAX(n), 6) AS ratio,
               round(sqrt((MAX(g) - 1.0) / MAX(g)
                          * CAST(CAST(SUM(d2) AS VARCHAR) AS DOUBLE)), 6) AS jk_se
        FROM dev GROUP BY event_type
        """,
    )
    def q_jackknife_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Delete-one-user jackknife standard error for the ratio
        metric value-per-event, per event type — the clustered
        uncertainty a per-row variance understates. Leave-one-out is
        computed EXACTLY from per-user partials against the totals
        (r_-u = (S - s_u)/(N - n_u)), so G refits cost one aggregate
        and no resampling; every cross-user sum (the r_-u mean, the
        squared deviations) is an exact decimal of rounded doubles,
        clearing float summation order across engines.

        Caps (r17 contract-stress tier): s_u/s are DECIMAL(28,6),
        r_loo DECIMAL(28,9), d2 DECIMAL(38,12) — at 10x-bench value
        magnitude the squared deviations reach ~5e19, overflowing
        the old (18,x) caps (DuckDB hard-errored, Spark NULLed) —
        the exact q_pacf failure class, widened the same way. All
        oracle decimal->double casts route through VARCHAR: DuckDB's
        direct cast double-rounds past 2^53 unscaled (see q_cuped).

        Scale: one per-(type, user) aggregate, one |types|-row total
        frame broadcast back, one more aggregate — three
        map-side-combined shuffles bounded by user cardinality,
        nothing quadratic."""
        ev = read_table(spark, sf_dir, "events")
        per_user = ev.groupBy("event_type", "user_id").agg(
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("decimal(28,6)")
            .alias("s_u"),
            F.count(F.lit(1)).cast("long").alias("n_u"),
        )
        tot = per_user.groupBy("event_type").agg(
            F.sum("s_u").cast("decimal(28,6)").alias("s"),
            F.sum("n_u").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("g"),
        )
        loo = per_user.join(F.broadcast(tot), "event_type").select(
            "event_type",
            "s",
            "n",
            "g",
            F.round(
                (F.col("s") - F.col("s_u")).cast("double")
                / (F.col("n") - F.col("n_u")),
                9,
            )
            .cast("decimal(28,9)")
            .alias("r_loo"),
        )
        rbar = loo.groupBy("event_type", "s", "n", "g").agg(
            (F.sum("r_loo").cast("double") / F.col("g")).alias("rb")
        )
        dev = loo.join(
            F.broadcast(rbar.select("event_type", "rb")), "event_type"
        ).select(
            "event_type",
            "g",
            "s",
            "n",
            F.round(
                (F.col("r_loo").cast("double") - F.col("rb"))
                * (F.col("r_loo").cast("double") - F.col("rb")),
                12,
            )
            .cast("decimal(38,12)")
            .alias("d2"),
        )
        return dev.groupBy("event_type").agg(
            F.max("g").alias("n_users"),
            F.round(
                F.max("s").cast("double") / F.max("n"), 6
            ).alias("ratio"),
            F.round(
                F.sqrt(
                    (F.max("g") - 1.0)
                    / F.max("g")
                    * F.sum("d2").cast("double")
                ),
                6,
            ).alias("jk_se"),
        )


_register_jackknife()


# ---------------------------------------------------------------------------
# covariate adjustment by standardization (the g-formula) — round 15
# ---------------------------------------------------------------------------
# q_diff_in_diff and q_cuped adjust with TIME structure; the simplest
# causal adjustment needs none: stratify on the confounder and
# standardize — ATE_adj = sum_s P(s) * (E[Y|T=1,s] - E[Y|T=0,s]) —
# the g-formula / direct standardization every epidemiology and
# experimentation text opens with, and the constructive fix for the
# reversals q_simpson_scan detects. Here: does a PROMO part type
# "move" the discount once quantity (the confounder driving both) is
# held fixed? All stratum means come from exact-decimal sums.


def _register_standardization() -> None:
    from pyspark.sql import Window

    @query(
        "q_standardization",
        oracle="""
        WITH u AS (
            SELECT CAST(floor(l_quantity / 10) AS BIGINT) AS stratum,
                   CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS t,
                   CAST(l_discount AS DECIMAL(18,6)) AS y
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        s AS (
            SELECT stratum,
                   CAST(COUNT(*) AS BIGINT) AS n_s,
                   CAST(SUM(t) AS BIGINT) AS n_t,
                   CAST(COUNT(*) - SUM(t) AS BIGINT) AS n_c,
                   CAST(SUM(CASE WHEN t = 1 THEN y END) AS DOUBLE) AS sy_t,
                   CAST(SUM(CASE WHEN t = 0 THEN y END) AS DOUBLE) AS sy_c
            FROM u GROUP BY stratum
        ),
        g AS (
            SELECT s.*,
                   CAST(SUM(n_s) OVER () AS BIGINT) AS n,
                   CAST(SUM(n_t) OVER () AS BIGINT) AS nt,
                   CAST(SUM(n_c) OVER () AS BIGINT) AS nc,
                   CAST(SUM(CAST(round(sy_t, 6) AS DECIMAL(18,6)))
                        OVER () AS DOUBLE) AS syt_all,
                   CAST(SUM(CAST(round(sy_c, 6) AS DECIMAL(18,6)))
                        OVER () AS DOUBLE) AS syc_all,
                   CAST(SUM(CAST(round(
                       (CAST(n_s AS DOUBLE))
                       * (sy_t / n_t - sy_c / n_c), 6)
                       AS DECIMAL(18,6))) OVER () AS DOUBLE) AS adj_num
            FROM s
        )
        SELECT stratum, n_s, n_t, n_c,
               round(sy_t / n_t, 6) AS mean_t,
               round(sy_c / n_c, 6) AS mean_c,
               round(sy_t / n_t - sy_c / n_c, 6) AS stratum_effect,
               round(syt_all / nt - syc_all / nc, 6) AS naive_ate,
               round(adj_num / n, 6) AS adjusted_ate
        FROM g
        """,
    )
    def q_standardization(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Direct standardization (the g-formula): the promo-vs-
        nonpromo discount effect per quantity stratum, the
        stratum-weighted ADJUSTED ATE (sum_s P(s) * effect_s), and
        the naive marginal difference side by side — the constructive
        fix for the confounded comparisons q_simpson_scan flags.
        Stratum sums are exact decimals; the adjusted numerator sums
        rounded per-stratum terms as exact decimals over the
        |strata|-row frame, so both engines standardize identically.

        Scale: one lineitem->part join (dimension broadcast when it
        fits) into one map-side-combined stratum aggregate; the
        standardization windows touch |strata| rows."""
        li = read_table(spark, sf_dir, "lineitem")
        p = read_table(spark, sf_dir, "part")
        u = li.join(p, li.l_partkey == p.p_partkey).select(
            F.floor(F.col("l_quantity") / 10)
            .cast("long")
            .alias("stratum"),
            F.when(F.col("p_type").startswith("PROMO"), 1)
            .otherwise(0)
            .alias("t"),
            F.col("l_discount").cast("decimal(18,6)").alias("y"),
        )
        s = u.groupBy("stratum").agg(
            F.count(F.lit(1)).cast("long").alias("n_s"),
            F.sum("t").cast("long").alias("n_t"),
            (F.count(F.lit(1)) - F.sum("t")).cast("long").alias("n_c"),
            F.sum(F.when(F.col("t") == 1, F.col("y")))
            .cast("double")
            .alias("sy_t"),
            F.sum(F.when(F.col("t") == 0, F.col("y")))
            .cast("double")
            .alias("sy_c"),
        )
        wall = Window.partitionBy()
        dec6 = "decimal(18,6)"
        g = (
            s.withColumn("n", F.sum("n_s").over(wall).cast("long"))
            .withColumn("nt", F.sum("n_t").over(wall).cast("long"))
            .withColumn("nc", F.sum("n_c").over(wall).cast("long"))
            .withColumn(
                "syt_all",
                F.sum(F.round("sy_t", 6).cast(dec6))
                .over(wall)
                .cast("double"),
            )
            .withColumn(
                "syc_all",
                F.sum(F.round("sy_c", 6).cast(dec6))
                .over(wall)
                .cast("double"),
            )
            .withColumn(
                "adj_num",
                F.sum(
                    F.round(
                        F.col("n_s").cast("double")
                        * (
                            F.col("sy_t") / F.col("n_t")
                            - F.col("sy_c") / F.col("n_c")
                        ),
                        6,
                    ).cast(dec6)
                )
                .over(wall)
                .cast("double"),
            )
        )
        return g.select(
            "stratum",
            "n_s",
            "n_t",
            "n_c",
            F.round(F.col("sy_t") / F.col("n_t"), 6).alias("mean_t"),
            F.round(F.col("sy_c") / F.col("n_c"), 6).alias("mean_c"),
            F.round(
                F.col("sy_t") / F.col("n_t")
                - F.col("sy_c") / F.col("n_c"),
                6,
            ).alias("stratum_effect"),
            F.round(
                F.col("syt_all") / F.col("nt")
                - F.col("syc_all") / F.col("nc"),
                6,
            ).alias("naive_ate"),
            F.round(F.col("adj_num") / F.col("n"), 6).alias(
                "adjusted_ate"
            ),
        )


_register_standardization()
