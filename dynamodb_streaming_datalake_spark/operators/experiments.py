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


# ---------------------------------------------------------------------------
# randomization inference: the permutation test — round 17
# ---------------------------------------------------------------------------
# q_ab_test's z-score leans on a normal approximation; the assumption-
# free readout is Fisher's randomization test: re-randomize the arm
# assignment many times, recompute the statistic under each
# re-randomization, and read the p-value off the permutation
# distribution. The classical obstacle to running this distributed is
# the RNG; the fix is the same one q_ab_test uses for assignment —
# each "permutation" is a fresh salted hash bucketing (exchangeable
# under the null by the same argument that makes the real assignment
# uniform), so every engine replays the identical 64 re-assignments
# with no random state at all.

#: permutation-test salt (distinct from AB_SALT so re-assignments are
#: independent of the real experiment's buckets).
PERM_SALT = "perm-events-v1"

#: number of hash re-randomizations (r = 1..PERM_R; r = 0 is the
#: observed assignment).
PERM_R = 64


@query(
    "q_permutation_test",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(28,6))
                 AS metric
        FROM events GROUP BY user_id
    ),
    assign AS (
        SELECT u.metric, t.r,
               CASE WHEN t.r = 0 THEN
                 {sql_portable_hash60(f"'{AB_SALT}:' || CAST(u.user_id AS VARCHAR)")}
                 % {AB_ARMS}
               ELSE
                 {sql_portable_hash60(f"'{PERM_SALT}:' || CAST(t.r AS VARCHAR) || ':' || CAST(u.user_id AS VARCHAR)")}
                 % {AB_ARMS}
               END AS arm
        FROM per_user u CROSS JOIN generate_series(0, {PERM_R}) t(r)
    ),
    cells AS (
        SELECT r, arm,
               CAST(SUM(metric) AS DECIMAL(38,6)) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM assign GROUP BY r, arm
    ),
    diffs AS (
        SELECT r,
               CAST(CAST(MAX(CASE WHEN arm = 1 THEN s END) AS VARCHAR)
                    AS DOUBLE) / MAX(CASE WHEN arm = 1 THEN n END)
               - CAST(CAST(MAX(CASE WHEN arm = 0 THEN s END) AS VARCHAR)
                      AS DOUBLE) / MAX(CASE WHEN arm = 0 THEN n END) AS d
        FROM cells GROUP BY r
    ),
    obs AS (SELECT d AS d_obs, abs(d) AS stat_obs FROM diffs WHERE r = 0),
    perm AS (SELECT abs(d) AS stat_r FROM diffs WHERE r >= 1)
    SELECT (SELECT COUNT(*) FROM per_user) AS n_users,
           CAST(COUNT(stat_r) AS BIGINT) AS r_valid,
           round(MAX(o.d_obs), 6) AS obs_diff,
           CAST(COUNT(CASE WHEN stat_r >= o.stat_obs THEN 1 END)
                AS BIGINT) AS n_ge,
           CASE WHEN MAX(o.stat_obs) IS NOT NULL THEN
             round((1.0 + COUNT(CASE WHEN stat_r >= o.stat_obs THEN 1 END))
                   / (1.0 + COUNT(stat_r)), 6)
           END AS p_value
    FROM perm CROSS JOIN obs o
    """,
)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher randomization test for the per-user total-value metric:
    the observed arm diff (q_ab_test's assignment, r = 0) against the
    permutation distribution of {PERM_R} salted hash re-assignments
    (r = 1..{PERM_R}); p = (1 + #{{r : |diff_r| >= |diff_obs|}})
    / (1 + r_valid) — the standard add-one randomization p-value,
    assumption-free where q_ab_test's z leans on normality. Hash
    re-bucketing replaces the RNG, so every engine replays the exact
    same {PERM_R} re-randomizations deterministically.

    Permutations where an arm comes up empty (possible only on
    near-empty fixtures) have an undefined diff and drop out of both
    the numerator and the denominator (r_valid); when the OBSERVED
    assignment itself has an empty arm, obs_diff and p_value are NULL
    by contract.

    Numerics: per-(r, arm) sums fold exact decimals; every mean and
    the |diff_r| >= |diff_obs| comparison evaluate identical double
    trees on both engines (oracle decimal->double via VARCHAR), so
    the permutation counts match exactly, not merely closely.

    Scale: the events pass is ONE per-user aggregate; the x{PERM_R}
    blow-up happens on the user frame only and map-side-combines
    straight into 2x{PERM_R} cells — adding permutations adds rows to
    a users-sized frame, never another events scan."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(_d38(F.col("value"))).cast("decimal(28,6)").alias("metric")
    )
    uid = F.col("user_id").cast("string")
    obs_arm = portable_hash60(F.concat(F.lit(f"{AB_SALT}:"), uid)) % AB_ARMS
    perm_arm = (
        portable_hash60(
            F.concat(
                F.lit(f"{PERM_SALT}:"),
                F.col("r").cast("string"),
                F.lit(":"),
                uid,
            )
        )
        % AB_ARMS
    )
    assign = per_user.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(PERM_R)))
    ).select(
        "metric",
        "r",
        F.when(F.col("r") == 0, obs_arm).otherwise(perm_arm).alias("arm"),
    )
    cells = assign.groupBy("r", "arm").agg(
        F.sum("metric").cast("decimal(38,6)").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    is1, is0 = F.col("arm") == 1, F.col("arm") == 0
    # every user is assigned an arm at every r, so sum(n) per r IS the
    # user count — no second events lineage for it
    diffs = cells.groupBy("r").agg(
        (
            F.max(F.when(is1, F.col("s"))).cast("double")
            / F.max(F.when(is1, F.col("n")))
            - F.max(F.when(is0, F.col("s"))).cast("double")
            / F.max(F.when(is0, F.col("n")))
        ).alias("d"),
        F.sum("n").cast("long").alias("nu_r"),
    )
    # single-lineage finish: the observed stat joins the permutation
    # rows through one window over the (PERM_R + 1)-row frame, so the
    # events subtree is computed once (no obs/perm re-computation)
    wall = Window.partitionBy()
    w = diffs.withColumn(
        "d_obs", F.max(F.when(F.col("r") == 0, F.col("d"))).over(wall)
    )
    perm = w.where(F.col("r") >= 1)
    stat_r, stat_obs = F.abs(F.col("d")), F.abs(F.col("d_obs"))
    n_ge = F.count(F.when(stat_r >= stat_obs, F.lit(1)))
    return perm.agg(
        F.coalesce(F.max("nu_r"), F.lit(0))
        .cast("long")
        .alias("n_users"),
        F.count("d").cast("long").alias("r_valid"),
        F.round(F.max("d_obs"), 6).alias("obs_diff"),
        n_ge.cast("long").alias("n_ge"),
        F.when(
            F.max(stat_obs).isNotNull(),
            F.round((1.0 + n_ge) / (1.0 + F.count("d")), 6),
        ).alias("p_value"),
    )


_fmt(q_permutation_test, PERM_R=PERM_R)


# ---------------------------------------------------------------------------
# cluster-robust standard errors + design effect — round 17
# ---------------------------------------------------------------------------
# q_ab_test randomizes USERS but its per-user metric collapses each
# cluster first; the complementary production hazard is the analyst
# who computes the naive per-EVENT z when the randomization unit is
# the user — events within a user correlate, the iid SE understates,
# and "significant" results evaporate on rerun. The standard readout
# is the one-way cluster-robust (Liang-Zeger) variance next to the
# naive one, and their ratio — the design effect — which quantifies
# exactly how wrong the naive analysis is.


def _register_cluster_se() -> None:
    from pyspark.sql import Window

    @query(
        "q_cluster_robust_se",
        oracle=f"""
        WITH per_user AS (
            SELECT {sql_portable_hash60(f"'{AB_SALT}:' || CAST(user_id AS VARCHAR)")}
                     % {AB_ARMS} AS arm,
                   user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_u,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(18,6))
                     AS s_u,
                   CAST(SUM(CAST(round(value * value, 12)
                                 AS DECIMAL(38,12))) AS DECIMAL(38,12))
                     AS ss_u
            FROM events GROUP BY arm, user_id
        ),
        tot AS (
            SELECT arm,
                   CAST(COUNT(*) AS BIGINT) AS g,
                   CAST(SUM(n_u) AS BIGINT) AS n,
                   CAST(SUM(s_u) AS DECIMAL(38,6)) AS s,
                   CAST(SUM(ss_u) AS DECIMAL(38,12)) AS ss,
                   -- the (19,6) cast forces DuckDB's hugeint multiply
                   -- path: two DECIMAL(18)s multiply on int64 mantissas
                   -- and overflow at |s_u| > ~3e3 of unscaled 9.2e18
                   CAST(SUM(CAST(s_u AS DECIMAL(19,6)) * s_u)
                        AS DECIMAL(38,12)) AS ss2,
                   CAST(SUM(CAST(n_u AS DECIMAL(19,0)) * s_u)
                        AS DECIMAL(38,6)) AS sns,
                   CAST(SUM(n_u * n_u) AS BIGINT) AS sn2
            FROM per_user GROUP BY arm
        ),
        se AS (
            SELECT arm, g, n,
                   CAST(CAST(s AS VARCHAR) AS DOUBLE) / n AS yb,
                   (CAST(CAST(ss AS VARCHAR) AS DOUBLE)
                    - CAST(CAST(s AS VARCHAR) AS DOUBLE)
                      * CAST(CAST(s AS VARCHAR) AS DOUBLE) / n)
                     / (n - 1) / n AS var_iid,
                   g / (g - 1.0)
                     * (CAST(CAST(ss2 AS VARCHAR) AS DOUBLE)
                        - 2.0 * (CAST(CAST(s AS VARCHAR) AS DOUBLE) / n)
                              * CAST(CAST(sns AS VARCHAR) AS DOUBLE)
                        + (CAST(CAST(s AS VARCHAR) AS DOUBLE) / n)
                          * (CAST(CAST(s AS VARCHAR) AS DOUBLE) / n)
                          * sn2)
                     / n / n AS var_cl
            FROM tot
        ),
        ok AS (
            SELECT * FROM se
            WHERE g >= 2 AND n >= 2 AND var_iid > 0 AND var_cl >= 0
        )
        SELECT CAST(arm AS INT) AS arm,
               n AS n_events,
               g AS n_clusters,
               round(yb, 6) AS mean,
               round(sqrt(var_iid), 6) AS se_iid,
               round(sqrt(var_cl), 6) AS se_cluster,
               round(var_cl / var_iid, 6) AS design_effect,
               round(MAX(CASE WHEN arm = 1 THEN yb END) OVER ()
                     - MAX(CASE WHEN arm = 0 THEN yb END) OVER (), 6)
                 AS diff,
               round(sqrt(MAX(CASE WHEN arm = 1 THEN var_cl END) OVER ()
                          + MAX(CASE WHEN arm = 0 THEN var_cl END) OVER ()),
                     6) AS se_diff_cluster,
               round((MAX(CASE WHEN arm = 1 THEN yb END) OVER ()
                      - MAX(CASE WHEN arm = 0 THEN yb END) OVER ())
                     / sqrt(MAX(CASE WHEN arm = 1 THEN var_cl END) OVER ()
                            + MAX(CASE WHEN arm = 0 THEN var_cl END) OVER ()),
                     6) AS z_cluster
        FROM ok ORDER BY arm
        """,
    )
    def q_cluster_robust_se(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-event A/B readout with honest uncertainty: users hash
        into arms (the randomization unit) but the metric is the raw
        per-EVENT value, so the naive iid SE is wrong whenever events
        correlate within a user. Reports, per arm: the event mean, the
        naive SE, the one-way cluster-robust (Liang-Zeger) SE, their
        ratio (the design effect, the factor the naive analysis is off
        by), and the cluster-robust z for the arm diff.

        The cluster deviation sum expands to sufficient statistics —
        sum_u (S_u - n_u*ybar)^2 = SS2 - 2*ybar*SNS + ybar^2*SN2 with
        SS2 = sum S_u^2, SNS = sum n_u*S_u, SN2 = sum n_u^2 — so the
        whole readout is ONE events scan into one per-(arm, user)
        aggregate and one |arms|-row fold: no join-back, no second
        scan (the naive composition recomputes the user frame because
        column pruning defeats exchange reuse across its two
        consumers). Arms with fewer than 2 clusters/events, zero iid
        variance, or a (float-cancellation) negative cluster variance
        are excluded by contract.

        Magnitude contract: per-user value sums must fit
        DECIMAL(18,6) (|sum| < 1e12) so their squares stay exact in
        DECIMAL(38,12) — holds with 1e5 headroom at the 10x-bench
        stress magnitude, documented like q_pacf's caps.

        Numerics: every cross-row sum (per-user sums, their exact
        decimal squares, per-event squares) folds exact decimals; all
        derived means/variances evaluate identical double trees
        (oracle decimal->double via VARCHAR — see q_cuped).

        Scale: one map-side-combined (arm, user) shuffle bounded by
        user cardinality, then a 2-row aggregate — strictly cheaper
        than the q_jackknife_ratio shape, nothing quadratic."""
        ev = read_table(spark, sf_dir, "events")
        arm = (
            portable_hash60(
                F.concat(
                    F.lit(f"{AB_SALT}:"), F.col("user_id").cast("string")
                )
            )
            % AB_ARMS
        )
        v = F.col("value")
        per_user = ev.groupBy(
            arm.alias("arm"), F.col("user_id")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_u"),
            F.sum(_d38(v)).cast("decimal(18,6)").alias("s_u"),
            F.sum(F.round(v * v, 12).cast("decimal(38,12)"))
            .cast("decimal(38,12)")
            .alias("ss_u"),
        )
        tot = per_user.groupBy("arm").agg(
            F.count(F.lit(1)).cast("long").alias("g"),
            F.sum("n_u").cast("long").alias("n"),
            F.sum("s_u").cast("decimal(38,6)").alias("s"),
            F.sum("ss_u").cast("decimal(38,12)").alias("ss"),
            F.sum(F.col("s_u") * F.col("s_u"))
            .cast("decimal(38,12)")
            .alias("ss2"),
            F.sum(F.col("n_u").cast("decimal(18,0)") * F.col("s_u"))
            .cast("decimal(38,6)")
            .alias("sns"),
            F.sum(F.col("n_u") * F.col("n_u")).cast("long").alias("sn2"),
        )
        g, n = F.col("g"), F.col("n")
        s_d = F.col("s").cast("double")
        ss_d = F.col("ss").cast("double")
        ss2_d = F.col("ss2").cast("double")
        sns_d = F.col("sns").cast("double")
        yb = s_d / n
        var_iid = (ss_d - s_d * s_d / n) / (n - 1) / n
        var_cl = (
            g
            / (g - 1.0)
            * (ss2_d - 2.0 * yb * sns_d + yb * yb * F.col("sn2"))
            / n
            / n
        )
        se = tot.select(
            "arm",
            "g",
            "n",
            yb.alias("yb"),
            var_iid.alias("var_iid"),
            var_cl.alias("var_cl"),
        ).where(
            (F.col("g") >= 2)
            & (F.col("n") >= 2)
            & (F.col("var_iid") > 0)
            & (F.col("var_cl") >= 0)
        )
        w = Window.partitionBy()
        yb1 = F.max(F.when(F.col("arm") == 1, F.col("yb"))).over(w)
        yb0 = F.max(F.when(F.col("arm") == 0, F.col("yb"))).over(w)
        vc1 = F.max(F.when(F.col("arm") == 1, F.col("var_cl"))).over(w)
        vc0 = F.max(F.when(F.col("arm") == 0, F.col("var_cl"))).over(w)
        return (
            se.select(
                F.col("arm").cast("int").alias("arm"),
                F.col("n").alias("n_events"),
                F.col("g").alias("n_clusters"),
                F.round("yb", 6).alias("mean"),
                F.round(F.sqrt("var_iid"), 6).alias("se_iid"),
                F.round(F.sqrt("var_cl"), 6).alias("se_cluster"),
                F.round(
                    F.col("var_cl") / F.col("var_iid"), 6
                ).alias("design_effect"),
                F.round(yb1 - yb0, 6).alias("diff"),
                F.round(F.sqrt(vc1 + vc0), 6).alias("se_diff_cluster"),
                F.round((yb1 - yb0) / F.sqrt(vc1 + vc0), 6).alias(
                    "z_cluster"
                ),
            )
            .orderBy("arm")
        )


_register_cluster_se()


# ---------------------------------------------------------------------------
# observational causal readouts: IPW + matched pairs — round 17
# ---------------------------------------------------------------------------
# q_standardization adjusts a LINEITEM confounder by direct
# standardization; the events-side observational questions ("does
# heavy erroring depress purchase value?") need the other two
# estimators every causal-inference text pairs with it: inverse-
# propensity weighting — whose real production value is the WEIGHT
# DIAGNOSTICS (effective sample size, max weight) that tell you when
# the adjustment is trustworthy — and matching, here the fully
# distributed variant: exact on the activity stratum, rank-nearest on
# the spend covariate within it (coarsened-exact + nearest matching,
# with replacement-free pairing by rank so the pair set is unique and
# deterministic on any engine/partitioning).

#: observational "treatment": a user with >= this many error events
#: (splits the per-user error distribution near its median at every
#: shipped sf — see TESTDATA.md).
TRT_ERR_MIN = 14

#: IPW activity-stratum width (total events // width); the propensity
#: model is stratum-saturated, so e(x) is exact within strata.
IPW_STRATUM_W = 10


def _register_ipw() -> None:
    from pyspark.sql import Window

    @query(
        "q_ipw_ate",
        oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_ev,
                   CASE WHEN COUNT(*) FILTER (WHERE event_type = 'error')
                             >= {TRT_ERR_MIN} THEN 1 ELSE 0 END AS t,
                   CAST(COALESCE(SUM(CAST(value AS DECIMAL(38,6)))
                                 FILTER (WHERE event_type = 'purchase'), 0)
                        AS DECIMAL(28,6)) AS y
            FROM events GROUP BY user_id
        ),
        s AS (
            SELECT CAST(n_ev // {IPW_STRATUM_W} AS BIGINT) AS stratum,
                   CAST(COUNT(*) AS BIGINT) AS n_s,
                   CAST(SUM(t) AS BIGINT) AS n_t,
                   CAST(COUNT(*) - SUM(t) AS BIGINT) AS n_c,
                   CAST(COALESCE(SUM(y) FILTER (WHERE t = 1), 0)
                        AS DECIMAL(38,6)) AS syt,
                   CAST(COALESCE(SUM(y) FILTER (WHERE t = 0), 0)
                        AS DECIMAL(38,6)) AS syc
            FROM per_user GROUP BY stratum
        ),
        naive AS (
            SELECT s.*,
                   CAST(SUM(n_t) OVER () AS BIGINT) AS nt_all,
                   CAST(SUM(n_c) OVER () AS BIGINT) AS nc_all,
                   CAST(CAST(SUM(syt) OVER () AS VARCHAR) AS DOUBLE)
                     AS syt_all,
                   CAST(CAST(SUM(syc) OVER () AS VARCHAR) AS DOUBLE)
                     AS syc_all,
                   CAST(SUM(CASE WHEN n_t = 0 OR n_c = 0 THEN 1 ELSE 0 END)
                        OVER () AS BIGINT) AS n_excluded
            FROM s
        ),
        inc AS (
            SELECT *,
                   CAST(n_t AS DOUBLE) / n_s AS e,
                   CAST(n_s AS DOUBLE) / n_t AS w_t,
                   CAST(n_s AS DOUBLE) / n_c AS w_c,
                   CAST(CAST(syt AS VARCHAR) AS DOUBLE) AS syt_d,
                   CAST(CAST(syc AS VARCHAR) AS DOUBLE) AS syc_d
            FROM naive WHERE n_t > 0 AND n_c > 0
        ),
        agg AS (
            SELECT inc.*,
                   CAST(SUM(n_s) OVER () AS BIGINT) AS n_inc,
                   CAST(CAST(SUM(CAST(round(syt_d * w_t, 6)
                                      AS DECIMAL(38,6))) OVER ()
                             AS VARCHAR) AS DOUBLE) AS num_t,
                   CAST(CAST(SUM(CAST(round(syc_d * w_c, 6)
                                      AS DECIMAL(38,6))) OVER ()
                             AS VARCHAR) AS DOUBLE) AS num_c,
                   CAST(CAST(SUM(CAST(round(n_t * w_t, 6)
                                      AS DECIMAL(38,6))) OVER ()
                             AS VARCHAR) AS DOUBLE) AS sw_t,
                   CAST(CAST(SUM(CAST(round(n_t * w_t * w_t, 6)
                                      AS DECIMAL(38,6))) OVER ()
                             AS VARCHAR) AS DOUBLE) AS sw2_t,
                   CAST(CAST(SUM(CAST(round(n_c * w_c, 6)
                                      AS DECIMAL(38,6))) OVER ()
                             AS VARCHAR) AS DOUBLE) AS sw_c,
                   CAST(CAST(SUM(CAST(round(n_c * w_c * w_c, 6)
                                      AS DECIMAL(38,6))) OVER ()
                             AS VARCHAR) AS DOUBLE) AS sw2_c,
                   MAX(GREATEST(w_t, w_c)) OVER () AS max_w
            FROM inc
        )
        SELECT stratum, n_s, n_t, n_c,
               round(e, 6) AS propensity,
               round(syt_d / n_t, 6) AS mean_t,
               round(syc_d / n_c, 6) AS mean_c,
               round(syt_d / n_t - syc_d / n_c, 6) AS stratum_effect,
               round(num_t / n_inc - num_c / n_inc, 6) AS ate_ipw,
               round(syt_all / nt_all - syc_all / nc_all, 6) AS naive_diff,
               round(sw_t * sw_t / sw2_t, 6) AS ess_treated,
               round(sw_c * sw_c / sw2_c, 6) AS ess_control,
               round(max_w, 6) AS max_weight,
               n_excluded AS n_excluded_strata
        FROM agg ORDER BY stratum
        """,
    )
    def q_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Inverse-propensity-weighted ATE of heavy erroring (>=
        {TRT_ERR_MIN} error events) on per-user purchase value, with
        the weight diagnostics that make IPW usable in production:
        the propensity is stratum-saturated on activity (total events
        // {IPW_STRATUM_W}), each unit weighs 1/e (treated) or 1/(1-e)
        (control), and the report carries per-stratum propensities and
        effects plus the Hajek-normalized ATE, the naive unadjusted
        diff, the effective sample size per group (ESS =
        (sum w)^2 / sum w^2 — how many iid units the weighted sample
        is worth), the max weight (the instability flag), and the
        count of strata excluded for lacking overlap (n_t = 0 or
        n_c = 0 — the positivity violation IPW cannot fix).

        With a stratum-saturated propensity the Hajek denominators
        collapse exactly (sum_s n_t,s/e_s = n_inc), so ate_ipw equals
        the direct-standardization estimate over the overlap strata —
        stated here so the q_standardization parallel is explicit;
        the diagnostics (ESS, max weight, exclusions) are what this
        query adds over it.

        Numerics: stratum cells are exact decimals; per-stratum
        weighted terms round to 6dp and fold as exact decimals across
        the |strata|-row frame (the q_standardization window
        discipline); oracle decimal->double casts route via VARCHAR.

        Scale: one per-user aggregate (map-side combined), one
        |strata|-row grouped aggregate, windows over |strata| rows —
        the events table is scanned exactly once."""
        ev = read_table(spark, sf_dir, "events")
        per_user = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_ev"),
            F.when(
                F.count(F.when(F.col("event_type") == "error", 1))
                >= TRT_ERR_MIN,
                1,
            )
            .otherwise(0)
            .alias("t"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        _d38(F.col("value")),
                    )
                ),
                F.lit(0),
            )
            .cast("decimal(28,6)")
            .alias("y"),
        )
        s = per_user.groupBy(
            (F.col("n_ev") / IPW_STRATUM_W)
            .cast("long")
            .alias("stratum")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_s"),
            F.sum("t").cast("long").alias("n_t"),
            (F.count(F.lit(1)) - F.sum("t")).cast("long").alias("n_c"),
            F.coalesce(
                F.sum(F.when(F.col("t") == 1, F.col("y"))), F.lit(0)
            )
            .cast("decimal(38,6)")
            .alias("syt"),
            F.coalesce(
                F.sum(F.when(F.col("t") == 0, F.col("y"))), F.lit(0)
            )
            .cast("decimal(38,6)")
            .alias("syc"),
        )
        wall = Window.partitionBy()
        naive = (
            s.withColumn(
                "nt_all", F.sum("n_t").over(wall).cast("long")
            )
            .withColumn("nc_all", F.sum("n_c").over(wall).cast("long"))
            .withColumn(
                "syt_all", F.sum("syt").over(wall).cast("double")
            )
            .withColumn(
                "syc_all", F.sum("syc").over(wall).cast("double")
            )
            .withColumn(
                "n_excluded",
                F.sum(
                    F.when(
                        (F.col("n_t") == 0) | (F.col("n_c") == 0), 1
                    ).otherwise(0)
                )
                .over(wall)
                .cast("long"),
            )
        )
        inc = (
            naive.where((F.col("n_t") > 0) & (F.col("n_c") > 0))
            .withColumn(
                "e", F.col("n_t").cast("double") / F.col("n_s")
            )
            .withColumn(
                "w_t", F.col("n_s").cast("double") / F.col("n_t")
            )
            .withColumn(
                "w_c", F.col("n_s").cast("double") / F.col("n_c")
            )
            .withColumn("syt_d", F.col("syt").cast("double"))
            .withColumn("syc_d", F.col("syc").cast("double"))
        )
        dec38 = "decimal(38,6)"

        def dsum(expr):
            return (
                F.sum(F.round(expr, 6).cast(dec38))
                .over(wall)
                .cast("double")
            )

        agg = (
            inc.withColumn(
                "n_inc", F.sum("n_s").over(wall).cast("long")
            )
            .withColumn("num_t", dsum(F.col("syt_d") * F.col("w_t")))
            .withColumn("num_c", dsum(F.col("syc_d") * F.col("w_c")))
            .withColumn("sw_t", dsum(F.col("n_t") * F.col("w_t")))
            .withColumn(
                "sw2_t",
                dsum(F.col("n_t") * F.col("w_t") * F.col("w_t")),
            )
            .withColumn("sw_c", dsum(F.col("n_c") * F.col("w_c")))
            .withColumn(
                "sw2_c",
                dsum(F.col("n_c") * F.col("w_c") * F.col("w_c")),
            )
            .withColumn(
                "max_w",
                F.max(F.greatest("w_t", "w_c")).over(wall),
            )
        )
        return agg.select(
            "stratum",
            "n_s",
            "n_t",
            "n_c",
            F.round("e", 6).alias("propensity"),
            F.round(F.col("syt_d") / F.col("n_t"), 6).alias("mean_t"),
            F.round(F.col("syc_d") / F.col("n_c"), 6).alias("mean_c"),
            F.round(
                F.col("syt_d") / F.col("n_t")
                - F.col("syc_d") / F.col("n_c"),
                6,
            ).alias("stratum_effect"),
            F.round(
                F.col("num_t") / F.col("n_inc")
                - F.col("num_c") / F.col("n_inc"),
                6,
            ).alias("ate_ipw"),
            F.round(
                F.col("syt_all") / F.col("nt_all")
                - F.col("syc_all") / F.col("nc_all"),
                6,
            ).alias("naive_diff"),
            F.round(
                F.col("sw_t") * F.col("sw_t") / F.col("sw2_t"), 6
            ).alias("ess_treated"),
            F.round(
                F.col("sw_c") * F.col("sw_c") / F.col("sw2_c"), 6
            ).alias("ess_control"),
            F.round("max_w", 6).alias("max_weight"),
            F.col("n_excluded").alias("n_excluded_strata"),
        ).orderBy("stratum")


_register_ipw()


def _register_matched_pairs() -> None:
    from pyspark.sql import Window

    @query(
        "q_matched_pairs",
        oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_ev,
                   CASE WHEN COUNT(*) FILTER (WHERE event_type = 'error')
                             >= {TRT_ERR_MIN} THEN 1 ELSE 0 END AS t,
                   -- COALESCE: an all-NULL value column must not leave
                   -- x NULL — the engines' NULL-ordering defaults
                   -- differ (Spark NULLS FIRST, DuckDB NULLS LAST) and
                   -- x orders the rank matching
                   CAST(COALESCE(SUM(CAST(value AS DECIMAL(38,6))), 0)
                        AS DECIMAL(28,6)) AS x,
                   CAST(COALESCE(SUM(CAST(value AS DECIMAL(38,6)))
                                 FILTER (WHERE event_type = 'purchase'), 0)
                        AS DECIMAL(28,6)) AS y
            FROM events GROUP BY user_id
        ),
        ranked AS (
            SELECT *,
                   ROW_NUMBER() OVER (PARTITION BY n_ev, t
                                      ORDER BY x, user_id) AS rn
            FROM per_user
        ),
        pairs AS (
            SELECT tr.n_ev AS stratum,
                   CAST(tr.y - ct.y AS DECIMAL(29,6)) AS dy,
                   CAST(abs(tr.x - ct.x) AS DECIMAL(29,6)) AS adx
            FROM ranked tr JOIN ranked ct
              ON tr.n_ev = ct.n_ev AND tr.rn = ct.rn
            WHERE tr.t = 1 AND ct.t = 0
        ),
        pagg AS (
            SELECT stratum,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(dy) AS DECIMAL(38,6)) AS sdy,
                   CAST(SUM(adx) AS DECIMAL(38,6)) AS sadx
            FROM pairs GROUP BY stratum
        ),
        cells AS (
            SELECT n_ev AS stratum,
                   CAST(SUM(t) AS BIGINT) AS n_t,
                   CAST(COUNT(*) - SUM(t) AS BIGINT) AS n_c
            FROM per_user GROUP BY n_ev
        ),
        joined AS (
            SELECT c.stratum, c.n_t, c.n_c,
                   COALESCE(p.n_pairs, 0) AS n_pairs,
                   p.sdy, p.sadx
            FROM cells c LEFT JOIN pagg p USING (stratum)
        ),
        win AS (
            SELECT joined.*,
                   CAST(SUM(n_pairs) OVER () AS BIGINT) AS pairs_total,
                   CAST(SUM(n_t) OVER () - SUM(n_pairs) OVER ()
                        AS BIGINT) AS unmatched_treated,
                   CAST(CAST(SUM(sdy) OVER () AS VARCHAR) AS DOUBLE)
                     AS sdy_all,
                   CAST(CAST(SUM(sadx) OVER () AS VARCHAR) AS DOUBLE)
                     AS sadx_all
            FROM joined
        )
        SELECT stratum, n_t, n_c, n_pairs,
               round(CAST(CAST(sdy AS VARCHAR) AS DOUBLE) / n_pairs, 6)
                 AS mean_pair_diff,
               round(CAST(CAST(sadx AS VARCHAR) AS DOUBLE) / n_pairs, 6)
                 AS mean_abs_dx,
               round(sdy_all / pairs_total, 6) AS att,
               round(sadx_all / pairs_total, 6) AS balance_abs_dx,
               pairs_total AS n_pairs_total,
               unmatched_treated AS n_unmatched_treated
        FROM win WHERE n_pairs > 0 ORDER BY stratum
        """,
    )
    def q_matched_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Matched-pairs ATT of heavy erroring (>= {TRT_ERR_MIN} error
        events) on purchase value: exact matching on the activity
        stratum (total event count) plus rank-nearest matching on
        total spend within it — the i-th-lowest-spend treated user
        pairs with the i-th-lowest-spend control of the SAME activity
        level, so the pair set is unique, replacement-free, and
        deterministic under any partitioning (the distributed answer
        to greedy nearest-neighbor matching, whose sequential
        with-replacement scan does not parallelize). Reports per
        stratum the pair count and mean within-pair outcome diff, and
        overall the ATT, the achieved covariate balance (mean |x_t -
        x_c| across pairs), the total pairs, and the treated units no
        control could absorb.

        Numerics: pair diffs are exact decimals end-to-end (the only
        doubles are final per-row divisions, identical trees both
        engines; oracle decimal->double via VARCHAR).

        Scale: one per-user aggregate, two ROW_NUMBER windows
        partitioned by (stratum, arm) — thousands of independent
        partitions, no global sort — and an equi-join on (stratum,
        rank); every stage is a bounded shuffle on user cardinality."""
        ev = read_table(spark, sf_dir, "events")
        per_user = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_ev"),
            F.when(
                F.count(F.when(F.col("event_type") == "error", 1))
                >= TRT_ERR_MIN,
                1,
            )
            .otherwise(0)
            .alias("t"),
            # COALESCE mirror of the oracle: see the NULL-ordering note
            F.coalesce(F.sum(_d38(F.col("value"))), F.lit(0))
            .cast("decimal(28,6)")
            .alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        _d38(F.col("value")),
                    )
                ),
                F.lit(0),
            )
            .cast("decimal(28,6)")
            .alias("y"),
        )
        rw = Window.partitionBy("n_ev", "t").orderBy("x", "user_id")
        ranked = per_user.withColumn("rn", F.row_number().over(rw))
        tr = ranked.where(F.col("t") == 1).select(
            F.col("n_ev").alias("stratum"),
            F.col("rn"),
            F.col("x").alias("x_t"),
            F.col("y").alias("y_t"),
        )
        ct = ranked.where(F.col("t") == 0).select(
            F.col("n_ev").alias("stratum"),
            F.col("rn"),
            F.col("x").alias("x_c"),
            F.col("y").alias("y_c"),
        )
        pairs = tr.join(ct, ["stratum", "rn"]).select(
            "stratum",
            (F.col("y_t") - F.col("y_c"))
            .cast("decimal(29,6)")
            .alias("dy"),
            F.abs(F.col("x_t") - F.col("x_c"))
            .cast("decimal(29,6)")
            .alias("adx"),
        )
        pagg = pairs.groupBy("stratum").agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("dy").cast("decimal(38,6)").alias("sdy"),
            F.sum("adx").cast("decimal(38,6)").alias("sadx"),
        )
        cells = per_user.groupBy(
            F.col("n_ev").alias("stratum")
        ).agg(
            F.sum("t").cast("long").alias("n_t"),
            (F.count(F.lit(1)) - F.sum("t")).cast("long").alias("n_c"),
        )
        joined = cells.join(pagg, "stratum", "left").withColumn(
            "n_pairs", F.coalesce(F.col("n_pairs"), F.lit(0))
        )
        wall = Window.partitionBy()
        win = (
            joined.withColumn(
                "pairs_total",
                F.sum("n_pairs").over(wall).cast("long"),
            )
            .withColumn(
                "unmatched_treated",
                (
                    F.sum("n_t").over(wall)
                    - F.sum("n_pairs").over(wall)
                ).cast("long"),
            )
            .withColumn(
                "sdy_all", F.sum("sdy").over(wall).cast("double")
            )
            .withColumn(
                "sadx_all", F.sum("sadx").over(wall).cast("double")
            )
        )
        return (
            win.where(F.col("n_pairs") > 0)
            .select(
                "stratum",
                "n_t",
                "n_c",
                "n_pairs",
                F.round(
                    F.col("sdy").cast("double") / F.col("n_pairs"), 6
                ).alias("mean_pair_diff"),
                F.round(
                    F.col("sadx").cast("double") / F.col("n_pairs"), 6
                ).alias("mean_abs_dx"),
                F.round(
                    F.col("sdy_all") / F.col("pairs_total"), 6
                ).alias("att"),
                F.round(
                    F.col("sadx_all") / F.col("pairs_total"), 6
                ).alias("balance_abs_dx"),
                F.col("pairs_total").alias("n_pairs_total"),
                F.col("unmatched_treated").alias(
                    "n_unmatched_treated"
                ),
            )
            .orderBy("stratum")
        )


_register_matched_pairs()


# ---------------------------------------------------------------------------
# regression discontinuity — round 17
# ---------------------------------------------------------------------------
# The fourth classical identification design, completing the causal
# shelf (randomized: q_ab_test/q_cluster_robust_se; observational:
# q_standardization/q_ipw_ate/q_matched_pairs; time: q_diff_in_diff):
# when a rule assigns treatment by a CUTOFF on a running variable,
# the jump in the outcome at the cutoff is the effect. The estimator
# is two local linear fits (one per side, within a bandwidth), each a
# closed-form OLS from exact-decimal power sums — q_linreg_train's
# shape — evaluated AT the cutoff by centering the running variable.

#: RD cutoff on the running variable (per-user total event count) —
#: the median activity at every shipped sf (TESTDATA.md).
RD_CUTOFF = 66

#: local-linear bandwidth: users with |n_ev - cutoff| < RD_BANDWIDTH
RD_BANDWIDTH = 20


def _register_rdd() -> None:
    from pyspark.sql import Window

    @query(
        "q_regression_discontinuity",
        oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_ev,
                   CAST(COALESCE(SUM(CAST(value AS DECIMAL(38,6)))
                                 FILTER (WHERE event_type = 'purchase'), 0)
                        AS DECIMAL(18,6)) AS y
            FROM events GROUP BY user_id
        ),
        band AS (
            SELECT CASE WHEN n_ev >= {RD_CUTOFF} THEN 'right'
                        ELSE 'left' END AS side,
                   CAST(n_ev - {RD_CUTOFF} AS BIGINT) AS x,
                   y
            FROM per_user
            WHERE n_ev >= {RD_CUTOFF - RD_BANDWIDTH}
              AND n_ev <  {RD_CUTOFF + RD_BANDWIDTH}
        ),
        sums AS (
            SELECT side,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                   CAST(CAST(CAST(SUM(y) AS DECIMAL(38,6)) AS VARCHAR)
                        AS DOUBLE) AS sy,
                   CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
                   -- (19,6): force DuckDB's hugeint multiply path (two
                   -- DECIMAL(18)s multiply on int64 mantissas — see
                   -- q_cluster_robust_se)
                   CAST(CAST(CAST(SUM(CAST(y AS DECIMAL(19,6)) * y)
                                  AS DECIMAL(38,12)) AS VARCHAR)
                        AS DOUBLE) AS syy,
                   CAST(CAST(CAST(SUM(CAST(x AS DECIMAL(19,0)) * y)
                                  AS DECIMAL(38,6)) AS VARCHAR)
                        AS DOUBLE) AS sxy
            FROM band GROUP BY side
        ),
        fit AS (
            SELECT side, n, sx, sy, sxx, syy, sxy,
                   (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
            FROM sums
            WHERE n >= 2 AND n * sxx - sx * sx != 0
              AND n * syy - sy * sy != 0
        )
        SELECT side,
               n,
               round(slope, 6) AS slope,
               round((sy - slope * sx) / n, 6) AS value_at_cutoff,
               round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                 AS r2,
               round(MAX(CASE WHEN side = 'right'
                              THEN (sy - slope * sx) / n END) OVER ()
                     - MAX(CASE WHEN side = 'left'
                                THEN (sy - slope * sx) / n END) OVER (),
                     6) AS rd_jump
        FROM fit ORDER BY side
        """,
    )
    def q_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Sharp regression-discontinuity readout: per-user purchase
        value against the activity running variable (total events,
        cutoff {RD_CUTOFF}, bandwidth {RD_BANDWIDTH}) — one local
        linear fit per side from exact-decimal power sums (the
        q_linreg_train closed form), the running variable centered at
        the cutoff so each intercept IS the side's value at the
        threshold, and the RD effect is their jump. Degenerate sides
        (<2 users, zero x or y variance) are excluded by the
        q_linreg_train contract.

        Magnitude contract: per-user purchase sums fit DECIMAL(18,6)
        (|sum| < 1e12) so y*y stays exact in DECIMAL(38,12) — the
        q_cluster_robust_se cap.

        Numerics: six power sums per side fold exact decimals;
        slope/intercept/r2 evaluate identical double trees (oracle
        decimal->double via VARCHAR); the jump is a window over the
        2-row fit frame.

        Scale: one per-user aggregate with the band filter pushed into
        it, then a 2-row fold — the q_linreg_train cost exactly."""
        ev = read_table(spark, sf_dir, "events")
        per_user = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_ev"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        _d38(F.col("value")),
                    )
                ),
                F.lit(0),
            )
            .cast("decimal(18,6)")
            .alias("y"),
        )
        band = per_user.where(
            (F.col("n_ev") >= RD_CUTOFF - RD_BANDWIDTH)
            & (F.col("n_ev") < RD_CUTOFF + RD_BANDWIDTH)
        ).select(
            F.when(F.col("n_ev") >= RD_CUTOFF, F.lit("right"))
            .otherwise(F.lit("left"))
            .alias("side"),
            (F.col("n_ev") - RD_CUTOFF).cast("long").alias("x"),
            "y",
        )
        x, y = F.col("x"), F.col("y")
        sums = band.groupBy("side").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(_d38(x)).cast("double").alias("sx"),
            F.sum(y).cast("decimal(38,6)").cast("double").alias("sy"),
            F.sum(_d38(x * x)).cast("double").alias("sxx"),
            F.sum(y * y).cast("decimal(38,12)").cast("double").alias("syy"),
            F.sum(x.cast("decimal(18,0)") * y)
            .cast("decimal(38,6)")
            .cast("double")
            .alias("sxy"),
        )
        n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
        sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        fit = sums.where(
            (n >= 2)
            & (n * sxx - sx * sx != 0)
            & (n * syy - sy * sy != 0)
        ).withColumn("slope", slope)
        icpt = (F.col("sy") - F.col("slope") * F.col("sx")) / F.col("n")
        w = Window.partitionBy()
        jump = F.max(
            F.when(F.col("side") == "right", icpt)
        ).over(w) - F.max(F.when(F.col("side") == "left", icpt)).over(w)
        return (
            fit.select(
                "side",
                "n",
                F.round("slope", 6).alias("slope"),
                F.round(icpt, 6).alias("value_at_cutoff"),
                F.round(
                    (n * sxy - sx * sy)
                    * (n * sxy - sx * sy)
                    / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
                    6,
                ).alias("r2"),
                F.round(jump, 6).alias("rd_jump"),
            )
            .orderBy("side")
        )


_register_rdd()


# ---------------------------------------------------------------------------
# raking (iterative proportional fitting) — round 17
# ---------------------------------------------------------------------------
# Survey-weighting's workhorse: a half-sample of events (portable-hash
# selected, so the "sample" is reproducible on any engine) is
# calibrated so its weighted (event_type x day) cells match the FULL
# population's row and column margins — the estimator every panel /
# survey pipeline applies before reading means off a biased sample.
# IPF is iterative, but the iterations run on the tiny CELL frame
# (|types| x 7 rows), so the loop is a fixed chain of window steps —
# the data-sized work is two grouped aggregates.

#: raking sample salt (hash-selected half of events)
RAKE_SALT = "rake-events-v1"

#: fixed IPF iterations (each = one row step + one column step)
RAKE_ITERS = 4

#: the margin-sum fold: round to 9dp, sum as exact decimals (window
#: float sums are order-dependent across engines), read back as double
#: (VARCHAR-routed in the oracle)
_RAKE_DSUM_SQL = (
    "CAST(CAST(SUM(CAST(round(w * n_s, 9) AS DECIMAL(38,9)))"
    " OVER (PARTITION BY {key}) AS VARCHAR) AS DOUBLE)"
)


def _rake_oracle() -> str:
    layers = []
    prev = "base"
    for i in range(RAKE_ITERS):
        for key in ("event_type", "dow"):
            tgt = "row_target" if key == "event_type" else "col_target"
            name = f"it{len(layers)}"
            layers.append(
                f"{name} AS MATERIALIZED (\n"
                f"  SELECT event_type, dow, n_s, row_target, col_target,\n"
                f"         w * ({tgt} / {_RAKE_DSUM_SQL.format(key=key)})"
                f" AS w\n"
                f"  FROM {prev}\n)"
            )
            prev = name
    chain = ",\n".join(layers)
    return f"""
    WITH cells AS MATERIALIZED (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7 AS dow,
               CAST(COUNT(*) AS BIGINT) AS n_s
        FROM events
        WHERE {sql_portable_hash60(f"'{RAKE_SALT}:' || CAST(event_id AS VARCHAR)")}
              % 2 = 0
        GROUP BY 1, 2
    ),
    rowm AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS row_target
        FROM events GROUP BY 1
    ),
    colm AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7 AS dow,
               CAST(COUNT(*) AS BIGINT) AS col_target
        FROM events GROUP BY 1
    ),
    base AS MATERIALIZED (
        SELECT c.event_type, c.dow, c.n_s,
               r.row_target, m.col_target, 1.0 AS w
        FROM cells c
        JOIN rowm r USING (event_type)
        JOIN colm m USING (dow)
    ),
    {chain},
    err AS MATERIALIZED (
        SELECT f.*,
               abs({_RAKE_DSUM_SQL.format(key="event_type")} - row_target)
                 / row_target AS row_err,
               abs({_RAKE_DSUM_SQL.format(key="dow")} - col_target)
                 / col_target AS col_err
        FROM {prev} f
    )
    SELECT event_type, dow, n_s,
           round(w, 6) AS weight,
           round(w * n_s, 6) AS calibrated,
           round(MAX(row_err) OVER (), 9) AS max_row_err,
           round(MAX(col_err) OVER (), 9) AS max_col_err
    FROM err ORDER BY event_type, dow
    """


def _register_raking() -> None:
    from pyspark.sql import Window

    @query("q_raking", oracle=_rake_oracle())
    def q_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Raking (iterative proportional fitting): a hash-selected
        half-sample's (event_type x day-of-epoch-week) cells are
        reweighted in {RAKE_ITERS} fixed row/column sweeps until the
        weighted cells reproduce the FULL population's margins — the
        survey-calibration estimator, with the residual margin errors
        published so convergence is visible (not asserted). Weights
        start at 1; every margin sum folds exact decimals of 9dp-
        rounded terms (window float sums are order-dependent across
        engines); all factors evaluate identical double trees (oracle
        decimal->double via VARCHAR). The day key is
        floor(epoch/86400) % 7 — integer-exact on both engines (the
        engines' dayofweek() conventions differ).

        Degenerate sampling (a margin entirely absent from the sample)
        drops those cells via the inner join to observed cells — the
        no-support contract, mirrored exactly in the oracle.

        Scale: two grouped aggregates over events (sample cells, full
        margins); the {RAKE_ITERS}x2 IPF sweeps are window steps over
        the |types| x 7 CELL frame — iteration never touches data."""
        ev = read_table(spark, sf_dir, "events")
        dow = (
            F.floor(
                F.unix_timestamp(F.col("ts").cast("timestamp")) / 86400
            ).cast("long")
            % 7
        ).alias("dow")
        in_sample = (
            portable_hash60(
                F.concat(
                    F.lit(f"{RAKE_SALT}:"),
                    F.col("event_id").cast("string"),
                )
            )
            % 2
            == 0
        )
        cells = (
            ev.where(in_sample)
            .groupBy("event_type", dow)
            .agg(F.count(F.lit(1)).cast("long").alias("n_s"))
        )
        rowm = ev.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("row_target")
        )
        colm = ev.groupBy(dow).agg(
            F.count(F.lit(1)).cast("long").alias("col_target")
        )
        base = (
            cells.join(F.broadcast(rowm), "event_type")
            .join(F.broadcast(colm), "dow")
            .withColumn("w", F.lit(1.0))
        )
        wt = Window.partitionBy("event_type")
        wd = Window.partitionBy("dow")

        def dsum(win):
            return (
                F.sum(
                    F.round(F.col("w") * F.col("n_s"), 9).cast(
                        "decimal(38,9)"
                    )
                )
                .over(win)
                .cast("double")
            )

        cur = base
        for _ in range(RAKE_ITERS):
            cur = cur.withColumn(
                "w", F.col("w") * (F.col("row_target") / dsum(wt))
            )
            cur = cur.withColumn(
                "w", F.col("w") * (F.col("col_target") / dsum(wd))
            )
        wall = Window.partitionBy()
        err = cur.withColumn(
            "row_err",
            F.abs(dsum(wt) - F.col("row_target")) / F.col("row_target"),
        ).withColumn(
            "col_err",
            F.abs(dsum(wd) - F.col("col_target")) / F.col("col_target"),
        )
        return err.select(
            "event_type",
            "dow",
            "n_s",
            F.round("w", 6).alias("weight"),
            F.round(F.col("w") * F.col("n_s"), 6).alias("calibrated"),
            F.round(F.max("row_err").over(wall), 9).alias("max_row_err"),
            F.round(F.max("col_err").over(wall), 9).alias("max_col_err"),
        ).orderBy("event_type", "dow")


_register_raking()


# ---------------------------------------------------------------------------
# quantile treatment effects — round 17
# ---------------------------------------------------------------------------
# Mean effects (q_ab_test) hide heterogeneity: an arm that lifts the
# p90 while flattening the median shows a fuzzy average. The
# distributional readout is the quantile treatment effect — per tau,
# the difference of the arms' EXACT per-user-metric quantiles. Exact
# order statistics at scale reuse q_two_sample_ks's two-level
# cumulative decomposition (per-value counts -> in-bucket windows ->
# bucket-offset stitch; no global sort), and every rank is integer
# arithmetic: rank(tau) = ceil(num*n/den) = (num*n + den - 1) // den,
# so there is no float tau anywhere.

#: QTE quantile grid as exact rationals (num, den)
QTE_TAUS = ((1, 4), (1, 2), (3, 4), (9, 10))

#: value-bucket width for the two-level cumulative (per-user totals
#: land in the low thousands at every shipped sf)
QTE_BUCKET = 100


def _register_qte() -> None:
    from pyspark.sql import Window

    @query(
        "q_quantile_treatment_effect",
        oracle=f"""
        WITH per_user AS (
            SELECT {sql_portable_hash60(f"'{AB_SALT}:' || CAST(user_id AS VARCHAR)")}
                     % {AB_ARMS} AS arm,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(28,6))
                     AS metric
            FROM events GROUP BY arm, user_id
        ),
        pts AS (
            SELECT metric,
                   CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS ca,
                   CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS cb
            FROM per_user WHERE metric IS NOT NULL GROUP BY metric
        ),
        cum AS (
            SELECT metric,
                   SUM(ca) OVER (ORDER BY metric
                                 ROWS UNBOUNDED PRECEDING) AS cuma,
                   SUM(cb) OVER (ORDER BY metric
                                 ROWS UNBOUNDED PRECEDING) AS cumb,
                   SUM(ca) OVER () AS n_a,
                   SUM(cb) OVER () AS n_b
            FROM pts
        ),
        taus(num, den) AS (VALUES {", ".join(f"({n}, {d})" for n, d in QTE_TAUS)})
        SELECT round(CAST(t.num AS DOUBLE) / t.den, 2) AS tau,
               CAST(MAX(n_a) AS BIGINT) AS n_a,
               CAST(MAX(n_b) AS BIGINT) AS n_b,
               round(CAST(CAST(MIN(CASE WHEN cuma >=
                       (t.num * n_a + t.den - 1) // t.den THEN metric END)
                     AS VARCHAR) AS DOUBLE), 6) AS q_a,
               round(CAST(CAST(MIN(CASE WHEN cumb >=
                       (t.num * n_b + t.den - 1) // t.den THEN metric END)
                     AS VARCHAR) AS DOUBLE), 6) AS q_b,
               round(CAST(CAST(
                     MIN(CASE WHEN cumb >=
                       (t.num * n_b + t.den - 1) // t.den THEN metric END)
                     - MIN(CASE WHEN cuma >=
                       (t.num * n_a + t.den - 1) // t.den THEN metric END)
                     AS VARCHAR) AS DOUBLE), 6) AS qte
        FROM cum CROSS JOIN taus t
        GROUP BY t.num, t.den ORDER BY tau
        """,
    )
    def q_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Quantile treatment effects between the q_ab_test hash arms:
        for each tau in {{1/4, 1/2, 3/4, 9/10}}, the EXACT type-1
        quantile of the per-user total-value metric in each arm (the
        value at integer rank ceil(num*n/den) — no float tau, no
        interpolation) and their difference — the distributional
        readout that tells p90 lifts from median flattening where the
        mean effect shows only a blur.

        Exactness across engines: quantile values are the exact
        decimal metrics themselves; ranks are pure integer arithmetic
        ((num*n + den - 1) // den); the only doubles are the final
        rounded outputs (oracle decimal->double via VARCHAR).

        Scale: q_two_sample_ks's two-level cumulative shape — one
        shuffle to per-metric counts (map-side combined), windows
        inside {QTE_BUCKET}-wide value buckets, a bucket-offset frame
        stitch, then a x{len(QTE_TAUS)} tau explode on the counts
        frame folding to {len(QTE_TAUS)} rows. No global sort; the
        oracle's flat window is the semantic spec, not the plan."""
        ev = read_table(spark, sf_dir, "events")
        arm = (
            portable_hash60(
                F.concat(
                    F.lit(f"{AB_SALT}:"), F.col("user_id").cast("string")
                )
            )
            % AB_ARMS
        )
        per_user = ev.groupBy(arm.alias("arm"), F.col("user_id")).agg(
            F.sum(_d38(F.col("value"))).cast("decimal(28,6)").alias("metric")
        )
        pts = (
            per_user.where(F.col("metric").isNotNull())
            .groupBy("metric")
            .agg(
                F.count(F.when(F.col("arm") == 0, 1))
                .cast("long")
                .alias("ca"),
                F.count(F.when(F.col("arm") == 1, 1))
                .cast("long")
                .alias("cb"),
            )
            .withColumn(
                "b", F.floor(F.col("metric") / QTE_BUCKET).cast("long")
            )
        )
        bsum = pts.groupBy("b").agg(
            F.sum("ca").cast("long").alias("ba"),
            F.sum("cb").cast("long").alias("bb"),
        )
        woff = Window.orderBy("b").rowsBetween(
            Window.unboundedPreceding, -1
        )
        wall = Window.partitionBy()
        offs = bsum.select(
            "b",
            F.coalesce(F.sum("ba").over(woff), F.lit(0))
            .cast("long")
            .alias("offa"),
            F.coalesce(F.sum("bb").over(woff), F.lit(0))
            .cast("long")
            .alias("offb"),
            F.sum("ba").over(wall).cast("long").alias("n_a"),
            F.sum("bb").over(wall).cast("long").alias("n_b"),
        )
        wb = (
            Window.partitionBy("b")
            .orderBy("metric")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = pts.join(offs, "b").select(
            "metric",
            "n_a",
            "n_b",
            (F.col("offa") + F.sum("ca").over(wb)).alias("cuma"),
            (F.col("offb") + F.sum("cb").over(wb)).alias("cumb"),
        )
        taus = F.array(
            *[
                F.struct(
                    F.lit(n).alias("num"), F.lit(d).alias("den")
                )
                for n, d in QTE_TAUS
            ]
        )
        ex = cum.withColumn("t", F.explode(taus))
        num, den = F.col("t.num"), F.col("t.den")
        # integer ceil-division: (num*n + den - 1) // den on bigints
        ra = F.floor((num * F.col("n_a") + den - 1) / den).cast("long")
        rb = F.floor((num * F.col("n_b") + den - 1) / den).cast("long")
        qa = F.min(F.when(F.col("cuma") >= ra, F.col("metric")))
        qb = F.min(F.when(F.col("cumb") >= rb, F.col("metric")))
        return (
            ex.groupBy(num.alias("num"), den.alias("den"))
            .agg(
                F.max("n_a").alias("n_a"),
                F.max("n_b").alias("n_b"),
                F.round(qa.cast("double"), 6).alias("q_a"),
                F.round(qb.cast("double"), 6).alias("q_b"),
                F.round((qb - qa).cast("double"), 6).alias("qte"),
            )
            .select(
                F.round(
                    F.col("num").cast("double") / F.col("den"), 2
                ).alias("tau"),
                "n_a",
                "n_b",
                "q_a",
                "q_b",
                "qte",
            )
            .orderBy("tau")
        )


_register_qte()
