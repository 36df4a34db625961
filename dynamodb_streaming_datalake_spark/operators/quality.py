"""Data-quality constraint checking (dbt-test / Deequ-style) in one
declarative pass per table.

A lake that ingests CDC (SURVEY §2 A3-A9) needs continuous constraint
verification: primary-key uniqueness, foreign-key containment,
null-rate budgets, and domain ranges. Each check is expressed as an
aggregate or broadcast anti-join and unioned into one typed report —
the shape monitoring systems ingest.

Scale: every check is a partial+final aggregate (count of violations),
so the report costs one scan per table plus broadcast-sized key
anti-joins for the FK checks — never a wide shuffle. At 100 TB checks
fuse into scans already running (observe-don't-rescan), which this
plan shape permits: each CTE is independent and pipelines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table


def pk_unique(df: DataFrame, table: str, key: str) -> DataFrame:
    """One scan: per-key counts, then both report numbers from the
    SAME grouped frame (row total = sum of counts; violations = keys
    appearing more than once)."""
    g = df.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
    return g.agg(
        F.sum("c").alias("n_checked"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_violations"),
    ).select(
        F.lit("pk_unique").alias("check_name"),
        F.lit(table).alias("table_name"),
        "n_checked",
        "n_violations",
    )


def fk_contained(
    child: DataFrame, child_key: str, parent: DataFrame,
    parent_key: str, check: str, table: str,
) -> DataFrame:
    """One scan of the child: left-join the (deduplicated) parent key
    set and count rows + unmatched rows in a single aggregate."""
    pk = parent.select(parent_key).distinct()
    joined = child.select(child_key).join(
        pk, child[child_key] == pk[parent_key], "left"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.when(pk[parent_key].isNull(), 1).otherwise(0)).alias(
            "n_violations"
        ),
    ).select(
        F.lit(check).alias("check_name"),
        F.lit(table).alias("table_name"),
        "n_checked",
        "n_violations",
    )


def predicate(
    df: DataFrame, bad, check: str, table: str
) -> DataFrame:
    return df.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("n_violations"),
    ).select(
        F.lit(check).alias("check_name"),
        F.lit(table).alias("table_name"),
        "n_checked",
        "n_violations",
    )


@query(
    "q_data_quality_report",
    oracle="""
    SELECT * FROM (
        SELECT 'pk_unique' AS check_name, 'customer' AS table_name,
               (SELECT COUNT(*) FROM customer) AS n_checked,
               (SELECT COUNT(*) FROM
                  (SELECT c_custkey FROM customer GROUP BY c_custkey
                   HAVING COUNT(*) > 1)) AS n_violations
        UNION ALL
        SELECT 'pk_unique', 'orders',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM
                  (SELECT o_orderkey FROM orders GROUP BY o_orderkey
                   HAVING COUNT(*) > 1))
        UNION ALL
        SELECT 'fk_orders_customer', 'orders',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'fk_lineitem_orders', 'lineitem',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'not_null_text', 'documents',
               (SELECT COUNT(*) FROM documents),
               (SELECT COUNT(*) FROM documents
                WHERE text IS NULL OR len(text) = 0)
        UNION ALL
        SELECT 'value_non_negative', 'events',
               (SELECT COUNT(*) FROM events),
               (SELECT COUNT(*) FROM events WHERE value < 0)
        UNION ALL
        SELECT 'quantity_domain', 'lineitem',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem
                WHERE l_quantity < 1 OR l_quantity > 50)
    ) ORDER BY check_name, table_name
    """,
)
def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven constraint checks over five tables as one typed report:
    PK uniqueness (grouped HAVING), FK containment (broadcast
    anti-joins — the EXISTS twin), not-null/non-empty budgets, and
    numeric domain ranges. Violation counts are exact integers, so the
    report hash-matches the oracle's correlated-subquery formulation.
    """
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    docs = read_table(spark, sf_dir, "documents")
    ev = read_table(spark, sf_dir, "events")

    parts = [
        pk_unique(cust, "customer", "c_custkey"),
        pk_unique(orders, "orders", "o_orderkey"),
        fk_contained(
            orders, "o_custkey", cust, "c_custkey",
            "fk_orders_customer", "orders",
        ),
        fk_contained(
            li, "l_orderkey", orders, "o_orderkey",
            "fk_lineitem_orders", "lineitem",
        ),
        predicate(
            docs,
            F.col("text").isNull() | (F.length("text") == 0),
            "not_null_text",
            "documents",
        ),
        predicate(ev, F.col("value") < 0, "value_non_negative", "events"),
        predicate(
            li,
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            "quantity_domain",
            "lineitem",
        ),
    ]
    report = reduce(lambda a, b: a.unionAll(b), parts)
    return report.orderBy("check_name", "table_name").select(
        "check_name",
        "table_name",
        F.col("n_checked").cast("bigint").alias("n_checked"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
    )


# ---------------------------------------------------------------------------
# ingestion freshness / completeness monitor (round 9)
# ---------------------------------------------------------------------------

#: volume anomaly threshold in population standard deviations
FRESH_SIGMA = 2.0


@query(
    "q_freshness_monitor",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               CAST(ts AS DATE) - DATE '1970-01-01' AS day_i,
               COUNT(*) AS n_rows
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    stats AS (
        SELECT event_type,
               COUNT(*) AS n_days,
               CAST(MAX(day_i) - MIN(day_i) + 1 AS BIGINT) AS span_days,
               MAX(day_i) AS latest_i,
               CAST(SUM(CAST(n_rows AS DECIMAL(38,6))) AS DOUBLE) AS s,
               CAST(SUM(CAST(n_rows * n_rows AS DECIMAL(38,6))) AS DOUBLE)
                 AS ss
        FROM daily GROUP BY event_type
    ),
    anom AS (
        SELECT d.event_type,
               COUNT(*) FILTER (
                   WHERE abs(d.n_rows - st.s / st.n_days)
                         > {FRESH_SIGMA}
                           * sqrt((st.ss - st.s * st.s / st.n_days)
                                  / st.n_days)
               ) AS n_anomalous_days
        FROM daily d JOIN stats st USING (event_type)
        WHERE st.ss - st.s * st.s / st.n_days > 0
        GROUP BY d.event_type
    )
    SELECT st.event_type,
           CAST(st.n_days AS BIGINT) AS n_days,
           st.span_days,
           CAST(st.span_days - st.n_days AS BIGINT) AS n_gap_days,
           strftime(DATE '1970-01-01' + st.latest_i * INTERVAL 1 DAY,
                    '%Y-%m-%d') AS latest_day,
           round(st.s / st.n_days, 6) AS mean_daily_rows,
           round(sqrt((st.ss - st.s * st.s / st.n_days) / st.n_days), 6)
             AS sd_daily_rows,
           CAST(COALESCE(a.n_anomalous_days, 0) AS BIGINT)
             AS n_anomalous_days
    FROM stats st LEFT JOIN anom a USING (event_type)
    ORDER BY st.event_type
    """,
)
def q_freshness_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion health per event-type slice: daily row volumes roll up
    to days-observed vs calendar span (gap days = silently missing
    partitions), the latest landed day (staleness), and the count of
    days whose volume sits more than {FRESH_SIGMA} population standard
    deviations from the slice's mean — the monitor that catches a
    stuck producer or a double-delivered day before consumers do.
    Complements q_data_quality_report (row-level constraints) with
    partition-level arrival health.

    Daily counts are integers, their power sums accumulate in exact
    decimal, and the z-threshold compares with one fixed double
    expression per day — the q_anomaly_zscore numerics applied to
    volume instead of value.

    Scale: one (type, day) aggregate — map-side combined, output is
    |types| x |days| rows — then |types|-sized frames; the raw table
    is scanned once. On a partitioned lake the daily counts come from
    partition metadata and the scan disappears entirely."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).alias(
            "day_i"
        ),
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    d38 = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    n_rows = F.col("n_rows")
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.max("day_i") - F.min("day_i") + 1)
        .cast("bigint")
        .alias("span_days"),
        F.max("day_i").alias("latest_i"),
        F.sum(d38(n_rows)).cast("double").alias("s"),
        F.sum(d38(n_rows * n_rows)).cast("double").alias("ss"),
    )
    s, ss, n_days = F.col("s"), F.col("ss"), F.col("n_days")
    var = (ss - s * s / n_days) / n_days
    anom = (
        daily.join(
            F.broadcast(stats.where(ss - s * s / n_days > 0)), "event_type"
        )
        .where(
            F.abs(n_rows - s / n_days)
            > FRESH_SIGMA * F.sqrt((ss - s * s / n_days) / n_days)
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_anomalous_days"))
    )
    return (
        stats.join(anom, "event_type", "left")
        .select(
            "event_type",
            n_days.cast("bigint").alias("n_days"),
            "span_days",
            (F.col("span_days") - n_days).cast("bigint").alias("n_gap_days"),
            F.date_format(
                F.date_add(F.lit("1970-01-01"), F.col("latest_i")),
                "yyyy-MM-dd",
            ).alias("latest_day"),
            F.round(s / n_days, 6).alias("mean_daily_rows"),
            F.round(F.sqrt(var), 6).alias("sd_daily_rows"),
            F.coalesce("n_anomalous_days", F.lit(0))
            .cast("bigint")
            .alias("n_anomalous_days"),
        )
        .orderBy("event_type")
    )


from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt  # noqa: E402

_fmt(q_freshness_monitor, FRESH_SIGMA=FRESH_SIGMA)


# ---------------------------------------------------------------------------
# distribution drift monitor: reference vs current histogram distance
# ---------------------------------------------------------------------------
# The monitoring companion to q_freshness_monitor: freshness says rows
# keep ARRIVING; drift says the VALUES still look like the reference
# period. The observed time range splits at its integer-epoch midpoint
# (same convention as q_cuped); the reference half fixes DRIFT_BINS
# equal-width bin edges over its own [min, max], the current half is
# clamped into those edges, and the report carries per-bin shares plus
# two whole-distribution distances in-row: total variation (the
# fraction of probability mass that moved) and Pearson chi-square
# against expected-from-reference counts.
#
# Hash-gate discipline: TVD's numerator is the exact INTEGER sum
# |cp_i*nq - cq_i*np| over bins with ONE final division by np*nq, and
# each chi-square contribution is rounded to 6 dp then accumulated in
# DECIMAL(38,6) — no float sum crosses rows on either engine.

DRIFT_BINS = 16


@query(
    "q_histogram_drift",
    oracle=f"""
    WITH bounds AS (
        SELECT (MIN(CAST(floor(epoch(ts)) AS BIGINT))
                + MAX(CAST(floor(epoch(ts)) AS BIGINT))) // 2 AS mid
        FROM events
    ),
    flagged AS (
        SELECT value,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) < b.mid
                    THEN 0 ELSE 1 END AS period
        FROM events, bounds b
    ),
    refstats AS (
        SELECT MIN(value) AS lo, MAX(value) AS hi
        FROM flagged WHERE period = 0
    ),
    binned AS (
        -- hi = lo (constant-valued reference half) would make the bin
        -- width 0 and the division NaN/Inf, where Spark's non-ANSI int
        -- cast and DuckDB diverge; by contract everything bins to 0.
        SELECT period,
               CASE WHEN r.hi = r.lo THEN 0
                    ELSE LEAST({DRIFT_BINS - 1}, GREATEST(0, CAST(floor(
                        (value - r.lo) / ((r.hi - r.lo) / {DRIFT_BINS})
                    ) AS INT))) END AS bin
        FROM flagged, refstats r
    ),
    counts AS (
        SELECT bin,
               COUNT(*) FILTER (WHERE period = 0) AS cp,
               COUNT(*) FILTER (WHERE period = 1) AS cq
        FROM binned GROUP BY bin
    ),
    tot AS (
        SELECT bin, cp, cq,
               SUM(cp) OVER () AS np,
               SUM(cq) OVER () AS nq
        FROM counts
    ),
    dist AS (
        SELECT bin, cp, cq, np, nq,
               SUM(abs(cp * nq - cq * np)) OVER () AS tvd_num,
               SUM(CASE WHEN cp > 0 THEN CAST(round(
                   (cq - cp * (CAST(nq AS DOUBLE) / np))
                   * (cq - cp * (CAST(nq AS DOUBLE) / np))
                   / (cp * (CAST(nq AS DOUBLE) / np)), 6) AS DECIMAL(38,6))
                   ELSE CAST(0 AS DECIMAL(38,6)) END) OVER () AS chi2
        FROM tot
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(cp AS BIGINT) AS ref_cnt,
           CAST(cq AS BIGINT) AS cur_cnt,
           round(CAST(cp AS DOUBLE) / np, 6) AS ref_share,
           round(CAST(cq AS DOUBLE) / nq, 6) AS cur_share,
           round(CAST(tvd_num AS DOUBLE) / (2.0 * np * nq), 6) AS tvd,
           CAST(chi2 AS DOUBLE) AS chi2
    FROM dist
    ORDER BY bin
    """,
)
def q_histogram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-distribution drift between the reference (first) and
    current (second) half of the observed time range: {DRIFT_BINS}
    equal-width bins fixed by the REFERENCE half's [min, max] (current
    values clamp into the edge bins, so novel out-of-range mass is
    visible at bin 0 / bin {DRIFT_BINS_MINUS_1}), per-bin shares, and
    two in-row whole-distribution distances — total variation
    (integer-exact numerator, one final division) and Pearson
    chi-square vs expected-from-reference counts (per-bin terms
    rounded to 6 dp, decimal-accumulated; bins unseen in the reference
    are excluded from chi-square by contract and show in TVD).

    Scale: one scan flags periods against a broadcast 1-row midpoint,
    one map-side-combined groupBy(bin) produces a {DRIFT_BINS}-row
    frame, and every distance folds over that constant-size frame —
    drift on 100 TB costs one scan, the report is bytes."""
    ev = read_table(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    bounds = ev.agg(
        ((F.min(epoch) + F.max(epoch)) / 2).cast("bigint").alias("mid")
    )
    flagged = ev.crossJoin(F.broadcast(bounds)).select(
        "value",
        F.when(epoch < F.col("mid"), F.lit(0)).otherwise(F.lit(1)).alias(
            "period"
        ),
    )
    refstats = (
        flagged.where(F.col("period") == 0)
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    # hi == lo (constant reference half) would zero the bin width and
    # NaN the division; by contract the degenerate case bins to 0,
    # guarded identically in the oracle.
    binned = flagged.crossJoin(F.broadcast(refstats)).select(
        "period",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(DRIFT_BINS - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / DRIFT_BINS)
                    ).cast("int"),
                ),
            )
        )
        .alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("period") == 0, 1)).alias("cp"),
        F.count(F.when(F.col("period") == 1, 1)).alias("cq"),
    )
    w = Window.partitionBy()
    tot = counts.select(
        "*",
        F.sum("cp").over(w).alias("np"),
        F.sum("cq").over(w).alias("nq"),
    )
    exp_cur = F.col("cp") * (F.col("nq").cast("double") / F.col("np"))
    chi_term = (
        (F.col("cq") - exp_cur) * (F.col("cq") - exp_cur) / exp_cur
    )
    dist = tot.select(
        "*",
        F.sum(F.abs(F.col("cp") * F.col("nq") - F.col("cq") * F.col("np")))
        .over(w)
        .alias("tvd_num"),
        F.sum(
            F.when(
                F.col("cp") > 0,
                F.round(chi_term, 6).cast("decimal(38,6)"),
            ).otherwise(F.lit(0).cast("decimal(38,6)"))
        )
        .over(w)
        .alias("chi2"),
    )
    return dist.select(
        F.col("bin").cast("int").alias("bin"),
        F.col("cp").cast("long").alias("ref_cnt"),
        F.col("cq").cast("long").alias("cur_cnt"),
        F.round(F.col("cp").cast("double") / F.col("np"), 6).alias(
            "ref_share"
        ),
        F.round(F.col("cq").cast("double") / F.col("nq"), 6).alias(
            "cur_share"
        ),
        F.round(
            F.col("tvd_num").cast("double")
            / (F.lit(2.0) * F.col("np") * F.col("nq")),
            6,
        ).alias("tvd"),
        F.col("chi2").cast("double").alias("chi2"),
    ).orderBy("bin")


from pyspark.sql.window import Window  # noqa: E402

_fmt(
    q_histogram_drift,
    DRIFT_BINS=DRIFT_BINS,
    DRIFT_BINS_MINUS_1=DRIFT_BINS - 1,
)


# ---------------------------------------------------------------------------
# Benford first-digit audit (round 11)
# ---------------------------------------------------------------------------
# Forensic data-quality check: naturally occurring multiplicative
# quantities (prices, populations, transaction totals) follow
# Benford's law — P(leading digit d) = log10(1 + 1/d) — and synthetic,
# fabricated, or truncated feeds don't. The audit flags a generated or
# corrupted column BEFORE it trains a model or calibrates an
# estimator. Digits extract as the first character of the exact
# integer part (floor + integer-to-string — no float log10 anywhere
# near a power-of-ten boundary); the expected shares are fixed 6-dp
# literals shared by both engines; the chi-square follows
# q_histogram_drift's discipline (per-digit term rounded to 6 dp,
# decimal-accumulated).

BENFORD_SHARES = (
    (1, "0.30103"), (2, "0.176091"), (3, "0.124939"),
    (4, "0.09691"), (5, "0.079181"), (6, "0.066947"),
    (7, "0.057992"), (8, "0.051153"), (9, "0.045757"),
)

_SQL_BENFORD_TABLE = " UNION ALL ".join(
    f"SELECT {d} AS digit, {s} AS benford_share" for d, s in BENFORD_SHARES
)


@query(
    "q_benford_audit",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS observed
        FROM digits GROUP BY digit
    ),
    bt AS ({_SQL_BENFORD_TABLE}),
    tot AS (SELECT SUM(observed) AS n FROM counts),
    scored AS (
        -- chi term computed in DOUBLE on BOTH engines (q_srm_check's
        -- pattern; round-11 ADVICE): without the casts DuckDB runs
        -- HUGEINT*DECIMAL exact arithmetic while Spark runs doubles,
        -- and a term within a few ULPs of a 6-dp rounding boundary
        -- hash-diverges (extreme deviations can even overflow the
        -- decimal multiply).
        SELECT b.digit, COALESCE(c.observed, 0) AS observed,
               b.benford_share, t.n,
               CAST(round(
                   (CAST(COALESCE(c.observed, 0) AS DOUBLE)
                      - CAST(t.n AS DOUBLE) * CAST(b.benford_share AS DOUBLE))
                   * (CAST(COALESCE(c.observed, 0) AS DOUBLE)
                      - CAST(t.n AS DOUBLE) * CAST(b.benford_share AS DOUBLE))
                   / (CAST(t.n AS DOUBLE) * CAST(b.benford_share AS DOUBLE)),
                   6) AS DECIMAL(38,6))
                 AS chi_term
        FROM bt b LEFT JOIN counts c ON c.digit = b.digit, tot t
    )
    SELECT CAST(digit AS INT) AS digit,
           CAST(observed AS BIGINT) AS observed,
           round(CAST(observed AS DOUBLE) / n, 6) AS observed_share,
           CAST(benford_share AS DOUBLE) AS benford_share,
           CAST(chi_term AS DOUBLE) AS chi_term,
           CAST(SUM(chi_term) OVER () AS DOUBLE) AS chi2
    FROM scored
    ORDER BY digit
    """,
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed vs
    expected digit shares and a chi-square statistic — the forensic
    check that flags fabricated, truncated, or unit-mangled numeric
    feeds before they train anything. Digit extraction is exact
    integer/string algebra (never float log10); expected shares are
    fixed 6-dp literals; chi-square terms round to 6 dp then
    accumulate in DECIMAL(38,6), the q_histogram_drift discipline.

    Scale: one scan into a 9-row aggregate; the report is 9 rows
    forever."""
    o = read_table(spark, sf_dir, "orders")
    digits = o.where(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("observed")
    )
    bt = spark.createDataFrame(
        [(d, float(s)) for d, s in BENFORD_SHARES],
        "digit int, benford_share double",
    )
    tot = counts.agg(F.sum("observed").alias("n"))
    scored = (
        bt.join(counts, "digit", "left")
        .na.fill({"observed": 0})
        .crossJoin(F.broadcast(tot))
    )
    exp_cnt = F.col("n") * F.col("benford_share")
    chi_term = F.round(
        (F.col("observed") - exp_cnt)
        * (F.col("observed") - exp_cnt)
        / exp_cnt,
        6,
    ).cast("decimal(38,6)")
    w = Window.partitionBy()
    return (
        scored.select(
            F.col("digit").cast("int").alias("digit"),
            F.col("observed").cast("bigint").alias("observed"),
            F.round(F.col("observed").cast("double") / F.col("n"), 6).alias(
                "observed_share"
            ),
            F.col("benford_share").cast("double").alias("benford_share"),
            chi_term.alias("chi_term_d"),
        )
        .select(
            "digit",
            "observed",
            "observed_share",
            "benford_share",
            F.col("chi_term_d").cast("double").alias("chi_term"),
            F.sum("chi_term_d").over(w).cast("double").alias("chi2"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# robust outlier report: median / MAD (round 11)
# ---------------------------------------------------------------------------
# q_anomaly_zscore flags rows against mean/sigma — which a single
# extreme value drags toward itself (masking). The robust version uses
# the median and the median absolute deviation, which no handful of
# outliers can move. Cross-engine exactness: both medians are LOWER
# medians — the ceil(n/2)-th smallest value of the multiset, an exact
# ORDER STATISTIC over decimal values (no interpolation, no float
# averaging) — so every comparison below is exact decimal arithmetic
# and the flag counts are engine-identical by construction.

MAD_K = 3  # the classic 3-MAD fence


@query(
    "q_mad_outliers",
    oracle=f"""
    WITH vals AS (
        SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v
        FROM events
    ),
    ranked AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v)
                 AS r,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM vals
    ),
    med AS (
        SELECT event_type, n, v AS median_v
        FROM ranked WHERE r = (n + 1) // 2
    ),
    devs AS (
        SELECT v.event_type, abs(v.v - m.median_v) AS d, m.median_v, m.n
        FROM vals v JOIN med m ON m.event_type = v.event_type
    ),
    dranked AS (
        SELECT event_type, d, median_v, n,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
                 AS r
        FROM devs
    ),
    mad AS (
        SELECT event_type, median_v, n, d AS mad_v
        FROM dranked WHERE r = (n + 1) // 2
    )
    SELECT d.event_type,
           CAST(m.n AS BIGINT) AS n,
           CAST(m.median_v AS DOUBLE) AS median_value,
           CAST(m.mad_v AS DOUBLE) AS mad,
           CAST(COUNT(*) FILTER (WHERE d.d > {MAD_K} * m.mad_v)
                AS BIGINT) AS n_outliers,
           CAST(MAX(d.d) AS DOUBLE) AS max_abs_dev
    FROM devs d JOIN mad m ON m.event_type = d.event_type
    GROUP BY d.event_type, m.n, m.median_v, m.mad_v
    ORDER BY d.event_type
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier report: lower-median and MAD as exact
    decimal order statistics (no interpolation — the ceil(n/2)-th
    smallest, identical in both engines), rows beyond the {MAD_K}-MAD
    fence counted, worst absolute deviation alongside. The
    masking-proof companion to q_anomaly_zscore's mean/sigma flags.

    Scale: two per-type sorted windows (the per-partition sort every
    exact order statistic costs — the approximate alternative is the
    KLL family) + one broadcast of the |types|-row median/MAD frame
    back over a single scan."""
    ev = read_table(spark, sf_dir, "events")
    vals = ev.select(
        "event_type", F.col("value").cast("decimal(18,6)").alias("v")
    )
    wv = Window.partitionBy("event_type").orderBy("v")
    wn = Window.partitionBy("event_type")
    ranked = vals.select(
        "event_type",
        "v",
        F.row_number().over(wv).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = ranked.where(
        F.col("r") == F.expr("(n + 1) div 2")
    ).select("event_type", "n", F.col("v").alias("median_v"))
    devs = vals.join(F.broadcast(med), "event_type").select(
        "event_type",
        "n",
        "median_v",
        F.abs(F.col("v") - F.col("median_v")).alias("d"),
    )
    wd = Window.partitionBy("event_type").orderBy("d")
    mad = (
        devs.select(
            "event_type",
            "n",
            "median_v",
            "d",
            F.row_number().over(wd).alias("r"),
        )
        .where(F.col("r") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("d").alias("mad_v"))
    )
    return (
        devs.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "median_v", "mad_v")
        .agg(
            F.count(
                F.when(F.col("d") > F.lit(MAD_K) * F.col("mad_v"), 1)
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.max("d").cast("double").alias("max_abs_dev"),
        )
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("median_v").cast("double").alias("median_value"),
            F.col("mad_v").cast("double").alias("mad"),
            "n_outliers",
            "max_abs_dev",
        )
        .orderBy("event_type")
    )


_fmt(q_mad_outliers, MAD_K=MAD_K)


# ---------------------------------------------------------------------------
# functional-dependency audit: column dependency structure in one shuffle
# ---------------------------------------------------------------------------
# Profiling beyond per-column stats (q_table_profile, q_analyze_ndv):
# WHICH columns determine which — the dependency structure behind
# normalization, partition-key choice, and "is this column redundant"
# questions. For every ordered pair (det -> dep) over a fixed audit
# list, the FD holds iff every det value maps to exactly one dep
# value; the violation count is distinct(det, dep) - distinct(det).
# Computed for ALL pairs in ONE shuffle: rows melt to
# (det_name, det_val, dep_name, dep_val) via stack (bounded 20x
# fan-out — the audit list is the cost dial), a first aggregate
# collapses to per-(pair, det_val) distinct-dep counts with map-side
# combine, and a second |pairs|-sized aggregate folds the violations.
# The oracle computes each pair independently via the distinct-count
# identity, so the melt plan is value-hash-proven equivalent.

#: NULL sentinel: both engines coalesce every audit column to this
#: value BEFORE counting, so countDistinct (which drops NULLs and
#: counts NULL-field structs asymmetrically across engines) never
#: sees a NULL. Cannot collide with TPC-H values.
FD_NULL = "__NULL__"

#: audit columns: name -> SQL expression over orders
FD_COLS = {
    "o_orderkey": "CAST(o_orderkey AS VARCHAR)",
    "o_custkey": "CAST(o_custkey AS VARCHAR)",
    "o_orderstatus": "o_orderstatus",
    "o_orderpriority": "o_orderpriority",
    "o_year": "CAST(year(o_orderdate) AS VARCHAR)",
}


def _fd_oracle() -> str:
    pairs = [
        (a, b) for a in FD_COLS for b in FD_COLS if a != b
    ]
    base = ", ".join(
        f"COALESCE({expr}, '{FD_NULL}') AS {name}"
        for name, expr in FD_COLS.items()
    )
    parts = [
        f"""
        SELECT '{a}' AS det_name, '{b}' AS dep_name,
               CAST(COUNT(DISTINCT {a}) AS BIGINT) AS n_det_values,
               CAST(COUNT(DISTINCT ({a}, {b}))
                    - COUNT(DISTINCT {a}) AS BIGINT) AS n_violations,
               (COUNT(DISTINCT ({a}, {b})) = COUNT(DISTINCT {a}))
                 AS fd_holds
        FROM t"""
        for a, b in pairs
    ]
    return f"WITH t AS (SELECT {base} FROM orders)\n" + "\nUNION ALL".join(
        parts
    )


@query("q_fd_audit", oracle=_fd_oracle())
def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit over five orders columns (order key,
    customer key, status, priority, order year): for every ordered pair,
    whether det -> dep holds and how many extra (det, dep) mappings
    violate it. All 20 pairs in ONE shuffle — rows melt to
    (det_name, det_val, dep_name, dep_val) with a bounded stack, a
    per-(pair, det-value) aggregate counts distinct dependents
    (map-side combined), and a |pairs|-row fold sums violations =
    sum(n_dep - 1) = distinct(det, dep) - distinct(det). The oracle
    computes each pair independently from that identity, so the gate
    proves the melt plan equivalent to 20 separate audits. Both
    engines coalesce every audit column to ``FD_NULL`` before
    counting — NULL determinants and NULL dependents count as one
    ordinary value on each side, so nullable audit columns are safe
    (countDistinct drops NULLs and struct-distinct counts NULL fields
    engine-asymmetrically otherwise).

    Scale: the melt's fan-out equals the audit-pair count (the cost
    dial); the wide aggregate's key space is bounded by
    sum over pairs of ndv(det), and the final fold is |pairs| rows.
    Discovering FDs over K columns costs one scan, not K^2."""
    o = read_table(spark, sf_dir, "orders")
    nul = F.lit(FD_NULL)
    base = o.select(
        F.coalesce(F.col("o_orderkey").cast("string"), nul).alias(
            "o_orderkey"
        ),
        F.coalesce(F.col("o_custkey").cast("string"), nul).alias(
            "o_custkey"
        ),
        F.coalesce(F.col("o_orderstatus"), nul).alias("o_orderstatus"),
        F.coalesce(F.col("o_orderpriority"), nul).alias("o_orderpriority"),
        F.coalesce(F.year("o_orderdate").cast("string"), nul).alias(
            "o_year"
        ),
    )
    pairs = [(a, b) for a in FD_COLS for b in FD_COLS if a != b]
    stack = "stack({}, {}) as (det_name, det_val, dep_name, dep_val)".format(
        len(pairs),
        ", ".join(f"'{a}', {a}, '{b}', {b}" for a, b in pairs),
    )
    melted = base.select(F.expr(stack))
    lvl1 = melted.groupBy("det_name", "dep_name", "det_val").agg(
        F.countDistinct("dep_val").alias("ndep")
    )
    return lvl1.groupBy("det_name", "dep_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_det_values"),
        F.sum(F.col("ndep") - 1).cast("long").alias("n_violations"),
        (F.sum(F.col("ndep") - 1) == 0).alias("fd_holds"),
    )


# ---------------------------------------------------------------------------
# referential-integrity audit: orphan rates across the FK edges
# ---------------------------------------------------------------------------
# The cross-table half of profiling: per foreign-key edge, how many
# child rows reference a parent that does not exist. In a CDC lake
# this is the standing detector for out-of-order ingestion (child
# arrived before parent), over-eager vacuum, and broken backfills.
# Each edge is one ANTI join with the parent's key projection
# broadcast when it fits — the bloom-prejoin pattern without the
# bloom; the report unions |edges| one-row aggregates.

#: audited edges: (edge name, child table, child key, parent table,
#: parent key)
RI_EDGES = (
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
)


def _ri_oracle() -> str:
    parts = [
        f"""
        SELECT '{name}' AS edge,
               CAST((SELECT COUNT(*) FROM {ct}) AS BIGINT) AS n_child,
               CAST((SELECT COUNT(*) FROM {ct}
                     WHERE {ck} NOT IN (SELECT {pk} FROM {pt})) AS BIGINT)
                 AS n_orphans
        FROM (SELECT 1)"""
        for name, ct, ck, pt, pk in RI_EDGES
    ]
    return "\nUNION ALL".join(parts)


@query("q_ri_audit", oracle=_ri_oracle())
def q_ri_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over four FK edges of the lake's
    star schema: per edge, the child row count and the number of
    ORPHANS (children whose key has no parent). Each edge is one LEFT
    ANTI join against the parent's key projection — broadcast when the
    parent fits, shuffled hash otherwise — and the report is a union
    of one-row aggregates. Keys here are non-null, so NOT IN and the
    anti join agree (the nullable corner is q_notin_nullaware's
    subject).

    Scale: per edge one column-pruned parent scan + one anti join;
    parents like nation broadcast, fact-fact edges (lineitem->orders)
    shuffle on the key exactly like the plain join would. At CDC
    scale this runs incrementally by pointing the child side at the
    changefeed instead of the table."""
    out = None
    for name, ct, ck, pt, pk in RI_EDGES:
        child = read_table(spark, sf_dir, ct).select(F.col(ck).alias("k"))
        parent = read_table(spark, sf_dir, pt).select(
            F.col(pk).alias("k"), F.lit(1).alias("hit")
        ).distinct()
        # ONE pass per edge (round 18): a left join against the
        # deduplicated parent keys preserves child cardinality, so
        # n_child and n_orphans come out of the SAME aggregate — the
        # r17 shape scanned every child table twice (anti-join branch
        # + a separate count branch) and union-glued the two one-row
        # aggregates with a crossJoin (guide §2.4: one pass where one
        # pass suffices; lineitem alone was two full extra scans)
        row = (
            child.join(parent, "k", "left")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_child"),
                F.count(F.when(F.col("hit").isNull(), 1))
                .cast("long")
                .alias("n_orphans"),
            )
            .select(F.lit(name).alias("edge"), "n_child", "n_orphans")
        )
        out = row if out is None else out.unionByName(row)
    return out



# ---------------------------------------------------------------------------
# exact two-sample Kolmogorov-Smirnov drift test — round 15
# ---------------------------------------------------------------------------
# q_histogram_drift bins first and loses whatever the bin edges hide;
# the KS statistic D = sup |ECDF_1 - ECDF_2| is the exact, binning-free
# drift number. Exact and DISTRIBUTED: the two ECDFs are compared at
# every observed value via the two-level cumulative pattern (per-bucket
# windows + a bucket-offset frame, the q_seq_gaps/q_pps_sample shape),
# and D's numerator max(|n2*cumA - n1*cumB|) is pure integer
# arithmetic — both engines take the max of identical bigints. The
# asymptotic p-value is a GENERATED 100-term alternating series (one
# parenthesized expression handed to both engines verbatim, the
# probe/_SqlOp discipline), so even its float fold is order-identical.

#: the compared periods split at this timestamp (fixture midpoint)
KS_SPLIT = "2024-01-16"

#: ECDF bucket width on the value axis (the parallelism dial)
KS_BUCKET = 32

#: generated 100-term alternating KS series over column `lam`
_KS_SERIES = "exp(-2.0 * 1 * lam * lam) - exp(-2.0 * 4 * lam * lam) + exp(-2.0 * 9 * lam * lam) - exp(-2.0 * 16 * lam * lam) + exp(-2.0 * 25 * lam * lam) - exp(-2.0 * 36 * lam * lam) + exp(-2.0 * 49 * lam * lam) - exp(-2.0 * 64 * lam * lam) + exp(-2.0 * 81 * lam * lam) - exp(-2.0 * 100 * lam * lam) + exp(-2.0 * 121 * lam * lam) - exp(-2.0 * 144 * lam * lam) + exp(-2.0 * 169 * lam * lam) - exp(-2.0 * 196 * lam * lam) + exp(-2.0 * 225 * lam * lam) - exp(-2.0 * 256 * lam * lam) + exp(-2.0 * 289 * lam * lam) - exp(-2.0 * 324 * lam * lam) + exp(-2.0 * 361 * lam * lam) - exp(-2.0 * 400 * lam * lam) + exp(-2.0 * 441 * lam * lam) - exp(-2.0 * 484 * lam * lam) + exp(-2.0 * 529 * lam * lam) - exp(-2.0 * 576 * lam * lam) + exp(-2.0 * 625 * lam * lam) - exp(-2.0 * 676 * lam * lam) + exp(-2.0 * 729 * lam * lam) - exp(-2.0 * 784 * lam * lam) + exp(-2.0 * 841 * lam * lam) - exp(-2.0 * 900 * lam * lam) + exp(-2.0 * 961 * lam * lam) - exp(-2.0 * 1024 * lam * lam) + exp(-2.0 * 1089 * lam * lam) - exp(-2.0 * 1156 * lam * lam) + exp(-2.0 * 1225 * lam * lam) - exp(-2.0 * 1296 * lam * lam) + exp(-2.0 * 1369 * lam * lam) - exp(-2.0 * 1444 * lam * lam) + exp(-2.0 * 1521 * lam * lam) - exp(-2.0 * 1600 * lam * lam) + exp(-2.0 * 1681 * lam * lam) - exp(-2.0 * 1764 * lam * lam) + exp(-2.0 * 1849 * lam * lam) - exp(-2.0 * 1936 * lam * lam) + exp(-2.0 * 2025 * lam * lam) - exp(-2.0 * 2116 * lam * lam) + exp(-2.0 * 2209 * lam * lam) - exp(-2.0 * 2304 * lam * lam) + exp(-2.0 * 2401 * lam * lam) - exp(-2.0 * 2500 * lam * lam) + exp(-2.0 * 2601 * lam * lam) - exp(-2.0 * 2704 * lam * lam) + exp(-2.0 * 2809 * lam * lam) - exp(-2.0 * 2916 * lam * lam) + exp(-2.0 * 3025 * lam * lam) - exp(-2.0 * 3136 * lam * lam) + exp(-2.0 * 3249 * lam * lam) - exp(-2.0 * 3364 * lam * lam) + exp(-2.0 * 3481 * lam * lam) - exp(-2.0 * 3600 * lam * lam) + exp(-2.0 * 3721 * lam * lam) - exp(-2.0 * 3844 * lam * lam) + exp(-2.0 * 3969 * lam * lam) - exp(-2.0 * 4096 * lam * lam) + exp(-2.0 * 4225 * lam * lam) - exp(-2.0 * 4356 * lam * lam) + exp(-2.0 * 4489 * lam * lam) - exp(-2.0 * 4624 * lam * lam) + exp(-2.0 * 4761 * lam * lam) - exp(-2.0 * 4900 * lam * lam) + exp(-2.0 * 5041 * lam * lam) - exp(-2.0 * 5184 * lam * lam) + exp(-2.0 * 5329 * lam * lam) - exp(-2.0 * 5476 * lam * lam) + exp(-2.0 * 5625 * lam * lam) - exp(-2.0 * 5776 * lam * lam) + exp(-2.0 * 5929 * lam * lam) - exp(-2.0 * 6084 * lam * lam) + exp(-2.0 * 6241 * lam * lam) - exp(-2.0 * 6400 * lam * lam) + exp(-2.0 * 6561 * lam * lam) - exp(-2.0 * 6724 * lam * lam) + exp(-2.0 * 6889 * lam * lam) - exp(-2.0 * 7056 * lam * lam) + exp(-2.0 * 7225 * lam * lam) - exp(-2.0 * 7396 * lam * lam) + exp(-2.0 * 7569 * lam * lam) - exp(-2.0 * 7744 * lam * lam) + exp(-2.0 * 7921 * lam * lam) - exp(-2.0 * 8100 * lam * lam) + exp(-2.0 * 8281 * lam * lam) - exp(-2.0 * 8464 * lam * lam) + exp(-2.0 * 8649 * lam * lam) - exp(-2.0 * 8836 * lam * lam) + exp(-2.0 * 9025 * lam * lam) - exp(-2.0 * 9216 * lam * lam) + exp(-2.0 * 9409 * lam * lam) - exp(-2.0 * 9604 * lam * lam) + exp(-2.0 * 9801 * lam * lam) - exp(-2.0 * 10000 * lam * lam)"


def _ks_oracle() -> str:
    return f"""
    WITH v AS (
        SELECT value,
               CASE WHEN ts < TIMESTAMP '{KS_SPLIT} 00:00:00'
                    THEN 1 ELSE 0 END AS in_a
        FROM events WHERE value IS NOT NULL
    ),
    pts AS (
        SELECT value, CAST(floor(value / {KS_BUCKET}) AS BIGINT) AS b,
               CAST(SUM(in_a) AS BIGINT) AS ca,
               CAST(SUM(1 - in_a) AS BIGINT) AS cb
        FROM v GROUP BY value
    ),
    bsum AS (
        SELECT b,
               CAST(SUM(ca) AS BIGINT) AS ba,
               CAST(SUM(cb) AS BIGINT) AS bb
        FROM pts GROUP BY b
    ),
    offs AS (
        SELECT b,
               CAST(COALESCE(SUM(ba) OVER (ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS offa,
               CAST(COALESCE(SUM(bb) OVER (ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS offb,
               CAST(SUM(SUM(ba)) OVER () AS BIGINT) AS n1,
               CAST(SUM(SUM(bb)) OVER () AS BIGINT) AS n2
        FROM bsum GROUP BY b, ba, bb
    ),
    cum AS (
        SELECT pts.value,
               offs.n1, offs.n2,
               offs.offa + SUM(pts.ca) OVER (PARTITION BY pts.b
                   ORDER BY pts.value ROWS UNBOUNDED PRECEDING) AS cuma,
               offs.offb + SUM(pts.cb) OVER (PARTITION BY pts.b
                   ORDER BY pts.value ROWS UNBOUNDED PRECEDING) AS cumb
        FROM pts JOIN offs USING (b)
    ),
    d AS (
        SELECT MAX(n1) AS n1, MAX(n2) AS n2,
               MAX(ABS(n2 * cuma - n1 * cumb)) AS dnum
        FROM cum
    ),
    stat AS (
        SELECT n1, n2,
               CAST(dnum AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2) AS dd,
               sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)) AS sne
        FROM d
    ),
    lamf AS (
        SELECT n1, n2, dd,
               (sne + 0.12 + 0.11 / sne) * dd AS lam
        FROM stat
    )
    SELECT n1, n2, round(dd, 6) AS d_stat,
           round(LEAST(GREATEST(2.0 * ({_KS_SERIES}), 0.0), 1.0), 6)
             AS p_value
    FROM lamf
    """


def _register_ks() -> None:
    from pyspark.sql import Window

    @query("q_two_sample_ks", oracle=_ks_oracle())
    def q_two_sample_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Exact two-sample Kolmogorov-Smirnov test between the first
        and second half of the observed period (split {KS_SPLIT}):
        D = sup |ECDF_a - ECDF_b| evaluated at EVERY observed value —
        the binning-free drift number q_histogram_drift approximates —
        plus the asymptotic p-value. The ECDFs build distributedly:
        per-value counts roll up inside {KS_BUCKET}-wide value
        buckets, a bucket-offset frame (driver-bounded) stitches the
        global cumulative, and D's numerator is max |n2*cumA -
        n1*cumB| over exact bigints. The p-value's 100-term
        alternating series is generated once and handed to both
        engines verbatim, so its float fold is order-identical.

        Scale: one shuffle to per-value counts (map-side combined),
        windows inside value buckets, a |buckets|-row stitch — the
        q_seq_gaps decomposition on the value axis. No global sort.
        """
        ev = (
            read_table(spark, sf_dir, "events")
            .where(F.col("value").isNotNull())
            .select(
                "value",
                F.when(
                    F.col("ts") < F.lit(KS_SPLIT).cast("timestamp"), 1
                )
                .otherwise(0)
                .alias("in_a"),
            )
        )
        pts = ev.groupBy("value").agg(
            F.sum("in_a").cast("long").alias("ca"),
            F.sum(1 - F.col("in_a")).cast("long").alias("cb"),
        ).withColumn(
            "b", F.floor(F.col("value") / KS_BUCKET).cast("long")
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
            F.sum("ba").over(wall).cast("long").alias("n1"),
            F.sum("bb").over(wall).cast("long").alias("n2"),
        )
        wb = (
            Window.partitionBy("b")
            .orderBy("value")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = pts.join(offs, "b").select(
            "n1",
            "n2",
            (F.col("offa") + F.sum("ca").over(wb)).alias("cuma"),
            (F.col("offb") + F.sum("cb").over(wb)).alias("cumb"),
        )
        d = cum.agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.max(
                F.abs(
                    F.col("n2") * F.col("cuma")
                    - F.col("n1") * F.col("cumb")
                )
            ).alias("dnum"),
        )
        stat = d.select(
            "n1",
            "n2",
            (
                F.col("dnum").cast("double")
                / (F.col("n1").cast("double") * F.col("n2"))
            ).alias("dd"),
            F.sqrt(
                F.col("n1").cast("double")
                * F.col("n2")
                / (F.col("n1") + F.col("n2"))
            ).alias("sne"),
        )
        lamf = stat.withColumn(
            "lam", (F.col("sne") + 0.12 + 0.11 / F.col("sne")) * F.col("dd")
        )
        return lamf.select(
            "n1",
            "n2",
            F.round("dd", 6).alias("d_stat"),
            F.round(
                F.least(
                    F.greatest(
                        2.0 * F.expr(_KS_SERIES), F.lit(0.0)
                    ),
                    F.lit(1.0),
                ),
                6,
            ).alias("p_value"),
        )

    _fmt(q_two_sample_ks, KS_SPLIT=KS_SPLIT, KS_BUCKET=KS_BUCKET)


_register_ks()



# ---------------------------------------------------------------------------
# Mann-Whitney U rank-sum test — round 15
# ---------------------------------------------------------------------------
# The nonparametric complement to q_two_sample_ks: KS asks "are the
# distributions different anywhere", the rank-sum U asks the sharper
# locational question "does one period stochastically dominate". All
# rank arithmetic is EXACT integers: with ties, each distinct value's
# average rank doubled is 2*cum_before + c + 1 (an integer), so the
# doubled rank sum, U, the tie-correction sum of t^3 - t, and both
# moments clear engine float order entirely; the normal-approximation
# p-value evaluates a GENERATED Abramowitz-Stegun erfc polynomial
# (one expression, both engines verbatim).

#: the erfc-based two-sided tail over column z (A&S 7.1.26, |e|<1.5e-7)
_MW_TAIL = """(((0.254829592) * pow((1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951))), 1) + (-0.284496736) * pow((1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951))), 2) + (1.421413741) * pow((1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951))), 3) + (-1.453152027) * pow((1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951))), 4) + (1.061405429) * pow((1.0 / (1.0 + 0.3275911 * (z / 1.4142135623730951))), 5)) * exp(-((z / 1.4142135623730951)) * ((z / 1.4142135623730951))))"""


def _register_mw() -> None:
    from pyspark.sql import Window

    @query(
        "q_mann_whitney",
        oracle=f"""
        WITH v AS (
            SELECT value,
                   CASE WHEN ts < TIMESTAMP '{KS_SPLIT} 00:00:00'
                        THEN 1 ELSE 0 END AS in_a
            FROM events WHERE value IS NOT NULL
        ),
        pts AS (
            SELECT value,
                   CAST(SUM(in_a) AS BIGINT) AS ca,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM v GROUP BY value
        ),
        cum AS (
            SELECT pts.*,
                   CAST(COALESCE(SUM(c) OVER (ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS cum_before
            FROM pts
        ),
        agg AS (
            SELECT CAST(SUM(ca) AS BIGINT) AS n1,
                   CAST(SUM(c - ca) AS BIGINT) AS n2,
                   CAST(SUM(ca * (2 * cum_before + c + 1)) AS BIGINT)
                     AS r2a,
                   CAST(SUM(c * c * c - c) AS BIGINT) AS ties
            FROM cum
        ),
        stat AS (
            SELECT n1, n2,
                   (CAST(r2a AS DOUBLE) / 2) - CAST(n1 AS DOUBLE)
                     * (n1 + 1) / 2 AS u,
                   CAST(n1 AS DOUBLE) * n2 / 2 AS mu,
                   sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                        * ((n1 + n2 + 1)
                           - CAST(ties AS DOUBLE)
                             / ((n1 + n2) * CAST(n1 + n2 - 1
                                                 AS DOUBLE))))
                     AS sigma
            FROM agg
        ),
        zs AS (
            SELECT n1, n2, u, mu, sigma,
                   GREATEST(ABS(u - mu) - 0.5, 0.0) / sigma AS z
            FROM stat
        )
        SELECT n1, n2,
               round(u, 1) AS u_stat,
               round(z, 6) AS z_score,
               round(LEAST({_MW_TAIL}, 1.0), 6) AS p_value
        FROM zs
        """,
    )
    def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Mann-Whitney rank-sum test between the first and second
        half of the observed period (same {KS_SPLIT} split as
        q_two_sample_ks): U from tie-averaged ranks, the
        tie-corrected normal z with continuity correction, and the
        two-sided p-value. Every rank quantity is exact-integer
        (doubled average rank = 2*cum_before + c + 1), the cumulative
        runs over per-value counts (map-side combined, |distinct
        values| rows), and the p-value's erfc polynomial is generated
        once for both engines — so the whole test is engine-exact up
        to the final rounded doubles.

        Scale: one shuffle to per-value counts; the rank cumulative
        is a single ordered window over the distinct-value frame
        (bucket it with the q_two_sample_ks two-level pattern when
        distinct values are unbounded); the test itself is one row.
        """
        ev = (
            read_table(spark, sf_dir, "events")
            .where(F.col("value").isNotNull())
            .select(
                "value",
                F.when(
                    F.col("ts") < F.lit(KS_SPLIT).cast("timestamp"), 1
                )
                .otherwise(0)
                .alias("in_a"),
            )
        )
        pts = ev.groupBy("value").agg(
            F.sum("in_a").cast("long").alias("ca"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        wcum = Window.orderBy("value").rowsBetween(
            Window.unboundedPreceding, -1
        )
        cum = pts.withColumn(
            "cum_before",
            F.coalesce(F.sum("c").over(wcum), F.lit(0)).cast("long"),
        )
        agg = cum.agg(
            F.sum("ca").cast("long").alias("n1"),
            F.sum(F.col("c") - F.col("ca")).cast("long").alias("n2"),
            F.sum(
                F.col("ca")
                * (2 * F.col("cum_before") + F.col("c") + 1)
            )
            .cast("long")
            .alias("r2a"),
            F.sum(
                F.col("c") * F.col("c") * F.col("c") - F.col("c")
            )
            .cast("long")
            .alias("ties"),
        )
        stat = agg.select(
            "n1",
            "n2",
            (
                F.col("r2a").cast("double") / 2
                - F.col("n1").cast("double") * (F.col("n1") + 1) / 2
            ).alias("u"),
            (F.col("n1").cast("double") * F.col("n2") / 2).alias("mu"),
            F.sqrt(
                F.col("n1").cast("double")
                * F.col("n2")
                / 12.0
                * (
                    (F.col("n1") + F.col("n2") + 1)
                    - F.col("ties").cast("double")
                    / (
                        (F.col("n1") + F.col("n2"))
                        * (F.col("n1") + F.col("n2") - 1).cast(
                            "double"
                        )
                    )
                )
            ).alias("sigma"),
        )
        zs = stat.withColumn(
            "z",
            F.greatest(
                F.abs(F.col("u") - F.col("mu")) - 0.5, F.lit(0.0)
            )
            / F.col("sigma"),
        )
        return zs.select(
            "n1",
            "n2",
            F.round("u", 1).alias("u_stat"),
            F.round("z", 6).alias("z_score"),
            F.round(F.least(F.expr(_MW_TAIL), F.lit(1.0)), 6).alias(
                "p_value"
            ),
        )

    _fmt(q_mann_whitney, KS_SPLIT=KS_SPLIT)


_register_mw()


# ---------------------------------------------------------------------------
# Cramér's V categorical-association matrix — round 15
# ---------------------------------------------------------------------------
# q_fd_audit detects EXACT functional dependencies; real columns are
# usually only statistically entangled. Cramér's V (bias-naive,
# chi-square based, 0 = independent, 1 = determined) is the standard
# pairwise number, computed here for every ordered pair of a declared
# audit list in the same single-scan melt shape as q_fd_audit: one
# stack to (pair, a, b) rows, one aggregate to contingency cells, and
# margins/totals joined back from the grouped frame. Per-cell
# chi-square terms are rounded then summed as exact decimals, so the
# statistic clears float summation order.

#: audited categorical columns over orders: name -> SQL expression
CV_COLS = {
    "status": "o_orderstatus",
    "priority": "o_orderpriority",
    "year": "CAST(year(o_orderdate) AS VARCHAR)",
}


def _cv_oracle() -> str:
    pairs = [
        (a, b)
        for i, a in enumerate(CV_COLS)
        for j, b in enumerate(CV_COLS)
        if i < j
    ]
    melt = "\n        UNION ALL ".join(
        f"SELECT '{a}|{b}' AS pair, {CV_COLS[a]} AS va,"
        f" {CV_COLS[b]} AS vb FROM orders"
        for a, b in pairs
    )
    return f"""
    WITH m AS ({melt}),
    cells AS (
        SELECT pair, va, vb, CAST(COUNT(*) AS BIGINT) AS n
        FROM m GROUP BY pair, va, vb
    ),
    rowm AS (
        SELECT pair, va, CAST(SUM(n) AS BIGINT) AS ra
        FROM cells GROUP BY pair, va
    ),
    colm AS (
        SELECT pair, vb, CAST(SUM(n) AS BIGINT) AS cb
        FROM cells GROUP BY pair, vb
    ),
    tot AS (
        SELECT pair, CAST(SUM(n) AS BIGINT) AS nn,
               CAST(COUNT(DISTINCT va) AS BIGINT) AS r,
               CAST(COUNT(DISTINCT vb) AS BIGINT) AS c
        FROM cells GROUP BY pair
    ),
    terms AS (
        SELECT cells.pair,
               CAST(round(
                   pow(cells.n - CAST(rowm.ra AS DOUBLE) * colm.cb
                       / tot.nn, 2)
                   / (CAST(rowm.ra AS DOUBLE) * colm.cb / tot.nn), 8)
                   AS DECIMAL(24,8)) AS t
        FROM cells
        JOIN rowm USING (pair, va)
        JOIN colm USING (pair, vb)
        JOIN tot USING (pair)
    )
    SELECT tot.pair, tot.nn AS n_rows, tot.r, tot.c,
           round(CAST(SUM(terms.t) AS DOUBLE), 6) AS chi2,
           round(sqrt(CAST(SUM(terms.t) AS DOUBLE)
                 / (tot.nn * LEAST(tot.r - 1, tot.c - 1))), 6)
             AS cramers_v
    FROM terms JOIN tot USING (pair)
    GROUP BY tot.pair, tot.nn, tot.r, tot.c
    """


def _register_cv() -> None:
    @query("q_cramers_v", oracle=_cv_oracle())
    def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Cramér's V for every pair of the audited categorical
        columns (order status, priority, order year) — the soft
        complement to q_fd_audit's exact dependencies: 0 means
        independent, 1 means one column determines the other, and the
        matrix is what a modeler reads before one-hot-encoding
        redundant columns. One melt (stack) covers all pairs in a
        single scan; contingency cells, margins and totals come from
        grouped frames of that melt; per-cell chi-square terms are
        rounded then summed as exact decimals so the statistic is
        engine-exact.

        Scale: the melt fan-out equals the pair count; cell/margin
        frames are bounded by category cardinalities, not row counts;
        every join after the first aggregate touches only those
        grouped frames."""
        o = read_table(spark, sf_dir, "orders")
        base = o.select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.year("o_orderdate").cast("string").alias("year"),
        )
        names = list(CV_COLS)
        pairs = [
            (a, b)
            for i, a in enumerate(names)
            for j, b in enumerate(names)
            if i < j
        ]
        stack = "stack({}, {}) as (pair, va, vb)".format(
            len(pairs),
            ", ".join(f"'{a}|{b}', {a}, {b}" for a, b in pairs),
        )
        m = base.select(F.expr(stack))
        cells = m.groupBy("pair", "va", "vb").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        rowm = cells.groupBy("pair", "va").agg(
            F.sum("n").cast("long").alias("ra")
        )
        colm = cells.groupBy("pair", "vb").agg(
            F.sum("n").cast("long").alias("cb")
        )
        tot = cells.groupBy("pair").agg(
            F.sum("n").cast("long").alias("nn"),
            F.countDistinct("va").cast("long").alias("r"),
            F.countDistinct("vb").cast("long").alias("c"),
        )
        exp = F.col("ra").cast("double") * F.col("cb") / F.col("nn")
        terms = (
            cells.join(rowm, ["pair", "va"])
            .join(colm, ["pair", "vb"])
            .join(F.broadcast(tot), "pair")
            .select(
                "pair",
                F.round(
                    F.pow(F.col("n") - exp, 2) / exp, 8
                )
                .cast("decimal(24,8)")
                .alias("t"),
            )
        )
        chi = terms.groupBy("pair").agg(
            F.sum("t").cast("double").alias("chi2_raw")
        )
        return chi.join(F.broadcast(tot), "pair").select(
            "pair",
            F.col("nn").alias("n_rows"),
            "r",
            "c",
            F.round("chi2_raw", 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2_raw")
                    / (
                        F.col("nn")
                        * F.least(F.col("r") - 1, F.col("c") - 1)
                    )
                ),
                6,
            ).alias("cramers_v"),
        )

_register_cv()


# ---------------------------------------------------------------------------
# drift battery with FDR control (grouped KS + Benjamini-Hochberg)
# ---------------------------------------------------------------------------
# One KS test answers "did THIS series drift"; a fleet monitor runs
# the test per segment and then must control the multiple-testing
# problem — at p<0.05 across a thousand segments, fifty false alarms
# a day are guaranteed. The standard fix is Benjamini-Hochberg: sort
# the battery's p-values, find the largest k with p_(k) <= (k/m)*Q,
# reject the first k. Here the battery is one KS per event type (the
# q_two_sample_ks machinery with the type as an extra partition key)
# and BH runs as two windows over the |types|-row result frame.

#: BH false-discovery-rate budget
BH_Q = 0.10


def _battery_oracle() -> str:
    return f"""
    WITH v AS (
        SELECT event_type, value,
               CASE WHEN ts < TIMESTAMP '{KS_SPLIT} 00:00:00'
                    THEN 1 ELSE 0 END AS in_a
        FROM events WHERE value IS NOT NULL
    ),
    pts AS (
        SELECT event_type, value,
               CAST(floor(value / {KS_BUCKET}) AS BIGINT) AS b,
               CAST(SUM(in_a) AS BIGINT) AS ca,
               CAST(SUM(1 - in_a) AS BIGINT) AS cb
        FROM v GROUP BY event_type, value
    ),
    bsum AS (
        SELECT event_type, b,
               CAST(SUM(ca) AS BIGINT) AS ba,
               CAST(SUM(cb) AS BIGINT) AS bb
        FROM pts GROUP BY event_type, b
    ),
    offs AS (
        SELECT event_type, b,
               CAST(COALESCE(SUM(ba) OVER (PARTITION BY event_type
                   ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS offa,
               CAST(COALESCE(SUM(bb) OVER (PARTITION BY event_type
                   ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS offb,
               CAST(SUM(SUM(ba)) OVER (PARTITION BY event_type)
                    AS BIGINT) AS n1,
               CAST(SUM(SUM(bb)) OVER (PARTITION BY event_type)
                    AS BIGINT) AS n2
        FROM bsum GROUP BY event_type, b, ba, bb
    ),
    cum AS (
        SELECT pts.event_type, offs.n1, offs.n2,
               offs.offa + SUM(pts.ca) OVER (
                   PARTITION BY pts.event_type, pts.b
                   ORDER BY pts.value ROWS UNBOUNDED PRECEDING) AS cuma,
               offs.offb + SUM(pts.cb) OVER (
                   PARTITION BY pts.event_type, pts.b
                   ORDER BY pts.value ROWS UNBOUNDED PRECEDING) AS cumb
        FROM pts JOIN offs USING (event_type, b)
    ),
    d AS (
        SELECT event_type, MAX(n1) AS n1, MAX(n2) AS n2,
               MAX(ABS(n2 * cuma - n1 * cumb)) AS dnum
        FROM cum GROUP BY event_type
    ),
    stat AS (
        SELECT event_type, n1, n2,
               CAST(dnum AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2) AS dd,
               sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)) AS sne
        FROM d
    ),
    lamf AS (
        SELECT event_type, n1, n2, dd,
               (sne + 0.12 + 0.11 / sne) * dd AS lam
        FROM stat
    ),
    pv AS (
        SELECT event_type, n1, n2, round(dd, 6) AS d_stat,
               round(LEAST(GREATEST(2.0 * ({_KS_SERIES}), 0.0), 1.0), 6)
                 AS p_value
        FROM lamf
    ),
    ranked AS (
        SELECT pv.*,
               ROW_NUMBER() OVER (ORDER BY p_value, event_type)
                 AS bh_rank,
               CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM pv
    ),
    cut AS (
        SELECT ranked.*,
               MAX(CASE WHEN p_value <= bh_rank * {BH_Q} / m
                        THEN bh_rank ELSE 0 END) OVER () AS k_star
        FROM ranked
    )
    SELECT event_type, n1, n2, d_stat, p_value,
           CAST(bh_rank AS INT) AS bh_rank,
           round(bh_rank * {BH_Q} / m, 6) AS bh_threshold,
           bh_rank <= k_star AS rejected
    FROM cut
    """


def _register_battery() -> None:
    from pyspark.sql import Window

    @query("q_drift_battery", oracle=_battery_oracle())
    def q_drift_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The fleet version of q_two_sample_ks: one exact KS test
        PER EVENT TYPE (the same two-level distributed ECDF with the
        type as an extra partition key) followed by Benjamini-
        Hochberg at Q={BH_Q} over the battery — p-values rank in one
        window, the step-up cutoff k* in a second, and ``rejected``
        marks the types whose drift survives FDR control. This is
        the monitoring shape that scales: per-segment tests are
        embarrassingly parallel, and the correction runs on the
        |segments|-row result frame.

        Scale: identical per-type cost to q_two_sample_ks (windows
        inside (type, bucket) partitions, |type x bucket| stitch
        frame); the BH windows touch |types| rows. A thousand
        segments is a thousand independent partitions and a
        1000-row correction frame."""
        ev = (
            read_table(spark, sf_dir, "events")
            .where(F.col("value").isNotNull())
            .select(
                "event_type",
                "value",
                F.when(
                    F.col("ts") < F.lit(KS_SPLIT).cast("timestamp"), 1
                )
                .otherwise(0)
                .alias("in_a"),
            )
        )
        pts = ev.groupBy("event_type", "value").agg(
            F.sum("in_a").cast("long").alias("ca"),
            F.sum(1 - F.col("in_a")).cast("long").alias("cb"),
        ).withColumn(
            "b", F.floor(F.col("value") / KS_BUCKET).cast("long")
        )
        bsum = pts.groupBy("event_type", "b").agg(
            F.sum("ca").cast("long").alias("ba"),
            F.sum("cb").cast("long").alias("bb"),
        )
        wt = Window.partitionBy("event_type")
        woff = wt.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
        offs = bsum.select(
            "event_type",
            "b",
            F.coalesce(F.sum("ba").over(woff), F.lit(0))
            .cast("long")
            .alias("offa"),
            F.coalesce(F.sum("bb").over(woff), F.lit(0))
            .cast("long")
            .alias("offb"),
            F.sum("ba").over(wt).cast("long").alias("n1"),
            F.sum("bb").over(wt).cast("long").alias("n2"),
        )
        wb = (
            Window.partitionBy("event_type", "b")
            .orderBy("value")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = pts.join(offs, ["event_type", "b"]).select(
            "event_type",
            "n1",
            "n2",
            (F.col("offa") + F.sum("ca").over(wb)).alias("cuma"),
            (F.col("offb") + F.sum("cb").over(wb)).alias("cumb"),
        )
        d = cum.groupBy("event_type").agg(
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.max(
                F.abs(
                    F.col("n2") * F.col("cuma")
                    - F.col("n1") * F.col("cumb")
                )
            ).alias("dnum"),
        )
        stat = d.select(
            "event_type",
            "n1",
            "n2",
            (
                F.col("dnum").cast("double")
                / (F.col("n1").cast("double") * F.col("n2"))
            ).alias("dd"),
            F.sqrt(
                F.col("n1").cast("double")
                * F.col("n2")
                / (F.col("n1") + F.col("n2"))
            ).alias("sne"),
        )
        lamf = stat.withColumn(
            "lam",
            (F.col("sne") + 0.12 + 0.11 / F.col("sne")) * F.col("dd"),
        )
        pv = lamf.select(
            "event_type",
            "n1",
            "n2",
            F.round("dd", 6).alias("d_stat"),
            F.round(
                F.least(
                    F.greatest(
                        2.0 * F.expr(_KS_SERIES), F.lit(0.0)
                    ),
                    F.lit(1.0),
                ),
                6,
            ).alias("p_value"),
        )
        wrank = Window.orderBy("p_value", "event_type")
        wall = Window.partitionBy()
        ranked = pv.withColumn(
            "bh_rank", F.row_number().over(wrank)
        ).withColumn("m", F.count(F.lit(1)).over(wall).cast("long"))
        cut = ranked.withColumn(
            "k_star",
            F.max(
                F.when(
                    F.col("p_value")
                    <= F.col("bh_rank") * BH_Q / F.col("m"),
                    F.col("bh_rank"),
                ).otherwise(0)
            ).over(wall),
        )
        return cut.select(
            "event_type",
            "n1",
            "n2",
            "d_stat",
            "p_value",
            F.col("bh_rank").cast("int").alias("bh_rank"),
            F.round(F.col("bh_rank") * BH_Q / F.col("m"), 6).alias(
                "bh_threshold"
            ),
            (F.col("bh_rank") <= F.col("k_star")).alias("rejected"),
        )

    _fmt(q_drift_battery, KS_SPLIT=KS_SPLIT, BH_Q=BH_Q)


_register_battery()


# ---------------------------------------------------------------------------
# mutual information between categorical columns — round 15
# ---------------------------------------------------------------------------
# Cramér's V answers "how far from independent" on the chi-square
# scale; mutual information answers it on the CODING scale — how many
# nats one column's value tells you about the other — and normalized
# MI (by the smaller marginal entropy) is the redundancy number
# feature selection actually thresholds. Same single-scan melt and
# grouped frames as q_cramers_v; per-cell plogp terms are rounded
# then summed as exact decimals.


def _mi_oracle() -> str:
    pairs = [
        (a, b)
        for i, a in enumerate(CV_COLS)
        for j, b in enumerate(CV_COLS)
        if i < j
    ]
    melt = "\n        UNION ALL ".join(
        f"SELECT '{a}|{b}' AS pair, {CV_COLS[a]} AS va,"
        f" {CV_COLS[b]} AS vb FROM orders"
        for a, b in pairs
    )
    return f"""
    WITH m AS ({melt}),
    cells AS (
        SELECT pair, va, vb, CAST(COUNT(*) AS BIGINT) AS n
        FROM m GROUP BY pair, va, vb
    ),
    rowm AS (
        SELECT pair, va, CAST(SUM(n) AS BIGINT) AS ra
        FROM cells GROUP BY pair, va
    ),
    colm AS (
        SELECT pair, vb, CAST(SUM(n) AS BIGINT) AS cb
        FROM cells GROUP BY pair, vb
    ),
    tot AS (
        SELECT pair, CAST(SUM(n) AS BIGINT) AS nn FROM cells
        GROUP BY pair
    ),
    mi AS (
        SELECT cells.pair,
               CAST(SUM(CAST(round(
                   (CAST(cells.n AS DOUBLE) / tot.nn)
                   * ln(CAST(cells.n AS DOUBLE) * tot.nn
                        / (CAST(rowm.ra AS DOUBLE) * colm.cb)), 9)
                   AS DECIMAL(20,9))) AS DOUBLE) AS mi_nats
        FROM cells
        JOIN rowm USING (pair, va)
        JOIN colm USING (pair, vb)
        JOIN tot USING (pair)
        GROUP BY cells.pair
    ),
    ha AS (
        SELECT rowm.pair,
               CAST(SUM(CAST(round(
                   -(CAST(ra AS DOUBLE) / tot.nn)
                   * ln(CAST(ra AS DOUBLE) / tot.nn), 9)
                   AS DECIMAL(20,9))) AS DOUBLE) AS h_a
        FROM rowm JOIN tot USING (pair) GROUP BY rowm.pair
    ),
    hb AS (
        SELECT colm.pair,
               CAST(SUM(CAST(round(
                   -(CAST(cb AS DOUBLE) / tot.nn)
                   * ln(CAST(cb AS DOUBLE) / tot.nn), 9)
                   AS DECIMAL(20,9))) AS DOUBLE) AS h_b
        FROM colm JOIN tot USING (pair) GROUP BY colm.pair
    )
    SELECT mi.pair, tot.nn AS n_rows,
           round(mi.mi_nats, 6) + 0.0 AS mi_nats,
           round(ha.h_a, 6) AS entropy_a,
           round(hb.h_b, 6) AS entropy_b,
           round(mi.mi_nats / LEAST(ha.h_a, hb.h_b), 6) + 0.0
             AS normalized_mi
    FROM mi JOIN ha USING (pair) JOIN hb USING (pair)
    JOIN tot USING (pair)
    """


def _register_mi() -> None:
    @query("q_mutual_information", oracle=_mi_oracle())
    def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Mutual information (nats) and normalized MI for every
        audited categorical column pair — the coding-scale redundancy
        number beside q_cramers_v's chi-square scale and q_fd_audit's
        exact dependencies: NMI 1 means one column is a function of
        the other, 0 means knowing one says nothing about the other.
        Same single-scan melt; MI and both marginal entropies sum
        rounded plogp terms as exact decimals, so the released
        numbers are engine-exact.

        Scale: identical to q_cramers_v — cell/margin frames bounded
        by category cardinalities, one raw scan regardless of how
        many pairs are audited."""
        o = read_table(spark, sf_dir, "orders")
        base = o.select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.year("o_orderdate").cast("string").alias("year"),
        )
        names = list(CV_COLS)
        pairs = [
            (a, b)
            for i, a in enumerate(names)
            for j, b in enumerate(names)
            if i < j
        ]
        stack = "stack({}, {}) as (pair, va, vb)".format(
            len(pairs),
            ", ".join(f"'{a}|{b}', {a}, {b}" for a, b in pairs),
        )
        m = base.select(F.expr(stack))
        cells = m.groupBy("pair", "va", "vb").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        rowm = cells.groupBy("pair", "va").agg(
            F.sum("n").cast("long").alias("ra")
        )
        colm = cells.groupBy("pair", "vb").agg(
            F.sum("n").cast("long").alias("cb")
        )
        tot = cells.groupBy("pair").agg(
            F.sum("n").cast("long").alias("nn")
        )
        dec = "decimal(20,9)"
        mi = (
            cells.join(rowm, ["pair", "va"])
            .join(colm, ["pair", "vb"])
            .join(F.broadcast(tot), "pair")
            .groupBy("pair")
            .agg(
                F.sum(
                    F.round(
                        (F.col("n").cast("double") / F.col("nn"))
                        * F.log(
                            F.col("n").cast("double")
                            * F.col("nn")
                            / (
                                F.col("ra").cast("double")
                                * F.col("cb")
                            )
                        ),
                        9,
                    ).cast(dec)
                )
                .cast("double")
                .alias("mi_nats")
            )
        )
        ha = (
            rowm.join(F.broadcast(tot), "pair")
            .groupBy("pair")
            .agg(
                F.sum(
                    F.round(
                        -(F.col("ra").cast("double") / F.col("nn"))
                        * F.log(
                            F.col("ra").cast("double") / F.col("nn")
                        ),
                        9,
                    ).cast(dec)
                )
                .cast("double")
                .alias("h_a")
            )
        )
        hb = (
            colm.join(F.broadcast(tot), "pair")
            .groupBy("pair")
            .agg(
                F.sum(
                    F.round(
                        -(F.col("cb").cast("double") / F.col("nn"))
                        * F.log(
                            F.col("cb").cast("double") / F.col("nn")
                        ),
                        9,
                    ).cast(dec)
                )
                .cast("double")
                .alias("h_b")
            )
        )
        return (
            mi.join(ha, "pair")
            .join(hb, "pair")
            .join(F.broadcast(tot), "pair")
            .select(
                "pair",
                F.col("nn").alias("n_rows"),
                (F.round("mi_nats", 6) + F.lit(0.0)).alias("mi_nats"),
                F.round("h_a", 6).alias("entropy_a"),
                F.round("h_b", 6).alias("entropy_b"),
                (
                    F.round(
                        F.col("mi_nats")
                        / F.least(F.col("h_a"), F.col("h_b")),
                        6,
                    )
                    + F.lit(0.0)
                ).alias("normalized_mi"),
            )
        )


_register_mi()
