"""Diagnostic analytics: the "why did the metric move" toolbox.

Dashboards built on the lake (SURVEY §2C product-analytics families)
answer WHAT changed; these operators answer WHY — the
feature-screening, decomposition, and audit shapes an analyst reaches
for next:

* ``q_woe_iv`` — weight-of-evidence / information-value screen of
  candidate features against a binary outcome, all features in ONE
  melt pass (the q_fd_audit stack pattern applied to supervised
  screening);
* ``q_theilsen_slope`` — per-group robust trend: median of pairwise
  slopes (Theil–Sen), immune to the outlier days that wreck the
  least-squares fits (q_grouped_regression/q_holt_trend);
* ``q_metric_bridge`` — period-over-period revenue change decomposed
  into volume / rate / mix effects per segment, the BI "bridge"
  waterfall;
* ``q_simpson_scan`` — aggregation-reversal audit: strata where the
  stratified effect contradicts the pooled effect (Simpson's
  paradox), the standing guard against drawing conclusions from
  marginal rates;
* ``q_assoc_rules`` — directional association rules over order
  baskets with support/confidence/lift, the market-basket classic;
* ``q_multitouch_attribution`` — conversion credit assigned to
  preceding touches under first/last/linear models in one pass.

Scale notes per query in the docstrings; the common discipline is
exact-decimal partial sums for anything summed across engines (float
addition is order-sensitive; DECIMAL(18,6) partials are not) and
single-scan melts where a family of statistics shares an input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.registry import format_doc, query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

# ---------------------------------------------------------------------------
# WOE / IV feature screen
# ---------------------------------------------------------------------------

#: screened features: name -> (Spark Column factory, DuckDB SQL expr),
#: all cast to string so the melt is type-uniform. The outcome is
#: l_returnflag = 'R' (the line was returned).
WOE_SMOOTH = 0.5


def _woe_oracle() -> str:
    feats = {
        "discount_bin": (
            "CAST(CAST(round(l_discount * 100) AS INT) AS VARCHAR)"
        ),
        "quantity_bin": (
            "CAST(CAST(floor(l_quantity / 10) AS INT) AS VARCHAR)"
        ),
        "ship_month": "CAST(month(l_shipdate) AS VARCHAR)",
        "linestatus": "l_linestatus",
    }
    melt = "\n UNION ALL ".join(
        f"SELECT '{name}' AS feature, {expr} AS bin, bad FROM base"
        for name, expr in feats.items()
    )
    s = WOE_SMOOTH
    return f"""
    WITH base AS (
        SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS bad, *
        FROM lineitem
    ),
    m AS ({melt}),
    g AS (
        SELECT feature, bin,
               CAST(SUM(bad) AS BIGINT) AS n_bad,
               CAST(COUNT(*) - SUM(bad) AS BIGINT) AS n_good
        FROM m GROUP BY feature, bin
    ),
    t AS (
        SELECT g.*,
               SUM(n_good) OVER (PARTITION BY feature) AS tg,
               SUM(n_bad) OVER (PARTITION BY feature) AS tb
        FROM g
    ),
    w AS (
        SELECT feature, bin, n_good, n_bad,
               ln(((n_good + {s}) / tg) / ((n_bad + {s}) / tb)) AS woe,
               (CAST(n_good AS DOUBLE) / tg - CAST(n_bad AS DOUBLE) / tb)
                 * ln(((n_good + {s}) / tg) / ((n_bad + {s}) / tb))
                 AS iv_term
        FROM t
    )
    SELECT feature, bin, n_good, n_bad,
           round(woe, 6) + 0.0 AS woe,
           round(iv_term, 6) + 0.0 AS iv_term,
           CAST(SUM(CAST(round(iv_term, 6) AS DECIMAL(18,6)))
                OVER (PARTITION BY feature) AS DOUBLE) AS feature_iv
    FROM w
    """


@query("q_woe_iv", oracle=_woe_oracle())
def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value screen of four
    candidate features (discount bin, quantity decile, ship month,
    linestatus) against the binary outcome "line was returned" — the
    credit-scoring feature-selection classic. ALL features share ONE
    scan: rows melt to (feature, bin, outcome) with a bounded stack
    (the q_fd_audit pattern, supervised), one aggregate counts
    good/bad per bin, and feature totals ride a window over the
    grouped frame. WOE uses +{WOE_SMOOTH} smoothing so empty cells
    stay finite; the per-feature IV — the ranking number — sums the
    ROUNDED per-bin terms as exact decimals, so the cross-engine hash
    cannot drift with float summation order.

    Scale: the melt fan-out equals the feature count (the cost dial);
    the aggregate's key space is sum of per-feature bin counts; the
    window runs over that bounded grouped frame, never the raw rows.
    Screening K features costs one scan, not K."""
    li = read_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("bad"),
        F.round(F.col("l_discount") * 100)
        .cast("int")
        .cast("string")
        .alias("discount_bin"),
        F.floor(F.col("l_quantity") / 10)
        .cast("int")
        .cast("string")
        .alias("quantity_bin"),
        F.month("l_shipdate").cast("string").alias("ship_month"),
        F.col("l_linestatus").alias("linestatus"),
    )
    names = ("discount_bin", "quantity_bin", "ship_month", "linestatus")
    stack = "stack({}, {}) as (feature, bin)".format(
        len(names), ", ".join(f"'{n}', {n}" for n in names)
    )
    m = base.select("bad", F.expr(stack))
    g = m.groupBy("feature", "bin").agg(
        F.sum("bad").cast("long").alias("n_bad"),
        (F.count(F.lit(1)) - F.sum("bad")).cast("long").alias("n_good"),
    )
    wf = Window.partitionBy("feature")
    t = g.withColumn("tg", F.sum("n_good").over(wf)).withColumn(
        "tb", F.sum("n_bad").over(wf)
    )
    s = F.lit(WOE_SMOOTH)
    woe = F.log(
        ((F.col("n_good") + s) / F.col("tg"))
        / ((F.col("n_bad") + s) / F.col("tb"))
    )
    iv_term = (
        F.col("n_good").cast("double") / F.col("tg")
        - F.col("n_bad").cast("double") / F.col("tb")
    ) * woe
    # + 0.0 normalizes IEEE negative zero (round(-1e-9, 6) is -0.0 in
    # one engine and 0.0 in the other; -0.0 + 0.0 == +0.0 in both)
    w = t.select(
        "feature",
        "bin",
        "n_good",
        "n_bad",
        (F.round(woe, 6) + F.lit(0.0)).alias("woe"),
        (F.round(iv_term, 6) + F.lit(0.0)).alias("iv_term"),
    )
    return w.withColumn(
        "feature_iv",
        F.sum(F.col("iv_term").cast("decimal(18,6)"))
        .over(wf)
        .cast("double"),
    )


format_doc(q_woe_iv, WOE_SMOOTH=WOE_SMOOTH)


# ---------------------------------------------------------------------------
# Theil–Sen robust trend
# ---------------------------------------------------------------------------

#: day-zero for the daily index (the corpus's first event day)
TS_EPOCH = "2024-01-01"


@query(
    "q_theilsen_slope",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '{TS_EPOCH}', CAST(ts AS DATE)) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type,
               (b.v - a.v) / (b.d - a.d) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.d > a.d
    ),
    med AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               quantile_cont(slope, 0.5) AS slope_med
        FROM pairs GROUP BY event_type
    ),
    res AS (
        SELECT daily.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               quantile_cont(daily.v - med.slope_med * daily.d, 0.5)
                 AS icept
        FROM daily JOIN med USING (event_type)
        GROUP BY daily.event_type
    )
    SELECT med.event_type, res.n_days, med.n_pairs,
           round(med.slope_med, 6) AS slope,
           round(res.icept, 6) AS intercept
    FROM med JOIN res USING (event_type)
    """,
)
def q_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust daily trend: the Theil–Sen estimator —
    median over all pairwise slopes of the (day, daily-value) series,
    intercept = median residual at that slope. Unlike the
    least-squares fits (q_grouped_regression, q_holt_trend) a third
    of the days can be arbitrarily corrupted before the estimate
    moves. Daily values are exact-decimal sums, so both engines
    divide identical doubles; the median is the interpolating
    midpoint in both (percentile / quantile_cont share the R-type-7
    convention).

    Scale: pair generation is the cost dial — it is a self-join of
    the per-group DAILY aggregate (|days| rows per group), so pairs
    are |days|^2 per group, never |rows|^2; for long histories the
    standard cap is a trailing window over days. The daily aggregate
    itself is one map-side-combined shuffle; slope medians reduce
    |days|^2-bounded frames per group."""
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit(TS_EPOCH)).alias("d"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.d") > F.col("a.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.v") - F.col("a.v")) / (F.col("b.d") - F.col("a.d"))).alias(
            "slope"
        ),
    )
    med = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("slope_med"),
    )
    res = (
        daily.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.expr("percentile(v - slope_med * d, 0.5)").alias("icept"),
        )
    )
    return med.join(res, "event_type").select(
        "event_type",
        "n_days",
        "n_pairs",
        F.round("slope_med", 6).alias("slope"),
        F.round("icept", 6).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# metric bridge (volume / rate / mix decomposition)
# ---------------------------------------------------------------------------

#: compared periods (order years)
BRIDGE_Y1, BRIDGE_Y2 = 1996, 1997


@query(
    "q_metric_bridge",
    oracle=f"""
    WITH base AS (
        SELECT n_name,
               year(o_orderdate) AS y,
               CAST(l_quantity AS DECIMAL(18,6)) AS qty,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                 AS rev
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE year(o_orderdate) IN ({BRIDGE_Y1}, {BRIDGE_Y2})
    ),
    g AS (
        SELECT n_name,
               CAST(SUM(CASE WHEN y = {BRIDGE_Y1} THEN qty END) AS DOUBLE)
                 AS u1,
               CAST(SUM(CASE WHEN y = {BRIDGE_Y2} THEN qty END) AS DOUBLE)
                 AS u2,
               CAST(SUM(CASE WHEN y = {BRIDGE_Y1} THEN rev END) AS DOUBLE)
                 AS rev1,
               CAST(SUM(CASE WHEN y = {BRIDGE_Y2} THEN rev END) AS DOUBLE)
                 AS rev2
        FROM base GROUP BY n_name
    ),
    r AS (
        SELECT n_name,
               COALESCE(u1, 0) AS u1, COALESCE(u2, 0) AS u2,
               COALESCE(rev1, 0) AS rev1, COALESCE(rev2, 0) AS rev2,
               CASE WHEN COALESCE(u1, 0) > 0 THEN rev1 / u1 ELSE 0 END
                 AS r1,
               CASE WHEN COALESCE(u2, 0) > 0 THEN rev2 / u2 ELSE 0 END
                 AS r2
        FROM g
    )
    SELECT n_name,
           round(rev1, 4) AS rev_y1,
           round(rev2, 4) AS rev_y2,
           round(rev2 - rev1, 4) AS delta,
           round((u2 - u1) * r1, 4) AS volume_effect,
           round((r2 - r1) * u1, 4) AS rate_effect,
           round((u2 - u1) * (r2 - r1), 4) AS mix_effect
    FROM r
    """,
)
def q_metric_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BI bridge waterfall: per nation, the {BRIDGE_Y1}->
    {BRIDGE_Y2} revenue change decomposed into volume effect
    ((u2-u1) * r1: units moved at old rates), rate effect
    ((r2-r1) * u1: rates moved on old units) and the mix/interaction
    remainder — the three bars that sum exactly to delta, turning
    "revenue fell" into "volume fell, rates held". Both periods
    aggregate in ONE pass (conditional sums, no second scan); per-
    period sums are exact decimals so both engines derive identical
    rates and effects.

    Scale: one join chain lineitem->orders->customer->nation (the q5
    shuffle shape, dimensions broadcast when they fit) feeding one
    map-side-combined aggregate keyed by segment; the decomposition
    arithmetic runs on the |segments|-row grouped frame."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate").isin(BRIDGE_Y1, BRIDGE_Y2)
    )
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").alias("y"),
            F.col("l_quantity").cast("decimal(18,6)").alias("qty"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,6)")
            .alias("rev"),
        )
    )
    g = base.groupBy("n_name").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("y") == yy, F.col(col)))
                .cast("double"),
                F.lit(0.0),
            ).alias(name)
            for yy, col, name in (
                (BRIDGE_Y1, "qty", "u1"),
                (BRIDGE_Y2, "qty", "u2"),
                (BRIDGE_Y1, "rev", "rev1"),
                (BRIDGE_Y2, "rev", "rev2"),
            )
        ]
    )
    r1 = F.when(F.col("u1") > 0, F.col("rev1") / F.col("u1")).otherwise(0.0)
    r2 = F.when(F.col("u2") > 0, F.col("rev2") / F.col("u2")).otherwise(0.0)
    g = g.withColumn("r1", r1).withColumn("r2", r2)
    return g.select(
        "n_name",
        F.round("rev1", 4).alias("rev_y1"),
        F.round("rev2", 4).alias("rev_y2"),
        F.round(F.col("rev2") - F.col("rev1"), 4).alias("delta"),
        F.round((F.col("u2") - F.col("u1")) * F.col("r1"), 4).alias(
            "volume_effect"
        ),
        F.round((F.col("r2") - F.col("r1")) * F.col("u1"), 4).alias(
            "rate_effect"
        ),
        F.round(
            (F.col("u2") - F.col("u1")) * (F.col("r2") - F.col("r1")), 4
        ).alias("mix_effect"),
    )


format_doc(q_metric_bridge, BRIDGE_Y1=BRIDGE_Y1, BRIDGE_Y2=BRIDGE_Y2)


# ---------------------------------------------------------------------------
# Simpson's-paradox scan
# ---------------------------------------------------------------------------


@query(
    "q_simpson_scan",
    oracle="""
    WITH j AS (
        SELECT p_brand,
               CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS promo,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    g AS (
        SELECT COALESCE(p_brand, 'ALL') AS stratum,
               CAST(SUM(promo) AS BIGINT) AS n_promo,
               CAST(SUM(1 - promo) AS BIGINT) AS n_nonpromo,
               CAST(SUM(promo * ret) AS BIGINT) AS n_promo_ret,
               CAST(SUM((1 - promo) * ret) AS BIGINT) AS n_nonpromo_ret
        FROM j GROUP BY ROLLUP(p_brand)
    ),
    r AS (
        SELECT g.*,
               CASE WHEN n_promo > 0
                    THEN CAST(n_promo_ret AS DOUBLE) / n_promo END
                 AS rate_promo,
               CASE WHEN n_nonpromo > 0
                    THEN CAST(n_nonpromo_ret AS DOUBLE) / n_nonpromo END
                 AS rate_nonpromo
        FROM g
    ),
    d AS (
        SELECT r.*, rate_promo - rate_nonpromo AS diff,
               MAX(CASE WHEN stratum = 'ALL'
                        THEN rate_promo - rate_nonpromo END) OVER ()
                 AS overall_diff
        FROM r
    )
    SELECT stratum, n_promo, n_nonpromo, n_promo_ret, n_nonpromo_ret,
           round(rate_promo, 6) AS rate_promo,
           round(rate_nonpromo, 6) AS rate_nonpromo,
           round(diff, 6) AS diff,
           round(overall_diff, 6) AS overall_diff,
           COALESCE(sign(diff) * sign(overall_diff) < 0, FALSE)
             AS reversed
    FROM d
    """,
)
def q_simpson_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation-reversal audit (Simpson's paradox): does the
    pooled promo-vs-nonpromo return-rate difference keep its sign
    inside every brand stratum? One ROLLUP aggregate computes all
    strata AND the pooled row in a single scan; the pooled difference
    rides back onto every stratum via a window over the
    |strata|+1-row grouped frame, and ``reversed`` flags each
    stratum whose stratified effect contradicts the marginal one —
    the standing guard against acting on a confounded rate.

    Scale: one lineitem->part join (dimension broadcast when it
    fits) into one map-side-combined ROLLUP aggregate; the reversal
    logic touches only the grouped frame. Adding strata columns
    extends the same single scan (the grouping-set lattice is the
    dial)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey).select(
        "p_brand",
        F.when(F.col("p_type").startswith("PROMO"), 1)
        .otherwise(0)
        .alias("promo"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    g = (
        j.rollup("p_brand")
        .agg(
            F.sum("promo").cast("long").alias("n_promo"),
            F.sum(1 - F.col("promo")).cast("long").alias("n_nonpromo"),
            F.sum(F.col("promo") * F.col("ret"))
            .cast("long")
            .alias("n_promo_ret"),
            F.sum((1 - F.col("promo")) * F.col("ret"))
            .cast("long")
            .alias("n_nonpromo_ret"),
        )
        .select(
            F.coalesce(F.col("p_brand"), F.lit("ALL")).alias("stratum"),
            "n_promo",
            "n_nonpromo",
            "n_promo_ret",
            "n_nonpromo_ret",
        )
    )
    rate_p = F.when(
        F.col("n_promo") > 0,
        F.col("n_promo_ret").cast("double") / F.col("n_promo"),
    )
    rate_n = F.when(
        F.col("n_nonpromo") > 0,
        F.col("n_nonpromo_ret").cast("double") / F.col("n_nonpromo"),
    )
    r = g.withColumn("rate_promo", rate_p).withColumn(
        "rate_nonpromo", rate_n
    )
    # |strata|+1-row frame: the un-partitioned window is deliberate
    wall = Window.partitionBy()
    d = r.withColumn(
        "diff", F.col("rate_promo") - F.col("rate_nonpromo")
    ).withColumn(
        "overall_diff",
        F.max(
            F.when(F.col("stratum") == "ALL", F.col("rate_promo") - F.col("rate_nonpromo"))
        ).over(wall),
    )
    return d.select(
        "stratum",
        "n_promo",
        "n_nonpromo",
        "n_promo_ret",
        "n_nonpromo_ret",
        F.round("rate_promo", 6).alias("rate_promo"),
        F.round("rate_nonpromo", 6).alias("rate_nonpromo"),
        F.round("diff", 6).alias("diff"),
        F.round("overall_diff", 6).alias("overall_diff"),
        F.coalesce(
            F.signum("diff") * F.signum("overall_diff") < 0, F.lit(False)
        ).alias("reversed"),
    )


# ---------------------------------------------------------------------------
# association rules over order baskets
# ---------------------------------------------------------------------------

#: relative minimum support for a directional rule
AR_MINSUP = 0.01


@query(
    "q_assoc_rules",
    oracle=f"""
    WITH b AS (
        SELECT DISTINCT l_orderkey AS ok, p_brand AS item
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    nn AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM b),
    ic AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item
           FROM b GROUP BY item),
    pc AS (
        SELECT a.item AS antecedent, c.item AS consequent,
               CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM b a JOIN b c ON a.ok = c.ok AND a.item <> c.item
        GROUP BY a.item, c.item
    )
    SELECT pc.antecedent, pc.consequent, pc.n_ab,
           round(CAST(pc.n_ab AS DOUBLE) / nn.n, 6) AS support,
           round(CAST(pc.n_ab AS DOUBLE) / ia.n_item, 6) AS confidence,
           round((CAST(pc.n_ab AS DOUBLE) / ia.n_item)
                 / (CAST(ic2.n_item AS DOUBLE) / nn.n), 6) AS lift
    FROM pc
    JOIN ic ia ON pc.antecedent = ia.item
    JOIN ic ic2 ON pc.consequent = ic2.item
    CROSS JOIN nn
    WHERE CAST(pc.n_ab AS DOUBLE) / nn.n >= {AR_MINSUP}
    """,
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules A -> B over order baskets (items
    = part brands): support, confidence, and lift for every ordered
    pair co-occurring in at least {AR_MINSUP:.0%} of baskets — the
    market-basket classic behind "customers who bought X". Distinct
    from q_item_similarity (symmetric cosine for neighborhoods):
    rules are DIRECTIONAL and the decision numbers are
    confidence (P(B|A)) and lift (confidence over B's base rate).

    Scale: ONE shuffle on the order key builds the deduplicated
    baskets (map-side-merged collect_set), then pair generation is a
    bounded double explode over the basket arrays — cost is sum of
    per-basket item-count squared (the basket-size dial) with no
    second shuffle; item frequencies and the basket total are
    |items|-sized broadcasts off the same pinned basket table. The
    support prune is relative, so the rule surface is scale-free."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    # round 18: ONE shuffle builds the deduplicated baskets directly —
    # groupBy(ok).collect_set(item) replaces distinct() + a second
    # shuffle (self-join on ok in r16, collect_list in r17): the
    # partial collect_sets merge map-side, so the exchange carries one
    # (ok, set) row per basket instead of one row per distinct
    # (ok, item). The r17 in-row transform/filter HOF pair expansion
    # REGRESSED (interpreted expression eval + collect_list buffering
    # lost to the codegen'd self-join: driver sf1 12.7 -> 16.3 s); the
    # pair expansion is now two codegen'd explodes (GenerateExec), A/B
    # measured at sf0.1 AND sf1 against both prior forms (hash-equal,
    # warm sf1 ~13.2 -> ~10 s).
    baskets = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("item"))
        .groupBy("ok")
        .agg(F.collect_set("item").alias("items"))
    ).localCheckpoint(eager=False)
    # basket total and per-item basket counts derive from the pinned
    # basket table (collect_set already deduplicated per basket, so the
    # explode re-creates exactly the distinct (ok, item) relation)
    nn = baskets.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ic = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("n_item"))
    )
    # Apriori prune (anti-monotonicity): a pair reaching AR_MINSUP needs
    # BOTH items individually at AR_MINSUP. The antecedent stream is
    # semi-joined to the frequent items; the consequent side needs no
    # prune for correctness (n_ab <= n_consequent, so the post-agg
    # support filter below drops those pairs) — result-invisibility is
    # unchanged and the oracle proves it.
    freq = (
        ic.crossJoin(F.broadcast(nn))
        .where(F.col("n_item").cast("double") / F.col("n") >= AR_MINSUP)
        .select("item")
    )
    ants = baskets.select(F.explode("items").alias("antecedent"), "items").join(
        F.broadcast(freq.withColumnRenamed("item", "antecedent")),
        "antecedent",
        "semi",
    )
    pc = (
        ants.select("antecedent", F.explode("items").alias("consequent"))
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    ia = ic.select(
        F.col("item").alias("antecedent"), F.col("n_item").alias("n_a")
    )
    ib = ic.select(
        F.col("item").alias("consequent"), F.col("n_item").alias("n_b")
    )
    out = (
        pc.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ib), "consequent")
        .crossJoin(F.broadcast(nn))
        .where(F.col("n_ab").cast("double") / F.col("n") >= AR_MINSUP)
    )
    conf = F.col("n_ab").cast("double") / F.col("n_a")
    return out.select(
        "antecedent",
        "consequent",
        "n_ab",
        F.round(F.col("n_ab").cast("double") / F.col("n"), 6).alias(
            "support"
        ),
        F.round(conf, 6).alias("confidence"),
        F.round(
            conf / (F.col("n_b").cast("double") / F.col("n")), 6
        ).alias("lift"),
    )


format_doc(q_assoc_rules, AR_MINSUP=AR_MINSUP)


# ---------------------------------------------------------------------------
# multi-touch attribution
# ---------------------------------------------------------------------------

#: attribution lookback (seconds) and channel count derived from the
#: click's campaign key (props.k)
MTA_WINDOW_S = 3600
MTA_CHANNELS = 5


@query(
    "q_multitouch_attribution",
    oracle=f"""
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts, value
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts AS cts, event_id AS cid,
               CAST(CAST(json_extract_string(props, '$.k') AS BIGINT)
                    % {MTA_CHANNELS} AS VARCHAR) AS channel
        FROM events WHERE event_type = 'click'
    ),
    j AS (
        SELECT p.pid, p.value, c.cts, c.cid,
               COALESCE(c.channel, 'none') AS channel,
               CAST(COUNT(c.cid) OVER (PARTITION BY p.pid) AS BIGINT)
                 AS n_clicks,
               ROW_NUMBER() OVER (
                   PARTITION BY p.pid ORDER BY c.cts, c.cid
               ) AS rn_f,
               ROW_NUMBER() OVER (
                   PARTITION BY p.pid ORDER BY c.cts DESC, c.cid DESC
               ) AS rn_l
        FROM p LEFT JOIN c
          ON p.user_id = c.user_id
         AND c.cts < p.pts
         AND c.cts >= p.pts - INTERVAL {MTA_WINDOW_S} SECONDS
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(round(value / GREATEST(n_clicks, 1), 6)
                         AS DECIMAL(18,6))) AS DOUBLE) AS linear_credit,
           CAST(SUM(CASE WHEN rn_f = 1
                         THEN CAST(value AS DECIMAL(18,6)) END)
                AS DOUBLE) AS first_credit,
           CAST(SUM(CASE WHEN rn_l = 1
                         THEN CAST(value AS DECIMAL(18,6)) END)
                AS DOUBLE) AS last_credit
    FROM j GROUP BY channel
    """,
)
def q_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion credit per channel under three attribution models
    in ONE pass: every purchase is joined to the same user's clicks
    in the preceding {MTA_WINDOW_S} s (channel = campaign key mod
    {MTA_CHANNELS} from the click's props), and each click row earns
    linear credit (value / touches), first-touch credit, and
    last-touch credit simultaneously via two row_numbers over the
    per-purchase frame — purchases with no touches credit 'none', so
    every model's column sums to total purchase value. Credits sum
    as exact decimals (rounded per-row first), so the cross-engine
    hash cannot drift with float summation order.

    Scale: the join is per-user (equi on user_id + time-range
    predicate), the q_stream_attribution shape — sort-merge on the
    user key, per-user sorted runs, no global structure; windows
    partition by purchase. The streaming twin is the watermarked
    stream-stream interval join already proven by
    q_stream_attribution."""
    ev = read_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puid"),
        F.col("ts").alias("pts"),
        "value",
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cuid"),
        F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
        (
            F.get_json_object("props", "$.k").cast("bigint")
            % MTA_CHANNELS
        )
        .cast("string")
        .alias("channel"),
    )
    j = p.join(
        c,
        (F.col("puid") == F.col("cuid"))
        & (F.col("cts") < F.col("pts"))
        & (
            F.col("cts")
            >= F.col("pts") - F.expr(f"INTERVAL {MTA_WINDOW_S} SECONDS")
        ),
        "left",
    )
    wp = Window.partitionBy("pid")
    j = (
        j.withColumn("n_clicks", F.count("cid").over(wp))
        .withColumn(
            "rn_f",
            F.row_number().over(wp.orderBy(F.asc("cts"), F.asc("cid"))),
        )
        .withColumn(
            "rn_l",
            F.row_number().over(
                wp.orderBy(F.desc("cts"), F.desc("cid"))
            ),
        )
        .withColumn("channel", F.coalesce("channel", F.lit("none")))
    )
    dec = "decimal(18,6)"
    return j.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.countDistinct("pid").cast("long").alias("n_purchases"),
        F.sum(
            F.round(
                F.col("value") / F.greatest(F.col("n_clicks"), F.lit(1)),
                6,
            ).cast(dec)
        )
        .cast("double")
        .alias("linear_credit"),
        F.sum(F.when(F.col("rn_f") == 1, F.col("value").cast(dec)))
        .cast("double")
        .alias("first_credit"),
        F.sum(F.when(F.col("rn_l") == 1, F.col("value").cast(dec)))
        .cast("double")
        .alias("last_credit"),
    )


format_doc(
    q_multitouch_attribution,
    MTA_WINDOW_S=MTA_WINDOW_S,
    MTA_CHANNELS=MTA_CHANNELS,
)


# ---------------------------------------------------------------------------
# quantile normalization across groups
# ---------------------------------------------------------------------------

#: pooled reference grid: percentiles 0..100
QN_GRID = 101


def _qn_grid_sql() -> str:
    return "[0.0,0.01,0.02,0.03,0.04,0.05,0.06,0.07,0.08,0.09,0.1,0.11,0.12,0.13,0.14,0.15,0.16,0.17,0.18,0.19,0.2,0.21,0.22,0.23,0.24,0.25,0.26,0.27,0.28,0.29,0.3,0.31,0.32,0.33,0.34,0.35,0.36,0.37,0.38,0.39,0.4,0.41,0.42,0.43,0.44,0.45,0.46,0.47,0.48,0.49,0.5,0.51,0.52,0.53,0.54,0.55,0.56,0.57,0.58,0.59,0.6,0.61,0.62,0.63,0.64,0.65,0.66,0.67,0.68,0.69,0.7,0.71,0.72,0.73,0.74,0.75,0.76,0.77,0.78,0.79,0.8,0.81,0.82,0.83,0.84,0.85,0.86,0.87,0.88,0.89,0.9,0.91,0.92,0.93,0.94,0.95,0.96,0.97,0.98,0.99,1.0]"


@query(
    "q_quantile_normalize",
    oracle=f"""
    WITH v AS (
        SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    grid AS (SELECT quantile_cont(value, {_qn_grid_sql()}) AS g FROM v),
    r AS (
        SELECT event_type, value,
               percent_rank() OVER (
                   PARTITION BY event_type ORDER BY value
               ) AS pr
        FROM v
    ),
    m AS (
        SELECT event_type,
               g[LEAST(CAST(floor(pr * 100) AS INT), 99) + 1]
               + (pr * 100 - LEAST(CAST(floor(pr * 100) AS INT), 99))
                 * (g[LEAST(CAST(floor(pr * 100) AS INT), 99) + 2]
                    - g[LEAST(CAST(floor(pr * 100) AS INT), 99) + 1])
                 AS norm
        FROM r CROSS JOIN grid
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(CAST(round(norm, 6) AS DECIMAL(18,6)))
                      AS DOUBLE) / COUNT(*), 6) AS mean_norm,
           round(quantile_cont(norm, 0.25), 6) AS p25,
           round(quantile_cont(norm, 0.5), 6) AS p50,
           round(quantile_cont(norm, 0.75), 6) AS p75
    FROM m GROUP BY event_type
    """,
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of per-group value distributions onto
    the POOLED distribution — the microarray-normalization classic
    applied to feature prep: each value maps through its within-group
    percent rank to the pooled empirical quantile at that rank
    (linear interpolation on a {QN_GRID}-point grid), so after
    normalization every group carries the same marginal distribution
    and only the ORDER of its members is group-specific. The report
    per group (count, mean, quartiles of the normalized values)
    makes the invariant visible: all groups' quartiles collapse onto
    the pooled ones.

    Scale: ranks are per-group windows (one shuffle on the group
    key); the pooled grid is ONE aggregate broadcast as a single row
    — at lake scale swap the exact percentile for the mergeable KLL
    sketch (q_kll_quantiles) and keep the identical mapping. The
    interpolation is pure rowwise arithmetic on broadcast state."""
    v = (
        read_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    grid = v.agg(
        F.expr("percentile(value, array(0.0,0.01,0.02,0.03,0.04,0.05,0.06,0.07,0.08,0.09,0.1,0.11,0.12,0.13,0.14,0.15,0.16,0.17,0.18,0.19,0.2,0.21,0.22,0.23,0.24,0.25,0.26,0.27,0.28,0.29,0.3,0.31,0.32,0.33,0.34,0.35,0.36,0.37,0.38,0.39,0.4,0.41,0.42,0.43,0.44,0.45,0.46,0.47,0.48,0.49,0.5,0.51,0.52,0.53,0.54,0.55,0.56,0.57,0.58,0.59,0.6,0.61,0.62,0.63,0.64,0.65,0.66,0.67,0.68,0.69,0.7,0.71,0.72,0.73,0.74,0.75,0.76,0.77,0.78,0.79,0.8,0.81,0.82,0.83,0.84,0.85,0.86,0.87,0.88,0.89,0.9,0.91,0.92,0.93,0.94,0.95,0.96,0.97,0.98,0.99,1.0))").alias("g")
    )
    pr = F.percent_rank().over(
        Window.partitionBy("event_type").orderBy("value")
    )
    r = v.withColumn("pr", pr)
    idx = F.least(F.floor(F.col("pr") * 100).cast("int"), F.lit(99))
    frac = F.col("pr") * 100 - idx
    norm = F.element_at(F.col("g"), idx + 1) + frac * (
        F.element_at(F.col("g"), idx + 2)
        - F.element_at(F.col("g"), idx + 1)
    )
    m = r.crossJoin(F.broadcast(grid)).withColumn("norm", norm)
    return m.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.round("norm", 6).cast("decimal(18,6)"))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_norm"),
        F.round(F.expr("percentile(norm, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(norm, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(norm, 0.75)"), 6).alias("p75"),
    )


format_doc(q_quantile_normalize, QN_GRID=QN_GRID)


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------

#: scoring anchor (the day after the fixture's last event day)
RFM_ANCHOR = "2024-01-31"

#: CASE ladder for segment labels — ORDER IS THE CONTRACT (first
#: match wins), mirrored verbatim in the oracle
RFM_LABELS = (
    ("champion", "r >= 4 AND f >= 4 AND m >= 4"),
    ("loyal", "f >= 4"),
    ("big_spender", "m >= 4"),
    ("at_risk", "r <= 2 AND f >= 3"),
    ("hibernating", "r <= 2"),
    ("casual", "TRUE"),
)


def _rfm_oracle() -> str:
    ladder = " ".join(
        f"WHEN {cond} THEN '{lab}'" for lab, cond in RFM_LABELS
    )
    return f"""
    WITH u AS (
        SELECT user_id,
               date_diff('day', CAST(MAX(ts) AS DATE),
                         DATE '{RFM_ANCHOR}') AS rec,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS mon
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ),
    s AS (
        SELECT user_id, rec, freq, mon,
               6 - NTILE(5) OVER (ORDER BY rec, user_id) AS r,
               NTILE(5) OVER (ORDER BY freq, user_id) AS f,
               NTILE(5) OVER (ORDER BY mon, user_id) AS m
        FROM u
    ),
    lab AS (SELECT s.*, CASE {ladder} END AS segment FROM s)
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           round(CAST(SUM(rec) AS DOUBLE) / COUNT(*), 4)
             AS avg_recency_days,
           round(CAST(SUM(freq) AS DOUBLE) / COUNT(*), 4)
             AS avg_frequency,
           round(CAST(SUM(CAST(round(mon, 6) AS DECIMAL(18,6)))
                      AS DOUBLE) / COUNT(*), 4) AS avg_monetary
    FROM lab GROUP BY segment
    """


@query("q_rfm_segments", oracle=_rfm_oracle())
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the workhorse customer taxonomy: per user,
    recency (days since last purchase at the {RFM_ANCHOR} anchor),
    frequency, and exact-decimal monetary value quintile via
    deterministic NTILE (user_id tie-break, so both engines assign
    identical scores), then a fixed first-match-wins label ladder
    (champion / loyal / big_spender / at_risk / hibernating /
    casual) and a per-segment profile. The ladder is declared ONCE
    and mirrored verbatim in the oracle — label semantics are part
    of the proven contract, not prose.

    Scale: one per-user aggregate (partial+final); the three NTILE
    windows are single-reducer sorts of |users| rows — the
    q_user_value_deciles budget (users << events), and the segment
    profile reduces the same frame. Monetary sums are exact decimals
    end to end."""
    u = (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.lit(RFM_ANCHOR).cast("date"), F.max(F.to_date("ts"))
            ).alias("rec"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("mon"),
        )
    )
    s = (
        u.withColumn(
            "r",
            6 - F.ntile(5).over(Window.orderBy("rec", "user_id")),
        )
        .withColumn(
            "f", F.ntile(5).over(Window.orderBy("freq", "user_id"))
        )
        .withColumn(
            "m", F.ntile(5).over(Window.orderBy("mon", "user_id"))
        )
    )
    # build the CASE ladder in declared order (first match wins)
    ladder = F.expr(
        "CASE "
        + " ".join(
            f"WHEN {cond} THEN '{lab}'" for lab, cond in RFM_LABELS
        )
        + " END"
    )
    lab = s.withColumn("segment", ladder)
    return lab.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(
            F.sum("rec").cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_recency_days"),
        F.round(
            F.sum("freq").cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_frequency"),
        F.round(
            F.sum(F.round("mon", 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("avg_monetary"),
    )


format_doc(q_rfm_segments, RFM_ANCHOR=RFM_ANCHOR)
