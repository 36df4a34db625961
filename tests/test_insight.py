"""Diagnostic-analytics operators: semantic invariants beyond the
oracle hash (bridge adds up, attribution conserves value, Theil–Sen
matches the direct median-of-slopes, rules match hand counts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.insight import (
    q_assoc_rules,
    q_metric_bridge,
    q_multitouch_attribution,
    q_simpson_scan,
    q_theilsen_slope,
    q_woe_iv,
)
from dynamodb_streaming_datalake_spark.registry import ORACLE
from dynamodb_streaming_datalake_spark.sources.readers import read_table
from tests.oracle_utils import compare_query


@pytest.mark.parametrize(
    "name,fn",
    [
        ("q_woe_iv", q_woe_iv),
        ("q_theilsen_slope", q_theilsen_slope),
        ("q_metric_bridge", q_metric_bridge),
        ("q_simpson_scan", q_simpson_scan),
        ("q_assoc_rules", q_assoc_rules),
        ("q_multitouch_attribution", q_multitouch_attribution),
    ],
)
def test_oracle_parity_smoke(spark, sf_smoke, name, fn):
    compare_query(spark, sf_smoke, name, fn, ORACLE[name])


def test_bridge_effects_sum_to_delta(spark, sf_smoke):
    """volume + rate + mix must reconstruct delta to rounding noise —
    the property that makes the waterfall a decomposition, not three
    unrelated numbers."""
    for r in q_metric_bridge(spark, sf_smoke).collect():
        total = r["volume_effect"] + r["rate_effect"] + r["mix_effect"]
        assert abs(total - r["delta"]) < 2e-3
        assert abs(r["delta"] - (r["rev_y2"] - r["rev_y1"])) < 2e-3


def test_woe_iv_matches_direct_computation(spark, sf_smoke):
    """Recompute one feature's WOE/IV from raw counts in Python and
    compare against the melt plan's rows."""
    import math

    li = read_table(spark, sf_smoke, "lineitem").select(
        F.col("l_linestatus").alias("bin"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("bad"),
    )
    counts = {
        r["bin"]: (r["g"], r["b"])
        for r in li.groupBy("bin")
        .agg(
            F.sum(1 - F.col("bad")).alias("g"), F.sum("bad").alias("b")
        )
        .collect()
    }
    tg = sum(g for g, _ in counts.values())
    tb = sum(b for _, b in counts.values())
    rows = {
        r["bin"]: r
        for r in q_woe_iv(spark, sf_smoke)
        .where(F.col("feature") == "linestatus")
        .collect()
    }
    assert rows.keys() == counts.keys()
    for bin_, (g, b) in counts.items():
        woe = math.log(((g + 0.5) / tg) / ((b + 0.5) / tb))
        assert abs(rows[bin_]["woe"] - woe) < 1e-5
        assert rows[bin_]["n_good"] == g and rows[bin_]["n_bad"] == b


def test_theilsen_matches_direct_median_of_slopes(spark, sf_smoke):
    """Slope per group equals the direct median over all pairwise
    slopes of the collected daily series."""
    import statistics

    daily = (
        read_table(spark, sf_smoke, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["d"], r["v"]))
    got = {r["event_type"]: r for r in q_theilsen_slope(spark, sf_smoke).collect()}
    for et, pts in series.items():
        pts.sort()
        slopes = [
            (v2 - v1) / (d2 - d1)
            for i, (d1, v1) in enumerate(pts)
            for d2, v2 in pts[i + 1 :]
        ]
        assert got[et]["n_pairs"] == len(slopes)
        assert abs(got[et]["slope"] - statistics.median(slopes)) < 1e-5


def test_simpson_overall_row_consistency(spark, sf_smoke):
    rows = q_simpson_scan(spark, sf_smoke).collect()
    overall = [r for r in rows if r["stratum"] == "ALL"]
    assert len(overall) == 1
    od = overall[0]["diff"]
    for r in rows:
        assert r["overall_diff"] == od
        if r["diff"] is not None and od is not None:
            want = (r["diff"] > 0) != (od > 0) and r["diff"] != 0 and od != 0
            assert r["reversed"] == want
    # strata counts sum to the pooled row
    assert sum(r["n_promo"] for r in rows if r["stratum"] != "ALL") == (
        overall[0]["n_promo"]
    )


def test_assoc_rule_metrics_match_hand_counts(spark, sf_smoke):
    """Pick the strongest rule and recompute support/confidence/lift
    from the basket relation directly."""
    rules = q_assoc_rules(spark, sf_smoke).collect()
    assert rules, "support threshold prunes everything at smoke scale"
    top = max(rules, key=lambda r: (r["n_ab"], r["antecedent"]))
    li = read_table(spark, sf_smoke, "lineitem")
    p = read_table(spark, sf_smoke, "part")
    b = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("item"))
        .distinct()
    )
    baskets: dict = {}
    for r in b.collect():
        baskets.setdefault(r["ok"], set()).add(r["item"])
    n = len(baskets)
    a, c = top["antecedent"], top["consequent"]
    n_a = sum(1 for s in baskets.values() if a in s)
    n_b = sum(1 for s in baskets.values() if c in s)
    n_ab = sum(1 for s in baskets.values() if a in s and c in s)
    assert top["n_ab"] == n_ab
    assert abs(top["support"] - n_ab / n) < 1e-6
    assert abs(top["confidence"] - n_ab / n_a) < 1e-6
    assert abs(top["lift"] - (n_ab / n_a) / (n_b / n)) < 1e-6


def test_attribution_conserves_purchase_value(spark, sf_smoke):
    """Each model's credits sum (over channels, incl 'none') to the
    total purchase value — attribution redistributes, never creates."""
    rows = q_multitouch_attribution(spark, sf_smoke).collect()
    total = (
        read_table(spark, sf_smoke, "events")
        .where(F.col("event_type") == "purchase")
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("t")
        )
        .collect()[0]["t"]
    )
    n_purch = (
        read_table(spark, sf_smoke, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    for col in ("first_credit", "last_credit"):
        got = sum(r[col] or 0.0 for r in rows)
        assert abs(got - total) < 1e-4, (col, got, total)
    # linear credits are rounded per touch: tolerance scales with rows
    lin = sum(r["linear_credit"] or 0.0 for r in rows)
    assert abs(lin - total) < 1e-4 * max(n_purch, 1)
    assert sum(r["n_purchases"] for r in rows) >= n_purch


def test_rfm_segments_partition_users(spark, sf_smoke):
    """Every purchasing user lands in exactly one segment and the
    ladder's first-match-wins order is honored."""
    from dynamodb_streaming_datalake_spark.operators.insight import (
        q_rfm_segments,
    )

    rows = q_rfm_segments(spark, sf_smoke).collect()
    n_users = (
        read_table(spark, sf_smoke, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    labels = {r["segment"] for r in rows}
    assert labels <= {
        "champion",
        "loyal",
        "big_spender",
        "at_risk",
        "hibernating",
        "casual",
    }
    assert None not in labels


def test_retractable_minmax_forgets_deleted_extremes(spark, sf_smoke):
    """The retractable view must disagree with a monotone
    greatest(max, max) merge wherever a deleted row held the extreme —
    that disagreement is the operator's reason to exist."""
    from dynamodb_streaming_datalake_spark.operators.state import (
        DEL_SPLIT,
        q_retractable_minmax,
    )

    ev = read_table(spark, sf_smoke, "events")
    monotone = {
        r["user_id"]: (r["mn"], r["mx"])
        for r in ev.groupBy("user_id")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    truth = {
        r["user_id"]: (r["mn"], r["mx"], r["n"])
        for r in ev.where(F.col("event_id") % DEL_SPLIT != 0)
        .groupBy("user_id")
        .agg(
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    got = {
        r["user_id"]: (r["min_value"], r["max_value"], r["n_live"])
        for r in q_retractable_minmax(spark, sf_smoke).collect()
    }
    assert got.keys() == truth.keys()
    diffs = 0
    for u, (mn, mx, n) in truth.items():
        assert got[u][2] == n
        assert abs(got[u][0] - mn) < 1e-9 and abs(got[u][1] - mx) < 1e-9
        if (abs(mn - monotone[u][0]) > 1e-12) or (
            abs(mx - monotone[u][1]) > 1e-12
        ):
            diffs += 1
    # the fixture must actually delete some extremes, or this test
    # proves nothing
    assert diffs > 0


def test_pacf_matches_python_durbin_levinson(spark, sf_smoke):
    """Recompute ACF + the Durbin–Levinson recursion in pure Python
    from the collected daily series; every acf/pacf must agree."""
    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        PACF_LAGS,
        q_pacf,
    )

    daily = (
        read_table(spark, sf_smoke, "events")
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("d"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
        .collect()
    )
    by_d = {r["d"]: r["v"] for r in daily}
    d0, d1 = min(by_d), max(by_d)
    x = [by_d.get(d, 0.0) for d in range(d0, d1 + 1)]
    n = len(x)
    m = sum(x) / n
    c = [
        sum((x[t] - m) * (x[t + k] - m) for t in range(n - k))
        for k in range(PACF_LAGS + 1)
    ]
    rho = [c[k] / c[0] for k in range(PACF_LAGS + 1)]
    phi = {1: {1: rho[1]}}
    v = 1 - rho[1] ** 2
    for k in range(2, PACF_LAGS + 1):
        num = rho[k] - sum(
            phi[k - 1][j] * rho[k - j] for j in range(1, k)
        )
        phi[k] = {k: num / v}
        for j in range(1, k):
            phi[k][j] = phi[k - 1][j] - phi[k][k] * phi[k - 1][k - j]
        v = v * (1 - phi[k][k] ** 2)
    got = {r["lag"]: r for r in q_pacf(spark, sf_smoke).collect()}
    assert set(got) == set(range(1, PACF_LAGS + 1))
    for k in range(1, PACF_LAGS + 1):
        assert abs(got[k]["acf"] - rho[k]) < 1e-5, (k, got[k], rho[k])
        assert abs(got[k]["pacf"] - phi[k][k]) < 1e-5
    assert got[1]["acf"] == got[1]["pacf"]


def test_isotonic_matches_python_pav(spark, sf_smoke):
    """The minimax closed form must equal the textbook sequential
    pool-adjacent-violators fit, and be non-decreasing in the score."""
    from dynamodb_streaming_datalake_spark.operators.probe import (
        q_isotonic_calibration,
    )

    rows = sorted(
        q_isotonic_calibration(spark, sf_smoke).collect(),
        key=lambda r: r["score_bin"],
    )
    li = (
        read_table(spark, sf_smoke, "lineitem")
        .groupBy(
            F.round(F.col("l_discount") * 100).cast("int").alias("b")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("pos"),
        )
        .collect()
    )
    bins = sorted((r["b"], r["n"], r["pos"]) for r in li)
    # textbook PAV: pool adjacent violators left to right
    pools = []  # (weight, sum_pos)
    for _, n, pos in bins:
        pools.append((n, pos))
        while len(pools) > 1 and (
            pools[-2][1] / pools[-2][0] > pools[-1][1] / pools[-1][0]
        ):
            w2, p2 = pools.pop()
            w1, p1 = pools.pop()
            pools.append((w1 + w2, p1 + p2))
    # expand pools back to bins
    fit_vals = []
    i = 0
    for w, p in pools:
        consumed = 0
        while consumed < w:
            consumed += bins[i][1]
            fit_vals.append(p / w)
            i += 1
    assert len(fit_vals) == len(rows)
    prev = -1.0
    for r, want in zip(rows, fit_vals):
        assert abs(r["isotonic_rate"] - want) < 1e-6, (r, want)
        assert r["isotonic_rate"] >= prev - 1e-12
        prev = r["isotonic_rate"]


def test_shard_rebalance_ring_beats_mod(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.layout import (
        REB_NODES_NEW,
    )
    from dynamodb_streaming_datalake_spark.registry import all_queries

    rows = {
        r["scheme"]: r
        for r in all_queries()["q_shard_rebalance"](
            spark, sf_smoke
        ).collect()
    }
    assert rows["ring"]["n_keys"] == rows["mod"]["n_keys"]
    # mod-N remaps almost everything; the ring only the new arcs
    assert rows["mod"]["moved_frac"] > 0.8
    assert rows["ring"]["moved_frac"] < 0.25
    # ring movement should be in the neighborhood of 1/(N+1)
    assert abs(rows["ring"]["moved_frac"] - 1 / REB_NODES_NEW) < 0.08


def test_forecast_backtest_matches_python_fold(spark, sf_smoke):
    """Re-run the integer Holt kernel in Python for every origin and
    compare forecasts, errors, and the MAE."""
    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        BT_ORIGINS,
        q_forecast_backtest,
    )

    daily = (
        read_table(spark, sf_smoke, "events")
        .groupBy(
            (
                F.unix_timestamp(F.date_trunc("day", F.col("ts")))
                / F.lit(86400)
            )
            .cast("bigint")
            .alias("d"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(38,6)")) * 1000000)
            .cast("bigint")
            .alias("y6")
        )
        .collect()
    )
    by_d = {r["d"]: r["y6"] for r in daily}
    d0, d1 = min(by_d), max(by_d)
    ys = [by_d.get(d, 0) for d in range(d0, d1 + 1)]
    n = len(ys)

    def trunc_div(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    def fold(prefix):
        lvl, tr = prefix[0], 0
        for y in prefix[1:]:
            new_lvl = trunc_div(y + lvl + tr, 2)
            tr = trunc_div(new_lvl - lvl + 3 * tr, 4)
            lvl = new_lvl
        return lvl, tr

    want = {}
    errs = []
    for o in range(n - BT_ORIGINS, n):
        lvl, tr = fold(ys[:o])
        fc = lvl + tr
        err = abs(fc - ys[o])
        want[o] = (ys[o] / 1e6, fc / 1e6, err / 1e6)
        errs.append(err)
    mae = sum(errs) / (BT_ORIGINS * 1e6)
    got = {
        r["origin"]: r for r in q_forecast_backtest(spark, sf_smoke).collect()
    }
    assert set(got) == set(want)
    for o, (actual, fc, err) in want.items():
        assert abs(got[o]["actual"] - actual) < 1e-6
        assert abs(got[o]["forecast"] - fc) < 1e-6
        assert abs(got[o]["abs_err"] - err) < 1e-6
        assert abs(got[o]["mae"] - mae) < 1e-6


def test_hill_tail_matches_python(spark, sf_smoke):
    import math

    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        HILL_K,
    )
    from dynamodb_streaming_datalake_spark.registry import all_queries

    got = all_queries()["q_hill_tail"](spark, sf_smoke).collect()[0]
    vals = sorted(
        (
            r["value"]
            for r in read_table(spark, sf_smoke, "events")
            .where(F.col("value").isNotNull() & (F.col("value") > 0))
            .select("value")
            .collect()
        ),
        reverse=True,
    )
    xk = vals[HILL_K]
    top = [v for v in vals[: HILL_K + 1] if v > xk]
    alpha = len(top) / sum(math.log(v / xk) for v in top)
    assert got["k_used"] == len(top)
    assert abs(got["threshold"] - xk) < 1e-6
    assert abs(got["hill_alpha"] - alpha) < 1e-5


def test_join_order_dp_ranks_true_costs_correctly(spark, sf_smoke):
    """Run the estimator's best and worst plans' prefix joins for
    REAL; the estimated winner's true C_out must not exceed the
    estimated loser's."""
    from dynamodb_streaming_datalake_spark.registry import all_queries

    rows = sorted(
        all_queries()["q_join_order_dp"](spark, sf_smoke).collect(),
        key=lambda r: r["cost_rank"],
    )
    assert rows[0]["is_optimal"] and not rows[-1]["is_optimal"]
    tables = {
        "c": read_table(spark, sf_smoke, "customer"),
        "o": read_table(spark, sf_smoke, "orders"),
        "l": read_table(spark, sf_smoke, "lineitem"),
        "p": read_table(spark, sf_smoke, "part"),
    }
    conds = {
        frozenset("co"): ("c_custkey", "o_custkey"),
        frozenset("ol"): ("o_orderkey", "l_orderkey"),
        frozenset("lp"): ("l_partkey", "p_partkey"),
    }

    def true_cout(plan):
        order = plan.split(" JOIN ")
        cur = tables[order[0]]
        joined = {order[0]}
        total = 0
        for r in order[1:]:
            cond = None
            for prev in joined:
                key = frozenset((prev, r))
                if key in conds:
                    a, b = conds[key]
                    cond = (
                        F.col(a) == F.col(b)
                        if a[0] == prev or a[2] == prev
                        else (F.col(b) == F.col(a))
                    )
            cur = cur.join(tables[r], cond)
            joined.add(r)
            total += cur.count()
        return total

    best = true_cout(rows[0]["plan"])
    worst = true_cout(rows[-1]["plan"])
    assert best <= worst, (best, worst)
    # estimated costs must at least order these two correctly
    assert rows[0]["est_cost"] <= rows[-1]["est_cost"]


def test_lsh_planner_picks_the_shipped_config(spark, sf_smoke):
    """The planner's arg-min must be the configuration the dedup
    family actually ships (MINHASH_BANDS x rows from MINHASH_SEEDS),
    and the integrals must match a python recompute."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        LSH_PLAN_BUDGET,
        LSH_PLAN_GRID,
        MINHASH_BANDS,
        MINHASH_SEEDS,
    )
    from dynamodb_streaming_datalake_spark.registry import all_queries

    rows = all_queries()["q_lsh_planner"](spark, sf_smoke).collect()
    best = [r for r in rows if r["is_best"]]
    assert len(best) == 1
    assert best[0]["bands"] == MINHASH_BANDS
    assert (
        best[0]["rows_per_band"] == MINHASH_SEEDS // MINHASH_BANDS
    )
    # python recompute of one config's areas
    b, r_ = best[0]["bands"], best[0]["rows_per_band"]
    fp = fn = 0.0
    for j in range(LSH_PLAN_GRID):
        s = (j + 0.5) / LSH_PLAN_GRID
        p = 1 - (1 - s**r_) ** b
        if s < JACCARD_THRESHOLD:
            fp += p / LSH_PLAN_GRID
        else:
            fn += (1 - p) / LSH_PLAN_GRID
    assert abs(best[0]["fp_area"] - fp) < 1e-5
    assert abs(best[0]["fn_area"] - fn) < 1e-5
