"""Sketch-operator invariants that the oracle hash can't express:
mergeability (the whole point of a sketch in a sharded lake) and the
one-sided / bounded error contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.sketches import (
    HLL_M,
    cms_build,
    q_cms_heavy_hitters,
    q_hll_distinct,
)
from dynamodb_streaming_datalake_spark.sources.readers import read_table


def _cells(df) -> dict:
    return {(r["depth"], r["col"]): r["cnt"] for r in df.collect()}


def test_cms_sketch_is_mergeable(spark, sf_smoke):
    """Sharded build: sketch(A) + sketch(B) cell-summed == sketch(A∪B).
    This is the property that lets per-day shards merge without raw
    re-scans; it holds exactly, not approximately."""
    ev = read_table(spark, sf_smoke, "events")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged = (
        cms_build(a, "user_id")
        .unionByName(cms_build(b, "user_id"))
        .groupBy("depth", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert _cells(merged) == _cells(cms_build(ev, "user_id"))


def test_cms_error_is_one_sided(spark, sf_smoke):
    """CMS never undercounts: est >= exact on every reported key."""
    rows = q_cms_heavy_hitters(spark, sf_smoke).collect()
    assert rows
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["cms_est"] >= r["exact_cnt"] for r in rows)


def test_hll_estimate_within_tolerance(spark, sf_smoke):
    """Raw HLL with m=512 has ~1.04/sqrt(m) ≈ 4.6% std error; assert a
    generous 3-sigma band against the exact count computed in the same
    result row."""
    row = q_hll_distinct(spark, sf_smoke).first()
    assert row["n_registers"] == HLL_M
    rel = abs(row["hll_estimate"] - row["exact_distinct"]) / row["exact_distinct"]
    assert rel < 0.15, (row["hll_estimate"], row["exact_distinct"])


def test_hll_registers_are_mergeable(spark, sf_smoke):
    """Per-shard HLL register tables merge with groupBy(bucket).MAX —
    the union-merge a sharded lake runs; exact equality with the
    one-shot build, not approximate."""
    from dynamodb_streaming_datalake_spark.functions.texthash import (
        portable_hash60,
    )
    from dynamodb_streaming_datalake_spark.operators.sketches import (
        HLL_M,
        HLL_RHO_MAX,
    )

    li = read_table(spark, sf_smoke, "lineitem")

    def registers(df):
        h = df.select(
            portable_hash60(F.col("l_orderkey").cast("string")).alias("hv")
        ).distinct()
        return (
            h.select(
                (F.col("hv") % HLL_M).alias("bucket"),
                F.when(
                    F.expr(f"hv div {HLL_M}") == 0, F.lit(HLL_RHO_MAX)
                )
                .otherwise(
                    F.lit(HLL_RHO_MAX)
                    - F.length(F.bin(F.expr(f"hv div {HLL_M}")))
                )
                .alias("rho"),
            )
            .groupBy("bucket")
            .agg(F.max("rho").alias("m"))
        )

    def cells(df):
        return {(r["bucket"]): r["m"] for r in df.collect()}

    a = registers(li.where(F.col("l_orderkey") % 2 == 0))
    b = registers(li.where(F.col("l_orderkey") % 2 == 1))
    merged = (
        a.unionByName(b).groupBy("bucket").agg(F.max("m").alias("m"))
    )
    assert cells(merged) == cells(registers(li))


def test_interp_linear_honors_observed_and_bounds(spark, sf_smoke):
    """Interpolation invariants the hash can't articulate: observed
    hours keep their exact aggregate value, and every filled hour lies
    strictly between its neighbors' values (linear => monotone within
    the gap)."""
    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        q_interp_linear,
    )

    rows = q_interp_linear(spark, sf_smoke).orderBy(
        "event_type", "hour_ts"
    ).collect()
    assert rows and any(r["observed"] == 0 for r in rows)
    by_series: dict = {}
    for r in rows:
        by_series.setdefault(r["event_type"], []).append(r)
    for series in by_series.values():
        # first/last rows of each series are observed by construction
        assert series[0]["observed"] == 1 and series[-1]["observed"] == 1
        for i, r in enumerate(series):
            if r["observed"]:
                continue
            lo = next(
                series[j] for j in range(i - 1, -1, -1) if series[j]["observed"]
            )
            hi = next(
                series[j]
                for j in range(i + 1, len(series))
                if series[j]["observed"]
            )
            a, b = sorted((lo["value"], hi["value"]))
            assert a - 1e-9 <= r["value"] <= b + 1e-9


def test_kmv_sketch_is_mergeable(spark, sf_smoke):
    """The KMV monoid: merging per-partition sketches equals the
    one-shot sketch of the union — exactly (set equality, not
    estimate closeness)."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.operators.sketches import (
        kmv_merge,
        kmv_sketch,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    orders = read_table(spark, sf_smoke, "orders")
    whole = {r["h"] for r in kmv_sketch(orders, "o_custkey").collect()}
    even = kmv_sketch(orders.where(F.col("o_orderkey") % 2 == 0), "o_custkey")
    odd = kmv_sketch(orders.where(F.col("o_orderkey") % 2 == 1), "o_custkey")
    merged = {r["h"] for r in kmv_merge(even, odd).collect()}
    assert merged == whole


def test_theta_overlap_estimates_are_sane(spark, sf_smoke):
    """est_intersection tracks the exact intersection within the
    standard KMV relative error (~1/sqrt(K-1) per set, generously
    bounded at 4 sigma here), and jaccard_est is in [0, 1]."""
    from dynamodb_streaming_datalake_spark.operators.sketches import (
        THETA_K,
    )
    from dynamodb_streaming_datalake_spark.registry import all_queries

    row = all_queries()["q_theta_distinct"](spark, sf_smoke).collect()[0]
    assert 0.0 <= row["jaccard_est"] <= 1.0
    tol = 4.0 / (THETA_K - 1) ** 0.5
    for est, exact in (
        ("est_a", "exact_a"),
        ("est_b", "exact_b"),
        ("est_intersection", "exact_intersection"),
    ):
        if row[exact]:
            assert abs(row[est] - row[exact]) / row[exact] <= tol, (
                est,
                row[est],
                row[exact],
            )


def test_kll_rank_error_within_bound(spark, sf_smoke):
    """The sketch's a-priori bound is REAL: for each percentile, the
    true rank window of the returned estimate must contain the target
    weighted rank to within rank_err_bound."""
    import math

    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    rows = all_queries()["q_kll_quantiles"](spark, sf_smoke).collect()
    ev = read_table(spark, sf_smoke, "events")
    for row in rows:
        target = math.ceil(row["percentile"] * row["total_weight"])
        below, at_or_below = ev.agg(
            F.sum((F.col("value") < row["est_value"]).cast("long")),
            F.sum((F.col("value") <= row["est_value"]).cast("long")),
        ).first()
        b = row["rank_err_bound"]
        assert below <= target + b and at_or_below >= target - b, (
            row["percentile"], below, at_or_below, target, b,
        )


def test_kll_sketch_is_bounded_and_merge_is_union(spark, sf_smoke):
    """Sketch size is bounded by P*C regardless of input, and the
    merged sketch literally IS the union of the per-shard summaries —
    re-deriving any one shard's summary from the merged table matches
    building it alone (the mergeability property)."""
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.operators.sketches import (
        KLL_C,
        KLL_P,
        kll_sketch,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    ev = read_table(spark, sf_smoke, "events")
    sk = kll_sketch(ev)
    assert sk.count() <= KLL_P * KLL_C
    shard0_alone = kll_sketch(ev).where(F.col("shard") == 0)
    got = {tuple(r) for r in shard0_alone.collect()}
    merged_shard0 = {
        tuple(r) for r in sk.where(F.col("shard") == 0).collect()
    }
    assert got == merged_shard0


def test_hll_rolling_windows_nest_daily_counts(spark, sf_smoke):
    """The first ROLL_DAYS windows nest ([start..t] grows with t), so
    both the exact count and the HLL estimate must be non-decreasing
    there (registers only ever MAX upward under merge); every exact
    count stays within [1, global distinct]. No error-envelope check at
    smoke scale — the raw estimator's small-range bias is deliberately
    exposed (no linear-counting branch, see q_hll_distinct)."""
    from dynamodb_streaming_datalake_spark.operators.sketches import ROLL_DAYS
    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    rows = sorted(
        all_queries()["q_hll_rolling"](spark, sf_smoke).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    ev = read_table(spark, sf_smoke, "events")
    total = ev.select("user_id").distinct().count()
    col = [c for c in rows[0].asDict() if c.startswith("exact_users")][0]
    for r in rows:
        assert 1 <= r[col] <= total
        assert r["hll_estimate"] > 0
    nested = rows[: ROLL_DAYS]
    for a, b in zip(nested, nested[1:]):
        assert b[col] >= a[col]
        assert b["hll_estimate"] >= a["hll_estimate"]


def test_ams_sketch_is_mergeable_and_linear(spark, sf_smoke):
    """Sharded build: counters(A) + counters(B) row-summed ==
    counters(A∪B) — Z is linear in the input multiset, exactly, which
    is what lets per-day AMS tables merge without raw re-scans."""
    from dynamodb_streaming_datalake_spark.operators.sketches import (
        AMS_R,
        ams_sketch,
    )

    ev = read_table(spark, sf_smoke, "events")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)

    def rows(df):
        return {(r["event_type"], r["r"]): r["z"] for r in df.collect()}

    merged = (
        ams_sketch(a, "user_id", "event_type")
        .unionByName(ams_sketch(b, "user_id", "event_type"))
        .groupBy("event_type", "r")
        .agg(F.sum("z").alias("z"))
    )
    whole = rows(ams_sketch(ev, "user_id", "event_type"))
    assert rows(merged) == whole
    # every segment carries exactly AMS_R counters
    per_seg = {}
    for (seg, _r) in whole:
        per_seg[seg] = per_seg.get(seg, 0) + 1
    assert set(per_seg.values()) == {AMS_R}


def test_ams_estimate_tracks_exact_f2(spark, sf_smoke):
    """The mean-of-squares estimator is unbiased with stddev
    ~ sqrt(2/R)*F2; assert the realized estimates sit within a loose
    factor of exact on the fixture — a sanity band, not the bound."""
    from dynamodb_streaming_datalake_spark.operators.sketches import q_ams_f2

    for r in q_ams_f2(spark, sf_smoke).collect():
        assert r["est_mean"] > 0
        assert r["f2_exact"] / 10 <= r["est_mean"] <= r["f2_exact"] * 10


def test_column_correlation_matches_numpy(spark, sf_smoke):
    """Every reported Pearson r equals numpy's corrcoef on the same
    columns to 1e-4, values in [-1, 1], all 6 pairs present."""
    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.sketches import (
        CORR_COLS,
        q_column_correlation,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    m = np.array(
        read_table(spark, sf_smoke, "lineitem")
        .select(*CORR_COLS)
        .collect(),
        dtype=np.float64,
    )
    want = np.corrcoef(m, rowvar=False)
    rows = q_column_correlation(spark, sf_smoke).collect()
    assert len(rows) == 6
    for r in rows:
        i, j = CORR_COLS.index(r["col_a"]), CORR_COLS.index(r["col_b"])
        assert abs(r["pearson_r"]) <= 1
        assert abs(r["pearson_r"] - want[i, j]) < 1e-4
