"""Semantic tests for the round-13 probe/mining family: the oracle
gate proves cross-engine agreement; these prove the MATH does what the
operator claims (the planted-spike PCA pattern) — the Cramer solve is
a real linear-system solve, the probe is a real ridge fit, the margin
really demotes hub vectors, and the Mahalanobis screen really finds a
planted outlier."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.probe import (
    PROBE_LAMBDA,
    _cramer3,
    probe_features,
    probe_gram,
    probe_solve,
)
from dynamodb_streaming_datalake_spark.sources.readers import read_table


def test_cramer3_matches_numpy_solve():
    """The fixed-shape Cramer expressions solve symmetric 3x3 systems
    to float precision, across well- and badly-scaled inputs."""
    rng = np.random.default_rng(7)
    for _ in range(200):
        m = rng.integers(-50, 50, size=(3, 3)).astype(float)
        a = m @ m.T + np.eye(3)  # SPD, always invertible
        b = rng.integers(-100, 100, size=3).astype(float)
        w = _cramer3(
            a[0, 0], a[0, 1], a[0, 2], a[1, 1], a[1, 2], a[2, 2],
            b[0], b[1], b[2],
        )
        want = np.linalg.solve(a, b)
        assert np.allclose(w, want, rtol=1e-9, atol=1e-9), (a, b, w, want)


def test_probe_fit_matches_numpy_ridge(spark, sf_smoke):
    """q_linear_probe's in-plan solve IS the ridge fit: coefficients
    from the Gram-aggregate + Cramer path equal numpy's
    (X^T X + lambda I)^-1 X^T y on the identical feature matrix."""
    feats = probe_features(read_table(spark, sf_smoke, "documents"))
    rows = feats.collect()
    x = np.array([[1.0, r["w"], r["dd"]] for r in rows])
    y = np.array([float(r["y"]) for r in rows])
    want = np.linalg.solve(
        x.T @ x + PROBE_LAMBDA * np.eye(3), x.T @ y
    )
    got = probe_solve(probe_gram(feats)).collect()[0]
    assert np.allclose(
        [got["w1"], got["w2"], got["w3"]], want, rtol=1e-9
    ), (got, want)


def test_bitext_margin_demotes_planted_hub(spark):
    """The reason margin scoring exists: a HUB vector (high cosine to
    every query) must not win every pairing. Plant one hub among the
    candidates: raw cosine picks the hub for every query; the margin
    score — cosine over the mean of each side's top-k neighborhood —
    picks each query's true planted partner instead."""
    from pyspark.sql import Window

    from dynamodb_streaming_datalake_spark.functions.texthash import cosine

    # exact construction on an orthonormal basis: queries are e_0..e_3;
    # the hub is their normalized mean, so cos(q_i, hub) = 0.5 for every
    # query; partner_i = 0.45 e_i + sqrt(1-0.45^2) e_{4+i}, so
    # cos(q_i, p_i) = 0.45 < 0.5 — raw cosine hands EVERY query to the
    # hub, and only the margin's neighborhood normalization can undo it
    dim = 8
    queries = [np.eye(dim)[i] for i in range(4)]
    partners = [
        0.45 * np.eye(dim)[i] + np.sqrt(1 - 0.45**2) * np.eye(dim)[4 + i]
        for i in range(4)
    ]
    hub = np.mean(queries, axis=0)
    cands = partners + [hub]

    qdf = spark.createDataFrame(
        [(i, [float(v) for v in queries[i]]) for i in range(4)],
        "src_id int, se array<double>",
    )
    cdf = spark.createDataFrame(
        [(100 + j, [float(v) for v in cands[j]]) for j in range(5)],
        "dst_id int, de array<double>",
    )
    pairs = cdf.join(F.broadcast(qdf)).select(
        "src_id", "dst_id", cosine(F.col("se"), F.col("de")).alias("cs")
    )
    k = 2
    wf = Window.partitionBy("src_id").orderBy(F.col("cs").desc(), "dst_id")
    wb = Window.partitionBy("dst_id").orderBy(F.col("cs").desc(), "src_id")
    favg = (
        pairs.withColumn("r", F.row_number().over(wf))
        .where(F.col("r") <= k)
        .groupBy("src_id")
        .agg(F.avg("cs").alias("favg"))
    )
    bavg = (
        pairs.withColumn("r", F.row_number().over(wb))
        .where(F.col("r") <= k)
        .groupBy("dst_id")
        .agg(F.avg("cs").alias("bavg"))
    )
    scored = (
        pairs.join(favg, "src_id")
        .join(bavg, "dst_id")
        .withColumn("margin", F.col("cs") / ((F.col("favg") + F.col("bavg")) / 2))
    )
    wm = Window.partitionBy("src_id").orderBy(F.col("margin").desc(), "dst_id")
    wraw = Window.partitionBy("src_id").orderBy(F.col("cs").desc(), "dst_id")
    top = (
        scored.select(
            "src_id",
            "dst_id",
            F.row_number().over(wm).alias("m_rank"),
            F.row_number().over(wraw).alias("c_rank"),
        )
        .where((F.col("m_rank") == 1) | (F.col("c_rank") == 1))
        .collect()
    )
    by_margin = {r["src_id"]: r["dst_id"] for r in top if r["m_rank"] == 1}
    by_cosine = {r["src_id"]: r["dst_id"] for r in top if r["c_rank"] == 1}
    # margin recovers every planted partner
    assert by_margin == {i: 100 + i for i in range(4)}, by_margin
    # and the hub really was a trap: raw cosine hands it >= 2 queries
    hub_wins = sum(1 for d in by_cosine.values() if d == 104)
    assert hub_wins == 4, by_cosine


def test_embedding_outlier_screen_recovers_planted_outlier(spark):
    """Plant one far-out vector in a tight Gaussian cloud: the exact
    diagonal-Mahalanobis kernel must rank it first, far above the
    inliers."""
    from dynamodb_streaming_datalake_spark.operators.similarity import (
        _gram_sums_kernel,
    )

    rng = np.random.default_rng(3)
    n, dim = 300, 64
    cloud = rng.normal(0.0, 1.0, size=(n, dim))
    cloud[17] = 12.0  # the planted outlier, every dim 12 sigma out
    df = spark.createDataFrame(
        [(i, [float(v) for v in cloud[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    sums = _gram_sums_kernel(df)
    diag = sums.where(F.col("dim_a") == F.col("dim_b")).select(
        F.col("dim_a").alias("d"),
        (F.col("s1").cast("double") / F.col("n")).alias("mean"),
        F.sqrt(
            (
                F.col("s12").cast("double")
                - F.col("s1").cast("double") * F.col("s2").cast("double") / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("std"),
    )
    stats = diag.agg(
        F.array_sort(F.collect_list(F.struct("d", "mean", "std"))).alias("st")
    ).select(
        F.transform("st", lambda s: s["mean"]).alias("m_arr"),
        F.transform("st", lambda s: s["std"]).alias("s_arr"),
    )
    ad = F.col("embedding").cast("array<double>")
    zm = F.zip_with(ad, F.col("m_arr"), lambda x, m: x - m)
    zv = F.zip_with(zm, F.col("s_arr"), lambda x, s: x / s)
    dist = F.aggregate(
        F.transform(zv, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )
    top = (
        df.crossJoin(F.broadcast(stats))
        .select("vec_id", dist.alias("m2"))
        .orderBy(F.col("m2").desc())
        .limit(2)
        .collect()
    )
    assert top[0]["vec_id"] == 17
    assert top[0]["m2"] > 5 * top[1]["m2"], top


def test_poisson_bootstrap_weights_have_poisson_mass(spark, sf_oracle):
    """The analytics_ext Poisson draw (shared convention with any
    bootstrap twin): over many (row, replica) draws the weight
    frequencies must match the Poisson(1) pmf cutoffs the CASE encodes
    — i.e. the hash really behaves uniform and the cutoffs really are
    the CDF."""
    from dynamodb_streaming_datalake_spark.functions.texthash import (
        portable_hash60,
    )
    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        BOOT_B,
        BOOT_CUT,
    )

    e = read_table(spark, sf_oracle, "events").select("event_id")
    rj = e.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))))
    u = portable_hash60(
        F.concat(
            F.col("event_id").cast("string"), F.lit("_"), F.col("b").cast("string")
        )
    ) % 1000000
    wt = (
        F.when(u < BOOT_CUT[0], 0)
        .when(u < BOOT_CUT[1], 1)
        .when(u < BOOT_CUT[2], 2)
        .otherwise(3)
    )
    got = {
        r["wt"]: r["n"]
        for r in rj.select(wt.alias("wt"))
        .groupBy("wt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(got.values())
    probs = [
        BOOT_CUT[0] / 1e6,
        (BOOT_CUT[1] - BOOT_CUT[0]) / 1e6,
        (BOOT_CUT[2] - BOOT_CUT[1]) / 1e6,
        1 - BOOT_CUT[2] / 1e6,
    ]
    for w, p in enumerate(probs):
        assert got.get(w, 0) / total == pytest.approx(p, abs=0.01), (w, got)


def test_grouped_regression_matches_numpy_per_group(spark, sf_smoke):
    """q_grouped_regression's per-group in-plan solve + RMSE equal a
    numpy ridge fit per language on the identical feature matrix."""
    from dynamodb_streaming_datalake_spark.registry import all_queries

    got = {
        r["lang"]: r
        for r in all_queries()["q_grouped_regression"](
            spark, sf_smoke
        ).collect()
    }
    d = read_table(spark, sf_smoke, "documents").select(
        "lang", "text", "n_chars"
    )
    rows = d.collect()
    by_lang: dict = {}
    for r in rows:
        toks = r["text"].split(" ")
        by_lang.setdefault(r["lang"], []).append(
            (1.0, float(len(toks)), float(len(set(toks))), float(r["n_chars"]))
        )
    for lang, feats in by_lang.items():
        x = np.array([f[:3] for f in feats])
        y = np.array([f[3] for f in feats])
        w = np.linalg.solve(x.T @ x + PROBE_LAMBDA * np.eye(3), x.T @ y)
        resid = y - x @ w
        rmse = float(np.sqrt(np.sum(resid**2) / len(y)))
        g = got[lang]
        assert np.allclose(
            [g["w_intercept"], g["w_words"], g["w_distinct"]], w, atol=5e-6
        ), (lang, g, w)
        assert g["rmse"] == pytest.approx(rmse, abs=5e-6), (lang, g["rmse"], rmse)


def test_generated_cramer_matches_numpy_all_sizes():
    """The GENERATED cofactor solve (round-13 VERDICT #6) is a real
    linear-system solve at every size it claims: 200 random SPD
    systems each at n = 2..5, generated determinants vs
    numpy.linalg.solve."""
    from dynamodb_streaming_datalake_spark.operators.probe import (
        _cramer_n,
        _det_expr,
    )

    rng = np.random.default_rng(14)
    for n in (2, 3, 4, 5):
        for _ in range(200):
            m = rng.integers(-50, 50, size=(n, n)).astype(float)
            a = m @ m.T + np.eye(n)  # SPD, always invertible
            b = rng.integers(-100, 100, size=n).astype(float)
            w = _cramer_n(a.tolist(), b.tolist())
            want = np.linalg.solve(a, b)
            assert np.allclose(w, want, rtol=1e-9, atol=1e-9), (n, a, b)
            # and the generated determinant itself is a determinant
            assert _det_expr(a.tolist()) == pytest.approx(
                float(np.linalg.det(a)), rel=1e-9
            )


def test_generated_det_sql_is_the_same_tree():
    """The SQL builder emits the IDENTICAL expression tree the float
    evaluation computes: evaluating the generated det string (via
    DuckDB) on a concrete Gram row equals the float-operand
    generator's answer bit-for-bit."""
    import duckdb

    from dynamodb_streaming_datalake_spark.operators.probe import (
        _KP,
        PROBE_LAMBDA,
        _kp_bname,
        _kp_sname,
        _kprobe_det_sqls,
        _kprobe_matrix,
    )

    rng = np.random.default_rng(5)
    vals = {}
    for i in range(_KP):
        for j in range(i, _KP):
            vals[_kp_sname(i, j)] = int(rng.integers(1, 10_000))
        vals[_kp_bname(i)] = int(rng.integers(1, 10_000))

    def cell(name, diag):
        v = float(vals[name])
        return v + PROBE_LAMBDA if diag else v

    a, b = _kprobe_matrix(cell)
    from dynamodb_streaming_datalake_spark.operators.probe import _det_expr

    want = _det_expr(a)
    row = ", ".join(
        f"CAST({v} AS BIGINT) AS {k}" for k, v in vals.items()
    )
    got = duckdb.connect().execute(
        f"SELECT {_kprobe_det_sqls()[0]} AS d FROM (SELECT {row})"
    ).fetchone()[0]
    assert got == want  # exact: same tree, same doubles


def test_kprobe_fit_matches_numpy_ridge(spark, sf_smoke):
    """q_linear_probe_k's generated in-plan solve IS the 4-feature
    ridge fit: coefficients equal numpy's solve of the identical
    normal equations (tolerance scaled for the wider-spread feature
    scales K=4 brings)."""
    from dynamodb_streaming_datalake_spark.operators.probe import (
        kprobe_features,
        kprobe_gram,
        kprobe_solve,
    )

    feats = kprobe_features(read_table(spark, sf_smoke, "documents"))
    rows = feats.collect()
    x = np.array(
        [[1.0, r["w"], r["dd"], r["ch"], r["mx"]] for r in rows]
    )
    y = np.array([float(r["y"]) for r in rows])
    want = np.linalg.solve(x.T @ x + PROBE_LAMBDA * np.eye(5), x.T @ y)
    got = kprobe_solve(kprobe_gram(feats)).collect()[0]
    assert np.allclose(
        [got[f"w{i + 1}"] for i in range(5)], want, rtol=1e-5, atol=1e-8
    ), (list(got), want)


def test_probe_auc_equals_pairwise_definition(spark, sf_smoke):
    """The rank-statistic AUC IS the pairwise probability: for every
    source, q_probe_auc's midrank fold equals the direct
    P(s_pos > s_neg) + 0.5*P(s_pos = s_neg) over all (pos, neg)
    pairs computed by brute force on the same scores."""
    from dynamodb_streaming_datalake_spark.registry import all_queries
    from dynamodb_streaming_datalake_spark.operators.probe import (
        probe_features,
        probe_gram,
        probe_solve,
    )

    got = {
        r["source"]: r
        for r in all_queries()["q_probe_auc"](spark, sf_smoke).collect()
    }
    feats = probe_features(read_table(spark, sf_smoke, "documents"))
    coef = probe_solve(probe_gram(feats)).collect()[0]
    by_src: dict = {}
    for r in feats.collect():
        s = coef["w1"] + coef["w2"] * r["w"] + coef["w3"] * r["dd"]
        by_src.setdefault(r["source"], []).append((s, r["y"]))
    for src, rows in by_src.items():
        pos = [s for s, y in rows if y == 1]
        neg = [s for s, y in rows if y == 0]
        g = got[src]
        assert g["n_pos"] == len(pos) and g["n_neg"] == len(neg)
        if not pos or not neg:
            assert g["auc"] is None
            continue
        wins = sum(
            1.0 if p > q else (0.5 if p == q else 0.0)
            for p in pos
            for q in neg
        )
        want = wins / (len(pos) * len(neg))
        assert g["auc"] == pytest.approx(want, abs=1e-6), (src, g, want)


def test_grouped_regression_k_matches_numpy_per_group(spark, sf_smoke):
    """The grouped GENERATED 4x4 solve is a real per-group ridge fit:
    coefficients + RMSE equal numpy's solve of the identical normal
    equations per language."""
    from dynamodb_streaming_datalake_spark.registry import all_queries

    got = {
        r["lang"]: r
        for r in all_queries()["q_grouped_regression_k"](
            spark, sf_smoke
        ).collect()
    }
    rows = (
        read_table(spark, sf_smoke, "documents")
        .select("lang", "text", "n_chars")
        .collect()
    )
    by_lang: dict = {}
    for r in rows:
        toks = r["text"].split(" ")
        by_lang.setdefault(r["lang"], []).append(
            (
                1.0,
                float(len(toks)),
                float(len(set(toks))),
                float(max(len(t) for t in toks)),
                float(r["n_chars"]),
            )
        )
    for lang, feats in by_lang.items():
        x = np.array([f[:4] for f in feats])
        y = np.array([f[4] for f in feats])
        w = np.linalg.solve(x.T @ x + PROBE_LAMBDA * np.eye(4), x.T @ y)
        resid = y - x @ w
        rmse = float(np.sqrt(np.sum(resid**2) / len(y)))
        g = got[lang]
        assert np.allclose(
            [g["w_intercept"], g["w_words"], g["w_distinct"], g["w_maxlen"]],
            w,
            atol=5e-5,
        ), (lang, g, w)
        assert g["rmse"] == pytest.approx(rmse, abs=5e-5), (
            lang,
            g["rmse"],
            rmse,
        )
