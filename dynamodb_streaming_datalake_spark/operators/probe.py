"""Trainable filters & resampling inference, computed without leaving
the engine.

A trainable filter a training-data pipeline fits at corpus scale:

* **Linear probe** (`q_linear_probe`): fit a ridge-regression linear
  probe (here: predict English-ness from two cheap text statistics)
  with a CLOSED-FORM solve — one distributed aggregation builds the
  exact integer Gram/moment matrix, Cramer's rule inverts the 3x3
  system in scalar arithmetic, and the learned coefficients broadcast
  back over the corpus to score every document. This is the quality-
  classifier training loop (fastText-style linear filters) collapsed
  to its Spark-native essence: the ONLY corpus-sized work is two scans
  (one aggregate, one scoring pass), both map-side; the "training" is
  O(1) scalar math in the plan itself. Every Gram entry is an exact
  integer sum, so the fitted coefficients are bit-identical across
  engines — the DuckDB oracle refits the same probe and must agree.

Reference scope: the reference pipeline (stack at
`/root/reference/lib/dynamodb-streaming-datalake-stack.ts`) lands data
for exactly this kind of downstream analytics; these operators are
part of the declared LLM-training-pipeline extension surface
(SURVEY.md §2C/§2D), not reference ports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.functions.texthash import (
    cosine,
    portable_hash60,
    sql_cosine,
    sql_portable_hash60,
)
from dynamodb_streaming_datalake_spark.operators.similarity import DIM
from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

# ---------------------------------------------------------------------------
# linear probe: closed-form ridge on exact integer features
# ---------------------------------------------------------------------------

#: ridge regularizer — keeps the 3x3 system well-conditioned even if a
#: feature degenerates (constant column), and is part of the portable
#: contract (the oracle adds the same lambda)
PROBE_LAMBDA = 1.0


def _cramer3(a11, a12, a13, a22, a23, a33, b1, b2, b3):
    """Solve the SYMMETRIC 3x3 system A w = b by Cramer's rule with a
    fixed expression shape (first-row cofactor expansion, identical
    parenthesization in the SQL twin) so both engines compute
    bit-identical doubles from the exact integer Gram entries."""
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    w1 = (
        b1 * (a22 * a33 - a23 * a23)
        - a12 * (b2 * a33 - a23 * b3)
        + a13 * (b2 * a23 - a22 * b3)
    ) / det
    w2 = (
        a11 * (b2 * a33 - a23 * b3)
        - b1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * b3 - b2 * a13)
    ) / det
    w3 = (
        a11 * (a22 * b3 - a23 * b2)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * (a12 * a23 - a22 * a13)
    ) / det
    return w1, w2, w3


def _sql_cramer3(pfx: str = "") -> str:
    """The SQL twin of :func:`_cramer3` as a SELECT fragment over
    columns a11..a33, b1..b3 (same cofactor shapes, same order)."""
    return f"""
        ({pfx}b1 * ({pfx}a22 * {pfx}a33 - {pfx}a23 * {pfx}a23)
         - {pfx}a12 * ({pfx}b2 * {pfx}a33 - {pfx}a23 * {pfx}b3)
         + {pfx}a13 * ({pfx}b2 * {pfx}a23 - {pfx}a22 * {pfx}b3)) / {pfx}det AS w1,
        ({pfx}a11 * ({pfx}b2 * {pfx}a33 - {pfx}a23 * {pfx}b3)
         - {pfx}b1 * ({pfx}a12 * {pfx}a33 - {pfx}a23 * {pfx}a13)
         + {pfx}a13 * ({pfx}a12 * {pfx}b3 - {pfx}b2 * {pfx}a13)) / {pfx}det AS w2,
        ({pfx}a11 * ({pfx}a22 * {pfx}b3 - {pfx}a23 * {pfx}b2)
         - {pfx}a12 * ({pfx}a12 * {pfx}b3 - {pfx}b2 * {pfx}a13)
         + {pfx}b1 * ({pfx}a12 * {pfx}a23 - {pfx}a22 * {pfx}a13)) / {pfx}det AS w3
    """


def probe_features(d: DataFrame, with_id: bool = False) -> DataFrame:
    """(source, w, dd, y) exact-integer feature rows — word count,
    distinct-word count, English-ness label. Row-local, so feature
    extraction commutes with batching (the q_probe_stream property).
    ``with_id`` keeps doc_id for consumers that need a per-doc seed
    (the resampler)."""
    toks = F.split(F.col("text"), " ")
    cols = [
        "source",
        F.size(toks).cast("long").alias("w"),
        F.size(F.array_distinct(toks)).cast("long").alias("dd"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("y"),
    ]
    return d.select("doc_id", *cols) if with_id else d.select(*cols)


#: the 9 Gram/moment sums — an INTEGER MONOID (component-wise +), so
#: micro-batch partials merge exactly and the streaming view's folded
#: row equals the one-shot aggregate
GRAM_COLS = ("n", "sw", "sd", "sww", "swd", "sdd", "sy", "swy", "sdy")


def probe_gram(feats: DataFrame) -> DataFrame:
    """One map-side-combined aggregate to the 1-row exact-integer
    Gram/moment matrix."""
    return feats.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("w").alias("sw"),
        F.sum("dd").alias("sd"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
        F.sum(F.col("w") * F.col("dd")).alias("swd"),
        F.sum(F.col("dd") * F.col("dd")).alias("sdd"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("w") * F.col("y")).alias("swy"),
        F.sum(F.col("dd") * F.col("y")).alias("sdy"),
    )


def probe_solve(g: DataFrame) -> DataFrame:
    """Cramer-solve the ridge system from a 1-row Gram frame into a
    1-row (w1, w2, w3) coefficient frame."""
    lam = F.lit(PROBE_LAMBDA)
    a11 = F.col("n").cast("double") + lam
    a12 = F.col("sw").cast("double")
    a13 = F.col("sd").cast("double")
    a22 = F.col("sww").cast("double") + lam
    a23 = F.col("swd").cast("double")
    a33 = F.col("sdd").cast("double") + lam
    b1 = F.col("sy").cast("double")
    b2 = F.col("swy").cast("double")
    b3 = F.col("sdy").cast("double")
    w1, w2, w3 = _cramer3(a11, a12, a13, a22, a23, a33, b1, b2, b3)
    return g.select(w1.alias("w1"), w2.alias("w2"), w3.alias("w3"))


def probe_report(feats: DataFrame, coef: DataFrame) -> DataFrame:
    """Score the corpus under a 1-row broadcast coefficient cross and
    grade per source — the shared serving stage of q_linear_probe and
    q_probe_stream."""
    scored = feats.crossJoin(F.broadcast(coef)).withColumn(
        "score", F.col("w1") + F.col("w2") * F.col("w") + F.col("w3") * F.col("dd")
    )
    acc_flag = F.when(
        (F.col("score") >= 0.5) == (F.col("y") == 1), F.lit(1)
    ).otherwise(F.lit(0))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.max("w1")
            + F.max("w2") * (F.sum("w").cast("double") / F.count(F.lit(1)))
            + F.max("w3") * (F.sum("dd").cast("double") / F.count(F.lit(1))),
            6,
        ).alias("mean_score"),
        F.round(
            F.sum(acc_flag).cast("double") / F.count(F.lit(1)), 6
        ).alias("accuracy"),
        F.round(F.max("w1"), 6).alias("w_intercept"),
        F.round(F.max("w2"), 6).alias("w_words"),
        F.round(F.max("w3"), 6).alias("w_distinct"),
    )


#: the shared probe-refit CTE chain (features -> Gram -> ridge solve)
#: — reused verbatim by q_linear_probe, q_probe_stream, and
#: q_quality_resample so the refit can never drift between consumers.
#: ``f`` carries doc_id (aggregations ignore it; the resampler seeds
#: its per-doc uniform from it).
SQL_PROBE_CTES = f"""
    f AS (
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS w,
               len(list_distinct(string_split(text, ' '))) AS dd,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(w) AS BIGINT) AS sw,
               CAST(SUM(dd) AS BIGINT) AS sd,
               CAST(SUM(w * w) AS BIGINT) AS sww,
               CAST(SUM(w * dd) AS BIGINT) AS swd,
               CAST(SUM(dd * dd) AS BIGINT) AS sdd,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(w * y) AS BIGINT) AS swy,
               CAST(SUM(dd * y) AS BIGINT) AS sdy
        FROM f
    ),
    a AS (
        SELECT CAST(n AS DOUBLE) + {PROBE_LAMBDA} AS a11,
               CAST(sw AS DOUBLE) AS a12,
               CAST(sd AS DOUBLE) AS a13,
               CAST(sww AS DOUBLE) + {PROBE_LAMBDA} AS a22,
               CAST(swd AS DOUBLE) AS a23,
               CAST(sdd AS DOUBLE) + {PROBE_LAMBDA} AS a33,
               CAST(sy AS DOUBLE) AS b1,
               CAST(swy AS DOUBLE) AS b2,
               CAST(sdy AS DOUBLE) AS b3
        FROM g
    ),
    c AS (
        SELECT {_sql_cramer3()}
        FROM (
            SELECT *,
                   (a11 * (a22 * a33 - a23 * a23)
                    - a12 * (a12 * a33 - a23 * a13)
                    + a13 * (a12 * a23 - a22 * a13)) AS det
            FROM a
        )
    )
    """

#: q_linear_probe's oracle verbatim — the streaming probe view
#: (q_probe_stream) must hash-match the same refit.
SQL_LINEAR_PROBE = f"""
    WITH {SQL_PROBE_CTES},
    scored AS (
        SELECT f.source, f.w, f.dd, f.y,
               (c.w1 + c.w2 * f.w + c.w3 * f.dd) AS score,
               c.w1 AS w1, c.w2 AS w2, c.w3 AS w3
        FROM f, c
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(max(w1) + max(w2) * (CAST(SUM(w) AS DOUBLE) / COUNT(*))
                 + max(w3) * (CAST(SUM(dd) AS DOUBLE) / COUNT(*)), 6)
               AS mean_score,
           round(CAST(SUM(CASE WHEN (score >= 0.5) = (y = 1)
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS accuracy,
           round(max(w1), 6) AS w_intercept,
           round(max(w2), 6) AS w_words,
           round(max(w3), 6) AS w_distinct
    FROM scored
    GROUP BY source
    """


@query("q_linear_probe", oracle=SQL_LINEAR_PROBE)
def q_linear_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge linear probe trained IN the plan: features are
    exact integers per doc (word count, distinct-word count), the
    label is English-ness, one map-side-combined aggregate builds the
    3x3 Gram + moment matrix in exact integer sums, Cramer's rule
    solves (A + {PROBE_LAMBDA}I) w = b in fixed-shape scalar doubles,
    and the coefficients broadcast back over the corpus to score and
    grade every document — per-source mean score, train accuracy, and
    the learned weights. The oracle REFITS the identical probe, so the
    training math itself is value-hash-gated, not just the plumbing.

    Scale: training cost is ONE aggregation to a single row (the Gram
    entries are sums — map-side partials shrink every partition to 9
    numbers), the solve is O(1) scalar arithmetic inside the plan, and
    scoring is a map-only pass under a 1-row broadcast cross. No
    driver-side linear algebra, no collect, no iteration: the probe
    fits in the same number of scans at 100 TB as at 50 MB."""
    feats = probe_features(read_table(spark, sf_dir, "documents"))
    return probe_report(feats, probe_solve(probe_gram(feats)))


_fmt(q_linear_probe, PROBE_LAMBDA=PROBE_LAMBDA)


# ---------------------------------------------------------------------------
# margin-based bitext mining: cross-lingual pair candidates
# ---------------------------------------------------------------------------
# The LASER/CCMatrix recipe for mining parallel (translation-pair)
# training data from comparable corpora: raw cosine over-selects hubs
# (vectors close to EVERYTHING), so candidates are scored by the
# MARGIN — cosine normalized by the average similarity of each side's
# k nearest neighbors in the other language. A pair only scores high
# if the two documents are much closer to each other than either is
# to its general neighborhood.

#: mined queries — the lowest-doc_id non-English docs (a deterministic
#: panel, like every ANN query set in similarity.py)
BITEXT_NQ = 12
#: neighborhood size for the margin denominator
BITEXT_K = 4


def _avg4(c1, c2, c3, c4):
    """Fixed-association mean of the 4 ranked neighbor cosines —
    (((c1+c2)+c3)+c4)/4 in BOTH engines, so the double is
    bit-identical (a bare AVG would sum in engine-chosen order)."""
    return (((c1 + c2) + c3) + c4) / 4.0


@query(
    "q_bitext_mine",
    oracle=f"""
    WITH j AS MATERIALIZED (
        SELECT d.doc_id, d.lang, e.embedding
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    src AS MATERIALIZED (
        SELECT doc_id AS src_id, embedding AS se
        FROM j WHERE lang <> 'en' ORDER BY doc_id LIMIT {BITEXT_NQ}
    ),
    dst AS MATERIALIZED (
        SELECT doc_id AS dst_id, embedding AS de
        FROM j WHERE lang = 'en'
    ),
    pairs AS MATERIALIZED (
        SELECT src_id, dst_id, {sql_cosine('se', 'de')} AS cs
        FROM src, dst
    ),
    fwd AS MATERIALIZED (
        SELECT src_id,
               ((((MAX(CASE WHEN rf = 1 THEN cs END)
                   + MAX(CASE WHEN rf = 2 THEN cs END))
                  + MAX(CASE WHEN rf = 3 THEN cs END))
                 + MAX(CASE WHEN rf = 4 THEN cs END)) / 4.0) AS favg
        FROM (
            SELECT src_id, cs,
                   ROW_NUMBER() OVER (PARTITION BY src_id
                                      ORDER BY cs DESC, dst_id) AS rf
            FROM pairs
        ) WHERE rf <= {BITEXT_K}
        GROUP BY src_id
    ),
    bwd AS MATERIALIZED (
        SELECT dst_id,
               ((((MAX(CASE WHEN rb = 1 THEN cs END)
                   + MAX(CASE WHEN rb = 2 THEN cs END))
                  + MAX(CASE WHEN rb = 3 THEN cs END))
                 + MAX(CASE WHEN rb = 4 THEN cs END)) / 4.0) AS bavg
        FROM (
            SELECT dst_id, cs,
                   ROW_NUMBER() OVER (PARTITION BY dst_id
                                      ORDER BY cs DESC, src_id) AS rb
            FROM pairs
        ) WHERE rb <= {BITEXT_K}
        GROUP BY dst_id
    ),
    scored AS (
        SELECT p.src_id, p.dst_id, p.cs,
               (p.cs / ((f.favg + b.bavg) / 2.0)) AS margin
        FROM pairs p JOIN fwd f USING (src_id) JOIN bwd b USING (dst_id)
    )
    SELECT src_id, dst_id,
           round(cs, 6) AS cos_sim,
           round(margin, 6) AS margin
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
                   ORDER BY margin DESC, dst_id) AS rn
        FROM scored
    ) WHERE rn = 1
    """,
)
def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (the LASER/CCMatrix parallel-corpus
    recipe): for each of the {BITEXT_NQ} lowest-id non-English docs,
    find its best English pairing by MARGIN — cosine divided by the
    mean of both sides' top-{BITEXT_K} neighbor cosines — so hub
    vectors that sit close to everything stop winning every pair.
    Both direction averages come from the SAME broadcast pair frame;
    the {BITEXT_K} ranked cosines fold in a fixed association order so
    the margin is bit-identical across engines.

    Scale: the pair frame is |panel| x |en docs| under a broadcast
    panel cross (the whitelisted ANN shape — never corpus x corpus);
    the forward average is a {BITEXT_NQ}-partition window, the
    backward one a window over {BITEXT_NQ}-row groups; everything
    after the cosines is panel-sized. Mining a full corpus pairs this
    scoring with the IVF candidate generation q_ann_ivf already
    provides."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    j = d.join(e, d["doc_id"] == e["vec_id"]).select("doc_id", "lang", "embedding")
    src = (
        j.where(F.col("lang") != "en")
        .orderBy("doc_id")
        .limit(BITEXT_NQ)
        .select(F.col("doc_id").alias("src_id"), F.col("embedding").alias("se"))
    )
    dst = j.where(F.col("lang") == "en").select(
        F.col("doc_id").alias("dst_id"), F.col("embedding").alias("de")
    )
    pairs = dst.join(F.broadcast(src)).select(
        "src_id", "dst_id", cosine(F.col("se"), F.col("de")).alias("cs")
    )
    wf = Window.partitionBy("src_id").orderBy(F.col("cs").desc(), "dst_id")
    wb = Window.partitionBy("dst_id").orderBy(F.col("cs").desc(), "src_id")

    def _ranked_avg(frame, rank_col, key, alias):
        ks = frame.where(F.col(rank_col) <= BITEXT_K)
        picks = [
            F.max(F.when(F.col(rank_col) == i, F.col("cs")))
            for i in (1, 2, 3, 4)
        ]
        return ks.groupBy(key).agg(
            _avg4(*picks).alias(alias)
        )

    fwd = _ranked_avg(
        pairs.withColumn("rf", F.row_number().over(wf)), "rf", "src_id", "favg"
    )
    bwd = _ranked_avg(
        pairs.withColumn("rb", F.row_number().over(wb)), "rb", "dst_id", "bavg"
    )
    scored = (
        pairs.join(F.broadcast(fwd), "src_id")
        .join(bwd, "dst_id")
        .withColumn(
            "margin", F.col("cs") / ((F.col("favg") + F.col("bavg")) / 2.0)
        )
    )
    wm = Window.partitionBy("src_id").orderBy(F.col("margin").desc(), "dst_id")
    return (
        scored.withColumn("rn", F.row_number().over(wm))
        .where(F.col("rn") == 1)
        .select(
            "src_id",
            "dst_id",
            F.round("cs", 6).alias("cos_sim"),
            F.round("margin", 6).alias("margin"),
        )
    )


_fmt(q_bitext_mine, BITEXT_NQ=BITEXT_NQ, BITEXT_K=BITEXT_K)


# ---------------------------------------------------------------------------
# exact diagonal-Mahalanobis embedding outlier screen
# ---------------------------------------------------------------------------
# The embedding-space twin of q_mad_outliers: vectors far from the
# per-dimension distribution are corrupted rows, mislabeled items, or
# encoder failures a training pipeline prunes before contrastive
# sampling. Full Mahalanobis needs the inverse covariance; at pipeline
# scale the standard screen is the DIAGONAL form — standardize each
# dimension by its own mean/std and rank by squared distance. The
# per-dim moments come EXACTLY from the shared Gram kernel's decimal
# power sums (one mapInPandas pass, the q_embedding_covariance
# infrastructure), so mean/std are bit-identical doubles in both
# engines and the per-row fold is the cosine kernel's fixed
# sequential shape.

#: outliers reported
OUT_TOP = 20


@query(
    "q_embedding_outliers",
    oracle=f"""
    WITH comps AS (
        SELECT e.vec_id, d.d AS d,
               CAST(CAST(e.embedding[d.d + 1] AS DOUBLE) AS DECIMAL(18,9))
                 AS val
        FROM embeddings e,
             (SELECT unnest(generate_series(0, {DIM - 1})) AS d) d
    ),
    gsums AS MATERIALIZED (
        SELECT a.d AS dim_a, b.d AS dim_b,
               COUNT(*) AS n,
               SUM(a.val) AS s1,
               SUM(b.val) AS s2,
               SUM(a.val * b.val) AS s12
        FROM comps a JOIN comps b
          ON a.vec_id = b.vec_id AND a.d <= b.d
        GROUP BY a.d, b.d
    ),
    diag AS (
        SELECT dim_a AS d,
               CAST(s1 AS DOUBLE) / n AS mean,
               sqrt((CAST(s12 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)
                    / (n - 1)) AS std
        FROM gsums WHERE dim_a = dim_b
    ),
    arrs AS (
        SELECT list(mean ORDER BY d) AS m_arr, list(std ORDER BY d) AS s_arr
        FROM diag
    ),
    z AS (
        -- zero-variance dimensions contribute 0, not 0/0: a constant
        -- dim carries no outlier information, and ungated the engines
        -- diverge on it (Spark 0.0/0.0 -> NaN, DuckDB -> NULL and
        -- list_dot_product then hard-errors; r17 contract-stress
        -- zero-vector sweep)
        SELECT e.vec_id, e.label,
               list_transform(
                   generate_series(1, {DIM}),
                   i -> CASE WHEN a.s_arr[i] = 0 THEN 0.0
                        ELSE (CAST(e.embedding[i] AS DOUBLE) - a.m_arr[i])
                             / a.s_arr[i] END) AS zv
        FROM embeddings e, arrs a
    )
    SELECT vec_id, label,
           round(list_dot_product(zv, zv), 6) AS mahalanobis_sq
    FROM z
    ORDER BY round(list_dot_product(zv, zv), 6) DESC, vec_id
    LIMIT {OUT_TOP}
    """,
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{OUT_TOP} embedding outliers by exact diagonal Mahalanobis
    distance: per-dimension means and stds derive from the Gram
    kernel's exact decimal power sums (order-independent,
    partitioning-invariant), broadcast back as two {DIM}-element
    arrays, and each vector folds its standardized squared distance
    with the cosine kernel's fixed sequential shape — so the ranking
    is bit-identical across engines (rounded before ordering as the
    ulp guard). The rows this surfaces are the corrupted/mislabeled
    vectors a pipeline prunes before contrastive mining.

    Scale: one mapInPandas Gram pass ({DIM}*({DIM}+1)/2 partials per
    partition), a 1-row broadcast of the 2x{DIM} stats, and a map-only
    scoring scan feeding TakeOrderedAndProject — two scans total, no
    shuffle wider than the {OUT_TOP}-row top-k."""
    from dynamodb_streaming_datalake_spark.operators.similarity import (
        _gram_sums_kernel,
    )

    e = read_table(spark, sf_dir, "embeddings")
    # round 18: only the DIM diagonal power sums are read here — the
    # diag_only kernel accumulates element-wise squares instead of the
    # four DIM x DIM matmuls (same mantissa sums, bit-identical rows)
    sums = _gram_sums_kernel(e, diag_only=True)
    diag = sums.where(F.col("dim_a") == F.col("dim_b")).select(
        F.col("dim_a").alias("d"),
        (F.col("s1").cast("double") / F.col("n")).alias("mean"),
        F.sqrt(
            (
                F.col("s12").cast("double")
                - F.col("s1").cast("double")
                * F.col("s2").cast("double")
                / F.col("n")
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
    # zero-variance dims contribute 0, not 0/0 (NaN) — mirrors the
    # oracle's CASE; r17 contract-stress zero-vector sweep
    zv = F.zip_with(
        zm,
        F.col("s_arr"),
        lambda x, s: F.when(s == 0, F.lit(0.0)).otherwise(x / s),
    )
    dist = F.aggregate(
        F.transform(zv, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    )
    return (
        e.crossJoin(F.broadcast(stats))
        .select("vec_id", "label", F.round(dist, 6).alias("mahalanobis_sq"))
        .orderBy(F.col("mahalanobis_sq").desc(), "vec_id")
        .limit(OUT_TOP)
    )


_fmt(q_embedding_outliers, OUT_TOP=OUT_TOP, DIM=DIM)


# ---------------------------------------------------------------------------
# quality-weighted resampling: the probe closes the loop
# ---------------------------------------------------------------------------
# Training the filter (q_linear_probe) is half the pipeline; the other
# half is USING it to decide what survives into the mix. Hard
# thresholds waste the middle of the distribution, so the standard
# move is importance resampling: keep each document with probability
# equal to its (clamped) quality score. Deterministic here — the keep
# coin is the portable per-doc hash, so the sample is reproducible on
# any cluster and the DuckDB oracle replays the identical decision
# for every document, refit included.

QRS_SALT = "quality-resample-v1"
_QRS_DENOM = 9007199254740992  # 2^53, exact as a double


@query(
    "q_quality_resample",
    oracle=f"""
    WITH {SQL_PROBE_CTES},
    scored AS (
        SELECT f.doc_id, f.source, f.w, f.dd,
               GREATEST(0.0, LEAST(1.0,
                   (c.w1 + c.w2 * f.w + c.w3 * f.dd))) AS p
        FROM f, c
    ),
    decided AS (
        SELECT doc_id, source, w, dd, p,
               CASE WHEN
                 (({sql_portable_hash60(
                     "doc_id::VARCHAR || '#" + QRS_SALT + "'")}
                   % {_QRS_DENOM}) * 1.0 / {_QRS_DENOM}) < p
                    THEN 1 ELSE 0 END AS kept
        FROM scored
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           round(CAST(SUM(kept) AS DOUBLE) / COUNT(*), 6) AS keep_rate,
           CAST(SUM(CASE WHEN kept = 1 THEN w ELSE 0 END) AS BIGINT)
             AS kept_words
    FROM decided
    GROUP BY source
    """,
)
def q_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance resampling by the LEARNED quality probe: every doc
    keeps with probability equal to its clamped probe score (the
    q_linear_probe refit, bit-identical coefficients), decided by a
    deterministic per-doc hash coin — so the surviving corpus is
    reproducible on any cluster and the oracle replays refit + every
    keep decision. Per-source totals, kept counts, keep rate, and the
    kept token volume (the number the mix planner actually budgets)
    come out in one aggregate.

    Scale: the probe trains in one aggregate (9 numbers), the keep
    decision is a row-local expression under a 1-row broadcast cross,
    and the report is one map-side-combined groupBy — the whole
    select-what-to-train-on loop in two scans, no iteration, no
    collect."""
    feats = probe_features(
        read_table(spark, sf_dir, "documents"), with_id=True
    )
    coef = probe_solve(probe_gram(feats.drop("doc_id")))
    p = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(1.0),
            F.col("w1") + F.col("w2") * F.col("w") + F.col("w3") * F.col("dd"),
        ),
    )
    u01 = (
        portable_hash60(
            F.concat(F.col("doc_id").cast("string"), F.lit(f"#{QRS_SALT}"))
        )
        % _QRS_DENOM
    ) * 1.0 / _QRS_DENOM
    decided = (
        feats.crossJoin(F.broadcast(coef))
        .withColumn("p", p)
        .withColumn("kept", F.when(u01 < F.col("p"), 1).otherwise(0))
    )
    return decided.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        F.round(
            F.sum("kept").cast("double") / F.count(F.lit(1)), 6
        ).alias("keep_rate"),
        F.sum(F.when(F.col("kept") == 1, F.col("w")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("kept_words"),
    )


# ---------------------------------------------------------------------------
# grouped closed-form regression: K models in one aggregate
# ---------------------------------------------------------------------------
# q_linear_probe fits ONE global model; per-domain pipelines fit one
# model PER GROUP (a chars~words regression per language here — the
# shape of per-domain quality calibrators). Because the solve is
# closed-form, grouping costs nothing extra: the SAME grouped
# aggregate emits one Gram row per group, the Cramer expressions solve
# each row in place, and the residual sum of squares comes from the
# sums too (RSS = y'y - 2w'X'y + w'X'Xw) — so K models train, solve,
# and self-evaluate in ONE shuffle with no loop, no collect, no
# per-group job.


def _sql_rss() -> str:
    """RSS from Gram sums and solved coefficients, fixed shape."""
    return (
        "(CAST(syy AS DOUBLE)"
        " - 2.0 * (w1 * CAST(sy AS DOUBLE) + w2 * CAST(swy AS DOUBLE)"
        "          + w3 * CAST(sdy AS DOUBLE))"
        " + (w1 * (w1 * CAST(n AS DOUBLE) + w2 * CAST(sw AS DOUBLE)"
        "          + w3 * CAST(sd AS DOUBLE))"
        "    + w2 * (w1 * CAST(sw AS DOUBLE) + w2 * CAST(sww AS DOUBLE)"
        "            + w3 * CAST(swd AS DOUBLE))"
        "    + w3 * (w1 * CAST(sd AS DOUBLE) + w2 * CAST(swd AS DOUBLE)"
        "            + w3 * CAST(sdd AS DOUBLE))))"
    )


@query(
    "q_grouped_regression",
    oracle=f"""
    WITH f AS (
        SELECT lang,
               len(string_split(text, ' ')) AS w,
               len(list_distinct(string_split(text, ' '))) AS dd,
               n_chars AS y
        FROM documents
    ),
    g AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(w) AS BIGINT) AS sw,
               CAST(SUM(dd) AS BIGINT) AS sd,
               CAST(SUM(w * w) AS BIGINT) AS sww,
               CAST(SUM(w * dd) AS BIGINT) AS swd,
               CAST(SUM(dd * dd) AS BIGINT) AS sdd,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(w * y) AS BIGINT) AS swy,
               CAST(SUM(dd * y) AS BIGINT) AS sdy,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM f GROUP BY lang
    ),
    a AS (
        SELECT lang, n, sw, sd, sww, swd, sdd, sy, swy, sdy, syy,
               CAST(n AS DOUBLE) + {PROBE_LAMBDA} AS a11,
               CAST(sw AS DOUBLE) AS a12,
               CAST(sd AS DOUBLE) AS a13,
               CAST(sww AS DOUBLE) + {PROBE_LAMBDA} AS a22,
               CAST(swd AS DOUBLE) AS a23,
               CAST(sdd AS DOUBLE) + {PROBE_LAMBDA} AS a33,
               CAST(sy AS DOUBLE) AS b1,
               CAST(swy AS DOUBLE) AS b2,
               CAST(sdy AS DOUBLE) AS b3
        FROM g
    ),
    c AS (
        SELECT lang, n, sw, sd, sww, swd, sdd, sy, swy, sdy, syy,
               {_sql_cramer3()}
        FROM (
            SELECT *,
                   (a11 * (a22 * a33 - a23 * a23)
                    - a12 * (a12 * a33 - a23 * a13)
                    + a13 * (a12 * a23 - a22 * a13)) AS det
            FROM a
        )
    )
    SELECT lang,
           CAST(n AS BIGINT) AS n_docs,
           round(w1, 6) AS w_intercept,
           round(w2, 6) AS w_words,
           round(w3, 6) AS w_distinct,
           round(sqrt(GREATEST({_sql_rss()}, 0.0) / n), 6) AS rmse
    FROM c
    """,
)
def q_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language closed-form ridge regression (n_chars on word
    count + distinct-word count) — K models trained, solved, and
    self-evaluated in ONE grouped aggregate: Gram/moment sums per
    group (exact integers), Cramer's rule applied to every Gram row in
    place, and the in-plan RMSE from RSS = y'y - 2w'X'y + w'X'Xw over
    the same sums. The per-domain calibrator shape (one quality model
    per source/language) with no loop, no collect, no per-group job —
    the oracle refits every model identically.

    Scale: one map-side-combined groupBy to |groups| Gram rows; the
    solves and RMSE are scalar expressions ON those rows. A thousand
    domains cost the same single shuffle as five."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    f = d.select(
        "lang",
        F.size(toks).cast("long").alias("w"),
        F.size(F.array_distinct(toks)).cast("long").alias("dd"),
        F.col("n_chars").alias("y"),
    )
    g = f.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("w").alias("sw"),
        F.sum("dd").alias("sd"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
        F.sum(F.col("w") * F.col("dd")).alias("swd"),
        F.sum(F.col("dd") * F.col("dd")).alias("sdd"),
        F.sum("y").alias("sy"),
        F.sum(F.col("w") * F.col("y")).alias("swy"),
        F.sum(F.col("dd") * F.col("y")).alias("sdy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    lam = F.lit(PROBE_LAMBDA)
    nD = F.col("n").cast("double")
    swD, sdD = F.col("sw").cast("double"), F.col("sd").cast("double")
    swwD, swdD, sddD = (
        F.col("sww").cast("double"),
        F.col("swd").cast("double"),
        F.col("sdd").cast("double"),
    )
    syD, swyD, sdyD, syyD = (
        F.col("sy").cast("double"),
        F.col("swy").cast("double"),
        F.col("sdy").cast("double"),
        F.col("syy").cast("double"),
    )
    w1, w2, w3 = _cramer3(
        nD + lam, swD, sdD, swwD + lam, swdD, sddD + lam, syD, swyD, sdyD
    )
    solved = g.select("lang", "n", *[c.alias(n_) for c, n_ in
                                     ((w1, "w1"), (w2, "w2"), (w3, "w3"))],
                      "sw", "sd", "sww", "swd", "sdd", "sy", "swy", "sdy",
                      "syy")
    W1, W2, W3 = F.col("w1"), F.col("w2"), F.col("w3")
    rss = (
        F.col("syy").cast("double")
        - 2.0
        * (
            W1 * F.col("sy").cast("double")
            + W2 * F.col("swy").cast("double")
            + W3 * F.col("sdy").cast("double")
        )
        + (
            W1
            * (
                W1 * F.col("n").cast("double")
                + W2 * F.col("sw").cast("double")
                + W3 * F.col("sd").cast("double")
            )
            + W2
            * (
                W1 * F.col("sw").cast("double")
                + W2 * F.col("sww").cast("double")
                + W3 * F.col("swd").cast("double")
            )
            + W3
            * (
                W1 * F.col("sd").cast("double")
                + W2 * F.col("swd").cast("double")
                + W3 * F.col("sdd").cast("double")
            )
        )
    )
    return solved.select(
        "lang",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(W1, 6).alias("w_intercept"),
        F.round(W2, 6).alias("w_words"),
        F.round(W3, 6).alias("w_distinct"),
        F.round(
            F.sqrt(F.greatest(rss, F.lit(0.0)) / F.col("n")), 6
        ).alias("rmse"),
    )


# ---------------------------------------------------------------------------
# probe calibration audit: reliability bins + ECE
# ---------------------------------------------------------------------------
# A filter that scores 0.9 should be right ~90% of the time; when it
# isn't, thresholds chosen on the score scale are lies. The standard
# audit is the reliability diagram + expected calibration error:
# bucket predictions by score decile, compare each bucket's mean score
# to its empirical positive rate, and weight the gaps by bucket mass.
# Runs on the SAME refit CTE chain as the probe itself, and every
# reported double is exact-from-integer-sums (bucket mean score via
# linearity, ECE via a bin-ordered running fold).


@query(
    "q_probe_calibration",
    oracle=f"""
    WITH {SQL_PROBE_CTES},
    scored AS (
        SELECT f.w, f.dd, f.y,
               (c.w1 + c.w2 * f.w + c.w3 * f.dd) AS s,
               c.w1 AS w1, c.w2 AS w2, c.w3 AS w3
        FROM f, c
    ),
    binned AS (
        SELECT GREATEST(0, LEAST(9, CAST(floor(s * 10) AS INT))) AS bin,
               w, dd, y, w1, w2, w3
        FROM scored
    ),
    per_bin AS (
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MAX(w1) + MAX(w2) * (CAST(SUM(w) AS DOUBLE) / COUNT(*))
                 + MAX(w3) * (CAST(SUM(dd) AS DOUBLE) / COUNT(*))
                 AS mean_score,
               CAST(SUM(y) AS DOUBLE) / COUNT(*) AS frac_pos
        FROM binned GROUP BY bin
    ),
    gapped AS (
        SELECT bin, n_docs, mean_score, frac_pos,
               abs(mean_score - frac_pos) AS gap,
               SUM(CAST(n_docs AS DOUBLE) * abs(mean_score - frac_pos))
                 OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum_wgap,
               SUM(n_docs) OVER () AS n_total
        FROM per_bin
    )
    SELECT bin, n_docs,
           round(mean_score, 6) AS mean_score,
           round(frac_pos, 6) AS frac_pos,
           round(gap, 6) AS gap,
           round(MAX(cum_wgap) OVER () / n_total, 6) AS ece
    FROM gapped
    """,
)
def q_probe_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error for the
    quality probe: predictions bucket by score decile, each bucket
    reports its mean predicted score (exact via linearity over integer
    sums) against its empirical positive rate, and ECE is the
    bucket-mass-weighted mean gap — folded in bin order (a running
    window sum) so the double is bit-identical across engines. A
    bucket whose score and positive rate diverge is where a threshold
    chosen on the score scale stops meaning what it says.

    Scale: the refit is the probe's one aggregate; the audit adds one
    (bin) groupBy to <= 10 rows and window math over those rows —
    calibration of a corpus-scale filter for the cost of a scan."""
    feats = probe_features(read_table(spark, sf_dir, "documents"))
    coef = probe_solve(probe_gram(feats))
    from pyspark.sql import Window

    scored = feats.crossJoin(F.broadcast(coef)).withColumn(
        "s", F.col("w1") + F.col("w2") * F.col("w") + F.col("w3") * F.col("dd")
    )
    binned = scored.withColumn(
        "bin",
        F.greatest(
            F.lit(0), F.least(F.lit(9), F.floor(F.col("s") * 10).cast("int"))
        ),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.max("w1")
            + F.max("w2") * (F.sum("w").cast("double") / F.count(F.lit(1)))
            + F.max("w3") * (F.sum("dd").cast("double") / F.count(F.lit(1)))
        ).alias("mean_score"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("frac_pos"),
    )
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    gap = F.abs(F.col("mean_score") - F.col("frac_pos"))
    gapped = per_bin.select(
        "bin",
        "n_docs",
        "mean_score",
        "frac_pos",
        gap.alias("gap"),
        F.sum(F.col("n_docs").cast("double") * gap).over(wcum).alias("cum_wgap"),
        F.sum("n_docs").over(wall).alias("n_total"),
    )
    return gapped.select(
        "bin",
        "n_docs",
        F.round("mean_score", 6).alias("mean_score"),
        F.round("frac_pos", 6).alias("frac_pos"),
        F.round("gap", 6).alias("gap"),
        F.round(
            F.max("cum_wgap").over(wall) / F.col("n_total"), 6
        ).alias("ece"),
    )


# ---------------------------------------------------------------------------
# probe ROC-AUC: exact Mann-Whitney rank statistic
# ---------------------------------------------------------------------------
# Accuracy (q_linear_probe) and calibration (q_probe_calibration) grade
# the probe at ONE threshold / on the score scale; AUC grades its
# RANKING — the number that decides whether the probe can drive a
# keep-fraction sweep at all. Computed as the Mann-Whitney U statistic
# with midranks for ties, entirely from integer sums: group rows by
# exact score, cumulative group counts give each tie-group's midrank
# (x2 to stay integral), and AUC = (R_pos - n_pos(n_pos+1)/2) /
# (n_pos * n_neg) folds from those exact integers — bit-identical
# across engines because the scores themselves are (same refit, same
# expression tree).


@query(
    "q_probe_auc",
    oracle=f"""
    WITH {SQL_PROBE_CTES},
    scored AS (
        SELECT f.source, f.y,
               (c.w1 + c.w2 * f.w + c.w3 * f.dd) AS s
        FROM f, c
    ),
    tie_groups AS (
        SELECT source, s,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS np
        FROM scored GROUP BY source, s
    ),
    ranked AS (
        SELECT source, n, np,
               COALESCE(SUM(n) OVER (
                   PARTITION BY source ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM tie_groups
    ),
    folded AS (
        SELECT source,
               CAST(SUM(np) AS BIGINT) AS n_pos,
               CAST(SUM(n - np) AS BIGINT) AS n_neg,
               CAST(SUM(np * (2 * cum_before + n + 1)) AS BIGINT)
                 AS two_rpos
        FROM ranked GROUP BY source
    )
    SELECT source, n_pos, n_neg,
           round((CAST(two_rpos AS DOUBLE) / 2.0
                  - CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2.0)
                 / NULLIF(CAST(n_pos AS DOUBLE) * n_neg, 0.0), 6) AS auc
    FROM folded
    """,
)
def q_probe_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ROC-AUC of the quality probe's ranking, computed as
    the exact Mann-Whitney rank statistic: rows group by exact score
    (the refit's bit-identical doubles), cumulative tie-group counts
    give each group's midrank doubled to stay integral, and
    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos*n_neg) folds from exact
    BIGINT sums — no sampled thresholds, no trapezoid approximation,
    ties handled by midranks exactly as scipy would. A source whose
    AUC sits near 0.5 is one the probe cannot rank, no matter where
    the threshold lands.

    Scale: one groupBy to |distinct scores| rows per source, a
    source-partitioned running window over THOSE group rows (tie
    groups, not documents — bounded by the feature grid, not the
    corpus), and a per-source fold. The corpus is touched exactly
    twice: the refit aggregate and the score-group aggregate."""
    from pyspark.sql import Window

    feats = probe_features(read_table(spark, sf_dir, "documents"))
    coef = probe_solve(probe_gram(feats))
    scored = feats.crossJoin(F.broadcast(coef)).select(
        "source",
        "y",
        (F.col("w1") + F.col("w2") * F.col("w") + F.col("w3") * F.col("dd"))
        .alias("s"),
    )
    g = scored.groupBy("source", "s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("np"),
    )
    wcum = (
        Window.partitionBy("source")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.select(
        "source",
        "n",
        "np",
        F.coalesce(F.sum("n").over(wcum), F.lit(0)).alias("cum_before"),
    )
    agg = r.groupBy("source").agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum(F.col("n") - F.col("np")).cast("long").alias("n_neg"),
        F.sum(
            F.col("np") * (2 * F.col("cum_before") + F.col("n") + 1)
        )
        .cast("long")
        .alias("two_rpos"),
    )
    auc = (
        F.col("two_rpos").cast("double") / 2.0
        - F.col("n_pos").cast("double") * (F.col("n_pos") + 1) / 2.0
    ) / F.nullif(F.col("n_pos").cast("double") * F.col("n_neg"), F.lit(0.0))
    return agg.select(
        "source", "n_pos", "n_neg", F.round(auc, 6).alias("auc")
    )


# ---------------------------------------------------------------------------
# K-feature probe: GENERATED cofactor solve (round-13 VERDICT #6)
# ---------------------------------------------------------------------------
# q_linear_probe's 3x3 Cramer expressions are hand-written; scaling the
# probe past two features by hand would be both error-prone and
# unreviewable. Instead the (K+1)x(K+1) closed-form solve is GENERATED:
# one recursive first-row cofactor expansion produces the determinant
# as an operand tree, and the SAME generator runs over Spark Columns
# (the plan), a parenthesizing SQL string builder (the DuckDB oracle),
# and plain Python floats (the numpy parity tests) — so all three
# engines evaluate one identical expression shape and the fitted
# doubles are bit-identical by construction, exactly the 3x3 probe's
# portability contract at any K.


def _det_expr(m):
    """First-row cofactor expansion of an n x n matrix of operands,
    generated recursively with a FIXED association order
    (((t0 - t1) + t2) - t3 ...). Operand-polymorphic: anything
    supporting ``*``, ``+``, ``-`` — Spark Columns, floats, or
    :class:`_SqlOp` — yields the same tree."""
    n = len(m)
    if n == 1:
        return m[0][0]
    acc = None
    for j in range(n):
        minor = [[row[k] for k in range(n) if k != j] for row in m[1:]]
        term = m[0][j] * _det_expr(minor)
        if acc is None:
            acc = term
        elif j % 2:
            acc = acc - term
        else:
            acc = acc + term
    return acc


def _cramer_n(a, b):
    """Generic Cramer solve of ``A w = b`` with :func:`_det_expr`
    determinants: returns the list ``[w_1 .. w_n]`` where column i of
    A is replaced by b in the i-th numerator. Operand-polymorphic like
    the det generator (requires ``/`` as well)."""
    n = len(b)
    det = _det_expr(a)
    out = []
    for i in range(n):
        ai = [
            [(b[r] if c == i else a[r][c]) for c in range(n)]
            for r in range(n)
        ]
        out.append(_det_expr(ai) / det)
    return out


class _SqlOp:
    """Fully parenthesized SQL arithmetic builder: every op emits
    explicit parens, so the tree DuckDB parses is exactly the operand
    tree Python built — the identical tree the Spark Column overloads
    build from the same generator calls."""

    __slots__ = ("s",)

    def __init__(self, s):
        self.s = str(s)

    def __mul__(self, o):
        return _SqlOp(f"({self.s} * {o.s})")

    def __add__(self, o):
        return _SqlOp(f"({self.s} + {o.s})")

    def __sub__(self, o):
        return _SqlOp(f"({self.s} - {o.s})")

    def __truediv__(self, o):
        return _SqlOp(f"({self.s} / {o.s})")


#: K-probe design matrix columns, intercept first. Features are exact
#: row-local integers: word count, distinct words, char count, longest
#: token — so every Gram entry is an exact BIGINT sum and the fit is
#: engine-portable like the 2-feature probe's.
KPROBE_COLS = ("one", "w", "dd", "ch", "mx")
_KP = len(KPROBE_COLS)  # 5: intercept + 4 features


def _kp_sname(i: int, j: int) -> str:
    return f"s_{KPROBE_COLS[i]}_{KPROBE_COLS[j]}"


def _kp_bname(i: int) -> str:
    return f"b_{KPROBE_COLS[i]}"


def kprobe_features(d: DataFrame) -> DataFrame:
    """(source, one, w, dd, ch, mx, y) exact-integer rows — the
    4-feature design matrix plus the English-ness label, all
    row-local."""
    toks = F.split(F.col("text"), " ")
    return d.select(
        "source",
        F.lit(1).cast("long").alias("one"),
        F.size(toks).cast("long").alias("w"),
        F.size(F.array_distinct(toks)).cast("long").alias("dd"),
        F.col("n_chars").cast("long").alias("ch"),
        F.array_max(F.transform(toks, lambda t: F.length(t)))
        .cast("long")
        .alias("mx"),
        F.when(F.col("lang") == "en", F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("y"),
    )


def kprobe_gram(feats: DataFrame) -> DataFrame:
    """One map-side-combined aggregate to the full 5x5
    Gram/moment row: 15 X'X sums (upper triangle) + 5 X'y sums, all
    exact BIGINTs — still an integer monoid, so the K-probe streams
    exactly like the 2-feature one would."""
    aggs = []
    for i in range(_KP):
        for j in range(i, _KP):
            aggs.append(
                F.sum(F.col(KPROBE_COLS[i]) * F.col(KPROBE_COLS[j]))
                .cast("long")
                .alias(_kp_sname(i, j))
            )
        aggs.append(
            F.sum(F.col(KPROBE_COLS[i]) * F.col("y"))
            .cast("long")
            .alias(_kp_bname(i))
        )
    return feats.agg(*aggs)


def _kprobe_matrix(cell):
    """Build the ridge normal-equation matrix A = X'X + lambda*I and
    rhs b = X'y as operands, via a caller-supplied ``cell(name, diag)``
    factory — shared by the Spark solve and the SQL twin so the two
    matrices are the same generator output."""
    a = [
        [
            cell(_kp_sname(min(i, j), max(i, j)), i == j)
            for j in range(_KP)
        ]
        for i in range(_KP)
    ]
    b = [cell(_kp_bname(i), False) for i in range(_KP)]
    return a, b


def _kprobe_det_sqls() -> list[str]:
    """The 1+K generated determinant strings (denominator first, then
    the K+1 Cramer numerators) over the Gram column names — the SINGLE
    source both engines parse: Spark consumes them via ``F.expr`` (one
    parse instead of ~2000 py4j Column calls), DuckDB inside the
    oracle CTE. Fully parenthesized, so both parsers build the same
    tree and the solve stays bit-identical."""

    def cell(name, diag):
        base = f"CAST({name} AS DOUBLE)"
        return _SqlOp(f"({base} + {PROBE_LAMBDA})" if diag else base)

    a, b = _kprobe_matrix(cell)
    out = [_det_expr(a).s]
    for i in range(_KP):
        ai = [
            [(b[r] if c == i else a[r][c]) for c in range(_KP)]
            for r in range(_KP)
        ]
        out.append(_det_expr(ai).s)
    return out


def kprobe_solve(g: DataFrame) -> DataFrame:
    """Generated-Cramer solve of the (K+1)x(K+1) ridge system from the
    1-row Gram frame: determinants stage through named columns (det,
    det1..det5) so each is computed once; the weights are the staged
    ratios."""
    dets = _kprobe_det_sqls()
    staged = g.select(
        F.expr(dets[0]).alias("det"),
        *[F.expr(dets[i + 1]).alias(f"det{i + 1}") for i in range(_KP)],
    )
    return staged.select(
        *[
            (F.col(f"det{i + 1}") / F.col("det")).alias(f"w{i + 1}")
            for i in range(_KP)
        ]
    )


def _kprobe_sql_ctes() -> str:
    """The K-probe refit CTE chain (features -> Gram -> generated
    Cramer), SQL twin of :func:`kprobe_features` +
    :func:`kprobe_gram` + :func:`kprobe_solve` — determinant strings
    come from the SAME :func:`_det_expr` generator over
    :class:`_SqlOp` operands (via :func:`_kprobe_det_sqls`, the
    strings Spark's ``F.expr`` parses too)."""
    toks = "string_split(text, ' ')"
    gram = []
    for i in range(_KP):
        for j in range(i, _KP):
            gram.append(
                f"CAST(SUM({KPROBE_COLS[i]} * {KPROBE_COLS[j]}) AS BIGINT)"
                f" AS {_kp_sname(i, j)}"
            )
        gram.append(
            f"CAST(SUM({KPROBE_COLS[i]} * y) AS BIGINT) AS {_kp_bname(i)}"
        )

    dets = _kprobe_det_sqls()
    det_cols = [f"{dets[0]} AS det"] + [
        f"{dets[i + 1]} AS det{i + 1}" for i in range(_KP)
    ]
    ws = ", ".join(
        f"(det{i + 1} / det) AS w{i + 1}" for i in range(_KP)
    )
    return f"""
    f AS (
        SELECT source,
               1 AS one,
               len({toks}) AS w,
               len(list_distinct({toks})) AS dd,
               n_chars AS ch,
               list_max(list_transform({toks}, t -> length(t))) AS mx,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    g AS (
        SELECT {", ".join(gram)}
        FROM f
    ),
    dets AS (
        SELECT {", ".join(det_cols)}
        FROM g
    ),
    c AS (
        SELECT {ws} FROM dets
    )
    """


#: q_linear_probe_k's oracle — the refit (generated solve included) is
#: value-hash-gated end to end.
SQL_LINEAR_PROBE_K = f"""
    WITH {_kprobe_sql_ctes()},
    scored AS (
        SELECT f.source, f.w, f.dd, f.ch, f.mx, f.y,
               (c.w1 + c.w2 * f.w + c.w3 * f.dd
                + c.w4 * f.ch + c.w5 * f.mx) AS score,
               c.w1 AS w1, c.w2 AS w2, c.w3 AS w3,
               c.w4 AS w4, c.w5 AS w5
        FROM f, c
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(max(w1)
                 + max(w2) * (CAST(SUM(w) AS DOUBLE) / COUNT(*))
                 + max(w3) * (CAST(SUM(dd) AS DOUBLE) / COUNT(*))
                 + max(w4) * (CAST(SUM(ch) AS DOUBLE) / COUNT(*))
                 + max(w5) * (CAST(SUM(mx) AS DOUBLE) / COUNT(*)), 6)
               AS mean_score,
           round(CAST(SUM(CASE WHEN (score >= 0.5) = (y = 1)
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS accuracy,
           round(max(w1), 6) AS w_intercept,
           round(max(w2), 6) AS w_words,
           round(max(w3), 6) AS w_distinct,
           round(max(w4), 6) AS w_chars,
           round(max(w5), 6) AS w_maxlen
    FROM scored
    GROUP BY source
    """


@query("q_linear_probe_k", oracle=SQL_LINEAR_PROBE_K)
def q_linear_probe_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-feature closed-form ridge probe with a GENERATED Cramer solve:
    the 5x5 normal-equation determinants come from one recursive
    cofactor-expansion generator (`_det_expr`) evaluated over Spark
    Columns here and over a parenthesizing SQL builder in the oracle —
    the same generator, the same tree, bit-identical doubles, so
    extending the probe past two features costs no hand-written
    algebra and no portability risk. Features are exact row-local
    integers (words, distinct words, chars, longest token); label is
    English-ness; report is per-source mean score, train accuracy, and
    the five learned weights. The oracle REFITS the identical probe —
    training math value-hash-gated at K=4 exactly as at K=2.

    Scale: identical shape to q_linear_probe — ONE map-side-combined
    aggregate to 20 integer sums, an O(1) scalar solve inside the plan
    (the generated 5x5 dets are ~320 arithmetic nodes each — trivial
    for codegen), and a map-only scoring pass under a 1-row broadcast
    cross. K grows the Gram row quadratically and the solve
    exponentially in EXPRESSION SIZE only, never in data movement; at
    K<=8 both stay negligible next to the scan."""
    feats = kprobe_features(read_table(spark, sf_dir, "documents"))
    coef = kprobe_solve(kprobe_gram(feats))
    scored = feats.crossJoin(F.broadcast(coef)).withColumn(
        "score",
        F.col("w1")
        + F.col("w2") * F.col("w")
        + F.col("w3") * F.col("dd")
        + F.col("w4") * F.col("ch")
        + F.col("w5") * F.col("mx"),
    )
    acc_flag = F.when(
        (F.col("score") >= 0.5) == (F.col("y") == 1), F.lit(1)
    ).otherwise(F.lit(0))
    cnt = F.count(F.lit(1))
    return scored.groupBy("source").agg(
        cnt.cast("long").alias("n_docs"),
        F.round(
            F.max("w1")
            + F.max("w2") * (F.sum("w").cast("double") / cnt)
            + F.max("w3") * (F.sum("dd").cast("double") / cnt)
            + F.max("w4") * (F.sum("ch").cast("double") / cnt)
            + F.max("w5") * (F.sum("mx").cast("double") / cnt),
            6,
        ).alias("mean_score"),
        F.round(F.sum(acc_flag).cast("double") / cnt, 6).alias("accuracy"),
        F.round(F.max("w1"), 6).alias("w_intercept"),
        F.round(F.max("w2"), 6).alias("w_words"),
        F.round(F.max("w3"), 6).alias("w_distinct"),
        F.round(F.max("w4"), 6).alias("w_chars"),
        F.round(F.max("w5"), 6).alias("w_maxlen"),
    )


# ---------------------------------------------------------------------------
# grouped K-feature regression: the generated solve, vectorized per group
# ---------------------------------------------------------------------------
# q_grouped_regression proves K models train in ONE grouped aggregate
# at 2 features (hand-written 3x3 Cramer); q_linear_probe_k proves the
# GENERATED solve at 4 features globally. This closes the square: the
# generated (K+1)x(K+1) determinants are plain scalar expressions, so
# applying them to EVERY row of a grouped Gram frame costs nothing new
# — one shuffle trains |groups| four-coefficient models, each with its
# in-plan RMSE. The generic helpers below parameterize the generator
# by column list; the kprobe constants above are one instantiation.

#: grouped-K design columns (intercept + words, distinct, longest tok)
GRK_COLS = ("one", "w", "dd", "mx")


def _ridge_names(cols):
    """(i,j) -> Gram sum name, i -> moment name, for any column list."""
    sname = lambda i, j: f"s_{cols[i]}_{cols[j]}"  # noqa: E731
    bname = lambda i: f"b_{cols[i]}"  # noqa: E731
    return sname, bname


def _ridge_det_sqls(cols) -> list[str]:
    """Generated determinant strings (denominator + K+1 numerators)
    for the ridge system over any design-column list — the generic
    form of :func:`_kprobe_det_sqls`."""
    sname, bname = _ridge_names(cols)
    k = len(cols)

    def cell(name, diag):
        base = f"CAST({name} AS DOUBLE)"
        return _SqlOp(f"({base} + {PROBE_LAMBDA})" if diag else base)

    a = [
        [cell(sname(min(i, j), max(i, j)), i == j) for j in range(k)]
        for i in range(k)
    ]
    b = [cell(bname(i), False) for i in range(k)]
    out = [_det_expr(a).s]
    for i in range(k):
        ai = [
            [(b[r] if c == i else a[r][c]) for c in range(k)]
            for r in range(k)
        ]
        out.append(_det_expr(ai).s)
    return out


def _rss_expr(ws, a, b, syy):
    """RSS = y'y - 2 w'X'y + w'X'Xw with a FIXED fold order, operand-
    polymorphic like the det generator (2x written as lin+lin so no
    literal constant is needed in any operand algebra)."""

    def fold(terms):
        acc = terms[0]
        for t in terms[1:]:
            acc = acc + t
        return acc

    k = len(ws)
    lin = fold([ws[i] * b[i] for i in range(k)])
    quad = fold(
        [ws[i] * fold([a[i][j] * ws[j] for j in range(k)]) for i in range(k)]
    )
    return (syy - (lin + lin)) + quad


def _grk_rss_sql() -> str:
    """The grouped-K RSS as a SQL string over the Gram column names
    and solved w1..w4 — same generator, `_SqlOp` operands. The RSS
    matrix is the RAW X'X (no ridge lambda), matching
    q_grouped_regression's convention."""
    sname, bname = _ridge_names(GRK_COLS)
    k = len(GRK_COLS)
    cast = lambda n: _SqlOp(f"CAST({n} AS DOUBLE)")  # noqa: E731
    a = [
        [cast(sname(min(i, j), max(i, j))) for j in range(k)]
        for i in range(k)
    ]
    b = [cast(bname(i)) for i in range(k)]
    ws = [_SqlOp(f"w{i + 1}") for i in range(k)]
    return _rss_expr(ws, a, b, cast("syy")).s


def _grk_sql() -> str:
    sname, bname = _ridge_names(GRK_COLS)
    k = len(GRK_COLS)
    toks = "string_split(text, ' ')"
    gram = []
    for i in range(k):
        for j in range(i, k):
            gram.append(
                f"CAST(SUM({GRK_COLS[i]} * {GRK_COLS[j]}) AS BIGINT)"
                f" AS {sname(i, j)}"
            )
        gram.append(f"CAST(SUM({GRK_COLS[i]} * y) AS BIGINT) AS {bname(i)}")
    gram.append("CAST(SUM(y * y) AS BIGINT) AS syy")
    dets = _ridge_det_sqls(GRK_COLS)
    det_cols = [f"{dets[0]} AS det"] + [
        f"{dets[i + 1]} AS det{i + 1}" for i in range(k)
    ]
    ws = ", ".join(f"(det{i + 1} / det) AS w{i + 1}" for i in range(k))
    return f"""
    WITH f AS (
        SELECT lang,
               1 AS one,
               len({toks}) AS w,
               len(list_distinct({toks})) AS dd,
               list_max(list_transform({toks}, t -> length(t))) AS mx,
               n_chars AS y
        FROM documents
    ),
    g AS (
        SELECT lang, {", ".join(gram)}
        FROM f GROUP BY lang
    ),
    dets AS (
        SELECT *, {", ".join(det_cols)} FROM g
    ),
    c AS (
        SELECT *, {ws} FROM dets
    )
    SELECT lang,
           s_one_one AS n_docs,
           round(w1, 6) AS w_intercept,
           round(w2, 6) AS w_words,
           round(w3, 6) AS w_distinct,
           round(w4, 6) AS w_maxlen,
           round(sqrt(GREATEST({_grk_rss_sql()}, 0.0)
                      / CAST(s_one_one AS DOUBLE)), 6) AS rmse
    FROM c
    """


@query("q_grouped_regression_k", oracle=_grk_sql())
def q_grouped_regression_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language 3-feature ridge regression (n_chars on word count,
    distinct words, longest token) solved by the GENERATED 4x4 Cramer
    expressions applied to every row of ONE grouped Gram aggregate —
    K models, K in-plan RMSEs, one shuffle, zero hand-written algebra:
    the determinants, the solve, and the RSS fold all come from the
    same operand-polymorphic generator the oracle's SQL twin uses, so
    every model's coefficients are bit-identical across engines.

    Scale: identical to q_grouped_regression — one map-side-combined
    groupBy to |groups| Gram rows (15 exact BIGINTs each), scalar
    expressions on those rows. The generated-solve cost is expression
    size, not data movement; a thousand domains train for the price of
    the single shuffle."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    f = d.select(
        "lang",
        F.lit(1).cast("long").alias("one"),
        F.size(toks).cast("long").alias("w"),
        F.size(F.array_distinct(toks)).cast("long").alias("dd"),
        F.array_max(F.transform(toks, lambda t: F.length(t)))
        .cast("long")
        .alias("mx"),
        F.col("n_chars").cast("long").alias("y"),
    )
    sname, bname = _ridge_names(GRK_COLS)
    k = len(GRK_COLS)
    aggs = []
    for i in range(k):
        for j in range(i, k):
            aggs.append(
                F.sum(F.col(GRK_COLS[i]) * F.col(GRK_COLS[j]))
                .cast("long")
                .alias(sname(i, j))
            )
        aggs.append(
            F.sum(F.col(GRK_COLS[i]) * F.col("y"))
            .cast("long")
            .alias(bname(i))
        )
    aggs.append(F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"))
    g = f.groupBy("lang").agg(*aggs)
    dets = _ridge_det_sqls(GRK_COLS)
    staged = g.select(
        "*",
        F.expr(dets[0]).alias("det"),
        *[F.expr(dets[i + 1]).alias(f"det{i + 1}") for i in range(k)],
    )
    solved = staged.select(
        "*",
        *[
            (F.col(f"det{i + 1}") / F.col("det")).alias(f"w{i + 1}")
            for i in range(k)
        ],
    )
    cast = lambda n: F.col(n).cast("double")  # noqa: E731
    a = [
        [cast(sname(min(i, j), max(i, j))) for j in range(k)]
        for i in range(k)
    ]
    b = [cast(bname(i)) for i in range(k)]
    ws = [F.col(f"w{i + 1}") for i in range(k)]
    rss = _rss_expr(ws, a, b, cast("syy"))
    return solved.select(
        "lang",
        F.col("s_one_one").alias("n_docs"),
        F.round("w1", 6).alias("w_intercept"),
        F.round("w2", 6).alias("w_words"),
        F.round("w3", 6).alias("w_distinct"),
        F.round("w4", 6).alias("w_maxlen"),
        F.round(
            F.sqrt(
                F.greatest(rss, F.lit(0.0))
                / F.col("s_one_one").cast("double")
            ),
            6,
        ).alias("rmse"),
    )


# ---------------------------------------------------------------------------
# isotonic calibration (PAV via the minimax closed form) — round 15
# ---------------------------------------------------------------------------
# q_probe_calibration reports per-bin calibration error; the FIX for a
# miscalibrated score is isotonic regression — the maximum-likelihood
# monotone mapping from score to outcome rate. The classic PAV
# algorithm is sequential pooling, but its solution has a closed
# minimax form: fit(k) = max_{i<=k} min_{j>=k} wavg(i..j), which is
# pure relational algebra over the BINNED frame — two bounded
# self-joins and two aggregates, O(B^3) pairs on a B-row frame (B is
# the resolution dial; the raw scan never replays). Weighted averages
# come from INTEGER prefix-count differences, so both engines divide
# identical integers: engine-exact by construction.

#: score bins: the discount percent (0..10), an ordered 11-level score
ISO_BINS = 11


@query(
    "q_isotonic_calibration",
    oracle="""
    WITH b AS (
        SELECT CAST(round(l_discount * 100) AS INT) AS score_bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM lineitem GROUP BY 1
    ),
    c AS (
        SELECT b.*,
               CAST(SUM(n) OVER (ORDER BY score_bin
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumn,
               CAST(SUM(pos) OVER (ORDER BY score_bin
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumpos
        FROM b
    ),
    iv AS (
        SELECT score_bin AS i, cumn - n AS n0, cumpos - pos AS p0 FROM c
    ),
    jv AS (SELECT score_bin AS j, cumn AS n1, cumpos AS p1 FROM c),
    pairs AS (
        SELECT iv.i, jv.j,
               CAST(jv.p1 - iv.p0 AS DOUBLE)
               / CAST(jv.n1 - iv.n0 AS DOUBLE) AS wavg
        FROM iv JOIN jv ON jv.j >= iv.i
    ),
    inner_min AS (
        SELECT c.score_bin, pairs.i, MIN(pairs.wavg) AS mn
        FROM c JOIN pairs
          ON pairs.i <= c.score_bin AND pairs.j >= c.score_bin
        GROUP BY c.score_bin, pairs.i
    ),
    fit AS (
        SELECT score_bin, MAX(mn) AS iso FROM inner_min GROUP BY score_bin
    )
    SELECT c.score_bin, c.n,
           round(CAST(c.pos AS DOUBLE) / c.n, 6) AS raw_rate,
           round(fit.iso, 6) AS isotonic_rate
    FROM c JOIN fit USING (score_bin)
    """,
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of the return rate against the discount
    score ({ISO_BINS} ordered bins): the maximum-likelihood MONOTONE
    score->rate mapping, i.e. what PAV (pool adjacent violators)
    computes — but via the minimax closed form fit(k) = max over
    i <= k of min over j >= k of the weighted mean rate of bins i..j,
    which is two bounded self-joins + two aggregates instead of a
    sequential pooling loop. Weighted means are integer prefix-count
    differences divided once, so both engines produce bit-identical
    doubles; a python PAV recompute pins the closed form against the
    textbook algorithm in tests.

    Scale: the raw scan reduces once to the B-row binned frame; the
    O(B^3) pair lattice lives entirely on that frame (B = {ISO_BINS}
    here; even B = 1000 is 10^9 cheap double comparisons spread
    across the cluster, and B is the resolution dial)."""
    li = read_table(spark, sf_dir, "lineitem")
    b = li.groupBy(
        F.round(F.col("l_discount") * 100).cast("int").alias("score_bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("pos"),
    )
    wcum = Window.orderBy("score_bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = b.withColumn("cumn", F.sum("n").over(wcum).cast("long")).withColumn(
        "cumpos", F.sum("pos").over(wcum).cast("long")
    )
    iv = c.select(
        F.col("score_bin").alias("i"),
        (F.col("cumn") - F.col("n")).alias("n0"),
        (F.col("cumpos") - F.col("pos")).alias("p0"),
    )
    jv = c.select(
        F.col("score_bin").alias("j"),
        F.col("cumn").alias("n1"),
        F.col("cumpos").alias("p1"),
    )
    pairs = iv.join(F.broadcast(jv), F.col("j") >= F.col("i")).select(
        "i",
        "j",
        (
            (F.col("p1") - F.col("p0")).cast("double")
            / (F.col("n1") - F.col("n0")).cast("double")
        ).alias("wavg"),
    )
    inner_min = (
        c.select("score_bin")
        .join(
            F.broadcast(pairs),
            (F.col("i") <= F.col("score_bin"))
            & (F.col("j") >= F.col("score_bin")),
        )
        .groupBy("score_bin", "i")
        .agg(F.min("wavg").alias("mn"))
    )
    fit = inner_min.groupBy("score_bin").agg(F.max("mn").alias("iso"))
    return (
        c.join(fit, "score_bin")
        .select(
            "score_bin",
            "n",
            F.round(F.col("pos").cast("double") / F.col("n"), 6).alias(
                "raw_rate"
            ),
            F.round("iso", 6).alias("isotonic_rate"),
        )
    )


_fmt(q_isotonic_calibration, ISO_BINS=ISO_BINS)
