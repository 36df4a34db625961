"""Similarity search over embedding columns (training-data pipeline).

Two paths over ``embeddings`` (``array<float>``, 64-dim):

* ``q_ann_topk`` — brute-force cosine top-k: the correctness baseline.
  Scale shape: broadcast the (small) query set against the corpus, one
  pass, per-query top-k via window — at 100 TB you'd replace the window
  with a per-partition heap + final merge, which Catalyst already
  approximates via partial TakeOrdered when k is small.
* ``q_ann_lsh`` — random-hyperplane LSH: the scale path. Bucket =
  sign-bits of 6 pseudo-random hyperplane projections; candidates come
  from bucket-equality joins (shuffle bounded by bucket collision
  counts), re-ranked by exact cosine.

Determinism: hyperplanes are derived from md5 parity (portable across
engines); projections are summed in exact decimal so the sign — and
therefore the bucket — is independent of row order and partitioning.
Cosines use the fixed-shape formula of ``functions.texthash.cosine``
(bit-identical to the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.functions.texthash import (
    cosine,
    cosine_hoisted,
    sq_sum,
    sql_cosine,
    sql_portable_hash60,
)
from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import fan_out, read_table

N_QUERIES = 10
TOP_K = 5
LSH_PLANES = 6
LSH_QUERIES = 50
LSH_TOP_K = 3
DIM = 64


@query(
    "q_ann_topk",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {sql_cosine('q.qe', 'e.embedding')} AS c
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, c,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY c DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           round(c, 6) AS cos_sim
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for the first N query vectors."""
    e = read_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qe"), F.col("embedding")).alias("c"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("c", 6).alias("cos_sim"))
    )


_SQL_BUCKETS = f"""
    planes AS (
        SELECT j.j AS j, d.d AS d,
               (({sql_portable_hash60("j.j::VARCHAR || '_' || d.d::VARCHAR")} % 2) * 2 - 1) AS sign
        FROM (SELECT unnest(generate_series(0, {LSH_PLANES - 1})) AS j) j,
             (SELECT unnest(generate_series(0, {DIM - 1})) AS d) d
    ),
    comps AS (
        SELECT e.vec_id, d.d AS d,
               CAST(CAST(e.embedding[d.d + 1] AS DOUBLE) AS DECIMAL(18,9)) AS val
        FROM embeddings e, (SELECT unnest(generate_series(0, {DIM - 1})) AS d) d
    ),
    proj AS (
        SELECT c.vec_id, p.j, SUM(c.val * p.sign) AS pv
        FROM comps c JOIN planes p ON c.d = p.d
        GROUP BY c.vec_id, p.j
    ),
    buckets AS (
        SELECT vec_id,
               CAST(SUM(CASE WHEN pv >= 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT)
                 AS bucket
        FROM proj GROUP BY vec_id
    )
"""


@query(
    "q_ann_lsh",
    oracle=f"""
    WITH {_SQL_BUCKETS},
    cand AS (
        SELECT qb.vec_id AS query_id, nb.vec_id AS neighbor_id
        FROM buckets qb
        JOIN buckets nb ON qb.bucket = nb.bucket AND nb.vec_id <> qb.vec_id
        WHERE qb.vec_id < {LSH_QUERIES}
    ),
    scored AS (
        SELECT c.query_id, c.neighbor_id,
               {sql_cosine('q.embedding', 'n.embedding')} AS cs
        FROM cand c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings n ON n.vec_id = c.neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cs,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           round(cs, 6) AS cos_sim
    FROM ranked WHERE rank <= {LSH_TOP_K}
    """,
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: 6 sign-bits -> 64 buckets; candidates by
    bucket equality; exact-cosine re-rank, top-3 per query.

    Scale: buckets are computed in one pass (explode 64 dims, broadcast
    the 6x64 plane table, two map-side-combining aggregations); the
    candidate join is equi on bucket. No all-pairs stage anywhere.
    """
    e = read_table(spark, sf_dir, "embeddings")

    # Hyperplane signs are md5-parity — portable, so they are computed
    # HERE at plan-build time (hashlib md5 == Spark md5 == DuckDB md5)
    # and embedded as literal arrays. The projection then becomes a
    # row-local decimal fold: bucket assignment is map-only, no
    # dim-explode, no plane join, no shuffle. (The oracle still derives
    # the same signs in SQL — an independent re-derivation.)
    import hashlib

    def _sign(j: int, d: int) -> int:
        h = int(hashlib.md5(f"{j}_{d}".encode()).hexdigest()[:15], 16)
        return (h % 2) * 2 - 1

    bucket_expr = None
    for j in range(LSH_PLANES):
        signs = F.array(*[F.lit(_sign(j, d)) for d in range(DIM)])
        # identical arithmetic shape to the SQL: per-dim
        # decimal(18,9)(double(x)) * sign, summed exactly
        terms = F.zip_with(
            F.col("embedding"),
            signs,
            lambda x, s: x.cast("double").cast("decimal(18,9)") * s,
        )
        pv = F.aggregate(
            terms,
            F.lit(0).cast("decimal(28,9)"),
            # re-cast: decimal + widens precision each step otherwise
            # (exact: |pv| << 10^19 so (28,9) never truncates)
            lambda acc, t: (acc + t).cast("decimal(28,9)"),
        )
        bit = F.when(pv >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket_expr = bit if bucket_expr is None else bucket_expr + bit
    buckets = e.select("vec_id", bucket_expr.cast("bigint").alias("bucket"))
    cand = (
        buckets.alias("qb")
        .where(F.col("qb.vec_id") < LSH_QUERIES)
        .join(
            buckets.alias("nb"),
            (F.col("qb.bucket") == F.col("nb.bucket"))
            & (F.col("nb.vec_id") != F.col("qb.vec_id")),
        )
        .select(
            F.col("qb.vec_id").alias("query_id"),
            F.col("nb.vec_id").alias("neighbor_id"),
        )
    )
    scored = (
        cand.join(
            e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")),
            "query_id",
        )
        .join(
            e.select(
                F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")
            ),
            "neighbor_id",
        )
        .select("query_id", "neighbor_id", cosine(F.col("qe"), F.col("ne")).alias("cs"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cs").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= LSH_TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("cs", 6).alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantizer -> cluster lists -> probe & re-rank
# ---------------------------------------------------------------------------

IVF_CENTROIDS = 16
IVF_NPROBE = 2
IVF_QUERIES = 50
IVF_TOP_K = 3

_SQL_IVF = f"""
    cents AS (
        SELECT vec_id AS cid, embedding AS ce
        FROM embeddings WHERE vec_id < {IVF_CENTROIDS}
    ),
    assign AS (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {sql_cosine('e.embedding', 'c.ce')} DESC,
                                           c.cid) AS r
        FROM embeddings e CROSS JOIN cents c
    ),
    lists AS (SELECT vec_id, cid FROM assign WHERE r = 1),
    probes AS (
        SELECT vec_id AS query_id, cid FROM assign
        WHERE r <= {IVF_NPROBE} AND vec_id < {IVF_QUERIES}
    ),
    cand AS (
        SELECT DISTINCT p.query_id, l.vec_id AS neighbor_id
        FROM probes p JOIN lists l ON l.cid = p.cid
        WHERE l.vec_id <> p.query_id
    ),
    scored AS (
        SELECT c.query_id, c.neighbor_id,
               {sql_cosine('q.embedding', 'n.embedding')} AS cs
        FROM cand c
        JOIN embeddings q ON q.vec_id = c.query_id
        JOIN embeddings n ON n.vec_id = c.neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cs,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cs DESC, neighbor_id) AS rank
        FROM scored
    )
"""


def _ivf_candidates(e: DataFrame) -> DataFrame:
    """The IVF candidate set (query_id, neighbor_id) — assignment,
    probe, list join, self-pair drop, distinct. Factored out of
    ``q_ann_ivf`` so ``scripts/ann_probe.py`` can count candidates
    independently of ranking (the round-8 sf1 discrepancy probe)."""
    cents = e.where(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    scored_assign = fan_out(e, "vec_id").join(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        cosine(F.col("embedding"), F.col("ce")).alias("ac"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("ac").desc(), F.col("cid")
    )
    ranked_assign = scored_assign.withColumn(
        "r", F.row_number().over(w_assign)
    )
    lists = ranked_assign.where(F.col("r") == 1).select("vec_id", "cid")
    probes = ranked_assign.where(
        (F.col("r") <= IVF_NPROBE) & (F.col("vec_id") < IVF_QUERIES)
    ).select(F.col("vec_id").alias("query_id"), "cid")
    # probes is bounded by the query's CONSTANTS (IVF_QUERIES x
    # IVF_NPROBE rows at any corpus size) — broadcast it explicitly so
    # the corpus-sized lists side never shuffles (guide §3.1; the
    # planner's size estimate for a window-filtered subtree is too
    # coarse to pick this on its own)
    return (
        F.broadcast(probes).join(lists, "cid")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )


@query(
    "q_ann_ivf",
    oracle=f"""
    WITH {_SQL_IVF}
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           round(cs, 6) AS cos_sim
    FROM ranked WHERE rank <= {IVF_TOP_K}
    """,
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: a 16-centroid coarse quantizer partitions the corpus
    into inverted lists; each query probes its nprobe=2 nearest lists
    and re-ranks candidates by exact cosine.

    The quantizer here is deterministic (the first 16 vectors) so the
    oracle can replay it; production would train centroids with k-means
    (MLlib) — the assignment/probe/re-rank plumbing is identical.

    Scale: assignment is map-only (broadcast 16 centroids, top-1 per
    vector); the candidate join is equi on cluster id, bounded by list
    sizes (~N/K per list); exact cosine touches only candidates. This
    is the layout FAISS-style IVF uses, expressed as DataFrame ops.
    """
    e = read_table(spark, sf_dir, "embeddings")
    cand = _ivf_candidates(e)
    scored = (
        cand.join(
            e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")),
            "query_id",
        )
        .join(
            e.select(
                F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")
            ),
            "neighbor_id",
        )
        .select("query_id", "neighbor_id", cosine(F.col("qe"), F.col("ne")).alias("cs"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cs").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= IVF_TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cs", 6).alias("cos_sim"))
    )


# --------------------------------------------------------------------------
# Iterative k-means (Lloyd's, 2 rounds) — fully declarative, SQL oracle
# --------------------------------------------------------------------------
KM_K = 8
KM_DEC = "decimal(38,6)"

_SQL_KM_ASSIGN = """
    {out} AS (
        SELECT vec_id, cid, cs FROM (
            SELECT e.vec_id, c.cid,
                   {cos} AS cs,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY {cos} DESC, c.cid) AS r
            FROM embeddings e CROSS JOIN {cents} c
        ) WHERE r = 1
    )
"""


def _sql_km_assign(out: str, cents: str) -> str:
    cos = sql_cosine("e.embedding", "c.ce")
    return _SQL_KM_ASSIGN.format(out=out, cents=cents, cos=cos)


@query(
    "q_kmeans",
    oracle=f"""
    WITH cents0 AS (
        SELECT vec_id AS cid, embedding AS ce
        FROM embeddings WHERE vec_id < {KM_K}
    ),
    {_sql_km_assign('a1', 'cents0')},
    upd AS (
        SELECT cid, d,
               CAST(SUM(CAST(CAST(e.embedding[d] AS DOUBLE) AS DECIMAL(38,6)))
                    AS DOUBLE)
                 / COUNT(*) AS cv
        FROM a1 JOIN embeddings e USING (vec_id), range(1, 65) t(d)
        GROUP BY cid, d
    ),
    cents1 AS (
        SELECT cid, list(cv ORDER BY d) AS ce FROM upd GROUP BY cid
    ),
    {_sql_km_assign('a2', 'cents1')},
    norms AS (
        SELECT cid, sqrt(list_dot_product(ce::DOUBLE[], ce::DOUBLE[]))
               AS centroid_norm
        FROM cents1
    )
    SELECT a2.cid, COUNT(*) AS n,
           CAST(SUM(CAST(cs AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
             AS mean_cos,
           ANY_VALUE(centroid_norm) AS centroid_norm
    FROM a2 JOIN norms ON a2.cid = norms.cid
    GROUP BY a2.cid
    ORDER BY a2.cid
    """,
)
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means, two Lloyd iterations, K=8, deterministic init
    (first K vectors) — the iterative-algorithm shape (MLlib's KMeans
    does the same loop) kept fully declarative so the DuckDB oracle can
    replay it exactly.

    Per iteration:
    * assign — broadcast the K centroids, score cosine per (vector,
      centroid), argmax via partial-aggregating MAX(struct(cs, -cid)):
      the 8x fan-out collapses map-side, so the shuffle carries one row
      per vector, not K.
    * update — per-cluster centroid = per-dimension mean, computed as
      64 exact decimal(38,6) SUMs in ONE hash aggregate (map-side
      partial): the shuffle carries K x 64 decimal sums per partition.
      No explode: dimension access is a row-local projection.

    Determinism: cosine uses the fixed-shape fold (bit-identical to
    DuckDB's list_dot_product); means are exact-decimal; the argmax
    tie-breaks on cid. Every derived double is therefore bit-equal in
    both engines, so the 2nd iteration's assignment — and the reported
    mean cosine per cluster — hash-match without rounding.

    Scale: per iteration one broadcast + two map-side-combining
    shuffles (argmax rows, K x 64 sums). Centroids never leave the
    cluster (no driver collect); K more iterations = K more cheap
    stages, embeddings scanned once per assignment.
    """
    e = read_table(spark, sf_dir, "embeddings")
    # round 18: each side's norm sum is hoisted to ONE fold per row
    # before the K-way broadcast cross (inside the pair expression the
    # vector-side fold ran once per centroid and the centroid-side once
    # per vector) — the r17 eval-panel pattern, bit-identical doubles
    ef = fan_out(e, "vec_id").select(
        "vec_id", "embedding", sq_sum(F.col("embedding")).alias("en")
    )

    def assign(
        cents: DataFrame, out_cs: str = "cs", carry_norm: bool = False
    ) -> DataFrame:
        cn = cents.select("cid", "ce", sq_sum(F.col("ce")).alias("cn"))
        norm_cols = (
            [F.sqrt(F.col("cn")).alias("cnorm")] if carry_norm else []
        )
        scored = ef.join(F.broadcast(cn)).select(
            "vec_id",
            "cid",
            cosine_hoisted(
                F.col("embedding"), F.col("ce"), F.col("en"), F.col("cn")
            ).alias("cs"),
            *norm_cols,
        )
        # carry_norm rides the argmax struct BEHIND the (cs, ncid)
        # tie-break (ncid is unique per group, so cnorm never decides
        # the max) — it lets the caller read the winning centroid's
        # norm without a second consumer of the centroid frame
        struct_cols = [F.col("cs"), (-F.col("cid")).alias("ncid")]
        if carry_norm:
            struct_cols.append(F.col("cnorm"))
        win = (
            scored.groupBy("vec_id")
            .agg(F.max(F.struct(*struct_cols)).alias("best"))
            .select(
                "vec_id",
                (-F.col("best.ncid")).alias("cid"),
                F.col("best.cs").alias(out_cs),
                *(
                    [F.col("best.cnorm").alias("cnorm")]
                    if carry_norm
                    else []
                ),
            )
        )
        return win

    cents0 = e.where(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    a1 = assign(cents0)
    dims = [
        (
            F.sum(F.col("embedding")[d].cast("double").cast(KM_DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias(f"d{d}")
        for d in range(DIM)
    ]
    # round 18: assignment 2 carries the winning centroid's norm
    # (sqrt of the SAME sq_sum fold the old norm projection computed —
    # bit-identical doubles), so cents1 has exactly ONE consumer: no
    # lazy checkpoint (whose physical planning pre-executed shuffle
    # stages at construction), no join-back of the norms, one lineage
    cents1 = (
        a1.join(e, "vec_id")
        .groupBy("cid")
        .agg(*dims)
        .select("cid", F.array(*[F.col(f"d{d}") for d in range(DIM)]).alias("ce"))
    )
    a2 = assign(cents1, carry_norm=True)
    return (
        a2.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("cs").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_cos"),
            F.max("cnorm").alias("centroid_norm"),
        )
        .select("cid", "n", "mean_cos", "centroid_norm")
        .orderBy("cid")
    )


# --------------------------------------------------------------------------
# int8 scalar quantization (vector compression for ANN at scale)
# --------------------------------------------------------------------------
@query(
    "q_embedding_quantize",
    oracle=f"""
    WITH t AS (
        SELECT vec_id, embedding::DOUBLE[] AS ed,
               list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
                 AS scale
        FROM embeddings
        WHERE list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) > 0
    ),
    q AS (
        SELECT vec_id, ed, scale,
               list_transform(ed, x -> floor(x * 127.0 / scale + 0.5))
                 AS codes
        FROM t
    ),
    e AS (
        SELECT vec_id, scale,
               list_transform(
                   list_zip(ed, codes),
                   p -> p[1] - p[2] * scale / 127.0
               ) AS err
        FROM q
    )
    SELECT vec_id,
           round(scale, 9) AS scale,
           round(list_max(list_transform(err, x -> abs(x))), 9)
             AS max_abs_err,
           round(list_sum(list_transform(err, x -> x * x)) / {DIM}, 9)
             AS mse
    FROM e
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization + reconstruction
    error — the compression step that makes billion-vector ANN fit in
    memory (4x smaller than float32, 8x than float64).

    code_i = floor(x_i * 127 / max|x| + 0.5) — spelled as floor(+0.5)
    in BOTH engines so no round-half-to-even/away divergence can split
    the oracle. Everything is row-local array HOFs (whole-stage
    codegen, zero shuffle, zero UDFs); at 100 TB this is a map-only
    pass that scans once and writes codes + one float scale per vector.
    Reported per vector: the scale, max abs reconstruction error, and
    MSE — the quantization-quality gate a pipeline would alert on.
    """
    e = read_table(spark, sf_dir, "embeddings")
    ad = F.col("embedding").cast("array<double>")
    scale = F.array_max(F.transform(ad, lambda x: F.abs(x)))
    # All-zero vectors have scale 0 and no meaningful quantization (the
    # division would produce inf/NaN, where Spark and DuckDB IEEE
    # behavior may diverge); exclude them in BOTH engines.
    t = e.select("vec_id", ad.alias("ed"), scale.alias("scale")).where(
        F.col("scale") > 0
    )
    codes = F.transform(
        F.col("ed"),
        lambda x: F.floor(x * F.lit(127.0) / F.col("scale") + F.lit(0.5)),
    )
    err = F.zip_with(
        F.col("ed"),
        codes,
        lambda a, c: a - c * F.col("scale") / F.lit(127.0),
    )
    errored = t.select("vec_id", "scale", err.alias("err"))
    return errored.select(
        "vec_id",
        F.round("scale", 9).alias("scale"),
        F.round(
            F.array_max(F.transform(F.col("err"), lambda x: F.abs(x))), 9
        ).alias("max_abs_err"),
        F.round(
            F.aggregate(
                F.transform(F.col("err"), lambda x: x * x),
                F.lit(0.0),
                lambda s, v: s + v,
            )
            / F.lit(float(DIM)),
            9,
        ).alias("mse"),
    )


# --------------------------------------------------------------------------
# metadata-filtered ANN (pre-filtered vector search)
# --------------------------------------------------------------------------
FILTERED_N_QUERIES = 10
FILTERED_TOP_K = 3


@query(
    "q_ann_filtered",
    oracle=f"""
    WITH q AS (
        SELECT e.vec_id AS query_id, e.embedding AS qe, d.lang AS qlang
        FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        WHERE e.vec_id < {FILTERED_N_QUERIES}
    ),
    cand AS (
        SELECT q.query_id, q.qlang, e.vec_id AS neighbor_id,
               {sql_cosine('q.qe', 'e.embedding')} AS c
        FROM q
        JOIN documents d ON d.lang = q.qlang
        JOIN embeddings e ON e.vec_id = d.doc_id
        WHERE e.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, qlang AS lang, neighbor_id, c,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY c DESC, neighbor_id) AS rank
        FROM cand
    )
    SELECT query_id, lang, neighbor_id, CAST(rank AS INT) AS rank,
           round(c, 6) AS cos_sim
    FROM ranked WHERE rank <= {FILTERED_TOP_K}
    """,
)
def q_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered top-k vector search: neighbors must share the
    query document's language — the pre-filtering strategy every
    production vector store ships (search WHERE lang = X).

    The filter is an EQUI-join on the filter attribute, not a
    post-filter over an unfiltered top-k (post-filtering under-fills k
    when the predicate is selective, the classic filtered-ANN bug).
    Shape: queries broadcast with their metadata; candidates come from
    joining the corpus on lang, so each query scores only its stratum —
    at scale this composes with the IVF path by bucketing lists per
    filter value (partition pruning does the stratum selection when
    the corpus is partitioned by the filter column)."""
    e = read_table(spark, sf_dir, "embeddings")
    d = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    q = (
        e.where(F.col("vec_id") < FILTERED_N_QUERIES)
        .join(d, F.col("doc_id") == F.col("vec_id"))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("lang").alias("qlang"),
        )
    )
    corpus = e.join(d, F.col("doc_id") == F.col("vec_id")).select(
        "vec_id", "embedding", "lang"
    )
    cand = (
        F.broadcast(q)
        .join(corpus, F.col("lang") == F.col("qlang"))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("qlang").alias("lang"),
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qe"), F.col("embedding")).alias("c"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("c").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= FILTERED_TOP_K)
        .select(
            "query_id",
            "lang",
            "neighbor_id",
            "rank",
            F.round("c", 6).alias("cos_sim"),
        )
    )


# --------------------------------------------------------------------------
# product quantization (round 5): M subspaces x K codes, trained, no UDF
# --------------------------------------------------------------------------

PQ_M = 8  #: subspaces (DIM/PQ_SUBDIM)
PQ_SUBDIM = 8
PQ_K = 16  #: codes per subspace -> 8 x 4 bits = 4 bytes/vector


def l2sq(a, b) -> F.Column:
    """Squared L2 distance as the fixed sequential fold — the same
    bit-identical-to-DuckDB evaluation shape as :func:`cosine`."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, v: s + v,
    )


def _sql_l2sq(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}),"
        f" p -> (p[1]-p[2])*(p[1]-p[2])), 'sum')"
    )


_SQL_PQ_DIST_ICB = _sql_l2sq("sub.v", "icb.c")
_SQL_PQ_DIST_TCB = _sql_l2sq("sub.v", "tcb.c")


def _pq_subvectors(e: DataFrame) -> DataFrame:
    """(vec_id, s, v): row-local 8-dim slices, one row per subspace."""
    ad = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("s"),
        ad.alias("full"),
    ).select(
        "vec_id",
        "s",
        F.slice(F.col("full"), F.col("s") * PQ_SUBDIM + 1, PQ_SUBDIM).alias("v"),
    )


def _pq_assign(sub: DataFrame, codebook: DataFrame) -> DataFrame:
    """Nearest code per (vector, subspace): broadcast the M x K
    codebook, argmin via partial-aggregating MIN(struct(dist, code))
    so the K-way fan-out collapses map-side."""
    scored = sub.join(F.broadcast(codebook), "s").select(
        "vec_id", "s", "code", l2sq(F.col("v"), F.col("c")).alias("dist")
    )
    return (
        scored.groupBy("vec_id", "s")
        .agg(F.min(F.struct("dist", "code")).alias("best"))
        .select(
            "vec_id",
            "s",
            F.col("best.code").alias("code"),
            F.col("best.dist").alias("dist"),
        )
    )


#: per-dataset trained PQ codebook rows — M x K = 128 rows of 8
#: doubles, a broadcast-sized object; caching it across the three PQ
#: queries (quantize / ADC / rerank) removes two redundant Lloyd
#: passes per bench round. float64 round-trips exactly through the
#: driver, so the recreated frame is bit-identical to the trained one.
#: Keys carry the source parquet's mtime (see ``_pq_cache_key``), so a
#: dataset regenerated in place within one driver process retrains
#: instead of silently reusing a stale codebook. Bounded: storing a new
#: mtime for a path evicts that path's older entries (``_pq_cache_put``),
#: so the cache holds at most one codebook per distinct dataset path for
#: the driver's lifetime.
_PQ_TCB_CACHE: dict[tuple, list[tuple]] = {}


def _pq_cache_put(key: tuple, rows: list[tuple]) -> None:
    path = key[0]
    for stale in [k for k in _PQ_TCB_CACHE if k[0] == path and k != key]:
        del _PQ_TCB_CACHE[stale]
    _PQ_TCB_CACHE[key] = rows


def _pq_cache_key(sf_dir: str) -> tuple:
    path = os.path.join(os.path.realpath(sf_dir), "embeddings.parquet")
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = -1
    return (path, mtime)


def _pq_trained_codebook(sub: DataFrame, cache_key: tuple | None = None) -> DataFrame:
    """(s, code, c): one exact-decimal Lloyd iteration from the
    deterministic first-K init, per subspace. With ``cache_key`` the
    trained rows are collected once (bounded: M x K) and reused."""
    if cache_key is not None and cache_key in _PQ_TCB_CACHE:
        spark = sub.sparkSession
        return spark.createDataFrame(
            _PQ_TCB_CACHE[cache_key], "s int, code long, c array<double>"
        )
    icb = sub.where(F.col("vec_id") < PQ_K).select(
        "s", F.col("vec_id").alias("code"), F.col("v").alias("c")
    )
    # round 18: the argmin carries v alongside (v is constant across a
    # (vec_id, s) group — F.first picks the one value), so the means
    # aggregate below reads it directly instead of joining a1 back to
    # sub on (vec_id, s) — the same join-back removal as the coarse
    # IVF trainer (guide §2.4): one exchange of (s, code, v) partials
    # replaces a full re-shuffle of the subvector frame.
    scored = sub.join(F.broadcast(icb), "s").select(
        "vec_id", "s", "code", "v", l2sq(F.col("v"), F.col("c")).alias("dist")
    )
    a1v = (
        scored.groupBy("vec_id", "s")
        .agg(
            F.min(F.struct("dist", "code")).alias("best"),
            F.first("v").alias("v"),
        )
        .select("s", F.col("best.code").alias("code"), "v")
    )
    dims = [
        (
            F.sum(F.col("v")[d].cast(KM_DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias(f"d{d}")
        for d in range(PQ_SUBDIM)
    ]
    tcb = (
        a1v.groupBy("s", "code")
        .agg(*dims)
        .select(
            "s",
            "code",
            F.array(*[F.col(f"d{d}") for d in range(PQ_SUBDIM)]).alias("c"),
        )
    )
    if cache_key is not None:
        rows = [
            (int(r["s"]), int(r["code"]), [float(x) for x in r["c"]])
            for r in tcb.collect()
        ]
        _pq_cache_put(cache_key, rows)
        spark = sub.sparkSession
        return spark.createDataFrame(
            rows, "s int, code long, c array<double>"
        )
    return tcb


@query(
    "q_pq_quantize",
    oracle=f"""
    WITH sub AS (
        SELECT vec_id, s,
               list_slice(embedding::DOUBLE[], s*{PQ_SUBDIM} + 1,
                          s*{PQ_SUBDIM} + {PQ_SUBDIM}) AS v
        FROM embeddings, range(0, {PQ_M}) t(s)
    ),
    icb AS (SELECT s, vec_id AS code, v AS c FROM sub WHERE vec_id < {PQ_K}),
    a1 AS (
        SELECT vec_id, s, code FROM (
            SELECT sub.vec_id, sub.s, icb.code,
                   ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
                       ORDER BY {_SQL_PQ_DIST_ICB} ASC, icb.code) AS r
            FROM sub JOIN icb ON icb.s = sub.s
        ) WHERE r = 1
    ),
    upd AS (
        SELECT a1.s, a1.code, d,
               CAST(SUM(CAST(sub.v[d] AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*) AS cv
        FROM a1 JOIN sub ON sub.vec_id = a1.vec_id AND sub.s = a1.s,
             range(1, {PQ_SUBDIM + 1}) t(d)
        GROUP BY a1.s, a1.code, d
    ),
    tcb AS (SELECT s, code, list(cv ORDER BY d) AS c FROM upd GROUP BY s, code),
    enc AS (
        SELECT vec_id, s, code, dist FROM (
            SELECT sub.vec_id, sub.s, tcb.code,
                   {_SQL_PQ_DIST_TCB} AS dist,
                   ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
                       ORDER BY {_SQL_PQ_DIST_TCB} ASC, tcb.code) AS r
            FROM sub JOIN tcb ON tcb.s = sub.s
        ) WHERE r = 1
    )
    SELECT vec_id,
           array_to_string(list(code ORDER BY s), ',') AS codes,
           round(list_aggregate(list(dist ORDER BY s), 'sum')
                 / {DIM}.0, 6) AS mse
    FROM enc GROUP BY vec_id
    """,
)
def q_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization — the billion-scale ANN compression step
    (4 bits x 8 subspaces = 4 bytes/vector vs 256 for float64): split
    each embedding into {PQ_M} contiguous 8-dim subvectors, train a
    {PQ_K}-entry codebook per subspace with ONE exact-decimal Lloyd
    iteration from the deterministic first-K init, encode every
    subvector as its nearest code, and report the per-vector code
    string + reconstruction MSE.

    Fully declarative — no UDF, no collect: subvectors are row-local
    slices over an exploded subspace index; distances are the fixed
    sequential HOF fold (bit-identical to the oracle's list fold);
    argmin is the partial-aggregating MIN(struct(dist, code)) (the
    q_kmeans pattern — the K-way fan-out collapses map-side); trained
    means are decimal(38,6) sums in one hash aggregate. The DuckDB
    oracle replays train + encode end to end, so every codebook double
    and every assignment must match bit-for-bit.

    Scale: codebooks are M x K rows (128 here) — broadcast both ways;
    two scans of the corpus (train assign, encode assign), each a
    map-side-combining aggregate; the shuffles carry one row per
    (vector, subspace) argmin and M x K x 8 decimal sums. At 100 TB
    this is the same shape FAISS's PQ trainer distributes.
    """
    sub = _pq_subvectors(read_table(spark, sf_dir, "embeddings"))
    tcb = _pq_trained_codebook(sub, cache_key=_pq_cache_key(sf_dir))
    enc = _pq_assign(sub, tcb)
    lst = F.sort_array(F.collect_list(F.struct("s", "code", "dist")))
    return (
        enc.groupBy("vec_id")
        .agg(
            F.array_join(
                F.transform(lst, lambda x: x["code"].cast("string")), ","
            ).alias("codes"),
            F.round(
                F.aggregate(
                    F.transform(lst, lambda x: x["dist"]),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                / F.lit(float(DIM)),
                6,
            ).alias("mse"),
        )
    )


# --------------------------------------------------------------------------
# ADC search over PQ codes (round 5): the other half of product quantization
# --------------------------------------------------------------------------

PQ_NQ = 10  #: query vectors (first vec_ids, like q_ann_topk)
PQ_TOPK = 5
ADC_PREREDUCE_BUCKETS = 32  #: partial top-k fan-out per query

_SQL_PQ_LUT_DIST = _sql_l2sq("q.v", "tcb.c")

#: shared oracle CTE chain: PQ train (one exact-decimal Lloyd step from
#: the deterministic first-K init) -> corpus encode -> per-query LUT.
#: Used verbatim by q_ann_pq, q_ann_pq_rerank, q_ann_ivfpq and
#: q_ann_pq_filtered so the replayed codebooks cannot drift apart.
_SQL_PQ_TRAIN_ENC_LUT = f"""
    sub AS (
        SELECT vec_id, s,
               list_slice(embedding::DOUBLE[], s*{{subdim}} + 1,
                          s*{{subdim}} + {{subdim}}) AS v
        FROM embeddings, range(0, {PQ_M}) t(s)
    ),
    icb AS (SELECT s, vec_id AS code, v AS c FROM sub WHERE vec_id < {PQ_K}),
    a1 AS (
        SELECT vec_id, s, code FROM (
            SELECT sub.vec_id, sub.s, icb.code,
                   ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
                       ORDER BY {_SQL_PQ_DIST_ICB} ASC, icb.code) AS r
            FROM sub JOIN icb ON icb.s = sub.s
        ) WHERE r = 1
    ),
    upd AS (
        SELECT a1.s, a1.code, d,
               CAST(SUM(CAST(sub.v[d] AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*) AS cv
        FROM a1 JOIN sub ON sub.vec_id = a1.vec_id AND sub.s = a1.s,
             range(1, {{subdim_p1}}) t(d)
        GROUP BY a1.s, a1.code, d
    ),
    tcb AS (SELECT s, code, list(cv ORDER BY d) AS c FROM upd GROUP BY s, code),
    enc AS (
        SELECT vec_id, s, code FROM (
            SELECT sub.vec_id, sub.s, tcb.code,
                   ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
                       ORDER BY {_SQL_PQ_DIST_TCB} ASC, tcb.code) AS r
            FROM sub JOIN tcb ON tcb.s = sub.s
        ) WHERE r = 1
    ),
    lut AS (
        SELECT q.vec_id AS query_id, tcb.s, tcb.code,
               {_SQL_PQ_LUT_DIST} AS d
        FROM sub q JOIN tcb ON tcb.s = q.s
        WHERE q.vec_id < {PQ_NQ}
    )""".format(subdim=PQ_SUBDIM, subdim_p1=PQ_SUBDIM + 1)


def _pq_lut(sub: DataFrame, tcb: DataFrame) -> DataFrame:
    """(query_id, s, code, d): per-query lookup table of exact subspace
    distances — Q x M x K rows (1280 for 10 queries), broadcast-sized
    at any corpus scale."""
    q = sub.where(F.col("vec_id") < PQ_NQ).select(
        F.col("vec_id").alias("query_id"), "s", F.col("v").alias("qv")
    )
    return q.join(F.broadcast(tcb), "s").select(
        "query_id", "s", "code", l2sq(F.col("qv"), F.col("c")).alias("d")
    )


def _adc_fold_and_rank(
    pairs: DataFrame, pool: int, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Fold the s-ordered per-subspace LUT distances into one adist per
    (query, neighbor) and rank per query by (adist, neighbor_id) —
    WITHOUT funnelling the whole scored set into one task per query.

    The naive per-query ``row_number`` window makes each query's
    partition a single-task O(N log N) sort — fine at sf0.1, a
    scale-killer at 10^9 vectors. Instead: a deterministic,
    result-invisible bucket (``pmod(neighbor_id, B)``) spreads every
    query over B tasks for a per-(query, bucket) partial top-``pool``,
    and only the surviving B x pool rows meet the final per-query
    window. Every global top-``pool`` row survives its bucket cut (the
    per-bucket ordering is the global ordering restricted to the
    bucket), so ranks 1..pool are identical to the naive window's —
    which is exactly what the DuckDB oracle checks. Callers must not
    read ranks beyond ``pool``."""
    slist = F.sort_array(F.collect_list(F.struct("s", "d")))
    # ``carry``: per-query constant columns (e.g. the query's metadata
    # stratum) ride the grouped keys so callers don't need a re-join
    approx = pairs.groupBy(
        "query_id", F.col("vec_id").alias("neighbor_id"), *carry
    ).agg(
        F.aggregate(
            F.transform(slist, lambda x: x["d"]),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("adist")
    )
    order = (F.col("adist").asc(), F.col("neighbor_id"))
    wb = Window.partitionBy(
        "query_id", F.pmod(F.col("neighbor_id"), F.lit(ADC_PREREDUCE_BUCKETS))
    ).orderBy(*order)
    survivors = (
        approx.withColumn("pr", F.row_number().over(wb))
        .where(F.col("pr") <= pool)
        .drop("pr")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return survivors.withColumn("rank", F.row_number().over(w))


def _pq_adc_ranked(sub: DataFrame, tcb: DataFrame, pool: int) -> DataFrame:
    """Shared exhaustive-ADC stage for q_ann_pq and q_ann_pq_rerank:
    encode the corpus against the trained codebook, join corpus codes
    to the per-query LUT on (s, code), fold + rank via the bucketed
    partial top-k (``_adc_fold_and_rank``). ``pool`` is the deepest
    rank the caller will read. For the IVF-pruned variant that only
    scores probed lists, see ``q_ann_ivfpq``."""
    enc = _pq_assign(sub, tcb).select("vec_id", "s", "code")
    lut = _pq_lut(sub, tcb)
    pairs = enc.join(F.broadcast(lut), ["s", "code"]).where(
        F.col("vec_id") != F.col("query_id")
    )
    return _adc_fold_and_rank(pairs, pool)




@query(
    "q_ann_pq",
    oracle=f"""
    WITH {_SQL_PQ_TRAIN_ENC_LUT},
    approx AS (
        SELECT l.query_id, e.vec_id AS neighbor_id,
               list_aggregate(list(l.d ORDER BY l.s), 'sum') AS adist
        FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.code
        WHERE e.vec_id <> l.query_id
        GROUP BY l.query_id, e.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           round(adist, 6) AS approx_dist
    FROM (
        SELECT query_id, neighbor_id, adist,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY adist ASC, neighbor_id) AS rank
        FROM approx
    ) WHERE rank <= {PQ_TOPK}
    """,
)
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exhaustive-ADC baseline: asymmetric distance computation over PQ
    codes with NO list pruning — every corpus code row meets the LUT,
    so this is the PQ family's recall reference, the role
    ``q_ann_topk`` plays for the uncompressed path. The production
    scale shape — ADC restricted to nprobe probed IVF lists — is
    ``q_ann_ivfpq``.

    Shape: train + encode as in ``q_pq_quantize`` (shared helpers);
    per query a LUT of {PQ_M} x {PQ_K} exact subspace distances (one
    broadcast join against the codebook — 1280 rows for 10 queries);
    the corpus joins the LUT on (s, code) — an equi-join whose fan-out
    is Q rows per (vector, subspace) — and the per-pair distance is the
    s-ordered sequential fold (bit-identical to the oracle's list
    fold, so ranking ties cannot diverge). Top-k per query by
    (adist, neighbor_id) via the bucketed partial top-k
    (``_adc_fold_and_rank``) — the scored set is pre-reduced per
    (query, bucket) so no single task ever sorts a whole query's
    candidates.

    Scale: the fact-side cost is |corpus| x M x Q LUT-joined rows with
    map-side combining into one row per (query, vector) — deliberately
    exhaustive; switch to ``q_ann_ivfpq`` when the corpus outgrows a
    full scan per query batch.
    """
    sub = _pq_subvectors(read_table(spark, sf_dir, "embeddings"))
    tcb = _pq_trained_codebook(sub, cache_key=_pq_cache_key(sf_dir))
    return (
        _pq_adc_ranked(sub, tcb, pool=PQ_TOPK)
        .where(F.col("rank") <= PQ_TOPK)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("adist", 6).alias("approx_dist"),
        )
    )


# --------------------------------------------------------------------------
# ADC + exact re-rank (round 5): the production PQ retrieval shape
# --------------------------------------------------------------------------

PQ_RERANK_POOL = 20  #: ADC shortlist size fed to the exact re-rank


@query(
    "q_ann_pq_rerank",
    oracle=f"""
    WITH {_SQL_PQ_TRAIN_ENC_LUT},
    approx AS (
        SELECT l.query_id, e.vec_id AS neighbor_id,
               list_aggregate(list(l.d ORDER BY l.s), 'sum') AS adist
        FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.code
        WHERE e.vec_id <> l.query_id
        GROUP BY l.query_id, e.vec_id
    ),
    shortlist AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY adist ASC, neighbor_id) AS rank
            FROM approx
        ) WHERE rank <= {PQ_RERANK_POOL}
    ),
    exact AS (
        SELECT sl.query_id, sl.neighbor_id,
               {sql_cosine('q.embedding', 'n.embedding')} AS cs
        FROM shortlist sl
        JOIN embeddings q ON q.vec_id = sl.query_id
        JOIN embeddings n ON n.vec_id = sl.neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           round(cs, 6) AS cos_sim
    FROM (
        SELECT query_id, neighbor_id, cs,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cs DESC, neighbor_id) AS rank
        FROM exact
    ) WHERE rank <= {PQ_TOPK}
    """,
)
def q_ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production PQ retrieval shape (FAISS ``IndexRefine``): ADC
    over the 4-byte codes shortlists {PQ_RERANK_POOL} candidates per
    query, then ONLY the shortlist's full vectors are fetched for an
    exact-cosine re-rank of the final top-{PQ_TOPK}. Quantization
    error decides what enters the pool; exact math decides the order —
    the ranking the user sees never depends on reconstruction error.

    Scale: the expensive exact pass touches Q x {PQ_RERANK_POOL} rows
    total regardless of corpus size; the full-vector fetch is an
    equi-join of the (tiny) shortlist against the embeddings table —
    at 100 TB that join broadcasts the shortlist, reading full vectors
    for 0.000…% of the corpus.
    """
    e = read_table(spark, sf_dir, "embeddings")
    sub = _pq_subvectors(e)
    tcb = _pq_trained_codebook(sub, cache_key=_pq_cache_key(sf_dir))
    shortlist = (
        _pq_adc_ranked(sub, tcb, pool=PQ_RERANK_POOL)
        .where(F.col("rank") <= PQ_RERANK_POOL)
        .select("query_id", "neighbor_id")
    )
    exact = (
        F.broadcast(shortlist)
        .join(
            e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")),
            "query_id",
        )
        .join(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ne"),
            ),
            "neighbor_id",
        )
        .select("query_id", "neighbor_id", cosine(F.col("qe"), F.col("ne")).alias("cs"))
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("cs").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(we))
        .where(F.col("rank") <= PQ_TOPK)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("cs", 6).alias("cos_sim"),
        )
    )


# --------------------------------------------------------------------------
# IVFPQ (round 6): IVF coarse pruning composed with ADC — the index shape
# billion-scale retrieval actually runs (FAISS IndexIVFPQ)
# --------------------------------------------------------------------------

IVFPQ_CENTROIDS = 16  #: coarse codebook size (deterministic first-K init)
IVFPQ_NPROBE = 2  #: probed lists per query; raising to 4 was MEASURED (r6)
#: to cost 2x wall-clock for +0.000 recall@5 at sf0.01 - the recall
#: limiter is the 4-bit PQ code resolution (by design at fixture
#: scale), which the ADC+exact-rerank path (q_ann_pq_rerank) recovers

_SQL_IVFPQ_COARSE = _sql_l2sq("e.embedding::DOUBLE[]", "c.ce")

#: oracle CTE chain for the coarse quantizer: full-vector squared-L2
#: assignment of every corpus vector to its home list, plus each
#: query's nprobe nearest lists. Shared by q_ann_ivfpq's oracle.
_SQL_IVFPQ_LISTS = f"""
    cents AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
        FROM embeddings WHERE vec_id < {IVFPQ_CENTROIDS}
    ),
    coarse AS (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {_SQL_IVFPQ_COARSE} ASC, c.cid) AS r
        FROM embeddings e CROSS JOIN cents c
    ),
    lists AS (SELECT vec_id, cid FROM coarse WHERE r = 1),
    probes AS (
        SELECT vec_id AS query_id, cid FROM coarse
        WHERE r <= {IVFPQ_NPROBE} AND vec_id < {PQ_NQ}
    ),
    cand AS (
        SELECT p.query_id, l.vec_id AS neighbor_id
        FROM probes p JOIN lists l ON l.cid = p.cid
        WHERE l.vec_id <> p.query_id
    )"""


def _ivfpq_candidates(e: DataFrame) -> DataFrame:
    """(query_id, neighbor_id): the IVF-pruned candidate pairs — each
    query meets ONLY the members of its ``IVFPQ_NPROBE`` nearest
    inverted lists, never the whole corpus (the pruning the plan test
    pins by counting).

    Coarse assignment is map-only: broadcast the K full-vector
    centroids, per-vector argmin via the partial-aggregating
    MIN(struct(dist, cid)) — no window over the corpus, the K-way
    fan-out collapses map-side. The probe side windows only the Q query
    rows. The candidate join is equi on cluster id, bounded by list
    sizes (~N/K per list)."""
    ad = F.col("embedding").cast("array<double>")
    cents = e.where(F.col("vec_id") < IVFPQ_CENTROIDS).select(
        F.col("vec_id").alias("cid"), ad.alias("ce")
    )
    scored = e.select("vec_id", ad.alias("ev")).join(F.broadcast(cents)).select(
        "vec_id", "cid", l2sq(F.col("ev"), F.col("ce")).alias("cdist")
    )
    lists = (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("cdist", "cid")).alias("best"))
        .select("vec_id", F.col("best.cid").alias("cid"))
    )
    wq = Window.partitionBy("vec_id").orderBy(F.col("cdist").asc(), F.col("cid"))
    probes = (
        scored.where(F.col("vec_id") < PQ_NQ)
        .withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= IVFPQ_NPROBE)
        .select(F.col("vec_id").alias("query_id"), "cid")
    )
    return (
        probes.join(lists, "cid")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )


@query(
    "q_ann_ivfpq",
    oracle=f"""
    WITH {_SQL_PQ_TRAIN_ENC_LUT},
    {_SQL_IVFPQ_LISTS},
    adc AS (
        SELECT c.query_id, c.neighbor_id,
               list_aggregate(list(l.d ORDER BY l.s), 'sum') AS adist
        FROM cand c
        JOIN enc e ON e.vec_id = c.neighbor_id
        JOIN lut l ON l.query_id = c.query_id AND l.s = e.s
                  AND l.code = e.code
        GROUP BY c.query_id, c.neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           round(adist, 6) AS approx_dist
    FROM (
        SELECT query_id, neighbor_id, adist,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY adist ASC, neighbor_id) AS rank
        FROM adc
    ) WHERE rank <= {PQ_TOPK}
    """,
)
def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ — the composed index that makes PQ usable at 100 TB
    (FAISS ``IndexIVFPQ``): a {IVFPQ_CENTROIDS}-centroid coarse
    quantizer (full-vector squared-L2, deterministic first-K init)
    partitions the corpus into inverted lists; each query ADC-scores
    ONLY its {IVFPQ_NPROBE} probed lists' members against the per-query
    LUT, unlike ``q_ann_pq``'s exhaustive-ADC baseline which scores the
    whole corpus. PQ codes are trained on raw vectors and shared with
    ``q_pq_quantize`` via the codebook cache (a deliberate divergence
    from FAISS's residual encoding — residuals would need a
    per-(list, subspace) codebook the oracle would have to replay K
    times; raw-vector codes keep the codebook global and the replay
    exact, and the pruning shape — the part that matters at scale — is
    identical).

    Ranking uses the bucketed partial top-k (``_adc_fold_and_rank``):
    candidates spread over {ADC_PREREDUCE_BUCKETS} buckets per query,
    per-bucket top-{PQ_TOPK}, final window over the bounded survivor
    set — no single-task whole-candidate-set sort.

    Scale: coarse assignment is map-only broadcast argmin; the
    candidate join is equi on cluster id (~N/K rows per list); ADC
    touches |cand| x M LUT rows instead of |corpus| x M x Q — at
    nprobe/K = 1/8 that is an 8x reduction at Q=1 and the ratio the
    operator sustains at any N. The DuckDB oracle replays
    train + assign + probe + ADC + rank end to end."""
    e = read_table(spark, sf_dir, "embeddings")
    sub = _pq_subvectors(e)
    tcb = _pq_trained_codebook(sub, cache_key=_pq_cache_key(sf_dir))
    enc = _pq_assign(sub, tcb).select("vec_id", "s", "code")
    cand = _ivfpq_candidates(e)
    lut = _pq_lut(sub, tcb)
    pairs = (
        enc.join(cand.withColumnRenamed("neighbor_id", "vec_id"), "vec_id")
        .join(F.broadcast(lut), ["query_id", "s", "code"])
    )
    return (
        _adc_fold_and_rank(pairs, pool=PQ_TOPK)
        .where(F.col("rank") <= PQ_TOPK)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("adist", 6).alias("approx_dist"),
        )
    )


# --------------------------------------------------------------------------
# metadata-filtered ADC (round 6): q_ann_filtered's pre-filter composed
# with the PQ path — the filter lands on the codes scan, not post-rank
# --------------------------------------------------------------------------


def _pq_filtered_pairs(
    enc: DataFrame, lut: DataFrame, meta: DataFrame, qmeta: DataFrame
) -> DataFrame:
    """Pre-aggregation ADC pairs restricted to the query's metadata
    stratum: the codes side is joined to its metadata and the lang
    equality is part of the (broadcast) LUT-join condition itself, so
    a code row outside every query's stratum never produces a scored
    row — PRE-filtering, not a post-filter over an unfiltered top-k
    (which under-fills k when the predicate is selective, the classic
    filtered-ANN bug; same discipline as ``q_ann_filtered``).
    Exposed separately so the plan test can pin that the composition
    filters before the fold, by construction and by count."""
    enc_meta = enc.join(meta, "vec_id")
    lutq = lut.join(qmeta, "query_id").select(
        F.col("query_id").alias("q_id"),
        F.col("s").alias("q_s"),
        F.col("code").alias("q_code"),
        "d",
        "qlang",
    )
    return (
        enc_meta.join(
            F.broadcast(lutq),
            (F.col("s") == F.col("q_s"))
            & (F.col("code") == F.col("q_code"))
            & (F.col("lang") == F.col("qlang")),
        )
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "s", "d", "qlang")
        .withColumnRenamed("q_id", "query_id")
    )


@query(
    "q_ann_pq_filtered",
    oracle=f"""
    WITH {_SQL_PQ_TRAIN_ENC_LUT},
    qmeta AS (
        SELECT e.vec_id AS query_id, d.lang AS qlang
        FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        WHERE e.vec_id < {PQ_NQ}
    ),
    elang AS (
        SELECT e.vec_id, e.s, e.code, d.lang
        FROM enc e JOIN documents d ON d.doc_id = e.vec_id
    ),
    adc AS (
        SELECT q.query_id, q.qlang AS lang, e.vec_id AS neighbor_id,
               list_aggregate(list(l.d ORDER BY l.s), 'sum') AS adist
        FROM elang e
        JOIN qmeta q ON q.qlang = e.lang
        JOIN lut l ON l.query_id = q.query_id AND l.s = e.s
                  AND l.code = e.code
        WHERE e.vec_id <> q.query_id
        GROUP BY q.query_id, q.qlang, e.vec_id
    )
    SELECT query_id, lang, neighbor_id, CAST(rank AS INT) AS rank,
           round(adist, 6) AS approx_dist
    FROM (
        SELECT query_id, lang, neighbor_id, adist,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY adist ASC, neighbor_id) AS rank
        FROM adc
    ) WHERE rank <= {PQ_TOPK}
    """,
)
def q_ann_pq_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered ADC search: neighbors must share the query
    document's language, composed with the PQ code path — the
    production "search WHERE lang = X" over a compressed index. The
    filter is an equi-condition inside the codes-side LUT join
    (``_pq_filtered_pairs``), so out-of-stratum code rows are dropped
    BEFORE any distance is folded; ranking then uses the bucketed
    partial top-k like every other ADC consumer.

    Scale: identical to ``q_ann_pq`` minus the filtered-out strata —
    the codes scan carries its metadata column through one corpus-keyed
    join (at 100 TB the codes table would simply be written with the
    filter column, making that join free), and everything downstream
    shrinks by the filter's selectivity. The DuckDB oracle replays
    train + encode + filter + ADC + rank end to end."""
    e = read_table(spark, sf_dir, "embeddings")
    d = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    sub = _pq_subvectors(e)
    tcb = _pq_trained_codebook(sub, cache_key=_pq_cache_key(sf_dir))
    enc = _pq_assign(sub, tcb).select("vec_id", "s", "code")
    lut = _pq_lut(sub, tcb)
    qmeta = (
        e.where(F.col("vec_id") < PQ_NQ)
        .select("vec_id")
        .join(d, "vec_id")
        .select(F.col("vec_id").alias("query_id"), F.col("lang").alias("qlang"))
    )
    pairs = _pq_filtered_pairs(enc, lut, d, qmeta)
    return (
        _adc_fold_and_rank(pairs, pool=PQ_TOPK, carry=("qlang",))
        .where(F.col("rank") <= PQ_TOPK)
        .select(
            "query_id",
            F.col("qlang").alias("lang"),
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("adist", 6).alias("approx_dist"),
        )
    )


# ---------------------------------------------------------------------------
# hybrid retrieval: BM25 (lexical) + dense cosine, RRF fusion — round 6
# ---------------------------------------------------------------------------
# Production RAG/data-curation retrieval is hybrid: a lexical ranker
# (BM25) and a dense ranker (embedding cosine) each produce a top-L
# list, fused by Reciprocal Rank Fusion (Cormack et al., SIGIR'09):
# rrf(d) = sum over lists of 1/(K + rank_d). RRF needs only ranks, so
# the two engines agree bit-exactly as long as each list's ordering
# does — both lists tie-break on doc_id.

HY_K = 60          # the standard RRF damping constant
HY_LIST = 100      # per-ranker candidate list length
HY_TOP = 20        # fused results returned
HY_QVEC = 0        # the dense query: embedding of vec_id 0
                   # (documents and embeddings share the 0..N-1 id space)


@query(
    "q_hybrid_search",
    oracle=None,  # set below: composes text.SQL_BM25_SCORED lazily
)
def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+dense retrieval with Reciprocal Rank Fusion.

    Lexical list: the shared BM25 pipeline (text.bm25_scored), top-L by
    (score desc, doc_id). Dense list: cosine of every corpus embedding
    against the query vector (vec_id = 0, a one-row broadcast), top-L
    by (cos desc, id). Fusion: 1/(K+lex_rank) + 1/(K+dense_rank), each
    term 0 when the doc is absent from that list; absent ranks surface
    as 0 (real ranks start at 1).

    Scale: both candidate lists are produced with TakeOrdered
    (orderBy().limit(L) — distributed partial top-k, no global sort,
    no unbounded single-partition window); ranking then runs on the
    L-row results, so the only global windows in the plan are over at
    most HY_LIST=100 rows, and the fusion join is 100 x 100. At 100 TB
    nothing beyond the two bounded lists ever crosses the network.
    """
    from dynamodb_streaming_datalake_spark.operators.text import bm25_scored

    # rank on round(score, 6): raw BM25 sums are partition-order
    # floats, so two mathematically-tied docs could get opposite ulps
    # on the two engines and flip ranks; rounding first collapses ulp
    # noise (the q_bm25_search output discipline) so ties break on
    # doc_id identically everywhere
    lex_scored = bm25_scored(spark, sf_dir).select(
        "doc_id", F.round("score", 6).alias("score_r")
    )
    lex_top = lex_scored.orderBy(
        F.col("score_r").desc(), "doc_id"
    ).limit(HY_LIST)
    w_lex = Window.orderBy(F.col("score_r").desc(), "doc_id")
    lex = lex_top.select(
        "doc_id", F.row_number().over(w_lex).alias("lex_rank")
    )

    e = read_table(spark, sf_dir, "embeddings")
    qv = e.where(F.col("vec_id") == HY_QVEC).select(
        F.col("embedding").alias("qe")
    )
    # rank on round(c, 6) for the same reason as the lexical list: a
    # cross-engine libm ulp in the cosine must not flip dense ranks
    # (round-6 advice — the lex side already had this discipline)
    dense_top = (
        fan_out(e, "vec_id").crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("c"),
        )
        .orderBy(F.col("c").desc(), "doc_id")
        .limit(HY_LIST)
    )
    w_dense = Window.orderBy(F.col("c").desc(), "doc_id")
    dense = dense_top.select(
        "doc_id", F.row_number().over(w_dense).alias("dense_rank")
    )

    one = F.lit(1.0)
    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        (
            F.coalesce(one / (F.lit(HY_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(one / (F.lit(HY_K) + F.col("dense_rank")), F.lit(0.0))
        ).alias("rrf_raw"),
    )
    return (
        fused.orderBy(F.col("rrf_raw").desc(), "doc_id")
        .limit(HY_TOP)
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).cast("int").alias("lex_rank"),
            F.coalesce("dense_rank", F.lit(0)).cast("int").alias("dense_rank"),
            F.round("rrf_raw", 6).alias("rrf"),
        )
    )


def _hybrid_oracle() -> str:
    from dynamodb_streaming_datalake_spark.operators.text import SQL_BM25_SCORED

    return f"""
    WITH {SQL_BM25_SCORED},
    lex AS (
        SELECT doc_id, lex_rank FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY round(score, 6) DESC, doc_id)
                     AS lex_rank
            FROM scored
        ) WHERE lex_rank <= {HY_LIST}
    ),
    dense0 AS (
        SELECT e.vec_id AS doc_id,
               {sql_cosine('q.qe', 'e.embedding')} AS c
        FROM embeddings e,
             (SELECT embedding AS qe FROM embeddings
              WHERE vec_id = {HY_QVEC}) q
    ),
    dense AS (
        SELECT doc_id, dense_rank FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY round(c, 6) DESC, doc_id)
                     AS dense_rank
            FROM dense0
        ) WHERE dense_rank <= {HY_LIST}
    ),
    fused AS (
        SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
               lex.lex_rank AS lex_rank, dense.dense_rank AS dense_rank,
               COALESCE(CAST(1.0 AS DOUBLE) / ({HY_K} + lex.lex_rank),
                        CAST(0.0 AS DOUBLE))
               + COALESCE(CAST(1.0 AS DOUBLE) / ({HY_K} + dense.dense_rank),
                          CAST(0.0 AS DOUBLE)) AS rrf_raw
        FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
    )
    SELECT doc_id,
           CAST(COALESCE(lex_rank, 0) AS INT) AS lex_rank,
           CAST(COALESCE(dense_rank, 0) AS INT) AS dense_rank,
           round(rrf_raw, 6) AS rrf
    FROM fused
    ORDER BY rrf_raw DESC, doc_id
    LIMIT {HY_TOP}
    """


# late-bind the oracle (avoids a circular import at module load)
from dynamodb_streaming_datalake_spark.registry import ORACLE as _ORACLE  # noqa: E402

_ORACLE["q_hybrid_search"] = _hybrid_oracle()


_FMT_CONSTS = dict(
    PQ_M=PQ_M,
    PQ_K=PQ_K,
    PQ_TOPK=PQ_TOPK,
    PQ_RERANK_POOL=PQ_RERANK_POOL,
    IVFPQ_CENTROIDS=IVFPQ_CENTROIDS,
    IVFPQ_NPROBE=IVFPQ_NPROBE,
    ADC_PREREDUCE_BUCKETS=ADC_PREREDUCE_BUCKETS,
)

for _q in (q_pq_quantize, q_ann_pq, q_ann_pq_rerank, q_ann_ivfpq):
    _fmt(_q, **_FMT_CONSTS)


# ---------------------------------------------------------------------------
# retrieval evaluation harness — round 7
# ---------------------------------------------------------------------------
# The eval half of an ANN deployment: measure the approximate index
# against exact brute-force ground truth on a query sample, per query
# — recall@k (overlap of top-k sets) and reciprocal rank of the true
# nearest neighbor. Both metrics are exact rationals realized as one
# IEEE division each, so the hash gate applies; pytest already pins
# recall FLOORS for the PQ family, and this query makes the evaluation
# itself a first-class, oracle-checked operator.


@query(
    "q_retrieval_eval",
    oracle=f"""
    WITH {_SQL_IVF},
    bt_scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               {sql_cosine('q.embedding', 'e.embedding')} AS c
        FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < {IVF_QUERIES}
    ),
    bt_ranked AS (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY round(c, 6) DESC, neighbor_id
                                 ) AS t_rank
        FROM bt_scored
    ),
    truth AS (
        SELECT query_id, neighbor_id, t_rank FROM bt_ranked
        WHERE t_rank <= {IVF_TOP_K}
    ),
    sys AS (
        SELECT query_id, neighbor_id, rank FROM ranked
        WHERE rank <= {IVF_TOP_K}
    ),
    overlap AS (
        SELECT t.query_id, COUNT(s.neighbor_id) AS n_overlap
        FROM truth t
        LEFT JOIN sys s
          ON s.query_id = t.query_id AND s.neighbor_id = t.neighbor_id
        GROUP BY t.query_id
    ),
    nn_rank AS (
        SELECT t.query_id, s.rank AS sys_rank
        FROM truth t
        LEFT JOIN sys s
          ON s.query_id = t.query_id AND s.neighbor_id = t.neighbor_id
        WHERE t.t_rank = 1
    )
    SELECT o.query_id,
           CAST(o.n_overlap AS INT) AS n_overlap,
           CAST(o.n_overlap AS DOUBLE) / {IVF_TOP_K} AS recall_at_k,
           COALESCE(1.0 / n.sys_rank, 0.0) AS reciprocal_rank
    FROM overlap o JOIN nn_rank n USING (query_id)
    """,
)
def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation: per-query recall@{IVF_TOP_K} and the
    reciprocal rank of the exact nearest neighbor, measuring the IVF
    index (q_ann_ivf's exact pipeline) against brute-force cosine
    ground truth over its {IVF_QUERIES}-query sample. Both engines
    rank with the identical tie-break (round(cos, 6) desc,
    neighbor_id) — rounding before ranking so a cross-engine libm ulp
    cannot flip a truth rank — so the metric table is hash-exact.

    Scale: ground truth is brute-force by design — the standard eval
    practice of paying exact search on a bounded query SAMPLE while
    the index serves the full corpus; the comparison joins are
    equi-joins on (query, neighbor) over k-bounded lists."""
    e = read_table(spark, sf_dir, "embeddings")

    # round 17: norm sums hoisted to one fold per ROW per side (inside
    # the pair expression the corpus-side fold re-ran once per panel
    # query — |panel|x redundant). Same fold exprs as cosine(), same
    # dot/(sqrt*sqrt) division shape — bit-identical doubles.
    def _sq(col: str):
        return F.aggregate(
            F.transform(
                F.col(col).cast("array<double>"), lambda x: x * x
            ),
            F.lit(0.0),
            lambda s, v: s + v,
        )

    q = e.where(F.col("vec_id") < IVF_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _sq("embedding").alias("qn"),
    )
    # brute-force truth = |panel| x |corpus| cosines: fan the one-split
    # corpus scan out to the session's cores so the fold runs on every
    # core. The kernel stays the JVM expression: an Arrow/pandas kernel
    # was A/B'd at 1x and 10x pair volume and lost both (0.22 vs 0.55 s,
    # 0.6 vs 0.73 s) — shipping both 64-dim arrays across the Python
    # boundary costs more than the interpreted fold saves (guide §4.1).
    dot = F.aggregate(
        F.zip_with(
            F.col("qe").cast("array<double>"),
            F.col("embedding").cast("array<double>"),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    scored = (
        F.broadcast(q)
        .join(
            fan_out(e, "vec_id").select(
                "vec_id", "embedding", _sq("embedding").alias("nn")
            ),
            F.col("vec_id") != F.col("query_id"),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot / (F.sqrt(F.col("qn")) * F.sqrt(F.col("nn")))).alias("c"),
        )
    )
    # rank truth on round(c, 6) — same cross-engine libm-ulp guard as
    # q_hybrid_search's dense list (round-7 ADVICE): an ulp difference
    # between Spark's and DuckDB's cosine must not flip a truth rank.
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("c"), 6).desc(), F.col("neighbor_id")
    )
    truth = (
        scored.withColumn("t_rank", F.row_number().over(w))
        .where(F.col("t_rank") <= IVF_TOP_K)
        .select("query_id", "neighbor_id", "t_rank")
    )
    sys = q_ann_ivf(spark, sf_dir).select("query_id", "neighbor_id", "rank")
    joined = truth.join(
        sys,
        ["query_id", "neighbor_id"],
        "left",
    )
    # ONE per-query aggregate (round 18): overlap and the exact-NN
    # rank both group by query_id, and truth has exactly one
    # t_rank == 1 row per query, so max(when(t_rank==1, rank)) IS that
    # row's sys rank (NULL when the index missed it — coalesce keeps
    # the 0.0 semantics). The r17 shape fed `joined` to two consumers
    # and re-executed the whole brute-force-truth + IVF subtree for
    # each (SortMergeJoin of two copies in the plan — guide §2.4).
    per_q = joined.groupBy("query_id").agg(
        F.count("rank").alias("n_overlap"),
        F.max(F.when(F.col("t_rank") == 1, F.col("rank"))).alias(
            "sys_rank"
        ),
    )
    return per_q.select(
        "query_id",
        F.col("n_overlap").cast("int").alias("n_overlap"),
        (F.col("n_overlap").cast("double") / F.lit(IVF_TOP_K)).alias(
            "recall_at_k"
        ),
        F.coalesce(
            F.lit(1.0) / F.col("sys_rank"), F.lit(0.0)
        ).alias("reciprocal_rank"),
    )


_fmt(q_retrieval_eval, IVF_TOP_K=IVF_TOP_K, IVF_QUERIES=IVF_QUERIES)


# --------------------------------------------------------------------------
# IVF tuning curve (round 9): recall / MRR / candidate volume vs nprobe
# --------------------------------------------------------------------------
# The index-tuning harness a production ANN deployment runs before
# picking nprobe: one row per probed-list count with aggregate
# recall@k, MRR, and the candidate volume actually scored — the
# recall-vs-cost curve. Reuses the exact IVF assignment the serving
# path uses (q_ann_ivf) and the ulp-guarded brute-force truth of
# q_retrieval_eval.

ANN_TUNE_NPROBES = (1, 2, 4)


def _sql_tune_branch(np: int) -> str:
    """Per-nprobe CTE chain: probes -> candidates -> top-k -> one
    aggregate row. Integer sums everywhere; MRR terms are rounded to
    6dp then decimal-summed (float accumulation would be
    association-order-dependent)."""
    return f"""
    probes{np} AS (
        SELECT vec_id AS query_id, cid FROM assign
        WHERE r <= {np} AND vec_id < {IVF_QUERIES}
    ),
    cand{np} AS (
        SELECT DISTINCT p.query_id, l.vec_id AS neighbor_id
        FROM probes{np} p JOIN lists l ON l.cid = p.cid
        WHERE l.vec_id <> p.query_id
    ),
    sys{np} AS (
        SELECT query_id, neighbor_id, rank FROM (
            SELECT c.query_id, c.neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.query_id
                       ORDER BY {sql_cosine('q.embedding', 'n.embedding')}
                                DESC, c.neighbor_id) AS rank
            FROM cand{np} c
            JOIN embeddings q ON q.vec_id = c.query_id
            JOIN embeddings n ON n.vec_id = c.neighbor_id
        ) WHERE rank <= {IVF_TOP_K}
    ),
    row{np} AS (
        SELECT {np} AS nprobe,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM cand{np})
                 AS n_candidates,
               (SELECT round(CAST(SUM(CASE WHEN s.neighbor_id IS NOT NULL
                                           THEN 1 ELSE 0 END) AS DOUBLE)
                             / ({IVF_TOP_K} * {IVF_QUERIES}), 6)
                FROM truth t LEFT JOIN sys{np} s
                  ON s.query_id = t.query_id
                 AND s.neighbor_id = t.neighbor_id) AS mean_recall_at_k,
               (SELECT round(CAST(SUM(CAST(COALESCE(
                           round(1.0 / s.rank, 6), 0.0)
                           AS DECIMAL(38,6))) AS DOUBLE)
                             / {IVF_QUERIES}, 6)
                FROM truth t LEFT JOIN sys{np} s
                  ON s.query_id = t.query_id
                 AND s.neighbor_id = t.neighbor_id
                WHERE t.t_rank = 1) AS mrr
    )"""


@query(
    "q_ann_tuning",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cid, embedding AS ce
        FROM embeddings WHERE vec_id < {IVF_CENTROIDS}
    ),
    assign AS (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {sql_cosine('e.embedding', 'c.ce')}
                                           DESC, c.cid) AS r
        FROM embeddings e CROSS JOIN cents c
    ),
    lists AS (SELECT vec_id, cid FROM assign WHERE r = 1),
    bt_scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               {sql_cosine('q.embedding', 'e.embedding')} AS c
        FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
        WHERE q.vec_id < {IVF_QUERIES}
    ),
    truth AS (
        SELECT query_id, neighbor_id, t_rank FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY round(c, 6) DESC, neighbor_id
                                     ) AS t_rank
            FROM bt_scored
        ) WHERE t_rank <= {IVF_TOP_K}
    ),
    {",".join(_sql_tune_branch(np) for np in ANN_TUNE_NPROBES)}
    SELECT nprobe, n_candidates, mean_recall_at_k, mrr FROM (
        {" UNION ALL ".join(f"SELECT * FROM row{np}" for np in ANN_TUNE_NPROBES)}
    ) ORDER BY nprobe
    """,
)
def q_ann_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF recall-vs-cost tuning curve: for nprobe in
    {ANN_TUNE_NPROBES}, aggregate recall@{IVF_TOP_K} and MRR of the
    probed search against the ulp-guarded brute-force truth, next to
    the candidate volume each setting actually scores. This is the
    harness that justifies a production nprobe choice — recall rises
    with probed lists, candidate volume (the cost) rises with it, and
    the curve makes the trade explicit as data.

    Numerics: recall is pure integer counting over a fixed query set;
    MRR terms 1/rank are rounded to 6dp then summed as exact decimals
    (a float accumulation would be association-order-dependent).

    Scale: assignment is computed once (broadcast {IVF_CENTROIDS}
    centroids, map-only) and — round 14 — so is the candidate scoring:
    the nprobe levels are nested, so pairs are generated and
    cosine-scored once at the widest level, tagged with the probe rank
    that found them, and a bounded explode fans each pair to its
    levels (one window, one aggregate for the whole curve — the
    oracle still runs the per-level branches, proving the shared pass
    result-invisible). The truth cross is bounded by the
    {IVF_QUERIES}-query panel exactly as in q_retrieval_eval."""
    e = read_table(spark, sf_dir, "embeddings")
    cents = e.where(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("ac").desc(), F.col("cid")
    )
    ranked_assign = (
        fan_out(e, "vec_id").join(F.broadcast(cents))
        .select(
            "vec_id", "cid", cosine(F.col("embedding"), F.col("ce")).alias("ac")
        )
        .withColumn("r", F.row_number().over(w_assign))
    )
    lists = ranked_assign.where(F.col("r") == 1).select("vec_id", "cid")
    # ulp-guarded truth (round(c,6) before ranking, as q_retrieval_eval)
    qs = e.where(F.col("vec_id") < IVF_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    w_t = Window.partitionBy("query_id").orderBy(
        F.round(F.col("c"), 6).desc(), F.col("neighbor_id")
    )
    truth = (
        qs.crossJoin(
            e.select(F.col("vec_id").alias("neighbor_id"), "embedding")
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qe"), F.col("embedding")).alias("c"),
        )
        .withColumn("t_rank", F.row_number().over(w_t))
        .where(F.col("t_rank") <= IVF_TOP_K)
        .select("query_id", "neighbor_id", "t_rank")
    )
    # One shared pass (round 14): the nprobe levels are NESTED
    # (probes at 1 are a subset of 2 of 4), so candidates are generated
    # and cosine-scored ONCE at the widest level, each pair tagged with
    # the probe rank that found it; a bounded explode assigns every
    # pair to the levels that include it, and one window + one
    # aggregate produce the whole curve. Same outputs as the per-level
    # branches the oracle still runs — 1/3 the scoring joins.
    max_np = max(ANN_TUNE_NPROBES)
    probes = ranked_assign.where(
        (F.col("r") <= max_np) & (F.col("vec_id") < IVF_QUERIES)
    ).select(F.col("vec_id").alias("query_id"), "cid", "r")
    # a neighbor lives in exactly one list, so (query, neighbor) pairs
    # are unique by construction and `r` IS the first-probe rank.
    # probes is IVF_QUERIES x max_np rows — a constant — so broadcast
    # it and leave the corpus-sized lists unshuffled (guide §3.1)
    cand = (
        F.broadcast(probes).join(lists, "cid")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            F.col("r").alias("fpr"),
        )
    )
    scored = (
        cand.join(
            e.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qe"),
            ),
            "query_id",
        )
        .join(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ne"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id", "neighbor_id", "fpr",
            cosine(F.col("qe"), F.col("ne")).alias("cs"),
        )
    )
    # two consumers (the per-level top-k window and the candidate-volume
    # aggregate) read `levels`: an explicit shuffle on the window's own
    # key ends the shared subtree at an Exchange, so the scoring pass
    # runs ONCE and the second consumer picks it up as a ReusedExchange
    # (AQE runtime stage reuse — the r17 q_source_overlap precedent);
    # without it the whole cand->scored->explode subtree planned twice
    levels = (
        scored.withColumn(
            "nprobe",
            F.explode(F.array(*[F.lit(np) for np in ANN_TUNE_NPROBES])),
        )
        .where(F.col("fpr") <= F.col("nprobe"))
        .repartition("nprobe", "query_id")
    )
    w_lvl = Window.partitionBy("nprobe", "query_id").orderBy(
        F.col("cs").desc(), F.col("neighbor_id")
    )
    sys_k = (
        levels.withColumn("rank", F.row_number().over(w_lvl))
        .where(F.col("rank") <= IVF_TOP_K)
        .select("nprobe", "query_id", "neighbor_id", "rank")
    )
    n_cand = levels.groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    np_frame = spark.createDataFrame(
        [(np,) for np in ANN_TUNE_NPROBES], "nprobe int"
    )
    truth_x = truth.crossJoin(F.broadcast(np_frame))
    # sys_k is bounded by constants (|nprobes| x IVF_QUERIES x
    # IVF_TOP_K rows) — broadcast it under the 36-row truth panel
    joined = truth_x.join(
        F.broadcast(sys_k), ["nprobe", "query_id", "neighbor_id"], "left"
    )
    metrics = joined.groupBy("nprobe").agg(
        F.round(
            F.sum(F.col("rank").isNotNull().cast("long")).cast("double")
            / F.lit(IVF_TOP_K * IVF_QUERIES),
            6,
        ).alias("mean_recall_at_k"),
        F.round(
            F.sum(
                F.when(
                    F.col("t_rank") == 1,
                    F.coalesce(
                        F.round(F.lit(1.0) / F.col("rank"), 6), F.lit(0.0)
                    ),
                )
                .otherwise(F.lit(0.0))
                .cast("decimal(38,6)")
            ).cast("double")
            / F.lit(IVF_QUERIES),
            6,
        ).alias("mrr"),
    )
    return (
        n_cand.join(metrics, "nprobe")
        .select(
            F.col("nprobe").cast("int").alias("nprobe"),
            "n_candidates",
            "mean_recall_at_k",
            "mrr",
        )
        .orderBy("nprobe")
    )


_fmt(
    q_ann_tuning,
    ANN_TUNE_NPROBES=ANN_TUNE_NPROBES,
    IVF_TOP_K=IVF_TOP_K,
    IVF_QUERIES=IVF_QUERIES,
    IVF_CENTROIDS=IVF_CENTROIDS,
)


# --------------------------------------------------------------------------
# Matryoshka truncation eval (round 9): retrieval quality vs prefix dims
# --------------------------------------------------------------------------
# The production question behind MRL-style embeddings: how much recall
# survives if we store/search only the first d of 64 dimensions (4x-8x
# cheaper index and bandwidth)? One row per prefix length with
# recall@k and MRR against the full-dimension truth — the quality-vs-
# cost curve for dimension truncation, sibling of q_ann_tuning's
# nprobe curve.

MRL_DIMS = (8, 16, 32, 64)
MRL_QUERIES = 50
MRL_TOP_K = 3


def _sql_mrl_branch(d: int) -> str:
    a = f"q.embedding[1:{d}]"
    b = f"e.embedding[1:{d}]"
    return f"""
    sys{d} AS (
        SELECT query_id, neighbor_id, rank FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY round({sql_cosine(a, b)}, 6) DESC,
                                e.vec_id) AS rank
            FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
            WHERE q.vec_id < {MRL_QUERIES}
        ) WHERE rank <= {MRL_TOP_K}
    ),
    row{d} AS (
        SELECT {d} AS dims,
               (SELECT round(CAST(SUM(CASE WHEN s.neighbor_id IS NOT NULL
                                           THEN 1 ELSE 0 END) AS DOUBLE)
                             / ({MRL_TOP_K} * {MRL_QUERIES}), 6)
                FROM mtruth t LEFT JOIN sys{d} s
                  ON s.query_id = t.query_id
                 AND s.neighbor_id = t.neighbor_id) AS mean_recall_at_k,
               (SELECT round(CAST(SUM(CAST(COALESCE(
                           round(1.0 / s.rank, 6), 0.0)
                           AS DECIMAL(38,6))) AS DOUBLE)
                             / {MRL_QUERIES}, 6)
                FROM mtruth t LEFT JOIN sys{d} s
                  ON s.query_id = t.query_id
                 AND s.neighbor_id = t.neighbor_id
                WHERE t.t_rank = 1) AS mrr
    )"""


@query(
    "q_matryoshka_eval",
    oracle=f"""
    WITH mtruth AS (
        SELECT query_id, neighbor_id, t_rank FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY round({sql_cosine("q.embedding", "e.embedding")}, 6)
                                DESC, e.vec_id) AS t_rank
            FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
            WHERE q.vec_id < {MRL_QUERIES}
        ) WHERE t_rank <= {MRL_TOP_K}
    ),
    {",".join(_sql_mrl_branch(d) for d in MRL_DIMS)}
    SELECT dims, mean_recall_at_k, mrr FROM (
        {" UNION ALL ".join(f"SELECT * FROM row{d}" for d in MRL_DIMS)}
    ) ORDER BY dims
    """,
)
def q_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-truncation retrieval eval: for prefix lengths
    {MRL_DIMS} of the 64-dim embeddings, recall@{MRL_TOP_K} and MRR of
    brute-force search on the TRUNCATED vectors against the
    full-dimension truth — the quality-vs-cost curve that justifies
    storing a shorter prefix (a d-dim index is 64/d times cheaper in
    memory and bandwidth). The 64-dim row is the self-check (recall
    1.0 by construction). Rankings on both sides are ulp-guarded
    (round to 6dp before ordering); MRR terms are rounded then
    decimal-summed, recall is integer counting.

    Scale: the {MRL_QUERIES}-query panel crosses the corpus ONCE, all
    prefix cosines computed per pair row in that single pass, and all
    rankings live as COLUMNS of the same frame — the windows share one
    partitionBy(query_id) exchange, the truth/system hit test is a
    same-row comparison (a truth pair is retrieved at prefix d iff its
    own rank_d <= k), and one aggregate emits every prefix's metrics
    (4.0 -> ~3.3 s warm at sf0.1, and 5x fewer corpus crosses than the
    old per-prefix branch shape — the win grows with panel size; the
    oracle's LEFT JOIN formulation is provably the same predicate). At production scale the panel is a sample and the
    per-branch search would run through the IVF path instead of brute
    force, with this harness unchanged as the evaluator."""
    e = read_table(spark, sf_dir, "embeddings")

    # round 17: each side's prefix NORM sums are computed once per ROW
    # before the cross (they depend on one side only — inside the pair
    # expression the corpus-side fold re-ran once per panel query and
    # the query-side once per corpus doc). The folds are the exact
    # expressions cosine() builds (slice -> cast -> x*x fold), carried
    # through the join as columns, and the pair expression divides by
    # sqrt(qn)*sqrt(nn) in cosine()'s shape — bit-identical doubles,
    # ~2/3 of the per-pair multiply-adds removed.
    def _psq(col: str, d: int):
        return F.aggregate(
            F.transform(
                F.slice(F.col(col), 1, d).cast("array<double>"),
                lambda x: x * x,
            ),
            F.lit(0.0),
            lambda s, v: s + v,
        )

    qs = e.where(F.col("vec_id") < MRL_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        *[_psq("embedding", d).alias(f"qn{d}") for d in MRL_DIMS],
    )
    pairs = (
        qs.crossJoin(
            fan_out(e, "vec_id").select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ne"),
                *[_psq("embedding", d).alias(f"nn{d}") for d in MRL_DIMS],
            )
        )
        .where(F.col("neighbor_id") != F.col("query_id"))
    )

    def _dot(d: int):
        return F.aggregate(
            F.zip_with(
                F.slice(F.col("qe"), 1, d).cast("array<double>"),
                F.slice(F.col("ne"), 1, d).cast("array<double>"),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda s, v: s + v,
        )

    # the corpus-side fan-out parallelizes the panel x corpus scoring
    # pass; the per-prefix kernels stay JVM expressions (an Arrow/pandas
    # multi-prefix fold was A/B'd and lost at both 1x and 10x pair
    # volume — array transfer across the Python boundary dominates)
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        *[
            (
                _dot(d)
                / (F.sqrt(F.col(f"qn{d}")) * F.sqrt(F.col(f"nn{d}")))
            ).alias(f"c{d}")
            for d in MRL_DIMS
        ],
    )

    def w(d: int):
        return Window.partitionBy("query_id").orderBy(
            F.round(F.col(f"c{d}"), 6).desc(), F.col("neighbor_id")
        )

    # explicit repartition: the pair frame is small enough that AQE
    # coalesces the window exchange to ONE partition, serializing all
    # prefix sorts onto one task; a user-specified hash repartition is
    # preserved by AQE, so the per-query sorts run in parallel
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    scored = scored.repartition(n_shuffle, "query_id")
    ranked = scored.select(
        "query_id",
        "neighbor_id",
        F.row_number().over(w(64)).alias("t_rank"),
        *[F.row_number().over(w(d)).alias(f"r{d}") for d in MRL_DIMS],
    ).where(F.col("t_rank") <= MRL_TOP_K)
    dec = "decimal(38,6)"
    aggs = []
    for d in MRL_DIMS:
        hit = F.col(f"r{d}") <= MRL_TOP_K
        aggs.append(
            F.round(
                F.sum(hit.cast("long")).cast("double")
                / F.lit(MRL_TOP_K * MRL_QUERIES),
                6,
            ).alias(f"recall{d}")
        )
        # the oracle's LEFT-JOIN MRR over t_rank=1 rows: the term is
        # round(1/rank, 6) when the pair is retrieved at prefix d,
        # else 0 — exact-decimal summed either way
        term = F.coalesce(
            F.when(hit, F.round(F.lit(1.0) / F.col(f"r{d}"), 6)), F.lit(0.0)
        ).cast(dec)
        aggs.append(
            F.round(
                F.sum(
                    F.when(F.col("t_rank") == 1, term)
                    .otherwise(F.lit(0).cast(dec))
                ).cast("double")
                / F.lit(MRL_QUERIES),
                6,
            ).alias(f"mrr{d}")
        )
    one = ranked.agg(*aggs)
    return (
        one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).cast("int").alias("dims"),
                            F.col(f"recall{d}").alias("mean_recall_at_k"),
                            F.col(f"mrr{d}").alias("mrr"),
                        )
                        for d in MRL_DIMS
                    ]
                )
            ).alias("row")
        )
        .select("row.*")
        .orderBy("dims")
    )


_fmt(
    q_matryoshka_eval,
    MRL_DIMS=MRL_DIMS,
    MRL_QUERIES=MRL_QUERIES,
    MRL_TOP_K=MRL_TOP_K,
)


# --------------------------------------------------------------------------
# embedding drift monitor (round 9)
# --------------------------------------------------------------------------
# The production health check between two corpus snapshots: has the
# embedding distribution moved? Compares the per-dimension centroid of
# the even-id half (the "before" snapshot) against the odd-id half
# ("after"): cosine of the two mean vectors, L2 of the shift, and the
# largest per-dimension move. Per-dimension means go through exact
# decimal sums (order-invariant) with one float division; the vector
# metrics are fixed-shape folds over the 64 dims in dimension order —
# deterministic on both engines.


@query(
    "q_embedding_drift",
    oracle=f"""
    WITH vals AS (
        SELECT vec_id % 2 AS half, d.i AS dim,
               embedding[d.i + 1] AS v
        FROM embeddings,
             (SELECT UNNEST(range(0, 64)) AS i) d
    ),
    per_dim AS (
        SELECT dim,
               CAST(SUM(CASE WHEN half = 0
                        THEN CAST(v AS DECIMAL(38,6)) END) AS DOUBLE)
                 / SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS m_old,
               CAST(SUM(CASE WHEN half = 1
                        THEN CAST(v AS DECIMAL(38,6)) END) AS DOUBLE)
                 / SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS m_new
        FROM vals GROUP BY dim
    ),
    vecs AS (
        SELECT list(m_old ORDER BY dim) AS vo,
               list(m_new ORDER BY dim) AS vn,
               list(m_new - m_old ORDER BY dim) AS dv
        FROM per_dim
    ),
    ns AS (
        SELECT CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_old,
               CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new
        FROM embeddings
    )
    SELECT ns.n_old, ns.n_new,
           round({sql_cosine('v.vo', 'v.vn')}, 6) AS cos_means,
           round(sqrt(list_dot_product(v.dv::DOUBLE[], v.dv::DOUBLE[])), 6)
             AS l2_shift,
           round(list_max(list_transform(v.dv, x -> abs(x))), 6)
             AS max_abs_shift
    FROM vecs v, ns
    """,
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift between the even-id and odd-id
    halves of the corpus (the two-snapshot comparison a retrieval
    deployment runs on re-embedding or data refresh): cosine between
    the per-dimension centroids, L2 norm of the centroid shift, and
    the largest single-dimension move. Means are exact decimal sums
    per (half, dimension) — order-invariant — finished with one float
    division; the three metrics are fixed-shape folds over the
    64-dim mean vectors in dimension order.

    Scale: one explode to (row, dim) values with map-side-combined
    decimal partial sums — the shuffle carries 2 x 64 accumulators per
    task, not the data; everything after is a 64-row frame."""
    e = read_table(spark, sf_dir, "embeddings")
    vals = e.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        ),
    )
    per_dim = vals.groupBy("dim").agg(
        (
            F.sum(F.when(F.col("half") == 0, F.col("v").cast("decimal(38,6)")))
            .cast("double")
            / F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        ).alias("m_old"),
        (
            F.sum(F.when(F.col("half") == 1, F.col("v").cast("decimal(38,6)")))
            .cast("double")
            / F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        ).alias("m_new"),
    )
    vecs = per_dim.agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "m_old"))
        ).alias("so"),
        F.array_sort(
            F.collect_list(F.struct("dim", "m_new"))
        ).alias("sn"),
    ).select(
        F.transform("so", lambda s: s["m_old"]).alias("vo"),
        F.transform("sn", lambda s: s["m_new"]).alias("vn"),
        F.zip_with(
            F.transform("sn", lambda s: s["m_new"]),
            F.transform("so", lambda s: s["m_old"]),
            lambda a, b: a - b,
        ).alias("dv"),
    )
    ns = e.agg(
        F.sum((F.col("vec_id") % 2 == 0).cast("long"))
        .cast("bigint")
        .alias("n_old"),
        F.sum((F.col("vec_id") % 2 == 1).cast("long"))
        .cast("bigint")
        .alias("n_new"),
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("dv"), F.col("dv"), lambda a, b: a * b),
            F.lit(0.0),
            lambda s, x: s + x,
        )
    )
    mx = F.array_max(F.transform("dv", lambda x: F.abs(x)))
    return vecs.crossJoin(F.broadcast(ns)).select(
        "n_old",
        "n_new",
        F.round(cosine(F.col("vo"), F.col("vn")), 6).alias("cos_means"),
        F.round(l2, 6).alias("l2_shift"),
        F.round(mx, 6).alias("max_abs_shift"),
    )


# ---------------------------------------------------------------------------
# MMR diverse retrieval (round 10)
# ---------------------------------------------------------------------------
# Pure relevance top-k returns near-duplicates of each other; maximal
# marginal relevance re-ranks a candidate pool by
# score(d) = λ*rel(d) - (1-λ)*max_{s∈selected} sim(d, s), greedily —
# the standard diversity pass between ANN retrieval and a RAG prompt
# (or between nearest-neighbor mining and a training batch). The
# greedy recurrence is bounded (MMR_K rounds over an MMR_CAND-row
# pool per query), so both engines unroll the IDENTICAL selection:
# every comparison happens on 6-dp-rounded scores with the doc-id
# tie-break (the repo's cross-engine ulp guard).

MMR_QUERIES = 3
MMR_CAND = 15
MMR_K = 5
MMR_LAMBDA = 0.7
MMR_MU = round(1 - MMR_LAMBDA, 6)


def _sql_mmr_layer(k: int) -> str:
    """Greedy layer k: max-sim penalty against sel{k-1}, pick the
    rounded-score argmax among unselected candidates."""
    return f"""
    pen{k} AS MATERIALIZED (
        SELECT p.query_id, p.b AS neighbor_id, MAX(p.sim) AS pen
        FROM mmr_pairs p
        JOIN sel{k - 1} s
          ON p.query_id = s.query_id AND p.a = s.neighbor_id
        GROUP BY p.query_id, p.b
    ),
    pick{k} AS MATERIALIZED (
        SELECT query_id, neighbor_id, rel, score, {k} AS rank
        FROM (
            SELECT c.query_id, c.neighbor_id, c.rel,
                   CAST(CAST({MMR_LAMBDA} AS DECIMAL(2,1))
                        * CAST(c.rel AS DECIMAL(18,6))
                        - CAST({MMR_MU} AS DECIMAL(2,1)) * pen.pen
                        AS DECIMAL(38,7)) AS score,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.query_id
                       ORDER BY CAST({MMR_LAMBDA} AS DECIMAL(2,1))
                                * CAST(c.rel AS DECIMAL(18,6))
                                - CAST({MMR_MU} AS DECIMAL(2,1)) * pen.pen
                                  DESC,
                                c.neighbor_id) AS rn
            FROM mmr_cands c
            JOIN pen{k} pen
              ON pen.query_id = c.query_id
             AND pen.neighbor_id = c.neighbor_id
            LEFT JOIN sel{k - 1} s
              ON s.query_id = c.query_id
             AND s.neighbor_id = c.neighbor_id
            WHERE s.neighbor_id IS NULL
        ) WHERE rn = 1
    ),
    sel{k} AS MATERIALIZED (
        SELECT * FROM sel{k - 1} UNION ALL SELECT * FROM pick{k}
    )"""


_SQL_MMR = f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qe
        FROM embeddings WHERE vec_id < {MMR_QUERIES}
    ),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               round({sql_cosine('q.qe', 'e.embedding')}, 6) AS rel,
               e.embedding
        FROM q JOIN embeddings e ON e.vec_id != q.query_id
    ),
    mmr_cands AS MATERIALIZED (
        SELECT query_id, neighbor_id, rel, embedding
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY rel DESC, neighbor_id) AS rn
            FROM scored
        ) WHERE rn <= {MMR_CAND}
    ),
    mmr_pairs AS MATERIALIZED (
        SELECT a.query_id, a.neighbor_id AS a, b.neighbor_id AS b,
               CAST(round({sql_cosine('a.embedding', 'b.embedding')}, 6)
                    AS DECIMAL(18,6)) AS sim
        FROM mmr_cands a
        JOIN mmr_cands b
          ON a.query_id = b.query_id AND a.neighbor_id != b.neighbor_id
    ),
    sel1 AS MATERIALIZED (
        SELECT query_id, neighbor_id, rel,
               CAST(CAST({MMR_LAMBDA} AS DECIMAL(2,1))
                    * CAST(rel AS DECIMAL(18,6)) AS DECIMAL(38,7))
                 AS score, 1 AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY rel DESC, neighbor_id) AS rn
            FROM mmr_cands
        ) WHERE rn = 1
    ),
    {','.join(_sql_mmr_layer(k) for k in range(2, MMR_K + 1))}
    SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
           rel AS relevance, CAST(score AS DOUBLE) AS mmr_score
    FROM sel{MMR_K}
    ORDER BY query_id, rank
"""


@query("q_mmr_diverse", oracle=_SQL_MMR)
def q_mmr_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diverse top-{MMR_K}: for each of
    {MMR_QUERIES} query vectors, take the {MMR_CAND}-candidate cosine
    pool, then greedily select {MMR_K} documents maximizing
    {MMR_LAMBDA}*relevance - {MMR_MU}*max-similarity-to-already-
    selected — relevance-only top-k's diversity fix. Greedy
    comparisons run in EXACT DECIMAL arithmetic over the 6-dp-rounded
    inputs (λ*rel - μ*pen hits exact .5e-7 boundaries where
    double-rounding diverges across engines — measured, not
    hypothetical), with the id tie-break, so the selection sequence
    is engine- and partitioning-exact (the oracle unrolls the
    identical {MMR_K} layers as materialized CTEs).

    Scale: the expensive part is candidate generation (one broadcast
    pass, any ANN query here can feed it); the greedy itself touches
    {MMR_CAND} rows x {MMR_K} rounds per query — per-query constant
    work over a pool whose size is FIXED by the query's constants
    ({MMR_QUERIES}x{MMR_CAND} candidates, {MMR_QUERIES}x{MMR_CAND}^2
    pairs), independent of corpus size. Round 18: the greedy runs on
    the driver over that bounded collect (the kcenter/codebook
    precedent — a constant-row collect is broadcast-dim-sized), in
    the SAME exact-decimal arithmetic the engines use: rel enters as
    the Spark-cast decimal(18,6), sims arrive as decimal(18,6), and
    score = λ·rel − μ·pen is exact at context precision far above
    the operands' 20 digits, so every comparison and the final
    double cast are bit-identical to the unrolled in-engine plan
    (oracle-proven). The r17 shape re-ran a multi-exchange
    pen/anti-join/window subplan per round — 4 eager checkpoints,
    ~42 Spark jobs of pure fixed overhead on 630 constant rows."""
    import decimal as _dec

    e = read_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < MMR_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("rel"),
            "embedding",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("neighbor_id")
    )
    cands = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= MMR_CAND)
        .drop("rn")
        .localCheckpoint(eager=False)
    )
    a, b = cands.alias("a"), cands.alias("b")
    pairs = a.join(
        b,
        (F.col("a.query_id") == F.col("b.query_id"))
        & (F.col("a.neighbor_id") != F.col("b.neighbor_id")),
    ).select(
        F.col("a.query_id").alias("query_id"),
        F.col("a.neighbor_id").alias("pa"),
        F.col("b.neighbor_id").alias("pb"),
        F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
        .cast("decimal(18,6)")
        .alias("sim"),
    )
    # Bounded collects: the pool is MMR_QUERIES x MMR_CAND rows and the
    # pair table its square — constants of the query, not of the data.
    # rel crosses as BOTH the 6dp double (output + exact tie-order) and
    # the Spark-cast decimal(18,6) the score arithmetic uses, so the
    # driver never re-rounds a float.
    pool_rows = cands.select(
        "query_id",
        "neighbor_id",
        "rel",
        F.col("rel").cast("decimal(18,6)").alias("rel_dec"),
    ).collect()
    sim_rows = pairs.collect()

    sim: dict[tuple, _dec.Decimal] = {
        (r["query_id"], r["pa"], r["pb"]): r["sim"] for r in sim_rows
    }
    by_q: dict = {}
    for r in pool_rows:
        by_q.setdefault(r["query_id"], []).append(r)

    lam = _dec.Decimal(str(MMR_LAMBDA))
    mu = _dec.Decimal(str(MMR_MU))
    out_rows = []
    with _dec.localcontext() as ctx:
        # operands are <= 20 digits; 50 keeps every product/difference
        # exact, mirroring Spark's no-overflow decimal(38,7) algebra
        ctx.prec = 50
        for qid in sorted(by_q):
            pool = by_q[qid]
            # rank 1: argmax rel (decimal — identical order to the 6dp
            # double), tie-break neighbor_id asc
            first = max(pool, key=lambda r: (r["rel_dec"], -r["neighbor_id"]))
            sel_ids = [first["neighbor_id"]]
            out_rows.append(
                (qid, 1, first["neighbor_id"], first["rel"],
                 float(lam * first["rel_dec"]))
            )
            for k in range(2, MMR_K + 1):
                best = None
                for r in pool:
                    nid = r["neighbor_id"]
                    if nid in sel_ids:
                        continue
                    pen = max(sim[(qid, s, nid)] for s in sel_ids)
                    score = lam * r["rel_dec"] - mu * pen
                    key = (score, -nid)
                    if best is None or key > best[0]:
                        best = (key, nid, r["rel"], score)
                if best is None:
                    break
                sel_ids.append(best[1])
                out_rows.append((qid, k, best[1], best[2], float(best[3])))
    return spark.createDataFrame(
        out_rows,
        "query_id long, rank int, neighbor_id long, "
        "relevance double, mmr_score double",
    ).orderBy("query_id", "rank")


_fmt(
    q_mmr_diverse,
    MMR_QUERIES=MMR_QUERIES,
    MMR_CAND=MMR_CAND,
    MMR_K=MMR_K,
    MMR_LAMBDA=MMR_LAMBDA,
    MMR_MU=MMR_MU,
)


# ---------------------------------------------------------------------------
# embedding covariance audit (round 10; Gram kernel round 11)
# ---------------------------------------------------------------------------
# Dimension-redundancy report over the embedding matrix: the top
# covarying dimension pairs (and variances — the diagonal ranks in
# the same listing). High off-diagonal covariance means the embedding
# spends capacity on correlated axes — the signal behind PCA/
# matryoshka truncation decisions (q_matryoshka_eval measures quality
# AFTER truncation; this explains WHY truncation is cheap). Power
# sums accumulate in exact decimal; covariance appears as one final
# double expression per pair.
#
# Two physical strategies produce the SAME (dim_a, dim_b, n, s1, s2,
# s12) power sums, and a test pins them bit-equal:
#   * `_gram_sums_pairjoin` — the declarative semantics twin: explode
#     each row into DIM*(DIM+1)/2 pair rows, one groupBy. Readable,
#     engine-checkable (it IS the oracle's shape), but inflates every
#     row 2,080x before the shuffle.
#   * `_gram_sums_kernel` — the shipped plan: a per-partition
#     `mapInPandas` outer-product accumulator emitting 2,080 partial
#     rows PER PARTITION (not per row), merged by one tiny groupBy.
#     The arithmetic is exact: Spark casts each component to
#     decimal(18,9) BEFORE the kernel (so the rounding is the engine's
#     own, identical to the pair-join path), the kernel works on the
#     scaled int64 mantissas split hi/lo at 16 bits, and the four
#     int64 matmuls recombine as arbitrary-precision Python ints —
#     no float ever touches a power sum.

COV_TOP = 20


def _gram_sums_pairjoin(e: DataFrame) -> DataFrame:
    """Semantics twin: per-pair power sums via posexplode + self-join
    (the oracle's own shape). Output normalized to decimal(38,9)/(38,18)
    so the kernel path is comparable column-for-column."""
    comps = e.select(
        "vec_id",
        F.posexplode("embedding").alias("d", "v"),
    ).select(
        "vec_id",
        "d",
        F.col("v").cast("double").cast("decimal(18,9)").alias("val"),
    )
    a, b = comps.alias("a"), comps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.d") <= F.col("b.d")),
        )
        .groupBy(F.col("a.d").alias("dim_a"), F.col("b.d").alias("dim_b"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a.val").cast("decimal(38,9)").alias("s1"),
            F.sum("b.val").cast("decimal(38,9)").alias("s2"),
            F.sum(F.col("a.val") * F.col("b.val"))
            .cast("decimal(38,18)")
            .alias("s12"),
        )
    )


def _gram_sums_kernel(e: DataFrame, diag_only: bool = False) -> DataFrame:
    """Shipped plan: per-partition Gram accumulator over Arrow batches.

    Spark performs the double -> decimal(18,9) component cast (so the
    rounding is identical to the pair-join path) and then ships the
    scale-9 integer MANTISSA as a plain long — round 18: the decimal
    arrays crossed Arrow as python Decimal objects and the kernel spent
    its wall in a per-component ``Decimal.scaleb`` loop (64 interpreted
    conversions per row); ``dec * 10^9 -> long`` is the identical
    integer (exact: 18 digits < 2^63) extracted by the JVM, and the
    kernel gets a C-speed ``np.stack``. Accumulation is unchanged:
    each mantissa m splits as m = (m >> 16) * 2^16 + (m & 0xffff), so
    sum(m_a * m_b) = 2^32*HH + 2^16*(HL + LH) + LL where each of the
    four terms is an int64 matmul whose per-partition sum cannot
    overflow (|m| < 2^35 for |component| < 32768, so each term is
    < rows * 2^38 — safe past 2^24 rows per partition, and partitions
    are bounded by maxPartitionBytes long before that); the recombine
    happens in arbitrary-precision Python ints. Emits DIM*(DIM+1)/2
    partial rows per PARTITION — the pair-row inflation of the
    self-join (2,080x per data row) never exists — merged by one tiny
    decimal groupBy.

    ``diag_only=True`` (round 18) accumulates just the DIM diagonal
    power sums — element-wise squares instead of the four DIMxDIM
    matmuls — for consumers like the Mahalanobis screen that read only
    dim_a == dim_b rows; the emitted diagonal values are bit-identical
    to the full pass's (same mantissa sums).
    """
    import pandas as pd

    mant = e.select(
        F.transform(
            "embedding",
            lambda x: (
                x.cast("double").cast("decimal(18,9)")
                * F.lit(1_000_000_000)
            ).cast("long"),
        ).alias("vec")
    ).where(F.col("vec").isNotNull())

    def gram(batches):
        import numpy as np
        from decimal import Decimal

        n_rows = 0
        s1 = np.zeros(DIM, dtype=np.int64)
        if diag_only:
            hh = np.zeros(DIM, dtype=np.int64)
            hl = np.zeros(DIM, dtype=np.int64)
            ll = np.zeros(DIM, dtype=np.int64)
        else:
            hh = np.zeros((DIM, DIM), dtype=np.int64)
            hl = np.zeros((DIM, DIM), dtype=np.int64)
            lh = np.zeros((DIM, DIM), dtype=np.int64)
            ll = np.zeros((DIM, DIM), dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            rows = pdf["vec"].to_numpy()
            try:
                mat0 = np.stack(rows)
            except ValueError:
                raise ValueError(
                    f"ragged embedding lengths (expected DIM={DIM}); the "
                    "Gram kernel's fixed-dim contract is violated — fall "
                    "back to _gram_sums_pairjoin for ragged data"
                )
            if mat0.ndim != 2 or mat0.shape[1] != DIM:
                raise ValueError(
                    f"embedding length {mat0.shape[-1]} != DIM={DIM}; the "
                    "Gram kernel's fixed-dim contract is violated — fall "
                    "back to _gram_sums_pairjoin for ragged data"
                )
            # Arrow hands int64 rows when every component is non-null;
            # nulls surface as float NaN or object None
            if mat0.dtype == object:
                if any(x is None for row in rows for x in row):
                    raise ValueError(
                        "NULL embedding component; the Gram kernel's "
                        "non-null contract is violated — fall back to "
                        "_gram_sums_pairjoin for nullable data"
                    )
                mat = mat0.astype(np.int64)
            elif mat0.dtype.kind == "f":
                if np.isnan(mat0).any():
                    raise ValueError(
                        "NULL embedding component; the Gram kernel's "
                        "non-null contract is violated — fall back to "
                        "_gram_sums_pairjoin for nullable data"
                    )
                # exact: the magnitude contract below bounds |m| < 2^35,
                # far inside float64's 2^53 integer range
                mat = mat0.astype(np.int64)
            else:
                mat = mat0.astype(np.int64, copy=False)
            # int64 no-overflow bound for the hi/lo split matmuls:
            # |m| < 2**35 keeps every partial product and batch-sized
            # accumulation inside int64 (documented above; round-11
            # ADVICE made it checked, not assumed).
            if len(mat) and int(np.abs(mat).max()) >= 2**35:
                raise ValueError(
                    "embedding mantissa >= 2**35 (|value| >= ~34.4); the "
                    "Gram kernel's magnitude contract is violated — fall "
                    "back to _gram_sums_pairjoin for large-magnitude data"
                )
            n_rows += len(mat)
            s1 += mat.sum(axis=0)
            hi = mat >> 16
            lo = mat & 0xFFFF
            if diag_only:
                hh += (hi * hi).sum(axis=0)
                hl += (hi * lo).sum(axis=0)
                ll += (lo * lo).sum(axis=0)
            else:
                hh += hi.T @ hi
                hl += hi.T @ lo
                lh += lo.T @ hi
                ll += lo.T @ lo
        if n_rows == 0:
            return
        if diag_only:
            # diagonal of HL equals diagonal of LH: double it
            g = (
                (hh.astype(object) << 32)
                + ((2 * hl).astype(object) << 16)
                + ll.astype(object)
            )
            pairs = [(a, a) for a in range(DIM)]
        else:
            g = (
                (hh.astype(object) << 32)
                + ((hl + lh).astype(object) << 16)
                + ll.astype(object)
            )
            pairs = [(a, b) for a in range(DIM) for b in range(a, DIM)]
        out_a, out_b, out_s1, out_s2, out_s12 = [], [], [], [], []
        for a, b in pairs:
            out_a.append(a)
            out_b.append(b)
            out_s1.append(Decimal(int(s1[a])).scaleb(-9))
            out_s2.append(Decimal(int(s1[b])).scaleb(-9))
            out_s12.append(
                Decimal(int(g[a] if diag_only else g[a, b])).scaleb(-18)
            )
        yield pd.DataFrame(
            {
                "dim_a": pd.array(out_a, dtype="int32"),
                "dim_b": pd.array(out_b, dtype="int32"),
                "n": pd.array([n_rows] * len(out_a), dtype="int64"),
                "s1": out_s1,
                "s2": out_s2,
                "s12": out_s12,
            }
        )

    partials = mant.mapInPandas(
        gram,
        "dim_a int, dim_b int, n long, s1 decimal(28,9), "
        "s2 decimal(28,9), s12 decimal(38,18)",
    )
    return partials.groupBy("dim_a", "dim_b").agg(
        F.sum("n").alias("n"),
        F.sum("s1").cast("decimal(38,9)").alias("s1"),
        F.sum("s2").cast("decimal(38,9)").alias("s2"),
        F.sum("s12").cast("decimal(38,18)").alias("s12"),
    )


@query(
    "q_embedding_covariance",
    oracle=f"""
    WITH comps AS (
        SELECT e.vec_id, d.d AS d,
               CAST(CAST(e.embedding[d.d + 1] AS DOUBLE) AS DECIMAL(18,9))
                 AS val
        FROM embeddings e,
             (SELECT unnest(generate_series(0, {DIM - 1})) AS d) d
    ),
    sums AS (
        SELECT a.d AS dim_a, b.d AS dim_b,
               COUNT(*) AS n,
               SUM(a.val) AS s1,
               SUM(b.val) AS s2,
               SUM(a.val * b.val) AS s12
        FROM comps a JOIN comps b
          ON a.vec_id = b.vec_id AND a.d <= b.d
        GROUP BY a.d, b.d
    ),
    cov AS (
        SELECT CAST(dim_a AS INT) AS dim_a,
               CAST(dim_b AS INT) AS dim_b,
               CAST(n AS BIGINT) AS n,
               round((CAST(s12 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)
                     / (n - 1), 6) AS cov
        FROM sums
    )
    SELECT dim_a, dim_b, n, cov
    FROM cov
    ORDER BY round(abs(cov), 6) DESC, dim_a, dim_b
    LIMIT {COV_TOP}
    """,
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{COV_TOP} covarying embedding-dimension pairs (diagonal =
    variances, ranked in the same listing by |cov|): the capacity-
    redundancy audit behind dimension-truncation decisions. Power
    sums (S1, S2, S12) accumulate exactly (decimal components, integer
    Gram arithmetic) — order-independent, partitioning-invariant — and
    the covariance is one final double expression, rounded before the
    rank (the cross-engine ulp guard).

    Scale: `_gram_sums_kernel` — a per-partition mapInPandas
    outer-product accumulator emitting {DIM}*({DIM}+1)/2 partial rows
    per PARTITION, merged by one tiny groupBy. The oracle's pair-join
    shape (each data row exploded 2,080x before the shuffle) exists as
    `_gram_sums_pairjoin`, and `tests/test_tuning.py` pins the two
    bit-equal — the q_zorder_scan result-invisibility pattern."""
    e = read_table(spark, sf_dir, "embeddings")
    sums = _gram_sums_kernel(e)
    cov = (
        F.col("s12").cast("double")
        - F.col("s1").cast("double") * F.col("s2").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    return (
        sums.select(
            F.col("dim_a").cast("int").alias("dim_a"),
            F.col("dim_b").cast("int").alias("dim_b"),
            F.col("n").cast("bigint").alias("n"),
            F.round(cov, 6).alias("cov"),
        )
        .orderBy(F.round(F.abs(F.col("cov")), 6).desc(), "dim_a", "dim_b")
        .limit(COV_TOP)
    )


_fmt(q_embedding_covariance, COV_TOP=COV_TOP, DIM=DIM)


# ---------------------------------------------------------------------------
# principal component via fixed-point power iteration (round 11)
# ---------------------------------------------------------------------------
# q_embedding_covariance lists the top covarying PAIRS; this extracts
# the top principal DIRECTION and how much variance it explains — the
# one-number answer to "how compressible is this embedding" that
# motivates matryoshka truncation and PCA whitening. Everything runs
# on the {DIM}x{DIM} covariance matrix distilled by the Gram kernel,
# so the data-sized work is the same single mapInPandas pass; the
# iteration itself is constant-size.
#
# Hash-gate discipline: the covariance quantizes to integer
# PCA_C_SCALE units (one rounded double per cell — the established
# cross-engine-safe step), and the power iteration then runs in pure
# integer arithmetic: w = C_fp . v exactly (scale-0 decimals /
# hugeint), renormalized each round to max|v| = PCA_V_SCALE by
# integral division with an explicit sign split. Both engines truncate
# integral division toward zero (Spark `div` and DuckDB `//` alike:
# -7 // 2 = -3, probed in test_holt_fold_matches_duckdb_*), so the
# split is defense-in-depth/clarity — it keeps every division operand
# non-negative so the recurrence stays obviously portable — not a
# floor-vs-truncate reconciliation. Rayleigh quotient and
# explained-variance ratio are single final double expressions over
# exact integer sums.

PCA_ITERS = 32
PCA_V_SCALE = 10**12
PCA_C_SCALE = 10**6

_SQL_PCA_GRAM = f"""
    comps AS (
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
    chalf AS MATERIALIZED (
        SELECT dim_a, dim_b,
               CAST(round(
                   (CAST(s12 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)
                   / (n - 1) * {PCA_C_SCALE}, 0) AS BIGINT) AS c_fp
        FROM gsums
    ),
    cmat AS MATERIALIZED (
        SELECT dim_a, dim_b, c_fp FROM chalf
        UNION ALL
        SELECT dim_b, dim_a, c_fp FROM chalf WHERE dim_a < dim_b
    )
"""


def _sql_pca_iter(k: int) -> str:
    return f"""
    w{k + 1} AS MATERIALIZED (
        SELECT m.dim_a AS dim,
               CAST(SUM(CAST(m.c_fp AS HUGEINT) * v{k}.v) AS HUGEINT)
                 AS raw
        FROM cmat m JOIN v{k} ON v{k}.dim = m.dim_b
        GROUP BY m.dim_a
    ),
    v{k + 1} AS MATERIALIZED (
        SELECT dim,
               CAST(sign(raw) AS BIGINT)
               * CAST(abs(raw) * {PCA_V_SCALE}
                      // GREATEST((SELECT MAX(abs(raw)) FROM w{k + 1}), 1)
                      AS BIGINT) AS v
        FROM w{k + 1}
    )"""


_SQL_PCA_ITERS = ",".join(_sql_pca_iter(k) for k in range(PCA_ITERS))


@query(
    "q_pca_power",
    oracle=f"""
    WITH {_SQL_PCA_GRAM},
    v0 AS MATERIALIZED (
        SELECT unnest(generate_series(0, {DIM - 1})) AS dim,
               CAST({PCA_V_SCALE} AS BIGINT) AS v
    ),
    {_SQL_PCA_ITERS},
    num AS (
        SELECT SUM(CAST(m.c_fp AS HUGEINT) * va.v * vb.v) AS x
        FROM cmat m
        JOIN v{PCA_ITERS} va ON va.dim = m.dim_a
        JOIN v{PCA_ITERS} vb ON vb.dim = m.dim_b
    ),
    den AS (SELECT SUM(CAST(v AS HUGEINT) * v) AS x FROM v{PCA_ITERS}),
    tr AS (SELECT SUM(c_fp) AS x FROM chalf WHERE dim_a = dim_b)
    SELECT CAST(f.dim AS INT) AS dim,
           round(CAST(f.v AS DOUBLE) / {PCA_V_SCALE}, 6) AS loading,
           round(CAST(num.x AS DOUBLE) / CAST(den.x AS DOUBLE)
                 / {PCA_C_SCALE}, 6) AS lambda1,
           round(CAST(tr.x AS DOUBLE) / {PCA_C_SCALE}, 6) AS total_var,
           round((CAST(num.x AS DOUBLE) / CAST(den.x AS DOUBLE)
                  / {PCA_C_SCALE})
                 / (CAST(tr.x AS DOUBLE) / {PCA_C_SCALE}), 6)
             AS explained_ratio
    FROM v{PCA_ITERS} f, num, den, tr
    ORDER BY dim
    """,
)
def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding matrix by {PCA_ITERS}
    fixed-point power iterations over the covariance matrix distilled
    by the Gram kernel: per-dimension loadings (max-normalized to 1),
    the leading eigenvalue (Rayleigh quotient over exact integer
    sums), total variance (trace), and the explained-variance ratio —
    the compressibility number behind PCA/matryoshka truncation
    decisions.

    The covariance quantizes once to integer {PCA_C_SCALE} units (the
    rounded-double step every hash-gated query uses); all {PCA_ITERS}
    iterations are then exact integer algebra with sign-split
    integral-division renormalization, so the oracle's unrolled
    MATERIALIZED CTE layers reproduce every iterate bit-for-bit.

    Scale: the data-sized work is `_gram_sums_kernel`'s one
    mapInPandas pass (2,080 partials per partition); the quantized
    {DIM}x{DIM} matrix is a bounded artifact (collected like a
    centroid table) and the iteration is driver-side exact integer
    algebra — constant cost at any corpus size. On a near-isotropic
    corpus the eigengap is tiny and the iterate is the Rayleigh
    ESTIMATE after {PCA_ITERS} fixed steps (deterministic, and the
    explained ratio ~ 1/{DIM} is itself the diagnosis: not
    compressible); on spiked data it converges hard — pinned against
    numpy on a planted component in tests."""
    e = read_table(spark, sf_dir, "embeddings")
    return pca_power(e)


def pca_power(e: DataFrame, iters: int = PCA_ITERS) -> DataFrame:
    """The q_pca_power kernel over any (vec_id, embedding) frame.

    Data-sized work is `_gram_sums_kernel`'s single mapInPandas pass;
    the covariance then quantizes ENGINE-SIDE (the rounded-double step
    is Spark's, identical to the oracle's) into DIM*(DIM+1)/2 integer
    cells — a bounded artifact, collected like a centroid table — and
    the power iteration runs driver-side in arbitrary-precision Python
    ints: sum/abs/max and `//` on non-negative values are the same
    truncating integral division DuckDB's unrolled layers use, so
    every iterate matches the oracle bit-for-bit. The final divisions
    and roundings are pushed BACK into Spark column expressions so
    both engines produce the served doubles through their own round().
    """
    spark = e.sparkSession
    sums = _gram_sums_kernel(e)
    cov = (
        F.col("s12").cast("double")
        - F.col("s1").cast("double")
        * F.col("s2").cast("double")
        / F.col("n")
    ) / (F.col("n") - 1)
    chalf = sums.select(
        "dim_a",
        "dim_b",
        F.round(cov * PCA_C_SCALE, 0).cast("bigint").alias("c_fp"),
    )
    cells = chalf.collect()  # DIM*(DIM+1)/2 rows — bounded artifact
    c = [[0] * DIM for _ in range(DIM)]
    for r in cells:
        c[r["dim_a"]][r["dim_b"]] = r["c_fp"]
        c[r["dim_b"]][r["dim_a"]] = r["c_fp"]
    v = [PCA_V_SCALE] * DIM
    for _ in range(iters):
        w = [sum(c[a][b] * v[b] for b in range(DIM)) for a in range(DIM)]
        m = max(max(abs(x) for x in w), 1)
        v = [
            (1 if x >= 0 else -1) * (abs(x) * PCA_V_SCALE // m) for x in w
        ]
    num = sum(
        c[a][b] * v[a] * v[b] for a in range(DIM) for b in range(DIM)
    )
    den = sum(x * x for x in v)
    tr = sum(c[a][a] for a in range(DIM))
    from decimal import Decimal

    out = spark.createDataFrame(
        [(a, v[a], Decimal(num), Decimal(den), tr) for a in range(DIM)],
        "dim int, v long, num decimal(38,0), den decimal(38,0), tr long",
    )
    lam = (
        F.col("num").cast("double")
        / F.col("den").cast("double")
        / F.lit(PCA_C_SCALE)
    )
    trace = F.col("tr").cast("double") / F.lit(PCA_C_SCALE)
    return out.select(
        "dim",
        F.round(F.col("v").cast("double") / PCA_V_SCALE, 6).alias(
            "loading"
        ),
        F.round(lam, 6).alias("lambda1"),
        F.round(trace, 6).alias("total_var"),
        F.round(lam / trace, 6).alias("explained_ratio"),
    ).orderBy("dim")


_fmt(
    q_pca_power,
    PCA_ITERS=PCA_ITERS,
    PCA_C_SCALE=PCA_C_SCALE,
    DIM=DIM,
)


# ---------------------------------------------------------------------------
# persisted IVF index: the build/serve lifecycle split (round 11)
# ---------------------------------------------------------------------------
# q_ann_ivf assigns the WHOLE corpus to centroids inside every query —
# correct for a one-shot batch, wrong as a serving architecture: a
# production index is built once, persisted, and each query touches
# only its probed lists. q_ann_serve is that split made real: the inverted
# file (cid, vec_id, embedding — the IVFFlat layout) lands on disk
# PARTITIONED BY cid, and the serving query joins a broadcast probe
# set against it, so Spark's dynamic partition pruning reads ONLY the
# probed lists' files. The answer must equal the inline build
# (deterministic quantizer), so q_ann_ivf's oracle transfers verbatim
# — build/serve is result-invisible by construction, and the pruning
# is pinned in tests/test_plans_ext.py.

_IVF_INDEX_VERSION = "v1"


def ivf_centroids(e: DataFrame) -> DataFrame:
    """(cid, ce): the frozen coarse quantizer — deterministic first-K
    init, the same table every IVF path in this module trains from."""
    return e.where(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )


def ivf_assign_lists(e: DataFrame, cents: DataFrame) -> DataFrame:
    """(cid, vec_id, embedding): nearest-centroid (max cosine, ties to
    the smaller cid) inverted-list rows. Per-row deterministic given
    the frozen centroid table, so assignment commutes with any
    batching of the corpus — the property the streaming index view
    (streaming.sketchview) relies on. Broadcast centroids, map-only
    but for the per-vector argmax window."""
    scored = fan_out(e, "vec_id").join(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cid",
        cosine(F.col("embedding"), F.col("ce")).alias("ac"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("ac").desc(), F.col("cid"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("cid", "vec_id", "embedding")
    )


def ivf_serve(lists: DataFrame, cents: DataFrame, e: DataFrame) -> DataFrame:
    """The IVFFlat serving query over ANY (cid, vec_id, embedding)
    inverted-list source — the persisted index (q_ann_serve) or the
    continuously-maintained streaming view (q_ann_index_stream):
    queries score the centroid table (broadcast, map-only), probe
    their nprobe lists, and the candidate join runs against the list
    source keyed on cid."""
    queries = e.where(F.col("vec_id") < IVF_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    qscored = queries.join(F.broadcast(cents)).select(
        "query_id",
        "qe",
        "cid",
        cosine(F.col("qe"), F.col("ce")).alias("ac"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("ac").desc(), F.col("cid")
    )
    probes = (
        qscored.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= IVF_NPROBE)
        .select("query_id", "qe", "cid")
    )
    scored = (
        lists.join(F.broadcast(probes), "cid")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qe"), F.col("embedding")).alias("cs"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cs").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= IVF_TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("cs", 6).alias("cos_sim"),
        )
    )


#: q_ann_ivf's oracle verbatim — the result every IVF serving path
#: (persisted index, streaming view) must hash-match.
SQL_IVF_SERVE = f"""
    WITH {_SQL_IVF}
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           round(cs, 6) AS cos_sim
    FROM ranked WHERE rank <= {IVF_TOP_K}
    """


def _ensure_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """Build the IVF index once per dataset: centroid table + inverted
    lists (with vectors — IVFFlat) written partitioned by cid."""
    import os

    from dynamodb_streaming_datalake_spark.cache import ensure_cached_build

    def build(build_dir: str) -> None:
        e = read_table(spark, sf_dir, "embeddings")
        cents = ivf_centroids(e)
        ivf_assign_lists(e, cents).write.partitionBy("cid").parquet(
            os.path.join(build_dir, "lists")
        )
        cents.write.parquet(os.path.join(build_dir, "centroids"))

    return ensure_cached_build("ivfindex", _IVF_INDEX_VERSION, sf_dir, build)


@query("q_ann_serve", oracle=SQL_IVF_SERVE)
def q_ann_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN serving from the PERSISTED IVF index: queries score the
    stored centroid table (broadcast, map-only), probe their nprobe=2
    lists, and the candidate join runs against the cid-PARTITIONED
    inverted file on disk — dynamic partition pruning reads only the
    probed lists' files, never the whole corpus (the FAISS IVFFlat
    serving path as a lake layout). The quantizer is deterministic, so
    serving from the index must hash-match q_ann_ivf's inline build —
    the oracle transfers verbatim and IS the build/serve
    result-invisibility proof.

    Scale: the index is built once (one assignment pass) and amortized
    across every query thereafter; per serve, work = |queries| x 16
    centroid scores + an equi-join bounded by the probed lists."""
    import os

    path = _ensure_ivf_index(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    lists = spark.read.parquet(os.path.join(path, "lists"))
    e = read_table(spark, sf_dir, "embeddings")
    return ivf_serve(lists, cents, e)


# ---------------------------------------------------------------------------
# persisted IVF-PQ index: the billion-scale serving shape (round 12)
# ---------------------------------------------------------------------------
# q_ann_serve persists IVFFlat — raw vectors in the inverted lists.
# At 10^9+ vectors the list payload itself is the cost: IVF-PQ stores
# 4-byte PQ codes instead of 256-byte vectors (64x smaller lists), and
# a query ADC-scores its probed lists against a per-query LUT without
# ever touching a raw vector. This is FAISS IndexIVFPQ's on-disk
# serving shape as a lake layout: codes land PARTITIONED BY cid, the
# trained codebook and coarse centroids persist beside them, and the
# serving query joins a broadcast probe set so dynamic partition
# pruning reads ONLY the probed lists' files. The quantizer, codebook
# training, and ADC fold are the deterministic ones q_ann_ivfpq runs
# inline, so serving from the store must hash-match its oracle
# VERBATIM — build/serve result-invisibility, pinned like q_ann_serve.

# v2: build refactored onto the shared ivfpq_coarse_centroids /
# ivfpq_encode kernels (round 13) — bumped so the rebuilt store is
# re-proven through the oracle instead of serving a pre-refactor cache
_IVFPQ_INDEX_VERSION = "v2"


def ivfpq_coarse_centroids(e: DataFrame) -> DataFrame:
    """The frozen coarse quantizer: deterministic first-K init (same as
    ``_ivfpq_candidates``), so every build/serve/stream path derives
    the identical (cid, ce) table."""
    ad = F.col("embedding").cast("array<double>")
    return e.where(F.col("vec_id") < IVFPQ_CENTROIDS).select(
        F.col("vec_id").alias("cid"), ad.alias("ce")
    )


def ivfpq_encode(e: DataFrame, tcb: DataFrame, cents: DataFrame) -> DataFrame:
    """Encode vectors against a FROZEN PQ codebook + coarse quantizer:
    (vec_id, s, code, cid) rows — PQ subspace codes plus the coarse
    list each vector belongs to. Per-row deterministic (broadcast
    argmin both times), so encoding COMMUTES WITH BATCHING: encoding a
    corpus in micro-batches and unioning equals encoding it one-shot —
    the property q_ann_codes_stream's append fold rests on."""
    enc = _pq_assign(_pq_subvectors(e), tcb).select("vec_id", "s", "code")
    ad = F.col("embedding").cast("array<double>")
    scored = (
        e.select("vec_id", ad.alias("ev"))
        .join(F.broadcast(cents))
        .select(
            "vec_id", "cid", l2sq(F.col("ev"), F.col("ce")).alias("cdist")
        )
    )
    lists = (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("cdist", "cid")).alias("best"))
        .select("vec_id", F.col("best.cid").alias("cid"))
    )
    return enc.join(lists, "vec_id").select("vec_id", "s", "code", "cid")


def ivfpq_serve(
    codes: DataFrame, cents: DataFrame, tcb: DataFrame, e: DataFrame
) -> DataFrame:
    """Shared IVF-PQ serving kernel (the q_ann_serve / ivf_serve split
    applied to the compressed tier): queries score the coarse
    centroids (broadcast, map-only), build their LUT from the stored
    codebook, and ADC-fold only the probed lists' codes. Used by both
    the persisted index (q_ann_serve_pq) and the stream-maintained
    code view (q_ann_codes_stream), so the two serving paths cannot
    drift."""
    qsub = _pq_subvectors(e.where(F.col("vec_id") < PQ_NQ))
    lut = _pq_lut(qsub, tcb)
    ad = F.col("embedding").cast("array<double>")
    qscored = (
        e.where(F.col("vec_id") < PQ_NQ)
        .select("vec_id", ad.alias("ev"))
        .join(F.broadcast(cents))
        .select(
            "vec_id", "cid", l2sq(F.col("ev"), F.col("ce")).alias("cdist")
        )
    )
    wq = Window.partitionBy("vec_id").orderBy(F.col("cdist").asc(), F.col("cid"))
    probes = (
        qscored.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= IVFPQ_NPROBE)
        .select(F.col("vec_id").alias("query_id"), "cid")
    )
    pairs = (
        codes.join(F.broadcast(probes), "cid")
        .where(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(lut), ["query_id", "s", "code"])
    )
    return (
        _adc_fold_and_rank(pairs, pool=PQ_TOPK)
        .where(F.col("rank") <= PQ_TOPK)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("adist", 6).alias("approx_dist"),
        )
    )


def _ensure_ivfpq_index(spark: SparkSession, sf_dir: str) -> str:
    """Build the IVF-PQ index once per dataset: coarse centroid table,
    trained PQ codebook, and per-vector PQ codes partitioned by cid.
    Everything persisted is exactly what q_ann_ivfpq derives inline —
    float64 round-trips bit-exactly through parquet, so the stored
    codebook/codes are the inline ones, not approximations."""
    import os

    from dynamodb_streaming_datalake_spark.cache import ensure_cached_build

    def build(build_dir: str) -> None:
        e = read_table(spark, sf_dir, "embeddings")
        sub = _pq_subvectors(e)
        tcb = _pq_trained_codebook(sub, cache_key=_pq_cache_key(sf_dir))
        cents = ivfpq_coarse_centroids(e)
        ivfpq_encode(e, tcb, cents).write.partitionBy("cid").parquet(
            os.path.join(build_dir, "codes")
        )
        cents.write.parquet(os.path.join(build_dir, "centroids"))
        tcb.write.parquet(os.path.join(build_dir, "codebook"))

    return ensure_cached_build("ivfpqindex", _IVFPQ_INDEX_VERSION, sf_dir, build)


#: q_ann_ivfpq's oracle shape verbatim — the result every IVF-PQ
#: serving path (persisted index, stream-maintained code view) must
#: hash-match.
SQL_IVFPQ_SERVE = f"""
    WITH {_SQL_PQ_TRAIN_ENC_LUT},
    {_SQL_IVFPQ_LISTS},
    adc AS (
        SELECT c.query_id, c.neighbor_id,
               list_aggregate(list(l.d ORDER BY l.s), 'sum') AS adist
        FROM cand c
        JOIN enc e ON e.vec_id = c.neighbor_id
        JOIN lut l ON l.query_id = c.query_id AND l.s = e.s
                  AND l.code = e.code
        GROUP BY c.query_id, c.neighbor_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           round(adist, 6) AS approx_dist
    FROM (
        SELECT query_id, neighbor_id, adist,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY adist ASC, neighbor_id) AS rank
        FROM adc
    ) WHERE rank <= {PQ_TOPK}
    """


@query("q_ann_serve_pq", oracle=SQL_IVFPQ_SERVE)
def q_ann_serve_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN serving from the PERSISTED IVF-PQ index — the billion-scale
    production shape: queries score the stored coarse centroids
    (broadcast, map-only), build their LUT from the STORED codebook
    (never retraining), and ADC-fold ONLY the probed lists' 4-byte
    codes read via dynamic partition pruning from the cid-partitioned
    code store. Must hash-match q_ann_ivfpq's inline build — the
    oracle transfers verbatim and IS the build/serve
    result-invisibility proof (pinned with the DPP assertion in
    tests/test_plans_ext.py).

    Scale: the index is built once; per serve, work = |queries| x
    {IVFPQ_CENTROIDS} centroid scores + a LUT of Q x {PQ_M} x {PQ_K}
    rows (broadcast-sized at any corpus) + an ADC fold bounded by the
    probed lists — and the lists hold codes, not vectors, so bytes
    read per probe are ~64x smaller than IVFFlat serving."""
    import os

    path = _ensure_ivfpq_index(spark, sf_dir)
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    codes = spark.read.parquet(os.path.join(path, "codes"))
    tcb = spark.read.parquet(os.path.join(path, "codebook"))
    e = read_table(spark, sf_dir, "embeddings")
    return ivfpq_serve(codes, cents, tcb, e)


_fmt(
    q_ann_serve_pq,
    IVFPQ_CENTROIDS=IVFPQ_CENTROIDS,
    PQ_M=PQ_M,
    PQ_K=PQ_K,
)


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection + recall eval (round 12)
# ---------------------------------------------------------------------------
# The third compression lever beside PQ codes (q_ann_pq) and prefix
# truncation (q_matryoshka_eval): project DIM-dim embeddings onto
# JL_DIM random +/-1 directions (a dense sign matrix — the Achlioptas
# construction, distance-preserving with high probability) and measure
# what top-k retrieval loses. The sign matrix derives from the same
# portable md5 both engines share, computed ONCE driver-side and
# inlined as literals — per-row work is JL_DIM sequential dot folds,
# map-only, zero shuffle, the cheapest possible re-embedding at 100 TB.

JL_DIM = 16
JL_NQ = 10
JL_K = 10


def _jl_sign(j: int, d: int) -> float:
    """+/-1 from the portable 60-bit md5 hash (the same derivation the
    LSH sign planes use), computed in Python: both engines would
    produce the identical value, so inlining is a constant-fold."""
    import hashlib

    h = int(hashlib.md5(f"jl{j}_{d}".encode()).hexdigest()[:15], 16)
    return float((h % 2) * 2 - 1)


_JL_SIGNS = [[_jl_sign(j, d) for d in range(DIM)] for j in range(JL_DIM)]

_SQL_JL_PROJ = ", ".join(
    "list_dot_product(embedding::DOUBLE[], ["
    + ", ".join(f"{s:.1f}" for s in _JL_SIGNS[j])
    + "])"
    for j in range(JL_DIM)
)

_SQL_JL_L2_EXACT = _sql_l2sq("q.qe", "e.embedding::DOUBLE[]")
_SQL_JL_L2_PROJ = _sql_l2sq("qp.pq", "p.p")


@query(
    "q_random_projection",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
        FROM embeddings WHERE vec_id < {JL_NQ}
    ),
    proj AS (
        SELECT vec_id, [{_SQL_JL_PROJ}] AS p FROM embeddings
    ),
    exact AS (
        SELECT q.query_id, e.vec_id AS nid,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                   ORDER BY {_SQL_JL_L2_EXACT} ASC, e.vec_id) AS r
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    ),
    approx AS (
        SELECT qp.query_id, p.vec_id AS nid,
               ROW_NUMBER() OVER (PARTITION BY qp.query_id
                   ORDER BY {_SQL_JL_L2_PROJ} ASC, p.vec_id) AS r
        FROM (SELECT vec_id AS query_id, p AS pq FROM proj
              WHERE vec_id < {JL_NQ}) qp
        JOIN proj p ON p.vec_id <> qp.query_id
    )
    SELECT e.query_id,
           CAST(COUNT(a.nid) AS BIGINT) AS n_hits,
           round(COUNT(a.nid) * 1.0 / {JL_K}, 6) AS recall
    FROM (SELECT query_id, nid FROM exact WHERE r <= {JL_K}) e
    LEFT JOIN (SELECT query_id, nid FROM approx WHERE r <= {JL_K}) a
      ON a.query_id = e.query_id AND a.nid = e.nid
    GROUP BY e.query_id
    ORDER BY e.query_id
    """,
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss compression eval: project every embedding
    onto {JL_DIM} fixed +/-1 directions (Achlioptas sign matrix from
    the portable md5, inlined as literals) and report per-query
    recall@{JL_K} of projected-L2 retrieval against exact full-dim L2
    — the measurement a corpus owner reads before swapping 4x-smaller
    projected vectors into the ANN tier. Complements q_matryoshka_eval
    (prefix truncation) and q_ann_pq (codebook quantization): JL needs
    NO training pass at all.

    Scale: projection is row-local ({JL_DIM} sequential dot folds,
    map-only, zero shuffle); the eval crosses a broadcast {JL_NQ}-row
    query panel with the corpus — the whitelisted constant cross every
    retrieval-eval query in this module uses."""
    e = read_table(spark, sf_dir, "embeddings")
    ed = F.col("embedding").cast("array<double>")

    def dot_signs(j: int) -> F.Column:
        return F.aggregate(
            F.zip_with(
                ed,
                F.array(*[F.lit(s) for s in _JL_SIGNS[j]]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda s, v: s + v,
        )

    proj = e.select(
        "vec_id", F.array(*[dot_signs(j) for j in range(JL_DIM)]).alias("p")
    )
    q = e.where(F.col("vec_id") < JL_NQ).select(
        F.col("vec_id").alias("query_id"), ed.alias("qe")
    )
    exact = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("nid"),
            l2sq(F.col("qe"), ed).alias("dist"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), "nid")
    exact_k = (
        exact.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= JL_K)
        .select("query_id", "nid")
    )
    qp = proj.where(F.col("vec_id") < JL_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("p").alias("pq")
    )
    approx = (
        F.broadcast(qp)
        .join(proj, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("nid"),
            l2sq(F.col("pq"), F.col("p")).alias("dist"),
        )
    )
    approx_k = (
        approx.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= JL_K)
        .select("query_id", "nid", F.lit(1).alias("hit"))
    )
    return (
        exact_k.join(approx_k, ["query_id", "nid"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("bigint").alias("n_hits"),
            F.round(F.count("hit") / F.lit(JL_K), 6).alias("recall"),
        )
        .orderBy("query_id")
    )


_fmt(q_random_projection, JL_DIM=JL_DIM, JL_K=JL_K, JL_NQ=JL_NQ)


# ---------------------------------------------------------------------------
# simplified silhouette — cluster-quality audit (round 12)
# ---------------------------------------------------------------------------
# q_kmeans reports per-cluster mean cosine to the OWN centroid; the
# silhouette asks the question that actually decides K and flags
# mis-clustered regions: how much closer is each point to its own
# centroid than to the nearest OTHER centroid? The simplified (medoid)
# silhouette s = (b - a) / max(a, b) over centroid distances is the
# standard O(N*K) audit — the full pairwise silhouette is O(N^2) and
# never runs at corpus scale.

SIL_K = 8  #: the q_kmeans init centroids (deterministic first-K)


@query(
    "q_embedding_silhouette",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cid, embedding AS ce
        FROM embeddings WHERE vec_id < {SIL_K}
    ),
    scored AS (
        SELECT e.vec_id, c.cid,
               1 - {sql_cosine('e.embedding', 'c.ce')} AS dist,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                   ORDER BY {sql_cosine('e.embedding', 'c.ce')} DESC, c.cid)
                 AS r
        FROM embeddings e CROSS JOIN cents c
    ),
    ab AS (
        SELECT own.vec_id, own.cid, own.dist AS a, nxt.dist AS b,
               round((nxt.dist - own.dist)
                     / (CASE WHEN own.dist > nxt.dist
                             THEN own.dist ELSE nxt.dist END), 6) AS s
        FROM (SELECT * FROM scored WHERE r = 1) own
        JOIN (SELECT * FROM scored WHERE r = 2) nxt
          ON nxt.vec_id = own.vec_id
    )
    SELECT cid,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*),
                 6) AS mean_silhouette,
           round(MIN(s), 6) AS worst_silhouette
    FROM ab GROUP BY cid ORDER BY cid
    """,
)
def q_embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per cluster of the deterministic first-K
    quantizer: for every vector, a = cosine distance to its own
    (nearest) centroid, b = distance to the second-nearest, s =
    (b - a) / max(a, b); report per-cluster count, mean and worst s —
    the K-selection / mis-clustering audit run before trusting any
    IVF list layout or k-means mixture built on these centroids.

    Scale: O(N*K) — one broadcast of K centroids, the per-vector
    top-2 collapses map-side; per-point s rounds to 6 dp and
    accumulates in exact decimal (order-independent), the q_kmeans
    reporting discipline. The full pairwise silhouette is O(N^2) and
    is deliberately NOT what this computes."""
    e = read_table(spark, sf_dir, "embeddings")
    cents = e.where(F.col("vec_id") < SIL_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    scored = fan_out(e, "vec_id").join(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        (1 - cosine(F.col("embedding"), F.col("ce"))).alias("dist"),
        cosine(F.col("embedding"), F.col("ce")).alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), "cid")
    ranked = scored.withColumn("r", F.row_number().over(w)).where(
        F.col("r") <= 2
    )
    own = ranked.where(F.col("r") == 1).select("vec_id", "cid", F.col("dist").alias("a"))
    nxt = ranked.where(F.col("r") == 2).select("vec_id", F.col("dist").alias("b"))
    s = F.round(
        (F.col("b") - F.col("a"))
        / F.when(F.col("a") > F.col("b"), F.col("a")).otherwise(F.col("b")),
        6,
    )
    ab = own.join(nxt, "vec_id").select("vec_id", "cid", s.alias("s"))
    return (
        ab.groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum(F.col("s").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_silhouette"),
            F.round(F.min("s"), 6).alias("worst_silhouette"),
        )
        .orderBy("cid")
    )


_fmt(q_embedding_silhouette, SIL_K=SIL_K)


# ---------------------------------------------------------------------------
# cluster purity + Cohen's kappa vs labels (round 12)
# ---------------------------------------------------------------------------
# q_embedding_silhouette audits cluster GEOMETRY; this audits cluster
# SEMANTICS: when ground-truth labels exist (the embeddings table
# carries one), how well do the quantizer's clusters recover them?
# Per-cluster purity (majority-label share) plus the corpus-level
# Cohen's kappa between the majority-label prediction and the truth —
# kappa corrects purity's blind spot (predicting the most common label
# everywhere looks "pure" but has kappa ~ 0). Every statistic is a
# ratio of exact integer counts, so the report is engine-exact with
# no transcendental in sight (deliberately purity/kappa, not NMI).


@query(
    "q_cluster_purity",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cid, embedding AS ce
        FROM embeddings WHERE vec_id < {SIL_K}
    ),
    assign AS (
        SELECT vec_id, cid, label FROM (
            SELECT e.vec_id, c.cid, e.label,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                       ORDER BY {sql_cosine('e.embedding', 'c.ce')} DESC,
                                c.cid) AS r
            FROM embeddings e CROSS JOIN cents c
        ) WHERE r = 1
    ),
    cl AS (
        SELECT cid, label, COUNT(*) AS n_cl
        FROM assign GROUP BY cid, label
    ),
    maj AS (
        SELECT cid, label AS majority_label, n_cl AS n_majority, n
        FROM (
            SELECT cid, label, n_cl,
                   ROW_NUMBER() OVER (PARTITION BY cid
                       ORDER BY n_cl DESC, label) AS r,
                   SUM(n_cl) OVER (PARTITION BY cid) AS n
            FROM cl
        ) WHERE r = 1
    ),
    pred AS (
        SELECT m.majority_label AS plabel, SUM(m.n) AS n_pred
        FROM maj m GROUP BY m.majority_label
    ),
    truth AS (SELECT label, COUNT(*) AS n_true FROM assign GROUP BY label),
    tot AS (
        SELECT SUM(n_majority) AS agree, SUM(n) AS total FROM maj
    ),
    pe AS (
        SELECT SUM(COALESCE(p.n_pred, 0) * t.n_true) AS pe_num
        FROM truth t LEFT JOIN pred p ON p.plabel = t.label
    )
    SELECT maj.cid,
           CAST(maj.n AS BIGINT) AS n,
           CAST(maj.majority_label AS INT) AS majority_label,
           CAST(maj.n_majority AS BIGINT) AS n_majority,
           round(maj.n_majority * 1.0 / maj.n, 6) AS purity,
           round(tot.agree * 1.0 / tot.total, 6) AS overall_purity,
           round((tot.agree * 1.0 / tot.total
                  - pe.pe_num * 1.0 / (tot.total * tot.total))
                 / (1 - pe.pe_num * 1.0 / (tot.total * tot.total)), 6)
             AS kappa
    FROM maj, tot, pe
    ORDER BY maj.cid
    """,
)
def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic cluster audit against the embeddings' ground-truth
    labels: per-cluster majority label and purity for the
    deterministic first-{SIL_K} quantizer, plus corpus-level overall
    purity and Cohen's kappa of the majority-label prediction (kappa
    corrects for chance agreement — the always-predict-the-mode
    degenerate clustering scores ~0). Run beside
    q_embedding_silhouette: geometry AND semantics before trusting a
    cluster-derived curriculum or mixture.

    Scale: the assignment is the broadcast argmax every IVF path
    uses; everything after is aggregates over (cluster x label)
    counts — a few hundred rows at any corpus size. All ratios are
    exact-integer rationals: no log, no sum-of-doubles."""
    e = read_table(spark, sf_dir, "embeddings")
    cents = e.where(F.col("vec_id") < SIL_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    scored = fan_out(e, "vec_id").join(F.broadcast(cents)).select(
        "vec_id",
        "label",
        "cid",
        cosine(F.col("embedding"), F.col("ce")).alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), "cid")
    assign = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("vec_id", "cid", "label")
    )
    cl = assign.groupBy("cid", "label").agg(F.count(F.lit(1)).alias("n_cl"))
    wm = Window.partitionBy("cid").orderBy(F.col("n_cl").desc(), "label")
    maj = (
        cl.withColumn("r", F.row_number().over(wm))
        .withColumn("n", F.sum("n_cl").over(Window.partitionBy("cid")))
        .where(F.col("r") == 1)
        .select(
            "cid",
            F.col("label").alias("majority_label"),
            F.col("n_cl").alias("n_majority"),
            "n",
        )
    )
    pred = maj.groupBy(F.col("majority_label").alias("plabel")).agg(
        F.sum("n").alias("n_pred")
    )
    truth = assign.groupBy("label").agg(F.count(F.lit(1)).alias("n_true"))
    tot = maj.agg(
        F.sum("n_majority").alias("agree"), F.sum("n").alias("total")
    )
    pe = (
        truth.join(pred, truth["label"] == pred["plabel"], "left")
        .na.fill({"n_pred": 0})
        .agg(F.sum(F.col("n_pred") * F.col("n_true")).alias("pe_num"))
    )
    po = F.col("agree") / F.col("total")
    pe_frac = F.col("pe_num") / (F.col("total") * F.col("total"))
    return (
        maj.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(pe))
        .select(
            "cid",
            F.col("n").cast("bigint").alias("n"),
            F.col("majority_label").cast("int").alias("majority_label"),
            F.col("n_majority").cast("bigint").alias("n_majority"),
            F.round(F.col("n_majority") / F.col("n"), 6).alias("purity"),
            F.round(po, 6).alias("overall_purity"),
            F.round((po - pe_frac) / (1 - pe_frac), 6).alias("kappa"),
        )
        .orderBy("cid")
    )
