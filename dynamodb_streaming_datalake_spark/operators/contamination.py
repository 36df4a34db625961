"""Benchmark decontamination for training corpora.

Before training on a crawled corpus you must remove documents that
overlap the evaluation set, or benchmark scores are meaningless. The
standard recipe (used by GPT-3/PaLM-style pipelines) is n-gram overlap:
a training document is *contaminated* if it shares at least one n-word
shingle with any eval document.

Shape at scale (the part that matters at 100 TB):

* The eval set is small by construction — its distinct shingle hashes
  fit in memory, so the overlap test is a **broadcast semi-join**: the
  corpus side is never shuffled, each task streams its partition once.
* Shingling is row-local (``transform`` over a split array — no UDF,
  stays in whole-stage codegen); shingles are reduced to portable
  60-bit md5 hashes *before* the join so the broadcast table is
  integers, not strings.
* Output is per-doc counts — the only shuffle is a groupBy over the
  (tiny) matched subset.

Here the "eval set" is carved from ``documents`` itself with the
deterministic hash sample (``operators.sampling``): bucket < 5% ⇒ eval,
rest ⇒ training candidates. Reproducible on any cluster size, and the
DuckDB oracle replays the identical definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.functions.texthash import (
    portable_hash60,
    sql_portable_hash60,
    sql_word_shingles,
    word_shingles,
)
from dynamodb_streaming_datalake_spark.operators.sampling import DENOM, hash_bucket
from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

#: shingle width — 4 words: long enough that overlap means real shared
#: phrasing in this corpus, short enough to catch partial copies
NGRAM = 4
#: deterministic hash-sample rate that defines the stand-in eval set
EVAL_RATE = 0.05

_SQL_BUCKET = f"({sql_portable_hash60('CAST(doc_id AS VARCHAR)')} % {DENOM})"
_SQL_SHINGLES = sql_word_shingles("text", NGRAM)


def shingle_hashes(df: DataFrame, n: int = NGRAM) -> DataFrame:
    """(doc_id, sh_hash) rows — row-local explode + portable 60-bit
    hash, no UDF."""
    return df.select(
        "doc_id",
        F.explode(word_shingles("text", n)).alias("sh"),
    ).withColumn("sh_hash", portable_hash60(F.col("sh"))).drop("sh")


def eval_shingle_set(eval_docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """The broadcastable frozen banned-shingle set: distinct hashes of
    every n-gram in the eval docs."""
    return shingle_hashes(eval_docs, n).select("sh_hash").distinct()


def overlap_counts(
    docs: DataFrame, eval_hashes: DataFrame, n: int = NGRAM
) -> DataFrame:
    """Per-doc overlap counts against an ALREADY-HASHED banned set —
    the kernel both the batch query and the streaming view fold share.
    Per-doc counts are DOC-LOCAL (a doc's shingles all sit in its own
    row), so computing this per micro-batch and appending equals
    computing it one-shot — the property q_decontaminate_stream rests
    on."""
    return (
        shingle_hashes(docs, n)
        .join(F.broadcast(eval_hashes), "sh_hash")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh_hash").alias("n_overlap"))
    )


def contaminated_docs(
    docs: DataFrame, eval_docs: DataFrame, n: int = NGRAM
) -> DataFrame:
    """Per-doc overlap counts: (doc_id, n_overlap) for every doc in
    ``docs`` sharing >= 1 n-gram with ``eval_docs``.

    ``eval_docs`` is broadcast as a distinct set of shingle hashes; the
    big side sees one row-local explode + a map-side hash-join.
    """
    return overlap_counts(docs, eval_shingle_set(eval_docs, n), n)


#: q_decontaminate's oracle verbatim — the result the streaming
#: decontamination view (q_decontaminate_stream) must hash-match too.
SQL_DECONTAMINATE = f"""
    WITH sh AS (
        SELECT doc_id, {_SQL_BUCKET} AS bucket,
               unnest({_SQL_SHINGLES}) AS s
        FROM documents
    ),
    ev AS (
        SELECT DISTINCT {sql_portable_hash60('s')} AS sh_hash
        FROM sh WHERE bucket < {int(EVAL_RATE * DENOM)}
    ),
    tr AS (
        SELECT DISTINCT doc_id, {sql_portable_hash60('s')} AS sh_hash
        FROM sh WHERE bucket >= {int(EVAL_RATE * DENOM)}
    )
    SELECT tr.doc_id, COUNT(DISTINCT tr.sh_hash) AS n_overlap
    FROM tr JOIN ev USING (sh_hash)
    GROUP BY tr.doc_id
    """


@query("q_decontaminate", oracle=SQL_DECONTAMINATE)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs contaminated by {NGRAM}-gram overlap with the
    (deterministic 5%-sample) eval set, with overlap counts. The
    training pipeline drops these doc_ids before mixing."""
    d = read_table(spark, sf_dir, "documents")
    cut = int(EVAL_RATE * DENOM)
    bucket = hash_bucket(F.col("doc_id"))
    eval_docs = d.where(bucket < cut)
    train_docs = d.where(bucket >= cut)
    return contaminated_docs(train_docs, eval_docs, NGRAM)



# ---------------------------------------------------------------------------
# fuzzy decontamination via MinHash-LSH (round 8)
# ---------------------------------------------------------------------------
# Exact n-gram overlap misses paraphrased/partial contamination: a
# benchmark item lightly reworded shares few exact shingles but still
# leaks the answer. The fuzzy pass reuses the dedup engine's MinHash
# signatures: train docs sharing any LSH band bucket with an eval doc
# are candidates, verified with exact shingle Jaccard at a LOWER
# threshold than dedup (contamination review prefers recall).

#: verify threshold — deliberately below dedup's JACCARD_THRESHOLD
FUZZY_TAU = 0.5
#: the fuzzy pass carves a WIDER eval set than the exact pass: its
#: whole point is catching cross-set near-dups, which a 5% carve of
#: this synthetic corpus leaves too few of to exercise the operator
#: (probed at sf0.01: 5% -> 0 contaminated docs, 20% -> 7)
FUZZY_EVAL_RATE = 0.20


@query(
    "q_decontaminate_fuzzy",
    oracle=None,  # set below — composed from dedup's minhash fragments
)
def q_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination: training docs near-duplicating any eval
    doc (deterministic {FUZZY_EVAL_RATE:.0%} hash-carved eval set) under
    MinHash-LSH candidates + exact-Jaccard verify at tau={FUZZY_TAU}.
    Returns each contaminated train doc with how many eval docs it
    matches and the worst (max) Jaccard.

    Scale: one signature pass over the WHOLE corpus (shared by train
    and eval sides — signatures are subset-independent), the candidate
    join is train-bands x eval-bands on (band, bucket) with the same
    degenerate-bucket cap as dedup, and exact verification touches
    candidates only. Unlike the broadcast exact pass, nothing here
    assumes the eval set is small — both sides stream through the
    band-bucket shuffle, which is what a cross-benchmark sweep
    (contamination vs 100 eval sets at once) needs."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        MAX_BUCKET_SIZE,
        lsh_band_buckets,
        minhash_signatures,
    )
    from dynamodb_streaming_datalake_spark.functions.texthash import (
        word_shingles,
    )

    d = read_table(spark, sf_dir, "documents")
    cut = int(FUZZY_EVAL_RATE * DENOM)
    is_eval = hash_bucket(F.col("doc_id")) < cut

    # posting-list expansion with side tags (the round-17 LSH shape):
    # group band rows by (band, bucket), drop oversized buckets IN-ROW
    # (size counts BOTH sides, identical to the old cap aggregate), and
    # expand train x eval pairs in-row — one shuffle where the previous
    # shape paid cap-aggregate + anti-join + a two-sided self-join, and
    # the single-consumer lineage drops the localCheckpoint.
    groups = (
        lsh_band_buckets(minhash_signatures(d))
        .withColumn("is_eval", is_eval)
        .groupBy("band", "bucket")
        .agg(
            F.collect_list(
                F.struct(F.col("doc_id"), F.col("is_eval"))
            ).alias("ids")
        )
        .where(F.size("ids") <= MAX_BUCKET_SIZE)
    )
    pair_structs = F.expr(
        """
        flatten(transform(filter(ids, t -> NOT t.is_eval), t ->
            transform(filter(ids, e -> e.is_eval), e ->
                struct(t.doc_id AS train_id, e.doc_id AS eval_id))))
        """
    )
    cand = (
        groups.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.train_id"), F.col("p.eval_id"))
        .distinct()
    )
    arrs = d.select("doc_id", word_shingles("text").alias("arr"))
    jac = (
        F.size(F.array_intersect(F.col("pa.arr"), F.col("pb.arr")))
        / F.size(F.array_union(F.col("pa.arr"), F.col("pb.arr")))
    )
    verified = (
        cand.join(arrs.alias("pa"), F.col("train_id") == F.col("pa.doc_id"))
        .join(arrs.alias("pb"), F.col("eval_id") == F.col("pb.doc_id"))
        .select("train_id", "eval_id", jac.alias("jaccard"))
        .where(F.col("jaccard") >= FUZZY_TAU)
    )
    return verified.groupBy(F.col("train_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.round(F.max("jaccard"), 6).alias("max_jaccard"),
    )


def _register_fuzzy_oracle() -> None:
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        MAX_BUCKET_SIZE,
        _SQL_MH_BANDS,
        _SQL_MH_MINS,
        _SQL_SHINGLE_ROWS,
        MINHASH_P,
    )
    from dynamodb_streaming_datalake_spark.functions.texthash import (
        sql_word_shingles,
    )
    from dynamodb_streaming_datalake_spark.registry import ORACLE

    ORACLE["q_decontaminate_fuzzy"] = f"""
    WITH {_SQL_SHINGLE_ROWS},
    hs AS (
        SELECT doc_id, {sql_portable_hash60('sh')} % {MINHASH_P} AS h0
        FROM shingle_rows
    ),
    mh AS (SELECT doc_id, {_SQL_MH_MINS} FROM hs GROUP BY doc_id),
    all_bands AS ({_SQL_MH_BANDS}),
    small_buckets AS (
        SELECT band, bucket FROM all_bands
        GROUP BY band, bucket HAVING COUNT(*) <= {MAX_BUCKET_SIZE}
    ),
    bands AS (
        SELECT b.*, ({_SQL_BUCKET.replace('doc_id', 'b.doc_id')})
                      < {int(FUZZY_EVAL_RATE * DENOM)} AS is_eval
        FROM all_bands b JOIN small_buckets USING (band, bucket)
    ),
    cand AS (
        SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
        FROM bands t JOIN bands e
          ON t.band = e.band AND t.bucket = e.bucket
         AND NOT t.is_eval AND e.is_eval
    ),
    sh_arr AS (
        SELECT doc_id, {sql_word_shingles('text')} AS arr FROM documents
    ),
    verified AS (
        SELECT train_id, eval_id,
               len(list_intersect(pa.arr, pb.arr)) * 1.0
                 / len(list_distinct(list_concat(pa.arr, pb.arr))) AS jaccard
        FROM cand
        JOIN sh_arr pa ON pa.doc_id = train_id
        JOIN sh_arr pb ON pb.doc_id = eval_id
        WHERE len(list_intersect(pa.arr, pb.arr)) * 1.0
                / len(list_distinct(list_concat(pa.arr, pb.arr)))
              >= {FUZZY_TAU}
    )
    SELECT train_id AS doc_id,
           COUNT(*) AS n_eval_matches,
           round(MAX(jaccard), 6) AS max_jaccard
    FROM verified GROUP BY train_id
    """


_register_fuzzy_oracle()

_fmt(q_decontaminate, NGRAM=NGRAM)
_fmt(q_decontaminate_fuzzy, FUZZY_TAU=FUZZY_TAU, FUZZY_EVAL_RATE=FUZZY_EVAL_RATE)


# ---------------------------------------------------------------------------
# cross-source overlap matrix (round 12)
# ---------------------------------------------------------------------------
# Decontamination answers "does my TRAINING set leak my EVAL set"; a
# corpus owner mixing N crawl/source feeds needs the symmetric audit
# FIRST: how much content do the sources share with EACH OTHER? Two
# feeds that are 40% shingle-identical should not both get full mixture
# weight (double-counting), and a sudden overlap jump between feeds is
# the classic sign one started mirroring the other. The report is the
# pairwise source-overlap matrix over distinct 3-word shingle hashes:
# shared count and Jaccard per (source_a < source_b).
#
# Scale: the per-source shingle SETS are corpus-sized, but the pair
# expansion happens per shingle hash over the DISTINCT SOURCES sharing
# it — bounded by n_sources^2 per hash (n_sources is a small constant:
# tens of feeds, never corpus-sized), after one map-side-combined
# distinct. The same posting-list expansion as jaccard_pairs, with the
# posting lists capped by the source universe itself.


@query(
    "q_source_overlap",
    oracle=f"""
    WITH sh AS (
        SELECT DISTINCT source,
               {sql_portable_hash60('sh.s')} AS h
        FROM documents, unnest({sql_word_shingles('text', 3)}) sh(s)
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS shared
        FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT source_a, source_b,
           CAST(shared AS BIGINT) AS shared_shingles,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           round(shared * 1.0 / (sa.n + sb.n - shared), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    ORDER BY source_a, source_b
    """,
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix: for every pair of corpus feeds,
    the count of shared distinct 3-word shingle hashes and the Jaccard
    of their shingle sets — the double-counting / mirroring audit a
    corpus owner runs before assigning mixture weights (q_training_mix)
    to feeds that may be re-crawls of each other.

    Scale: one map-side-combined distinct over (source, hash), then
    the posting-list pair expansion per hash — output bounded by
    n_sources^2 per hash, and n_sources is a small constant (feeds,
    not documents), so the shuffle is the distinct, not the join."""
    d = read_table(spark, sf_dir, "documents")
    sh = (
        d.select("source", F.explode(word_shingles("text")).alias("s"))
        .select("source", portable_hash60(F.col("s")).alias("h"))
        .distinct()
    )
    # round 18: the r17 single-lineage form carried each source's size
    # as count(1) OVER (PARTITION BY source) — one task per source at
    # scale (a handful of feeds means a handful of tasks holding EVERY
    # distinct shingle of a source; guide §2.5/§5). The sizes are now a
    # two-phase groupBy (map-side partial, n_sources rows) derived from
    # the SAME postings aggregate the pairs read — both consumers sit
    # on one Exchange hashpartitioning(h) (ReusedExchange, verified in
    # the committed plan), so the explode+distinct subtree still runs
    # once and no join-back of the shingle stream exists. The sizes
    # attach to the PAIR AGGREGATE output (n_sources^2 rows) as two
    # broadcast joins. Pair expansion is two codegen explodes with
    # a < b (the q_assoc_rules round-18 shape) instead of the
    # interpreted transform/slice HOF.
    postings = sh.groupBy("h").agg(F.collect_list("source").alias("srcs"))
    sizes = (
        postings.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    pairs = (
        postings.select(F.explode("srcs").alias("a"), "srcs")
        .select("a", F.explode("srcs").alias("b"))
        .where(F.col("a") < F.col("b"))
        .groupBy(F.col("a").alias("source_a"), F.col("b").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.withColumnRenamed("source", "source_a")),
            "source_a",
        )
        .withColumnRenamed("n", "n_a")
        .join(
            F.broadcast(sizes.withColumnRenamed("source", "source_b")),
            "source_b",
        )
        .withColumnRenamed("n", "n_b")
        .select(
            "source_a",
            "source_b",
            F.col("shared").cast("bigint").alias("shared_shingles"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )
