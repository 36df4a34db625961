"""Deduplication suite for training-data pipelines.

Beyond the reference's key-level "dedupe in the Lake"
(``/root/reference/resources/firehose_transformation.py:16``, covered by
``operators.state``), a 100 TB corpus pipeline needs *content*
dedup. Five strategies over the ``documents`` table, cheapest first:

* exact (hash-groupBy) — one shuffle of (hash, id);
* n-gram Jaccard — exact pairwise similarity via shingle explode-join;
* MinHash + LSH banding — the scale path: candidates come from
  equality joins on band buckets (shuffle on bucket), never from an
  all-pairs product; the verify step only touches candidate pairs;
* SimHash — 60-bit fingerprints; near-dup candidates via band-equality
  joins + hamming distance;
* embedding cosine — near-dup by semantic similarity
  (see also ``operators.similarity`` for ANN top-k).

Every strategy is deterministic and oracle-checkable: hashing is
portable md5 (``functions.texthash``), and every cross-row aggregate is
order-independent (string MIN / integer SUM / exact-decimal SUM), so
results are identical regardless of partitioning — which is also what
makes them reproducible on a 1000-executor cluster.

Scale notes: the all-pairs exact-Jaccard query is quadratic in the
worst case and exists as the small-corpus baseline + LSH verifier; at
100 TB you run MinHash-LSH (bounded by band-bucket collision counts)
and cap ultra-common shingles (a frequency cutoff before the join)
to bound skew — the planted corpus here has no hot shingles, so the
cap is left out to keep Jaccard exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.functions.texthash import (
    portable_hash60,
    sql_portable_hash60,
    sql_word_shingles,
    word_shingles,
)
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

JACCARD_THRESHOLD = 0.5
MINHASH_SEEDS = 16
MINHASH_BANDS = 4
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_MAX_HAMMING = 8
EMBED_NEAR_DUP_COS = 0.4


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
@query(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup map: one row per distinct text, its cardinality and
    canonical (min) doc_id. Single hash-shuffle of (hash, id) pairs —
    the 100 TB-safe baseline."""
    d = read_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("keep_doc_id"),
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (baseline + LSH verifier)
# ---------------------------------------------------------------------------

_SQL_SHINGLE_ROWS = f"""
    shingle_rows AS (
        SELECT DISTINCT doc_id, unnest({sql_word_shingles('text')}) AS sh
        FROM documents
    ),
    shingle_sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM shingle_rows GROUP BY doc_id
    )
"""

_SQL_JACCARD_PAIRS = f"""
    WITH {_SQL_SHINGLE_ROWS},
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
        FROM shingle_rows a
        JOIN shingle_rows b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           c * 1.0 / (sa.n + sb.n - c) AS jaccard
    FROM common
    JOIN shingle_sizes sa ON sa.doc_id = doc_a
    JOIN shingle_sizes sb ON sb.doc_id = doc_b
    WHERE c * 1.0 / (sa.n + sb.n - c) > {JACCARD_THRESHOLD}
"""


def shingle_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) rows, distinct per doc."""
    return docs.select("doc_id", F.explode(word_shingles("text")).alias("sh"))


def jaccard_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """Exact 3-shingle Jaccard for every overlapping pair, thresholded.

    The intersect count and set sizes are integers, so the final single
    double division is engine-identical. Scale: quadratic only in docs
    *sharing a shingle*; for web-scale corpora add a shingle-frequency
    cap before the self-join and prefer ``minhash_lsh_pairs``.
    """
    sh = shingle_rows(docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    common = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        common.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (F.col("c") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") > threshold)
    )


@query("q_dedup_ngram_jaccard", oracle=_SQL_JACCARD_PAIRS)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return jaccard_pairs(d, JACCARD_THRESHOLD)


# ---------------------------------------------------------------------------
# MinHash + LSH banding (the scale path)
# ---------------------------------------------------------------------------

_ROWS_PER_BAND = MINHASH_SEEDS // MINHASH_BANDS

_SQL_MINHASH_PAIRS = f"""
    WITH {_SQL_SHINGLE_ROWS},
    mh AS (
        SELECT doc_id, seed.s AS seed,
               MIN(md5(seed.s::VARCHAR || '|' || sh)) AS minh
        FROM shingle_rows, (SELECT unnest(generate_series(0, {MINHASH_SEEDS - 1})) AS s) seed
        GROUP BY doc_id, seed.s
    ),
    bands AS (
        SELECT doc_id, seed // {_ROWS_PER_BAND} AS band,
               md5(string_agg(lpad(seed::VARCHAR, 2, '0') || ':' || minh, '|'
                              ORDER BY lpad(seed::VARCHAR, 2, '0') || ':' || minh)) AS bucket
        FROM mh GROUP BY doc_id, seed // {_ROWS_PER_BAND}
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
    ),
    sh_arr AS (SELECT doc_id, {sql_word_shingles('text')} AS arr FROM documents)
    SELECT doc_a, doc_b,
           len(list_intersect(pa.arr, pb.arr)) * 1.0
             / len(list_distinct(list_concat(pa.arr, pb.arr))) AS jaccard
    FROM cand
    JOIN sh_arr pa ON pa.doc_id = doc_a
    JOIN sh_arr pb ON pb.doc_id = doc_b
    WHERE len(list_intersect(pa.arr, pb.arr)) * 1.0
            / len(list_distinct(list_concat(pa.arr, pb.arr))) > {JACCARD_THRESHOLD}
"""


def minhash_signatures(docs: DataFrame, n_seeds: int = MINHASH_SEEDS) -> DataFrame:
    """(doc_id, seed, minh): minh = MIN over shingles of md5(seed|sh).

    MIN over strings is order-independent — signatures are identical on
    any partitioning. One shuffle: groupBy (doc_id, seed) with map-side
    partial MIN.
    """
    sh = shingle_rows(docs)
    seeds = docs.sparkSession.range(n_seeds).select(F.col("id").cast("int").alias("seed"))
    return (
        sh.join(F.broadcast(seeds))
        .select(
            "doc_id",
            "seed",
            F.md5(
                F.concat_ws("|", F.col("seed").cast("string"), F.col("sh"))
            ).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minh"))
    )


def lsh_band_buckets(signatures: DataFrame, rows_per_band: int = _ROWS_PER_BAND) -> DataFrame:
    """Fold each band's signature rows into one bucket id (md5 of the
    seed-ordered concat). Docs sharing any band bucket are candidates."""
    tag = F.concat_ws(
        ":", F.lpad(F.col("seed").cast("string"), 2, "0"), F.col("minh")
    )
    return (
        signatures.withColumn("band", F.expr(f"seed div {rows_per_band}"))
        .withColumn("tag", tag)
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("|", F.sort_array(F.collect_list("tag")))).alias("bucket"))
    )


def minhash_lsh_pairs(docs: DataFrame, threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Candidate pairs from band-bucket equality, verified with exact
    Jaccard on the candidates only.

    Scale: the self-join is on (band, bucket) — an equi-join whose
    output is bounded by per-bucket collision counts, not |docs|^2. The
    verify step computes array intersections for candidate pairs only.
    """
    buckets = lsh_band_buckets(minhash_signatures(docs))
    cand = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    arrs = docs.select("doc_id", word_shingles("text").alias("arr"))
    jac = (
        F.size(F.array_intersect(F.col("pa.arr"), F.col("pb.arr")))
        / F.size(F.array_union(F.col("pa.arr"), F.col("pb.arr")))
    )
    return (
        cand.join(arrs.alias("pa"), F.col("doc_a") == F.col("pa.doc_id"))
        .join(arrs.alias("pb"), F.col("doc_b") == F.col("pb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") > threshold)
    )


@query("q_dedup_minhash_lsh", oracle=_SQL_MINHASH_PAIRS)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d)


# ---------------------------------------------------------------------------
# SimHash fingerprints + banded near-dup pairs
# ---------------------------------------------------------------------------

_SQL_SIMHASH = f"""
    simhash AS (
        WITH toks AS (
            SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        votes AS (
            SELECT doc_id, b.bit AS bit,
                   SUM((({sql_portable_hash60('tok')} >> b.bit) & 1) * 2 - 1) AS v
            FROM toks, (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS bit) b
            GROUP BY doc_id, b.bit
        )
        SELECT doc_id,
               CAST(SUM(CASE WHEN v >= 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT)
                 AS fingerprint
        FROM votes GROUP BY doc_id
    )
"""


def simhash_fingerprints(docs: DataFrame, n_bits: int = SIMHASH_BITS) -> DataFrame:
    """60-bit SimHash per doc from distinct word tokens.

    Bit votes are integer SUMs (order-independent); the fingerprint
    assembly is a sum of distinct powers of two. Two shuffles, both with
    map-side combine: (doc, bit) votes, then (doc) assembly.
    """
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    ).withColumn("h", portable_hash60(F.col("tok")))
    bits = docs.sparkSession.range(n_bits).select(F.col("id").cast("int").alias("bit"))
    votes = (
        toks.join(F.broadcast(bits))
        .groupBy("doc_id", "bit")
        .agg(F.sum(F.expr("((shiftright(h, bit) & 1) * 2) - 1")).alias("v"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") >= 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("fingerprint")
    )


@query(
    "q_dedup_simhash",
    oracle=f"WITH {_SQL_SIMHASH} SELECT doc_id, fingerprint FROM simhash",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return simhash_fingerprints(d)


_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 15


@query(
    "q_dedup_simhash_pairs",
    oracle=f"""
    WITH {_SQL_SIMHASH},
    bands AS (
        SELECT doc_id, fingerprint, b.band AS band,
               (fingerprint >> (b.band * {_BAND_BITS})) & {(1 << _BAND_BITS) - 1} AS bval
        FROM simhash, (SELECT unnest(generate_series(0, {SIMHASH_BANDS - 1})) AS band) b
    )
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
           bit_count(xor(x.fingerprint, y.fingerprint)) AS hamming
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id
    WHERE bit_count(xor(x.fingerprint, y.fingerprint)) <= {SIMHASH_MAX_HAMMING}
    """,
)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates: equal 15-bit band (pigeonhole: hamming<=4
    guarantees a shared band; <=8 is caught with high probability),
    then exact popcount filter. All equi-joins — no quadratic stage."""
    d = read_table(spark, sf_dir, "documents")
    fp = simhash_fingerprints(d)
    bands = d.sparkSession.range(SIMHASH_BANDS).select(
        F.col("id").cast("int").alias("band")
    )
    banded = fp.join(F.broadcast(bands)).select(
        "doc_id",
        "fingerprint",
        "band",
        F.expr(
            f"(shiftright(fingerprint, band * {_BAND_BITS})) & {(1 << _BAND_BITS) - 1}"
        ).alias("bval"),
    )
    return (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bval") == F.col("y.bval"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.expr("bit_count(x.fingerprint ^ y.fingerprint)").alias("hamming"),
        )
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------
from dynamodb_streaming_datalake_spark.functions.texthash import (  # noqa: E402
    cosine,
    sql_cosine,
)


@query(
    "q_dedup_embedding",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({sql_cosine('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {sql_cosine('a.embedding', 'b.embedding')} > {EMBED_NEAR_DUP_COS}
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute-force all-pairs baseline).

    Scale: this quadratic form is the correctness baseline; the LSH
    route (``operators.similarity.q_ann_lsh``) is the 100 TB path.
    """
    e = read_table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    cos = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("raw_cos"),
        )
        .where(F.col("raw_cos") > EMBED_NEAR_DUP_COS)
        .select("vec_a", "vec_b", F.round("raw_cos", 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# end-to-end: apply dedup, keep survivors
# ---------------------------------------------------------------------------
@query(
    "q_dedup_apply",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id NOT IN (
        SELECT doc_b FROM ({_SQL_JACCARD_PAIRS})
    )
    """,
)
def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy dedup: drop the higher doc_id of every near-dup pair
    (anti-join against the pair list), keeping canonical docs."""
    d = read_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(d, JACCARD_THRESHOLD)
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return d.join(drops, "doc_id", "left_anti").select("doc_id", "lang", "source")
