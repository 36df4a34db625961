"""Text analysis operators for training-data pipelines.

Language ID (character-class heuristic), quality scoring, token
counting (whitespace + regex token classes), document fingerprinting,
and corpus-level language distribution — all as JVM-side column
expressions (regexp/higher-order functions), no Python in the hot path,
each with a DuckDB oracle.

Scale: every query here is embarrassingly parallel per document (map
only) or a partial+final aggregate; nothing shuffles more than the
aggregate keys.
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
from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

#: regex token classes: words | numbers | single punctuation
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


# ---------------------------------------------------------------------------
# per-document stats & quality score
# ---------------------------------------------------------------------------

_SW_LIST_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "q_text_stats",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS toks,
               len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_regex_tokens
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           n_chars,
           CAST(n_regex_tokens AS BIGINT) AS n_regex_tokens,
           n_chars * 1.0 / len(toks) AS chars_per_token,
           CAST(len(list_filter(toks, x -> x IN ({_SW_LIST_SQL}))) AS BIGINT)
             AS n_stopwords,
           len(list_filter(toks, x -> x IN ({_SW_LIST_SQL}))) * 1.0 / len(toks)
             AS stopword_ratio,
           round(least(len(toks) / 200.0, 1.0) * 0.7 +
                 least(len(list_filter(toks, x -> x IN ({_SW_LIST_SQL}))) * 1.0
                       / len(toks) / 0.2, 1.0) * 0.3, 6) AS quality_score
    FROM t
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts (whitespace + regex classes), stopword ratio, and a
    deterministic quality score (length component + stopword-rate
    component) — the classic pre-training quality filter features."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sw = F.filter(toks, lambda x: x.isin(*STOPWORDS))
    n_tokens = F.size(toks).cast("bigint")
    n_sw = F.size(sw).cast("bigint")
    quality = F.round(
        F.least(n_tokens / F.lit(200.0), F.lit(1.0)) * 0.7
        + F.least(n_sw * F.lit(1.0) / n_tokens / F.lit(0.2), F.lit(1.0)) * 0.3,
        6,
    )
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        "n_chars",
        F.regexp_count("text", F.lit(TOKEN_RE)).cast("bigint").alias("n_regex_tokens"),
        (F.col("n_chars") * F.lit(1.0) / F.size(toks)).alias("chars_per_token"),
        n_sw.alias("n_stopwords"),
        (n_sw * F.lit(1.0) / n_tokens).alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


# ---------------------------------------------------------------------------
# language identification (character-class heuristic)
# ---------------------------------------------------------------------------
@query(
    "q_text_langid",
    oracle=r"""
    SELECT doc_id, lang,
           CASE
             WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
             WHEN regexp_matches(text, '[áéíóúñ¿¡]') THEN 'es'
             WHEN regexp_matches(text, '[àâçèêëîïôùû]') THEN 'fr'
             WHEN regexp_matches(text, '[äöüß]') THEN 'de'
             ELSE 'en'
           END AS predicted_lang
    FROM documents
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-range language heuristic (CJK -> zh, diacritics ->
    es/fr/de, default en). On this synthetic ASCII corpus everything
    lands on 'en' — the point is the deterministic classifier plumbing;
    real corpora exercise the other branches (unit-tested in
    tests/test_text.py)."""
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", predicted_lang(F.col("text")).alias("predicted_lang"))


def predicted_lang(text_col) -> F.Column:
    return (
        F.when(text_col.rlike("[一-鿿]"), F.lit("zh"))
        .when(text_col.rlike("[áéíóúñ¿¡]"), F.lit("es"))
        .when(text_col.rlike("[àâçèêëîïôùû]"), F.lit("fr"))
        .when(text_col.rlike("[äöüß]"), F.lit("de"))
        .otherwise(F.lit("en"))
    )


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------
@query(
    "q_text_fingerprint",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({sql_word_shingles('text')}) AS s FROM documents
    )
    SELECT doc_id,
           MIN(md5(s)) AS fingerprint,
           COUNT(*) AS n_shingles
    FROM sh GROUP BY doc_id
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: the minimum shingle hash — a
    1-permutation MinHash usable as a cheap near-dup blocking key."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(word_shingles("text")).alias("s"))
        .groupBy("doc_id")
        .agg(
            F.min(F.md5("s")).alias("fingerprint"),
            F.count(F.lit(1)).alias("n_shingles"),
        )
    )


# ---------------------------------------------------------------------------
# corpus-level language/source distribution
# ---------------------------------------------------------------------------
@query(
    "q_lang_distribution",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
             AS total_tokens
    FROM documents
    GROUP BY lang, source
    """,
)
def q_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup — the first question asked of any
    training mix (per-language/source doc, char, token totals)."""
    d = read_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# repetition filters (Gopher/C4-style quality rules)
# ---------------------------------------------------------------------------
@query(
    "q_text_repetition",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               string_split(text, ' ') AS toks,
               {sql_word_shingles('text')} AS dsh
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
           round(1.0 - len(list_distinct(toks)) * 1.0 / len(toks), 6)
             AS token_rep_ratio,
           CAST(greatest(len(toks) - 2, 0) AS BIGINT) AS n_shingles,
           CAST(len(dsh) AS BIGINT) AS n_distinct_shingles,
           round(CASE WHEN len(toks) - 2 > 0
                 THEN 1.0 - len(dsh) * 1.0 / (len(toks) - 2) ELSE 0.0 END, 6)
             AS shingle_rep_ratio
    FROM t
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filters (the Gopher-rules quality signals): fraction
    of duplicate tokens and duplicate 3-gram shingles per document —
    high values flag boilerplate/spam for exclusion from training mixes.

    Scale: every metric is a row-local array expression (split /
    array_distinct / size) — a pure map over the corpus, no explode, no
    shuffle at all.
    """
    d = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tok = F.size(toks).cast("bigint")
    n_dtok = F.size(F.array_distinct(toks)).cast("bigint")
    n_sh = F.greatest(F.size(toks) - 2, F.lit(0)).cast("bigint")
    n_dsh = F.size(word_shingles("text")).cast("bigint")
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_dtok.alias("n_distinct_tokens"),
        F.round(1.0 - n_dtok * F.lit(1.0) / n_tok, 6).alias("token_rep_ratio"),
        n_sh.alias("n_shingles"),
        n_dsh.alias("n_distinct_shingles"),
        F.round(
            F.when(n_sh > 0, 1.0 - n_dsh * F.lit(1.0) / n_sh).otherwise(F.lit(0.0)), 6
        ).alias("shingle_rep_ratio"),
    )


# ---------------------------------------------------------------------------
# document chunking (overlapping token windows for sequence prep)
# ---------------------------------------------------------------------------

#: tokens per chunk / stride between chunk starts (16-token overlap)
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


@query(
    "q_doc_chunks",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    starts AS (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks), {CHUNK_STRIDE}))
               AS start
        FROM t
    )
    SELECT doc_id,
           CAST((start - 1) / {CHUNK_STRIDE} AS INT) AS chunk_id,
           CAST(len(list_slice(toks, start, start + {CHUNK_TOKENS} - 1))
                AS BIGINT) AS chunk_tokens,
           array_to_string(list_slice(toks, start, start + {CHUNK_TOKENS} - 1),
                           ' ') AS chunk_text
    FROM starts
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the sequence-prep step that
    turns variable-length documents into model-sized pieces
    ({tokens} tokens, stride {stride}, so consecutive
    chunks share {overlap} tokens of context). The final (short) chunk is
    kept: training pipelines pad it, they don't drop it.

    Scale: entirely row-local — sequence + posexplode-style expansion
    inside the row, slice + join as array HOFs, no UDF, no shuffle.
    Output volume is input tokens x (chunk/stride) ~ 1.33x, the
    standard overlap cost."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    t = d.select("doc_id", toks.alias("toks"), F.explode(starts).alias("start"))
    chunk = F.slice(F.col("toks"), F.col("start"), CHUNK_TOKENS)
    return t.select(
        "doc_id",
        ((F.col("start") - 1) / F.lit(CHUNK_STRIDE)).cast("int").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# keep the docstring's geometry tied to the constants (rendered by the
# shared guarded helper; the other _fmt calls live at module end)

_fmt(
    q_doc_chunks,
    tokens=CHUNK_TOKENS,
    stride=CHUNK_STRIDE,
    overlap=CHUNK_TOKENS - CHUNK_STRIDE,
)


# ---------------------------------------------------------------------------
# TF-IDF term ranking (round 5)
# ---------------------------------------------------------------------------

TFIDF_TOP_TERMS = 3


@query(
    "q_tfidf_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0)
                 AS score
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, round(score, 6) AS tfidf
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
        FROM scored
    ) WHERE rnk <= {TFIDF_TOP_TERMS}
    """,
)
def q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} TF-IDF terms per document — the classic retrieval /
    quality-signal scoring (smooth idf = ln((N+1)/(df+1)) + 1, the
    sklearn convention). Identical double math in both engines: tf and
    df are exact integers, N is exact, and one ln + one multiply per
    (doc, term) round-trips through round(6).

    Scale: tf is one (doc_id, term) partial+final aggregate; df is a
    second aggregate over the (already small) tf frame; the df side of
    the score join is vocabulary-sized — broadcast at any corpus scale
    where vocab << corpus (always, for word-level terms). The final
    top-k is a per-doc window over ≤ vocab rows per doc.
    """
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * (
                F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TFIDF_TOP_TERMS)
        .select("doc_id", "term", "tf", F.round("score", 6).alias("tfidf"))
    )


# ---------------------------------------------------------------------------
# frequency heavy hitters: Misra-Gries candidates + exact verify (round 5)
# ---------------------------------------------------------------------------

HH_K = 40  #: report tokens with frequency > N/HH_K


def misra_gries_candidates(toks: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: at most ``k`` surviving
    candidates per partition, guaranteed to include every item with
    partition frequency > N_p/(k+1) — hence (pigeonhole) every GLOBAL
    heavy hitter with frequency > N/k survives in at least one
    partition. State is k counters per partition regardless of
    cardinality; the per-batch update is a value_counts merge (loop is
    vocabulary-bounded, not row-bounded) with the standard
    decrement-all eviction."""
    import pandas as pd

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for item, c in pdf[col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            while len(counters) > k:
                dec = min(counters.values())
                counters = {t: v - dec for t, v in counters.items() if v > dec}
        if counters:
            yield pd.DataFrame({col: list(counters)})

    return toks.select(col).mapInPandas(mg, schema=f"{col} string").distinct()


@query(
    "q_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM toks)
    SELECT token, COUNT(*) AS cnt,
           round(COUNT(*) * 1.0 / (SELECT n FROM tot), 6) AS share
    FROM toks GROUP BY token
    HAVING COUNT(*) > (SELECT n FROM tot) / {HH_K}.0
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency heavy hitters over the token stream — vocabulary items
    with frequency > N/{k} — via the two-pass sketch pattern that works
    at unbounded cardinality: (1) per-partition Misra-Gries keeps ≤ k
    counters and provably never drops a global heavy hitter; (2) the
    candidate set (≤ k x partitions rows) broadcast-semi-joins the
    stream for an EXACT recount, so the output is exactly the true
    hitters — the sketch only bounds state, it never decides the
    answer. The oracle is the plain exact SQL, which is the point.

    Scale: at 100 TB the naive groupBy shuffles the full vocabulary
    (trillions of n-gram keys); here the shuffle after the map-side
    sketch is ≤ k rows per partition, and the recount aggregates only
    candidate keys (map-side combining on a broadcast-filtered scan).
    """
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("token"))
    cands = misra_gries_candidates(toks, "token", HH_K)
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        toks.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") > F.col("n_total") / F.lit(float(HH_K)))
        .select(
            "token",
            "cnt",
            F.round(F.col("cnt") / F.col("n_total"), 6).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# content-defined chunking (round 5): rolling-hash boundaries
# ---------------------------------------------------------------------------

CDC_WINDOW = 4  #: tokens per boundary-test shingle
CDC_MASK = 16  #: boundary when shingle_hash % CDC_MASK == 0 (~avg chunk)
CDC_MIN_START = 5  #: no boundary inside the first tokens (min chunk size)


@query(
    "q_doc_cdc_chunks",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, tok, pos
        FROM (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents
        )
    ),
    sh AS (
        SELECT doc_id, pos, tok,
               string_agg(tok, ' ') OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN {CDC_WINDOW - 1} PRECEDING AND CURRENT ROW
               ) AS win,
               COUNT(*) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN {CDC_WINDOW - 1} PRECEDING AND CURRENT ROW
               ) AS wlen
        FROM toks
    ),
    marks AS (
        SELECT doc_id, pos, tok,
               CASE WHEN wlen = {CDC_WINDOW} AND pos > {CDC_MIN_START}
                         AND ('0x' || substr(md5(win), 1, 15))::BIGINT
                             % {CDC_MASK} = 0
                    THEN 1 ELSE 0 END AS boundary
        FROM sh
    ),
    chunked AS (
        SELECT doc_id, pos, tok,
               SUM(boundary) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS chunk_id
        FROM marks
    )
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(COUNT(*) AS BIGINT) AS chunk_tokens,
           md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
    FROM chunked
    GROUP BY doc_id, chunk_id
    """,
)
def q_doc_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking — the storage-dedup primitive (LBFS/
    restic-style): a chunk boundary falls wherever the rolling hash of
    the last CDC_WINDOW=4 tokens satisfies hash % CDC_MASK=16 == 0, so
    chunk edges are
    ANCHORED TO CONTENT, not offsets. Insert one token at the front of
    a document and fixed-size chunking shifts every chunk; CDC re-syncs
    at the next boundary, so downstream exact-hash dedup still matches
    every untouched chunk (pinned in tests/test_text.py).

    Per chunk: token count + md5 — the dedup key a chunk store would
    use. Boundary hash is the portable md5-prefix hash (identical in
    Spark, DuckDB, and hashlib); a minimum chunk prefix keeps
    degenerate 1-token chunks out.

    Scale: tokenize + posexplode are row-local; the shingle window,
    boundary marks, and the cumulative chunk id are ONE window
    partitioned by doc_id (documents are the natural parallelism
    unit), then one (doc_id, chunk_id) aggregate — two shuffles total,
    both on the document key, no cross-document traffic at all.
    """
    from pyspark.sql import Window

    from dynamodb_streaming_datalake_spark.functions.texthash import (
        portable_hash60,
    )

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    ww = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(CDC_WINDOW - 1), 0)
    )
    sh = toks.select(
        "doc_id",
        "pos",
        "tok",
        F.array_join(F.collect_list("tok").over(ww), " ").alias("win"),
        F.count(F.lit(1)).over(ww).alias("wlen"),
    )
    marks = sh.select(
        "doc_id",
        "pos",
        "tok",
        F.when(
            (F.col("wlen") == CDC_WINDOW)
            & (F.col("pos") > CDC_MIN_START)
            & (portable_hash60(F.col("win")) % CDC_MASK == 0),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("boundary"),
    )
    wc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    chunked = marks.select(
        "doc_id",
        "pos",
        "tok",
        F.sum("boundary").over(wc).alias("chunk_id"),
    )
    return (
        chunked.groupBy("doc_id", F.col("chunk_id").cast("int").alias("chunk_id"))
        .agg(
            F.count(F.lit(1)).alias("chunk_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                        lambda x: x["tok"],
                    ),
                    " ",
                )
            ).alias("chunk_hash"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (round 6)
# ---------------------------------------------------------------------------

#: literal query term set — a fixed ad-hoc search, mixing high- and
#: low-df corpus terms so the idf spread actually matters
BM25_TERMS = ("scan", "merge", "vector", "spark")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 50

_SQL_BM25_TERMS = ", ".join(f"'{t}'" for t in BM25_TERMS)

#: the shared BM25 scoring CTE chain (ends in ``scored(doc_id, score)``)
#: — used by q_bm25_search and composed into q_hybrid_search's oracle
SQL_BM25_SCORED = f"""
    toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY doc_id),
    stats AS (
        SELECT COUNT(*) AS n_docs, AVG(dlen * 1.0) AS avgdl FROM dl
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks
        WHERE term IN ({_SQL_BM25_TERMS})
        GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               SUM(
                   ln(1.0 + (stats.n_docs - dfreq.df + 0.5)
                            / (dfreq.df + 0.5))
                   * tf.tf * ({BM25_K1} + 1.0)
                   / (tf.tf + {BM25_K1}
                      * (1.0 - {BM25_B}
                         + {BM25_B} * dl.dlen / stats.avgdl))
               ) AS score
        FROM tf
        JOIN dfreq USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY tf.doc_id
    )
"""


def bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 scoring pipeline shared by q_bm25_search and
    q_hybrid_search: returns ``(doc_id, score)`` for every document
    matching at least one query term. Mirrors SQL_BM25_SCORED 1:1."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dlen") * F.lit(1.0)).alias("avgdl"),
    )
    tf = (
        toks.where(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * F.col("tf")
                * F.lit(BM25_K1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1.0 - BM25_B)
                        + F.lit(BM25_B) * F.col("dlen") / F.col("avgdl")
                    )
                )
            ).alias("score")
        )
    )


@query(
    "q_bm25_search",
    oracle=f"""
    WITH {SQL_BM25_SCORED}
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {BM25_TOP}
    """,
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ad-hoc retrieval — the lexical ranking function behind
    Lucene/Elasticsearch, over the documents table for a fixed query
    term set: idf = ln(1 + (N - df + .5)/(df + .5)) (the Robertson
    formulation every engine ships), tf saturation k1={BM25_K1},
    length normalization b={BM25_B} against the corpus average doc
    length. Global top-{BM25_TOP} by (score, doc_id).

    Identical double formula on both engines; ties under round(6) break
    on doc_id (same accepted libm-ulp risk class as q_tfidf_terms).

    Scale: tf restricts the exploded token stream to the literal query
    terms BEFORE any shuffle (a handful of rows per doc survive); df is
    a |terms|-row aggregate; N and avgdl are one single-row aggregate
    crossed in (broadcast, never collected); the final top-k is a
    TakeOrdered, not a global sort."""
    return (
        bm25_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOP)
        .select("doc_id", F.round("score", 6).alias("bm25"))
    )



# ---------------------------------------------------------------------------
# hashed linear classifier inference (round 6)
# ---------------------------------------------------------------------------

#: hashed feature buckets (the "hashing trick" — vocabulary-free)
QC_BUCKETS = 64
#: weights live in integer millis so inference is EXACT integer math

_SQL_QC_HASH = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


#: reusable oracle fragment: per-doc classifier logits (shared with the
#: keep-best-of-cluster dedup, operators/dedup.py)
SQL_QC_LOGITS = f"""
    qc_weights AS (
        SELECT j,
               ({_SQL_QC_HASH.format(x="'w_' || CAST(j AS VARCHAR)")}
                % 2001 - 1000) AS w_millis
        FROM range(0, {QC_BUCKETS}) t(j)
    ),
    qc_toks AS (
        SELECT doc_id,
               {_SQL_QC_HASH.format(x='tok')} % {QC_BUCKETS} AS j
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
    ),
    qc_logits AS (
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(w.w_millis) AS BIGINT) AS logit_millis
        FROM qc_toks t JOIN qc_weights w ON w.j = t.j
        GROUP BY t.doc_id
    )
"""


def quality_logits(d: DataFrame) -> DataFrame:
    """Per-document hashed-linear-classifier logits (integer millis):
    (doc_id, n_tokens, logit_millis). The inference kernel behind
    q_quality_classifier, reused by the keep-best-of-cluster dedup."""
    from dynamodb_streaming_datalake_spark.functions.texthash import (
        portable_hash60,
    )

    spark = d.sparkSession
    weights = (
        spark.range(QC_BUCKETS)
        .select(F.col("id").alias("j"))
        .select(
            "j",
            (
                portable_hash60(F.concat(F.lit("w_"), F.col("j").cast("string")))
                % 2001
                - 1000
            ).alias("w_millis"),
        )
    )
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).select("doc_id", (portable_hash60(F.col("tok")) % QC_BUCKETS).alias("j"))
    return (
        toks.join(F.broadcast(weights), "j")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_millis").alias("logit_millis"),
        )
    )


@query(
    "q_quality_classifier",
    oracle=f"""
    WITH {SQL_QC_LOGITS}
    SELECT doc_id, n_tokens, logit_millis, logit_millis > 0 AS keep
    FROM qc_logits
    """,
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier inference with the hashing trick — the
    fastText-shaped scorer production pipelines run over every crawl
    document: token -> hashed feature bucket (j = h(tok) % {QC_BUCKETS},
    vocabulary-free so unseen tokens never fail), one weight per
    bucket, document logit = sum of its tokens' weights, keep = logit
    > 0. The weights here are a deterministic fixture (h('w_'||j),
    replayable by the oracle) standing in for trained parameters — the
    part that matters at scale is the inference plumbing, which is the
    real thing: weights broadcast ({QC_BUCKETS} rows), scoring is one
    equi-join + map-side-combining sum, zero Python.

    Exactness: weights are integer millis, the logit is an integer sum
    — no float anywhere, so the hash comparison cannot wobble.

    Scale: the only shuffle is the (doc_id) final aggregate; weight
    lookup is a broadcast join against a constant-size table. Swapping
    in real trained weights = replacing one small DataFrame."""
    d = read_table(spark, sf_dir, "documents")
    return quality_logits(d).select(
        "doc_id",
        "n_tokens",
        "logit_millis",
        (F.col("logit_millis") > 0).alias("keep"),
    )



_fmt(q_tfidf_terms, k=TFIDF_TOP_TERMS)
_fmt(q_heavy_hitters, k=HH_K)
_fmt(q_bm25_search, BM25_K1=BM25_K1, BM25_B=BM25_B, BM25_TOP=BM25_TOP)
_fmt(q_quality_classifier, QC_BUCKETS=QC_BUCKETS)


# ---------------------------------------------------------------------------
# distinctive terms per source (round 9)
# ---------------------------------------------------------------------------
# The corpus-exploration pass behind topic labeling (the c-TF-IDF idea,
# log-free): a term is distinctive for a source when its in-source
# frequency share beats its corpus-wide share. lift = (tf_s / n_s) /
# (tf / n) is a ratio of exact integer counts — one fixed-shape double
# expression, so it sits under the hash gate where IDF's log() (not
# cross-engine correctly-rounded) could not.

DIST_TOP_PER_SOURCE = 5
#: terms must appear at least this often corpus-wide to be rankable
#: (rare-term lifts are noise and would dominate otherwise)
DIST_MIN_CORPUS_TF = 20


@query(
    "q_distinctive_terms",
    oracle=f"""
    WITH words AS (
        SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    w AS (SELECT source, word FROM words WHERE word <> ''),
    per_source AS (
        SELECT source, word, COUNT(*) AS tf_s FROM w GROUP BY source, word
    ),
    source_tot AS (
        SELECT source, COUNT(*) AS n_s FROM w GROUP BY source
    ),
    corpus AS (
        SELECT word, COUNT(*) AS tf FROM w GROUP BY word
        HAVING COUNT(*) >= {DIST_MIN_CORPUS_TF}
    ),
    tot AS (SELECT COUNT(*) AS n FROM w),
    lifted AS (
        SELECT p.source, p.word,
               CAST(p.tf_s AS BIGINT) AS tf_source,
               CAST(c.tf AS BIGINT) AS tf_corpus,
               round((CAST(p.tf_s AS DOUBLE) / s.n_s)
                     / (CAST(c.tf AS DOUBLE) / t.n), 6) AS lift
        FROM per_source p
        JOIN source_tot s USING (source)
        JOIN corpus c USING (word)
        CROSS JOIN tot t
    )
    SELECT source, word, tf_source, tf_corpus, lift,
           CAST(rnk AS INT) AS rnk
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY lift DESC, word) AS rnk
        FROM lifted
    )
    WHERE rnk <= {DIST_TOP_PER_SOURCE}
    ORDER BY source, rnk
    """,
)
def q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{DIST_TOP_PER_SOURCE} distinctive terms per crawl source by
    frequency lift — (in-source term share) / (corpus term share) —
    over terms with at least {DIST_MIN_CORPUS_TF} corpus occurrences.
    The log-free c-TF-IDF: a pure ratio of integer counts (one double
    expression, rounded), so it is hash-exact where an IDF log() would
    not be cross-engine reproducible.

    Scale: one explode + two map-side-combined aggregates (per-source
    and corpus term counts), a broadcast of the per-source totals, and
    a per-source top-k window — the same profile as q_tfidf_terms."""
    d = read_table(spark, sf_dir, "documents")
    w = d.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    # hierarchical aggregation (round 17): (source, word) is the finest
    # grain, so the explode is aggregated ONCE (map-side combined) and
    # every coarser count — per-source totals, corpus term counts, the
    # grand total — is a SUM over the small per_source frame instead of
    # a separate pass over the exploded stream (which previously needed
    # a localCheckpoint to avoid being recomputed four times).
    per_source = w.groupBy("source", "word").agg(
        F.count(F.lit(1)).alias("tf_s")
    )
    per_source = per_source.localCheckpoint(eager=False)
    source_tot = per_source.groupBy("source").agg(
        F.sum("tf_s").alias("n_s")
    )
    corpus = (
        per_source.groupBy("word")
        .agg(F.sum("tf_s").alias("tf"))
        .where(F.col("tf") >= DIST_MIN_CORPUS_TF)
    )
    tot = per_source.agg(F.sum("tf_s").alias("n"))
    lift = F.round(
        (F.col("tf_s").cast("double") / F.col("n_s"))
        / (F.col("tf").cast("double") / F.col("n")),
        6,
    )
    lifted = (
        per_source.join(F.broadcast(source_tot), "source")
        .join(corpus, "word")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "word",
            F.col("tf_s").cast("bigint").alias("tf_source"),
            F.col("tf").cast("bigint").alias("tf_corpus"),
            lift.alias("lift"),
        )
    )
    from pyspark.sql import Window

    rnk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("lift").desc(), "word")
    )
    return (
        lifted.withColumn("rnk", rnk.cast("int"))
        .where(F.col("rnk") <= DIST_TOP_PER_SOURCE)
        .orderBy("source", "rnk")
    )


_fmt(
    q_distinctive_terms,
    DIST_TOP_PER_SOURCE=DIST_TOP_PER_SOURCE,
    DIST_MIN_CORPUS_TF=DIST_MIN_CORPUS_TF,
)


# ---------------------------------------------------------------------------
# vocabulary growth curve — Heaps'-law audit (round 11)
# ---------------------------------------------------------------------------
# "How much NEW vocabulary does each additional quarter of the corpus
# buy" — the corpus-expansion question behind dedup thresholds and
# tokenizer vocab sizing: a healthy crawl keeps minting types
# (Heaps-law growth); a heavily duplicated or templated corpus
# flatlines. Prefixes are quarters of the doc_id RANGE (1-row
# min/max arithmetic — no global sort, no window), per-word first
# appearance is one MIN aggregate, and every curve point is a
# conditional integer count — engine-exact throughout.

VG_QUARTERS = 4


@query(
    "q_vocab_growth",
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents
    ),
    docs AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        FROM documents
    ),
    firsts AS (
        SELECT w, MIN(doc_id) AS f
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY w
    ),
    cuts AS (
        SELECT k, b.lo + (b.hi - b.lo + 1) * k // {VG_QUARTERS} AS cut
        FROM (SELECT UNNEST(range(1, {VG_QUARTERS + 1})) AS k), bounds b
    ),
    vocab AS (
        SELECT c.k,
               CAST(COUNT(*) FILTER (WHERE fs.f < c.cut) AS BIGINT)
                 AS vocab
        FROM cuts c, firsts fs GROUP BY c.k
    ),
    vol AS (
        SELECT c.k,
               CAST(COUNT(*) FILTER (WHERE d.doc_id < c.cut) AS BIGINT)
                 AS n_docs,
               CAST(SUM(CASE WHEN d.doc_id < c.cut THEN d.n_toks
                             ELSE 0 END) AS BIGINT) AS n_tokens
        FROM cuts c, docs d GROUP BY c.k
    )
    SELECT CAST(v.k AS INT) AS quarter,
           vol.n_docs, vol.n_tokens, v.vocab,
           CAST(v.vocab - COALESCE(LAG(v.vocab) OVER (ORDER BY v.k), 0)
                AS BIGINT) AS new_types,
           round(CAST(v.vocab AS DOUBLE) / vol.n_tokens, 6)
             AS type_token_ratio
    FROM vocab v JOIN vol ON vol.k = v.k
    ORDER BY quarter
    """,
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth over corpus prefixes: distinct word types,
    token volume, NEW types minted, and type-token ratio at each
    quarter of the doc_id range — the Heaps'-law curve that says
    whether more crawl keeps buying new vocabulary (healthy) or the
    corpus has gone templated/duplicated (flat). Prefix cutoffs are
    pure 1-row min/max arithmetic, per-word first appearance is one
    MIN aggregate, every curve point a conditional integer count.

    Scale: one token explode into a map-side-combined MIN per word
    (vocabulary-sized result), one doc-level aggregate — no global
    sort, no window over data-sized frames; the curve itself is
    {VG_QUARTERS} rows."""
    d = read_table(spark, sf_dir, "documents")
    bounds = d.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    firsts = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("f"))
    )
    cuts = (
        spark.range(1, VG_QUARTERS + 1)
        .select(F.col("id").cast("int").alias("k"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "k",
            F.expr(
                f"lo + (hi - lo + 1) * k div {VG_QUARTERS}"
            ).alias("cut"),
        )
    )
    vocab = (
        firsts.crossJoin(F.broadcast(cuts))
        .groupBy("k")
        .agg(
            F.count(F.when(F.col("f") < F.col("cut"), 1))
            .cast("bigint")
            .alias("vocab")
        )
    )
    vol = (
        d.select("doc_id", F.size(F.split("text", " ")).alias("n_toks"))
        .crossJoin(F.broadcast(cuts))
        .groupBy("k")
        .agg(
            F.count(F.when(F.col("doc_id") < F.col("cut"), 1))
            .cast("bigint")
            .alias("n_docs"),
            F.sum(
                F.when(F.col("doc_id") < F.col("cut"), F.col("n_toks"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    from pyspark.sql.window import Window

    w = F.lag("vocab").over(Window.orderBy("k"))
    return (
        vocab.join(vol, "k")
        .select(
            F.col("k").cast("int").alias("quarter"),
            "n_docs",
            "n_tokens",
            "vocab",
            (F.col("vocab") - F.coalesce(w, F.lit(0)))
            .cast("bigint")
            .alias("new_types"),
            F.round(
                F.col("vocab").cast("double") / F.col("n_tokens"), 6
            ).alias("type_token_ratio"),
        )
        .orderBy("quarter")
    )


_fmt(q_vocab_growth, VG_QUARTERS=VG_QUARTERS)


# ---------------------------------------------------------------------------
# n-gram novelty between corpus halves (round 11)
# ---------------------------------------------------------------------------
# The continual-pretraining freshness question: of the 3-gram shingles
# in the NEWER half of the corpus, what fraction was never seen in the
# older half? High novelty = the new crawl carries new content worth
# training on; novelty near zero = it is re-crawling what the model
# already saw (and the dedup pipeline's problem, not the trainer's).
# Same doc_id-range split arithmetic as q_vocab_growth, same shingle
# contract as the dedup family, and the novelty check is one anti-style
# LEFT JOIN on the shingle key — the decontamination shape pointed at
# freshness instead of leakage.


@query(
    "q_ngram_novelty",
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(doc_id) AS lo,
               MIN(doc_id) + (MAX(doc_id) - MIN(doc_id) + 1) // 2 AS mid
        FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest({sql_word_shingles('text')}) AS s
        FROM documents
    ),
    ref AS (
        SELECT DISTINCT s FROM sh, bounds b WHERE sh.doc_id < b.mid
    ),
    cur AS (
        SELECT DISTINCT d.source, sh.s
        FROM sh JOIN documents d ON d.doc_id = sh.doc_id, bounds b
        WHERE sh.doc_id >= b.mid
    ),
    curdocs AS (
        SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents d, bounds b WHERE d.doc_id >= b.mid
        GROUP BY d.source
    ),
    flagged AS (
        SELECT c.source, c.s, r.s IS NOT NULL AS seen
        FROM cur c LEFT JOIN ref r ON r.s = c.s
    ),
    nov AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS distinct_shingles,
               CAST(COUNT(*) FILTER (WHERE NOT seen) AS BIGINT)
                 AS novel_shingles
        FROM flagged GROUP BY source
    )
    SELECT n.source, cd.n_docs, n.distinct_shingles, n.novel_shingles,
           round(CAST(n.novel_shingles AS DOUBLE) / n.distinct_shingles, 6)
             AS novelty_rate
    FROM nov n JOIN curdocs cd ON cd.source = n.source
    ORDER BY n.source
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source 3-gram novelty of the newer corpus half against the
    older half (halves = doc_id-range split, 1-row arithmetic): the
    fraction of the new half's distinct shingles never seen before.
    The freshness signal continual pretraining decisions rest on —
    near-zero novelty means the crawl is re-collecting known content.

    Scale: two distinct-shingle projections and ONE equi-join on the
    shingle key (the decontamination join shape); per-source counts
    are map-side-combined."""
    d = read_table(spark, sf_dir, "documents")
    bounds = d.agg(
        F.min("doc_id").alias("lo"),
        (
            F.min("doc_id")
            + F.expr("(max(doc_id) - min(doc_id) + 1) div 2")
        ).alias("mid"),
    )
    sh = d.select(
        "doc_id",
        "source",
        F.explode(word_shingles("text")).alias("s"),
    ).crossJoin(F.broadcast(bounds))
    ref = (
        sh.where(F.col("doc_id") < F.col("mid")).select("s").distinct()
    )
    cur = (
        sh.where(F.col("doc_id") >= F.col("mid"))
        .select("source", "s")
        .distinct()
    )
    curdocs = (
        d.crossJoin(F.broadcast(bounds))
        .where(F.col("doc_id") >= F.col("mid"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    flagged = cur.join(
        ref.withColumn("seen", F.lit(1)), "s", "left"
    )
    nov = flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("distinct_shingles"),
        F.count(F.when(F.col("seen").isNull(), 1))
        .cast("bigint")
        .alias("novel_shingles"),
    )
    return (
        nov.join(curdocs, "source")
        .select(
            "source",
            "n_docs",
            "distinct_shingles",
            "novel_shingles",
            F.round(
                F.col("novel_shingles").cast("double")
                / F.col("distinct_shingles"),
                6,
            ).alias("novelty_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction (round 11)
# ---------------------------------------------------------------------------
# Rapid Automatic Keyword Extraction: candidate phrases are maximal
# stopword-free word runs; a word's score is degree/frequency over the
# phrase-word graph (degree = total length of phrases it appears in),
# a phrase's score the sum of its words' scores. The corpus-level
# keyword surfacing used for document tagging and search facets.
# Scores quantize to scale-6 integers via integral division (exact in
# both engines), so phrase scores are exact integer sums — no float
# ever crosses rows.

RAKE_TOP = 3


def _rake_phrases_sql() -> str:
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
    phrases AS (
        SELECT DISTINCT doc_id, trim(p) AS phrase
        FROM (
            SELECT doc_id,
                   unnest(string_split(array_to_string(
                       list_transform(string_split(text, ' '),
                           w -> CASE WHEN w IN ({sw}) THEN '|' ELSE w END),
                       ' '), '|')) AS p
            FROM documents
        )
        WHERE trim(p) <> ''
    )"""


@query(
    "q_rake_keywords",
    oracle=f"""
    WITH {{RAKE_PHRASES}},
    pw AS (
        SELECT doc_id, phrase,
               len(string_split(phrase, ' ')) AS plen,
               unnest(string_split(phrase, ' ')) AS w
        FROM phrases
    ),
    stats AS (
        SELECT w,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(plen) AS BIGINT) AS deg
        FROM pw GROUP BY w
    ),
    scored AS (
        SELECT p.doc_id, p.phrase,
               CAST(len(string_split(p.phrase, ' ')) AS BIGINT) AS n_words,
               SUM(s.deg * 1000000 // s.freq) AS score_fp
        FROM pw p JOIN stats s ON s.w = p.w
        GROUP BY p.doc_id, p.phrase
    ),
    ranked AS (
        SELECT doc_id, phrase, n_words, score_fp,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY score_fp DESC, phrase
               ) AS rk
        FROM scored
    )
    SELECT doc_id, CAST(rk AS INT) AS rank, phrase, n_words,
           round(CAST(score_fp AS DOUBLE) / 1000000, 6) AS rake_score
    FROM ranked WHERE rk <= {RAKE_TOP}
    ORDER BY doc_id, rank
    """.replace("{RAKE_PHRASES}", _rake_phrases_sql()),
)
def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction: top-{RAKE_TOP} stopword-free phrases
    per document, scored by the sum of their words' degree/frequency
    ratios over the corpus phrase-word graph. Word scores quantize to
    scale-6 integers by integral division (identical truncation in
    both engines), so phrase scores are exact integer sums and the
    ranking is engine-exact; ties break on the phrase text.

    Scale: phrase extraction is row-local array algebra; word stats
    are one vocabulary-sized map-side-combined aggregate; scoring is
    one equi-join of phrase words against that vocabulary and the
    per-doc window ranks a handful of phrases per document."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    marked = F.transform(
        toks,
        lambda w: F.when(w.isin(*STOPWORDS), F.lit("|")).otherwise(w),
    )
    phrases = (
        d.select(
            "doc_id",
            F.explode(
                F.split(F.array_join(marked, " "), "\\|")
            ).alias("p"),
        )
        .select("doc_id", F.trim("p").alias("phrase"))
        .where(F.col("phrase") != "")
        .distinct()
    )
    pw = phrases.select(
        "doc_id",
        "phrase",
        F.size(F.split("phrase", " ")).alias("plen"),
        F.explode(F.split("phrase", " ")).alias("w"),
    )
    stats = pw.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("deg"),
    )
    scored = (
        pw.join(stats, "w")
        .groupBy("doc_id", "phrase")
        .agg(
            F.first(F.size(F.split("phrase", " ")))
            .cast("bigint")
            .alias("n_words"),
            F.sum(F.expr("deg * 1000000 div freq")).alias("score_fp"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_fp").desc(), "phrase"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= RAKE_TOP)
        .select(
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
            "phrase",
            "n_words",
            F.round(F.col("score_fp").cast("double") / 1000000, 6).alias(
                "rake_score"
            ),
        )
        .orderBy("doc_id", "rank")
    )


_fmt(q_rake_keywords, RAKE_TOP=RAKE_TOP)


# ---------------------------------------------------------------------------
# hashing-trick document vectors + retrieval (round 12)
# ---------------------------------------------------------------------------
# The train-free text vectorizer (Weinberger's hashing trick, MLlib's
# HashingTF with signed collisions): every token hashes to one of
# FH_DIM buckets with a +/-1 sign, a document's vector is the signed
# occurrence count per bucket — INTEGER-valued, so the vectors, their
# squared norms, and every retrieval dot product are exact across
# engines; only the final cosine division is a double. No vocabulary,
# no training pass, bounded width: the vectorizer that works on the
# first byte of a 100 TB crawl.

FH_DIM = 16
FH_NQ = 5
FH_K = 5


def _fh_sql_vec() -> str:
    h_b = sql_portable_hash60("t")
    h_s = sql_portable_hash60("'fh#' || t")
    cols = ", ".join(
        f"SUM(CASE WHEN ({h_b} % {FH_DIM}) = {j} "
        f"THEN (({h_s} % 2) * 2 - 1) ELSE 0 END) AS v{j}"
        for j in range(FH_DIM)
    )
    return f"""
    toks AS (
        SELECT doc_id, u.t
        FROM documents, unnest(string_split(text, ' ')) u(t)
    ),
    vec AS (SELECT doc_id, {cols} FROM toks GROUP BY doc_id),
    nv AS (
        SELECT *, ({' + '.join(f'v{j}*v{j}' for j in range(FH_DIM))}) AS nn
        FROM vec
    )"""


_FH_SQL_DOT = " + ".join(f"q.v{j}*c.v{j}" for j in range(FH_DIM))


@query(
    "q_feature_hashing",
    oracle=f"""
    WITH {_fh_sql_vec()},
    q AS (SELECT * FROM nv WHERE doc_id < {FH_NQ} AND nn != 0),
    scored AS (
        SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
               ({_FH_SQL_DOT}) / (sqrt(q.nn) * sqrt(c.nn)) AS cs
        FROM q JOIN nv c ON c.doc_id <> q.doc_id AND c.nn != 0
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cs,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cs DESC, neighbor_id) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           round(cs, 6) AS cos_sim
    FROM ranked WHERE rank <= {FH_K}
    ORDER BY query_id, rank
    """,
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick retrieval: {FH_DIM}-bucket signed hashed
    bag-of-words vectors per document (token bucket and sign from the
    portable md5 — no vocabulary, no training), then cosine top-{FH_K}
    for the first {FH_NQ} query docs. The vectors are integer-valued,
    so everything up to the final division is exact integer algebra —
    the zero-infrastructure baseline to hold BM25 (q_bm25_search) and
    learned embeddings (q_ann_topk) against.

    Scale: ONE token shuffle into {FH_DIM} map-side-combined
    conditional sums per doc (the vectorizer); retrieval crosses a
    broadcast {FH_NQ}-row query panel with the corpus vectors — the
    whitelisted constant cross. Width is fixed at {FH_DIM} forever:
    vocabulary growth costs collisions, not memory.

    The {FH_DIM} per-bucket sums collapse into ONE array column right
    after the aggregation, and norm/dot are ``F.aggregate`` /
    ``F.zip_with`` folds over it (the q_random_projection shape).
    Keeping them as {FH_DIM} scalar columns through the ``nn != 0``
    filter and the non-equi broadcast join made Catalyst's constraint
    propagation go combinatorial on the sum-of-products expression
    trees — ~36 s of OPTIMIZER time at sf0.1 for ~3.6 s of execution
    (round-12 verdict). Higher-order-function folds are opaque to
    constraint propagation, so the same algebra now compiles in
    milliseconds."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    b = (portable_hash60(F.col("t")) % FH_DIM).cast("int")
    s = (
        (portable_hash60(F.concat(F.lit("fh#"), F.col("t"))) % 2) * 2 - 1
    ).cast("long")
    sgn = toks.select("doc_id", b.alias("b"), s.alias("s"))
    vec = (
        sgn.groupBy("doc_id")
        .agg(
            *[
                F.sum(
                    F.when(F.col("b") == j, F.col("s")).otherwise(F.lit(0))
                ).alias(f"v{j}")
                for j in range(FH_DIM)
            ]
        )
        .select(
            "doc_id",
            F.array(*[f"v{j}" for j in range(FH_DIM)]).alias("v"),
        )
    )
    nn = F.aggregate(
        "v", F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    nv = vec.withColumn("nn", nn).where(F.col("nn") != 0)
    q = nv.where(F.col("doc_id") < FH_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nn").alias("qn"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(q)
        .join(nv, F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            (dot / (F.sqrt(F.col("qn")) * F.sqrt(F.col("nn")))).alias("cs"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cs").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= FH_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cs", 6).alias("cos_sim"),
        )
        .orderBy("query_id", "rank")
    )


_fmt(q_feature_hashing, FH_DIM=FH_DIM, FH_NQ=FH_NQ, FH_K=FH_K)


# ---------------------------------------------------------------------------
# Zipf exponent fit (round 12)
# ---------------------------------------------------------------------------
# Natural-language token frequencies follow Zipf's law: freq(rank) ~
# rank^(-s) with s near 1. A corpus whose fitted exponent sits far
# from 1 is the classic generated/boilerplate/template tell —
# log-log OLS over the top term ranks is the one-number corpus
# screen that needs no reference corpus at all (q_lang_distribution
# and q_text_stats profile WHAT is there; this asks if the frequency
# SHAPE is natural).

ZIPF_TOP = 100


@query(
    "q_zipf_fit",
    oracle=f"""
    WITH tf AS (
        SELECT t, COUNT(*) AS freq
        FROM documents, unnest(string_split(text, ' ')) u(t)
        GROUP BY t
    ),
    ranked AS (
        SELECT freq,
               ROW_NUMBER() OVER (ORDER BY freq DESC, t) AS rank
        FROM tf
    ),
    pts AS (
        SELECT ln(rank) AS x, ln(freq) AS y
        FROM ranked WHERE rank <= {ZIPF_TOP}
    ),
    sums AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           round(-(n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS zipf_exponent,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM sums
    """,
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law screen: log-log OLS of term frequency on rank over the
    top {ZIPF_TOP} corpus terms — the fitted exponent (natural text
    sits near 1), intercept, and r^2 in one row. An exponent far from
    1 or a poor r^2 is the generated/template-corpus tell that needs
    no reference corpus.

    Numerics: frequencies and ranks are exact integers; ln() values
    are identical doubles on both engines (the q_tfidf_terms
    precedent), their cross-row power sums accumulate in exact
    decimal, and slope/intercept/r^2 reuse q_linreg_train's identical
    expression tree.

    Scale: one token shuffle into term counts, a top-{ZIPF_TOP} rank
    (TakeOrdered-sized), and a 5-sum aggregate over {ZIPF_TOP} rows."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), "t")
    pts = (
        tf.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ZIPF_TOP)
        .select(
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("freq").cast("double")).alias("y"),
        )
    )
    d38 = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    sums = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d38(F.col("x"))).cast("double").alias("sx"),
        F.sum(d38(F.col("y"))).cast("double").alias("sy"),
        F.sum(d38(F.col("x") * F.col("x"))).cast("double").alias("sxx"),
        F.sum(d38(F.col("y") * F.col("y"))).cast("double").alias("syy"),
        F.sum(d38(F.col("x") * F.col("y"))).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (
        F.col("n"), F.col("sx"), F.col("sy"),
        F.col("sxx"), F.col("syy"), F.col("sxy"),
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        n.cast("bigint").alias("n_terms"),
        F.round(-slope, 6).alias("zipf_exponent"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            (n * sxy - sx * sy)
            * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


_fmt(q_zipf_fit, ZIPF_TOP=ZIPF_TOP)


# ---------------------------------------------------------------------------
# per-document token entropy (round 12)
# ---------------------------------------------------------------------------
# The information-density quality signal: low unigram entropy means
# repetitive/template text (a doc of one word repeated has H = 0),
# entropy near the ln(n_distinct) ceiling means maximally diverse
# usage. LLM-corpus filters threshold on exactly this next to the
# q_text_repetition ratio; entropy catches smeared-out repetition the
# max-single-ngram ratio misses.


@query(
    "q_token_entropy",
    oracle="""
    WITH tf AS (
        SELECT doc_id, t, COUNT(*) AS c
        FROM documents, unnest(string_split(text, ' ')) u(t)
        GROUP BY doc_id, t
    ),
    tot AS (SELECT doc_id, SUM(c) AS n FROM tf GROUP BY doc_id),
    terms AS (
        SELECT tf.doc_id, tf.c, tot.n,
               CAST(round(-(tf.c * 1.0 / tot.n)
                          * ln(tf.c * 1.0 / tot.n), 6)
                    AS DECIMAL(18,6)) AS term
        FROM tf JOIN tot USING (doc_id)
    ),
    per_doc AS (
        SELECT doc_id,
               MAX(n) AS n_tokens,
               COUNT(*) AS n_distinct,
               SUM(term) AS h_fp
        FROM terms GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           round(CAST(h_fp AS DOUBLE), 6) AS entropy,
           CASE WHEN n_distinct >= 2
                THEN round(CAST(h_fp AS DOUBLE) / ln(n_distinct), 6)
                ELSE 0.0 END AS norm_entropy
    FROM per_doc ORDER BY doc_id
    """,
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram Shannon entropy per document (and its ln(n_distinct)-
    normalized form): the information-density quality signal — a doc
    of one token repeated scores 0, maximally diverse usage scores 1
    normalized. Thresholding on this beside q_text_repetition catches
    smeared-out boilerplate the single-max-ngram ratio misses.

    Numerics: token counts are exact integers; each -p*ln(p) term
    evaluates with the identical double tree, rounds to 6 dp, and
    accumulates per doc in exact decimal (the q_benford_audit
    term-rounding discipline), so per-doc sums are order-exact.

    Scale: one (doc, token) shuffle into counts, then a per-doc
    aggregate — the q_text_stats cost envelope."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wd = Window.partitionBy("doc_id")
    p = F.col("c") * F.lit(1.0) / F.sum("c").over(wd)
    term = F.round(-p * F.log(p), 6).cast("decimal(18,6)")
    per_doc = tf.select(
        "doc_id", "c", term.alias("term")
    ).groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("term").alias("h_fp"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        F.round(F.col("h_fp").cast("double"), 6).alias("entropy"),
        F.when(
            F.col("n_distinct") >= 2,
            F.round(
                F.col("h_fp").cast("double")
                / F.log(F.col("n_distinct").cast("double")),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("norm_entropy"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# unseen-mass estimation: Chao1 + Good-Turing — round 15
# ---------------------------------------------------------------------------
# q_vocab_growth measures how fast the vocabulary HAS grown; the
# curation question is how much is LEFT: the Chao1 richness estimator
# (distinct + f1(f1-1)/(2(f2+1)), from singleton/doubleton counts)
# bounds the unseen vocabulary, and the Good-Turing mass f1/N says
# what fraction of the next token draw is expected to be novel — the
# two numbers behind "will more data still buy new tokens".


def _register_chao1() -> None:
    @query(
        "q_vocab_chao1",
        oracle="""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS t FROM documents
        ),
        tc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t),
        s AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS f1,
                   CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS f2
            FROM tc
        )
        SELECT n_tokens, n_distinct, f1, f2,
               round(n_distinct
                     + CAST(f1 AS DOUBLE) * (f1 - 1) / (2.0 * (f2 + 1)),
                     4) AS chao1_estimate,
               round(CAST(f1 AS DOUBLE) / n_tokens, 6)
                 AS gt_unseen_mass
        FROM s
        """,
    )
    def q_vocab_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Chao1 vocabulary-richness estimate + the Good-Turing unseen
        mass over the document corpus: from the token frequency
        spectrum's singleton/doubleton counts alone, how many distinct
        tokens the full population likely holds (bias-corrected Chao1)
        and what probability mass the NEXT token draw puts on
        never-seen types (f1/N) — the two numbers behind "will more
        data still buy new vocabulary", complementing q_vocab_growth's
        empirical curve. All inputs are exact integers; the estimators
        are one double expression each.

        Scale: one tokenize-explode into a map-side-combined token
        count, then a second aggregate over the |vocab|-row spectrum —
        the q_top_words shuffle shape, nothing new at 100 TB."""
        d = read_table(spark, sf_dir, "documents")
        tc = (
            d.select(F.explode(F.split("text", " ")).alias("t"))
            .groupBy("t")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        s = tc.agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("f1"),
            F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
            .cast("long")
            .alias("f2"),
        )
        return s.select(
            "n_tokens",
            "n_distinct",
            "f1",
            "f2",
            F.round(
                F.col("n_distinct")
                + F.col("f1").cast("double")
                * (F.col("f1") - 1)
                / (2.0 * (F.col("f2") + 1)),
                4,
            ).alias("chao1_estimate"),
            F.round(
                F.col("f1").cast("double") / F.col("n_tokens"), 6
            ).alias("gt_unseen_mass"),
        )

    @query(
        "q_capture_recapture",
        oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents
        ),
        marked AS (
            SELECT t,
                   MAX(CASE WHEN {sql_portable_hash60("('cap1:' || CAST(doc_id AS VARCHAR))")} % 2 = 0
                            THEN 1 ELSE 0 END) AS in1,
                   MAX(CASE WHEN {sql_portable_hash60("('cap2:' || CAST(doc_id AS VARCHAR))")} % 2 = 0
                            THEN 1 ELSE 0 END) AS in2
            FROM tok GROUP BY t
        )
        SELECT CAST(SUM(in1) AS BIGINT) AS v1,
               CAST(SUM(in2) AS BIGINT) AS v2,
               CAST(SUM(in1 * in2) AS BIGINT) AS v_both,
               CAST(COUNT(*) AS BIGINT) AS true_distinct,
               round((CAST(SUM(in1) AS DOUBLE) + 1)
                     * (SUM(in2) + 1) / (SUM(in1 * in2) + 1) - 1, 4)
                 AS chapman_estimate
        FROM marked
        """,
    )
    def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Capture-recapture (Chapman) estimate of the corpus's total
        distinct-token count from TWO independent hash-drawn document
        halves: each half's vocabulary is a "capture", the overlap is
        the recapture, and N-hat = (V1+1)(V2+1)/(m+1) - 1 estimates
        the full vocabulary WITHOUT scanning it — the estimator a
        coverage audit uses when the full corpus is too big to
        enumerate (here the true distinct count is also emitted, so
        the estimator's bias is visible in the same row). Sample
        membership is the portable doc_id hash with two salts, so
        both engines draw identical captures.

        Scale: one tokenize-explode into a per-token aggregate
        carrying two membership bits (map-side combined) and one
        final fold — the audit never materializes either vocabulary.
        """
        d = read_table(spark, sf_dir, "documents")
        tok = d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("t")
        )
        marked = tok.groupBy("t").agg(
            F.max(
                F.when(
                    portable_hash60(
                        F.concat(
                            F.lit("cap1:"),
                            F.col("doc_id").cast("string"),
                        )
                    )
                    % 2
                    == 0,
                    1,
                ).otherwise(0)
            ).alias("in1"),
            F.max(
                F.when(
                    portable_hash60(
                        F.concat(
                            F.lit("cap2:"),
                            F.col("doc_id").cast("string"),
                        )
                    )
                    % 2
                    == 0,
                    1,
                ).otherwise(0)
            ).alias("in2"),
        )
        return marked.agg(
            F.sum("in1").cast("long").alias("v1"),
            F.sum("in2").cast("long").alias("v2"),
            F.sum(F.col("in1") * F.col("in2"))
            .cast("long")
            .alias("v_both"),
            F.count(F.lit(1)).cast("long").alias("true_distinct"),
            F.round(
                (F.sum("in1").cast("double") + 1)
                * (F.sum("in2") + 1)
                / (F.sum(F.col("in1") * F.col("in2")) + 1)
                - 1,
                4,
            ).alias("chapman_estimate"),
        )


_register_chao1()
