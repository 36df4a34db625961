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
    sql_word_shingles,
    word_shingles,
)
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
    (64 tokens, stride 48, so consecutive
    chunks share 16 tokens of context). The final (short) chunk is
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
