"""End-to-end corpus curation — the flagship LLM-pipeline composition.

Every production pre-training pipeline chains the same stages this
repo implements as standalone operators; this module composes them
into ONE oracle-gated query, proving the stages compose without a
driver-side loop or a materialization between them:

1. **eval split-off** — the deterministic 5% hash sample is the eval
   set (``operators.contamination``); only the remainder is curatable.
2. **language filter** — keep the target-language subset.
3. **quality filter** — the ``q_text_stats`` quality score (length +
   stopword-rate components) at a fixed threshold.
4. **near-dup removal** — drop MinHash+LSH pair losers (the same
   full-corpus pair set ``q_dedup_apply`` consumes).
5. **decontamination** — drop docs sharing any 4-gram with the eval
   set (broadcast semi-join, ``operators.contamination``).
6. **per-source quota** — cap surviving docs per source, picked in
   deterministic hash order (the Common-Crawl-style guard against one
   domain dominating the mix).

Scale shape: stages 1-3 are row-local predicates fused into the scan;
stage 4's pair set is bucket-bounded (never all-pairs); stage 5 is a
broadcast semi-join (eval shingle hashes are small by construction);
stage 6 is one window shuffle on ``source``, whose per-key row count
is already quota-bounded *below* by the filters. Catalyst fuses 1-3
into a single stage, so the whole query is: scan -> (LSH pipeline on
the side) -> two anti-joins -> one window.

Reference basis: curation stages follow the public pre-training
data recipes (GPT-3/PaLM-style dedup + decontamination + source
mixing); the reference repo itself stops at lake ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.contamination import (
    EVAL_RATE,
    NGRAM,
    _SQL_BUCKET,
    _SQL_SHINGLES,
    contaminated_docs,
)
from dynamodb_streaming_datalake_spark.operators.dedup import (
    _SQL_MINHASH_PAIRS,
    minhash_lsh_pairs,
)
from dynamodb_streaming_datalake_spark.operators.sampling import (
    DENOM,
    hash_bucket,
)
from dynamodb_streaming_datalake_spark.operators.text import (
    _SW_LIST_SQL,
    STOPWORDS,
)
from dynamodb_streaming_datalake_spark.functions.texthash import (
    sql_portable_hash60,
)
from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

#: curation thresholds — fixture-calibrated (quality median ~0.29) but
#: scale-free: each is a rate/quota, not an absolute count
CURATION_MIN_QUALITY = 0.25
CURATION_LANGS = ("en", "de", "fr", "es")
PER_SOURCE_CAP = 15

_EVAL_CUT = int(EVAL_RATE * DENOM)
_LANG_LIST_SQL = ", ".join(f"'{lang}'" for lang in CURATION_LANGS)

#: the q_text_stats quality expression, verbatim (DuckDB side)
_SQL_QUALITY = f"""round(least(len(toks) / 200.0, 1.0) * 0.7 +
                 least(len(list_filter(toks, x -> x IN ({_SW_LIST_SQL}))) * 1.0
                       / len(toks) / 0.2, 1.0) * 0.3, 6)"""


@query(
    "q_corpus_curation",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, source,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               {_SQL_QUALITY} AS quality_score
        FROM (
            SELECT *, string_split(text, ' ') AS toks FROM documents
            WHERE {_SQL_BUCKET} >= {_EVAL_CUT}
        )
        WHERE lang IN ({_LANG_LIST_SQL})
    ),
    kept AS (
        SELECT * FROM scored WHERE quality_score >= {CURATION_MIN_QUALITY}
    ),
    sh AS (
        SELECT doc_id, {_SQL_BUCKET} AS bucket,
               unnest({_SQL_SHINGLES}) AS s
        FROM documents
    ),
    ev AS (
        SELECT DISTINCT {sql_portable_hash60('s')} AS sh_hash
        FROM sh WHERE bucket < {_EVAL_CUT}
    ),
    contaminated AS (
        SELECT DISTINCT sh.doc_id
        FROM sh JOIN ev ON {sql_portable_hash60('s')} = ev.sh_hash
        WHERE sh.bucket >= {_EVAL_CUT}
    ),
    filtered AS (
        SELECT * FROM kept
        WHERE doc_id NOT IN (SELECT doc_b FROM ({_SQL_MINHASH_PAIRS}))
          AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY source ORDER BY {_SQL_BUCKET}, doc_id
        ) AS src_rank
        FROM filtered
    )
    SELECT doc_id, lang, source, n_tokens, quality_score,
           CAST(src_rank AS INT) AS src_rank
    FROM ranked WHERE src_rank <= {PER_SOURCE_CAP}
    """,
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated training subset: eval carve-out -> language + quality
    filters -> LSH near-dup losers dropped -> decontaminated -> capped
    per source in deterministic hash order. See module docstring for
    the per-stage scale shape."""
    d = read_table(spark, sf_dir, "documents")
    train = d.where(hash_bucket(F.col("doc_id")) >= _EVAL_CUT)

    toks = F.split("text", " ")
    sw = F.filter(toks, lambda x: x.isin(*STOPWORDS))
    n_tokens = F.size(toks).cast("bigint")
    n_sw = F.size(sw).cast("bigint")
    quality = F.round(
        F.least(n_tokens / F.lit(200.0), F.lit(1.0)) * 0.7
        + F.least(n_sw * F.lit(1.0) / n_tokens / F.lit(0.2), F.lit(1.0))
        * 0.3,
        6,
    )
    kept = (
        train.where(F.col("lang").isin(*CURATION_LANGS))
        .select(
            "doc_id",
            "lang",
            "source",
            "text",
            n_tokens.alias("n_tokens"),
            quality.alias("quality_score"),
        )
        .where(F.col("quality_score") >= CURATION_MIN_QUALITY)
    )

    # full-corpus LSH pair losers (the q_dedup_apply pair set)
    losers = (
        minhash_lsh_pairs(d).select(F.col("doc_b").alias("doc_id")).distinct()
    )
    # contamination is checked for the kept docs only — an anti-join
    # against the full-train contaminated set (what the oracle computes)
    # filters identically, since membership outside `kept` is irrelevant
    eval_docs = d.where(hash_bucket(F.col("doc_id")) < _EVAL_CUT)
    contaminated = contaminated_docs(
        kept.select("doc_id", "text"), eval_docs, NGRAM
    ).select("doc_id")

    clean = (
        kept.drop("text")
        .join(losers, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
    )
    w = Window.partitionBy("source").orderBy(
        hash_bucket(F.col("doc_id")), F.col("doc_id")
    )
    return (
        clean.withColumn("src_rank", F.row_number().over(w))
        .where(F.col("src_rank") <= PER_SOURCE_CAP)
        .select(
            "doc_id",
            "lang",
            "source",
            "n_tokens",
            "quality_score",
            F.col("src_rank").cast("int").alias("src_rank"),
        )
    )


# ---------------------------------------------------------------------------
# entity resolution / record linkage — round 7
# ---------------------------------------------------------------------------
# The classic blocking + pairwise-scoring shape: a "dirty" twin of the
# part table is synthesized by deterministically dropping one character
# of the record string (p_name || '#' || p_partkey — unique, but with
# realistic near-collisions between same-name parts) past the blocking
# prefix, then resolved back against the clean table. Candidate pairs
# come from equality on a (brand, prefix) blocking key and match on
# edit distance; both engines share the same built-in levenshtein
# (unit-cost edit distance), so scores are exact integers.

ER_PREFIX = 2          # blocking prefix length over the record string
ER_MAX_DIST = 2        # match threshold (true pairs have distance 1)


def er_clean_dirty(spark: SparkSession, sf_dir: str):
    """The record-linkage fixture shared by q_entity_resolution and
    q_blocking_eval: clean part records and their deterministically
    corrupted twin (one character dropped past position 2)."""
    p = read_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.concat_ws("#", F.col("p_name"), F.col("p_partkey")).alias("rec"),
    )
    drop_at = "CAST(3 + p_partkey % (length(rec) - 3) AS INT)"
    dirty = p.select(
        F.col("p_partkey").alias("d_key"),
        F.col("p_brand").alias("d_brand"),
        F.concat(
            F.expr("substr(rec, 1, {0} - 1)".format(drop_at)),
            F.expr("substr(rec, {0} + 1)".format(drop_at)),
        ).alias("d_rec"),
    )
    return p, dirty


@query(
    "q_entity_resolution",
    oracle=f"""
    WITH clean AS (
        SELECT p_partkey, p_brand,
               p_name || '#' || CAST(p_partkey AS VARCHAR) AS rec
        FROM part
    ),
    dirty AS (
        SELECT p_partkey AS d_key, p_brand AS d_brand,
               substr(rec, 1,
                      CAST(3 + p_partkey % (len(rec) - 3) AS INT) - 1)
               || substr(rec,
                         CAST(3 + p_partkey % (len(rec) - 3) AS INT) + 1)
                 AS d_rec
        FROM clean
    ),
    cand AS (
        SELECT c.p_partkey, d.d_key, levenshtein(c.rec, d.d_rec) AS dist
        FROM clean c JOIN dirty d
          ON c.p_brand = d.d_brand
         AND substr(c.rec, 1, {ER_PREFIX}) = substr(d.d_rec, 1, {ER_PREFIX})
    )
    SELECT CAST(p_partkey AS BIGINT) AS clean_key,
           CAST(d_key AS BIGINT) AS dirty_key,
           CAST(dist AS INT) AS distance,
           p_partkey = d_key AS is_true_match
    FROM cand WHERE dist <= {ER_MAX_DIST}
    """,
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: resolve a deterministically-corrupted twin of
    the part table (one record-string character dropped past the
    blocking prefix) against the original. Blocking on (brand,
    {ER_PREFIX}-char prefix) keeps candidate generation at
    block-size-squared instead of table-squared; candidates match on
    levenshtein <= {ER_MAX_DIST}. The truth column exposes
    precision/recall directly: every dropped-char pair has distance 1,
    so a linkage that misses one has a blocking or scoring bug the
    hash catches, and same-name different-key records supply realistic
    false candidates.

    Scale: the candidate join is an equi-join on the blocking key (one
    shuffle); per-block pair volume is the standard blocking trade
    (smaller blocks = fewer candidates, lower recall). Edit distance
    runs JVM-side (built-in levenshtein), no Python in the loop."""
    p, dirty = er_clean_dirty(spark, sf_dir)
    cand = p.join(
        dirty,
        (F.col("p_brand") == F.col("d_brand"))
        & (
            F.substring("rec", 1, ER_PREFIX)
            == F.substring("d_rec", 1, ER_PREFIX)
        ),
    ).select(
        "p_partkey",
        "d_key",
        # bounded edit distance: banded O(k*n) DP with an early exit on
        # |len(a)-len(b)| > k, vs the unbounded O(n*m) matrix — kept
        # pairs' distances are exact (<= threshold), dropped pairs
        # return -1, so `>= 0` filters identically to `<= ER_MAX_DIST`
        F.levenshtein("rec", "d_rec", ER_MAX_DIST).alias("dist"),
    )
    return cand.where(F.col("dist") >= 0).select(
        F.col("p_partkey").cast("bigint").alias("clean_key"),
        F.col("d_key").cast("bigint").alias("dirty_key"),
        F.col("dist").cast("int").alias("distance"),
        (F.col("p_partkey") == F.col("d_key")).alias("is_true_match"),
    )


_fmt(q_entity_resolution, ER_PREFIX=ER_PREFIX, ER_MAX_DIST=ER_MAX_DIST)


# ---------------------------------------------------------------------------
# curriculum ordering (round 10): staged difficulty, source-interleaved
# ---------------------------------------------------------------------------
# Training-order prep: serve easy documents first, harder ones later
# (curriculum), while round-robin-interleaving sources inside every
# difficulty stage so no stage is a single-source run (source runs are
# the classic curriculum failure mode — gradient updates see one
# domain for thousands of steps). Difficulty proxy: token count
# (short = easy); stages: NTILE quartiles over the deterministic
# (n_tokens, doc_id) order. Everything is window functions over
# integers — the manifest is engine-exact by construction.

CURR_STAGES = 4
CURR_MANIFEST = 100


@query(
    "q_curriculum_order",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    staged AS (
        SELECT doc_id, source, n_tokens,
               NTILE({CURR_STAGES}) OVER (ORDER BY n_tokens, doc_id) AS stage
        FROM toks
    ),
    rr AS (
        SELECT doc_id, source, n_tokens, stage,
               ROW_NUMBER() OVER (
                   PARTITION BY stage, source
                   ORDER BY n_tokens, doc_id) AS rr_rank
        FROM staged
    )
    SELECT CAST(ROW_NUMBER() OVER (
               ORDER BY stage, rr_rank, source, doc_id) AS BIGINT)
             AS position,
           doc_id,
           source,
           CAST(stage AS INT) AS stage,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM rr
    ORDER BY position
    LIMIT {CURR_MANIFEST}
    """,
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training manifest: documents bucket into
    {CURR_STAGES} difficulty stages (NTILE over token count with the
    doc-id tie-break), and within each stage sources interleave
    round-robin (rank within (stage, source), then order by that rank
    before source) — easy-to-hard progression without single-source
    runs. First {CURR_MANIFEST} positions returned as the manifest
    sample; the full ordering is the same window spec without the
    LIMIT.

    All ordering keys are integers with total tie-breaks, so the
    manifest is byte-stable across engines and partitionings.

    Scale: two window passes — NTILE over a global sort (at 100 TB
    you'd replace it with quantile-sketch stage edges, the
    q_kll_binning kernel, to avoid the total order) and a
    per-(stage, source) rank, which partitions cleanly. The global
    interleave sort is the final write ordering a shard writer would
    apply per output partition."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    staged = toks.withColumn(
        "stage",
        F.ntile(CURR_STAGES).over(
            Window.orderBy("n_tokens", "doc_id")
        ),
    )
    rr = staged.withColumn(
        "rr_rank",
        F.row_number().over(
            Window.partitionBy("stage", "source").orderBy(
                "n_tokens", "doc_id"
            )
        ),
    )
    return (
        rr.withColumn(
            "position",
            F.row_number()
            .over(Window.orderBy("stage", "rr_rank", "source", "doc_id"))
            .cast("bigint"),
        )
        .select(
            "position",
            "doc_id",
            "source",
            F.col("stage").cast("int").alias("stage"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .orderBy("position")
        .limit(CURR_MANIFEST)
    )


_fmt(
    q_curriculum_order,
    CURR_STAGES=CURR_STAGES,
    CURR_MANIFEST=CURR_MANIFEST,
)


# ---------------------------------------------------------------------------
# leakage-safe target encoding (round 11)
# ---------------------------------------------------------------------------
# The tabular-ML preprocessing step with the subtle correctness trap:
# naive mean-encoding leaks each row's own target into its feature.
# Leave-one-out encoding removes the row's contribution —
# (category_sum - y_row) / (category_count - 1) — so the feature a row
# trains on never saw that row's label. Sums are exact decimals; each
# encoding is ONE final double division, rounded — the q_cuped
# discipline, so the gate checks the leakage-safety arithmetic itself.

from pyspark.sql import functions as F  # noqa: E402,F811


@query(
    "q_target_encoding",
    oracle="""
    WITH sums AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_cat,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS s_cat
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey, o.o_orderpriority,
           s.n_cat,
           CASE WHEN s.n_cat > 1 THEN round(
               CAST(s.s_cat - CAST(o.o_totalprice AS DECIMAL(18,6))
                    AS DOUBLE) / (s.n_cat - 1), 6)
           END AS loo_encoding
    FROM orders o JOIN sums s USING (o_orderpriority)
    """,
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against the
    order total: each row's feature is the mean target of its category
    EXCLUDING itself — (sum - y) / (n - 1) — so the encoded feature
    never contains the row's own label (the leakage naive mean
    encoding ships). Singleton categories encode NULL by contract.
    Category sums are exact decimals; each encoding is one final
    double division rounded to 6 dp.

    Scale: one map-side-combined category aggregate (|categories|
    rows, broadcast back) + one map-only pass over the facts — the
    fact table is never shuffled."""
    o = read_table(spark, sf_dir, "orders")
    y = F.col("o_totalprice").cast("decimal(18,6)")
    sums = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cat"),
        F.sum(y).alias("s_cat"),
    )
    return o.join(F.broadcast(sums), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        "n_cat",
        F.when(
            F.col("n_cat") > 1,
            F.round(
                (F.col("s_cat") - y).cast("double")
                / (F.col("n_cat") - 1),
                6,
            ),
        ).alias("loo_encoding"),
    )


# ---------------------------------------------------------------------------
# blocking-scheme evaluation (round 15)
# ---------------------------------------------------------------------------
# q_entity_resolution fixes ONE blocking scheme and evaluates the
# matcher; this evaluates the BLOCKING itself — the decision that
# actually determines linkage cost and ceiling-recall at scale. For
# each candidate scheme the two standard numbers: pairs completeness
# (what fraction of true pairs survive blocking — recall's ceiling)
# and reduction ratio (what fraction of the N^2 cross product the
# scheme avoids — the cost saved). Both from one equi-join count per
# scheme over the same corrupted-twin fixture.

#: evaluated blocking schemes: name -> (clean key expr, dirty key expr)
BLOCK_SCHEMES = (
    ("brand", "p_brand", "d_brand"),
    (
        "brand_prefix2",
        f"p_brand || '|' || substr(rec, 1, {ER_PREFIX})",
        f"d_brand || '|' || substr(d_rec, 1, {ER_PREFIX})",
    ),
    ("prefix3", "substr(rec, 1, 3)", "substr(d_rec, 1, 3)"),
)


def _blocking_oracle() -> str:
    parts = []
    for name, ck, dk in BLOCK_SCHEMES:
        parts.append(f"""
        SELECT '{name}' AS scheme,
               CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(SUM(CASE WHEN c.p_partkey = d.d_key THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_true_pairs_kept
        FROM clean c JOIN dirty d ON ({ck}) = ({dk})""")
    union = "\nUNION ALL".join(parts)
    return f"""
    WITH clean AS (
        SELECT p_partkey, p_brand,
               p_name || '#' || CAST(p_partkey AS VARCHAR) AS rec
        FROM part
    ),
    dirty AS (
        SELECT p_partkey AS d_key, p_brand AS d_brand,
               substr(rec, 1,
                      CAST(3 + p_partkey % (len(rec) - 3) AS INT) - 1)
               || substr(rec,
                         CAST(3 + p_partkey % (len(rec) - 3) AS INT) + 1)
                 AS d_rec
        FROM clean
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM clean),
    per AS ({union})
    SELECT per.scheme, per.n_candidates, per.n_true_pairs_kept,
           round(CAST(per.n_true_pairs_kept AS DOUBLE) / n.np, 6)
             AS pairs_completeness,
           round(1.0 - CAST(per.n_candidates AS DOUBLE)
                 / (CAST(n.np AS DOUBLE) * n.np), 6) AS reduction_ratio
    FROM per CROSS JOIN n
    """


@query("q_blocking_eval", oracle=_blocking_oracle())
def q_blocking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-scheme sweep over the record-linkage fixture: for each
    of three candidate schemes (brand; brand + 2-char record prefix —
    q_entity_resolution's choice; bare 3-char prefix), the pairs
    completeness (fraction of true pairs surviving blocking — the
    recall CEILING no matcher can exceed) and the reduction ratio
    (fraction of the N^2 cross product avoided — the cost saved).
    The standard pre-deployment decision table for linkage at scale:
    pick the cheapest scheme whose completeness ceiling you can
    afford.

    Scale: one equi-join COUNT per scheme (never materializing
    pairs), each shuffling on its own blocking key; the N
    denominator is a 1-row broadcast. Adding a scheme adds one
    aggregate, not a rescore."""
    clean, dirty = er_clean_dirty(spark, sf_dir)
    n = clean.agg(F.count(F.lit(1)).cast("long").alias("np"))
    per = None
    for name, ck, dk in BLOCK_SCHEMES:
        # round 18: the candidate VOLUME never needs the candidates —
        # |block join| = sum over keys of n_clean(k) * n_dirty(k), two
        # map-side-combined key aggregates and a |keys|-row join
        # instead of materializing the per-key cross through the join
        # (the coarse "brand" scheme generated ~N^2/|brands| rows just
        # to count them — quadratic per key at scale; guide §2.3/§8:
        # decide with small rows). NULL keys fall out of both forms
        # identically (SQL equality never matches NULL).
        cc = clean.groupBy(F.expr(ck).alias("k")).agg(
            F.count(F.lit(1)).alias("nc")
        )
        dc = dirty.groupBy(F.expr(dk).alias("k")).agg(
            F.count(F.lit(1)).alias("nd")
        )
        n_cand = cc.join(dc, "k").agg(
            F.coalesce(F.sum(F.col("nc") * F.col("nd")), F.lit(0))
            .cast("long")
            .alias("n_candidates")
        )
        # true pairs kept: a 1:1 join on the record key, then the
        # scheme's blocking-key equality as a filter — |N| rows, never
        # the cross product
        kept = (
            clean.join(dirty, F.col("p_partkey") == F.col("d_key"))
            .where(F.expr(f"({ck}) = ({dk})"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_true_pairs_kept")
            )
        )
        j = n_cand.crossJoin(kept).select(
            F.lit(name).alias("scheme"), "*"
        )
        per = j if per is None else per.unionByName(j)
    out = per.crossJoin(F.broadcast(n))
    return out.select(
        "scheme",
        "n_candidates",
        "n_true_pairs_kept",
        F.round(
            F.col("n_true_pairs_kept").cast("double") / F.col("np"), 6
        ).alias("pairs_completeness"),
        F.round(
            1.0
            - F.col("n_candidates").cast("double")
            / (F.col("np").cast("double") * F.col("np")),
            6,
        ).alias("reduction_ratio"),
    )


_fmt(q_blocking_eval, ER_PREFIX=ER_PREFIX)
