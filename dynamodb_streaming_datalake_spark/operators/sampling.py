"""Reproducible sampling & mixture weighting for training-data pipelines.

``df.sample()`` / ``sampleBy()`` use per-partition RNG streams — results
change with partitioning, retries, and cluster size, which is exactly
what a dataset card cannot tolerate. The operators here sample by a
deterministic per-row hash instead: a row is in the p%% sample iff
``portable_hash60(key) %% DENOM < p*DENOM``. Properties that matter:

* **Reproducible anywhere** — same rows selected on 1 core or 1000
  executors, on Spark or (for auditing) in any engine with md5.
* **Nested** — the 5%% sample is a subset of the 10%% sample (same hash,
  smaller cutoff), so scaling a mix up/down never churns rows.
* **Stratifiable** — per-group rates are just a per-group cutoff.

Scale: pure row-local filters (one md5 per row); Catalyst pushes the
surviving columns' pruning into the scan; no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.functions.texthash import (
    portable_hash60,
    sql_portable_hash60,
)
from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

#: hash-space denominator for rate cutoffs (1e6 -> rates to 4 decimals)
DENOM = 1_000_000


def hash_bucket(key: Column) -> Column:
    """Deterministic bucket in [0, DENOM) from a row key column."""
    return portable_hash60(key.cast("string")) % DENOM


def deterministic_sample(df: DataFrame, key: Column, rate: float) -> DataFrame:
    """Keep ~rate of rows, selected by key hash (stable + nested)."""
    return df.where(hash_bucket(key) < int(rate * DENOM))


def stratified_sample(
    df: DataFrame, key: Column, strata_col: str, rates: dict[str, float]
) -> DataFrame:
    """Per-stratum rates (the 'training mix' op): each stratum keeps its
    own hash-cutoff; strata missing from ``rates`` are dropped."""
    cutoff = None
    for stratum, rate in rates.items():
        branch = F.when(F.col(strata_col) == stratum, F.lit(int(rate * DENOM)))
        cutoff = branch if cutoff is None else cutoff.when(
            F.col(strata_col) == stratum, F.lit(int(rate * DENOM))
        )
    cutoff = cutoff.otherwise(F.lit(0))
    return df.where(hash_bucket(key) < cutoff)


_SQL_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % 1000000"


@query(
    "q_sample_deterministic",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE {_SQL_BUCKET} < 100000
    """,
)
def q_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% deterministic sample of documents by doc_id hash — identical
    row set on any cluster size, any engine; the 5% sample would be a
    strict subset."""
    d = read_table(spark, sf_dir, "documents")
    return deterministic_sample(d, F.col("doc_id"), 0.10).select(
        "doc_id", "lang", "source"
    )


@query(
    "q_training_mix",
    oracle=f"""
    SELECT source, COUNT(*) AS n_docs
    FROM documents
    WHERE {_SQL_BUCKET} <
          CASE source
            WHEN 'src0' THEN 500000
            WHEN 'src1' THEN 900000
            WHEN 'src2' THEN 250000
            ELSE 0 END
    GROUP BY source
    """,
)
def q_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weighting: downsample each source to its target rate
    (src0 50%, src1 90%, src2 25%, rest dropped) with the same
    deterministic hash — the core 'build the training mix' operation,
    fully reproducible."""
    d = read_table(spark, sf_dir, "documents")
    mixed = stratified_sample(
        d, F.col("doc_id"), "source", {"src0": 0.50, "src1": 0.90, "src2": 0.25}
    )
    return mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))


# ---------------------------------------------------------------------------
# token-budget corpus cut (distributed prefix sum)
# ---------------------------------------------------------------------------

#: per-language token budget for the cut — a corpus cut is inherently an
#: absolute target ("train on 1T tokens of English"), fixture-sized here
TOKEN_BUDGET_PER_LANG = 5_000
#: hash-space blocks for the two-phase prefix sum; at 100 TB this is the
#: knob that bounds any single window partition to ~N/blocks rows
PREFIX_BLOCKS = 128
_BLOCK_W = DENOM // PREFIX_BLOCKS


@query(
    "q_token_budget",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               {_SQL_BUCKET} AS bucket
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY bucket, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_tokens
        FROM t
    )
    SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens - n_tokens < {TOKEN_BUDGET_PER_LANG}
    """,
)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut each language's corpus at a token budget: walk docs in
    deterministic hash order, keep every doc that STARTS under the
    budget (so the cut point is identical on any cluster), and report
    the running total.

    The oracle is the obvious one-window running sum. The Spark plan is
    deliberately NOT that: a per-lang unbounded window sorts an entire
    language inside one reducer, which is exactly the skew that breaks
    at 100 TB (one language can be half the corpus). Instead this is a
    **two-phase distributed prefix sum** with identical output:

    1. block sums — docs hash into ``PREFIX_BLOCKS`` ordered blocks;
       one map-side-combining aggregate yields (lang, block) totals,
       a ~langs x blocks row table;
    2. block offsets — running sum over that tiny table (the only
       unbounded window, trivially sized), broadcast back;
    3. intra-block running sums — window partitioned by (lang, block),
       so the largest sort partition is ~N/blocks, tunable via one
       constant.

    cum = block offset + intra-block running sum, bit-equal to the
    naive plan; the budget filter then keeps docs whose predecessor
    total is still under budget.
    """
    d = read_table(spark, sf_dir, "documents")

    t = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        hash_bucket(F.col("doc_id")).alias("bucket"),
    ).withColumn("block", (F.col("bucket") / _BLOCK_W).cast("int"))

    block_sums = t.groupBy("lang", "block").agg(
        F.sum("n_tokens").alias("block_tokens")
    )
    w_blocks = (
        Window.partitionBy("lang")
        .orderBy("block")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = block_sums.select(
        "lang",
        "block",
        F.coalesce(F.sum("block_tokens").over(w_blocks), F.lit(0)).alias(
            "block_offset"
        ),
    )
    w_intra = (
        Window.partitionBy("lang", "block")
        .orderBy("bucket", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.join(F.broadcast(offsets), ["lang", "block"]).withColumn(
        "cum_tokens",
        (F.col("block_offset") + F.sum("n_tokens").over(w_intra)).cast(
            "bigint"
        ),
    )
    return c.where(
        F.col("cum_tokens") - F.col("n_tokens") < TOKEN_BUDGET_PER_LANG
    ).select("doc_id", "lang", "n_tokens", "cum_tokens")


# ---------------------------------------------------------------------------
# sequence packing (round 6): concat-and-chunk training sequences
# ---------------------------------------------------------------------------

#: tokens per packed training sequence (model context length, fixture-sized)
SEQ_LEN = 512


@query(
    "q_sequence_pack",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               {_SQL_BUCKET} AS bucket
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   ORDER BY bucket, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(cum_before // {SEQ_LEN} AS BIGINT) AS first_seq,
           CAST((cum_before + n_tokens - 1) // {SEQ_LEN} AS BIGINT) AS last_seq,
           CAST(cum_before % {SEQ_LEN} AS BIGINT) AS pack_offset
    FROM c
    """,
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the training-prep step that turns a shuffled
    document stream into fixed-length model sequences (GPT-style
    concat-and-chunk): documents are laid end to end in deterministic
    hash order (the hash IS the shuffle — stable across clusters and
    reruns) and the {SEQ_LEN}-token grid is dropped on top; each doc
    reports the sequences it lands in and its offset inside the first
    one. first_seq == last_seq means the doc fits one sequence; spans
    tell the loader where documents cross sequence boundaries
    (attention-mask resets).

    The oracle is the obvious global running sum — which as a Spark
    plan would sort the whole corpus in ONE reducer. Like
    ``q_token_budget``, the Spark side is the two-phase distributed
    prefix sum instead: block totals (one map-side-combining
    aggregate over {PREFIX_BLOCKS} hash blocks), a running sum over
    that tiny table, then per-block windows bounded at ~N/blocks rows —
    bit-equal cum values, no global sort anywhere.
    """

    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        hash_bucket(F.col("doc_id")).alias("bucket"),
    ).withColumn("block", (F.col("bucket") / _BLOCK_W).cast("int"))

    block_sums = t.groupBy("block").agg(F.sum("n_tokens").alias("block_tokens"))
    w_blocks = (
        Window.orderBy("block").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = block_sums.select(
        "block",
        F.coalesce(F.sum("block_tokens").over(w_blocks), F.lit(0)).alias(
            "block_offset"
        ),
    )
    w_intra = (
        Window.partitionBy("block")
        .orderBy("bucket", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.join(F.broadcast(offsets), "block").withColumn(
        "cum_before",
        (
            F.col("block_offset")
            + F.coalesce(F.sum("n_tokens").over(w_intra), F.lit(0))
        ).cast("bigint"),
    )
    # integer `div`, not `/`: double division loses exactness past 2^53
    # total tokens — i.e. precisely at the corpus sizes packing is for
    return c.select(
        "doc_id",
        "n_tokens",
        F.expr(f"cum_before div {SEQ_LEN}").cast("bigint").alias("first_seq"),
        F.expr(f"(cum_before + n_tokens - 1) div {SEQ_LEN}")
        .cast("bigint")
        .alias("last_seq"),
        (F.col("cum_before") % SEQ_LEN).cast("bigint").alias("pack_offset"),
    )


# ---------------------------------------------------------------------------
# stratified cap: k-per-group deterministic sample — round 6
# ---------------------------------------------------------------------------

CAP_PER_STRATUM = 25
CAP_SALTS = 8


@query(
    "q_stratified_cap",
    oracle=f"""
    SELECT lang, source, doc_id,
           CAST(sample_rank AS INT) AS sample_rank
    FROM (
        SELECT lang, source, doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang, source
                                  ORDER BY {_SQL_BUCKET}, doc_id)
                 AS sample_rank
        FROM documents
    ) WHERE sample_rank <= {CAP_PER_STRATUM}
    """,
)
def q_stratified_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep exactly k={CAP_PER_STRATUM} documents per (lang, source)
    stratum, selected by smallest deterministic hash — the
    reservoir-sample-per-group of dataset curation, reproducible across
    engines and partitionings.

    Scale: a naive ROW_NUMBER over each stratum sorts the ENTIRE
    stratum in one task — the classic grouped-top-k scale-killer when a
    stratum has billions of rows. This runs the documented two-phase
    shape instead: phase 1 ranks within (stratum, salt) — {CAP_SALTS}
    sub-windows per stratum, each 1/{CAP_SALTS} of the rows, tunable to
    the cluster — and keeps k per sub-window; phase 2 ranks the
    surviving k*{CAP_SALTS} candidates per stratum. Every global winner
    is necessarily a sub-window winner, so the result is EXACTLY the
    single-window answer (the oracle computes it that way), while no
    task ever sorts more than max(|stratum|/{CAP_SALTS}, k*{CAP_SALTS})
    rows."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        hash_bucket(F.col("doc_id")).alias("bucket"),
        (portable_hash60(F.concat(F.lit("salt_"), F.col("doc_id"))) % CAP_SALTS)
        .alias("salt"),
    )
    w1 = Window.partitionBy("lang", "source", "salt").orderBy(
        "bucket", "doc_id"
    )
    phase1 = (
        d.withColumn("r1", F.row_number().over(w1))
        .where(F.col("r1") <= CAP_PER_STRATUM)
    )
    w2 = Window.partitionBy("lang", "source").orderBy("bucket", "doc_id")
    return (
        phase1.withColumn("sample_rank", F.row_number().over(w2))
        .where(F.col("sample_rank") <= CAP_PER_STRATUM)
        .select("lang", "source", "doc_id", "sample_rank")
    )



# ---------------------------------------------------------------------------
# training-shard export manifest (round 8)
# ---------------------------------------------------------------------------

#: shard fan-out for the training export; a real run uses O(10k) —
#: the math is shard-count-free
N_SHARDS = 16


@query(
    "q_train_shards",
    oracle=f"""
    SELECT {sql_portable_hash60("CAST(doc_id AS VARCHAR)")} % {N_SHARDS}
             AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           bit_xor({sql_portable_hash60("text")}) AS content_xor
    FROM documents
    GROUP BY 1
    """,
)
def q_train_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export shard manifest: assign every document to one of
    {N_SHARDS} shards by doc_id hash (deterministic — re-running the
    export on any cluster produces byte-identical shard membership) and
    emit the per-shard manifest a dataset card needs: doc count, char
    and whitespace-token totals, and an order-independent XOR
    fingerprint of the member texts' hashes (so two exports can be
    compared shard-by-shard without re-reading a single document).

    Scale: one hash-partitioned shuffle with map-side combine; every
    aggregate (COUNT / integer SUM / BIT_XOR) is order-independent, so
    the manifest is partitioning-invariant. The writer-side twin is
    ``df.repartition(N_SHARDS, hash).write`` — the manifest doubles as
    its integrity check."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(
            (portable_hash60(F.col("doc_id").cast("string")) % N_SHARDS)
            .alias("shard"),
            F.col("n_chars"),
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
            portable_hash60(F.col("text")).alias("h"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
            F.expr("bit_xor(h)").alias("content_xor"),
        )
    )


# ---------------------------------------------------------------------------
# temperature-scaled mixture weights (round 8)
# ---------------------------------------------------------------------------
# Multilingual/multi-source training mixes are rarely proportional to
# raw counts: p_i ∝ n_i^alpha with alpha<1 upweights small sources
# (the standard temperature trick). alpha is fixed at 1/2 here because
# sqrt is IEEE-correctly-rounded — bit-identical in every engine —
# while a general pow() is libm-dependent and would break the hash
# gate. The denominator folds the per-source sqrt terms in ONE
# deterministic order (lexicographic source), not a float SUM.

#: total docs per epoch the mixture is scaled to (fixture-sized)
MIX_BUDGET = 1_000


@query(
    "q_mix_temperature",
    oracle=f"""
    WITH c AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ),
    denom AS (
        SELECT list_reduce(
                 list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source),
                 (a, b) -> a + b) AS z
        FROM c
    )
    SELECT c.source, c.n_docs,
           sqrt(CAST(c.n_docs AS DOUBLE)) / d.z AS weight,
           sqrt(CAST(c.n_docs AS DOUBLE)) / d.z * {MIX_BUDGET} AS target_docs,
           sqrt(CAST(c.n_docs AS DOUBLE)) / d.z * {MIX_BUDGET} / c.n_docs
             AS epochs
    FROM c, denom d
    """,
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (alpha = 1/2): per source,
    weight_i = sqrt(n_i) / sum_j sqrt(n_j), the docs drawn per
    {MIX_BUDGET}-doc epoch, and the implied epoch rate over the source
    (>1 means oversampling). The denominator is an ordered
    left-to-right fold over the per-source sqrt terms — identical
    sequence of IEEE adds in both engines — because a plain float SUM
    is partition-order-dependent and would flicker the hash.

    Scale: one groupBy over the corpus, then a source-count-sized
    (~tens of rows) aggregate folded on the driver side of the plan;
    the 1-row denominator broadcasts back over the counts."""
    d = read_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    denom = c.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("source"),
                            F.sqrt(F.col("n_docs").cast("double")).alias("s"),
                        )
                    )
                ),
                lambda x: x["s"],
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("z")
    )
    s = F.sqrt(F.col("n_docs").cast("double"))
    return c.crossJoin(F.broadcast(denom)).select(
        "source",
        "n_docs",
        (s / F.col("z")).alias("weight"),
        (s / F.col("z") * MIX_BUDGET).alias("target_docs"),
        (s / F.col("z") * MIX_BUDGET / F.col("n_docs")).alias("epochs"),
    )


_fmt(q_sequence_pack, SEQ_LEN=SEQ_LEN, PREFIX_BLOCKS=PREFIX_BLOCKS)
_fmt(q_stratified_cap, CAP_PER_STRATUM=CAP_PER_STRATUM, CAP_SALTS=CAP_SALTS)
_fmt(q_train_shards, N_SHARDS=N_SHARDS)
_fmt(q_mix_temperature, MIX_BUDGET=MIX_BUDGET)


# ---------------------------------------------------------------------------
# leakage-safe grouped split (round 9)
# ---------------------------------------------------------------------------
# The GroupShuffleSplit of a training pipeline: train/eval membership is
# decided per GROUP (here: a document's crawl source), never per row, so
# near-duplicate rows from one origin can never straddle the split and
# leak eval content into training. Same deterministic hash-cutoff idiom
# as every sampler in this module — the split is identical on any
# cluster, any partitioning, any engine with md5.

#: eval share of the group-hash space (10%)
GSPLIT_EVAL = 100_000


@query(
    "q_group_split",
    oracle=f"""
    WITH tagged AS (
        SELECT doc_id, source, n_chars,
               CASE WHEN {sql_portable_hash60("source")} % {DENOM}
                         < {GSPLIT_EVAL}
                    THEN 'eval' ELSE 'train' END AS split
        FROM documents
    ),
    leak AS (
        SELECT CAST(COALESCE(SUM(CASE WHEN sides > 1 THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS leaked_sources
        FROM (
            SELECT source, COUNT(DISTINCT split) AS sides
            FROM tagged GROUP BY source
        )
    )
    SELECT split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           leak.leaked_sources
    FROM tagged, leak
    GROUP BY split, leak.leaked_sources
    ORDER BY split
    """,
)
def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/eval split of the documents corpus, grouped
    by crawl ``source``: a source hashes into the eval side iff its
    bucket falls under {GSPLIT_EVAL}/{DENOM} (10%), and every document
    follows its source. One row per split with document/source/char
    totals, plus the leakage audit in-row: ``leaked_sources`` counts
    sources seen on both sides — structurally zero, and the oracle
    recomputes the audit rather than trusting it.

    Scale: membership is one row-local md5 on the group key — no join
    against a group table, no shuffle for the split itself; the audit
    is one groupBy(source) aggregate crossed as a 1-row frame."""
    d = read_table(spark, sf_dir, "documents")
    tagged = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.when(hash_bucket(F.col("source")) < GSPLIT_EVAL, "eval")
        .otherwise("train")
        .alias("split"),
    )
    leak = (
        tagged.groupBy("source")
        .agg(F.countDistinct("split").alias("sides"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("sides") > 1, 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias("leaked_sources")
        )
    )
    return (
        tagged.crossJoin(F.broadcast(leak))
        .groupBy("split", "leaked_sources")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            "split", "n_docs", "n_sources", "total_chars", "leaked_sources"
        )
        .orderBy("split")
    )


_fmt(q_group_split, GSPLIT_EVAL=GSPLIT_EVAL, DENOM=DENOM)


# ---------------------------------------------------------------------------
# next-fit-decreasing sequence packing audit (round 11)
# ---------------------------------------------------------------------------
# q_sequence_pack packs by concat-and-chunk (zero waste, but documents
# split across sequence boundaries); the alternative trainers weigh is
# whole-document packing — no doc straddles a boundary, at the cost of
# per-bin waste. This audit scores that trade per source with
# NEXT-FIT-DECREASING: lengths sorted descending fold through a
# two-integer state (open-bin remainder, bin count) — the same exact
# integral fold discipline as q_holt_trend, identical in both engines
# — against the ceil(total/C) lower bound.

PACK_CONTEXT = 512


@query(
    "q_pack_nextfit",
    oracle=f"""
    WITH lens AS (
        SELECT source,
               LEAST(len(string_split(text, ' ')), {PACK_CONTEXT}) AS l
        FROM documents
    ),
    arr AS (
        SELECT source,
               list(l ORDER BY l DESC) AS ls,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(l) AS BIGINT) AS total_tokens
        FROM lens GROUP BY source
    ),
    folded AS (
        SELECT source, n_docs, total_tokens,
               list_reduce(
                   list_prepend([1::BIGINT, {PACK_CONTEXT} - ls[1]],
                                list_transform(ls[2:], x -> [x, 0::BIGINT])),
                   (acc, d) -> CASE
                       WHEN d[1] <= acc[2] THEN [acc[1], acc[2] - d[1]]
                       ELSE [acc[1] + 1, {PACK_CONTEXT} - d[1]]
                   END) AS st
        FROM arr
    )
    SELECT source, n_docs, total_tokens,
           CAST(st[1] AS BIGINT) AS n_bins,
           CAST((total_tokens + {PACK_CONTEXT} - 1) // {PACK_CONTEXT}
                AS BIGINT) AS lower_bound,
           round(CAST(total_tokens AS DOUBLE)
                 / (st[1] * {PACK_CONTEXT}), 6) AS utilization
    FROM folded
    ORDER BY source
    """,
)
def q_pack_nextfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document sequence packing audit per source: next-fit-
    decreasing over token lengths (clipped at the {PACK_CONTEXT}-token
    context) — bins used, the ceil(total/C) lower bound, and
    utilization. The number a trainer weighs against q_sequence_pack's
    zero-waste concat-and-chunk when deciding whether document
    boundaries are worth the padding.

    The fold state is two integers (open-bin remainder, bin count) and
    every step is exact integer arithmetic — identical in both
    engines; lengths sort descending with the engines' identical
    integer sort.

    Scale: one length projection, one groupBy(source) fold over a
    per-source array — bounded by docs per source; for corpora where
    that array is too big, the same fold runs as a repartition-and-
    fold per (source, shard) with a merge pass, losing only the
    cross-shard packing opportunity."""
    d = read_table(spark, sf_dir, "documents")
    lens = d.select(
        "source",
        F.least(
            F.size(F.split("text", " ")), F.lit(PACK_CONTEXT)
        ).alias("l"),
    )
    folded = lens.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("l").cast("bigint").alias("total_tokens"),
        F.expr(
            f"""
            aggregate(
                slice(ls, 2, size(ls) - 1),
                array(1L, {PACK_CONTEXT}L - ls[0]),
                (acc, x) -> if(x <= acc[1],
                               array(acc[0], acc[1] - x),
                               array(acc[0] + 1, {PACK_CONTEXT}L - x))
            )
            """.replace(
                "ls",
                "reverse(array_sort(collect_list(cast(l as bigint))))",
            )
        ).alias("st"),
    )
    return (
        folded.select(
            "source",
            "n_docs",
            "total_tokens",
            F.col("st")[0].cast("bigint").alias("n_bins"),
            F.expr(
                f"(total_tokens + {PACK_CONTEXT - 1}) div {PACK_CONTEXT}"
            )
            .cast("bigint")
            .alias("lower_bound"),
            F.round(
                F.col("total_tokens").cast("double")
                / (F.col("st")[0] * PACK_CONTEXT),
                6,
            ).alias("utilization"),
        )
        .orderBy("source")
    )


_fmt(q_pack_nextfit, PACK_CONTEXT=PACK_CONTEXT)


# ---------------------------------------------------------------------------
# Neyman optimal allocation (round 12)
# ---------------------------------------------------------------------------
# q_stratified_cap takes a FIXED per-stratum cap; survey-sampling
# theory says the variance-optimal split of a fixed total budget
# allocates n_h ~ N_h * S_h — big AND noisy strata earn more samples
# (Neyman 1934). This computes the allocation table itself: the plan
# a sampler then executes with the deterministic hash take. Std-devs
# come from exact decimal power sums; the only doubles are the final
# identical-tree sqrt/ratio expressions, and the cross-strata
# normalizer folds in 6-dp decimal so its sum is order-exact.

NEYMAN_BUDGET = 1000


@query(
    "q_neyman_allocation",
    oracle=f"""
    WITH sums AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sv,
               CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE)
                 AS svv
        FROM events GROUP BY event_type HAVING COUNT(*) >= 2
    ),
    stats AS (
        SELECT event_type, n,
               sqrt((svv - sv * sv / n) / (n - 1)) AS s
        FROM sums
    ),
    weighted AS (
        SELECT event_type, n, s,
               CAST(round(n * s, 6) AS DECIMAL(38,6)) AS ns_fp
        FROM stats
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_pop,
           round(s, 6) AS stddev,
           round(CAST(ns_fp AS DOUBLE)
                 / CAST(SUM(ns_fp) OVER () AS DOUBLE), 6) AS weight,
           round({NEYMAN_BUDGET} * CAST(ns_fp AS DOUBLE)
                 / CAST(SUM(ns_fp) OVER () AS DOUBLE), 6) AS allocation
    FROM weighted ORDER BY event_type
    """,
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation of a {NEYMAN_BUDGET}-row sampling
    budget across event-type strata: n_h proportional to N_h * S_h,
    so large AND high-variance strata earn more samples — the
    variance-minimizing plan q_stratified_cap's fixed cap
    approximates. Report population size, std-dev, weight, and the
    (fractional) allocation per stratum; a sampler executes the plan
    with the deterministic hash take (q_sample_deterministic).

    Numerics: per-stratum variance from exact decimal power sums (the
    q_linreg_train discipline); the N_h*S_h products round to 6 dp
    and fold in decimal so the cross-strata normalizer is
    order-exact; allocations stay fractional doubles — integerizing
    (largest-remainder) is presentation, not statistics.

    Scale: one map-side-combined grouped aggregate; the normalizer is
    a window over |strata| rows."""
    ev = read_table(spark, sf_dir, "events")
    d38 = lambda c: c.cast("decimal(38,6)")  # noqa: E731
    sums = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(d38(F.col("value"))).cast("double").alias("sv"),
            F.sum(d38(F.col("value") * F.col("value")))
            .cast("double")
            .alias("svv"),
        )
        .where(F.col("n") >= 2)
    )
    s = F.sqrt(
        (F.col("svv") - F.col("sv") * F.col("sv") / F.col("n"))
        / (F.col("n") - 1)
    )
    weighted = sums.select(
        "event_type",
        "n",
        s.alias("s"),
        F.round(F.col("n") * s, 6).cast("decimal(38,6)").alias("ns_fp"),
    )
    w = Window.partitionBy()
    tot = F.sum("ns_fp").over(w).cast("double")
    return weighted.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_pop"),
        F.round("s", 6).alias("stddev"),
        F.round(F.col("ns_fp").cast("double") / tot, 6).alias("weight"),
        F.round(
            F.lit(NEYMAN_BUDGET) * F.col("ns_fp").cast("double") / tot, 6
        ).alias("allocation"),
    ).orderBy("event_type")


_fmt(q_neyman_allocation, NEYMAN_BUDGET=NEYMAN_BUDGET)


# ---------------------------------------------------------------------------
# systematic PPS sampling: exact-integer selection, distributed cumsum
# ---------------------------------------------------------------------------
# Weighted sampling the reproducible way: Bernoulli coins
# (q_quality_resample) give a BINOMIAL sample size; training-mix
# planners usually want a FIXED draw count with inclusion probability
# proportional to size (PPS) — pick K equally spaced points on the
# cumulative-weight axis and take the document each point lands in.
# With integer weights the whole selection is integer arithmetic
# (multiplicity_i = floor(cum_i*K/W) - floor(cum_before_i*K/W)), so
# the sample is bit-reproducible on any engine — no RNG, no floats.
# The cumulative sum itself is the piece that matters at scale: a
# global window is a single-partition sort, so it is computed
# HIERARCHICALLY — per-bucket totals, a running offset over the small
# bucket frame, and within-bucket windows that run in parallel.

#: fixed draw count (points on the cumulative-weight axis)
PPS_K = 200
#: docs per cumsum bucket — sized so the bucket-totals frame is tiny
#: relative to the corpus (one more recursion level covers any scale)
PPS_BUCKET = 1024


@query(
    "q_pps_sample",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, source,
               len(string_split(text, ' ')) AS w
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, w,
               SUM(w) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(w) OVER () AS tot
        FROM f
    )
    SELECT doc_id, source,
           CAST(w AS BIGINT) AS weight,
           CAST(((cum * {PPS_K}) // tot)
                - (((cum - w) * {PPS_K}) // tot) AS BIGINT)
             AS multiplicity
    FROM c
    WHERE ((cum * {PPS_K}) // tot)
          - (((cum - w) * {PPS_K}) // tot) > 0
    """,
)
def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic probability-proportional-to-size sample of {PPS_K}
    draws, weights = token counts: documents line up on the cumulative
    weight axis in doc_id order and every doc containing one of the
    {PPS_K} equally spaced selection points is emitted with its
    multiplicity — floor(cum*K/W) - floor(cum_before*K/W), exact
    integer division in both engines (both truncate toward zero), so
    the sample is deterministic and bit-identical with NO random
    number anywhere. A doc heavier than W/K draws multiplicity > 1,
    exactly as PPS theory says it must.

    Scale: the cumulative sum is hierarchical, not a global window —
    per-bucket totals ({PPS_BUCKET} docs/bucket, one map-side
    aggregate), a running offset over the SMALL bucket frame, then
    within-bucket running sums that parallelize across buckets (the
    classic two-level scan; a third level covers any corpus). The
    bucket-offset frame is |docs|/{PPS_BUCKET} rows — broadcastable
    until the corpus outgrows two levels."""
    f = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("w"),
    )
    b = f.withColumn("bucket", F.expr(f"doc_id div {PPS_BUCKET}"))
    bt = b.groupBy("bucket").agg(F.sum("w").alias("bw"))
    woff = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = bt.select(
        "bucket",
        F.coalesce(F.sum("bw").over(woff), F.lit(0)).alias("off"),
    )
    tot = bt.agg(F.sum("bw").alias("tot"))
    wdoc = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = b.join(F.broadcast(offs), "bucket").withColumn(
        "cum", F.col("off") + F.sum("w").over(wdoc)
    )
    sel = cum.crossJoin(F.broadcast(tot)).withColumn(
        "multiplicity",
        F.expr(
            f"((cum * {PPS_K}) div tot)"
            f" - (((cum - w) * {PPS_K}) div tot)"
        ),
    )
    return sel.where(F.col("multiplicity") > 0).select(
        "doc_id",
        "source",
        F.col("w").alias("weight"),
        F.col("multiplicity").cast("long").alias("multiplicity"),
    )


_fmt(q_pps_sample, PPS_K=PPS_K, PPS_BUCKET=PPS_BUCKET)


# ---------------------------------------------------------------------------
# weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------
# q_pps_sample draws WITH multiplicity (systematic PPS); the other
# classic a curation pipeline needs is weighted WITHOUT replacement:
# each item appears at most once, inclusion probability increasing in
# weight. The A-ES order-sampling trick makes it one top-k: give item
# i an exponential race time t_i = -ln(u_i) / w_i with u_i a uniform
# from the item's own deterministic hash, keep the k smallest. The
# race is embarrassingly parallel (per-partition top-k, merge), fully
# reproducible across engines and cluster sizes, and restarting with
# a larger k EXTENDS the sample (same keys, lower cutoff).

#: sample size for the weighted-without-replacement draw
WR_K = 100

#: hash-space size for uniform derivation (60-bit portable hash)
_WR_SPACE = float(2**60)


@query(
    "q_weighted_reservoir",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, n_chars,
               -ln(({sql_portable_hash60("CAST(doc_id AS VARCHAR)")} + 1.0)
                   / {_WR_SPACE + 2.0:.1f})
                 / n_chars AS race
        FROM documents
    )
    SELECT doc_id, source,
           CAST(n_chars AS BIGINT) AS weight,
           round(race, 12) AS race_key
    FROM d
    ORDER BY race, doc_id
    LIMIT {WR_K}
    """,
)
def q_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample WITHOUT replacement, k={WR_K}, weights =
    document length: the Efraimidis–Spirakis exponential race. Each
    doc's uniform u derives from its portable doc_id hash (so the
    draw is a pure function of the data — any engine, any cluster
    size, same sample), its race time is -ln(u)/weight, and the
    sample is the k earliest finishers — heavier docs finish sooner
    in probability exactly proportional to weight, and no doc can
    repeat. q_pps_sample is the with-multiplicity complement;
    q_stratified_cap is the unweighted per-stratum cap.

    Scale: a global top-k over a map-computed key — Spark executes
    it as per-partition TakeOrdered + a k-row merge on the driver,
    no shuffle of the data itself; the race key needs one hash + one
    ln per row. Growing k extends the same ordering (nested
    samples), so a curation sweep reuses one pass."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("weight"),
        (
            -F.log(
                (
                    portable_hash60(F.col("doc_id").cast("string"))
                    + F.lit(1.0)
                )
                / F.lit(_WR_SPACE + 2.0)
            )
            / F.col("n_chars")
        ).alias("race"),
    )
    return (
        d.orderBy("race", "doc_id")
        .limit(WR_K)
        .select(
            "doc_id",
            "source",
            "weight",
            F.round("race", 12).alias("race_key"),
        )
    )


_fmt(q_weighted_reservoir, WR_K=WR_K)
