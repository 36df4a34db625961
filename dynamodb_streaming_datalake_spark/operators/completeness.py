"""Completeness auditing: sequence gaps, interval coverage, and the
per-shard ingest monitor.

A CDC lake's first operational question is "did everything arrive?".
The reference's stream carries per-shard monotone sequence numbers
(Kinesis sequence semantics behind SURVEY §2 A1/A2), so completeness
is checkable without a source-of-truth join: missing sequence numbers
ARE the lost records. This module implements the three shapes of that
audit:

* ``q_seq_gaps`` — WHERE the holes are: exact gap ranges in a key
  sequence, found distributedly (per-bucket windows + a bucket-summary
  stitch) instead of the textbook single global sort;
* ``q_interval_coalesce`` — union-of-intervals per key (activity
  coverage): overlapping spans merged into islands with covered time,
  the gaps-and-islands kernel on time ranges;
* ``q_seq_monitor`` — HOW MUCH is missing, O(|shards|) state: per
  shard min/max/count/dupes fold, the form a streaming monitor keeps
  continuously (the same builder drains from a real stream in
  ``tests/test_completeness.py``).

Scale: q_seq_gaps shuffles once on the bucket key (windows run inside
buckets; the stitch frame is |buckets| rows — the skew-diagnose
driver-bounded-artifact pattern); q_interval_coalesce partitions by
user everywhere; q_seq_monitor is one map-side-combined aggregate
whose state is bounded by shard count, not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.registry import format_doc, query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

#: bucket width for the distributed gap scan — the only knob: wider
#: buckets mean fewer stitch rows, narrower mean more window
#: parallelism. |buckets| = keyspan / SEQ_BUCKET must stay
#: driver-bounded (it is the summary frame).
SEQ_BUCKET = 256

#: gaps reported (largest first; start is the unique tie-break)
SEQ_TOP_GAPS = 20

#: activity interval length per event (seconds)
IV_HOLD_S = 900

#: shard count for the synthetic sharded changefeed in q_seq_monitor
SEQ_SHARDS = 8


@query(
    "q_seq_gaps",
    oracle=f"""
    WITH k AS (
        SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'
    ),
    s AS (SELECT k, lead(k) OVER (ORDER BY k) AS nxt FROM k)
    SELECT CAST(k + 1 AS BIGINT) AS gap_start,
           CAST(nxt - 1 AS BIGINT) AS gap_end,
           CAST(nxt - k - 1 AS BIGINT) AS gap_len
    FROM s WHERE nxt > k + 1
    ORDER BY gap_len DESC, gap_start
    LIMIT {SEQ_TOP_GAPS}
    """,
)
def q_seq_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {SEQ_TOP_GAPS} largest holes in a key sequence — here the
    orderkeys surviving an ``o_orderstatus = 'F'`` filter, i.e. a
    changefeed subset whose missing ranges are exactly the records a
    downstream consumer never saw. The textbook query is one global
    sort + lead(); this plan is the DISTRIBUTED version: keys hash to
    {SEQ_BUCKET}-wide buckets, lead() runs INSIDE each bucket (intra
    gaps), and a |buckets|-row summary frame stitches the boundaries
    (inter gaps, spanning empty buckets for free since only present
    buckets appear). Intra ∪ inter is provably the naive gap set —
    consecutive keys share a bucket or sit in adjacent present
    buckets — and the oracle IS the naive global-sort query, so the
    value hash proves the decomposition exact.

    Scale: one shuffle on the bucket key; per-bucket sorts are
    {SEQ_BUCKET}-bounded; the single-partition stitch window touches
    |buckets| rows (the driver-bounded artifact, same budget as the
    AQE statistics the skew queries read). A global-sort plan would
    serialize the whole keyspace through one range exchange."""
    keys = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
    )
    kb = keys.withColumn("b", F.col("k") - (F.col("k") % SEQ_BUCKET))
    win = Window.partitionBy("b").orderBy("k")
    intra = (
        kb.withColumn("nxt", F.lead("k").over(win))
        .where(F.col("nxt") > F.col("k") + 1)
        .select(
            (F.col("k") + 1).alias("gap_start"),
            (F.col("nxt") - 1).alias("gap_end"),
        )
    )
    bsum = kb.groupBy("b").agg(
        F.min("k").alias("bmin"), F.max("k").alias("bmax")
    )
    # |buckets|-row frame: the un-partitioned window is deliberate
    # (single partition, driver-bounded — see docstring).
    wstitch = Window.orderBy("b")
    inter = (
        bsum.withColumn("nmin", F.lead("bmin").over(wstitch))
        .where(F.col("nmin") > F.col("bmax") + 1)
        .select(
            (F.col("bmax") + 1).alias("gap_start"),
            (F.col("nmin") - 1).alias("gap_end"),
        )
    )
    return (
        intra.unionByName(inter)
        .select(
            F.col("gap_start").cast("long").alias("gap_start"),
            F.col("gap_end").cast("long").alias("gap_end"),
            (F.col("gap_end") - F.col("gap_start") + 1)
            .cast("long")
            .alias("gap_len"),
        )
        .orderBy(F.desc("gap_len"), "gap_start")
        .limit(SEQ_TOP_GAPS)
    )


format_doc(q_seq_gaps, SEQ_TOP_GAPS=SEQ_TOP_GAPS, SEQ_BUCKET=SEQ_BUCKET)


@query(
    "q_interval_coalesce",
    oracle=f"""
    WITH iv AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS s
        FROM events
    ),
    x AS (
        SELECT user_id, s, s + {IV_HOLD_S} AS e,
               max(s + {IV_HOLD_S}) OVER (
                   PARTITION BY user_id ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS pmax
        FROM iv
    ),
    y AS (
        SELECT user_id, s, e,
               CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END
                 AS newf
        FROM x
    ),
    z AS (
        SELECT user_id, s, e,
               SUM(newf) OVER (
                   PARTITION BY user_id ORDER BY s
                   ROWS UNBOUNDED PRECEDING
               ) AS isl
        FROM y
    ),
    g AS (
        SELECT user_id, isl, min(s) AS st, max(e) AS en
        FROM z GROUP BY user_id, isl
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(en - st) AS BIGINT) AS covered_seconds,
           CAST(MAX(en - st) AS BIGINT) AS max_island_seconds
    FROM g GROUP BY user_id
    """,
)
def q_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals per user: every event opens a {IV_HOLD_S}-s
    activity span, overlapping spans merge, and the report is per-user
    island count, total covered seconds, and the longest island — the
    gaps-and-islands kernel on TIME RANGES (q_seq_gaps is the integer
    twin; q_sessionize cuts on inactivity gaps, this measures the
    coverage of the merged spans themselves). The island assignment is
    the classic running-max trick: a span starts a new island iff its
    start exceeds the running max end of every earlier span, and the
    island's union length is max(end) - min(start) because members
    chain by construction. (user, second) pairs are deduplicated
    first so the running max never depends on tie order.

    Scale: every window and aggregate is partitioned by user — one
    shuffle, per-user sorted runs, no global sort, state bounded by
    the user's own span count. The oracle replays the identical
    running-max construction in DuckDB."""
    iv = (
        read_table(spark, sf_dir, "events")
        .select(
            "user_id", F.unix_timestamp("ts").cast("long").alias("s")
        )
        .distinct()
        .withColumn("e", F.col("s") + F.lit(IV_HOLD_S))
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    z = (
        iv.withColumn("pmax", F.max("e").over(wprev))
        .withColumn(
            "newf",
            F.when(
                F.col("pmax").isNull() | (F.col("s") > F.col("pmax")), 1
            ).otherwise(0),
        )
        .withColumn("isl", F.sum("newf").over(wrun))
    )
    g = z.groupBy("user_id", "isl").agg(
        F.min("s").alias("st"), F.max("e").alias("en")
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("en") - F.col("st")).cast("long").alias(
            "covered_seconds"
        ),
        F.max(F.col("en") - F.col("st")).cast("long").alias(
            "max_island_seconds"
        ),
    )


format_doc(q_interval_coalesce, IV_HOLD_S=IV_HOLD_S)


def seq_monitor_partials(events: DataFrame) -> DataFrame:
    """Partial state of the shard monitor: per (shard, seq) arrival
    counts over the synthetic sharded changefeed — shard = event_id %
    {SEQ_SHARDS}, per-shard sequence = event_id div {SEQ_SHARDS}.
    MERGEABLE: partials from two micro-batches combine by summing c on
    (shard, seq), which is exactly what the foreachBatch drain in
    tests/test_completeness.py does — distinct-style metrics become
    streaming-legal by making the map-side combine explicit."""
    return (
        events.select(
            (F.col("event_id") % SEQ_SHARDS).cast("long").alias("shard"),
            F.expr(f"event_id div {SEQ_SHARDS}")
            .cast("long")
            .alias("seq"),
        )
        .groupBy("shard", "seq")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def seq_monitor_finalize(partials: DataFrame) -> DataFrame:
    """Final fold of (shard, seq, c) partials to the per-shard health
    row: received count, sequence span, missing = span - distinct
    present, duplicates = received - distinct present."""
    return partials.groupBy("shard").agg(
        F.sum("c").cast("long").alias("n_received"),
        F.min("seq").alias("min_seq"),
        F.max("seq").alias("max_seq"),
        (F.max("seq") - F.min("seq") + 1 - F.count(F.lit(1)))
        .cast("long")
        .alias("n_missing"),
        (F.sum("c") - F.count(F.lit(1))).cast("long").alias("n_dupes"),
    )


format_doc(seq_monitor_partials, SEQ_SHARDS=SEQ_SHARDS)


@query(
    "q_seq_monitor",
    oracle=f"""
    WITH s AS (
        SELECT CAST(event_id % {SEQ_SHARDS} AS BIGINT) AS shard,
               CAST(event_id // {SEQ_SHARDS} AS BIGINT) AS seq
        FROM events
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_received,
           MIN(seq) AS min_seq,
           MAX(seq) AS max_seq,
           CAST(MAX(seq) - MIN(seq) + 1 - COUNT(DISTINCT seq) AS BIGINT)
             AS n_missing,
           CAST(COUNT(*) - COUNT(DISTINCT seq) AS BIGINT) AS n_dupes
    FROM s GROUP BY shard
    """,
)
def q_seq_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting form of the completeness audit: per shard of the
    synthetic changefeed ({SEQ_SHARDS} shards, per-shard monotone
    sequence derived from event_id), how many records arrived, the
    sequence span, how many are MISSING inside it, and how many are
    duplicated — q_seq_gaps tells you where the holes are, this tells
    you how big the problem is. The computation is an explicit
    partial/finalize pair (``seq_monitor_partials`` is mergeable on
    (shard, seq)); tests/test_completeness.py drains the SAME partial
    kernel from a real readStream via foreachBatch and proves the
    merged fold equals this batch result — the deployment shape of a
    continuously-updated ingest health panel.

    Scale: partials combine map-side and are bounded by the distinct
    (shard, seq) key space, the final fold by shard count. No state
    term grows with stream length for a bounded key span."""
    return seq_monitor_finalize(
        seq_monitor_partials(read_table(spark, sf_dir, "events"))
    )


format_doc(q_seq_monitor, SEQ_SHARDS=SEQ_SHARDS)


# ---------------------------------------------------------------------------
# debounce: suppress rapid-fire duplicates per key — round 15
# ---------------------------------------------------------------------------

#: debounce quiet period (seconds): an event is emitted only if the
#: key was quiet for at least this long before it
DEBOUNCE_S = 600


@query(
    "q_debounce",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS s
        FROM events
    ),
    lagged AS (
        SELECT *,
               lag(s) OVER (PARTITION BY user_id, event_type
                            ORDER BY s, event_id) AS prev_s
        FROM e
    )
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN prev_s IS NULL
                         OR s - prev_s >= {DEBOUNCE_S}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_emitted,
           CAST(SUM(CASE WHEN prev_s IS NOT NULL
                         AND s - prev_s < {DEBOUNCE_S}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed
    FROM lagged GROUP BY user_id, event_type
    """,
)
def q_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce report per (user, event type): an event is EMITTED
    only if its key was quiet for >= {DEBOUNCE_S} s before it,
    otherwise SUPPRESSED — the notification/alerting dedup a CDC
    consumer applies so a flapping source can't flood downstream
    (q_dedup_* removes equal payloads; debounce removes rapid-fire
    DISTINCT ones). Batch semantics are one lag() per key ordered by
    (second, event_id); the streaming deployment is REAL —
    ``streaming.stateful.streaming_debounce`` carries one integer of
    state per key (last seen second) and its multi-micro-batch drain
    is pinned equal to this query in tests/test_streaming.py.

    Scale: one shuffle on the key, per-key sorted runs, the counting
    report is the same grouped frame — nothing global."""
    e = read_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("s"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "s", "event_id"
    )
    lagged = e.withColumn("prev_s", F.lag("s").over(w))
    emitted = F.col("prev_s").isNull() | (
        F.col("s") - F.col("prev_s") >= DEBOUNCE_S
    )
    return lagged.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(emitted, 1).otherwise(0))
        .cast("long")
        .alias("n_emitted"),
        F.sum(F.when(~emitted, 1).otherwise(0))
        .cast("long")
        .alias("n_suppressed"),
    )


format_doc(q_debounce, DEBOUNCE_S=DEBOUNCE_S)
