"""Skew mitigation: salted joins.

AQE's skew-join splitting (on by default, ``session.ENGINE_DEFAULTS``)
handles most skew at runtime by splitting oversized shuffle partitions.
Salting is the explicit fallback for the cases AQE can't fix — a single
join *key* so hot that one key's rows exceed an executor (AQE splits
partitions, not keys), or a deterministic-layout requirement.

Mechanics: the skewed (probe) side gets a random-ish salt in
``[0, n_salts)`` derived from a row fingerprint (deterministic here so
tests and reruns agree); the build side is replicated ``n_salts`` times
with every salt value; the join key becomes (key, salt). Each hot key's
rows now spread over ``n_salts`` tasks at the cost of an
``n_salts``-times-larger build side — which is why you salt the join
whose build side is small-but-not-broadcastable, or cap n_salts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_probe_side(df: DataFrame, fingerprint_cols: Sequence[str], n_salts: int) -> DataFrame:
    """Tag each probe-side row with a deterministic salt in [0, n_salts)."""
    fp = F.xxhash64(*[F.col(c) for c in fingerprint_cols])
    return df.withColumn(SALT_COL, F.pmod(fp, F.lit(n_salts)).cast("int"))


def explode_build_side(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate each build-side row once per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    fingerprint_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join with the probe side's hot keys spread over ``n_salts``
    tasks. Result is row-identical to ``probe.join(build, on, how)``
    (asserted in tests); only the physical distribution changes.

    ``fingerprint_cols`` defaults to all probe columns — any stable
    per-row tuple works; it only controls which task a row lands on.

    ``how`` is restricted to joins whose semantics survive build-side
    replication: the build side appears ``n_salts`` times, so any join
    that can emit an UNMATCHED build row (right/full outer) would emit
    it ``n_salts`` times — silently wrong results, not a perf detail.
    Salt the mirrored join instead (swap sides, use 'left').
    """
    allowed = {"inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti", "cross"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — replicated build rows "
            f"would duplicate unmatched output; use one of {sorted(allowed)}"
        )
    fp_cols = list(fingerprint_cols or probe.columns)
    p = salt_probe_side(probe, fp_cols, n_salts)
    b = explode_build_side(build, n_salts)
    return p.join(b, [*on, SALT_COL], how).drop(SALT_COL)


# ---------------------------------------------------------------------------
# driver-gated skew query (round 5)
# ---------------------------------------------------------------------------


def _register() -> None:
    """Register q_salted_join lazily to avoid import cycles (registry ->
    operators -> registry)."""
    from dynamodb_streaming_datalake_spark.operators.relational import (
        _sql_dsum,
        dsum,
    )
    from dynamodb_streaming_datalake_spark.registry import query
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    @query(
        "q_salted_join",
        oracle=f"""
        SELECT o_orderpriority,
               COUNT(*) AS n_lineitems,
               {_sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        """,
    )
    def q_salted_join(spark, sf_dir):
        """Hot-key-safe join under the oracle gate: the full
        lineitem x orders join runs SALTED (probe keys spread over 8
        salt values, build side replicated 8x) and must be
        row-identical to the plain join — the oracle IS the plain
        join, so the salt's result-invisibility is value-hash-checked,
        not just asserted in pytest.

        Scale: AQE skew splitting handles oversized partitions; salting
        is the explicit fix when a SINGLE key exceeds an executor (AQE
        splits partitions, not keys). Cost model in the module
        docstring: build side grows n_salts-fold, so salt joins whose
        build side is small-but-not-broadcastable."""
        li = read_table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("okey"),
            "l_extendedprice",
            "l_discount",
        )
        orders = read_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("okey"), "o_orderpriority"
        )
        # fingerprint over ALL probe columns (default): salting by the
        # join key alone would give a hot key one salt — no spreading
        joined = salted_join(li, orders, ["okey"], n_salts=8)
        return joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            ),
        )


_register()


# ---------------------------------------------------------------------------
# skew diagnosis (round 8): measure before you salt
# ---------------------------------------------------------------------------
# Salting costs a build-side blow-up, so the first step of every skew
# fix is quantifying WHICH keys are hot and how many salts they need.
# This report is the operator form of that step.

#: rows one task should carry — the salting target (fixture-sized; the
#: production knob is executor-memory / row-width)
SKEW_TARGET_ROWS = 500
SKEW_TOP = 20


def _register_diagnose() -> None:
    from pyspark.sql import Window

    from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
    from dynamodb_streaming_datalake_spark.registry import query
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    @query(
        "q_skew_diagnose",
        oracle=f"""
        WITH c AS (
            SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id
        ),
        t AS (SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM c)
        SELECT c.user_id,
               CAST(c.n_rows AS BIGINT) AS n_rows,
               CAST(c.n_rows AS DOUBLE) / t.total AS row_share,
               CAST(c.n_rows AS DOUBLE) * t.n_keys / t.total
                 AS hotness,
               CAST(CEIL(CAST(c.n_rows AS DOUBLE) / {SKEW_TARGET_ROWS})
                    AS BIGINT) AS suggested_salts
        FROM c, t
        ORDER BY c.n_rows DESC, c.user_id
        LIMIT {SKEW_TOP}
        """,
    )
    def q_skew_diagnose(spark, sf_dir):
        """Join-key skew report over events.user_id: the top-{SKEW_TOP}
        hottest keys with their row share, hotness (multiple of the
        uniform per-key average — AQE splits partitions, so >1 here
        flags the per-KEY skew only salting fixes), and the salt count
        that would cap each key's per-task rows at {SKEW_TARGET_ROWS}.
        The output feeds ``salted_join(n_salts=max(suggested_salts))``
        directly.

        Scale: one map-side-combined groupBy to |keys| rows, a 1-row
        total broadcast back over it, and a top-k TakeOrdered — the
        diagnostic never touches raw rows twice."""
        from pyspark.sql import functions as F

        e = read_table(spark, sf_dir, "events")
        c = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_rows"))
        t = c.agg(
            F.sum("n_rows").alias("total"), F.count(F.lit(1)).alias("n_keys")
        )
        return (
            c.crossJoin(F.broadcast(t))
            .select(
                "user_id",
                F.col("n_rows").cast("bigint").alias("n_rows"),
                (F.col("n_rows").cast("double") / F.col("total")).alias(
                    "row_share"
                ),
                (
                    F.col("n_rows").cast("double")
                    * F.col("n_keys")
                    / F.col("total")
                ).alias("hotness"),
                F.ceil(
                    F.col("n_rows").cast("double") / F.lit(SKEW_TARGET_ROWS)
                ).cast("bigint").alias("suggested_salts"),
            )
            .orderBy(F.col("n_rows").desc(), "user_id")
            .limit(SKEW_TOP)
        )

    _fmt(q_skew_diagnose, SKEW_TOP=SKEW_TOP, SKEW_TARGET_ROWS=SKEW_TARGET_ROWS)


_register_diagnose()


# ---------------------------------------------------------------------------
# salted aggregation (round 8): two-phase exact COUNT(DISTINCT) for
# hot keys
# ---------------------------------------------------------------------------
# Plain sums/counts don't need salting — Spark's map-side partial
# aggregation already spreads them. The aggregation that DOES melt a
# task is per-key DISTINCT state: one hot key holding millions of
# distinct items builds its whole hash set in a single task. The fix
# partitions the ITEM space: salt = hash(item) % S makes the per-salt
# distinct sets DISJOINT, so per-(key, salt) distinct counts simply
# SUM to the exact answer — each task now holds at most 1/S of any
# key's state. Result-invisible: the oracle is the plain one-phase
# COUNT(DISTINCT), like q_salted_join's.

#: item-space salt fan-out
AGG_SALTS = 8


def _register_salted_agg() -> None:
    from dynamodb_streaming_datalake_spark.functions.texthash import (
        portable_hash60,
    )
    from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
    from dynamodb_streaming_datalake_spark.registry import query
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    @query(
        "q_salted_agg",
        oracle="""
        SELECT user_id,
               CAST(COUNT(DISTINCT props) AS BIGINT) AS n_distinct_props,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY user_id
        """,
    )
    def q_salted_agg(spark, sf_dir):
        """Exact per-user COUNT(DISTINCT props) computed the hot-key-safe
        way: items are salted by hash(item) % {AGG_SALTS} so the
        per-salt distinct sets are DISJOINT, per-(user, salt) partial
        distinct counts are summed, and the result provably equals the
        one-phase COUNT(DISTINCT) — which is exactly what the oracle
        computes (the salted-join idiom applied to aggregation state).

        Scale: no single task ever materializes more than ~1/{AGG_SALTS}
        of any key's distinct set; the extra shuffle carries (user,
        salt) partials, which map-side combine bounds at keys x salts
        rows per task. S is the knob: size it so hot_key_distincts/S
        fits executor memory."""
        from pyspark.sql import functions as F

        e = read_table(spark, sf_dir, "events")
        salted = e.select(
            "user_id",
            "props",
            (portable_hash60(F.col("props")) % AGG_SALTS).alias("salt"),
        )
        p1 = salted.groupBy("user_id", "salt").agg(
            F.countDistinct("props").alias("nd"),
            F.count(F.lit(1)).alias("n"),
        )
        return p1.groupBy("user_id").agg(
            F.sum("nd").cast("bigint").alias("n_distinct_props"),
            F.sum("n").cast("bigint").alias("n_events"),
        )

    _fmt(q_salted_agg, AGG_SALTS=AGG_SALTS)


_register_salted_agg()


# ---------------------------------------------------------------------------
# adaptive salted join (round 13): the diagnose pass FEEDS the
# mitigation
# ---------------------------------------------------------------------------
# q_skew_diagnose measures; q_salted_join mitigates with a hand-picked
# n_salts. A production 100 TB join wants the two wired: measure the
# probe side's hottest key, derive the salt count that caps any key's
# per-task rows at the target, and salt only when the measurement says
# to — a uniform probe side pays ZERO build-side blow-up.

#: per-task row target for the adaptive path (fixture-sized so the
#: salted branch actually engages on the test corpus; the production
#: knob is executor-memory / row-width, same as SKEW_TARGET_ROWS)
ADAPTIVE_TARGET_ROWS = 50
#: build-side replication cap — past this, per-key spreading has
#: diminishing returns against the n_salts-fold build-side cost
ADAPTIVE_MAX_SALTS = 64


def adaptive_salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    target_rows: int = ADAPTIVE_TARGET_ROWS,
    max_salts: int = ADAPTIVE_MAX_SALTS,
    how: str = "inner",
    fingerprint_cols: Sequence[str] | None = None,
) -> tuple[DataFrame, int]:
    """Diagnose-then-salt: measure the probe side's hottest join key
    (one map-side-combined groupBy folded to a single driver row),
    pick ``n_salts = clamp(ceil(max_key_rows / target_rows), 1,
    max_salts)``, and return ``(joined, n_salts)`` — the plain join
    when the measurement says no key needs spreading, the salted join
    otherwise. Result is row-identical to ``probe.join(build, on,
    how)`` either way (q_salted_join's guarantee; the registered
    query's oracle IS the plain join).

    Scale: the diagnose pass is one extra scan of the probe side's
    join-key columns (column-pruned), aggregated map-side to |keys|
    rows and folded to ONE driver-side number — cheap next to the join
    it sizes, and it removes the hand-tuned constant that goes stale
    as key distributions drift."""
    hot = (
        probe.groupBy(*[F.col(c) for c in on])
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("max_n"))
        .collect()[0]
    )
    max_n = hot["max_n"] or 0
    n_salts = int(min(max_salts, max(1, -(-max_n // target_rows))))
    if n_salts <= 1:
        return probe.join(build, list(on), how), 1
    return (
        salted_join(
            probe,
            build,
            on,
            n_salts=n_salts,
            how=how,
            fingerprint_cols=fingerprint_cols,
        ),
        n_salts,
    )


def _register_adaptive() -> None:
    from dynamodb_streaming_datalake_spark.operators.relational import (
        _sql_dsum,
        dsum,
    )
    from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
    from dynamodb_streaming_datalake_spark.registry import query
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    @query(
        "q_adaptive_salted_join",
        oracle=f"""
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {_sql_dsum('e.value', 'total_value')}
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_mktsegment
        """,
    )
    def q_adaptive_salted_join(spark, sf_dir):
        """q_skew_diagnose wired into q_salted_join as ONE operator:
        the events->customer enrichment join measures its own probe
        side (hottest user_id's row count), derives the salt count
        that caps any key at {ADAPTIVE_TARGET_ROWS} rows/task (capped
        at {ADAPTIVE_MAX_SALTS}), and salts only if needed — at small
        sf the measurement picks the PLAIN join (no blow-up paid), at
        bench sf it picks a salted one; the oracle is the plain join
        either way, so the adaptivity is value-hash-proven
        result-invisible, not just asserted.

        Scale: diagnose = one column-pruned scan folded to one driver
        row; the join then pays build-side replication exactly
        proportional to the measured skew, instead of a hand-tuned
        constant that over-salts uniform data or under-salts hot
        keys."""
        e = read_table(spark, sf_dir, "events").select(
            F.col("user_id").alias("ukey"), "value"
        )
        c = read_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("ukey"), "c_mktsegment"
        )
        joined, _n = adaptive_salted_join(e, c, ["ukey"])
        return joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            dsum(F.col("value"), "total_value"),
        )

    _fmt(
        q_adaptive_salted_join,
        ADAPTIVE_TARGET_ROWS=ADAPTIVE_TARGET_ROWS,
        ADAPTIVE_MAX_SALTS=ADAPTIVE_MAX_SALTS,
    )


_register_adaptive()


# ---------------------------------------------------------------------------
# adaptive salted aggregation (round 14): measure-then-derive for
# DISTINCT state, completing the adaptive pair
# ---------------------------------------------------------------------------
# q_adaptive_salted_join sized its salt count from a measurement;
# q_salted_agg still used the hand constant AGG_SALTS (round-13
# verdict #5). Same recipe: one column-pruned groupBy folded to the
# hottest key's row count (an upper bound on its distinct-item state —
# measuring exact per-key NDV would cost the very aggregation being
# protected), salt count derived from it, and the item-space split
# engaged only when the measurement says a key's state needs
# spreading. A uniform corpus pays zero extra shuffle.

#: per-task distinct-state row target (fixture-sized so the salted
#: branch engages on the bench corpus; production knob is
#: executor-memory / state-row-width)
ADAPTIVE_AGG_TARGET_ROWS = 50
ADAPTIVE_AGG_MAX_SALTS = 64


def adaptive_salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    item_col: str,
    target_rows: int = ADAPTIVE_AGG_TARGET_ROWS,
    max_salts: int = ADAPTIVE_AGG_MAX_SALTS,
) -> tuple[DataFrame, int]:
    """Diagnose-then-salt for exact per-key COUNT(DISTINCT item):
    measure the hottest key's row count (one map-side-combined groupBy
    folded to a single driver row), pick ``n_salts =
    clamp(ceil(max_key_rows / target_rows), 1, max_salts)``, and
    return ``(aggregated, n_salts)`` — the plain one-phase
    COUNT(DISTINCT) when no key needs spreading, the two-phase
    disjoint-item-space split otherwise. Output columns: ``*keys,
    n_distinct, n_rows`` — identical either way (the registered
    query's oracle IS the one-phase aggregate).

    Scale: salting by hash(item) % S makes the per-salt distinct sets
    DISJOINT, so per-(key, salt) counts SUM exactly; no task ever
    holds more than ~1/S of any key's state. The diagnose pass scans
    only the key columns and folds to one number — cheap next to the
    aggregation it sizes."""
    from dynamodb_streaming_datalake_spark.functions.texthash import (
        portable_hash60,
    )

    hot = (
        df.groupBy(*[F.col(c) for c in keys])
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("max_n"))
        .collect()[0]
    )
    max_n = hot["max_n"] or 0
    n_salts = int(min(max_salts, max(1, -(-max_n // target_rows))))
    if n_salts <= 1:
        plain = df.groupBy(*[F.col(c) for c in keys]).agg(
            F.countDistinct(item_col).cast("bigint").alias("n_distinct"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        return plain, 1
    salted = df.select(
        *keys,
        item_col,
        # cast-to-string: the hash only decides which task holds an
        # item's state, so any stable rendering works for any type
        (portable_hash60(F.col(item_col).cast("string")) % n_salts).alias(
            "salt"
        ),
    )
    p1 = salted.groupBy(*keys, "salt").agg(
        F.countDistinct(item_col).alias("nd"),
        F.count(F.lit(1)).alias("n"),
    )
    two_phase = p1.groupBy(*keys).agg(
        F.sum("nd").cast("bigint").alias("n_distinct"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )
    return two_phase, n_salts


def _register_adaptive_agg() -> None:
    from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
    from dynamodb_streaming_datalake_spark.registry import query
    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    @query(
        "q_adaptive_salted_agg",
        oracle="""
        SELECT user_id,
               CAST(COUNT(DISTINCT props) AS BIGINT) AS n_distinct_props,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY user_id
        """,
    )
    def q_adaptive_salted_agg(spark, sf_dir):
        """q_skew_diagnose wired into q_salted_agg as ONE operator: the
        per-user exact COUNT(DISTINCT props) measures its own input
        (hottest user_id's row count — an upper bound on that key's
        distinct state), derives the salt count that caps any key's
        per-task state at {ADAPTIVE_AGG_TARGET_ROWS} rows (capped at
        {ADAPTIVE_AGG_MAX_SALTS}), and splits the item space only if
        needed — at small sf the measurement picks the plain one-phase
        aggregate (zero extra shuffle), at bench sf the two-phase
        disjoint split. The oracle is the one-phase COUNT(DISTINCT)
        either way, so the adaptivity is value-hash-proven
        result-invisible; salt selection at controlled skew levels is
        pinned in tests/test_plans.py.

        Scale: replaces the hand constant AGG_SALTS that over-salts
        uniform data (pointless shuffle width) or under-salts hot keys
        (a task holding a whole key's distinct set); the measurement
        costs one column-pruned scan folded to one driver row."""
        from pyspark.sql import functions as F

        e = read_table(spark, sf_dir, "events")
        agg, _n = adaptive_salted_agg(e, ["user_id"], "props")
        return agg.select(
            "user_id",
            F.col("n_distinct").alias("n_distinct_props"),
            F.col("n_rows").alias("n_events"),
        )

    _fmt(
        q_adaptive_salted_agg,
        ADAPTIVE_AGG_TARGET_ROWS=ADAPTIVE_AGG_TARGET_ROWS,
        ADAPTIVE_AGG_MAX_SALTS=ADAPTIVE_AGG_MAX_SALTS,
    )


_register_adaptive_agg()
