"""Distributed bloom-filter pre-join (round 5).

The semi-join reduction every warehouse engine applies when a selective
dimension predicate should prune a huge fact scan BEFORE the join
shuffle: build a bloom filter over the qualifying dim keys, test the
fact's key column against it map-side, and only then run the exact
join. Spark applies this internally as a runtime filter in some plans
(`spark.sql.optimizer.runtime.bloomFilter.enabled`); this operator is
the explicit, composable version — usable when the dim is far too big
to broadcast but its BITMAP (8-128 KB, sized from the dim cardinality
by ``bloom_m_bits``) never is.

Everything is JVM-side column expressions:

* build — per-key positions via ``xxhash64(key, seed_i) % m``, OR-folded
  into 64-bit words by ONE ``groupBy(word).agg(bit_or(mask))`` whose
  output is at most m/64 rows (1024 for the default 2^16 bits),
  collected like any broadcast dim;
* test — each of the ``n_hashes`` probes is a broadcast hash join of
  the row's word index against a tiny (nonzero-words-only)
  ``(word, bits)`` table, then a bitwise mask AND — O(1) per probe
  regardless of bitmap width. (A literal ``array<long>`` +
  ``element_at`` probe was measured and rejected: Spark re-evaluates
  the array literal per row, making it O(m) per row — see
  ``bloom_prune``.) The fact side is never shuffled.

False positives only cost work — the exact join behind the filter
decides membership — so results are bit-identical to the plain join,
which is exactly what the DuckDB oracle checks.

Scale: the bitmap is sized for ~16 bits/key (FP ~0.1% at 3 hashes) up
to the literal-array ceiling documented on ``bloom_m_bits``; the fact
side reads pruned. At 100 TB the win is not scanning less but
SHUFFLING less: only surviving fact rows enter the join exchange.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.relational import (
    _sql_dsum,
    dsum,
)
from dynamodb_streaming_datalake_spark.functions.texthash import (
    portable_hash60,
    sql_portable_hash60,
)
from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

BLOOM_MIN_BITS = 1 << 16  #: floor (8 KB bitmap)
BLOOM_MAX_BITS = 1 << 20  #: literal-bitmap ceiling (128 KB, 16k longs)
BLOOM_BITS_PER_KEY = 16  #: target load — ~0.1% FP at 3 hashes
BLOOM_N_HASHES = 3


def bloom_m_bits(n_keys: int) -> int:
    """Bitmap width sized FROM the dim cardinality: 16 bits/key rounded
    up to a power of two, clamped to [2^16, 2^20]. A fixed width
    saturates as the dim grows (at fill 0.75 the 3-hash FP rate is
    ~42% — the filter stops filtering); sizing from |keys| keeps fill
    ≤ ~0.2 and FP under ~1% up to ~65k keys. Beyond the 2^20 ceiling
    the literal-array distribution mechanism is the binding constraint
    — switch to a broadcast (word -> bits) join or Spark's runtime
    bloom filter (spark.sql.optimizer.runtime.bloomFilter.enabled)
    at that scale."""
    target = max(BLOOM_MIN_BITS, BLOOM_BITS_PER_KEY * max(n_keys, 1))
    return min(1 << (target - 1).bit_length(), BLOOM_MAX_BITS)


def _positions(key: Column, m_bits: int) -> list[Column]:
    """The n_hashes bit positions of ``key``: xxhash64 with the hash
    index as a second column (cheap seed diversification)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        for i in range(BLOOM_N_HASHES)
    ]


def bloom_build(dim_keys: DataFrame, key_col: str) -> list[int]:
    """Aggregate the dim keys' bit positions into an m/64-word bitmap —
    one shuffle of (word, mask) pairs into ≤ m/64 rows, then a bounded
    collect (the bitmap IS a broadcast-sized object by construction).
    Width is sized from a count of the dim (parquet-metadata cheap);
    the returned list's length encodes it (always a power of two), so
    ``bloom_might_contain`` needs no separate width argument."""
    m_bits = bloom_m_bits(dim_keys.count())
    pos = dim_keys.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits))).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("word"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("pos") % 64).cast("int"),
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in words:
        bitmap[r["word"]] = r["bits"]
    return bitmap


def bloom_prune(df: DataFrame, key_col: str, bitmap: list[int]) -> DataFrame:
    """Keep only rows whose key MIGHT be in the filter (no false
    negatives): each of the n_hashes probes is a broadcast hash join of
    the row's word index against the (nonzero-words-only) bitmap table,
    then a bitwise mask test. Per-row cost is n_hashes O(1) hash
    lookups regardless of bitmap width — a literal-array ``element_at``
    probe is O(m) per row (Spark re-materializes the array literal per
    evaluation: ~2 s at 2^16 bits, ~5 s at 2^19, measured at sf0.1),
    which is why the bitmap rides three tiny broadcasts instead. The
    fact side is never shuffled."""
    spark = df.sparkSession
    m_bits = len(bitmap) * 64
    words = [(w, int(bits)) for w, bits in enumerate(bitmap) if bits]
    out = df
    conds = []
    for i, p in enumerate(_positions(F.col(key_col), m_bits)):
        wtab = F.broadcast(
            spark.createDataFrame(words, f"w{i} int, bits{i} long")
        )
        out = out.withColumn(f"w{i}", (p / 64).cast("int")).withColumn(
            f"m{i}",
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
            ),
        )
        out = out.join(wtab, f"w{i}", "left")
        conds.append(
            F.coalesce(F.col(f"bits{i}"), F.lit(0)).bitwiseAND(F.col(f"m{i}"))
            != 0
        )
    pruned = out.where(reduce(lambda a, b: a & b, conds))
    drop = [c for i in range(BLOOM_N_HASHES) for c in (f"w{i}", f"m{i}", f"bits{i}")]
    return pruned.drop(*drop)


def bloom_prejoin(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Prune ``fact`` with a bloom filter built over ``dim``'s keys,
    then run the exact inner join. Results equal the plain join (the
    filter can only pass false positives, which the join drops)."""
    bitmap = bloom_build(dim.select(dim_key), dim_key)
    pruned = bloom_prune(fact, fact_key, bitmap)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])


@query(
    "q_bloom_prejoin",
    oracle=f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           COUNT(*) AS n_lineitems,
           {_sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY order_month
    """,
)
def q_bloom_prejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue of URGENT-priority orders with the lineitem scan
    bloom-pruned before the join — the explicit semi-join-reduction
    operator. The oracle is the PLAIN join: bloom false positives are
    dropped by the exact join, so the operator must be result-invisible
    (that invariant is the check)."""
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    joined = bloom_prejoin(
        lineitem,
        orders.select("o_orderkey", "o_orderdate"),
        "l_orderkey",
        "o_orderkey",
    )
    return (
        joined.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
        )
    )


# ---------------------------------------------------------------------------
# bloom sizing sweep: measured false-positive rate vs bitmap width
# ---------------------------------------------------------------------------
# The tuning curve behind BLOOM_BITS_PER_KEY: build the same member set
# at several bitmap widths and MEASURE the false-positive rate against
# known non-members, instead of trusting the (1 - e^{-kn/m})^k formula.
# Positions use the md5-based portable hash (not the production
# xxhash64 path) so the DuckDB oracle replicates the filter bit-for-bit
# and the measured FPR itself sits under the hash gate.

#: candidate bitmap widths (bits); spans under- to over-provisioned
#: for the qualifying-partkey member set at test scales
BLOOM_SWEEP_BITS = (4096, 16384, 65536)
#: member predicate: near-full-quantity lineitems
BLOOM_SWEEP_MIN_QTY = 48


@query(
    "q_bloom_fpr_sweep",
    oracle=f"""
    WITH members AS (
        SELECT DISTINCT l_partkey AS key FROM lineitem
        WHERE l_quantity >= {BLOOM_SWEEP_MIN_QTY}
    ),
    probes AS (SELECT DISTINCT p_partkey AS key FROM part),
    ms AS (SELECT m FROM (VALUES {", ".join(f"({m})" for m in BLOOM_SWEEP_BITS)}) v(m)),
    hs AS (SELECT i FROM (VALUES (0), (1), (2)) v(i)),
    setbits AS (
        SELECT DISTINCT ms.m,
               {sql_portable_hash60("CAST(hs.i AS VARCHAR) || ':' || CAST(members.key AS VARCHAR)")}
                 % ms.m AS pos
        FROM members, ms, hs
    ),
    probebits AS (
        SELECT probes.key, ms.m, hs.i,
               {sql_portable_hash60("CAST(hs.i AS VARCHAR) || ':' || CAST(probes.key AS VARCHAR)")}
                 % ms.m AS pos
        FROM probes, ms, hs
    ),
    hits AS (
        SELECT p.key, p.m, COUNT(s.pos) AS n_set
        FROM probebits p
        LEFT JOIN setbits s ON s.m = p.m AND s.pos = p.pos
        GROUP BY p.key, p.m
    ),
    judged AS (
        SELECT h.m, h.n_set = 3 AS claimed, mem.key IS NOT NULL AS is_member
        FROM hits h LEFT JOIN members mem ON mem.key = h.key
    )
    SELECT m AS m_bits,
           CAST(COUNT(*) FILTER (WHERE is_member) AS BIGINT) AS n_members,
           CAST(COUNT(*) FILTER (WHERE NOT is_member) AS BIGINT)
             AS n_nonmembers,
           CAST(COUNT(*) FILTER (WHERE claimed AND NOT is_member) AS BIGINT)
             AS n_false_positives,
           CAST(COUNT(*) FILTER (WHERE is_member AND NOT claimed) AS BIGINT)
             AS n_false_negatives,
           round(CAST(COUNT(*) FILTER (WHERE claimed AND NOT is_member)
                      AS DOUBLE)
                 / COUNT(*) FILTER (WHERE NOT is_member), 6) AS fpr
    FROM judged
    GROUP BY m
    ORDER BY m
    """,
)
def q_bloom_fpr_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter sizing as measured data: the member set (partkeys
    with a >= {BLOOM_SWEEP_MIN_QTY}-quantity lineitem) is folded into
    a 3-hash bloom filter at each candidate width {BLOOM_SWEEP_BITS},
    every partkey then probes all three filters, and each width
    reports its OBSERVED false-positive rate over the known
    non-members — plus the false-negative count, which the bloom
    contract requires to be exactly zero (pinned by test).

    The filter is expressed relationally — set bits as a distinct
    (width, position) table, a probe claims membership when all 3 of
    its positions join — so no bitmap is ever collected and the DuckDB
    oracle rebuilds the identical filter from the same md5 positions.

    Scale: position tables are <= 3x|members| and <= 3x|probes| rows
    per width; everything joins on (width, position) or key —
    equi-joins with map-side combine, no cross. This is the
    measure-then-size discipline of q_skew_diagnose applied to
    q_bloom_prejoin's sizing constant."""
    li = read_table(spark, sf_dir, "lineitem")
    members = (
        li.where(F.col("l_quantity") >= BLOOM_SWEEP_MIN_QTY)
        .select(F.col("l_partkey").alias("key"))
        .distinct()
    )
    probes = (
        read_table(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("key"))
        .distinct()
    )
    mi = F.explode(
        F.array(
            *[
                F.struct(F.lit(m).alias("m"), F.lit(i).alias("i"))
                for m in BLOOM_SWEEP_BITS
                for i in range(3)
            ]
        )
    ).alias("mi")

    def pos(key: Column) -> Column:
        return (
            portable_hash60(
                F.concat(
                    F.col("mi.i").cast("string"),
                    F.lit(":"),
                    key.cast("string"),
                )
            )
            % F.col("mi.m")
        )

    setbits = (
        members.select("key", mi)
        .select(F.col("mi.m").alias("m"), pos(F.col("key")).alias("pos"))
        .distinct()
    )
    probebits = probes.select("key", mi).select(
        "key",
        F.col("mi.m").alias("m"),
        F.col("mi.i").alias("i"),
        pos(F.col("key")).alias("pos"),
    )
    hits = (
        probebits.alias("p")
        .join(
            setbits.alias("s"),
            (F.col("p.m") == F.col("s.m")) & (F.col("p.pos") == F.col("s.pos")),
            "left",
        )
        .groupBy(F.col("p.key").alias("key"), F.col("p.m").alias("m"))
        .agg(F.count(F.col("s.pos")).alias("n_set"))
    )
    judged = hits.join(
        members.withColumnRenamed("key", "mkey"),
        F.col("key") == F.col("mkey"),
        "left",
    ).select(
        "m",
        (F.col("n_set") == 3).alias("claimed"),
        F.col("mkey").isNotNull().alias("is_member"),
    )
    c, mem = F.col("claimed"), F.col("is_member")
    return (
        judged.groupBy(F.col("m").alias("m_bits"))
        .agg(
            F.count(F.when(mem, 1)).cast("bigint").alias("n_members"),
            F.count(F.when(~mem, 1)).cast("bigint").alias("n_nonmembers"),
            F.count(F.when(c & ~mem, 1))
            .cast("bigint")
            .alias("n_false_positives"),
            F.count(F.when(mem & ~c, 1))
            .cast("bigint")
            .alias("n_false_negatives"),
            F.round(
                F.count(F.when(c & ~mem, 1)).cast("double")
                / F.count(F.when(~mem, 1)),
                6,
            ).alias("fpr"),
        )
        .orderBy("m_bits")
    )


_fmt(
    q_bloom_fpr_sweep,
    BLOOM_SWEEP_BITS=BLOOM_SWEEP_BITS,
    BLOOM_SWEEP_MIN_QTY=BLOOM_SWEEP_MIN_QTY,
)
