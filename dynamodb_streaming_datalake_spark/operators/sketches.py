"""Mergeable streaming sketches: Count-Min and HyperLogLog, built as
first-class DataFrame operators with exact cross-engine oracles.

The reference pipeline has no analytics at all (its Lambda is a pure
record-shape transform, ``/root/reference/resources/firehose_transformation.py``),
but any 100 TB lake needs cardinality and frequency answers that don't
cost a full shuffle of the key space. Spark ships
``approx_count_distinct`` (HLL++) as a black box; these operators build
the sketch *as data* — a tiny table of (register, value) rows — because
that is what a production lake actually stores: per-partition sketch
tables that merge across days/files with a groupBy, no raw re-scan.

Design rules that make the hash gate possible:

* hashing is the portable md5-based :func:`portable_hash60`, identical
  in DuckDB;
* every aggregate is order-independent (MIN / MAX / integer SUM), so
  results are partitioning-invariant;
* the HLL harmonic mean is computed as an exact *integer* sum of
  power-of-two terms (``1 << (52 - M)``) with a single final float
  division — no float accumulation anywhere, so the estimate is
  bit-identical on any engine and any cluster size.

Scale: both sketches are O(1)-sized regardless of input rows (CMS:
D*W cells; HLL: m registers). Build is one map-side-combined groupBy
over a constant explosion factor; merge across shards/days is the same
groupBy again. Estimation joins are broadcasts of the sketch table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table
from dynamodb_streaming_datalake_spark.functions.texthash import (
    portable_hash60,
    sql_portable_hash60,
)

# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

#: sketch depth (number of independent hash rows — error prob ~ e^-D)
CMS_DEPTH = 4
#: sketch width (columns per row — overcount ~ N/W per cell)
CMS_WIDTH = 256
#: Mersenne prime for the affine universal-hash family (same family the
#: minhash signatures use, dedup.py)
CMS_P = 2_147_483_647
#: per-depth affine coefficients m_d(h) = (A[d]*h + B[d]) % P % W —
#: small odd constants, pairwise distinct
CMS_A = (131, 137, 139, 149)
CMS_B = (17, 29, 41, 53)


def cms_cells(keyed: DataFrame, key: str) -> DataFrame:
    """Explode each row into its CMS_DEPTH (depth, col) cells.

    One md5 per row, then D affine maps computed row-locally — the
    constant ×D blow-up happens *before* the map-side combine, so the
    shuffle carries at most D*W counter rows per task, not D*N.
    """
    h = (portable_hash60(F.col(key).cast("string")) % CMS_P).alias("h")
    base = keyed.select(h)
    pairs = F.array(
        *[
            F.struct(
                F.lit(d).alias("depth"),
                ((F.lit(a) * F.col("h") + F.lit(b)) % CMS_P % CMS_WIDTH).alias(
                    "col"
                ),
            )
            for d, (a, b) in enumerate(zip(CMS_A, CMS_B))
        ]
    )
    return base.select(F.explode(pairs).alias("c")).select("c.depth", "c.col")


def cms_build(keyed: DataFrame, key: str) -> DataFrame:
    """The sketch itself: ≤ D*W rows of (depth, col, cnt). Mergeable:
    union two sketches and re-groupBy-sum to combine days/shards."""
    return (
        cms_cells(keyed, key)
        .groupBy("depth", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _sql_cms_cell(depth: int, expr: str) -> str:
    a, b = CMS_A[depth], CMS_B[depth]
    return (
        f"(({a} * ({sql_portable_hash60(expr)} % {CMS_P}) + {b})"
        f" % {CMS_P} % {CMS_WIDTH})"
    )


#: the shared heavy-hitter oracle — the batch build here and the
#: stream-folded build (streaming/sketchview.py, q_cms_stream) answer
#: the identical contract, which is the mergeability proof
SQL_CMS_HEAVY_HITTERS = f"""
    WITH cells AS (
        SELECT d.depth,
               CASE d.depth
                 WHEN 0 THEN {_sql_cms_cell(0, "CAST(user_id AS VARCHAR)")}
                 WHEN 1 THEN {_sql_cms_cell(1, "CAST(user_id AS VARCHAR)")}
                 WHEN 2 THEN {_sql_cms_cell(2, "CAST(user_id AS VARCHAR)")}
                 WHEN 3 THEN {_sql_cms_cell(3, "CAST(user_id AS VARCHAR)")}
               END AS col
        FROM events, (SELECT UNNEST(range(0, {CMS_DEPTH})) AS depth) d
    ),
    sketch AS (
        SELECT depth, col, COUNT(*) AS cnt FROM cells GROUP BY depth, col
    ),
    exact AS (
        SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY user_id
    ),
    probes AS (
        SELECT user_id, exact_cnt, d.depth,
               CASE d.depth
                 WHEN 0 THEN {_sql_cms_cell(0, "CAST(user_id AS VARCHAR)")}
                 WHEN 1 THEN {_sql_cms_cell(1, "CAST(user_id AS VARCHAR)")}
                 WHEN 2 THEN {_sql_cms_cell(2, "CAST(user_id AS VARCHAR)")}
                 WHEN 3 THEN {_sql_cms_cell(3, "CAST(user_id AS VARCHAR)")}
               END AS col
        FROM exact, (SELECT UNNEST(range(0, {CMS_DEPTH})) AS depth) d
    ),
    est AS (
        SELECT p.user_id, p.exact_cnt, MIN(s.cnt) AS cms_est
        FROM probes p JOIN sketch s USING (depth, col)
        GROUP BY p.user_id, p.exact_cnt
    )
    SELECT user_id, exact_cnt, cms_est, cms_est - exact_cnt AS overcount
    FROM est
    ORDER BY exact_cnt DESC, user_id
    LIMIT 20
"""


def cms_estimate(exact: DataFrame, sketch: DataFrame, key: str) -> DataFrame:
    """Answer per-key frequency estimates from a sketch table: probe
    each key's D cells, MIN over depths, alongside the caller-supplied
    exact count (the eval column). Broadcast join — the sketch is tiny
    by construction. Shared by the batch query and the streaming view
    (streaming/sketchview.py)."""
    h = (portable_hash60(F.col(key).cast("string")) % CMS_P).alias("h")
    pairs = F.array(
        *[
            F.struct(
                F.lit(d).alias("depth"),
                ((F.lit(a) * F.col("h") + F.lit(b)) % CMS_P % CMS_WIDTH).alias(
                    "col"
                ),
            )
            for d, (a, b) in enumerate(zip(CMS_A, CMS_B))
        ]
    )
    probes = (
        exact.select(key, "exact_cnt", h)
        .select(key, "exact_cnt", F.explode(pairs).alias("c"))
        .select(key, "exact_cnt", "c.depth", "c.col")
    )
    est = (
        probes.join(F.broadcast(sketch), ["depth", "col"])
        .groupBy(key, "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        est.select(
            key,
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.col("exact_cnt").desc(), key)
        .limit(20)
    )


@query("q_cms_heavy_hitters", oracle=SQL_CMS_HEAVY_HITTERS)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation over the events stream:
    build a {CMS_DEPTH}x{CMS_WIDTH} counter sketch of user_id
    occurrences, then answer the top-20 heavy hitters from the SKETCH
    (min over the {CMS_DEPTH} hashed counters), reporting the exact
    count next to the estimate so the one-sided error
    (``overcount >= 0``) is visible in the result itself.

    Scale: the sketch is {CMS_DEPTH}*{CMS_WIDTH} cells no matter how
    many events flow through — per-day shards each build their own
    sketch with a map-side-combined groupBy and merge by summing cells;
    estimation broadcasts the tiny sketch table. The exact column is
    the eval harness (same pattern as q_retrieval_eval's brute-force
    truth); a deployment keeps only the sketch."""
    ev = read_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return cms_estimate(exact, sketch, "user_id")


_fmt(q_cms_heavy_hitters, CMS_DEPTH=CMS_DEPTH, CMS_WIDTH=CMS_WIDTH)



# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

#: register-count exponent: m = 2**HLL_P registers
HLL_P = 9
HLL_M = 1 << HLL_P
#: bits of the 60-bit portable hash left after the bucket index
HLL_W_BITS = 60 - HLL_P  # 51
#: max rho value (all-zero remainder)
HLL_RHO_MAX = HLL_W_BITS + 1  # 52


def hll_registers(keyed: DataFrame, key: str) -> DataFrame:
    """(bucket, m) register table: bucket = low HLL_P hash bits, m =
    max leading-zero rank of the remaining bits (exact bin()-length
    trick). Shared by the batch query and the streaming view
    (streaming/sketchview.py); merges with groupBy(bucket).MAX."""
    h = keyed.select(
        portable_hash60(F.col(key).cast("string")).alias("hv")
    ).distinct()
    return (
        h.select(
            (F.col("hv") % HLL_M).alias("bucket"),
            F.when(F.expr(f"hv div {HLL_M}") == 0, F.lit(HLL_RHO_MAX))
            .otherwise(
                F.lit(HLL_RHO_MAX)
                - F.length(F.bin(F.expr(f"hv div {HLL_M}")))
            )
            .alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_estimate(reg: DataFrame, exact: DataFrame) -> DataFrame:
    """One-row estimate from a register table (+ the caller's exact
    count as the eval column): integer power-of-two harmonic sum, one
    final float division — bit-identical on any engine/partitioning."""
    s = reg.agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - m)")
        ).alias("present_sum"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / float(HLL_M))
    return s.crossJoin(exact).select(
        F.lit(HLL_M).cast("int").alias("n_registers"),
        (F.lit(HLL_M) - F.col("n_present")).cast("int").alias(
            "n_zero_registers"
        ),
        "exact_distinct",
        (
            F.lit(alpha)
            * F.lit(float(HLL_M))
            * F.lit(float(HLL_M))
            * F.shiftleft(F.lit(1).cast("bigint"), HLL_RHO_MAX)
            / (
                F.col("present_sum")
                + (F.lit(HLL_M).cast("bigint") - F.col("n_present"))
                * F.shiftleft(F.lit(1).cast("bigint"), HLL_RHO_MAX)
            )
        ).alias("hll_estimate"),
    )


@query(
    "q_hll_distinct",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT {sql_portable_hash60("CAST(l_orderkey AS VARCHAR)")}
               AS hv
        FROM lineitem
    ),
    reg AS (
        SELECT hv % {HLL_M} AS bucket,
               MAX(CASE WHEN hv // {HLL_M} = 0 THEN {HLL_RHO_MAX}
                        ELSE {HLL_RHO_MAX} - length(bin(hv // {HLL_M}))
                   END) AS m
        FROM h GROUP BY hv % {HLL_M}
    ),
    s AS (
        SELECT COUNT(*) AS n_present,
               SUM(1::BIGINT << ({HLL_RHO_MAX} - m)) AS present_sum
        FROM reg
    ),
    ex AS (
        SELECT COUNT(DISTINCT l_orderkey) AS exact_distinct FROM lineitem
    )
    SELECT CAST({HLL_M} AS INT) AS n_registers,
           CAST({HLL_M} - n_present AS INT) AS n_zero_registers,
           ex.exact_distinct,
           (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
             * (1::BIGINT << {HLL_RHO_MAX})
             / (present_sum + ({HLL_M} - n_present)
                              * (1::BIGINT << {HLL_RHO_MAX}))
             AS hll_estimate
    FROM s, ex
    """,
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog cardinality of distinct order keys in lineitem,
    built as an explicit {HLL_M}-register table (bucket = low {HLL_P}
    hash bits, rho = leading-zero rank of the remaining {HLL_W_BITS}
    bits via the exact ``bin()``-length trick — no float log anywhere).

    The harmonic mean is computed exactly: each register contributes
    the INTEGER ``1 << (52 - M_j)``, absent registers contribute
    ``1 << 52``, and the bigint sum feeds ONE final float division —
    so the estimate is bit-identical across engines and partitionings
    (a float ``sum(2^-M)`` would be neither). Raw HLL estimate (no
    small-range linear-counting branch — that needs ln(), which is not
    cross-engine exact; n_zero_registers is reported so a caller can
    apply it).

    Scale: the register table is m={HLL_M} rows regardless of input;
    per-shard register tables merge with ``groupBy(bucket).max(m)`` —
    the same union-merge a 1000-file lake runs nightly. One shuffle of
    (bucket, rho) pairs with map-side MAX combine."""
    li = read_table(spark, sf_dir, "lineitem")
    reg = hll_registers(li, "l_orderkey")
    ex = li.agg(F.countDistinct("l_orderkey").alias("exact_distinct"))
    return hll_estimate(reg, ex)


_fmt(
    q_hll_distinct,
    HLL_M=HLL_M,
    HLL_P=HLL_P,
    HLL_W_BITS=HLL_W_BITS,
)


# ---------------------------------------------------------------------------
# hash-sampled quantile estimation (round 8)
# ---------------------------------------------------------------------------
# The deterministic alternative to t-digest when reproducibility is the
# constraint: estimate quantiles from the deterministic 10% hash sample
# (operators.sampling's cutoff idiom — same rows on any cluster, any
# engine) and report the error against the exact full-data percentile
# in the same row. approx_percentile stays engine-specific (tested in
# test_plans); this estimator is portable enough to sit under the hash
# gate, eval harness included.

#: sample rate numerator over sampling.DENOM
QSK_RATE = 100_000  # 10%
QSK_PS = (0.5, 0.9, 0.99)


@query(
    "q_quantile_sketch",
    oracle=f"""
    WITH s AS (
        SELECT value FROM events
        WHERE (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT)
              % 1000000 < {QSK_RATE}
    ),
    agg AS (
        SELECT quantile_cont(value, [0.5, 0.9, 0.99]) AS ex,
               (SELECT quantile_cont(value, [0.5, 0.9, 0.99]) FROM s) AS sa
        FROM events
    )
    SELECT p.p AS percentile,
           round(agg.ex[p.i], 6) AS exact_v,
           round(agg.sa[p.i], 6) AS sample_v,
           round(abs(agg.ex[p.i] - agg.sa[p.i]), 6) AS abs_err
    FROM agg, (VALUES (1, 0.5), (2, 0.9), (3, 0.99)) p(i, p)
    """,
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from the deterministic 10% hash sample of
    events, with per-percentile error against the exact full-data
    quantile in the same row (p50/p90/p99). Both quantiles are the
    linear-interpolated exact form (Spark ``percentile`` == DuckDB
    ``quantile_cont``); the SAMPLE is what makes it cheap at scale —
    and because membership is a hash cutoff, the estimate is
    bit-reproducible on any cluster, unlike ``df.sample``.

    Scale: the sample filter is a row-local hash predicate fused into
    the scan; both aggregates buffer only percentile state. For
    single groups beyond executor memory, approx_percentile is the
    fallback (engine-specific, pinned in tests instead)."""
    from dynamodb_streaming_datalake_spark.operators.sampling import (
        hash_bucket,
    )

    e = read_table(spark, sf_dir, "events")
    ps = list(QSK_PS)
    full = e.agg(
        F.percentile("value", F.array(*[F.lit(p) for p in ps])).alias("ex")
    )
    samp = e.where(hash_bucket(F.col("event_id")) < QSK_RATE).agg(
        F.percentile("value", F.array(*[F.lit(p) for p in ps])).alias("sa")
    )
    pframe = spark.createDataFrame(
        [(i + 1, p) for i, p in enumerate(ps)], "i int, p double"
    )
    j = full.crossJoin(samp).crossJoin(F.broadcast(pframe))
    ex = F.element_at("ex", F.col("i"))
    sa = F.element_at("sa", F.col("i"))
    return j.select(
        F.col("p").alias("percentile"),
        F.round(ex, 6).alias("exact_v"),
        F.round(sa, 6).alias("sample_v"),
        F.round(F.abs(ex - sa), 6).alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# ANALYZE-style NDV statistics (round 8)
# ---------------------------------------------------------------------------
# The catalog-statistics pass every optimizer depends on (ANALYZE TABLE
# ... COMPUTE STATISTICS): per-column distinct-value estimates. Here
# each column runs through the SAME portable HLL register kernel the
# cardinality query uses, with the exact NDV alongside — the stats
# table a CBO would consume, as an oracle-checked operator.

NDV_COLUMNS = ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")


def _sql_ndv_one(col: str) -> str:
    return f"""
    SELECT '{col}' AS col_name,
           (SELECT COUNT(DISTINCT {col}) FROM lineitem) AS exact_ndv,
           CAST({HLL_M} - n_present AS INT) AS n_zero_registers,
           (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
             * (1::BIGINT << {HLL_RHO_MAX})
             / (present_sum + ({HLL_M} - n_present)
                              * (1::BIGINT << {HLL_RHO_MAX}))
             AS hll_ndv
    FROM (
        SELECT COUNT(*) AS n_present,
               SUM(1::BIGINT << ({HLL_RHO_MAX} - m)) AS present_sum
        FROM (
            SELECT hv % {HLL_M} AS bucket,
                   MAX(CASE WHEN hv // {HLL_M} = 0 THEN {HLL_RHO_MAX}
                            ELSE {HLL_RHO_MAX} - length(bin(hv // {HLL_M}))
                       END) AS m
            FROM (
                SELECT DISTINCT
                       {sql_portable_hash60(f"CAST({col} AS VARCHAR)")} AS hv
                FROM lineitem
            )
            GROUP BY hv % {HLL_M}
        )
    )
    """


@query(
    "q_analyze_ndv",
    oracle=f"""
    SELECT col_name, CAST(exact_ndv AS BIGINT) AS exact_ndv,
           n_zero_registers, hll_ndv
    FROM ({" UNION ALL ".join(_sql_ndv_one(c) for c in NDV_COLUMNS)})
    ORDER BY col_name
    """,
)
def q_analyze_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics: per-column HLL NDV estimates
    for lineitem's key columns with the exact distinct count alongside
    — the stats table a cost-based optimizer consumes for join
    ordering and broadcast decisions, produced by the same portable
    register kernel as q_hll_distinct (one pass per column here; a
    production sweep fuses all columns into one scan with per-column
    register states, the same mergeable shape).

    The low-cardinality columns (l_linenumber: 7 exact vs ~371
    estimated) deliberately EXPOSE raw HLL's known small-range bias —
    the regime where the linear-counting correction applies (skipped
    here because ln() is not cross-engine exact; see q_hll_distinct).
    A consumer applies it from the reported n_zero_registers; the
    exact column keeps the bias measurable instead of hidden.

    Scale: per column, one (bucket, rho) shuffle with map-side MAX
    combine into a 512-row register table; estimates are single-row
    integer-sum folds. NDVs for every column of a 100 TB table cost a
    constant-size sketch each, not a COUNT(DISTINCT) sort."""
    li = read_table(spark, sf_dir, "lineitem")
    out = None
    for col in NDV_COLUMNS:
        reg = hll_registers(li, col)
        ex = li.agg(F.countDistinct(col).alias("exact_distinct"))
        one = hll_estimate(reg, ex).select(
            F.lit(col).alias("col_name"),
            F.col("exact_distinct").cast("bigint").alias("exact_ndv"),
            "n_zero_registers",
            F.col("hll_estimate").alias("hll_ndv"),
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("col_name")


# ---------------------------------------------------------------------------
# CBO-style join cardinality estimation (round 8)
# ---------------------------------------------------------------------------
# What an optimizer DOES with q_analyze_ndv's stats: estimate a join's
# output size as |L| * |R| / max(ndv_L, ndv_R) (the textbook
# uniform-containment formula) — surfaced with the actual join count
# alongside, the eval-harness pattern once more. At 100 TB this row is
# the difference between planning a broadcast and melting an exchange.


@query(
    "q_join_estimate",
    oracle=f"""
    WITH lh AS (
        SELECT t.n_l,
               (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
                 * (1::BIGINT << {HLL_RHO_MAX})
                 / (present_sum + ({HLL_M} - n_present)
                                  * (1::BIGINT << {HLL_RHO_MAX}))
                 AS ndv_l
        FROM (SELECT COUNT(*) AS n_present,
                     SUM(1::BIGINT << ({HLL_RHO_MAX} - m)) AS present_sum
              FROM (SELECT hv % {HLL_M} AS bucket,
                           MAX(CASE WHEN hv // {HLL_M} = 0
                                    THEN {HLL_RHO_MAX}
                                    ELSE {HLL_RHO_MAX}
                                         - length(bin(hv // {HLL_M})) END)
                             AS m
                    FROM (SELECT DISTINCT
                                 {sql_portable_hash60("CAST(l_orderkey AS VARCHAR)")}
                                   AS hv
                          FROM lineitem)
                    GROUP BY hv % {HLL_M})) s,
             (SELECT COUNT(*) AS n_l FROM lineitem) t
    ),
    rh AS (
        SELECT t.n_r,
               (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
                 * (1::BIGINT << {HLL_RHO_MAX})
                 / (present_sum + ({HLL_M} - n_present)
                                  * (1::BIGINT << {HLL_RHO_MAX}))
                 AS ndv_r
        FROM (SELECT COUNT(*) AS n_present,
                     SUM(1::BIGINT << ({HLL_RHO_MAX} - m)) AS present_sum
              FROM (SELECT hv % {HLL_M} AS bucket,
                           MAX(CASE WHEN hv // {HLL_M} = 0
                                    THEN {HLL_RHO_MAX}
                                    ELSE {HLL_RHO_MAX}
                                         - length(bin(hv // {HLL_M})) END)
                             AS m
                    FROM (SELECT DISTINCT
                                 {sql_portable_hash60("CAST(o_orderkey AS VARCHAR)")}
                                   AS hv
                          FROM orders)
                    GROUP BY hv % {HLL_M})) s,
             (SELECT COUNT(*) AS n_r FROM orders) t
    ),
    act AS (
        SELECT COUNT(*) AS actual_rows
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT CAST(lh.n_l AS BIGINT) AS n_left,
           CAST(rh.n_r AS BIGINT) AS n_right,
           lh.ndv_l AS ndv_left,
           rh.ndv_r AS ndv_right,
           lh.n_l * rh.n_r / GREATEST(lh.ndv_l, rh.ndv_r) AS est_rows,
           CAST(act.actual_rows AS BIGINT) AS actual_rows,
           lh.n_l * rh.n_r / GREATEST(lh.ndv_l, rh.ndv_r)
             / act.actual_rows AS est_over_actual
    FROM lh, rh, act
    """,
)
def q_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBO-style join cardinality estimation for lineitem ⋈ orders on
    the order key: est = |L| x |R| / max(ndv_L, ndv_R), NDVs from the
    portable HLL register kernel (q_analyze_ndv's stats put to their
    actual use), with the TRUE join count and the over/under ratio in
    the same row — the eval-harness discipline applied to the
    optimizer's own arithmetic.

    Scale: two constant-size register sketches + three single-row
    aggregates; the actual-count column is the eval side (a deployment
    estimates precisely to AVOID running the join first)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    lh = hll_estimate(
        hll_registers(li, "l_orderkey"),
        li.agg(F.count(F.lit(1)).alias("exact_distinct")),
    ).select(
        F.col("exact_distinct").alias("n_l"),
        F.col("hll_estimate").alias("ndv_l"),
    )
    rh = hll_estimate(
        hll_registers(orders, "o_orderkey"),
        orders.agg(F.count(F.lit(1)).alias("exact_distinct")),
    ).select(
        F.col("exact_distinct").alias("n_r"),
        F.col("hll_estimate").alias("ndv_r"),
    )
    act = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    est = F.col("n_l") * F.col("n_r") / F.greatest("ndv_l", "ndv_r")
    return (
        lh.crossJoin(rh)
        .crossJoin(act)
        .select(
            F.col("n_l").cast("bigint").alias("n_left"),
            F.col("n_r").cast("bigint").alias("n_right"),
            F.col("ndv_l").alias("ndv_left"),
            F.col("ndv_r").alias("ndv_right"),
            est.alias("est_rows"),
            F.col("actual_rows").cast("bigint").alias("actual_rows"),
            (est / F.col("actual_rows")).alias("est_over_actual"),
        )
    )


# ---------------------------------------------------------------------------
# Theta / KMV distinct sketch (round 9)
# ---------------------------------------------------------------------------
# Completes the mergeable-sketch family with the one answer CMS/HLL
# cannot give: SET-INTERSECTION estimates (audience overlap, join-key
# intersection sizing before a join). A KMV (k-minimum-values) sketch
# keeps the K smallest distinct hash values of a set; theta = the K-th
# smallest acts as the sampling threshold, so any two sketches compare
# below min(theta_a, theta_b) — the Theta-sketch set algebra
# (Dasgupta et al., "Theta-Sketch Framework", and the DataSketches
# library design). Everything below is integer (top-k by hash, MIN /
# MAX, set membership) until one final float division per estimate, so
# the DuckDB oracle replays it bit-exactly.

#: sketch size (minimum hash values kept per set)
THETA_K = 256
#: 60-bit hash space of portable_hash60 (exactly representable as a
#: double: a single power of two)
THETA_HSPACE = 1 << 60


def kmv_sketch(keyed: DataFrame, key: str, k: int = THETA_K) -> DataFrame:
    """The K smallest distinct hashes of ``keyed[key]`` — a 1-column
    ``h`` table of at most K rows. Plan shape: distinct + orderBy.limit
    = TakeOrderedAndProject (distributed per-partition partial top-k,
    no global sort). Mergeable: the KMV of a union is the K smallest of
    the unioned sketches — an associative, commutative, idempotent
    monoid, which is what the streaming view folds
    (streaming/sketchview.py)."""
    h = keyed.select(
        portable_hash60(F.col(key).cast("string")).alias("h")
    ).distinct()
    return h.orderBy("h").limit(k)


def kmv_merge(a: DataFrame, b: DataFrame, k: int = THETA_K) -> DataFrame:
    """Union two KMV sketch tables and keep the K smallest — the monoid
    op. Inputs are <=K rows each, so the union is bounded."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def theta_overlap(
    sa: DataFrame, sb: DataFrame, exact: DataFrame, k: int = THETA_K
) -> DataFrame:
    """One-row overlap report from two KMV sketches plus a caller-built
    1-row ``exact`` frame (exact_a, exact_b, exact_intersection — the
    eval columns). All sketch-side arithmetic is integer; each estimate
    is count * 2^60 / theta with exactly one float division, identical
    in the oracle."""
    ta = sa.agg(
        F.when(F.count(F.lit(1)) < k, F.lit(THETA_HSPACE))
        .otherwise(F.max("h"))
        .alias("theta_a")
    )
    tb = sb.agg(
        F.when(F.count(F.lit(1)) < k, F.lit(THETA_HSPACE))
        .otherwise(F.max("h"))
        .alias("theta_b")
    )
    th = ta.crossJoin(tb).select(
        "theta_a", "theta_b", F.least("theta_a", "theta_b").alias("theta")
    )
    both = sa.select("h", F.lit("a").alias("side")).unionByName(
        sb.select("h", F.lit("b").alias("side"))
    )
    # per-side sample sizes under each side's own theta (for the
    # per-set estimates), and the cross-set counts under the shared
    # theta (for intersection / union / jaccard)
    samp = both.crossJoin(F.broadcast(th)).agg(
        F.sum(
            F.when(
                (F.col("side") == "a") & (F.col("h") < F.col("theta_a")), 1
            ).otherwise(0)
        ).alias("na_sample"),
        F.sum(
            F.when(
                (F.col("side") == "b") & (F.col("h") < F.col("theta_b")), 1
            ).otherwise(0)
        ).alias("nb_sample"),
    )
    below = (
        both.crossJoin(F.broadcast(th))
        .where(F.col("h") < F.col("theta"))
        .groupBy("h")
        .agg(F.countDistinct("side").alias("ns"))
    )
    cnts = below.agg(
        F.count(F.lit(1)).alias("union_cnt"),
        F.sum(F.when(F.col("ns") == 2, 1).otherwise(0)).alias("inter_cnt"),
    )
    hs = F.lit(float(THETA_HSPACE))

    def est(cnt, theta):
        return F.round(
            F.col(cnt).cast("double") * hs / F.col(theta).cast("double"), 6
        )

    return (
        th.crossJoin(samp)
        .crossJoin(cnts)
        .crossJoin(exact)
        .select(
            F.lit(k).cast("int").alias("k"),
            F.col("theta").cast("bigint").alias("theta"),
            F.col("exact_a").cast("bigint").alias("exact_a"),
            est("na_sample", "theta_a").alias("est_a"),
            F.col("exact_b").cast("bigint").alias("exact_b"),
            est("nb_sample", "theta_b").alias("est_b"),
            F.col("exact_intersection").cast("bigint").alias(
                "exact_intersection"
            ),
            est("inter_cnt", "theta").alias("est_intersection"),
            est("union_cnt", "theta").alias("est_union"),
            F.round(
                F.col("inter_cnt").cast("double")
                / F.col("union_cnt").cast("double"),
                6,
            ).alias("jaccard_est"),
        )
    )


def _sql_kmv(name: str, pred: str) -> str:
    h = sql_portable_hash60("CAST(o_custkey AS VARCHAR)")
    return f"""
    {name} AS (
        SELECT h FROM (
            SELECT DISTINCT {h} AS h FROM orders WHERE {pred}
        ) ORDER BY h LIMIT {THETA_K}
    )"""


SQL_THETA_OVERLAP = f"""
    WITH {_sql_kmv("sa", "o_orderstatus = 'F'")},
    {_sql_kmv("sb", "o_orderstatus = 'O'")},
    ta AS (
        SELECT CASE WHEN COUNT(*) < {THETA_K} THEN {THETA_HSPACE}
                    ELSE MAX(h) END AS theta_a FROM sa
    ),
    tb AS (
        SELECT CASE WHEN COUNT(*) < {THETA_K} THEN {THETA_HSPACE}
                    ELSE MAX(h) END AS theta_b FROM sb
    ),
    th AS (
        SELECT theta_a, theta_b, LEAST(theta_a, theta_b) AS theta
        FROM ta, tb
    ),
    both_s AS (
        SELECT h, 'a' AS side FROM sa
        UNION ALL SELECT h, 'b' FROM sb
    ),
    samp AS (
        SELECT CAST(SUM(CASE WHEN side = 'a' AND h < theta_a
                             THEN 1 ELSE 0 END) AS BIGINT) AS na_sample,
               CAST(SUM(CASE WHEN side = 'b' AND h < theta_b
                             THEN 1 ELSE 0 END) AS BIGINT) AS nb_sample
        FROM both_s, th
    ),
    below AS (
        SELECT h, COUNT(DISTINCT side) AS ns
        FROM both_s, th WHERE h < theta GROUP BY h
    ),
    cnts AS (
        SELECT COUNT(*) AS union_cnt,
               CAST(SUM(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS inter_cnt
        FROM below
    ),
    exact AS (
        SELECT
          (SELECT COUNT(DISTINCT o_custkey) FROM orders
           WHERE o_orderstatus = 'F') AS exact_a,
          (SELECT COUNT(DISTINCT o_custkey) FROM orders
           WHERE o_orderstatus = 'O') AS exact_b,
          (SELECT COUNT(*) FROM
             (SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderstatus = 'F') x
           JOIN
             (SELECT DISTINCT o_custkey FROM orders
              WHERE o_orderstatus = 'O') y
           USING (o_custkey)) AS exact_intersection
    )
    SELECT CAST({THETA_K} AS INT) AS k,
           CAST(theta AS BIGINT) AS theta,
           exact_a,
           round(CAST(na_sample AS DOUBLE) * {float(THETA_HSPACE)!r}
                 / CAST(theta_a AS DOUBLE), 6) AS est_a,
           exact_b,
           round(CAST(nb_sample AS DOUBLE) * {float(THETA_HSPACE)!r}
                 / CAST(theta_b AS DOUBLE), 6) AS est_b,
           exact_intersection,
           round(CAST(inter_cnt AS DOUBLE) * {float(THETA_HSPACE)!r}
                 / CAST(theta AS DOUBLE), 6) AS est_intersection,
           round(CAST(union_cnt AS DOUBLE) * {float(THETA_HSPACE)!r}
                 / CAST(theta AS DOUBLE), 6) AS est_union,
           round(CAST(inter_cnt AS DOUBLE) / CAST(union_cnt AS DOUBLE), 6)
             AS jaccard_est
    FROM th, samp, cnts, exact
"""


@query("q_theta_distinct", oracle=SQL_THETA_OVERLAP)
def q_theta_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap via Theta/KMV sketches: the customers holding
    finished ('F') orders vs those holding open ('O') orders, each
    summarized as its {THETA_K} minimum distinct hash values. The one
    row reports, for each audience and for their intersection/union,
    the sketch estimate NEXT to the exact count (the eval columns —
    same harness pattern as q_cms_heavy_hitters / q_retrieval_eval),
    plus the Jaccard estimate.

    Set algebra: theta = min of the per-side K-th-smallest hashes;
    every estimate is |sample below theta| * 2^60 / theta — integers
    end to end with one final float division, so the DuckDB oracle
    replays the sketch bit-exactly (2^60 is a single power of two,
    exactly representable as a double; bigint->double casts are IEEE
    round-half-even on both engines).

    Scale: each sketch is <=K rows regardless of input (built as a
    distributed partial top-k, TakeOrderedAndProject — no global
    sort); per-shard sketches merge with union + re-top-k (the monoid
    ``kmv_merge``, folded incrementally by q_theta_stream's view);
    the overlap report touches only the <=2K sketch rows."""
    orders = read_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F")
    b = orders.where(F.col("o_orderstatus") == "O")
    sa = kmv_sketch(a, "o_custkey")
    sb = kmv_sketch(b, "o_custkey")
    exact = (
        a.agg(F.countDistinct("o_custkey").alias("exact_a"))
        .crossJoin(b.agg(F.countDistinct("o_custkey").alias("exact_b")))
        .crossJoin(
            a.select("o_custkey")
            .distinct()
            .join(b.select("o_custkey").distinct(), "o_custkey")
            .agg(F.count(F.lit(1)).alias("exact_intersection"))
        )
    )
    return theta_overlap(sa, sb, exact)


_fmt(q_theta_distinct, THETA_K=THETA_K)


# ---------------------------------------------------------------------------
# KLL-style mergeable quantile sketch (round 9)
# ---------------------------------------------------------------------------
# The production shape for per-shard percentile merging that
# q_quantile_sketch's hash sample is not: every shard compacts its
# values to a BOUNDED weighted summary, summaries union into one
# bounded sketch table, and quantiles come from weighted ranks over
# that sketch — with a deterministic worst-case rank-error bound
# carried in the result row. The compactor is the KLL/MRL idea
# (Karnin-Lang-Liberty compaction = keep every 2nd item of a sorted
# buffer, double its weight) run to its batch fixed point: a shard of
# n values fully compacts to the items at sorted ranks 1, 1+s, 1+2s,
# ... with s the smallest power of two such that ceil(n/s) fits the
# capacity — each surviving item carrying weight s. Deterministic (no
# KLL random offset — we need the oracle to replay it), exact-integer
# throughout: ranks, strides, weights, cumulative weights are all
# integers; the only floats are the final value columns and the
# interpolated-exact eval column (F.percentile == quantile_cont,
# proven portable by q_value_percentiles).

#: shards (parallel compactors); a cluster raises this with input size
KLL_P = 8
#: per-shard survivor capacity
KLL_C = 128
#: answered percentiles
KLL_PS = (0.5, 0.9, 0.99)


def kll_sketch(
    ev: DataFrame, n_shards: int = KLL_P, cap: int = KLL_C
) -> DataFrame:
    """(shard, value, event_id, weight) — the merged bounded summary:
    <= n_shards * cap rows no matter the input size. Per-shard local
    sort (window partitioned by shard — each shard sorts
    independently, the distributed-quantile shape), stride selection
    by integer bit-length (the ``bin()``-length trick, no float log),
    strided survivor pick."""
    t = ev.select(
        (portable_hash60(F.col("event_id").cast("string")) % n_shards).alias(
            "shard"
        ),
        "value",
        "event_id",
    )
    w = Window.partitionBy("shard").orderBy("value", "event_id")
    ranked = t.withColumn("r", F.row_number().over(w))
    # smallest power of two s with ceil(cnt/cap) <= s, by integer
    # bit-length (shiftleft needs an expr — its Python wrapper only
    # accepts a literal shift amount)
    strides = (
        t.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "shard",
            "cnt",
            F.expr(
                f"CASE WHEN (cnt + {cap - 1}) div {cap} <= 1"
                f" THEN CAST(1 AS BIGINT)"
                f" ELSE shiftleft(CAST(1 AS BIGINT),"
                f"   length(bin((cnt + {cap - 1}) div {cap} - 1)))"
                f" END"
            ).alias("stride"),
        )
    )
    return (
        ranked.join(F.broadcast(strides), "shard")
        .where((F.col("r") - 1) % F.col("stride") == 0)
        .select("shard", "value", "event_id", F.col("stride").alias("weight"))
    )


#: the sketch-construction CTEs (t/ranked/strides/sk/tot/cum) shared by
#: q_kll_quantiles and q_kll_binning — one sketch definition, two
#: consumers, so the binning oracle replays the identical compaction
_SQL_KLL_CORE = f"""t AS (
        SELECT {sql_portable_hash60("CAST(event_id AS VARCHAR)")} % {KLL_P}
                 AS shard,
               value, event_id
        FROM events
    ),
    ranked AS (
        SELECT shard, value, event_id,
               ROW_NUMBER() OVER (PARTITION BY shard
                                  ORDER BY value, event_id) AS r
        FROM t
    ),
    strides AS (
        SELECT shard, cnt,
               CASE WHEN (cnt + {KLL_C - 1}) // {KLL_C} <= 1 THEN 1
                    ELSE (1::BIGINT << length(bin(
                           (cnt + {KLL_C - 1}) // {KLL_C} - 1)))
               END AS stride
        FROM (SELECT shard, COUNT(*) AS cnt FROM t GROUP BY shard)
    ),
    sk AS (
        SELECT ranked.shard, value, event_id, stride AS weight
        FROM ranked JOIN strides USING (shard)
        WHERE (r - 1) % stride = 0
    ),
    tot AS (
        SELECT CAST(SUM(weight) AS BIGINT) AS total_w,
               CAST(COUNT(*) AS BIGINT) AS sketch_rows
        FROM sk
    ),
    bnd AS (
        SELECT CAST(SUM(stride) AS BIGINT) AS rank_err_bound,
               CAST(SUM(cnt) AS BIGINT) AS exact_n
        FROM strides
    ),
    cum AS (
        SELECT value,
               CAST(SUM(weight) OVER (ORDER BY value, event_id) AS BIGINT)
                 AS cumw
        FROM sk
    )"""


SQL_KLL_QUANTILES = f"""
    WITH {_SQL_KLL_CORE},
    ex AS (
        SELECT p.p, e.x AS exact_cont
        FROM (SELECT quantile_cont(value, [{", ".join(str(p) for p in KLL_PS)}])
                AS xs FROM events) q,
             (VALUES {", ".join(f"({i + 1}, {p})" for i, p in enumerate(KLL_PS))})
               p(i, p),
             LATERAL (SELECT q.xs[p.i] AS x) e
    ),
    est AS (
        SELECT ex.p, ex.exact_cont, MIN(cum.value) AS est_value
        FROM ex, tot, cum
        WHERE cum.cumw >= CEIL(ex.p * tot.total_w)
        GROUP BY ex.p, ex.exact_cont
    )
    SELECT est.p AS percentile,
           round(est.est_value, 6) AS est_value,
           round(est.exact_cont, 6) AS exact_cont,
           round(abs(est.est_value - est.exact_cont), 6) AS abs_err,
           tot.total_w AS total_weight,
           bnd.exact_n,
           bnd.rank_err_bound
    FROM est, tot, bnd
    ORDER BY percentile
"""


@query("q_kll_quantiles", oracle=SQL_KLL_QUANTILES)
def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch over events.value: {KLL_P} parallel
    compactors each reduce their shard to <= {KLL_C} weighted
    survivors (KLL-style deterministic compaction — every s-th item of
    the shard-sorted run, weight s, s a power of two), the summaries
    MERGE by plain union into a <= {KLL_P}*{KLL_C}-row sketch, and
    each percentile is answered as the first sketch value whose
    cumulative weight reaches ceil(p * W). The per-shard-build +
    union-merge IS the cross-partition merge a 1000-file lake runs —
    and the row carries the sketch's own a-priori worst-case rank
    error (sum of shard strides) next to the observed error against
    the exact interpolated percentile.

    Scale: shard compaction is a partitioned window (each shard sorts
    locally, in parallel — raise {KLL_P} with input size); the merged
    sketch is bounded, so the final weighted-rank window runs over a
    constant-size frame. Everything except the eval column is exact
    integer arithmetic, replayed verbatim by the DuckDB oracle."""
    ev = read_table(spark, sf_dir, "events")
    sk = kll_sketch(ev)
    tot = sk.agg(
        F.sum("weight").cast("bigint").alias("total_w"),
        F.count(F.lit(1)).cast("bigint").alias("sketch_rows"),
    )
    bnd = (
        sk.groupBy("shard")
        .agg(F.max("weight").alias("stride"), F.sum("weight").alias("wsum"))
        .agg(
            F.sum("stride").cast("bigint").alias("rank_err_bound"),
        )
    )
    exact_n = ev.agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
    wcum = Window.orderBy("value", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = sk.select(
        "value", F.sum("weight").over(wcum).cast("bigint").alias("cumw")
    )
    exact = ev.agg(
        *[
            F.percentile("value", F.lit(p)).alias(f"x{i}")
            for i, p in enumerate(KLL_PS)
        ]
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(p).alias("p"), F.col(f"x{i}").alias("exact_cont")
                    )
                    for i, p in enumerate(KLL_PS)
                ]
            )
        ).alias("e")
    ).select("e.p", "e.exact_cont")
    est = (
        exact.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(cum))
        .where(F.col("cumw") >= F.ceil(F.col("p") * F.col("total_w")))
        .groupBy("p", "exact_cont", "total_w")
        .agg(F.min("value").alias("est_value"))
    )
    return (
        est.crossJoin(F.broadcast(bnd))
        .crossJoin(F.broadcast(exact_n))
        .select(
            F.col("p").alias("percentile"),
            F.round("est_value", 6).alias("est_value"),
            F.round("exact_cont", 6).alias("exact_cont"),
            F.round(F.abs(F.col("est_value") - F.col("exact_cont")), 6).alias(
                "abs_err"
            ),
            F.col("total_w").alias("total_weight"),
            "exact_n",
            "rank_err_bound",
        )
        .orderBy("percentile")
    )


_fmt(q_kll_quantiles, KLL_P=KLL_P, KLL_C=KLL_C)


# ---------------------------------------------------------------------------
# equal-frequency binning from the KLL sketch (round 9)
# ---------------------------------------------------------------------------
# The feature-engineering consumer of q_kll_quantiles: quartile bin
# edges come from the SKETCH (weighted ranks), not from a full sort,
# then every event is assigned a bin by three comparisons against the
# broadcast edges. On equal-frequency edges the bins should hold ~25%
# each — the per-bin occupancy (with its deviation from the ideal
# quarter) is the result, so the sketch's rank error is visible as
# data.

KLLBIN_PS = (0.25, 0.5, 0.75)


@query(
    "q_kll_binning",
    oracle=f"""
    WITH {_SQL_KLL_CORE},
    edges AS (
        SELECT
          MIN(CASE WHEN cumw >= CEIL(0.25 * total_w) THEN value END) AS e1,
          MIN(CASE WHEN cumw >= CEIL(0.5 * total_w) THEN value END) AS e2,
          MIN(CASE WHEN cumw >= CEIL(0.75 * total_w) THEN value END) AS e3
        FROM cum, tot
    ),
    assigned AS (
        SELECT CASE WHEN value < e1 THEN 0
                    WHEN value < e2 THEN 1
                    WHEN value < e3 THEN 2
                    ELSE 3 END AS bin
        FROM events, edges
    ),
    n AS (SELECT COUNT(*) AS total FROM events)
    SELECT bin,
           CASE bin WHEN 0 THEN NULL
                    WHEN 1 THEN round(e1, 6)
                    WHEN 2 THEN round(e2, 6)
                    ELSE round(e3, 6) END AS lo_edge,
           COUNT(*) AS n_rows,
           round(CAST(COUNT(*) AS DOUBLE) / total, 6) AS frac,
           round(abs(CAST(COUNT(*) AS DOUBLE) / total - 0.25), 6)
             AS dev_from_ideal
    FROM assigned, edges, n
    GROUP BY bin, e1, e2, e3, total
    ORDER BY bin
    """,
)
def q_kll_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency quartile binning of events.value with bin edges
    taken from the KLL sketch (``kll_sketch``'s weighted ranks — no
    full-data sort anywhere): one row per bin with its lower edge,
    occupancy, fraction, and deviation from the ideal 25%. This is the
    feature-discretization pass of a training pipeline, and the demo
    that the sketch composes — the same bounded summary that answers
    percentiles also drives the binning map.

    Scale: sketch build as in q_kll_quantiles; the 1-row edge frame
    broadcasts into a row-local CASE over the scan — binning itself is
    shuffle-free except the final 4-group count."""
    ev = read_table(spark, sf_dir, "events")
    sk = kll_sketch(ev)
    tot = sk.agg(F.sum("weight").cast("bigint").alias("total_w"))
    wcum = Window.orderBy("value", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = sk.select(
        "value", F.sum("weight").over(wcum).cast("bigint").alias("cumw")
    )
    edges = cum.crossJoin(F.broadcast(tot)).agg(
        *[
            F.min(
                F.when(
                    F.col("cumw") >= F.ceil(F.lit(p) * F.col("total_w")),
                    F.col("value"),
                )
            ).alias(f"e{i + 1}")
            for i, p in enumerate(KLLBIN_PS)
        ]
    )
    n = ev.agg(F.count(F.lit(1)).alias("total"))
    assigned = ev.crossJoin(F.broadcast(edges)).select(
        F.when(F.col("value") < F.col("e1"), 0)
        .when(F.col("value") < F.col("e2"), 1)
        .when(F.col("value") < F.col("e3"), 2)
        .otherwise(3)
        .alias("bin"),
        "e1",
        "e2",
        "e3",
    )
    frac = F.col("n_rows").cast("double") / F.col("total")
    return (
        assigned.crossJoin(F.broadcast(n))
        .groupBy("bin", "e1", "e2", "e3", "total")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bin",
            F.when(F.col("bin") == 1, F.round("e1", 6))
            .when(F.col("bin") == 2, F.round("e2", 6))
            .when(F.col("bin") == 3, F.round("e3", 6))
            .alias("lo_edge"),
            "n_rows",
            F.round(frac, 6).alias("frac"),
            F.round(F.abs(frac - 0.25), 6).alias("dev_from_ideal"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# rolling-window distinct via daily HLL register merge (round 9)
# ---------------------------------------------------------------------------
# The production rolling-MAU/DAU shape: per-day register tables are
# tiny (<= HLL_M rows each), never rescanned, and a k-day sliding
# distinct is a bucket-wise MAX over the k daily sketches — the
# mergeability that makes HLL the right structure when COUNT(DISTINCT)
# over every sliding window would rescan k days of raw data per day.

#: sliding window length in days (window = [day - ROLL_DAYS + 1, day])
ROLL_DAYS = 7

#: shared with the streaming twin (streaming/sketchview.py): the
#: stream-maintained daily register view must answer the identical
#: oracle, because the (day, bucket) MAX monoid merge is exact
SQL_HLL_ROLLING = f"""
    WITH h AS (
        SELECT DISTINCT
               CAST(ts AS DATE) - DATE '1970-01-01' AS day_i,
               {sql_portable_hash60("CAST(user_id AS VARCHAR)")} AS hv
        FROM events
    ),
    days AS (SELECT DISTINCT day_i FROM h),
    reg AS (
        SELECT day_i, hv % {HLL_M} AS bucket,
               MAX(CASE WHEN hv // {HLL_M} = 0 THEN {HLL_RHO_MAX}
                        ELSE {HLL_RHO_MAX} - length(bin(hv // {HLL_M}))
                   END) AS m
        FROM h GROUP BY day_i, hv % {HLL_M}
    ),
    contrib AS (
        SELECT r.day_i + i.i AS day_i, r.bucket, r.m
        FROM reg r CROSS JOIN generate_series(0, {ROLL_DAYS - 1}) i(i)
    ),
    merged AS (
        SELECT c.day_i, c.bucket, MAX(c.m) AS m
        FROM contrib c JOIN days d ON d.day_i = c.day_i
        GROUP BY c.day_i, c.bucket
    ),
    est AS (
        SELECT day_i, COUNT(*) AS n_present,
               SUM(1::BIGINT << ({HLL_RHO_MAX} - m)) AS present_sum
        FROM merged GROUP BY day_i
    ),
    upairs AS (
        SELECT DISTINCT CAST(ts AS DATE) - DATE '1970-01-01' AS day_i,
               user_id
        FROM events
    ),
    exact AS (
        SELECT p.day_i + i.i AS day_i, COUNT(DISTINCT p.user_id) AS ex
        FROM upairs p CROSS JOIN generate_series(0, {ROLL_DAYS - 1}) i(i)
        JOIN days d ON d.day_i = p.day_i + i.i
        GROUP BY p.day_i + i.i
    )
    SELECT strftime(DATE '1970-01-01' + e.day_i * INTERVAL 1 DAY,
                    '%Y-%m-%d') AS day,
           CAST(x.ex AS BIGINT) AS exact_users_{ROLL_DAYS}d,
           (0.7213 / (1.0 + 1.079 / {HLL_M}.0)) * {HLL_M}.0 * {HLL_M}.0
             * (1::BIGINT << {HLL_RHO_MAX})
             / (e.present_sum + ({HLL_M} - e.n_present)
                                * (1::BIGINT << {HLL_RHO_MAX}))
             AS hll_estimate,
           CAST({HLL_M} - e.n_present AS INT) AS n_zero_registers
    FROM est e JOIN exact x ON x.day_i = e.day_i
    ORDER BY day
    """


def _event_day(col: str = "ts") -> Column:
    return F.datediff(F.col(col).cast("date"), F.lit("1970-01-01"))


def daily_hll_registers(ev: DataFrame) -> DataFrame:
    """Per-day HLL register table (day_i, bucket, m) over user ids —
    the persistable daily sketch; merges with
    ``groupBy(day_i, bucket).MAX`` (shared with the streaming view)."""
    h = ev.select(
        _event_day().alias("day_i"),
        portable_hash60(F.col("user_id").cast("string")).alias("hv"),
    ).distinct()
    return (
        h.select(
            "day_i",
            (F.col("hv") % HLL_M).alias("bucket"),
            F.when(F.expr(f"hv div {HLL_M}") == 0, F.lit(HLL_RHO_MAX))
            .otherwise(
                F.lit(HLL_RHO_MAX)
                - F.length(F.bin(F.expr(f"hv div {HLL_M}")))
            )
            .alias("rho"),
        )
        .groupBy("day_i", "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_rolling_from_registers(reg: DataFrame, ev: DataFrame) -> DataFrame:
    """Rolling ROLL_DAYS-window estimates from a daily register table,
    with the exact per-window COUNT(DISTINCT) recomputed from raw
    events as the eval column. Shared by q_hll_rolling (one-shot
    registers) and q_hll_rolling_stream (stream-maintained view)."""
    days = reg.select("day_i").distinct()
    offsets = F.explode(F.sequence(F.lit(0), F.lit(ROLL_DAYS - 1))).alias("i")
    contrib = reg.select("day_i", "bucket", "m", offsets).select(
        (F.col("day_i") + F.col("i")).alias("day_i"), "bucket", "m"
    )
    merged = (
        contrib.join(days, "day_i")
        .groupBy("day_i", "bucket")
        .agg(F.max("m").alias("m"))
    )
    est = merged.groupBy("day_i").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - m)")
        ).alias("present_sum"),
    )
    upairs = ev.select(_event_day().alias("day_i"), "user_id").distinct()
    exact = (
        upairs.select("day_i", "user_id", offsets)
        .select((F.col("day_i") + F.col("i")).alias("day_i"), "user_id")
        .join(days, "day_i")
        .groupBy("day_i")
        .agg(F.countDistinct("user_id").alias("ex"))
    )
    alpha = 0.7213 / (1.0 + 1.079 / float(HLL_M))
    return (
        est.join(exact, "day_i")
        .select(
            F.date_format(
                F.date_add(F.lit("1970-01-01"), F.col("day_i")), "yyyy-MM-dd"
            ).alias("day"),
            F.col("ex").cast("bigint").alias(f"exact_users_{ROLL_DAYS}d"),
            (
                F.lit(alpha)
                * F.lit(float(HLL_M))
                * F.lit(float(HLL_M))
                * F.shiftleft(F.lit(1).cast("bigint"), HLL_RHO_MAX)
                / (
                    F.col("present_sum")
                    + (F.lit(HLL_M).cast("bigint") - F.col("n_present"))
                    * F.shiftleft(F.lit(1).cast("bigint"), HLL_RHO_MAX)
                )
            ).alias("hll_estimate"),
            (F.lit(HLL_M) - F.col("n_present"))
            .cast("int")
            .alias("n_zero_registers"),
        )
        .orderBy("day")
    )


@query("q_hll_rolling", oracle=SQL_HLL_ROLLING)
def q_hll_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {ROLL_DAYS}-day distinct active users from MERGED daily
    HyperLogLog sketches: each day folds to its own {HLL_M}-register
    table once, every register row then contributes to the
    {ROLL_DAYS} sliding windows it belongs to (an explode by window
    offset — the contribute-to-k-windows expansion), and each window's
    sketch is the bucket-wise MAX of its member days. The per-window
    exact COUNT(DISTINCT) rides along as the eval column via the same
    expansion over distinct (day, user) pairs.

    Same integer-exact register/harmonic-sum discipline as
    q_hll_distinct (no float log, one final division per window), so
    every window's estimate is engine- and partitioning-exact.

    Scale: THE argument for sketches over raw recounts — daily
    registers are <= {HLL_M} rows/day forever, so the rolling merge
    touches {ROLL_DAYS} x {HLL_M} rows per day regardless of traffic,
    while the exact recount rescans {ROLL_DAYS} days of raw events
    per day. Register tables persist per day and merge associatively,
    so backfills and late days just re-MAX one day's sketch. Windows
    land on observed days only (equi-join against the day set — no
    cross, no calendar spine needed)."""
    ev = read_table(spark, sf_dir, "events")
    return hll_rolling_from_registers(daily_hll_registers(ev), ev)


_fmt(
    q_hll_rolling,
    ROLL_DAYS=ROLL_DAYS,
    HLL_M=HLL_M,
)


# ---------------------------------------------------------------------------
# AMS (Alon–Matias–Szegedy) F2 moment sketch
# ---------------------------------------------------------------------------
# The second frequency moment F2 = sum_v f_v^2 is the self-join size of
# a key column — the quantity a planner needs to cost a join or detect
# a skewed key space, and the one moment CMS/HLL cannot answer. The
# AMS sketch keeps R signed counters Z_r = sum_v sign_r(v) * f_v; each
# Z_r^2 is an unbiased estimate of F2, and the counters are an exact
# SUM monoid (shard sketches merge by adding Z row-wise), so per-day
# sketch tables merge without raw re-scans exactly like the CMS/HLL
# views. Reference scope note: the reference pipeline
# (/root/reference/resources/firehose_transformation.py) has no
# analytics; this is lake-side capability the Spark engine adds.

#: number of independent sign rows (estimate variance ~ 2*F2^2 / R)
AMS_R = 8
#: affine sign-hash coefficients sign_r(h) = 1 - 2*((A*h + B) % P % 2);
#: pairwise-distinct small primes, same universal family as CMS/minhash
#: (2-wise independence — the textbook bound wants 4-wise; the eval
#: column in the registered query makes the realized error visible)
AMS_A = (163, 167, 173, 179, 181, 191, 193, 197)
AMS_B = (7, 11, 13, 19, 23, 31, 37, 43)


def ams_sketch(keyed: DataFrame, key: str, group: str) -> DataFrame:
    """Per-``group`` AMS sketch table: AMS_R rows (group, r, z).

    One md5 per input row, R sign flips computed row-locally before the
    map-side combine — the shuffle carries <= |groups|*R partial sums
    per task, never R*N rows. Merge across shards/days: groupBy(group,
    r).SUM(z) — exact, order-independent integer addition.
    """
    h = (portable_hash60(F.col(key).cast("string")) % CMS_P).alias("h")
    base = keyed.select(F.col(group), h)
    signs = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (
                    F.lit(1)
                    - F.lit(2)
                    * ((F.lit(a) * F.col("h") + F.lit(b)) % CMS_P % 2)
                ).cast("bigint").alias("s"),
            )
            for r, (a, b) in enumerate(zip(AMS_A, AMS_B))
        ]
    )
    return (
        base.select(group, F.explode(signs).alias("c"))
        .groupBy(group, F.col("c.r").alias("r"))
        .agg(F.sum("c.s").alias("z"))
    )


def ams_estimate(sketch: DataFrame, group: str) -> DataFrame:
    """F2 estimates from a sketch table: mean and median of the R
    squared counters. Median is the average of the two middle order
    statistics computed explicitly (row_number over (z_sq, r)) so both
    engines evaluate the identical integer expression — never an
    engine's interpolating median()."""
    zsq = sketch.select(
        group, "r", (F.col("z") * F.col("z")).alias("z_sq")
    )
    w = Window.partitionBy(group).orderBy("z_sq", "r")
    ranked = zsq.withColumn("rn", F.row_number().over(w))
    lo, hi = AMS_R // 2, AMS_R // 2 + 1
    return (
        ranked.groupBy(group)
        .agg(
            (F.sum("z_sq") / F.lit(float(AMS_R))).alias("est_mean"),
            (
                F.sum(F.when(F.col("rn").isin(lo, hi), F.col("z_sq")))
                / F.lit(2.0)
            ).alias("est_median"),
        )
    )


def _sql_ams_case(coeffs: tuple[int, ...]) -> str:
    whens = " ".join(f"WHEN {i} THEN {c}" for i, c in enumerate(coeffs))
    return f"CASE r {whens} END"


SQL_AMS_F2 = f"""
    WITH h AS (
        SELECT event_type,
               ({sql_portable_hash60("CAST(user_id AS VARCHAR)")} % {CMS_P}) AS h
        FROM events
    ),
    signs AS (
        SELECT event_type, rr.r,
               1 - 2 * ((({_sql_ams_case(AMS_A)}) * h
                         + ({_sql_ams_case(AMS_B)})) % {CMS_P} % 2) AS s
        FROM h, (SELECT UNNEST(range(0, {AMS_R})) AS r) rr
    ),
    sketch AS (
        SELECT event_type, r, SUM(s) AS z FROM signs GROUP BY event_type, r
    ),
    ranked AS (
        SELECT event_type, r, z * z AS z_sq,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY z * z, r) AS rn
        FROM sketch
    ),
    est AS (
        SELECT event_type,
               SUM(z_sq) / {float(AMS_R)} AS est_mean,
               SUM(CASE WHEN rn IN ({AMS_R // 2}, {AMS_R // 2 + 1})
                        THEN z_sq END) / 2.0 AS est_median
        FROM ranked GROUP BY event_type
    ),
    exact AS (
        SELECT event_type, CAST(SUM(cnt * cnt) AS BIGINT) AS f2_exact
        FROM (
            SELECT event_type, user_id, COUNT(*) AS cnt
            FROM events GROUP BY event_type, user_id
        ) GROUP BY event_type
    )
    SELECT e.event_type, x.f2_exact, e.est_mean, e.est_median
    FROM est e JOIN exact x USING (event_type)
    ORDER BY e.event_type
"""


@query("q_ams_f2", oracle=SQL_AMS_F2)
def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS F2 (self-join size) sketch per event_type: {AMS_R} signed
    counters of user_id frequencies per segment, answering the
    segment's self-join size from the SKETCH (mean and median of the
    squared counters) with the exact F2 in-row as the eval column —
    the join-cost / key-skew signal CMS (point frequencies) and HLL
    (distinct count) cannot give.

    Every aggregate is an exact integer SUM (sign flips are ±1
    bigints), the two estimates are single final divisions of exact
    integers, and the explicit order-statistic median avoids engine
    median() interpolation — partitioning- and engine-exact, hence the
    hash gate.

    Scale: the sketch is |segments| * {AMS_R} rows no matter how many
    events flow through; per-day shards build map-side-combined
    partials and merge by row-wise integer SUM (the monoid the
    streaming twin q_ams_stream folds). The exact column is the eval
    harness; a deployment keeps only the sketch."""
    ev = read_table(spark, sf_dir, "events")
    sketch = ams_sketch(ev, "user_id", "event_type")
    est = ams_estimate(sketch, "event_type")
    exact = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("event_type")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("f2_exact"))
    )
    return (
        est.join(exact, "event_type")
        .select("event_type", "f2_exact", "est_mean", "est_median")
        .orderBy("event_type")
    )


_fmt(q_ams_f2, AMS_R=AMS_R)


# ---------------------------------------------------------------------------
# numeric column correlation matrix (round 11)
# ---------------------------------------------------------------------------
# The third leg of the catalog-statistics family: q_analyze_ndv gives a
# CBO cardinalities, q_join_estimate prices a join — this gives the
# COLUMN DEPENDENCE a selectivity model needs (independent-predicate
# multiplication is wrong exactly when |r| is high) and the feature
# audit an ML pipeline runs before training on tabular columns.
# Pearson r for every pair of lineitem's numeric measure columns from
# ONE scan of exact decimal power sums — the q_cuped discipline: no
# float crosses rows, each r is a single final double expression.

CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

_CORR_PAIRS = [
    (a, b)
    for i, a in enumerate(CORR_COLS)
    for b in CORR_COLS[i + 1 :]
]

# Oracle casts to DECIMAL(19,6): same exact values as Spark's (18,6),
# but (18,6) squares overflow DuckDB's int64 decimal kernel — (19,6)
# forces hugeint physical (the q_autocorrelation precedent).
_SQL_CORR_SUMS = ", ".join(
    [f"CAST(COUNT(*) AS BIGINT) AS n"]
    + [
        f"SUM(CAST(CAST({c} AS DOUBLE) AS DECIMAL(19,6))) AS s_{c}"
        for c in CORR_COLS
    ]
    + [
        f"SUM(CAST(CAST({a} AS DOUBLE) AS DECIMAL(19,6))"
        f" * CAST(CAST({b} AS DOUBLE) AS DECIMAL(19,6))) AS s_{a}_{b}"
        for i, a in enumerate(CORR_COLS)
        for b in CORR_COLS[i:]
    ]
)

_SQL_CORR_ROWS = " UNION ALL ".join(
    f"""
    SELECT '{a}' AS col_a, '{b}' AS col_b, n,
           round((n * CAST(s_{a}_{b} AS DOUBLE)
                  - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))
                 / (sqrt(n * CAST(s_{a}_{a} AS DOUBLE)
                         - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))
                    * sqrt(n * CAST(s_{b}_{b} AS DOUBLE)
                           - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE))),
                 6) AS pearson_r
    FROM sums"""
    for a, b in _CORR_PAIRS
)


@query(
    "q_column_correlation",
    oracle=f"""
    WITH sums AS (SELECT {_SQL_CORR_SUMS} FROM lineitem)
    {_SQL_CORR_ROWS}
    ORDER BY col_a, col_b
    """,
)
def q_column_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation for every pair of lineitem's numeric measure
    columns ({CORR_COLS_STR}) — the column-dependence statistic a
    cost-based selectivity model (and any tabular feature audit) needs
    before multiplying predicate selectivities as if independent.

    One scan accumulates all {N_SUMS} power sums in exact
    DECIMAL(18,6)/(37,12); each r is one final double expression
    rounded to 6 dp. Scale: a single map-side-combined aggregate —
    the report is {N_PAIRS} rows forever."""
    li = read_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("double").cast("decimal(18,6)")  # noqa: E731
    sums = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[F.sum(dec(c)).alias(f"s_{c}") for c in CORR_COLS],
        *[
            F.sum(dec(a) * dec(b)).alias(f"s_{a}_{b}")
            for i, a in enumerate(CORR_COLS)
            for b in CORR_COLS[i:]
        ],
    )

    def r_expr(a: str, b: str):
        n = F.col("n")
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        sab = F.col(f"s_{a}_{b}").cast("double")
        saa = F.col(f"s_{a}_{a}").cast("double")
        sbb = F.col(f"s_{b}_{b}").cast("double")
        return F.round(
            (n * sab - sa * sb)
            / (F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)),
            6,
        )

    out = None
    for a, b in _CORR_PAIRS:
        row = sums.select(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            "n",
            r_expr(a, b).alias("pearson_r"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("col_a", "col_b")


_fmt(
    q_column_correlation,
    CORR_COLS_STR=", ".join(CORR_COLS),
    N_SUMS=1 + len(CORR_COLS) + len(CORR_COLS) * (len(CORR_COLS) + 1) // 2,
    N_PAIRS=len(_CORR_PAIRS),
)
