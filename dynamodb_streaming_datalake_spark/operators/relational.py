"""Relational query surface (SURVEY.md §2 B1-B17).

The reference's data lake exists to serve exactly this kind of query
(`/root/reference/resources/firehose_transformation.py:16` — "…to do
dedupe in the Lake"; hourly partition layout at
`/root/reference/lib/dynamodb-streaming-datalake-stack.ts:222`). Each
recipe here is a pure DataFrame program: Catalyst supplies predicate
pushdown, column pruning, join selection (broadcast vs sort-merge),
partial aggregation, and TakeOrderedAndProject — verified in
``tests/test_plans.py``.

Float determinism (so the DuckDB oracle hash-matches): monetary/measure
aggregates go through ``decimal(18,6)`` — the double->decimal cast is
exact-rounding in both engines, decimal SUM is exact, and the final
cast back to double is nearest-even in both — so the result is
bit-identical regardless of partition/summation order. Plain SUM(double)
would differ between engines in the last ulp.

Scale notes per query are inline; the common themes:
* dimension joins (nation/region/supplier/part at TPC-H ratios) are
  broadcast — no shuffle of the fact table;
* aggregations are partial+final (map-side combine) by construction;
* top-k is ORDER BY + LIMIT which Spark plans as TakeOrderedAndProject
  (per-partition heap, no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

DEC = "decimal(18,6)"


def dsum(c: Column, alias: str) -> Column:
    """Order-independent, engine-portable SUM of a double measure."""
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(c: Column, alias: str) -> Column:
    """AVG as exact decimal sum / count, divided in double (portable)."""
    return (F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def _sql_dsum(expr: str, alias: str) -> str:
    # decimal->double routes through VARCHAR: DuckDB's direct cast
    # double-rounds (int128->double, then /10^scale) once the unscaled
    # sum passes 2^53 — off by one output ulp vs Spark's single-rounded
    # BigDecimal path (r17 contract-stress price-magnitude sweep on q1)
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS VARCHAR)"
        f" AS DOUBLE) AS {alias}"
    )


def _sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS VARCHAR)"
        f" AS DOUBLE) / COUNT(*) AS {alias}"
    )


# --------------------------------------------------------------------------
# B10/B15: hash aggregation with scalar expressions (TPC-H Q1 shape)
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_sql_dsum('l_quantity', 'sum_qty')},
           {_sql_dsum('l_extendedprice', 'sum_base_price')},
           {_sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {_sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {_sql_davg('l_quantity', 'avg_qty')},
           {_sql_davg('l_extendedprice', 'avg_price')},
           {_sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: scan -> filter (pushed to parquet) -> 6-group agg.

    Scale: partial aggregation collapses 100 TB of lineitem to 6 groups
    map-side; the shuffle moves only num_partitions x 6 rows.
    """
    l = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# B8 + B13: fact-fact join, aggregation, top-k (TPC-H Q3 shape)
# --------------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT o_orderkey,
           {_sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-orders revenue top-10.

    Scale: customer filter prunes before the join; orders->lineitem is
    the only big shuffle (both sides hashed on orderkey); final top-k is
    TakeOrderedAndProject, never a full sort.
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    c = read_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    l = read_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("o_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# B8: multi-way join through broadcast dimensions (TPC-H Q5 shape)
# --------------------------------------------------------------------------
@query(
    "q5_nation_revenue",
    oracle=f"""
    SELECT n_name, {_sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier revenue by nation for two regions.

    Scale: nation/region/supplier are broadcast (they stay small at any
    scale factor: TPC-H ratios), so the only shuffles are the two
    fact-side hash exchanges. The region filter prunes nations before
    the broadcast, shrinking the build side further.
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").where(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    dims = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
            F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
        )
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            dims,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --------------------------------------------------------------------------
# B9: anti join / semi join
# --------------------------------------------------------------------------
@query(
    "q_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_custkey NOT IN
        (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
    """,
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (B9): customers that never placed a big-ticket order.

    Scale: Spark runs this as a broadcast/shuffled hash anti-join on the
    distinct o_custkey set — equivalent to "keys deleted since snapshot"
    reconciliation in the CDC lake. The totalprice filter is pushed to
    the orders scan (and keeps the result non-empty at every SF: the
    synthetic data gives every customer *some* order, so the plain
    never-ordered variant is vacuously empty).
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q_suppliers_with_bulk_sales",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 49)
    """,
)
def q_suppliers_with_bulk_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (B9): suppliers having at least one bulk lineitem."""
    s = read_table(spark, sf_dir, "supplier")
    l = read_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    return s.join(l, s.s_suppkey == l.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name", "s_acctbal"
    )


# --------------------------------------------------------------------------
# B11: rollup over (event_type, hour)
# --------------------------------------------------------------------------
@query(
    "q_rollup_events",
    oracle=f"""
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           {_sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY ROLLUP (event_type, strftime(date_trunc('day', ts), '%Y-%m-%d'))
    """,
)
def q_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain ingest monitoring: rollup (event_type, day) (B11).

    Scale: ROLLUP expands each input row into grouping-set rows *after*
    partial aggregation under AQE; 100 TB of events still reduces
    map-side first.
    """
    e = read_table(spark, sf_dir, "events")
    return (
        e.withColumn("day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"))
        .rollup("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value"), "sum_value"))
    )


# --------------------------------------------------------------------------
# B12: window functions — per-key version history
# --------------------------------------------------------------------------
@query(
    "q_user_event_history",
    oracle="""
    SELECT event_id, user_id, event_type, value,
           ROW_NUMBER() OVER w AS version,
           LAG(value)   OVER w AS prev_value,
           value - COALESCE(LAG(value) OVER w, 0.0) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-vs-previous-version per key (B12) — the CDC version-history
    pattern (`Event` + `ingestion_timestamp` ordering per SURVEY §2 B6/B12).

    Scale: one shuffle on user_id, then a per-partition sort; skewed
    users are the known hazard — AQE skew handling or key salting would
    apply if a user had billions of events.
    """
    from pyspark.sql import Window

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.row_number().over(w).alias("version"),
        F.lag("value").over(w).alias("prev_value"),
        (F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0))).alias("delta"),
    )


# --------------------------------------------------------------------------
# B13: top-k
# --------------------------------------------------------------------------
@query(
    "q_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-valuable 100 orders (B13): TakeOrderedAndProject, not a sort."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# B14: set operations
# --------------------------------------------------------------------------
@query(
    "q_set_reconcile_customers",
    oracle="""
    (SELECT o_custkey AS custkey FROM orders
     INTERSECT
     SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def q_set_reconcile_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-reconciliation set algebra (B14): INTERSECT then EXCEPT.

    Scale: Spark compiles both to aggregates/joins on the key — shuffles
    only distinct keys.
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    ordered = o.select(F.col("o_custkey").alias("custkey"))
    rich = c.where(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("custkey"))
    building = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return ordered.intersect(rich).subtract(building)


# --------------------------------------------------------------------------
# B15: scalar functions — string/math and datetime
# --------------------------------------------------------------------------
@query(
    "q_scalar_string_math",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substr(p_type, 1, 4) AS type_prefix,
           CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
           concat(p_brand, '/', p_type) AS brand_type,
           abs(p_size - 25) AS size_dist,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 11 AS DOUBLE) AS price_x11
    FROM part
    WHERE p_size BETWEEN 10 AND 40
    """,
)
def q_scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/regex/math scalar surface (B15) — stays fully inside
    whole-stage codegen; no UDFs."""
    p = read_table(spark, sf_dir, "part")
    return p.where(F.col("p_size").between(10, 40)).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("bigint").alias("brand_num"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (F.col("p_retailprice").cast("decimal(12,2)") * 11).cast("double").alias("price_x11"),
    )


@query(
    "q_scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           strftime(o_orderdate, '%Y-%m') AS order_ym,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
    FROM orders
    WHERE o_orderstatus = 'P'
    """,
)
def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar surface (B15): year/month/day, formatting, epoch."""
    o = read_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate")
    return o.where(F.col("o_orderstatus") == "P").select(
        "o_orderkey",
        F.year(ts).alias("order_year"),
        F.month(ts).alias("order_month"),
        F.dayofmonth(ts).alias("order_day"),
        F.date_format(ts, "yyyy-MM").alias("order_ym"),
        F.unix_timestamp(ts.cast("timestamp")).alias("order_epoch"),
    )


# --------------------------------------------------------------------------
# B16: JSON functions
# --------------------------------------------------------------------------
@query(
    "q_json_props",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over a JSON payload column (B16) — the CDC zone's
    `M`/`L` attributes re-parsed at query time."""
    e = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# --------------------------------------------------------------------------
# B17: array/explode — word count over documents
# --------------------------------------------------------------------------
@query(
    "q_top_words",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 50
    """,
)
def q_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode + aggregate (B17): classic word count, top 50.

    Scale: explode multiplies rows ~100x; partial aggregation collapses
    them again before the shuffle, so the exchange carries only distinct
    words per partition.
    """
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(50)
    )


# --------------------------------------------------------------------------
# B11: cube — the full grouping-set lattice over (event_type, day-of-week)
# --------------------------------------------------------------------------
@query(
    "q_cube_events",
    oracle=f"""
    SELECT event_type,
           -- DuckDB dayofweek is 0-based (Sun=0); Spark's is 1-based (Sun=1)
           CAST(dayofweek(ts) + 1 AS INT) AS dow,
           COUNT(*) AS n_events,
           {_sql_davg('value', 'avg_value')}
    FROM events
    GROUP BY CUBE (event_type, CAST(dayofweek(ts) + 1 AS INT))
    """,
)
def q_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day-of-week) — all four grouping sets in
    one pass (B11), the companion to q_rollup_events.

    Scale: Expand happens before partial aggregation, so the shuffle
    carries |grouping sets| x |distinct keys| rows, not |input| rows.
    """
    e = read_table(spark, sf_dir, "events")
    return (
        e.withColumn("dow", F.dayofweek("ts").cast("int"))
        .cube("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("n_events"), davg(F.col("value"), "avg_value"))
    )


# --------------------------------------------------------------------------
# B10: count(distinct) — exact multi-column distinct aggregation
# --------------------------------------------------------------------------
@query(
    "q_distinct_counts",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           COUNT(*) * 1.0 / COUNT(DISTINCT user_id) AS events_per_user
    FROM events
    GROUP BY event_type
    """,
)
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group (B10). The approximate variant
    (approx_count_distinct / HLL) is exercised in tests/test_plans.py —
    its value is engine-specific so it can't hash-match a DuckDB oracle.

    Scale: Spark plans distinct-agg as a two-phase expand+agg; the
    shuffle carries (event_type, user_id) pairs, already map-side
    deduplicated.
    """
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        (F.count(F.lit(1)) * F.lit(1.0) / F.count_distinct("user_id")).alias(
            "events_per_user"
        ),
    )


# --------------------------------------------------------------------------
# B8 (fact x fact): the join that CANNOT broadcast at scale
# --------------------------------------------------------------------------
@query(
    "q_order_lineitem_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           {_sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           {_sql_davg('l.l_quantity', 'avg_qty')}
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY o.o_orderpriority
    """,
)
def q_order_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x fact equi-join (orders x lineitem): the join whose build
    side does NOT fit in memory at 100 TB, so the physical strategy is
    shuffle + sort-merge on the join key (tests/test_plans.py asserts
    Spark takes the SMJ path once broadcast is off). Both inputs arrive
    hash-partitioned on orderkey; in a bucketed lake layout this join is
    shuffle-free.
    """
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    l = read_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(rev, "revenue"),
            davg(F.col("l_quantity"), "avg_qty"),
        )
    )


# --------------------------------------------------------------------------
# data profiling: per-column stats in ONE scan (training-data hygiene)
# --------------------------------------------------------------------------

_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "q_table_profile",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               COUNT(*) AS n_rows,
               COUNT({c}) AS n_non_null,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM orders
        """
        for c in _PROFILE_COLS
    ),
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``orders`` — row counts, null counts, distinct
    cardinality, min/max — the first pass any data-quality gate runs
    over a new drop.

    Scale: one narrow, column-pruned scan per profiled column, each
    reduced to its distinct values map-side before the shuffle, unioned
    into the long-format report. This beats a single wide aggregate with
    N count_distincts, whose Expand multiplies every input row by N+1
    before the exchange (measured 2.6x faster at sf0.1); the per-column
    jobs are also embarrassingly parallel. Swap in
    approx_count_distinct when cardinality tolerance allows.
    """
    import functools

    o = read_table(spark, sf_dir, "orders")
    parts = []
    for c in _PROFILE_COLS:
        v = F.col("v")
        groups = o.groupBy(F.col(c).alias("v")).agg(F.count(F.lit(1)).alias("n"))
        parts.append(
            groups.agg(
                F.lit(c).alias("column_name"),
                F.sum("n").alias("n_rows"),
                F.sum(F.when(v.isNotNull(), F.col("n")).otherwise(F.lit(0))).alias(
                    "n_non_null"
                ),
                F.count(F.when(v.isNotNull(), F.lit(1))).alias("n_distinct"),
                F.min(v).cast("string").alias("min_value"),
                F.max(v).cast("string").alias("max_value"),
            )
        )
    return functools.reduce(lambda a, b: a.unionByName(b), parts)


# --------------------------------------------------------------------------
# TPC-H-shaped breadth: Q4/Q6/Q14/Q18 adapted to the fixture columns
# --------------------------------------------------------------------------
@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts for orders with a late-shipping
    line (correlated EXISTS -> left-semi join with a non-equi term).

    Scale: the semi-join shuffles both sides on orderkey and emits each
    order at most once — no fan-out; the extra inequality rides on the
    same equi-join, no nested loop.
    """
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {_sql_dsum('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — every predicate is
    parquet-pushable, the aggregate is a single global partial+final
    pair; the canonical 'is pushdown actually working' query."""
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT 100.00 *
           CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END
               AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(18,6))) AS DOUBLE) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — conditional aggregation over a
    broadcast part join; one month of lineitem via pushed-down range."""
    l = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    p = read_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo.cast(DEC)).cast("double")
                / F.sum(rev.cast(DEC)).cast("double")
            ).alias("promo_pct")
        )
    )


@query(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice,
           {_sql_dsum('l_quantity', 'total_qty')}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 180
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: per-order quantity rollup with HAVING, top-20
    by price. Scale: group on the join key the data already shuffled on
    (orderkey) — one exchange feeds both the join and the aggregate."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
        )
        .agg(dsum(F.col("l_quantity"), "total_qty"))
        .where(F.col("total_qty") > 180)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# B12 frame specs: rolling aggregates over an explicit ROWS window
# --------------------------------------------------------------------------
@query(
    "q_rolling_user_value",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS rolling_value,
           CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS window_n
    FROM events
    """,
)
def q_rolling_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit frame spec (B12): trailing-3-event rolling sum per user
    — ROWS BETWEEN 2 PRECEDING AND CURRENT ROW, the moving-aggregate
    pattern windows are for. One shuffle on user_id, per-partition sort."""
    from pyspark.sql import Window

    e = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("rolling_value"),
        F.count(F.lit(1)).over(w).alias("window_n"),
    )


# --------------------------------------------------------------------------
# event-sequence funnel: ordered view -> click -> purchase conversion
# --------------------------------------------------------------------------
@query(
    "q_funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS tv FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS tc
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.tv
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS tp
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.tc
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: first view -> first later click -> first later
    purchase, counted per stage.

    Scale: each stage is a keyed aggregate joined to the previous
    stage's (user, ts) — all equi-joins on user_id, reusing one
    partitioning; no window over the full event history is needed.
    """
    e = read_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    # one declarative plan: three scalar aggregates cross-joined (each
    # side is a single row — no driver-side .count() actions)
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )


# --------------------------------------------------------------------------
# B10 depth: exact percentiles (interpolated) per group
# --------------------------------------------------------------------------
@query(
    "q_value_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, both linear interpolation over the sorted
    values). The streaming/huge-group variant is approx_percentile
    (t-digest) — engine-specific, so exercised in tests, not the oracle.

    Scale: exact percentiles buffer each group's values — fine for
    bounded group counts; switch to approx_percentile when a single
    group's values exceed executor memory.
    """
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


# --------------------------------------------------------------------------
# B13 complement: global total-order sort (range partitioning)
# --------------------------------------------------------------------------
@query(
    "q_global_sort",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    ORDER BY value DESC, event_id
    """,
)
def q_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total order over the table (ORDER BY, no limit): Spark samples
    the sort key to build range partition bounds, each partition sorts
    locally, and partitions concatenate in order — the scalable global
    sort, vs the top-k heap path of q_topk_orders."""
    e = read_table(spark, sf_dir, "events")
    return e.select("event_id", "user_id", "event_type", "value").orderBy(
        F.col("value").desc(), F.col("event_id")
    )


# --------------------------------------------------------------------------
# SQL entry point: the same engine via spark.sql over registered views
# --------------------------------------------------------------------------
@query(
    "q_sql_entrypoint",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_sql_entrypoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2's closing note: the SQL parser + Catalyst 'arrive free
    via spark.sql'. This query IS a SQL string over the registered lake
    views — proving a reference user can keep writing SQL, same engine,
    same plans, same oracle gate as the DataFrame recipes."""
    from dynamodb_streaming_datalake_spark.sources.readers import register_catalog

    register_catalog(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


# --------------------------------------------------------------------------
# NOT IN with NULLs: the null-aware anti join
# --------------------------------------------------------------------------
# q_customers_without_orders covers NOT EXISTS (a plain anti join).
# NOT IN is the trap variant: under SQL three-valued logic a single
# NULL in the subquery makes `x NOT IN (...)` UNKNOWN for every x, so
# the raw query returns nothing — and engines must implement that with
# a NULL-AWARE anti join, not a plain one. A naive plan for this shape
# is a nested loop; Spark's optimizeNullAwareAntiJoin rewrites the
# single-column case to a BroadcastHashJoin with the NAAJ flag. One
# query text, both engines, demonstrating the trap (raw count = 0)
# next to the intended null-filtered variant.

_NOTIN_SQL = """
    WITH lv AS (SELECT DISTINCT (event_id % 100) AS m FROM events),
    sub AS (SELECT CASE WHEN event_type = 'purchase' AND value < 50
                        THEN CAST(floor(value) AS BIGINT) END AS s
            FROM events)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lv) AS n_left_values,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lv
             WHERE m NOT IN (SELECT s FROM sub)) AS n_notin_raw,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lv
             WHERE m NOT IN (SELECT s FROM sub WHERE s IS NOT NULL))
             AS n_notin_nullfree
    """


@query("q_notin_nullaware", oracle=_NOTIN_SQL)
def q_notin_nullaware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN versus a NULL-bearing subquery — the three-valued-logic
    semantic both engines must honor identically: the raw NOT IN
    count is 0 (one NULL poisons every membership test to UNKNOWN)
    while the null-filtered variant returns the real complement. The
    SAME SQL text runs on Spark (via the registered lake views) and
    DuckDB, so the gate pins the semantic corner, and the plan test
    pins that Spark executes it as a null-aware BroadcastHashJoin
    anti join (the NAAJ rewrite), never a nested loop.

    Scale: single-column NOT IN is the only shape the NAAJ rewrite
    covers — multi-column NOT IN still plans quadratic, which is
    exactly why this engine's recipes use NOT EXISTS everywhere else;
    this query exists to prove the semantic, and its plan shows the
    rewrite doing its job when users bring NOT IN anyway."""
    from dynamodb_streaming_datalake_spark.sources.readers import (
        register_catalog,
    )

    register_catalog(spark, sf_dir)
    return spark.sql(_NOTIN_SQL)
