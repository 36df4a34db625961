"""Extended TPC-H query shapes (SURVEY.md §2 B8-B15) adapted to the
driver's reduced-TPC-H schema (TESTDATA.md: no partsupp, no
shipmode/commitdate/receiptdate columns).

These widen the relational surface the lake serves (SURVEY.md §2B: the
reference lands DynamoDB state in a lake precisely so fact tables can be
joined/aggregated against it, README.md:2). Each query keeps the
canonical TPC-H plan shape — the part the optimizer/scale story cares
about — while substituting predicates for columns the synthetic schema
lacks.

Float determinism follows relational.py: measure aggregates go through
decimal(18,6) (``dsum``/``davg``); double division and MIN/MAX of
doubles are order-independent and bit-identical across engines.

Scale notes per query are inline; common themes:
* all nation/region/part/supplier dimension joins are broadcast —
  the fact table is never shuffled for a dimension;
* multi-aggregate shapes (Q13, Q15, Q21) reuse one partitioning across
  window/agg stages where possible;
* scalar-subquery shapes (Q15 max, Q22 avg) broadcast a 1-row frame
  instead of collecting to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.relational import (
    DEC,
    _sql_davg,
    _sql_dsum,
    davg,
    dsum,
)
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table


# --------------------------------------------------------------------------
# Q2 shape: per-group argmin through a self-maintained aggregate
# (partsupp-free adaptation: cheapest observed unit price per part)
# --------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH fp AS (
        SELECT p_partkey, p_name FROM part
        WHERE p_type = 'STANDARD' AND p_size <= 10
    ),
    pu AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS min_unit
        FROM lineitem JOIN fp ON l_partkey = p_partkey
        GROUP BY l_partkey, l_suppkey
    ),
    pm AS (
        SELECT l_partkey, MIN(min_unit) AS best FROM pu GROUP BY l_partkey
    )
    SELECT pu.l_partkey AS partkey, p_name, s_name,
           pu.min_unit AS best_unit_price
    FROM pu
    JOIN pm ON pu.l_partkey = pm.l_partkey AND pu.min_unit = pm.best
    JOIN fp ON pu.l_partkey = fp.p_partkey
    JOIN supplier ON pu.l_suppkey = s_suppkey
    ORDER BY partkey, s_name
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each STANDARD small part: the supplier(s) with the lowest
    observed unit price (TPC-H Q2's correlated-MIN shape without
    partsupp).

    Scale: the part filter broadcasts, pruning lineitem before any
    shuffle; the per-(part,supplier) MIN and the per-part argmin reuse
    the same ``l_partkey`` hash partitioning (window over the grouped
    frame — no second shuffle). MIN of a per-row double division is
    order-independent, so the oracle hash-matches.
    """
    fp = read_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    ).select("p_partkey", "p_name")
    l = read_table(spark, sf_dir, "lineitem")
    # one shuffle total: hash on l_partkey alone — that partitioning
    # satisfies BOTH the (l_partkey, l_suppkey) aggregate's clustered
    # distribution and the per-part window, so EnsureRequirements
    # inserts no second exchange
    pu = (
        l.join(F.broadcast(fp), l.l_partkey == fp.p_partkey)
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("min_unit"))
    )
    w = Window.partitionBy("l_partkey")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        pu.withColumn("best", F.min("min_unit").over(w))
        .where(F.col("min_unit") == F.col("best"))
        .join(F.broadcast(fp), F.col("l_partkey") == fp.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            F.col("l_partkey").alias("partkey"),
            "p_name",
            "s_name",
            F.col("min_unit").alias("best_unit_price"),
        )
        .orderBy("partkey", "s_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q7 shape: bidirectional nation-pair volume
# --------------------------------------------------------------------------
@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           {_sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY sn.n_name, cn.n_name, EXTRACT(year FROM l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade volume between two nations, both directions, by ship year.

    Scale: both nation lookups broadcast; supplier broadcasts onto
    lineitem before the fact-fact orders join, so the disjunctive
    nation-pair predicate prunes lineitem rows *before* the big
    shuffle. The only shuffle is orders<->lineitem on orderkey.
    """
    cutlo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    cuthi = F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    sn = n.where(pair).withColumnRenamed("n_name", "supp_nation")
    cn = n.where(pair).withColumnRenamed("n_name", "cust_nation")
    s = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(sn), F.col("s_nationkey") == sn.n_nationkey)
        .select("s_suppkey", "supp_nation")
    )
    c = (
        read_table(spark, sf_dir, "customer")
        .join(F.broadcast(cn), F.col("c_nationkey") == cn.n_nationkey)
        .select("c_custkey", "cust_nation")
    )
    o = (
        read_table(spark, sf_dir, "orders")
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select("o_orderkey", "cust_nation")
    )
    l = (
        read_table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= cutlo) & (F.col("l_shipdate") < cuthi))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
    )
    return (
        l.join(o, F.col("l_orderkey") == o.o_orderkey)
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 shape: market share (conditional / total revenue ratio per year)
# --------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle=f"""
    SELECT EXTRACT(year FROM o_orderdate) AS o_year,
           CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                    AS DECIMAL(18,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region    ON cn.n_regionkey = r_regionkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    GROUP BY EXTRACT(year FROM o_orderdate)
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3 suppliers' share of the ASIA PROMO-part market per year.

    Scale: part/supplier/nation/region all broadcast; the conditional
    numerator folds into the same partial aggregate as the denominator
    (one pass, one shuffle of 6 rows per partition). The ratio divides
    two exact-decimal-derived doubles — portable across engines.
    """
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cn = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_nationkey")
    c = (
        read_table(spark, sf_dir, "customer")
        .join(F.broadcast(cn), F.col("c_nationkey") == cn.n_nationkey)
        .select("c_custkey")
    )
    o = (
        read_table(spark, sf_dir, "orders")
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select("o_orderkey", "o_orderdate")
    )
    p = (
        read_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    sn = n.select("n_nationkey", "n_name")
    s = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(sn), F.col("s_nationkey") == sn.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.when(F.col("n_name") == "NATION_3", vol).otherwise(F.lit(0.0))
    l = (
        read_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
    )
    return (
        l.join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(num.cast(DEC)).cast("double")
                / F.sum(vol.cast(DEC)).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9 shape: profit by supplier nation and year (supplycost-free)
# --------------------------------------------------------------------------
@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, EXTRACT(year FROM l_shipdate) AS o_year,
           {_sql_dsum(
               'l_extendedprice * (1 - l_discount)'
               ' - 0.1 * p_retailprice * l_quantity',
               'sum_profit',
           )}
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(year FROM l_shipdate)
    ORDER BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on red parts by supplier nation and ship year, with
    cost modeled as 10% of retail price (no partsupp.ps_supplycost in
    the synthetic schema).

    Scale: the LIKE filter prunes part before broadcast; no fact-fact
    join at all — lineitem joins only broadcast dims, so the single
    shuffle is the 25-nation x years aggregate.
    """
    p = (
        read_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        read_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(dsum(profit, "sum_profit"))
        .orderBy("nation", "o_year")
    )


# --------------------------------------------------------------------------
# Q10 shape: returned-item revenue per customer, top 20
# --------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {_sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who returned the most revenue in 1996 Q1.

    Scale: the orderdate window prunes orders at the scan; lineitem's
    returnflag filter is pushed to parquet; the orders<->lineitem join
    is the one big shuffle, then customer joins the (already tiny)
    aggregate. Top-20 is TakeOrderedAndProject.
    """
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    l = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    per_cust = (
        l.join(o, F.col("l_orderkey") == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = read_table(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == n.n_nationkey
    )
    return (
        per_cust.join(c, F.col("o_custkey") == c.c_custkey)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q13 shape: distribution of orders-per-customer (filtered left join)
# --------------------------------------------------------------------------
@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
             AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of non-urgent order counts per customer, including
    zero-order customers (the left join is the point of Q13).

    Scale: join and first aggregate share the custkey partitioning
    (one shuffle); the second aggregate moves only (count, 1) pairs.
    COUNT(col) ignores nulls in both engines, so no-order customers
    land in the c_count=0 bucket.
    """
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q15 shape: top supplier via scalar-subquery max (no collect)
# --------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {_sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum quarterly revenue.

    Scale: revenue is one partial+final aggregate over pruned
    lineitem; the scalar MAX is a 1-row frame broadcast back onto the
    revenue frame (no driver-side collect, no second scan of
    lineitem). Equality compares the *same* decimal-derived doubles,
    so ties are exact in both engines.
    """
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-04-01 00:00:00").cast("timestamp_ntz")
    rev = (
        read_table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    best = rev.agg(F.max("total_revenue").alias("best_revenue"))
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(best), F.col("total_revenue") == F.col("best_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q17 shape: small-quantity revenue vs per-part average (correlated AVG)
# --------------------------------------------------------------------------
@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH bp AS (
        SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'
    ),
    bl AS (
        SELECT l_partkey, l_quantity, l_extendedprice
        FROM lineitem JOIN bp ON l_partkey = p_partkey
    ),
    pa AS (
        SELECT l_partkey, {_sql_davg('l_quantity', 'avg_qty')}
        FROM bl GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM bl JOIN pa USING (l_partkey)
    WHERE l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost if small-quantity (< 20% of the
    part's mean) Brand#1 orders were dropped — TPC-H Q17's correlated
    average.

    Scale: the brand part list broadcasts, pruning lineitem before any
    shuffle. The per-part AVG and the self-join both hash on
    ``l_partkey``, and the per-part aggregate is small enough to
    broadcast back — so the pruned fact is scanned once and never
    shuffled. The 0.2*avg threshold is the same decimal-derived double
    in both engines.
    """
    bp = (
        read_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    bl = (
        read_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(bp), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    pa = bl.groupBy("l_partkey").agg(davg(F.col("l_quantity"), "avg_qty"))
    joined = bl.join(F.broadcast(pa), "l_partkey").where(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return joined.agg(
        (
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0)
        ).alias("avg_yearly")
    )


# --------------------------------------------------------------------------
# Q19 shape: disjunctive multi-attribute predicate join
# --------------------------------------------------------------------------
@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {_sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under a 3-branch disjunction of brand/size/quantity
    predicates (TPC-H Q19 without shipmode/container).

    Scale: Catalyst extracts the common implied filters — part rows
    outside Brand#1-3 and lineitem rows outside quantity [1,30] are
    pruned at the scans — then the residual disjunction evaluates on
    the broadcast join's output. Single scalar result; no shuffle of
    lineitem at all.
    """
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = read_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 50) & q.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .where(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --------------------------------------------------------------------------
# Q21 shape: sole-blocking-supplier (EXISTS / NOT-EXISTS via windows)
# --------------------------------------------------------------------------
@query(
    "q21_waiting_supplier",
    oracle="""
    WITH ss AS (
        SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS smax
        FROM lineitem JOIN orders
             ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
        GROUP BY l_orderkey, l_suppkey
    ),
    om AS (
        SELECT l_orderkey, MAX(smax) AS omax, COUNT(*) AS nsupp
        FROM ss GROUP BY l_orderkey
    ),
    late AS (
        SELECT ss.l_orderkey, ss.l_suppkey
        FROM ss JOIN om USING (l_orderkey)
        WHERE ss.smax = om.omax AND om.nsupp >= 2
    ),
    solo AS (
        SELECT l_orderkey FROM late GROUP BY l_orderkey HAVING COUNT(*) = 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late JOIN solo USING (l_orderkey)
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the *sole* last shipper on finalized
    multi-supplier orders — TPC-H Q21's EXISTS/NOT-EXISTS shape,
    expressed with one grouped frame and windows instead of two extra
    self-joins of lineitem.

    Scale: lineitem is shuffled once (groupBy orderkey+suppkey); the
    order-level max/count/late-count are window functions over the
    same orderkey partitioning — Catalyst plans zero additional
    exchanges for them. The reference-shape correlated subqueries
    would rescan lineitem twice.
    """
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    # one shuffle: hash on l_orderkey alone so the same exchange feeds
    # the (l_orderkey, l_suppkey) aggregate AND all three windows
    ss = (
        read_table(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("smax"))
    )
    w = Window.partitionBy("l_orderkey")
    enriched = (
        ss.withColumn("omax", F.max("smax").over(w))
        .withColumn("nsupp", F.count(F.lit(1)).over(w))
        .withColumn(
            "nlate",
            F.sum(F.when(F.col("smax") == F.col("omax"), 1).otherwise(0)).over(w),
        )
    )
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        enriched.where(
            (F.col("nsupp") >= 2)
            & (F.col("nlate") == 1)
            & (F.col("smax") == F.col("omax"))
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q22 shape: scalar-subquery threshold + anti join
# --------------------------------------------------------------------------
@query(
    "q22_idle_rich_customers",
    oracle=f"""
    WITH thresh AS (
        SELECT {_sql_davg('c_acctbal', 'avg_bal')}
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT (c_nationkey % 5) AS segment,
           COUNT(*) AS numcust,
           {_sql_dsum('c_acctbal', 'totacctbal')}
    FROM customer, thresh
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY (c_nationkey % 5)
    ORDER BY segment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no *recent* orders (none
    since 2000-01-01), rolled up by nation segment — TPC-H Q22 with
    ``c_nationkey % 5`` standing in for the phone country code and a
    recency window standing in for never-ordered (which is vacuously
    empty on the synthetic data: every customer has orders).

    Scale: the AVG threshold is a 1-row broadcast (no collect); the
    NOT EXISTS is a left-anti join against just orders' custkey column
    (orderdate filter + custkey projection pushed to the scan). Both
    shuffles hash on custkey.
    """
    c = read_table(spark, sf_dir, "customer")
    thresh = c.where(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal"), "avg_bal")
    )
    o = (
        read_table(spark, sf_dir, "orders")
        .where(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
        )
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal"), "totacctbal"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# Q11 shape: per-group value vs a global-threshold scalar subquery
# (partsupp-free adaptation: per-part shipped value for one nation's
# suppliers, kept only above a fraction of the nation's total)
# --------------------------------------------------------------------------
@query(
    "q11_important_parts",
    oracle=f"""
    WITH nl AS (
        SELECT l_partkey, l_extendedprice * (1 - l_discount) AS val
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
    ),
    pv AS (
        SELECT l_partkey AS partkey, {_sql_dsum('val', 'part_value')}
        FROM nl GROUP BY l_partkey
    )
    SELECT partkey, part_value FROM pv
    WHERE part_value > (SELECT {_sql_dsum('val', 't')} FROM nl) * 0.001
    ORDER BY part_value DESC, partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11's shape — per-group value filtered against a scalar
    subquery over the SAME input (fraction of the grand total) — with
    lineitem value standing in for partsupp stock value (TESTDATA.md has
    no partsupp).

    Scale: the nation→supplier dimension chain broadcasts (never
    shuffles lineitem); the per-part aggregate is partial+final on
    ``l_partkey``; the grand total is the SAME aggregate re-reduced to
    one row and broadcast back — no driver collect, no second scan of
    the fact (the per-part frame re-aggregates, |parts| rows not
    |lineitem|).
    """
    n = read_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    s = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    l = read_table(spark, sf_dir, "lineitem")
    val = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pv = (
        l.join(F.broadcast(s), l.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(dsum(val, "part_value"))
    )
    # grand total from the already-reduced per-part frame: decimal sums
    # re-add associatively, so re-aggregating part_value (cast back to
    # decimal) equals one pass over the raw rows
    total = pv.agg(
        (F.sum(F.col("part_value").cast(DEC)).cast("double") * F.lit(0.001)).alias(
            "threshold"
        )
    )
    return (
        pv.join(F.broadcast(total))
        .where(F.col("part_value") > F.col("threshold"))
        .select("partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "partkey")
    )


# --------------------------------------------------------------------------
# Q12 shape: conditional CASE-sum aggregation over a fact-fact join
# (shipmode-free adaptation: ship-year lanes, priority split)
# --------------------------------------------------------------------------
@query(
    "q12_priority_by_shipyear",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1999-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def q12_priority_by_shipyear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12's shape — join the two facts, then pivot priority into
    conditional counts per lane — with ship-year lanes standing in for
    l_shipmode (TESTDATA.md has no shipmode column).

    Scale: the date filter prunes lineitem at the parquet scan before
    the orderkey shuffle; both facts shuffle-join on ``l_orderkey`` (the
    orders side is too big to broadcast at 100 TB); the CASE-sums are
    plain long counts — partial aggregation collapses each partition to
    |years| rows before the final exchange.
    """
    l = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("date"))
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


# --------------------------------------------------------------------------
# Q16 shape: distinct-count per attribute group, with an excluded-set
# anti-join (partsupp-free: suppliers observed shipping the part)
# --------------------------------------------------------------------------
@query(
    "q16_parts_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16's shape — how many distinct suppliers serve each
    (brand, type, size) slice, excluding a complaint set — with the
    lineitem relation standing in for partsupp and negative-balance
    suppliers standing in for the '%Complaints%' comment match.

    Scale: part filter broadcasts; the excluded-supplier set is tiny and
    broadcast as a LEFT ANTI join (NOT IN with non-null keys ≡ anti
    join); COUNT(DISTINCT) compiles to a two-phase Expand-free plan —
    first a (group, suppkey) distinct-aggregate, then the count — both
    partial+final on the same keys.
    """
    p = read_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = read_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    l = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q20 shape: nested semi-joins through a correlated half-of-total
# threshold (partsupp-free: suppliers dominating a part's 1997 volume)
# --------------------------------------------------------------------------
@query(
    "q20_dominant_part_suppliers",
    oracle="""
    WITH fl AS (
        SELECT l_partkey, l_suppkey, l_quantity FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small %')
          AND l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1998-01-01'
    ),
    sq AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
        FROM fl GROUP BY l_partkey, l_suppkey
    ),
    pt AS (
        SELECT l_partkey, CAST(SUM(CAST(qty AS DECIMAL(18,6))) AS DOUBLE) AS tot
        FROM sq GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey AS suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT sq.l_suppkey FROM sq JOIN pt ON sq.l_partkey = pt.l_partkey
        WHERE sq.qty > 0.5 * pt.tot)
    ORDER BY suppkey
    """,
)
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20's shape — a supplier qualifies if, for SOME filtered
    part, its own shipped volume exceeds half that part's total (the
    availqty > ½·sum(qty) correlated threshold), then a semi-join back
    to supplier — with 1997 shipped quantity standing in for partsupp
    availqty.

    Scale: the name-filtered part set broadcasts to prune lineitem at
    the scan; one shuffle on ``l_partkey`` serves both the
    (part, supplier) aggregate and the per-part total (window over the
    grouped frame — no second exchange); the qualifying supplier-key set
    is tiny, so the final LEFT SEMI join broadcasts it rather than
    shuffling the supplier table.
    """
    p = read_table(spark, sf_dir, "part").where(
        F.col("p_name").like("small %")
    ).select("p_partkey")
    l = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    sq = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        sq.withColumn(
            "tot", F.sum(F.col("qty").cast(DEC)).over(w).cast("double")
        )
        .where(F.col("qty") > F.lit(0.5) * F.col("tot"))
        .select("l_suppkey")
    )
    s = read_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(dominant), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select(F.col("s_suppkey").alias("suppkey"), "s_name")
        .orderBy("suppkey")
    )
