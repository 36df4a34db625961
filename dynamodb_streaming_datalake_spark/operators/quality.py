"""Data-quality constraint checking (dbt-test / Deequ-style) in one
declarative pass per table.

A lake that ingests CDC (SURVEY §2 A3-A9) needs continuous constraint
verification: primary-key uniqueness, foreign-key containment,
null-rate budgets, and domain ranges. Each check is expressed as an
aggregate or broadcast anti-join and unioned into one typed report —
the shape monitoring systems ingest.

Scale: every check is a partial+final aggregate (count of violations),
so the report costs one scan per table plus broadcast-sized key
anti-joins for the FK checks — never a wide shuffle. At 100 TB checks
fuse into scans already running (observe-don't-rescan), which this
plan shape permits: each CTE is independent and pipelines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table


def pk_unique(df: DataFrame, table: str, key: str) -> DataFrame:
    """One scan: per-key counts, then both report numbers from the
    SAME grouped frame (row total = sum of counts; violations = keys
    appearing more than once)."""
    g = df.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
    return g.agg(
        F.sum("c").alias("n_checked"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_violations"),
    ).select(
        F.lit("pk_unique").alias("check_name"),
        F.lit(table).alias("table_name"),
        "n_checked",
        "n_violations",
    )


def fk_contained(
    child: DataFrame, child_key: str, parent: DataFrame,
    parent_key: str, check: str, table: str,
) -> DataFrame:
    """One scan of the child: left-join the (deduplicated) parent key
    set and count rows + unmatched rows in a single aggregate."""
    pk = parent.select(parent_key).distinct()
    joined = child.select(child_key).join(
        pk, child[child_key] == pk[parent_key], "left"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.when(pk[parent_key].isNull(), 1).otherwise(0)).alias(
            "n_violations"
        ),
    ).select(
        F.lit(check).alias("check_name"),
        F.lit(table).alias("table_name"),
        "n_checked",
        "n_violations",
    )


def predicate(
    df: DataFrame, bad, check: str, table: str
) -> DataFrame:
    return df.agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("n_violations"),
    ).select(
        F.lit(check).alias("check_name"),
        F.lit(table).alias("table_name"),
        "n_checked",
        "n_violations",
    )


@query(
    "q_data_quality_report",
    oracle="""
    SELECT * FROM (
        SELECT 'pk_unique' AS check_name, 'customer' AS table_name,
               (SELECT COUNT(*) FROM customer) AS n_checked,
               (SELECT COUNT(*) FROM
                  (SELECT c_custkey FROM customer GROUP BY c_custkey
                   HAVING COUNT(*) > 1)) AS n_violations
        UNION ALL
        SELECT 'pk_unique', 'orders',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM
                  (SELECT o_orderkey FROM orders GROUP BY o_orderkey
                   HAVING COUNT(*) > 1))
        UNION ALL
        SELECT 'fk_orders_customer', 'orders',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'fk_lineitem_orders', 'lineitem',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'not_null_text', 'documents',
               (SELECT COUNT(*) FROM documents),
               (SELECT COUNT(*) FROM documents
                WHERE text IS NULL OR len(text) = 0)
        UNION ALL
        SELECT 'value_non_negative', 'events',
               (SELECT COUNT(*) FROM events),
               (SELECT COUNT(*) FROM events WHERE value < 0)
        UNION ALL
        SELECT 'quantity_domain', 'lineitem',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem
                WHERE l_quantity < 1 OR l_quantity > 50)
    ) ORDER BY check_name, table_name
    """,
)
def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven constraint checks over five tables as one typed report:
    PK uniqueness (grouped HAVING), FK containment (broadcast
    anti-joins — the EXISTS twin), not-null/non-empty budgets, and
    numeric domain ranges. Violation counts are exact integers, so the
    report hash-matches the oracle's correlated-subquery formulation.
    """
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    docs = read_table(spark, sf_dir, "documents")
    ev = read_table(spark, sf_dir, "events")

    parts = [
        pk_unique(cust, "customer", "c_custkey"),
        pk_unique(orders, "orders", "o_orderkey"),
        fk_contained(
            orders, "o_custkey", cust, "c_custkey",
            "fk_orders_customer", "orders",
        ),
        fk_contained(
            li, "l_orderkey", orders, "o_orderkey",
            "fk_lineitem_orders", "lineitem",
        ),
        predicate(
            docs,
            F.col("text").isNull() | (F.length("text") == 0),
            "not_null_text",
            "documents",
        ),
        predicate(ev, F.col("value") < 0, "value_non_negative", "events"),
        predicate(
            li,
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
            "quantity_domain",
            "lineitem",
        ),
    ]
    report = reduce(lambda a, b: a.unionAll(b), parts)
    return report.orderBy("check_name", "table_name").select(
        "check_name",
        "table_name",
        F.col("n_checked").cast("bigint").alias("n_checked"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
    )
