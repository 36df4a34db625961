"""Join-order enumeration costed from measured statistics — the
Selinger exercise, run as a query.

SURVEY §4 documents that this engine DELEGATES physical planning to
Catalyst; this module makes the reasoning inspectable: measure the
exact statistics a cost-based optimizer would use (cardinalities +
distinct key counts -> equi-join selectivities under the classic
``1/max(ndv)`` containment assumption), enumerate every CONNECTED
left-deep join order over the customer–orders–lineitem–part chain,
and cost each with the C_out metric (sum of estimated intermediate
cardinalities). The plan list and every cost polynomial are GENERATED
once in Python and emitted to both engines verbatim (the probe/_SqlOp
discipline), so the entire optimizer simulation is engine-exact and
oracle-gated — and the test checks the estimator's chosen order
against TRUE intermediate cardinalities computed by actually running
the prefix joins.

Scale: the statistics pass is one count + countDistinct aggregate per
relation (map-side combined; swap countDistinct for the HLL sketch of
q_analyze_ndv at lake scale); the enumeration itself is arithmetic on
a 1-row frame x |plans| literal branches.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.registry import format_doc, query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

#: join graph: relation aliases, base tables, and equi-join edges
PLAN_RELS = {
    "c": ("customer", "c_custkey"),
    "o": ("orders", None),
    "l": ("lineitem", None),
    "p": ("part", "p_partkey"),
}
#: edges as (left alias, right alias, left key, right key)
PLAN_EDGES = (
    ("c", "o", "c_custkey", "o_custkey"),
    ("o", "l", "o_orderkey", "l_orderkey"),
    ("l", "p", "l_partkey", "p_partkey"),
)


def enumerate_left_deep() -> list[tuple[str, str]]:
    """Every CONNECTED left-deep order over the join chain, with its
    C_out cost polynomial over the stats columns (n_<r>, sel_<e>).
    Generated once; both engines evaluate the same parenthesized
    expression."""
    edge_sets = {
        frozenset((a, b)): f"sel_{a}{b}" for a, b, _, _ in PLAN_EDGES
    }
    plans = []
    for perm in itertools.permutations("colp"):
        if any(
            not any(
                frozenset((perm[i], q)) in edge_sets for q in perm[:i]
            )
            for i in range(1, 4)
        ):
            continue
        terms = []
        for i in range(2, 5):
            pre = perm[:i]
            factors = [f"n_{r}" for r in pre]
            factors += [
                s for e, s in sorted(edge_sets.items(), key=lambda kv: kv[1])
                if e <= set(pre)
            ]
            terms.append("(" + " * ".join(factors) + ")")
        plans.append((" JOIN ".join(perm), " + ".join(terms)))
    return plans


def _planner_oracle() -> str:
    branches = "\n    UNION ALL ".join(
        f"SELECT '{name}' AS plan, CAST({expr} AS DOUBLE) AS est_cost"
        f" FROM stats"
        for name, expr in enumerate_left_deep()
    )
    return f"""
    WITH stats AS (
        SELECT
            (SELECT CAST(COUNT(*) AS DOUBLE) FROM customer) AS n_c,
            (SELECT CAST(COUNT(*) AS DOUBLE) FROM orders) AS n_o,
            (SELECT CAST(COUNT(*) AS DOUBLE) FROM lineitem) AS n_l,
            (SELECT CAST(COUNT(*) AS DOUBLE) FROM part) AS n_p,
            1.0 / GREATEST(
                (SELECT COUNT(DISTINCT c_custkey) FROM customer),
                (SELECT COUNT(DISTINCT o_custkey) FROM orders)) AS sel_co,
            1.0 / GREATEST(
                (SELECT COUNT(DISTINCT o_orderkey) FROM orders),
                (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem))
                AS sel_ol,
            1.0 / GREATEST(
                (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
                (SELECT COUNT(DISTINCT p_partkey) FROM part)) AS sel_lp
    ),
    plans AS ({branches})
    SELECT plan,
           round(est_cost, 4) AS est_cost,
           CAST(RANK() OVER (ORDER BY est_cost, plan) AS INT)
             AS cost_rank,
           est_cost = MIN(est_cost) OVER () AS is_optimal
    FROM plans
    """


@query("q_join_order_dp", oracle=_planner_oracle())
def q_join_order_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Selinger exercise as an oracle-gated query: measure the
    statistics a cost-based optimizer uses (exact cardinalities and
    distinct key counts -> 1/max(ndv) equi-join selectivities),
    enumerate every CONNECTED left-deep order over the
    customer–orders–lineitem–part chain, and cost each with C_out
    (sum of estimated intermediate cardinalities). The plan list and
    every cost polynomial are generated ONCE in Python and handed to
    both engines verbatim, so the whole simulation hash-matches; the
    test then runs the winning order's prefix joins for REAL and
    checks the estimator ranked true costs correctly. This is §4's
    "let Catalyst optimize" made inspectable — the same arithmetic
    AQE's cost model applies, visible and provable.

    Scale: one count+countDistinct aggregate per relation (swap in
    the q_analyze_ndv HLL sketch at lake scale); the enumeration is
    |plans| literal branches over a 1-row stats frame."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    stats = (
        c.agg(
            F.count(F.lit(1)).cast("double").alias("n_c"),
            F.countDistinct("c_custkey").alias("ndv_c_custkey"),
        )
        .crossJoin(
            F.broadcast(
                o.agg(
                    F.count(F.lit(1)).cast("double").alias("n_o"),
                    F.countDistinct("o_custkey").alias("ndv_o_custkey"),
                    F.countDistinct("o_orderkey").alias(
                        "ndv_o_orderkey"
                    ),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                l.agg(
                    F.count(F.lit(1)).cast("double").alias("n_l"),
                    F.countDistinct("l_orderkey").alias(
                        "ndv_l_orderkey"
                    ),
                    F.countDistinct("l_partkey").alias("ndv_l_partkey"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                p.agg(
                    F.count(F.lit(1)).cast("double").alias("n_p"),
                    F.countDistinct("p_partkey").alias("ndv_p_partkey"),
                )
            )
        )
        .select(
            "n_c",
            "n_o",
            "n_l",
            "n_p",
            (
                1.0
                / F.greatest(
                    F.col("ndv_c_custkey"), F.col("ndv_o_custkey")
                )
            ).alias("sel_co"),
            (
                1.0
                / F.greatest(
                    F.col("ndv_o_orderkey"), F.col("ndv_l_orderkey")
                )
            ).alias("sel_ol"),
            (
                1.0
                / F.greatest(
                    F.col("ndv_l_partkey"), F.col("ndv_p_partkey")
                )
            ).alias("sel_lp"),
        )
    )
    plans = None
    for name, expr in enumerate_left_deep():
        br = stats.select(
            F.lit(name).alias("plan"),
            F.expr(expr).cast("double").alias("est_cost"),
        )
        plans = br if plans is None else plans.unionByName(br)
    wall = Window.partitionBy()
    return plans.select(
        "plan",
        F.round("est_cost", 4).alias("est_cost"),
        F.rank()
        .over(Window.orderBy("est_cost", "plan"))
        .cast("int")
        .alias("cost_rank"),
        (F.col("est_cost") == F.min("est_cost").over(wall)).alias(
            "is_optimal"
        ),
    )


format_doc(q_join_order_dp)
