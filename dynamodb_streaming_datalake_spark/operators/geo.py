"""Spatial join via grid-cell bucketing — the scale pattern for
"find things near other things" without a cross join.

The reference has no spatial support at all; this adds the lake-side
primitive a geo workload needs: bucket both sides into fixed-size grid
cells, equi-join each probe cell against its 3x3 cell neighborhood,
then refine with an exact distance predicate. At 100 TB the win is
structural: the candidate set per probe row is bounded by local
density, the join is a plain hash/sort-merge equi-join on (cell_x,
cell_y), and a hot cell can be salted like any other skewed key.

Coordinates are synthesized deterministically from the TPC-H keys
(the fixture tables carry no geography) with the same portable md5
hash used everywhere else, so both engines derive identical positions.
Distance is planar squared-degrees — multiply/add only, in one fixed
evaluation order — because cross-engine trig (haversine's sin/cos) is
libm-dependent and would break the value-hash gate. The grid logic is
metric-agnostic: swap in haversine and a latitude-corrected cell width
for production geodesy.
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

#: grid-cell edge in degrees; MUST be >= the search radius so the 3x3
#: neighborhood is a complete candidate set for radius-R matches
GEO_CELL_DEG = 15.0
#: search radius in degrees (planar)
GEO_RADIUS_DEG = 15.0


def synth_lat(key: Column, tag: str) -> Column:
    """Deterministic latitude in [-90, 90) from a key column."""
    h = portable_hash60(F.concat(F.lit(f"{tag}lat_"), key.cast("string")))
    return (h % 180_000).cast("double") / F.lit(1000.0) - F.lit(90.0)


def synth_lon(key: Column, tag: str) -> Column:
    """Deterministic longitude in [-180, 180) from a key column."""
    h = portable_hash60(F.concat(F.lit(f"{tag}lon_"), key.cast("string")))
    return (h % 360_000).cast("double") / F.lit(1000.0) - F.lit(180.0)


def _sql_lat(key_expr: str, tag: str) -> str:
    h = sql_portable_hash60(f"'{tag}lat_' || CAST({key_expr} AS VARCHAR)")
    return f"(CAST({h} % 180000 AS DOUBLE) / 1000.0 - 90.0)"


def _sql_lon(key_expr: str, tag: str) -> str:
    h = sql_portable_hash60(f"'{tag}lon_' || CAST({key_expr} AS VARCHAR)")
    return f"(CAST({h} % 360000 AS DOUBLE) / 1000.0 - 180.0)"


def grid_cell(lat: Column, lon: Column) -> tuple[Column, Column]:
    """(cell_x, cell_y) for a point; floor of an IEEE division, so both
    engines bucket identically."""
    return (
        F.floor((lon + F.lit(180.0)) / F.lit(GEO_CELL_DEG)).cast("int"),
        F.floor((lat + F.lit(90.0)) / F.lit(GEO_CELL_DEG)).cast("int"),
    )


@query(
    "q_geo_join",
    oracle=f"""
    WITH cust AS (
        SELECT c_custkey,
               {_sql_lat("c_custkey", "c")} AS lat,
               {_sql_lon("c_custkey", "c")} AS lon
        FROM customer
    ),
    supp AS (
        SELECT s_suppkey,
               {_sql_lat("s_suppkey", "s")} AS lat,
               {_sql_lon("s_suppkey", "s")} AS lon
        FROM supplier
    ),
    cand AS (
        SELECT c.c_custkey, s.s_suppkey,
               (c.lat - s.lat) * (c.lat - s.lat)
                 + (c.lon - s.lon) * (c.lon - s.lon) AS d2
        FROM cust c JOIN supp s
          ON abs(CAST(floor((s.lon + 180.0) / {GEO_CELL_DEG}) AS INT)
                 - CAST(floor((c.lon + 180.0) / {GEO_CELL_DEG}) AS INT)) <= 1
         AND abs(CAST(floor((s.lat + 90.0) / {GEO_CELL_DEG}) AS INT)
                 - CAST(floor((c.lat + 90.0) / {GEO_CELL_DEG}) AS INT)) <= 1
        WHERE (c.lat - s.lat) * (c.lat - s.lat)
                 + (c.lon - s.lon) * (c.lon - s.lon)
               <= {GEO_RADIUS_DEG} * {GEO_RADIUS_DEG}
    ),
    ranked AS (
        SELECT c_custkey, s_suppkey, d2,
               COUNT(*) OVER (PARTITION BY c_custkey) AS n_within,
               ROW_NUMBER() OVER (PARTITION BY c_custkey
                                  ORDER BY round(d2, 6), s_suppkey) AS rk
        FROM cand
    )
    SELECT c_custkey, CAST(n_within AS BIGINT) AS n_within,
           s_suppkey AS nearest_suppkey, round(d2, 6) AS nearest_d2
    FROM ranked WHERE rk = 1
    """,
)
def q_geo_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius spatial join: for every customer with at least one
    supplier within {GEO_RADIUS_DEG} planar degrees, the count of
    suppliers in range and the nearest one (ties broken on rounded
    distance then supplier key — rounding before ranking is the usual
    cross-engine ulp guard).

    The Spark plan is the scale shape: suppliers explode into their
    3x3 cell neighborhoods (constant x9), customers stay single-cell,
    and the match is a hash equi-join on (cell_x, cell_y) — never a
    cross join; the oracle's |Δcell| <= 1 condition states the same
    candidate set declaratively. Cell edge >= radius makes the
    neighborhood candidate set complete, so the refine filter loses
    nothing.

    Scale: the small side (suppliers) broadcasts here; with two big
    sides the same cell key becomes the shuffle key and hot cells get
    salted — the standard points-in-polygon/near-join recipe."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        synth_lat(F.col("c_custkey"), "c").alias("lat"),
        synth_lon(F.col("c_custkey"), "c").alias("lon"),
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        synth_lat(F.col("s_suppkey"), "s").alias("lat"),
        synth_lon(F.col("s_suppkey"), "s").alias("lon"),
    )
    cx, cy = grid_cell(F.col("lat"), F.col("lon"))
    cust = cust.withColumn("cell_x", cx).withColumn("cell_y", cy)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    sx, sy = grid_cell(F.col("lat"), F.col("lon"))
    supp9 = (
        supp.withColumn("o", F.explode(offsets))
        .select(
            "s_suppkey",
            F.col("lat").alias("s_lat"),
            F.col("lon").alias("s_lon"),
            (sx + F.col("o.dx")).alias("cell_x"),
            (sy + F.col("o.dy")).alias("cell_y"),
        )
    )
    d2 = (F.col("lat") - F.col("s_lat")) * (F.col("lat") - F.col("s_lat")) + (
        F.col("lon") - F.col("s_lon")
    ) * (F.col("lon") - F.col("s_lon"))
    cand = (
        cust.join(F.broadcast(supp9), ["cell_x", "cell_y"])
        .withColumn("d2", d2)
        .where(F.col("d2") <= F.lit(GEO_RADIUS_DEG * GEO_RADIUS_DEG))
    )
    w = Window.partitionBy("c_custkey")
    wr = w.orderBy(F.round("d2", 6), "s_suppkey")
    return (
        cand.withColumn("n_within", F.count(F.lit(1)).over(w))
        .withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") == 1)
        .select(
            "c_custkey",
            F.col("n_within").cast("bigint").alias("n_within"),
            F.col("s_suppkey").alias("nearest_suppkey"),
            F.round("d2", 6).alias("nearest_d2"),
        )
    )


_fmt(q_geo_join, GEO_RADIUS_DEG=GEO_RADIUS_DEG)
