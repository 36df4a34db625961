"""Additional storage formats: CSV (quoted/escaped) and ORC.

The reference lake speaks parquet + gzip NDJSON (SURVEY §2 B1-B2).
Real consumers also exchange CSV (the interchange lowest common
denominator, where quoting bugs live) and ORC (the other mainstream
columnar format, bundled with Spark). Both round-trips are oracle-
gated: write a derived table once (shared cache), read it back with
the REAL format reader, and hash-match an aggregate the oracle
computes from the base table — a quoting/escaping/pushdown bug
anywhere in the round-trip breaks the hash.

Scale: both writers shard by partition exactly like the parquet sink;
ORC scans push predicates and prune columns like parquet (plan-pinned
in tests); CSV is the format you pay linear parse cost for — which is
precisely why the engine's zone formats stay columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.cache import ensure_cached_build
from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

_FMT_VERSION = "v1"


def _csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer rows with a synthesized free-text column that exercises
    every CSV quoting hazard: embedded delimiters, double quotes, and
    newlines."""
    c = read_table(spark, sf_dir, "customer")
    hazard = F.concat(
        F.lit('addr "'),
        F.col("c_name"),
        F.lit('", seg,'),
        F.col("c_mktsegment"),
        F.lit(",\nline2"),
    )
    return c.select(
        "c_custkey",
        "c_name",
        F.col("c_acctbal").cast("decimal(12,2)").alias("c_acctbal"),
        hazard.alias("c_note"),
    )


def build_csv(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    (
        _csv_source(spark, sf_dir)
        .write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "true")
        .option("escape", '"')
        .csv(f"{out_dir}/csv")
    )


def ensure_csv(spark: SparkSession, sf_dir: str) -> str:
    return ensure_cached_build(
        "fmt_csv", _FMT_VERSION, sf_dir,
        lambda d: build_csv(spark, sf_dir, d),
    )


@query(
    "q_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             AS total_bal,
           -- note = 'addr "' ++ name ++ '", seg,' ++ seg ++ ',\\nline2':
           -- fixed scaffolding contributes exactly 20 chars
           CAST(SUM(len(c_name) + len(c_mktsegment) + 20) AS BIGINT)
             AS note_chars
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip under maximum quoting stress: every note field
    embeds the delimiter, doubled quotes, AND a raw newline
    (multiLine). The aggregate recomputes note lengths from the read-
    back bytes; the oracle derives them arithmetically from the base
    table — one mis-parsed quote and the row count or the char count
    diverges."""
    path = ensure_csv(spark, sf_dir)
    df = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .schema(
            "c_custkey bigint, c_name string, c_acctbal decimal(12,2),"
            " c_note string"
        )
        .csv(f"{path}/csv")
    )
    seg = F.regexp_extract("c_note", r", seg,([A-Z]+),", 1)
    return (
        df.select(
            seg.alias("c_mktsegment"),
            "c_acctbal",
            F.length("c_note").alias("note_len"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c_acctbal").cast("double").alias("total_bal"),
            F.sum("note_len").cast("bigint").alias("note_chars"),
        )
    )


def build_orc(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    (
        read_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_suppkey",
            "l_quantity",
            F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
            "l_returnflag",
            "l_shipdate",
        )
        .write.mode("overwrite")
        .orc(f"{out_dir}/orc")
    )


def ensure_orc(spark: SparkSession, sf_dir: str) -> str:
    return ensure_cached_build(
        "fmt_orc", _FMT_VERSION, sf_dir,
        lambda d: build_orc(spark, sf_dir, d),
    )


@query(
    "q_orc_roundtrip",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_quantity >= 25
    GROUP BY l_returnflag
    """,
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip with a selective filter: the l_quantity >= 25
    predicate must reach the ORC reader (PushedFilters — plan-pinned in
    tests/test_quality.py) and only (flag, qty, price) columns are
    read. Values are decimal-exact against the base-table oracle."""
    path = ensure_orc(spark, sf_dir)
    df = spark.read.orc(f"{path}/orc")
    return (
        df.where(F.col("l_quantity") >= 25)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("qty"),
            F.sum("price").cast("double").alias("revenue"),
        )
    )
