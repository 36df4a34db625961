"""Privacy operators: pseudonymization + k-anonymity generalization.

Training-data pipelines that touch user-derived tables must anonymize
before the data reaches a lake queryable by analysts. Two standard
moves, composed here over the ``customer`` dimension:

1. **Pseudonymize** direct identifiers — replace ``c_name`` with a
   keyed-hash pseudonym (md5 here; HMAC with a secret in prod). Joins
   on the pseudonym still work; the identity does not round-trip.
2. **Generalize + suppress** quasi-identifiers — coarsen columns that
   identify in combination (account balance → 500-wide band; drop
   nation entirely), then **suppress** any row whose generalized
   quasi-identifier group has fewer than k members. Every released row
   is then k-anonymous: it matches >= k-1 others on everything an
   attacker could link on.

Scale shape: generalization is row-local; the group-size check is one
hash aggregation on the generalized tuple followed by a broadcast join
of the (tiny — one row per *cell*, not per customer) group-size table
back onto the stream. No window function, no second shuffle of the
fact rows, no driver-side state — the same plan works on 10^9 users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.registry import query
from dynamodb_streaming_datalake_spark.sources.readers import read_table

#: minimum group size for a quasi-identifier cell to be released
K_ANON = 10
#: width of the account-balance generalization band
ACCTBAL_BAND = 500


def k_anonymize(
    df: DataFrame,
    id_col: str,
    quasi_cols: list[str],
    k: int = K_ANON,
) -> DataFrame:
    """Release rows whose quasi-identifier tuple occurs >= k times;
    ``id_col`` is already expected to be pseudonymized/generalized."""
    sizes = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") >= k)
    )
    return df.join(F.broadcast(sizes), quasi_cols)


@query(
    "q_k_anonymize",
    oracle=f"""
    WITH g AS (
        SELECT md5(c_name) AS pseudonym,
               c_mktsegment,
               CAST(floor(c_acctbal / {ACCTBAL_BAND}) AS BIGINT) * {ACCTBAL_BAND}
                   AS acctbal_band
        FROM customer
    ),
    sizes AS (
        SELECT c_mktsegment, acctbal_band, COUNT(*) AS group_size
        FROM g GROUP BY c_mktsegment, acctbal_band
        HAVING COUNT(*) >= {K_ANON}
    )
    SELECT g.pseudonym, g.c_mktsegment, g.acctbal_band, sizes.group_size
    FROM g JOIN sizes USING (c_mktsegment, acctbal_band)
    """,
)
def q_k_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anonymized customer release: md5 pseudonym, nation dropped,
    balance banded to {ACCTBAL_BAND}s, rows in quasi-identifier groups
    smaller than k={K_ANON} suppressed."""
    c = read_table(spark, sf_dir, "customer")
    generalized = c.select(
        F.md5("c_name").alias("pseudonym"),
        "c_mktsegment",
        (
            F.floor(F.col("c_acctbal") / ACCTBAL_BAND).cast("bigint") * ACCTBAL_BAND
        ).alias("acctbal_band"),
    )
    return k_anonymize(generalized, "pseudonym", ["c_mktsegment", "acctbal_band"])
