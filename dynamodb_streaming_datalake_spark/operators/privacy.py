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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.functions.texthash import (
    sql_portable_hash60,
)
from dynamodb_streaming_datalake_spark.registry import format_doc as _fmt
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


# ---------------------------------------------------------------------------
# PII redaction (regex scrubbing of free text)
# ---------------------------------------------------------------------------

#: email-shaped substrings (the fixture corpus has none, so the query
#: synthesizes a deterministic contact line per customer — the point is
#: the redaction plumbing, which real corpora exercise directly)
EMAIL_RE = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: phone-shaped substrings: +D-DDD-DDDD / DDD-DDD-DDDD style runs
PHONE_RE = r"\+?[0-9]{1,3}-[0-9]{3,4}-[0-9]{4}"


def redact_pii(text: Column) -> Column:
    """Scrub email- then phone-shaped substrings with typed tags.

    Scale: two JVM regexp_replace passes, row-local, zero shuffle —
    a pure map over the corpus at any size.
    """
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )


@query(
    "q_pii_redact",
    oracle=f"""
    WITH contact AS (
        SELECT c_custkey,
               'Reach ' || c_name || ' at user' || c_custkey ||
               '@example.com or +1-555-' ||
               lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
               ' re ' || c_mktsegment AS text
        FROM customer
    )
    SELECT c_custkey,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
             AS n_phones,
           regexp_replace(regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
                          '{PHONE_RE}', '[PHONE]', 'g') AS redacted
    FROM contact
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over free text: count and scrub email/phone-shaped
    substrings before the text reaches a training corpus. The contact
    line is synthesized deterministically per customer (the fixtures
    carry no PII); the regex scrub itself is exactly what runs on a
    real crawl."""
    c = read_table(spark, sf_dir, "customer")
    text = F.concat(
        F.lit("Reach "),
        F.col("c_name"),
        F.lit(" at user"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" re "),
        F.col("c_mktsegment"),
    )
    return c.select(
        "c_custkey",
        F.regexp_count(text, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(text, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        redact_pii(text).alias("redacted"),
    )



_fmt(q_k_anonymize, ACCTBAL_BAND=ACCTBAL_BAND, K_ANON=K_ANON)


# ---------------------------------------------------------------------------
# l-diversity audit (round 9)
# ---------------------------------------------------------------------------
# k-anonymity's known gap: a group can be large yet carry only one
# sensitive value, so membership alone reveals it (the homogeneity
# attack). The l-diversity audit scores every released
# quasi-identifier group by its count of DISTINCT sensitive values —
# here the customer's nation — and flags groups below l.

L_DIVERSITY = 3


@query(
    "q_l_diversity",
    oracle=f"""
    WITH g AS (
        SELECT c_mktsegment,
               CAST(floor(c_acctbal / {ACCTBAL_BAND}) AS BIGINT)
                 * {ACCTBAL_BAND} AS acctbal_band,
               c_nationkey
        FROM customer
    ),
    stats AS (
        SELECT c_mktsegment, acctbal_band,
               CAST(COUNT(*) AS BIGINT) AS group_size,
               CAST(COUNT(DISTINCT c_nationkey) AS BIGINT)
                 AS n_distinct_sensitive
        FROM g GROUP BY c_mktsegment, acctbal_band
        HAVING COUNT(*) >= {K_ANON}
    )
    SELECT c_mktsegment, acctbal_band, group_size, n_distinct_sensitive,
           CAST(n_distinct_sensitive < {L_DIVERSITY} AS INT)
             AS l_violation
    FROM stats
    ORDER BY c_mktsegment, acctbal_band
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of the k-anonymized release: for every
    quasi-identifier group q_k_anonymize would publish (same
    generalization: market segment x {ACCTBAL_BAND}-balance band,
    size >= k={K_ANON}), the number of DISTINCT sensitive values
    (nation) and a flag for groups below l={L_DIVERSITY} — the
    homogeneity-attack check k-anonymity alone misses.

    Scale: one groupBy over the generalized keys with a distinct
    aggregate — the same shuffle as the release itself."""
    c = read_table(spark, sf_dir, "customer")
    g = c.select(
        "c_mktsegment",
        (
            F.floor(F.col("c_acctbal") / ACCTBAL_BAND).cast("bigint")
            * ACCTBAL_BAND
        ).alias("acctbal_band"),
        "c_nationkey",
    )
    return (
        g.groupBy("c_mktsegment", "acctbal_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_size"),
            F.countDistinct("c_nationkey")
            .cast("bigint")
            .alias("n_distinct_sensitive"),
        )
        .where(F.col("group_size") >= K_ANON)
        .select(
            "c_mktsegment",
            "acctbal_band",
            "group_size",
            "n_distinct_sensitive",
            (F.col("n_distinct_sensitive") < L_DIVERSITY)
            .cast("int")
            .alias("l_violation"),
        )
        .orderBy("c_mktsegment", "acctbal_band")
    )


_fmt(
    q_l_diversity,
    K_ANON=K_ANON,
    ACCTBAL_BAND=ACCTBAL_BAND,
    L_DIVERSITY=L_DIVERSITY,
)


# ---------------------------------------------------------------------------
# differentially-private counts with error audit (round 12)
# ---------------------------------------------------------------------------
# k-anonymity and l-diversity (above) police the MICRODATA release;
# the aggregate-release counterpart is the Laplace mechanism: publish
# count + Lap(sensitivity/epsilon) noise. Production DP draws fresh
# randomness per release; an oracle-gated engine can't, so the noise
# here is SEEDED — the uniform draw comes from the portable md5 of
# (group, salt), pushed through the exact inverse-CDF of the Laplace
# distribution. That makes the mechanism a pure deterministic function
# both engines replay bit-identically (documented divergence from
# production DP: swap the hash for a CSPRNG draw per release and
# nothing else changes). The report keeps the TRUE count beside the
# noisy one — this is the calibration AUDIT an analyst runs to pick
# epsilon, not the release itself.

DP_EPS = 0.5  #: epsilon; Laplace scale b = sensitivity/eps = 2.0
DP_SALT = "dp-release-v1"
_DP_DENOM = 9007199254740992  # 2^53: u = (h % 2^53) / 2^53 is exact


@query(
    "q_dp_counts",
    oracle=f"""
    WITH counts AS (
        SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    ),
    noise AS (
        SELECT event_type, n,
               (({sql_portable_hash60(f"event_type || '#{DP_SALT}'")}
                 % {_DP_DENOM}) * 1.0 / {_DP_DENOM}) - 0.5 AS t
        FROM counts
    ),
    lap AS (
        SELECT event_type, n,
               -(1.0 / {DP_EPS}) * (CASE WHEN t < 0 THEN -1.0 ELSE 1.0 END)
                 * ln(1 - 2 * abs(t)) AS noise
        FROM noise
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS true_count,
           round(n + noise, 6) AS dp_count,
           round(abs(noise), 6) AS abs_noise,
           round(abs(noise) / n, 6) AS rel_error,
           {DP_EPS} AS epsilon
    FROM lap ORDER BY event_type
    """,
)
def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism counts per event type at epsilon = {DP_EPS}
    (sensitivity 1 for a per-user-bounded count), with the true count,
    absolute noise, and relative error beside each release — the
    epsilon-calibration audit. The noise is the exact Laplace
    inverse-CDF applied to a SEEDED uniform (portable md5 of
    group + salt, over 2^53 so the division is exact), making the
    whole mechanism a deterministic expression both engines replay
    bit-identically; production swaps the hash for a fresh CSPRNG
    draw per release and nothing else changes.

    Scale: one map-side-combined grouped count; the mechanism is a
    per-group scalar expression. Relative error shrinks as 1/n — the
    audit shows exactly which small groups epsilon = {DP_EPS} would
    destroy."""
    ev = read_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    from dynamodb_streaming_datalake_spark.functions.texthash import (
        portable_hash60,
    )

    u = (
        portable_hash60(
            F.concat(F.col("event_type"), F.lit(f"#{DP_SALT}"))
        )
        % _DP_DENOM
    ) * F.lit(1.0) / F.lit(float(_DP_DENOM))
    t = u - 0.5
    noise = (
        F.lit(-1.0 / DP_EPS)
        * F.when(t < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.log(1 - 2 * F.abs(t))
    )
    return (
        counts.select(
            "event_type",
            F.col("n").cast("bigint").alias("true_count"),
            F.round(F.col("n") + noise, 6).alias("dp_count"),
            F.round(F.abs(noise), 6).alias("abs_noise"),
            F.round(F.abs(noise) / F.col("n"), 6).alias("rel_error"),
            F.lit(DP_EPS).alias("epsilon"),
        )
        .orderBy("event_type")
    )


_fmt(q_dp_counts, DP_EPS=DP_EPS)


# ---------------------------------------------------------------------------
# DP quantile: the exponential mechanism (round 13)
# ---------------------------------------------------------------------------
# q_dp_counts releases COUNTS with Laplace noise; quantiles cannot be
# released that way (a median has unbounded sensitivity to one row's
# value). The standard answer is McSherry-Talwar's EXPONENTIAL
# MECHANISM over a discretized public domain: each candidate bin is
# weighted exp(eps * u / 2) by how close its cumulative count sits to
# the target rank (sensitivity-1 utility), and one candidate is drawn
# by a seeded uniform — so the release never touches an individual
# value, only noisy-argmax over counts. The domain grid ([0, 640) in
# 32 x 20-wide bins) is PUBLIC metadata, declared ahead of time, never
# derived from the data (deriving it would leak the true min/max).

#: epsilon for the quantile release
DPQ_EPS = 1.0
#: public domain grid: 32 bins of width 20 over [0, 640)
DPQ_BINS = 32
DPQ_WIDTH = 20
DPQ_SALT = "dpq-release-v1"


@query(
    "q_dp_quantile",
    oracle=f"""
    WITH binned AS (
        SELECT event_type,
               CAST(least(floor(value / {DPQ_WIDTH}), {DPQ_BINS - 1})
                    AS INT) AS bin
        FROM events
    ),
    spine AS (
        SELECT t.event_type, b.bin
        FROM (SELECT DISTINCT event_type FROM events) t,
             (SELECT unnest(generate_series(0, {DPQ_BINS - 1})) AS bin) b
    ),
    h AS (
        SELECT s.event_type, s.bin,
               COALESCE(c.cnt, 0) AS cnt
        FROM spine s LEFT JOIN (
            SELECT event_type, bin, COUNT(*) AS cnt
            FROM binned GROUP BY event_type, bin
        ) c ON c.event_type = s.event_type AND c.bin = s.bin
    ),
    cum AS (
        SELECT event_type, bin, cnt,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cb,
               SUM(cnt) OVER (PARTITION BY event_type) AS n
        FROM h
    ),
    util AS (
        SELECT event_type, bin, cb, n,
               -abs(cb - n / 2.0) AS u,
               MAX(-abs(cb - n / 2.0)) OVER (PARTITION BY event_type)
                 AS umax
        FROM cum
    ),
    wts AS (
        SELECT event_type, bin, cb, n,
               SUM(exp({DPQ_EPS} * (u - umax) / 2.0))
                 OVER (PARTITION BY event_type ORDER BY bin
                       ROWS UNBOUNDED PRECEDING) AS cumw
        FROM util
    ),
    seeded AS (
        SELECT event_type, bin, cb, n, cumw,
               MAX(cumw) OVER (PARTITION BY event_type) AS totw,
               (({sql_portable_hash60(f"event_type || '#{DPQ_SALT}'")}
                 % {_DP_DENOM}) * 1.0 / {_DP_DENOM}) AS u01
        FROM wts
    ),
    chosen AS (
        SELECT event_type,
               MIN(CASE WHEN cumw >= u01 * totw THEN bin END) AS bin
        FROM seeded GROUP BY event_type
    )
    SELECT c.event_type,
           CAST(MAX(s.n) AS BIGINT) AS n_events,
           CAST(c.bin * {DPQ_WIDTH} + {DPQ_WIDTH} / 2.0 AS DOUBLE)
             AS dp_median,
           round(abs(MAX(s.cb) - MAX(s.n) / 2.0), 6) AS rank_error,
           {DPQ_EPS} AS epsilon
    FROM chosen c JOIN seeded s
      ON s.event_type = c.event_type AND s.bin = c.bin
    GROUP BY c.event_type, c.bin
    """,
)
def q_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private median of value per event type via the
    EXPONENTIAL MECHANISM at epsilon = {DPQ_EPS}: candidate bins from
    a PUBLIC {DPQ_BINS}x{DPQ_WIDTH}-wide grid are weighted
    exp(eps*u/2) by the sensitivity-1 rank utility
    u = -|cum_count - n/2|, and one bin is drawn by a seeded uniform
    (portable md5 over 2^53, the q_dp_counts convention — production
    swaps in a CSPRNG draw and nothing else changes). Weights
    stabilize by the per-group max utility before exponentiation, and
    every double fold is a BIN-ORDERED running sum, so both engines
    draw the identical release. rank_error audits how far the released
    bin's cumulative count sits from the true median rank — the
    epsilon-calibration readout.

    Scale: one map-side-combined (group, bin) count, a {DPQ_BINS}-row
    spine per group, and window math over |groups| x {DPQ_BINS} rows —
    the mechanism never touches row-level values after the histogram,
    which is also why it parallelizes trivially at 100 TB."""
    from pyspark.sql import Window

    from dynamodb_streaming_datalake_spark.functions.texthash import (
        portable_hash60,
    )

    ev = read_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.least(
            F.floor(F.col("value") / DPQ_WIDTH), F.lit(DPQ_BINS - 1)
        ).cast("int").alias("bin"),
    )
    cnts = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(DPQ_BINS).select(F.col("id").cast("int").alias("bin"))
        )
    )
    h = spine.join(cnts, ["event_type", "bin"], "left").select(
        "event_type", "bin", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = h.select(
        "event_type",
        "bin",
        F.sum("cnt").over(wcum).alias("cb"),
        F.sum("cnt").over(wall).alias("n"),
    )
    u = -F.abs(F.col("cb") - F.col("n") / 2.0)
    util = cum.select(
        "event_type", "bin", "cb", "n",
        u.alias("u"),
        F.max(u).over(wall).alias("umax"),
    )
    wts = util.select(
        "event_type", "bin", "cb", "n",
        F.sum(
            F.exp(F.lit(DPQ_EPS) * (F.col("u") - F.col("umax")) / 2.0)
        ).over(wcum).alias("cumw"),
    )
    u01 = (
        portable_hash60(F.concat("event_type", F.lit(f"#{DPQ_SALT}")))
        % _DP_DENOM
    ) * 1.0 / _DP_DENOM
    seeded = wts.select(
        "event_type", "bin", "cb", "n", "cumw",
        F.max("cumw").over(wall).alias("totw"),
        u01.alias("u01"),
    )
    chosen = seeded.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cumw") >= F.col("u01") * F.col("totw"), F.col("bin"))
        ).alias("bin")
    )
    return (
        chosen.join(seeded, ["event_type", "bin"])
        .groupBy("event_type", "bin")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            (F.col("bin") * DPQ_WIDTH + DPQ_WIDTH / 2.0)
            .cast("double")
            .alias("dp_median"),
            F.round(F.abs(F.max("cb") - F.max("n") / 2.0), 6).alias(
                "rank_error"
            ),
            F.lit(DPQ_EPS).alias("epsilon"),
        )
        .drop("bin")
    )


_fmt(
    q_dp_quantile,
    DPQ_EPS=DPQ_EPS,
    DPQ_BINS=DPQ_BINS,
    DPQ_WIDTH=DPQ_WIDTH,
)


# ---------------------------------------------------------------------------
# t-closeness audit (round 15) — the third leg of the release triad
# ---------------------------------------------------------------------------
# l-diversity's known gap: a group can carry l distinct sensitive
# values yet still leak when its DISTRIBUTION differs sharply from the
# table's (skewness attack: "3 distinct illnesses, but 95% cancer").
# t-closeness bounds, per released group, the Earth Mover's Distance
# between the group's sensitive distribution and the global one. For
# an ORDERED sensitive attribute the EMD has the closed form
# sum_i |cum(q)_i - cum(p)_i| / (m - 1), computed here in EXACT
# integer arithmetic: the cumulative-share difference at value i is
# (N_glob * cumc_class_i - N_class * cumc_glob_i) over
# (N_class * N_glob), so both engines sum bigints and divide once.

#: maximum allowed EMD for a released group
T_CLOSE = 0.2


@query(
    "q_t_closeness",
    oracle=f"""
    WITH g AS (
        SELECT c_mktsegment,
               CAST(floor(c_acctbal / {ACCTBAL_BAND}) AS BIGINT)
                 * {ACCTBAL_BAND} AS acctbal_band,
               c_nationkey
        FROM customer
    ),
    gdist AS (
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS cg,
               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS ng
        FROM g GROUP BY c_nationkey
    ),
    gc AS (
        SELECT gdist.*,
               CAST(SUM(cg) OVER (ORDER BY c_nationkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumg,
               CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM gdist
    ),
    cls AS (
        SELECT c_mktsegment, acctbal_band,
               CAST(COUNT(*) AS BIGINT) AS nc
        FROM g GROUP BY c_mktsegment, acctbal_band
        HAVING COUNT(*) >= {K_ANON}
    ),
    cell AS (
        SELECT c.c_mktsegment, c.acctbal_band, c.nc,
               gc.c_nationkey, gc.cumg, gc.ng, gc.m,
               CAST(COALESCE(cnt.cc, 0) AS BIGINT) AS cc
        FROM cls c CROSS JOIN gc
        LEFT JOIN (
            SELECT c_mktsegment, acctbal_band, c_nationkey,
                   CAST(COUNT(*) AS BIGINT) AS cc
            FROM g GROUP BY 1, 2, 3
        ) cnt USING (c_mktsegment, acctbal_band, c_nationkey)
    ),
    cum AS (
        SELECT cell.*,
               CAST(SUM(cc) OVER (PARTITION BY c_mktsegment, acctbal_band
                   ORDER BY c_nationkey ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS cumc
        FROM cell
    )
    SELECT c_mktsegment, acctbal_band,
           MAX(nc) AS group_size,
           round(CAST(SUM(ABS(ng * cumc - nc * cumg)) AS DOUBLE)
                 / (MAX(nc) * MAX(ng) * (MAX(m) - 1)), 6) AS emd,
           CAST(CAST(SUM(ABS(ng * cumc - nc * cumg)) AS DOUBLE)
                / (MAX(nc) * MAX(ng) * (MAX(m) - 1)) > {T_CLOSE}
                AS INT) AS t_violation
    FROM cum GROUP BY c_mktsegment, acctbal_band
    """,
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit of the k-anonymized release — the skewness-
    attack check l-diversity misses: per released quasi-identifier
    group (same generalization and k={K_ANON} floor as q_k_anonymize),
    the ordered-EMD between the group's sensitive distribution
    (nation, treated as ordinal) and the global one, flagged when it
    exceeds t={T_CLOSE}. The EMD is computed in EXACT integer
    arithmetic — cumulative-count cross products, one double division
    at the end — so the audit is engine-exact by construction, not by
    float luck. (Bigint headroom: N_class * N_glob * m must stay
    below 2^63 — at lake scale run the audit per partition or rescale
    counts first.)

    Scale: one groupBy for the global histogram (|values| rows,
    broadcast), one for the per-group cells; the zero-filled grid is
    |released groups| x |values| and every cumulative window runs
    inside one group's partition."""
    c = read_table(spark, sf_dir, "customer")
    g = c.select(
        "c_mktsegment",
        (
            F.floor(F.col("c_acctbal") / ACCTBAL_BAND).cast("bigint")
            * ACCTBAL_BAND
        ).alias("acctbal_band"),
        "c_nationkey",
    )
    glob = g.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("cg")
    )
    wall = Window.partitionBy()
    wg = Window.orderBy("c_nationkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gc = (
        glob.withColumn("ng", F.sum("cg").over(wall).cast("long"))
        .withColumn("cumg", F.sum("cg").over(wg).cast("long"))
        .withColumn("m", F.count(F.lit(1)).over(wall).cast("long"))
    )
    cls = (
        g.groupBy("c_mktsegment", "acctbal_band")
        .agg(F.count(F.lit(1)).cast("long").alias("nc"))
        .where(F.col("nc") >= K_ANON)
    )
    cnt = g.groupBy("c_mktsegment", "acctbal_band", "c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("cc")
    )
    cell = (
        cls.crossJoin(F.broadcast(gc))
        .join(cnt, ["c_mktsegment", "acctbal_band", "c_nationkey"], "left")
        .withColumn("cc", F.coalesce(F.col("cc"), F.lit(0)).cast("long"))
    )
    wc = (
        Window.partitionBy("c_mktsegment", "acctbal_band")
        .orderBy("c_nationkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cell.withColumn("cumc", F.sum("cc").over(wc).cast("long"))
    num = F.sum(
        F.abs(F.col("ng") * F.col("cumc") - F.col("nc") * F.col("cumg"))
    )
    den = F.max("nc") * F.max("ng") * (F.max("m") - 1)
    emd = num.cast("double") / den
    return cum.groupBy("c_mktsegment", "acctbal_band").agg(
        F.max("nc").alias("group_size"),
        F.round(emd, 6).alias("emd"),
        (emd > T_CLOSE).cast("int").alias("t_violation"),
    )


_fmt(q_t_closeness, K_ANON=K_ANON, T_CLOSE=T_CLOSE)
