"""Cross-engine property tests: the portable primitives every oracle
rests on (word shingles, the 60-bit md5 hash, fixed-shape cosine) must
agree bit-for-bit between Spark and DuckDB on ARBITRARY inputs — not
just the fixture corpus. If one of these drifts, every derived oracle
(jaccard, minhash, simhash, ANN) silently rests on sand."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.functions.texthash import (
    cosine,
    portable_hash60,
    sql_cosine,
    sql_portable_hash60,
    sql_word_shingles,
    word_shingles,
)

# words of printable ascii (no quotes — they'd need SQL escaping and the
# fixtures never contain them); texts are space-joined word sequences
words = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters="'\\\""),
    min_size=1,
    max_size=8,
)
texts = st.lists(words, min_size=0, max_size=12).map(" ".join)

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(st.lists(texts, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_word_shingles_match_duckdb(spark, batch):
    sdf = spark.createDataFrame([(t,) for t in batch], "text string")
    got = [r["sh"] for r in sdf.select(word_shingles("text").alias("sh")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT {sql_word_shingles('?::VARCHAR')}".replace("?::VARCHAR", "$1"),
            [t],
        ).fetchone()[0]
        for t in batch
    ]
    # ORDER differs by design: Spark array_distinct keeps first
    # occurrence, DuckDB list_distinct does not guarantee order. Every
    # consumer (MIN, counts, intersect/union) is order-insensitive, so
    # the portable contract is set equality.
    assert [sorted(g) for g in got] == [sorted(w) for w in want], (batch, got, want)


@given(st.lists(words, min_size=1, max_size=10))
@settings(**SETTINGS)
def test_portable_hash60_matches_duckdb(spark, batch):
    sdf = spark.createDataFrame([(w,) for w in batch], "w string")
    got = [r["h"] for r in sdf.select(portable_hash60(F.col("w")).alias("h")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {sql_portable_hash60('$1')}", [w]).fetchone()[0]
        for w in batch
    ]
    assert got == want


vectors = st.lists(
    st.floats(
        min_value=-100, max_value=100, allow_nan=False, allow_infinity=False, width=32
    ),
    min_size=4,
    max_size=4,
).filter(lambda v: sum(x * x for x in v) > 1e-6)


@given(vectors, vectors)
@settings(**SETTINGS)
def test_cosine_matches_duckdb_bitwise(spark, a, b):
    sdf = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    got = sdf.select(cosine(F.col("a"), F.col("b")).alias("c")).first()["c"]
    con = duckdb.connect()
    # route through float32 first — Spark stores array<float>
    want = con.execute(
        f"SELECT {sql_cosine('$1::FLOAT[]', '$2::FLOAT[]')}", [a, b]
    ).fetchone()[0]
    assert got == want  # bit-identical, not approx


@given(
    st.lists(
        st.integers(min_value=-10**12, max_value=10**12),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_holt_fold_matches_duckdb_on_arbitrary_series(spark, ys):
    """The round-11 integral-division fold (Holt level/trend) must
    agree bit-for-bit between engines on ARBITRARY integer series —
    including negatives, where the portable contract rests on both
    engines truncating toward zero. A drift here would silently skew
    q_holt_trend / q_grouped_forecast at some future data boundary."""
    sdf = spark.createDataFrame([(ys,)], "ys array<bigint>")
    got = sdf.select(
        F.expr(
            """
            aggregate(
                slice(transform(ys, y -> array(y, 0L)), 2, size(ys) - 1),
                transform(ys, y -> array(y, 0L))[0],
                (acc, x) -> array(
                    (x[0] + acc[0] + acc[1]) div 2,
                    (((x[0] + acc[0] + acc[1]) div 2) - acc[0]
                       + 3 * acc[1]) div 4
                )
            ) AS st
            """
        )
    ).first()["st"]
    con = duckdb.connect()
    want = con.execute(
        """
        SELECT list_reduce(
            list_prepend([$1[1], 0::BIGINT],
                         list_transform($1[2:], x -> [x, 0::BIGINT])),
            (acc, d) -> [
                (d[1] + acc[1] + acc[2]) // 2,
                (((d[1] + acc[1] + acc[2]) // 2) - acc[1] + 3 * acc[2])
                  // 4
            ])
        """,
        [ys],
    ).fetchone()[0]
    assert list(got) == list(want), (ys, got, want)


@given(
    st.lists(
        st.integers(min_value=1, max_value=700),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_nextfit_fold_matches_duckdb_on_arbitrary_lengths(spark, lens):
    """The q_pack_nextfit bin fold on arbitrary (clipped) lengths:
    bin count and final remainder bit-equal across engines."""
    C = 512
    clipped = sorted((min(x, C) for x in lens), reverse=True)
    sdf = spark.createDataFrame([(clipped,)], "ls array<bigint>")
    got = sdf.select(
        F.expr(
            f"""
            aggregate(
                slice(ls, 2, size(ls) - 1),
                array(1L, {C}L - ls[0]),
                (acc, x) -> if(x <= acc[1],
                               array(acc[0], acc[1] - x),
                               array(acc[0] + 1, {C}L - x))
            ) AS st
            """
        )
    ).first()["st"]
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT list_reduce(
            list_prepend([1::BIGINT, {C} - $1[1]],
                         list_transform($1[2:], x -> [x, 0::BIGINT])),
            (acc, d) -> CASE
                WHEN d[1] <= acc[2] THEN [acc[1], acc[2] - d[1]]
                ELSE [acc[1] + 1, {C} - d[1]]
            END)
        """,
        [clipped],
    ).fetchone()[0]
    assert list(got) == list(want), (clipped, got, want)
