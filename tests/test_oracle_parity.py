"""Every registered query vs its DuckDB oracle at sf0.001 (fast) —
the local twin of the driver's sf0.01 t2 gate."""

from __future__ import annotations

import pytest

from dynamodb_streaming_datalake_spark.registry import all_oracle_sql, all_queries
from tests.oracle_utils import compare_query

QUERIES = all_queries()
ORACLE = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, sf_smoke, name):
    if name not in ORACLE:
        # rows-only contract: just prove it runs and returns a schema
        df = QUERIES[name](spark, sf_smoke)
        assert df.columns
        df.limit(5).collect()
        return
    compare_query(spark, sf_smoke, name, QUERIES[name], ORACLE[name])


@pytest.mark.oracle_full
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity_sf001(spark, sf_oracle, name):
    """Same comparison at sf0.01 — the exact scale the driver gate runs.

    Opt-in (``pytest -m oracle_full``): slower, but catches float/tie-break
    divergences that only appear beyond the sf0.001 smoke fixture. Run this
    once before any registry freeze / snapshot.
    """
    if name not in ORACLE:
        df = QUERIES[name](spark, sf_oracle)
        assert df.columns
        df.limit(5).collect()
        return
    compare_query(spark, sf_oracle, name, QUERIES[name], ORACLE[name])


# ---------------------------------------------------------------------------
# degenerate / magnitude fixtures (round 16): parity at inputs the shipped
# sf dirs never reach — the ADVICE r15 divergences, pinned cross-engine
# ---------------------------------------------------------------------------
def _clone_sf_with_events(tmp_path, mutate_events):
    """Copy the sf0.001 tables into a temp sf dir, rewriting
    events.parquet through ``mutate_events(arrow_table)`` with pyarrow so
    the parquet TIMESTAMP(NANOS) physical type survives (a Spark
    round-trip would demote ts to BIGINT and break the DuckDB oracle's
    CAST(ts AS DATE))."""
    import shutil

    import pyarrow.parquet as pq

    from dynamodb_streaming_datalake_spark.sources.readers import TABLES

    dst = tmp_path / "sf_fixture"
    dst.mkdir()
    for t in TABLES:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", dst / f"{t}.parquet")
    tbl = pq.read_table(f"/root/testdata/sf0.001/events.parquet")
    pq.write_table(mutate_events(tbl), str(dst / "events.parquet"))
    return str(dst)


def test_pacf_parity_at_10x_bench_magnitude(spark, tmp_path):
    """ADVICE r15 (medium): at the 10x-bench value magnitude (a0 ~1e14)
    the old Spark casts (a_ decimal(25,12), b_/c_ (14,6)) silently
    NULLed every acf/pacf while the DuckDB oracle hard-errored. Scale
    events.value x3000 (a0 9e7 -> 8.1e14, S 5e4 -> 1.5e8 — both old
    caps breached, all widened caps hold) and demand full parity."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def scale(tbl):
        i = tbl.schema.get_field_index("value")
        v = pc.multiply(tbl.column("value"), pa.scalar(3000.0))
        return tbl.set_column(i, "value", v)

    d = _clone_sf_with_events(tmp_path, scale)
    compare_query(spark, d, "q_pacf", QUERIES["q_pacf"], ORACLE["q_pacf"])
    # and the result is non-degenerate: every lag has a non-null pacf
    rows = QUERIES["q_pacf"](spark, d).collect()
    assert len(rows) > 0 and all(r["pacf"] is not None for r in rows)


def test_hill_tail_parity_all_ties(spark, tmp_path):
    """ADVICE r15 (low): when the top HILL_K+1 values are all equal the
    term set is empty — threshold must still come from the thr frame
    (the oracle's scalar subquery), not max-over-empty-terms."""
    import pyarrow as pa

    def constant(tbl):
        i = tbl.schema.get_field_index("value")
        v = pa.array([5.0] * len(tbl), type=pa.float64())
        return tbl.set_column(i, "value", v)

    d = _clone_sf_with_events(tmp_path, constant)
    compare_query(
        spark, d, "q_hill_tail", QUERIES["q_hill_tail"], ORACLE["q_hill_tail"]
    )
    row = QUERIES["q_hill_tail"](spark, d).collect()[0]
    assert row["k_used"] == 0
    assert row["threshold"] is not None and float(row["threshold"]) == 5.0
    assert row["hill_alpha"] is None


def test_quantile_degenerate_bucket_bounded_and_exact(spark, tmp_path):
    """r14 verdict item 3 / r15 item 4: one unit bucket holding >90% of
    the rows. The shipped second histogram level must (a) keep the
    final row-numbered partition bounded — the sorted set is ONE
    2^-20-wide sub-bucket, never the whole bucket — and (b) still
    return the exact k-th smallest (full oracle parity on the
    fixture)."""
    import numpy as np
    import pyarrow as pa

    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        EXQ_SUBW,
    )

    rng = np.random.default_rng(7)
    n_hot, n_cold = 19000, 1000  # 95% of mass inside bucket [10, 11)
    hot = 10.0 + rng.random(n_hot)
    cold = rng.uniform(100.0, 200.0, n_cold)
    vals = np.concatenate([hot, cold])

    def degenerate(tbl):
        i = tbl.schema.get_field_index("value")
        reps = int(np.ceil(len(tbl) / len(vals)))
        v = np.tile(vals, reps)[: len(tbl)]
        return tbl.set_column(i, "value", pa.array(v, type=pa.float64()))

    d = _clone_sf_with_events(tmp_path, degenerate)
    # (b) exactness: full cross-engine parity on the skewed fixture
    compare_query(
        spark,
        d,
        "q_exact_quantile_twopass",
        QUERIES["q_exact_quantile_twopass"],
        ORACLE["q_exact_quantile_twopass"],
    )
    # (a) boundedness: the largest (bucket, sub-bucket) population — the
    # exact partition size pass 2 row-numbers — stays a tiny fraction of
    # the hot bucket even though that bucket holds >90% of all rows
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    e = read_table(spark, d, "events").where(F.col("value").isNotNull())
    sizes = (
        e.select(
            F.floor("value").cast("long").alias("b"),
            F.floor(
                (F.col("value") - F.floor("value").cast("long")) * EXQ_SUBW
            ).cast("long").alias("sb"),
        )
        .groupBy("b", "sb")
        .count()
    )
    hot_bucket = e.where(F.floor("value") == 10).count()
    max_part = sizes.agg(F.max("count")).collect()[0][0]
    assert hot_bucket > 0.9 * e.count()
    assert max_part <= max(4, hot_bucket // 1000), (max_part, hot_bucket)


def test_weighted_quantile_degenerate_band_bounded_and_exact(spark, tmp_path):
    """Weighted twin of the degenerate-bucket pin: >90% of lineitem's
    extended prices concentrated in ONE 1000-wide band. Parity must
    hold and the windowed partition must be one sub-band, not the hot
    band."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dynamodb_streaming_datalake_spark.operators.analytics_ext import (
        EXQ_SUBW,
    )
    from dynamodb_streaming_datalake_spark.sources.readers import TABLES

    dst = tmp_path / "sf_wq"
    dst.mkdir()
    for t in TABLES:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", dst / f"{t}.parquet")
    tbl = pq.read_table(f"/root/testdata/sf0.001/lineitem.parquet")
    rng = np.random.default_rng(11)
    n = len(tbl)
    prices = np.where(
        rng.random(n) < 0.95,
        5000.0 + 1000.0 * rng.random(n),  # hot band b=5
        rng.uniform(50_000.0, 90_000.0, n),
    )
    i = tbl.schema.get_field_index("l_extendedprice")
    tbl = tbl.set_column(i, "l_extendedprice", pa.array(prices, type=pa.float64()))
    pq.write_table(tbl, str(dst / "lineitem.parquet"))
    d = str(dst)

    compare_query(
        spark,
        d,
        "q_grouped_weighted_quantile",
        QUERIES["q_grouped_weighted_quantile"],
        ORACLE["q_grouped_weighted_quantile"],
    )
    from pyspark.sql import functions as F

    from dynamodb_streaming_datalake_spark.sources.readers import read_table

    l = read_table(spark, d, "lineitem").where(
        F.col("l_extendedprice").isNotNull()
    )
    v = l.select(
        F.col("l_returnflag").alias("g"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("b"),
        F.floor(
            (
                F.col("l_extendedprice") / 1000
                - F.floor(F.col("l_extendedprice") / 1000).cast("long")
            )
            * EXQ_SUBW
        ).cast("long").alias("sb"),
    )
    hot = v.where(F.col("b") == 5).count()
    assert hot > 0.9 * v.count()
    max_part = (
        v.groupBy("g", "b", "sb").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_part <= max(4, hot // 1000), (max_part, hot)
