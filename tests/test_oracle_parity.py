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
