"""Completeness audits: distributed gap scan, interval coalescing, and
the shard monitor's streaming partial-fold drain."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.completeness import (
    IV_HOLD_S,
    SEQ_BUCKET,
    q_interval_coalesce,
    q_seq_gaps,
    q_seq_monitor,
    seq_monitor_finalize,
    seq_monitor_partials,
)
from dynamodb_streaming_datalake_spark.registry import ORACLE
from dynamodb_streaming_datalake_spark.sources.readers import (
    read_table,
    read_table_stream,
)
from tests.oracle_utils import compare_query


@pytest.mark.parametrize(
    "name,fn",
    [
        ("q_seq_gaps", q_seq_gaps),
        ("q_interval_coalesce", q_interval_coalesce),
        ("q_seq_monitor", q_seq_monitor),
    ],
)
def test_oracle_parity_smoke(spark, sf_smoke, name, fn):
    compare_query(spark, sf_smoke, name, fn, ORACLE[name])


def test_seq_gaps_equal_naive_global_sort(spark, sf_smoke):
    """The bucketed two-level plan must emit exactly the gaps a naive
    global lead() finds — including gaps that CROSS bucket boundaries
    and gaps spanning entirely empty buckets."""
    keys = (
        read_table(spark, sf_smoke, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("k"))
    )
    rows = sorted(r["k"] for r in keys.collect())
    naive = [
        (a + 1, b - 1, b - a - 1)
        for a, b in zip(rows, rows[1:])
        if b > a + 1
    ]
    naive.sort(key=lambda g: (-g[2], g[0]))
    got = [
        (r["gap_start"], r["gap_end"], r["gap_len"])
        for r in q_seq_gaps(spark, sf_smoke).collect()
    ]
    got.sort(key=lambda g: (-g[2], g[0]))
    assert got == naive[: len(got)]
    # the fixture must actually exercise a cross-bucket gap or the
    # stitch path is dead code
    assert any(
        a // SEQ_BUCKET != b // SEQ_BUCKET for a, b, _ in naive
    ), "fixture has no bucket-crossing gap"


def test_interval_coalesce_invariants(spark, sf_smoke):
    """Per user: covered time is positive, at most span+hold, at least
    the longest island; island count never exceeds event count."""
    res = {
        r["user_id"]: r for r in q_interval_coalesce(spark, sf_smoke).collect()
    }
    ev = (
        read_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
        )
        .collect()
    )
    for r in ev:
        out = res[r["user_id"]]
        span = (r["hi"] - r["lo"]).total_seconds() + IV_HOLD_S
        assert 0 < out["covered_seconds"] <= span + 1
        assert out["max_island_seconds"] <= out["covered_seconds"]
        assert 1 <= out["n_islands"] <= r["n"]
        # every island is at least one hold long
        assert out["max_island_seconds"] >= IV_HOLD_S


def test_seq_monitor_streaming_partial_fold(spark, sf_smoke):
    """Drain the SAME partial kernel from a real readStream via
    foreachBatch, merge the partials by summing c on (shard, seq),
    finalize — must equal the batch q_seq_monitor rows exactly."""
    acc: list = []

    def fold(batch_df, _bid):
        acc.append(seq_monitor_partials(batch_df).collect())

    stream = read_table_stream(spark, sf_smoke, "events")
    with tempfile.TemporaryDirectory() as ckpt:
        (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    merged: dict = {}
    for rows in acc:
        for r in rows:
            merged[(r["shard"], r["seq"])] = (
                merged.get((r["shard"], r["seq"]), 0) + r["c"]
            )
    part = spark.createDataFrame(
        [(s, q, c) for (s, q), c in merged.items()],
        "shard long, seq long, c long",
    )
    got = {
        r["shard"]: r for r in seq_monitor_finalize(part).collect()
    }
    want = {r["shard"]: r for r in q_seq_monitor(spark, sf_smoke).collect()}
    assert got.keys() == want.keys()
    for s in want:
        assert got[s].asDict() == want[s].asDict()


def test_debounce_matches_python_replay(spark, sf_smoke):
    """Replay the per-key debounce in Python over the collected
    events; counts must agree and emitted + suppressed == total."""
    from dynamodb_streaming_datalake_spark.operators.completeness import (
        DEBOUNCE_S,
        q_debounce,
    )

    got = {
        (r["user_id"], r["event_type"]): r
        for r in q_debounce(spark, sf_smoke).collect()
    }
    ev = (
        read_table(spark, sf_smoke, "events")
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_timestamp("ts").cast("long").alias("s"),
        )
        .collect()
    )
    series: dict = {}
    for r in ev:
        series.setdefault((r["user_id"], r["event_type"]), []).append(
            (r["s"], r["event_id"])
        )
    for key, rows in series.items():
        rows.sort()
        emitted = 0
        prev = None
        for s, _ in rows:
            if prev is None or s - prev >= DEBOUNCE_S:
                emitted += 1
            prev = s
        g = got[key]
        assert g["n_events"] == len(rows)
        assert g["n_emitted"] == emitted
        assert g["n_emitted"] + g["n_suppressed"] == g["n_events"]
