"""Hypothesis property tests (SURVEY §5.4): arbitrary CDC histories —
including the edge shapes a seeded generator rarely hits (same-timestamp
ties, REMOVE-then-reINSERT chains, all-REMOVE keys, empty payloads) —
must reconstruct to exactly the Python fold of the same history."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.cdc import cdc_transform
from dynamodb_streaming_datalake_spark.operators.state import reconstruct_table
from dynamodb_streaming_datalake_spark.sources.cdc_fixture import (
    BASE_TS,
    CdcEvent,
    CdcFixture,
)

ATTRS = ("id", "name", "Designation")


def _event(key_i: int, op: str, desig: str, ts_slot: int, seq: int) -> CdcEvent:
    keys = {"id": {"S": str(1000 + key_i)}, "name": {"S": f"k{key_i}"}}
    img = {**keys, "Designation": {"S": desig}}
    return CdcEvent(
        # zero-padded so lexicographic eventID order == numeric seq order
        # (the engine tie-breaks equal timestamps on eventID)
        event_id=f"h-{seq:03d}",
        event_name=op,
        # coarse slots force same-timestamp ties; seq breaks them,
        # mirroring the engine's (event_time, eventID) ordering
        approx_ts=BASE_TS + ts_slot,
        keys=keys,
        new_image=None if op == "REMOVE" else img,
        old_image=img if op == "REMOVE" else None,
        seq=seq,
    )


ops = st.sampled_from(["INSERT", "MODIFY", "REMOVE"])
histories = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # key
        ops,
        st.sampled_from(["a", "b", "c"]),  # payload
        st.integers(min_value=0, max_value=3),  # timestamp slot (ties!)
    ),
    min_size=1,
    max_size=25,
)


@given(histories)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_reconstruction_equals_fold(spark, history):
    fx = CdcFixture(
        events=[
            _event(k, op, d, slot, seq)
            for seq, (k, op, d, slot) in enumerate(history)
        ]
    )
    raw = spark.createDataFrame([(line,) for line in fx.json_lines()], "json string")
    ok, _ = cdc_transform(
        raw,
        attributes=ATTRS,
        ingestion_ts=F.timestamp_seconds(
            F.col("env.dynamodb.ApproximateCreationDateTime")
        ),
    )
    engine = (
        reconstruct_table(ok, keys=["id", "name"], order_by=["event_time", "eventID"])
        .select(*ATTRS)
        .toPandas()
        .sort_values(["id", "name"])
        .reset_index(drop=True)
    )
    oracle_rows = [
        {a: attrs.get(a) for a in ATTRS} for attrs in fx.fold_state().values()
    ]
    oracle = (
        pd.DataFrame(oracle_rows, columns=list(ATTRS))
        .sort_values(["id", "name"])
        .reset_index(drop=True)
        .astype(object)
    )
    pd.testing.assert_frame_equal(engine.astype(object), oracle)
