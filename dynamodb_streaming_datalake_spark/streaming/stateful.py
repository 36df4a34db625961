"""Stateful streaming (SURVEY §2 B19).

* ``streaming_dedup`` — watermarked ``dropDuplicates``: the
  exactly-once-per-key emission the reference Lambda cannot provide
  (Firehose is at-least-once; the reference relies on downstream
  "dedupe in the Lake", ``firehose_transformation.py:16``).
* ``streaming_latest_state`` — a custom stateful operator via
  ``applyInPandasWithState``: maintains the newest version per key
  across micro-batches and emits it on every update — i.e. the
  latest-state dedup of ``operators.state`` as *continuously
  maintained* state instead of a lake-wide recomputation.

Scale: state is partitioned by key across executors; the state store
holds one row per live key (bounded by table cardinality, not stream
volume). Watermarks bound the dedup buffer for `streaming_dedup`.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    df: DataFrame,
    id_cols: Sequence[str],
    event_time_col: str | None = None,
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """At-least-once -> effectively-once: drop replayed records by id.

    With an event-time watermark the dedup buffer is garbage-collected;
    without one, state grows with distinct ids (fine for bounded
    replays, not for unbounded streams).
    """
    if event_time_col is not None:
        df = df.withColumn(event_time_col, F.col(event_time_col).cast("timestamp"))
        df = df.withWatermark(event_time_col, watermark_delay)
        return df.dropDuplicates([*id_cols, event_time_col])
    return df.dropDuplicates(list(id_cols))


#: output/state schemas for streaming_latest_state over the CDC fixture
#: (event_id makes the emission stream totally ordered per key, so a
#: batch consumer can reconstruct the final state unambiguously)
LATEST_STATE_OUTPUT = (
    "id string, name string, Event string, event_time_us long, "
    "event_id string, payload string"
)
LATEST_STATE_STATE = "event_time_us long, event_id string, event string, payload string"


def _latest_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Keep (max event_time, eventID) per key; emit on change.

    The per-batch scan is vectorized: one C-side lexicographic
    sort_values over (event_time_us, eventID) and a tail(1), then a
    single tuple compare against stored state — no Python-per-row work
    on hot keys (eventIDs are zero-padded, so the string sort agrees
    with the tuple compare)."""
    if state.exists:
        best_us, best_id, best_event, best_payload = state.get
    else:
        best_us, best_id, best_event, best_payload = -1, "", "", ""
    changed = False
    for pdf in pdfs:
        if pdf.empty:
            continue
        top = pdf.sort_values(["event_time_us", "eventID"]).iloc[-1]
        us, eid = int(top.event_time_us), top.eventID
        if (us, eid) > (best_us, best_id):
            best_us, best_id = us, eid
            best_event, best_payload = top.Event, top.payload
            changed = True
    state.update((best_us, best_id, best_event, best_payload))
    if changed:
        yield pd.DataFrame(
            {
                "id": [key[0]],
                "name": [key[1]],
                "Event": [best_event],
                "event_time_us": [best_us],
                "event_id": [best_id],
                "payload": [best_payload],
            }
        )


def streaming_latest_state(ok_rows: DataFrame, payload_cols: Sequence[str]) -> DataFrame:
    """Continuously-maintained B6: newest version per (id, name).

    Input: the ok-side of ``cdc_transform`` (projected attributes mode).
    Output (update mode): one row per key whose state changed in the
    micro-batch, payload packed as a JSON string column.
    """
    prepared = ok_rows.select(
        "id",
        "name",
        "Event",
        "eventID",
        F.unix_micros(F.col("event_time").cast("timestamp")).alias("event_time_us"),
        F.to_json(F.struct(*[F.col(c) for c in payload_cols])).alias("payload"),
    )
    return prepared.groupBy("id", "name").applyInPandasWithState(
        _latest_state_fn,
        outputStructType=LATEST_STATE_OUTPUT,
        stateStructType=LATEST_STATE_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
