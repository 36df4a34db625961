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

    The per-batch scan is a direct (event_time_us, eventID) tuple max
    over the group's column arrays (eventIDs are zero-padded, so the
    string compare agrees with the tuple compare). Groups are a few
    rows each, so avoiding the per-call pandas sort/frame machinery is
    what keeps the per-key Python cost flat."""
    if state.exists:
        best_us, best_id, best_event, best_payload = state.get
    else:
        best_us, best_id, best_event, best_payload = -1, "", "", ""
    changed = False
    for pdf in pdfs:
        if pdf.empty:
            continue
        # groups here are 1-3 rows: a pandas sort_values + iloc costs
        # ~350 us per call (0.9 s across the fixture's 2649 keys,
        # measured) where a plain max over the column arrays costs
        # ~30 us — same (event_time_us, eventID) lexicographic pick,
        # int-then-string tuple compare unchanged (round 18, guide §4.2:
        # the per-key Python call IS the hot loop of this operator).
        us_a = pdf["event_time_us"].to_numpy()
        eid_a = pdf["eventID"].to_numpy()
        j = 0
        top_key = (int(us_a[0]), eid_a[0])
        for i in range(1, len(us_a)):
            k = (int(us_a[i]), eid_a[i])
            if k > top_key:
                top_key, j = k, i
        us, eid = top_key
        if (us, eid) > (best_us, best_id):
            best_us, best_id = us, eid
            best_event = pdf["Event"].iat[j]
            best_payload = pdf["payload"].iat[j]
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


# ---------------------------------------------------------------------------
# custom stateful gap sessionizer (round 11)
# ---------------------------------------------------------------------------
# The third real applyInPandasWithState operator (after latest-state
# and the zone dedup): gap-based sessions maintained as per-user state
# across micro-batches. Unlike the built-in session_window (which
# aggregates inside the window), this carries an OPEN session — id,
# bounds, counts, exact scale-6 value sum — in the state store and
# emits a session only when a gap closes it, which is what lets the
# emitted stream hash-match batch q_sessionize exactly: nothing is
# ever emitted twice or re-opened. Delivery contract: per-user
# time-ordered arrival (the q_watermark_sweep delivery model);
# rows with event_id < 0 are flush sentinels — they close whatever is
# open but never join a session (the stream-stream outer join's
# book-closing idiom).

SESSION_OUTPUT = (
    "user_id long, session_no long, n_events long, start_us long, "
    "end_us long, duration_us long, sum_value double"
)
SESSION_STATE = (
    "session_no long, start_us long, last_us long, n_events long, "
    "sum_fp long"
)

_SESSION_GAP_US = 1800 * 1_000_000


def _value_fp(series: pd.Series) -> list[int]:
    """Scale-6 integer mantissas matching Spark's CAST(double AS
    DECIMAL(18,6)) — HALF_UP on the shortest decimal repr."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-6)
    return [
        int(Decimal(repr(float(v))).quantize(q, ROUND_HALF_UP).scaleb(6))
        for v in series
    ]


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Walk the user's (time-ordered) rows, merge the leading run into
    the open session carried in state, emit every gap-closed session,
    and leave the trailing run open. Vectorized: one sort, one diff,
    one groupby over the batch.

    ALL Arrow chunks of the group are concatenated before the single
    sort + gap-walk: a group whose micro-batch rows span multiple
    chunks (maxRecordsPerBatch splits at 10k rows by default) must not
    be walked per-chunk — per-chunk walks split sessions at chunk
    boundaries and apply a flush sentinel before later-chunk rows,
    silently diverging from batch q_sessionize (round-11 ADVICE). The
    cross-MICRO-BATCH time-ordering contract is unchanged; within one
    micro-batch, chunking is now invisible."""
    if state.exists:
        sno, start, last, n, sfp = state.get
    else:
        sno, start, last, n, sfp = 0, -1, -1, 0, 0
    closed: list[tuple] = []
    chunks = [pdf for pdf in pdfs if not pdf.empty]
    pdf = (
        pd.concat(chunks, ignore_index=True)
        if len(chunks) > 1
        else (chunks[0] if chunks else None)
    )
    if pdf is not None:
        # column-array path (round 18): np.lexsort + boolean masks on
        # the raw arrays replace sort_values + frame filtering — the
        # pandas per-call frame rebuilds were ~40% of the drain's
        # addBatch (measured); ordering (ts_us, event_id) and sentinel
        # semantics are unchanged.
        import numpy as np

        ts_a = pdf["ts_us"].to_numpy()
        eid_a = pdf["event_id"].to_numpy()
        order = np.lexsort((eid_a, ts_a))
        ts_a, eid_a = ts_a[order], eid_a[order]
        val_a = pdf["value"].to_numpy()[order]
        sentinel = eid_a < 0
        saw_sentinel = bool(sentinel.any())
        if saw_sentinel:
            keep = ~sentinel
            ts_a, val_a = ts_a[keep], val_a[keep]
        if len(ts_a):
            ts = [int(t) for t in ts_a]
            fps = _value_fp(val_a)
            # group boundaries within the batch
            groups: list[list[int]] = [[0]]
            for i in range(1, len(ts)):
                if ts[i] - ts[i - 1] > _SESSION_GAP_US:
                    groups.append([])
                groups[-1].append(i)
            for gi, idxs in enumerate(groups):
                g_start, g_end = ts[idxs[0]], ts[idxs[-1]]
                g_n = len(idxs)
                g_fp = sum(fps[i] for i in idxs)
                if gi == 0 and n > 0 and g_start - last <= _SESSION_GAP_US:
                    # continues the open session from state
                    start, last = start, g_end
                    n, sfp = n + g_n, sfp + g_fp
                else:
                    if n > 0:  # close the previous open session
                        sno += 1
                        closed.append(
                            (key[0], sno, n, start, last, last - start, sfp)
                        )
                    start, last, n, sfp = g_start, g_end, g_n, g_fp
        if saw_sentinel and n > 0:
            sno += 1
            closed.append((key[0], sno, n, start, last, last - start, sfp))
            start, last, n, sfp = -1, -1, 0, 0
    state.update((sno, start, last, n, sfp))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_no": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
                "start_us": [c[3] for c in closed],
                "end_us": [c[4] for c in closed],
                "duration_us": [c[5] for c in closed],
                "sum_value": [c[6] / 1_000_000 for c in closed],
            }
        )


def streaming_sessionize(events: DataFrame) -> DataFrame:
    """Continuously-maintained gap sessionization over a raw events
    stream (ts, user_id, event_id, value). Emits each session exactly
    once, when a >30 min gap (or a flush sentinel) closes it; session
    numbering per user matches batch q_sessionize."""
    prepared = events.select(
        "user_id",
        "event_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# The fourth real applyInPandasWithState operator: per-key DEBOUNCE.
# State is one integer — the key's last seen second — and the emitted
# flag marks events that arrive after a >= DEBOUNCE_S quiet period
# (batch twin: operators.completeness.q_debounce). Same per-key
# time-ordered delivery contract as the sessionizer; chunking-safe by
# the same concat-before-walk rule.

DEBOUNCE_OUTPUT = (
    "user_id long, event_type string, event_id long, s long, "
    "emitted boolean"
)
DEBOUNCE_STATE = "last_s long"


def _debounce_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    from dynamodb_streaming_datalake_spark.operators.completeness import (
        DEBOUNCE_S,
    )

    last_s = state.get[0] if state.exists else None
    chunks = [pdf for pdf in pdfs if not pdf.empty]
    if not chunks:
        return
    pdf = (
        pd.concat(chunks, ignore_index=True)
        if len(chunks) > 1
        else chunks[0]
    )
    pdf = pdf.sort_values(["s", "event_id"])
    ss = pdf["s"].to_list()
    emitted = []
    prev = last_s
    for s in ss:
        emitted.append(prev is None or s - prev >= DEBOUNCE_S)
        prev = s
    state.update((int(prev),))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(ss),
            "event_type": [key[1]] * len(ss),
            "event_id": pdf["event_id"].to_list(),
            "s": ss,
            "emitted": emitted,
        }
    )


def streaming_debounce(events: DataFrame) -> DataFrame:
    """Continuously-maintained per-(user, type) debounce over a raw
    events stream: every event is emitted ANNOTATED with whether it
    cleared the quiet period, and the only state carried is the key's
    last seen second — O(|keys|) forever. Downstream keeps
    ``emitted`` rows and drops the flapping rest."""
    prepared = events.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_timestamp(F.col("ts").cast("timestamp"))
        .cast("long")
        .alias("s"),
    )
    return prepared.groupBy("user_id", "event_type").applyInPandasWithState(
        _debounce_fn,
        outputStructType=DEBOUNCE_OUTPUT,
        stateStructType=DEBOUNCE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
