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


# ---------------------------------------------------------------------------
# real-codec round trips (round 5): arbitrary payloads, not just fixtures
# ---------------------------------------------------------------------------


@given(
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    channels=st.integers(1, 2),
    samples=st.lists(st.integers(-32768, 32767), min_size=2, max_size=400),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_arbitrary_pcm(rate, channels, samples):
    """Any 16-bit PCM payload written through the stdlib wave module
    must parse back sample-exact through our RIFF chunk walker."""
    import io
    import wave

    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import parse_wav

    n_frames = len(samples) // channels
    data = np.array(samples[: n_frames * channels], dtype="<i2")
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(data.tobytes())
    w.close()
    got_rate, got_ch, got = parse_wav(buf.getvalue())
    assert got_rate == rate and got_ch == channels
    assert np.array_equal(got.ravel(), data)


@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31),
    comment=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_ppm_roundtrip_arbitrary_pixels(w, h, seed, comment):
    """Any RGB payload under any legal header spelling (with/without
    comment lines) parses back byte-exact."""
    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import parse_ppm

    rng = np.random.RandomState(seed % (2**31))
    payload = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8)
    header = b"P6\n" + (b"# c\n" if comment else b"") + f"{w} {h}\n255\n".encode()
    got_w, got_h, img = parse_ppm(header + payload.tobytes())
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(img.ravel(), payload)


@given(
    w=st.integers(1, 32),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31),
    split=st.integers(0, 64),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_arbitrary_pixels_and_filters(w, h, seed, split):
    """Any RGB payload under any per-row filter assignment and any
    IDAT split point parses back byte-exact — the five reconstruction
    predictors and multi-IDAT concatenation under adversarial input."""
    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _png_pack,
        parse_png,
    )

    rng = np.random.RandomState(seed % (2**31))
    payload = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8)
    filters = [int(f) for f in rng.randint(0, 5, size=h)]
    blob = _png_pack(w, h, payload, filters, idat_split=split or None)
    got_w, got_h, img = parse_png(blob)
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(img.ravel(), payload)


def test_containment_flags_planted_subset(spark):
    """Plant a short doc whose text is a verbatim slice of a long doc:
    containment(sub -> super) must flag it (near 1.0) while symmetric
    Jaccard stays low — and the pair must NOT appear oriented the
    other way at the demo threshold."""
    from dynamodb_streaming_datalake_spark.operators.dedup import (
        q_dedup_containment,
    )
    import os
    import tempfile

    words = [f"w{i}" for i in range(400)]
    long_text = " ".join(words)
    sub_text = " ".join(words[50:90])  # 10% slice -> jaccard ~0.1
    other = " ".join(f"z{i}" for i in range(300))
    df = spark.createDataFrame(
        [
            (1, long_text, "en", "crawl", len(long_text)),
            (2, sub_text, "en", "crawl", len(sub_text)),
            (3, other, "en", "crawl", len(other)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        rows = {
            (r["doc_sub"], r["doc_super"]): r
            for r in q_dedup_containment(spark, d).collect()
        }
    assert (2, 1) in rows
    assert rows[(2, 1)]["containment"] > 0.9
    assert rows[(2, 1)]["jaccard"] < 0.2
    assert (1, 2) not in rows
