"""Property fuzzing for the round-6 binary codecs: GIF LZW, Avro OCF,
and the JPEG entropy layer. No Spark needed — these hammer the pure
parsers the mapInPandas kernels ride on."""

from __future__ import annotations

import os
import tempfile

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.binary(min_size=0, max_size=5000))
@settings(max_examples=120, deadline=None)
def test_gif_lzw_roundtrips_arbitrary_bytes(data):
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _gif_lzw_compress,
        _gif_lzw_decompress,
    )

    if not data:
        return
    assert _gif_lzw_decompress(_gif_lzw_compress(data), len(data)) == data


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(max_size=40),
            st.integers(min_value=-(2**62), max_value=2**62),
        ),
        max_size=200,
    )
)
@settings(max_examples=60, deadline=None)
def test_avro_ocf_roundtrips_arbitrary_records(recs):
    from dynamodb_streaming_datalake_spark.sources.formats import (
        _AVRO_SCHEMA,
        parse_avro_ocf,
        write_avro_ocf,
    )

    with tempfile.TemporaryDirectory() as t:
        p = os.path.join(t, "f.avro")
        write_avro_ocf(p, _AVRO_SCHEMA, recs)
        _, out = parse_avro_ocf(open(p, "rb").read())
    assert out == recs


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_avro_zigzag_is_involutive(n):
    from dynamodb_streaming_datalake_spark.sources.formats import (
        _avro_read_long,
        _avro_zigzag,
    )

    v, pos = _avro_read_long(_avro_zigzag(n), 0)
    assert v == n


@given(
    st.integers(min_value=2, max_value=6),
    st.integers(min_value=2, max_value=6),
    st.integers(min_value=0, max_value=2**32),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_roundtrip_is_bounded_on_random_images(bw, bh, seed):
    """Any multiple-of-8 image encodes to a decodable baseline JPEG
    whose reconstruction stays within the quant-table error envelope."""
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        encode_jpeg_gray,
        parse_jpeg_gray,
    )

    rng = np.random.RandomState(seed % (2**31))
    img = rng.randint(0, 256, (8 * bh, 8 * bw)).astype(np.uint8)
    w, h, out = parse_jpeg_gray(encode_jpeg_gray(img))
    assert (w, h) == (img.shape[1], img.shape[0])
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 160 and err.mean() <= 40.0


@given(
    st.integers(1, 32),
    st.integers(1, 20),
    st.integers(0, 2**32 - 1),
    st.floats(0.0, 1.0),
)
@settings(max_examples=40, deadline=None)
def test_webp_lossless_roundtrips_arbitrary_images(w, h, seed, dup_p):
    """VP8L is lossless: arbitrary RGB images — including constant
    channels (simple/0-bit codes), full-range channels (normal codes),
    and randomly duplicated rows (LZ77 backrefs) — must decode to the
    exact input."""
    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        encode_webp_rgb,
        parse_webp,
    )

    rng = np.random.default_rng(seed)
    nvals = int(rng.integers(1, 257))
    img = [
        rng.integers(0, nvals, size=(h, w)).astype(np.int64)
        for _ in range(3)
    ]
    for j in range(1, h):
        if rng.random() < dup_p:
            for ch in img:
                ch[j] = ch[j - 1]
    got_w, got_h, px = parse_webp(encode_webp_rgb(*img))
    assert (got_w, got_h) == (w, h)
    for c in range(3):
        assert np.array_equal(px[:, :, c], img[c].astype(np.uint8))
    assert (px[:, :, 3] == 255).all()


@given(st.binary(min_size=1, max_size=6000))
@settings(max_examples=120, deadline=None)
def test_tiff_lzw_roundtrips_arbitrary_bytes(data):
    """TIFF-LZW (MSB-first, early-change widths) must roundtrip any
    byte string — hypothesis shrinks to minimal counterexamples around
    the 510/1022/2046 width boundaries and the 4094 table reset."""
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _tiff_lzw_compress,
        _tiff_lzw_decompress,
    )

    assert _tiff_lzw_decompress(_tiff_lzw_compress(data), len(data)) == data


@given(
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=1, max_value=5),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_progressive_jpeg_equals_baseline_on_arbitrary_images(bw, bh, seed):
    """The strongest progressive pin: SOF2 (all four Annex-G coding
    modes, incl. AC successive approximation) decodes PIXEL-IDENTICAL
    to the baseline encoding of the same image, for arbitrary images —
    every EOBRUN split, correction bit, and ZRL fold is on this path."""
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
        parse_jpeg_gray,
    )

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (8 * bh, 8 * bw)).astype(np.uint8)
    _, _, base = parse_jpeg_gray(encode_jpeg_gray(img))
    _, _, prog = parse_jpeg_gray(encode_jpeg_gray_progressive(img))
    assert np.array_equal(base, prog)


@given(st.binary(min_size=1, max_size=2000))
@settings(max_examples=80, deadline=None)
def test_g711_both_laws_match_audioop_on_arbitrary_codes(data):
    """µ-law and A-law expansion equals the stdlib audioop reference on
    arbitrary code streams (the all-256 exhaustive test pins the
    tables; this pins the vectorized path on arbitrary lengths)."""
    import pytest as _pytest

    audioop = _pytest.importorskip("audioop")
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        alaw_expand,
        ulaw_expand,
    )

    codes = np.frombuffer(data, np.uint8)
    assert np.array_equal(
        ulaw_expand(codes),
        np.frombuffer(audioop.ulaw2lin(data, 2), "<i2").astype(np.int64),
    )
    assert np.array_equal(
        alaw_expand(codes),
        np.frombuffer(audioop.alaw2lin(data, 2), "<i2").astype(np.int64),
    )


@given(
    st.lists(
        st.integers(min_value=-(2**12), max_value=2**12),
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=2, max_value=14),
)
@settings(max_examples=100, deadline=None)
def test_flac_rice_layer_roundtrips_arbitrary_residuals(res, k):
    """The Golomb-Rice entropy layer roundtrips arbitrary signed
    residuals at any parameter k — zigzag, unary quotients and k-bit
    remainders all on the shrink path."""
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _FlacBitReader,
        _FlacBitWriter,
        _rice_read,
        _rice_write,
    )

    bw = _FlacBitWriter()
    _rice_write(bw, res, k)
    bw.align()
    got = _rice_read(_FlacBitReader(bytes(bw.out)), len(res), k)
    assert got == res
