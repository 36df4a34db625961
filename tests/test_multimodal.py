"""Multimodal operators: blob round-trip, resize, frame sampling,
feature extraction, codec stubs, and the driver-style oracle parity."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from dynamodb_streaming_datalake_spark.operators.multimodal import (
    IMG_MAGIC,
    decode_media,
    media_features,
    q_media_decode,
    q_media_frame_stats,
    resize_media,
    sample_frames,
    synthesize_media,
)
from dynamodb_streaming_datalake_spark.registry import ORACLE
from dynamodb_streaming_datalake_spark.sources.readers import read_table
from tests.oracle_utils import compare_query


def _docs(spark, sf_smoke, n=50):
    return read_table(spark, sf_smoke, "documents").select("doc_id").limit(n)


def test_synthesize_and_decode_roundtrip(spark, sf_smoke):
    imgs = synthesize_media(_docs(spark, sf_smoke), "doc_id", "image")
    row = imgs.orderBy("doc_id").first()
    i = row["doc_id"]
    blob = bytes(row["media"])
    assert blob[:4] == IMG_MAGIC
    w, h, c = struct.unpack(">HHB", blob[4:9])
    assert (w, h, c) == (16 + i % 48, 16 + (i // 7) % 48, 1 + i % 3)
    assert row["media_meta"]["format"] == "fake-image"
    assert row["media_meta"]["n_bytes"] == len(blob) == 9 + w * h * c

    dec = decode_media(imgs, "doc_id").orderBy("doc_id").first()
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, c)
    assert dec["mean_pixel"] == float(i % 256)
    assert dec["n_pixels"] == w * h * c


def test_resize_changes_dims_and_stays_decodable(spark, sf_smoke):
    imgs = synthesize_media(_docs(spark, sf_smoke, 20), "doc_id", "image")
    small = decode_media(resize_media(imgs, 8, 6), "doc_id")
    rows = small.collect()
    assert all(r["width"] == 8 and r["height"] == 6 for r in rows)
    # uniform payload -> mean survives resampling exactly
    assert all(r["mean_pixel"] == float(r["doc_id"] % 256) for r in rows)


def test_frame_sampling_counts_and_content(spark, sf_smoke):
    vids = synthesize_media(_docs(spark, sf_smoke, 30), "doc_id", "video")
    frames = sample_frames(vids, "doc_id", every_k=2)
    got = (
        frames.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.collect_set("frame_idx").alias("idx"))
        .collect()
    )
    for r in got:
        n_frames = 4 + r["doc_id"] % 13
        assert r["n"] == len(range(0, n_frames, 2))
        assert all(ix % 2 == 0 for ix in r["idx"])
    # sampled frames are themselves decodable images with per-frame means
    dec = decode_media(frames, "doc_id")
    joined = frames.select("doc_id", "frame_idx").orderBy("doc_id", "frame_idx")
    means = dec.orderBy("doc_id", "mean_pixel").collect()
    assert len(means) == joined.count()


def test_media_features_shape_and_norm(spark, sf_smoke):
    imgs = synthesize_media(_docs(spark, sf_smoke, 20), "doc_id", "image")
    feats = media_features(imgs, "doc_id", n_bins=8).collect()
    for r in feats:
        v = r["features"]
        assert len(v) == 8
        assert abs(sum(v) - 1.0) < 1e-5  # normalized histogram
        # uniform payload -> a single hot bin
        assert max(v) == pytest.approx(1.0)


def test_real_codecs_are_stubbed(spark, sf_smoke):
    imgs = synthesize_media(_docs(spark, sf_smoke, 5), "doc_id", "image")
    with pytest.raises(NotImplementedError, match="jpeg"):
        decode_media(imgs, "doc_id", fmt="jpeg")


def test_media_oracle_parity(spark, sf_oracle):
    compare_query(
        spark, sf_oracle, "q_media_decode", q_media_decode, ORACLE["q_media_decode"]
    )
    compare_query(
        spark,
        sf_oracle,
        "q_media_frame_stats",
        q_media_frame_stats,
        ORACLE["q_media_frame_stats"],
    )


def test_audio_decode_roundtrip(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        decode_audio,
    )

    aud = synthesize_media(_docs(spark, sf_smoke, 25), "doc_id", "audio")
    rows = decode_audio(aud, "doc_id").collect()
    for r in rows:
        i = r["doc_id"]
        assert r["sample_rate"] == 8000 + (i % 3) * 4000
        assert r["n_samples"] == 800 + i % 800
        assert r["duration_s"] == pytest.approx(r["n_samples"] / r["sample_rate"])
        # rms of the deterministic ramp, recomputed independently
        import numpy as np

        s = (i + np.arange(r["n_samples"])) % 256
        assert r["rms"] == pytest.approx(float(np.sqrt((s.astype(float) ** 2).mean())))
    with pytest.raises(NotImplementedError, match="mp3"):
        decode_audio(aud, "doc_id", fmt="mp3")


def test_media_pipeline_works_in_streaming(spark, sf_smoke):
    """mapInPandas media stages compose with Structured Streaming: the
    same synthesize -> decode pipeline over a documents stream
    (availableNow) equals its batch result — one code path, both
    execution modes, like the CDC transforms."""
    from dynamodb_streaming_datalake_spark.sources.readers import read_table_stream

    stream_docs = read_table_stream(spark, sf_smoke, "documents").select("doc_id")
    decoded = decode_media(synthesize_media(stream_docs, "doc_id", "image"), "doc_id")
    q = (
        decoded.writeStream.format("memory")
        .queryName("media_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("media_stream").collect()
    want = decode_media(
        synthesize_media(
            read_table(spark, sf_smoke, "documents").select("doc_id"), "doc_id", "image"
        ),
        "doc_id",
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


# ---------------------------------------------------------------------------
# REAL codecs (round 5): RIFF/WAV and PPM
# ---------------------------------------------------------------------------


def test_wav_encoder_is_spec_conformant_stdlib_cross_check():
    """Our encoder's bytes must open with the stdlib `wave` module (an
    independent RIFF implementation) and agree sample-for-sample with
    our own chunk-walking parser."""
    import io
    import wave

    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_wav,
        _wav_params,
        parse_wav,
    )

    for i in (0, 1, 17, 123456, 999_999_999):
        blob = _encode_wav(i)
        wf = wave.open(io.BytesIO(blob))
        rate, n = _wav_params(i)
        assert wf.getframerate() == rate
        assert wf.getnframes() == n
        assert wf.getnchannels() == 1
        assert wf.getsampwidth() == 2
        stdlib = np.frombuffer(wf.readframes(n), "<i2")
        r2, ch, ours = parse_wav(blob)
        assert r2 == rate and ch == 1
        assert np.array_equal(stdlib, ours)


def test_wav_parser_reads_stdlib_written_stereo_file():
    """The converse: a stdlib-wave-authored stereo file parses with OUR
    parser — proving it walks real chunks, not just our own layout."""
    import io
    import wave

    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import parse_wav

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(44100)
    data = np.arange(-300, 300, dtype="<i2")
    w.writeframes(data.tobytes())
    w.close()
    rate, ch, samples = parse_wav(buf.getvalue())
    assert rate == 44100 and ch == 2
    assert samples.shape == (300, 2)
    assert np.array_equal(samples.ravel(), data)


def test_wav_parser_rejects_compressed_and_garbage():
    import struct as st

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_wav,
        parse_wav,
    )

    with pytest.raises(ValueError, match="RIFF"):
        parse_wav(b"OggS" + b"\x00" * 40)
    blob = bytearray(_encode_wav(7))
    # audio_format field lives at offset 20 (RIFF 12 + 'fmt '+size 8)
    blob[20:22] = st.pack("<H", 85)  # MPEG layer 3
    with pytest.raises(NotImplementedError, match="compressed"):
        parse_wav(bytes(blob))


def test_g711_expansion_matches_stdlib_audioop():
    """Spec conformance for the G.711 codec: our µ-law and A-law
    expansions agree byte-for-byte with the stdlib audioop reference
    tables over ALL 256 code values, and the end-to-end WAV path
    (encode -> chunk walk -> expand) reproduces audioop on the real
    code stream."""
    import numpy as np

    audioop = pytest.importorskip("audioop")
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_wav_g711,
        _g711_code,
        _wav_params,
        alaw_expand,
        parse_wav_g711,
        ulaw_expand,
    )

    codes = np.arange(256, dtype=np.uint8)
    ref_u = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), "<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), "<i2")
    assert np.array_equal(ulaw_expand(codes), ref_u.astype(np.int64))
    assert np.array_equal(alaw_expand(codes), ref_a.astype(np.int64))

    for i in (0, 1, 17, 123456):  # even = µ-law, odd = A-law
        blob = _encode_wav_g711(i)
        rate0, n = _wav_params(i)
        rate, codec, samples = parse_wav_g711(blob)
        assert rate == rate0 and samples.size == n
        assert codec == ("ulaw" if i % 2 == 0 else "alaw")
        raw = _g711_code(i, np.arange(n, dtype=np.int64)).tobytes()
        fn = audioop.ulaw2lin if i % 2 == 0 else audioop.alaw2lin
        ref = np.frombuffer(fn(raw, 2), "<i2").astype(np.int64)
        assert np.array_equal(samples, ref)


def test_g711_parser_rejects_pcm_and_bad_layout():
    import struct as st

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_wav,
        _encode_wav_g711,
        parse_wav_g711,
    )

    with pytest.raises(NotImplementedError, match="not a G.711"):
        parse_wav_g711(_encode_wav(3))  # plain PCM rejected loudly
    blob = bytearray(_encode_wav_g711(2))
    blob[34:36] = st.pack("<H", 16)  # claim 16-bit G.711 (illegal)
    with pytest.raises(NotImplementedError, match="mono 8-bit"):
        parse_wav_g711(bytes(blob))


def test_ppm_header_grammar_comments_and_whitespace():
    from dynamodb_streaming_datalake_spark.operators.multimodal import parse_ppm

    odd = b"P6 # c1\n#c2\n  4\t2\n# last\n255\n" + bytes(range(24))
    w, h, img = parse_ppm(odd)
    assert (w, h) == (4, 2)
    assert img.ravel().tolist() == list(range(24))
    with pytest.raises(ValueError, match="P6"):
        parse_ppm(b"P5\n2 2\n255\n" + b"\x00" * 4)
    with pytest.raises(ValueError, match="truncated"):
        parse_ppm(b"P6\n4 2\n255\n" + b"\x00" * 5)


def test_q_media_wav_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.multimodal import q_media_wav

    compare_query(spark, sf_smoke, "q_media_wav", q_media_wav, ORACLE["q_media_wav"])


def test_q_media_ppm_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.multimodal import q_media_ppm

    compare_query(spark, sf_smoke, "q_media_ppm", q_media_ppm, ORACLE["q_media_ppm"])


def test_bmp_roundtrip_padding_and_row_order():
    """BMP encode/decode: 4-byte row padding exercised (widths not
    multiples of 4), bottom-up flip restored, top-down (negative
    height) variant also parses, compressed BMPs rejected."""
    import struct as st

    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _bmp_dims,
        _encode_bmp,
        parse_bmp,
    )

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _bmp_rle8_pixels,
    )

    for i in (0, 1, 2, 3, 7, 100, 12345):
        blob = _encode_bmp(i)
        w, h, grid = parse_bmp(blob)
        assert (w, h) == _bmp_dims(i)
        if i % 4 == 0:  # BI_RLE8 ids (round 7): 8-bpp palette decode
            assert np.array_equal(grid, _bmp_rle8_pixels(i, w, h))
            continue
        k = np.arange(grid.size, dtype=np.int64)
        assert np.array_equal(
            grid, ((i + k) % 256).astype(np.uint8).reshape(h, w * 3)
        )
    # top-down variant (negative height): same reading-order pixels
    blob = bytearray(_encode_bmp(7))
    w, h = _bmp_dims(7)
    stride = w * 3 + ((-(w * 3)) % 4)
    rows = [bytes(blob[54 + r * stride : 54 + (r + 1) * stride]) for r in range(h)]
    blob[22:26] = st.pack("<i", -h)
    blob[54:] = b"".join(reversed(rows))
    _w, _h, grid2 = parse_bmp(bytes(blob))
    k = np.arange(h * w * 3, dtype=np.int64)
    assert np.array_equal(
        grid2, ((7 + k) % 256).astype(np.uint8).reshape(h, w * 3)
    )
    # unknown compression code still rejected (RLE8 is now real)
    bad = bytearray(_encode_bmp(3))
    bad[30:34] = st.pack("<I", 5)
    with pytest.raises(NotImplementedError, match="compressed"):
        parse_bmp(bytes(bad))
    # BI_RLE8 guards: delta escape unsupported; overflow and missing
    # end-of-bitmap are loud
    rle = bytearray(_encode_bmp(4))  # 4 % 4 == 0 -> RLE8 file
    (data_at,) = st.unpack("<I", rle[10:14])
    rle[data_at : data_at + 2] = b"\x00\x02"  # delta escape first
    with pytest.raises(NotImplementedError, match="delta"):
        parse_bmp(bytes(rle))
    rle = bytearray(_encode_bmp(4))
    rle[data_at : data_at + 2] = b"\xff\x01"  # 255-run overflows width
    with pytest.raises(ValueError, match="overflow"):
        parse_bmp(bytes(rle))


def test_q_media_bmp_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.multimodal import q_media_bmp

    compare_query(spark, sf_smoke, "q_media_bmp", q_media_bmp, ORACLE["q_media_bmp"])


def test_png_rejects_corruption_and_unsupported():
    """CRC damage, bad signatures, unsupported color types, and
    invalid filter bytes all fail loudly — a real decoder's guards."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        PNG_SIG,
        _encode_png,
        _png_chunk,
        parse_png,
    )

    blob = bytearray(_encode_png(7))
    with pytest.raises(ValueError, match="not a PNG"):
        parse_png(b"IMNOTAPNG" + bytes(blob))
    # flip one payload byte inside the first IDAT -> CRC mismatch
    corrupted = bytearray(blob)
    idat_at = bytes(blob).index(b"IDAT")
    corrupted[idat_at + 4] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        parse_png(bytes(corrupted))
    # RGBA (color type 6) is honestly unsupported
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)
    rgba = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (2 * (2 * 4 + 1))))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="color_type=6"):
        parse_png(rgba)
    # filter byte 5 is out of spec
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    badf = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x05\x01\x02\x03"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filter type"):
        parse_png(badf)


def test_png_exercises_all_filters_and_multi_idat():
    """The deterministic encoder must actually cover the spec surface:
    every filter type 0-4 appears across a handful of ids, and the
    stream is split across two IDAT chunks."""
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_png,
        _png_dims,
    )

    seen = set()
    for i in range(10):
        _, h = _png_dims(i)
        seen |= {(i + r) % 5 for r in range(h)}
        assert _encode_png(i).count(b"IDAT") == 2
    assert seen == {0, 1, 2, 3, 4}


def test_q_media_png_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.multimodal import q_media_png

    compare_query(
        spark, sf_smoke, "q_media_png", q_media_png, ORACLE["q_media_png"]
    )


def test_mp4_roundtrip_versions_and_largesize():
    """ISO BMFF walker: version-0 and version-1 mvhd both parse, the
    u64-largesize mdat path is exercised (ids % 4 == 0), the free box
    is skipped, and a box overrunning its parent fails loudly."""
    import struct as st

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_mp4,
        _mp4_params,
        parse_mp4,
    )

    for i in (0, 1, 2, 3, 4, 7, 100, 12345):
        blob = _encode_mp4(i)
        brand, ts, dur, nt, handlers, mdat = parse_mp4(blob)
        ets, edur, ent, emdat = _mp4_params(i)
        assert (brand, ts, dur, nt, mdat) == ("isom", ets, edur, ent, emdat)
        expected = ",".join(
            ("vide", "soun", "text")[(i + t) % 3] for t in range(ent)
        )
        assert handlers == expected
    # ids 0 and 4 use largesize, 1 does not
    assert st.unpack(">I", _encode_mp4(4)[-_mp4_params(4)[3] - 16 : -_mp4_params(4)[3] - 12])[0] == 1
    # corrupt: inner box size overruns its parent
    blob = bytearray(_encode_mp4(2))
    moov_at = bytes(blob).index(b"moov") - 4
    blob[moov_at : moov_at + 4] = st.pack(">I", 16)  # shrink moov under mvhd
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4(bytes(blob))
    # missing ftyp/mvhd
    with pytest.raises(ValueError, match="missing ftyp"):
        parse_mp4(st.pack(">I4s", 8, b"free"))


def test_q_media_mp4_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.multimodal import q_media_mp4

    compare_query(
        spark, sf_smoke, "q_media_mp4", q_media_mp4, ORACLE["q_media_mp4"]
    )


def test_mp3_roundtrip_and_guards():
    """MPEG-1 Layer III walker: ID3v2 synchsafe skip, per-frame VBR
    lengths, and loud failures on lost sync / reserved indices /
    truncation / non-MPEG1 streams."""
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_mp3,
        _mp3_frame_fields,
        _mp3_frame_len,
        _mp3_params,
        _MP3_BITRATES,
        _MP3_RATES,
        parse_mp3,
    )

    for i in (0, 1, 2, 3, 7, 100, 12345):
        sr_idx, nf = _mp3_params(i)
        sr, n, br_sum, ab = parse_mp3(_encode_mp3(i))
        assert (sr, n) == (_MP3_RATES[sr_idx], nf)
        fields = [_mp3_frame_fields(i, f) for f in range(nf)]
        assert br_sum == sum(_MP3_BITRATES[b] for b, _ in fields)
        assert ab == sum(_mp3_frame_len(b, sr_idx, p) for b, p in fields)
    blob = bytearray(_encode_mp3(5))
    # find first frame (after the ID3 tag) and break its sync byte
    n_tag = (blob[6] << 21) | (blob[7] << 14) | (blob[8] << 7) | blob[9]
    first = 10 + n_tag
    blob[first] = 0x00
    with pytest.raises(ValueError, match="lost MP3 sync"):
        parse_mp3(bytes(blob))
    # reserved bitrate index 15
    blob = bytearray(_encode_mp3(5))
    blob[first + 2] = (15 << 4) | (blob[first + 2] & 0x0F)
    with pytest.raises(ValueError, match="reserved"):
        parse_mp3(bytes(blob))
    # MPEG-2 version bits rejected
    blob = bytearray(_encode_mp3(5))
    blob[first + 1] = 0xF3  # version bits 01 -> not MPEG-1
    with pytest.raises(NotImplementedError, match="MPEG-1"):
        parse_mp3(bytes(blob))
    # truncated final frame
    blob = _encode_mp3(5)
    with pytest.raises(ValueError, match="truncated MP3 frame"):
        parse_mp3(blob[:-3])


def test_q_media_mp3_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.multimodal import q_media_mp3

    compare_query(
        spark, sf_smoke, "q_media_mp3", q_media_mp3, ORACLE["q_media_mp3"]
    )


def test_jpeg_constant_tile_family_is_exact():
    """The oracle fixture's exactness claim, verified directly: for
    constant even-valued 8x8 tiles the quantize/dequantize/IDCT
    pipeline reproduces every pixel bit-for-bit."""
    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_jpeg,
        _jpeg_dims,
        parse_jpeg_gray,
    )

    for i in (0, 1, 2, 3, 7, 100, 12345):
        w, h = _jpeg_dims(i)
        _w, _h, img = parse_jpeg_gray(_encode_jpeg(i))
        assert (_w, _h) == (w, h)
        b = 0
        for by in range(0, h, 8):
            for bx in range(0, w, 8):
                v = 2 * ((i + b) % 128)
                assert (img[by : by + 8, bx : bx + 8] == v).all(), (i, b)
                b += 1


def test_jpeg_lossy_fidelity_on_arbitrary_images():
    """Real-codec behavior on general content: smooth gradients
    reconstruct tightly; uniform noise (DCT's worst case) stays within
    the error envelope a quality-50-class table implies."""
    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        encode_jpeg_gray,
        parse_jpeg_gray,
    )

    y, x = np.mgrid[0:32, 0:48]
    smooth = ((x * 3 + y * 2) % 256).astype(np.uint8)
    smooth = (
        128 + 80 * np.sin(x / 9.0) * np.cos(y / 7.0)
    ).astype(np.uint8)
    _, _, out = parse_jpeg_gray(encode_jpeg_gray(smooth))
    err = np.abs(out.astype(int) - smooth.astype(int))
    assert err.max() <= 20 and err.mean() <= 4.0

    rng = np.random.RandomState(7)
    noise = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    _, _, out = parse_jpeg_gray(encode_jpeg_gray(noise))
    err = np.abs(out.astype(int) - noise.astype(int))
    assert err.max() <= 128 and err.mean() <= 32.0


def test_jpeg_decoder_reads_tables_from_file_and_guards():
    """The decoder must take quant + Huffman tables from the file's own
    DQT/DHT (halving the DC quant entry visibly changes decoding), and
    reject unsupported SOFs, illegal progressive bands, truncated
    scans, and non-JPEG bytes."""
    import struct as st

    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_jpeg,
        parse_jpeg_gray,
    )

    blob = _encode_jpeg(3)
    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg_gray(b"notajpeg")
    # SOF0 -> SOF2: the scan is now parsed under progressive rules, and
    # a baseline-style full 0..63 interleaved scan is ILLEGAL there
    # (T.81: a progressive DC scan must have Se=0) — rejected loudly,
    # not mis-decoded (round 8: SOF2 itself became a real decode path)
    sof_at = blob.index(b"\xff\xc0")
    prog = blob[:sof_at] + b"\xff\xc2" + blob[sof_at + 2 :]
    with pytest.raises(ValueError, match="progressive band"):
        parse_jpeg_gray(prog)
    # lossless SOF3 stays an honest guard
    lossless = blob[:sof_at] + b"\xff\xc3" + blob[sof_at + 2 :]
    with pytest.raises(NotImplementedError, match="SOF0"):
        parse_jpeg_gray(lossless)
    # halving the DC quant entry (zigzag slot 0) rescales decoded DC:
    # tables genuinely come from the DHT/DQT bytes, not constants
    dqt_at = blob.index(b"\xff\xdb")
    q0_at = dqt_at + 5  # marker(2) len(2) pq/tq(1) -> first table byte
    assert blob[q0_at] == 16
    halved = blob[:q0_at] + bytes([8]) + blob[q0_at + 1 :]
    _, _, img_h = parse_jpeg_gray(halved)
    _, _, img = parse_jpeg_gray(blob)
    assert not np.array_equal(img_h, img)
    # truncated scan fails loudly
    with pytest.raises((ValueError, IndexError)):
        parse_jpeg_gray(blob[: len(blob) - 10])


def test_q_media_jpeg_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.multimodal import q_media_jpeg

    compare_query(
        spark, sf_smoke, "q_media_jpeg", q_media_jpeg, ORACLE["q_media_jpeg"]
    )


def test_gif_lzw_edge_cases():
    """LZW internals: KwKwK sequences, width growth at 512/1024/2048,
    table-full CLEAR reset, and framing guards."""
    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_gif,
        _gif_dims,
        _gif_lzw_compress,
        _gif_lzw_decompress,
        parse_gif,
    )

    # KwKwK: aaa... emits codes referencing the just-added entry
    for data in (b"a" * 100, b"abababab" * 50, bytes(range(256)) * 20):
        assert _gif_lzw_decompress(_gif_lzw_compress(data), len(data)) == data
    # random data long enough to overflow the 4096-entry table twice
    rng = np.random.RandomState(3)
    data = rng.randint(0, 256, 120_000).astype(np.uint8).tobytes()
    assert _gif_lzw_decompress(_gif_lzw_compress(data), len(data)) == data
    # wrong expected size fails loudly
    with pytest.raises(ValueError, match="underruns"):
        _gif_lzw_decompress(_gif_lzw_compress(b"xyz"), 5)
    # full-file guards
    blob = bytearray(_encode_gif(9))
    with pytest.raises(ValueError, match="not a GIF"):
        parse_gif(b"JIF87a" + bytes(blob[6:]))
    # interlaced variant decodes to the SAME image: rebuild the pixel
    # stream in 4-pass order and set the interlace flag (descriptor
    # sits after the 13-byte header+LSD and the 768-byte palette —
    # searching for 0x2C would hit palette intensity 44 first)
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _gif_dims,
        _gif_interlace_rows,
        _gif_lzw_compress,
    )

    i = 9
    w, h = _gif_dims(i)
    _w, _h, straight = parse_gif(bytes(_encode_gif(i)))
    desc_at = 13 + 768
    blob = bytearray(_encode_gif(i))
    assert blob[desc_at] == 0x2C
    blob[desc_at + 9] |= 0x40
    passes = straight[_gif_interlace_rows(h)].tobytes()
    lzw = _gif_lzw_compress(passes)
    sub = bytearray([8])
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        sub += bytes([len(chunk)]) + chunk
    sub += b"\x00"
    inter = bytes(blob[: desc_at + 10]) + bytes(sub) + b"\x3b"
    _w2, _h2, deinterlaced = parse_gif(inter)
    assert np.array_equal(deinterlaced, straight)


def test_gif_roundtrip_against_closed_form():
    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_gif,
        _gif_dims,
        parse_gif,
    )

    for i in (0, 1, 2, 3, 7, 100, 12345):
        w, h = _gif_dims(i)
        _w, _h, img = parse_gif(_encode_gif(i))
        assert (_w, _h) == (w, h)
        k = np.arange(w * h, dtype=np.int64)
        assert np.array_equal(
            img, ((i + 3 * k) % 256).astype(np.uint8).reshape(h, w)
        )


def test_q_media_gif_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.multimodal import q_media_gif

    compare_query(
        spark, sf_smoke, "q_media_gif", q_media_gif, ORACLE["q_media_gif"]
    )


def test_tiff_roundtrip_both_endians_and_guards():
    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_tiff,
        _tiff_dims,
        parse_tiff,
    )

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _tiff_pixels,
    )

    for i in (0, 1, 2, 3, 7, 100, 12345):
        w, h = _tiff_dims(i)
        _w, _h, img = parse_tiff(_encode_tiff(i))
        assert (_w, _h) == (w, h)
        assert np.array_equal(img, _tiff_pixels(i, w, h).reshape(h, w))
    assert _encode_tiff(0)[:2] == b"II" and _encode_tiff(1)[:2] == b"MM"
    # every third id is PackBits-compressed and must be SMALLER than
    # its uncompressed pixel payload (the run-friendly pattern); the
    # run-free ids stay uncompressed
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _tiff_packbits_compress,
        _tiff_packbits_decompress,
    )

    w, h = _tiff_dims(6)
    strip = _tiff_packbits_compress(_tiff_pixels(6, w, h).tobytes())
    assert len(strip) < w * h  # the runs-of-7 pattern actually packs
    # packbits round-trips arbitrary byte strings incl. run boundaries

    for data in (b"", b"a", b"ab", b"aaa", b"aab" * 100, bytes(range(256)),
                 b"x" * 400, b"ab" + b"c" * 130 + b"de"):
        z = _tiff_packbits_compress(data)
        assert _tiff_packbits_decompress(z, len(data)) == data
    with pytest.raises(ValueError, match="not a TIFF"):
        parse_tiff(b"XX" + _encode_tiff(2)[2:])
    # unsupported compression tag (6 = old-style JPEG) rejected
    # honestly (LZW, code 5, became a real decode path in round 8)
    import struct as st

    blob = bytearray(_encode_tiff(2))
    # find the compression entry (tag 259) in the little-endian IFD
    ifd_at = st.unpack("<I", blob[4:8])[0]
    n = st.unpack("<H", blob[ifd_at : ifd_at + 2])[0]
    for j in range(n):
        at = ifd_at + 2 + 12 * j
        if st.unpack("<H", blob[at : at + 2])[0] == 259:
            blob[at + 8 : at + 10] = st.pack("<H", 6)
    with pytest.raises(NotImplementedError, match="compressed"):
        parse_tiff(bytes(blob))


def test_q_media_tiff_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.multimodal import q_media_tiff

    compare_query(
        spark, sf_smoke, "q_media_tiff", q_media_tiff, ORACLE["q_media_tiff"]
    )


def test_webp_roundtrip_and_guards():
    """VP8L: fixture ids round-trip losslessly (odd rows decode through
    the LZ77 backref path by construction) and every unsupported
    variant fails loudly — bad container, lossy VP8, transforms, color
    cache, meta-prefix, 2D distance-map codes."""
    import struct

    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_webp,
        _webp_dims,
        _webp_pixels,
        parse_webp,
    )

    for i in (0, 7, 31, 12345):
        w, h, px = parse_webp(_encode_webp(i))
        assert (w, h) == _webp_dims(i)
        red, green, blue = _webp_pixels(i)
        assert np.array_equal(px[:, :, 0], red.astype(np.uint8))
        assert np.array_equal(px[:, :, 1], green.astype(np.uint8))
        assert np.array_equal(px[:, :, 2], blue.astype(np.uint8))
        assert (px[:, :, 3] == 255).all()

    with pytest.raises(ValueError, match="RIFF"):
        parse_webp(b"not a riff container at all....")
    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    )
    with pytest.raises(NotImplementedError, match="lossy"):
        parse_webp(lossy)

    blob = bytearray(_encode_webp(3))
    # bitstream starts after RIFF(12) + chunk header(8) + sig byte(1);
    # bits 0..31 are dims/alpha/version, bits 32/33/34 are the
    # transform / color-cache / meta-prefix flags -> byte 25, bits 0-2
    flag_byte = 12 + 8 + 1 + 4
    for bit, msg in ((0, "transform"), (1, "color cache"), (2, "meta-prefix")):
        bad = bytearray(blob)
        bad[flag_byte] |= 1 << bit
        with pytest.raises(NotImplementedError, match=msg):
            parse_webp(bytes(bad))


def test_webp_encoder_emits_real_backrefs():
    """The fixture's odd rows must be LZ77 copies, not re-encoded
    literals: an all-distinct-rows image of the same dims encodes
    strictly larger, and a fully-duplicated image strictly smaller."""
    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        encode_webp_rgb,
        parse_webp,
    )

    rng = np.random.default_rng(11)
    w, h = 23, 16
    base = [rng.integers(0, 256, size=(h, w)).astype(np.int64) for _ in range(3)]
    dup = [ch.copy() for ch in base]
    for j in range(1, h, 2):
        for ch in dup:
            ch[j] = ch[j - 1]
    n_distinct = len(encode_webp_rgb(*base))
    n_dup = len(encode_webp_rgb(*dup))
    assert n_dup < n_distinct
    # and the duplicated image still round-trips exactly
    _, _, px = parse_webp(encode_webp_rgb(*dup))
    assert np.array_equal(px[:, :, 0], dup[0].astype(np.uint8))


def test_q_media_webp_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        q_media_webp,
    )
    from dynamodb_streaming_datalake_spark.registry import ORACLE

    compare_query(
        spark, sf_smoke, "q_media_webp", q_media_webp,
        ORACLE["q_media_webp"],
    )


def test_mp4_sample_table_guards():
    """The per-sample expansion must fail loudly on inconsistent
    tables: an stco offset pointing outside every mdat, and an stts
    run count disagreeing with stsz."""
    import struct as st

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_mp4,
        parse_mp4_samples,
    )

    blob = bytearray(_encode_mp4(2))
    stco_at = bytes(blob).index(b"stco")
    # first chunk offset lives 8 bytes after the fourcc (version/flags
    # + entry count); point it past EOF
    blob[stco_at + 12 : stco_at + 16] = st.pack(">I", len(blob) + 100)
    with pytest.raises(ValueError, match="outside every mdat"):
        parse_mp4_samples(bytes(blob))

    blob = bytearray(_encode_mp4(2))
    stts_at = bytes(blob).index(b"stts")
    # inflate the first stts run count: dts list outgrows stsz
    (count,) = st.unpack(">I", blob[stts_at + 12 : stts_at + 16])
    blob[stts_at + 12 : stts_at + 16] = st.pack(">I", count + 5)
    with pytest.raises(ValueError, match="sample count mismatch"):
        parse_mp4_samples(bytes(blob))


def test_q_media_mp4_samples_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        q_media_mp4_samples,
    )

    compare_query(
        spark, sf_smoke, "q_media_mp4_samples", q_media_mp4_samples,
        ORACLE["q_media_mp4_samples"],
    )


def test_png_adam7_interlace_roundtrip():
    """Round 7: Adam7 support (the former stub). Every third fixture id
    is stored interlaced and must decode identically to the closed
    form; the seven passes cover each pixel exactly once for awkward
    dims; an invalid interlace method still fails loudly."""
    import struct as st
    import zlib

    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        PNG_SIG,
        _adam7_passes,
        _encode_png,
        _png_chunk,
        _png_pack,
        parse_png,
    )

    for w, h in ((1, 1), (3, 2), (8, 8), (9, 17)):
        seen = np.zeros((h, w), dtype=int)
        for x0, y0, dx, dy, pw, ph in _adam7_passes(w, h):
            seen[y0::dy, x0::dx] += 1
        assert (seen == 1).all(), (w, h)

    for i in (0, 3, 6, 12346 // 2 * 2):  # i % 3 == 0 -> interlaced
        w, h, grid = parse_png(_encode_png(i * 3))
        m = w * h * 3
        exp = ((i * 3 + np.arange(m)) % 256).astype(np.uint8)
        assert np.array_equal(grid, exp.reshape(h, w * 3))

    rng = np.random.default_rng(5)
    raw = rng.integers(0, 256, size=9 * 7 * 3).astype(np.uint8)
    blob = _png_pack(7, 9, raw, [4, 3, 2, 1, 0], interlaced=True)
    _, _, grid = parse_png(blob)
    assert np.array_equal(grid, raw.reshape(9, 21))

    ihdr = st.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 2)  # interlace=2
    bad = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
        + _png_chunk(b"IEND", b"")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="interlace"):
        parse_png(bad)


def test_mp3_sideinfo_bit_layout_and_guards():
    """Round 7: side info round-trips bit-exactly against the fixture
    formulas (mono 17-byte and stereo 32-byte layouts, both window-
    switching branches), and spec violations fail loudly (big_values
    > 288, reserved block_type 0)."""
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_mp3,
        _mp3_params,
        _mp3_sideinfo_fields,
        parse_mp3_sideinfo,
    )

    modes_seen, branches_seen = set(), set()
    for i in (0, 1, 2, 3, 7, 12345):
        frames = parse_mp3_sideinfo(_encode_mp3(i))
        assert len(frames) == _mp3_params(i)[1]
        for f, fr in enumerate(frames):
            want = _mp3_sideinfo_fields(i, f)
            modes_seen.add(fr["mode"])
            assert fr["main_data_begin"] == want["main_data_begin"]
            for g in range(2):
                for c in range(fr["nch"]):
                    got, exp = fr["granules"][g][c], want["granules"][g][c]
                    branches_seen.add(got["win_switch"])
                    for k in ("part2_3_length", "big_values",
                              "global_gain", "scalefac_compress"):
                        assert got[k] == exp[k]
    assert modes_seen == {0, 1, 2, 3}      # stereo + mono all on path
    assert branches_seen == {0, 1}         # both side-info branches

    # corrupt big_values beyond 288: first frame, mono/stereo agnostic
    blob = bytearray(_encode_mp3(3))
    tag_len = 10 + (blob[6] << 21 | blob[7] << 14 | blob[8] << 7 | blob[9])
    # big_values starts 9+priv+scfsi+12 bits into the side info; easier:
    # set the whole first side-info region to 0xFF -> big_values = 511
    for off in range(tag_len + 4, tag_len + 4 + 17):
        blob[off] = 0xFF
    with pytest.raises(ValueError, match="big_values"):
        parse_mp3_sideinfo(bytes(blob))


def test_wav_adpcm_decode_and_guards():
    """Round 7: IMA ADPCM (the 'compressed WAV' stub). The decoded
    stats match an independent Python replay of the spec recurrence;
    every nibble value 0-15 is on the path; PCM files are dispatched
    away loudly; corrupt seeds and misaligned data fail."""
    import struct as st

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _ADPCM_NIBBLES,
        _adpcm_block_seed,
        _adpcm_params,
        _adpcm_step,
        _encode_wav,
        _encode_wav_adpcm,
        parse_wav_adpcm,
    )

    for i in (0, 1, 5, 12345):
        sr, n, s, mn, mx = parse_wav_adpcm(_encode_wav_adpcm(i))
        esr, nb = _adpcm_params(i)
        assert sr == esr and n == nb * (_ADPCM_NIBBLES + 1)
        en = es = 0
        emn, emx = 32767, -32768
        for b in range(nb):
            pred, idx = _adpcm_block_seed(i, b)
            en, es = en + 1, es + pred
            emn, emx = min(emn, pred), max(emx, pred)
            for j in range(_ADPCM_NIBBLES):
                pred, idx = _adpcm_step(pred, idx, (i + b + j) % 16)
                en, es = en + 1, es + pred
                emn, emx = min(emn, pred), max(emx, pred)
        assert (n, s, mn, mx) == (en, es, emn, emx)

    # a 16-bit PCM file must be dispatched away, not mis-decoded
    with pytest.raises(NotImplementedError, match="0x1"):
        parse_wav_adpcm(_encode_wav(3))
    # corrupt block seed index (>88)
    blob = bytearray(_encode_wav_adpcm(2))
    data_at = bytes(blob).index(b"data") + 8
    blob[data_at + 2] = 120
    with pytest.raises(ValueError, match="index out of range"):
        parse_wav_adpcm(bytes(blob))
    # truncate one byte off the data chunk -> misaligned
    blob = bytearray(_encode_wav_adpcm(2))
    (dlen,) = st.unpack("<I", blob[data_at - 4 : data_at])
    blob[data_at - 4 : data_at] = st.pack("<I", dlen - 1)
    del blob[-1]
    with pytest.raises(ValueError, match="block-aligned"):
        parse_wav_adpcm(bytes(blob))


def test_q_media_wav_adpcm_oracle_parity(spark, sf_smoke):
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        q_media_wav_adpcm,
    )

    compare_query(
        spark, sf_smoke, "q_media_wav_adpcm", q_media_wav_adpcm,
        ORACLE["q_media_wav_adpcm"],
    )


def test_wav_adpcm_vectorized_kernel_matches_reference(spark, sf_smoke):
    """The block-vectorized batch kernel in decode_wav_adpcm must agree
    row-for-row with the scalar reference decoder."""
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_wav_adpcm,
        decode_wav_adpcm,
        parse_wav_adpcm,
    )

    d = _docs(spark, sf_smoke, 40)
    wav = synthesize_media(d, "doc_id", "wav_adpcm")
    got = {
        r["doc_id"]: (
            r["sample_rate"], r["n_samples"], r["sum_samples"],
            r["min_sample"], r["max_sample"],
        )
        for r in decode_wav_adpcm(wav, "doc_id").collect()
    }
    for i in got:
        assert got[i] == parse_wav_adpcm(_encode_wav_adpcm(i))


def test_tiff_lzw_matches_hand_traced_bitstream():
    """TIFF-LZW spec conformance on a hand-traced example: compressing
    7 7 7 8 8 7 must emit exactly the code sequence Clear, 7, 258(=77),
    8, 8, 7, EOI, MSB-first at 9 bits — packed here by an independent
    3-line packer, so a bit-order or code-assignment bug cannot hide
    behind a self-consistent encoder/decoder pair."""
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _tiff_lzw_compress,
        _tiff_lzw_decompress,
    )

    data = bytes([7, 7, 7, 8, 8, 7])
    codes = [256, 7, 258, 8, 8, 7, 257]
    acc = n = 0
    ref = bytearray()
    for c in codes:
        acc = (acc << 9) | c
        n += 9
        while n >= 8:
            ref.append((acc >> (n - 8)) & 0xFF)
            n -= 8
    if n:
        ref.append((acc << (8 - n)) & 0xFF)
    assert _tiff_lzw_compress(data) == bytes(ref)
    assert _tiff_lzw_decompress(bytes(ref), len(data)) == data


def test_tiff_lzw_roundtrip_through_width_growth_and_reset():
    """Deterministic pseudo-random streams long enough to cross the
    510/1022/2046 early-change boundaries and the 4094 table reset
    roundtrip exactly; fixture-sized LZW docs really do emit >9-bit
    codes (the width logic is on the hash path, not dead code)."""
    import random

    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_tiff,
        _tiff_dims,
        _tiff_lzw_compress,
        _tiff_lzw_decompress,
        _tiff_pixels,
        parse_tiff,
    )

    rng = random.Random(42)
    for n in (1, 600, 20000):
        d = bytes(rng.randrange(256) for _ in range(n))
        assert _tiff_lzw_decompress(_tiff_lzw_compress(d), n) == d

    def max_code_width(stream: bytes) -> int:
        # independent walk of the emitted widths (same early-change
        # rule the TIFF spec mandates for readers)
        acc = nbits = pos = 0
        width, seen, table_n = 9, 9, 258
        while True:
            while nbits < width:
                acc = (acc << 8) | stream[pos]
                pos += 1
                nbits += 8
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 257:
                return seen
            if code == 256:
                width, table_n = 9, 258
                continue
            table_n += 1
            if table_n == (1 << width) - 1 and width < 12:
                width += 1
                seen = max(seen, width)

    # the largest LZW fixture ids pack >500 near-incompressible pixels
    wide = [
        i for i in range(1, 600, 3)
        if _tiff_dims(i)[0] * _tiff_dims(i)[1] > 520
    ]
    assert wide, "fixture dims never exceed 520 pixels?"
    i = wide[0]
    w, h = _tiff_dims(i)
    comp = _tiff_lzw_compress(_tiff_pixels(i, w, h).tobytes())
    assert max_code_width(comp) >= 10
    # and the full container path agrees byte-for-byte
    _, _, px = parse_tiff(_encode_tiff(i))
    assert np.array_equal(px.ravel(), _tiff_pixels(i, w, h))


def test_progressive_jpeg_equals_baseline_decode():
    """SOF2 and SOF0 encode the SAME quantized coefficients, so a
    correct progressive decoder (spectral selection + EOBRUN + DC
    successive approximation) must reconstruct pixel-identical output
    to the baseline file — on arbitrary images, where the AC bands are
    dense and EOBRUNs span blocks."""
    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
        parse_jpeg_gray,
    )

    rng = np.random.RandomState(7)
    for _ in range(4):
        h, w = 8 * rng.randint(1, 6), 8 * rng.randint(1, 6)
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        _, _, base = parse_jpeg_gray(encode_jpeg_gray(img))
        _, _, prog = parse_jpeg_gray(encode_jpeg_gray_progressive(img))
        assert np.array_equal(base, prog)
    # smooth gradient: long zero runs exercise ZRL-in-band + EOBn>0
    grad = np.tile(np.arange(64, dtype=np.uint8).repeat(2), (16, 1))
    _, _, base = parse_jpeg_gray(encode_jpeg_gray(grad))
    _, _, prog = parse_jpeg_gray(encode_jpeg_gray_progressive(grad))
    assert np.array_equal(base, prog)


def test_progressive_jpeg_scan_structure_and_guards():
    """The SOF2 file really contains the declared scan script
    (DC first + DC refine + per-band AC first and AC refine), and an
    inconsistent SA ladder (Ah != Al + 1) is rejected loudly."""
    import struct as st

    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _JPEG_PROG_SCANS,
        encode_jpeg_gray_progressive,
        parse_jpeg_gray,
    )

    img = np.full((16, 16), 100, dtype=np.uint8)
    blob = encode_jpeg_gray_progressive(img)
    assert blob[2:4] != b"\xff\xc0"
    # walk the markers, collecting each SOS header's (Ss, Se, Ah, Al)
    scans = []
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            pos += 1  # entropy data — skip to next marker candidate
            continue
        marker = blob[pos + 1]
        if marker == 0xD9:
            break
        if marker in (0x00, 0xFF):
            pos += 1
            continue
        (seglen,) = st.unpack(">H", blob[pos + 2 : pos + 4])
        if marker == 0xDA:
            p = blob[pos + 4 : pos + 2 + seglen]
            scans.append((p[3], p[4], p[5] >> 4, p[5] & 0x0F))
        pos += 2 + seglen
    assert tuple(scans) == _JPEG_PROG_SCANS

    # flip an AC first-pass header (Ah=0, Al=1) to claim a refinement
    # with a broken SA ladder (Ah=2, Al=1 requires a prior Ah=0 pass at
    # Al=2... our ladder is 1->0) — the decoder must refuse an
    # inconsistent Ah != Al + 1 rather than mis-decode
    mut = bytearray(blob)
    pos = 2
    while pos + 4 <= len(mut):
        if mut[pos] == 0xFF and mut[pos + 1] == 0xDA:
            (seglen,) = st.unpack(">H", mut[pos + 2 : pos + 4])
            if mut[pos + 4 + 3] > 0:  # an AC scan (Ss > 0)
                mut[pos + 4 + 5] = 0x31  # Ah=3, Al=1: not Al + 1
                break
            pos += 2 + seglen
        else:
            pos += 1
    with pytest.raises(ValueError, match="Ah == Al"):
        parse_jpeg_gray(bytes(mut))


def test_color_jpeg_mcu_roundtrip_and_guards():
    """Baseline color JPEG: every 16x16 MCU decodes to exactly the
    closed-form constant RGB of its painted YCbCr (the
    exact-quantization family), per-component DC predictors included;
    non-4:2:0 sampling and progressive color are honest guards."""
    import struct as st

    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_jpeg_color,
        _jpeg_color_dims,
        _jpeg_color_mcu,
        _ycbcr_to_rgb,
        parse_jpeg_color,
    )

    for i in (0, 1, 5, 17, 100):
        w, h = _jpeg_color_dims(i)
        ww, hh, img = parse_jpeg_color(_encode_jpeg_color(i))
        assert (ww, hh) == (w, h) and img.shape == (h, w, 3)
        mx = w // 16
        for m in range(mx * (h // 16)):
            y, cb, cr = _jpeg_color_mcu(i, m)
            r, g, b = _ycbcr_to_rgb(
                np.array([[float(y)]]),
                np.array([[float(cb)]]),
                np.array([[float(cr)]]),
            )
            bx, by = (m % mx) * 16, (m // mx) * 16
            tile = img[by : by + 16, bx : bx + 16]
            assert (tile[..., 0] == r[0, 0]).all()
            assert (tile[..., 1] == g[0, 0]).all()
            assert (tile[..., 2] == b[0, 0]).all()

    blob = bytearray(_encode_jpeg_color(2))
    # SOF0 component 1's sampling byte: claim 4:2:2 (0x21) -> guard
    sof_at = bytes(blob).index(b"\xff\xc0")
    blob[sof_at + 11] = 0x21
    with pytest.raises(NotImplementedError, match="4:2:0"):
        parse_jpeg_color(bytes(blob))
    # grayscale file into the color path -> loud, not a mis-decode
    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        _encode_jpeg,
    )

    with pytest.raises(NotImplementedError, match="3 comps"):
        parse_jpeg_color(_encode_jpeg(2))


def test_flac_roundtrip_compression_and_crc_guards():
    """FLAC subset: every fixture id roundtrips sample-exact through
    Rice decode + prediction with verified CRCs; the Rice-coded frames
    genuinely COMPRESS (below 16-bit raw) — entropy coding, not a
    container; and a single flipped payload bit is a loud CRC error."""
    import numpy as np

    from dynamodb_streaming_datalake_spark.operators.multimodal import (
        FLAC_BLOCK,
        _encode_flac,
        _flac_params,
        _flac_samples,
        parse_flac,
    )

    for i in range(12):
        blob = _encode_flac(i)
        rate, x = parse_flac(blob)
        want = np.concatenate(
            [_flac_samples(i, b) for b in range(_flac_params(i))]
        )
        assert rate == 8000 and np.array_equal(x, want), i
        raw = _flac_params(i) * FLAC_BLOCK * 2
        assert len(blob) < raw, (i, len(blob), raw)

    blob = bytearray(_encode_flac(1))
    blob[100] ^= 0x40  # flip one residual bit
    with pytest.raises(ValueError, match="CRC"):
        parse_flac(bytes(blob))
    with pytest.raises(ValueError, match="not a FLAC"):
        parse_flac(b"OggS" + bytes(blob)[4:])
