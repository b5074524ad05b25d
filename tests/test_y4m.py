"""YUV4MPEG2 codec: lossless round trip, header parsing, robustness.

Closes the last fake-decoder slot (video) in the PNG/JPEG/WAV/Y4M
real-codec family. Reference analog: media work is external-tool-side
in the reference (/root/reference/export_formats/previews.py:24-39).
"""

import numpy as np
import pytest

from geotiff_processor_spark.functions import y4m as Y
from geotiff_processor_spark.operators import multimodal
from geotiff_processor_spark.sources import synth


def test_roundtrip_c444_and_mono_lossless():
    rng = np.random.default_rng(7)
    fr = rng.integers(0, 256, (5, 16, 12, 3), dtype=np.uint8)
    w, h, fps, back = Y.decode_y4m(Y.encode_y4m(fr, (30, 1)))
    assert (w, h, fps) == (12, 16, (30, 1))
    assert np.array_equal(back, fr)
    mono = rng.integers(0, 256, (3, 8, 10), dtype=np.uint8)
    w, h, fps, back = Y.decode_y4m(Y.encode_y4m(mono))
    assert (w, h, fps) == (10, 8, (25, 1))
    assert np.array_equal(back, mono)


def test_header_tolerates_unknown_params():
    """Real streams carry X metadata / interlace tags the parser must
    skip (like PNG ancillary chunks / WAV LIST chunks)."""
    fr = np.full((2, 4, 4, 3), 9, np.uint8)
    data = Y.encode_y4m(fr)
    nl = data.find(b"\n")
    spliced = (data[:nl] + b" XYSCSS=444 Xconverted" + data[nl:])
    w, h, fps, back = Y.decode_y4m(spliced)
    assert (w, h) == (4, 4)
    assert np.array_equal(back, fr)


def test_decoder_rejects_subsampled_bad_magic_truncated():
    fr = np.zeros((1, 4, 4, 3), np.uint8)
    data = Y.encode_y4m(fr)
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        Y.decode_y4m(b"RIFF" + data[4:])
    with pytest.raises(ValueError, match="unsupported colourspace"):
        Y.decode_y4m(data.replace(b"C444", b"C411"))
    with pytest.raises(ValueError, match="truncated"):
        Y.decode_y4m(data[:-5])
    # default colourspace (no C tag) is 420: a C444-sized single-frame
    # payload parses its first 420-sized frame then chokes on the rest
    with pytest.raises(ValueError, match="corrupt FRAME"):
        Y.decode_y4m(data.replace(b" C444", b""))


def test_decode_video_matches_formula(spark, sf_dir):
    """Engine parse of the planted payloads reproduces the integer
    pixel formula's sampled-frame plane means exactly (the oracle
    identity), with the every-2 sampling contract."""
    media = synth.build_media_y4m(spark, sf_dir).limit(20)
    rows = multimodal.decode_video(media, payload_col="y4m",
                                   key_col="url", every=2).collect()
    n_sampled = (synth.VIDEO_FRAMES + 1) // 2
    assert len(rows) == 20 * n_sampled
    a, b, c, d, e = synth.VIDEO_COEFS
    s = synth.VIDEO_SIZE
    import pyspark.sql.functions as F
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    url2i = {r["url"]: r["i"] for r in events.select(
        F.col("event_id").alias("i"),
        F.expr(synth.SQL_URL).alias("url")).collect()}
    y = np.arange(s, dtype=np.int64)[:, None]
    x = np.arange(s, dtype=np.int64)[None, :]
    for r in rows:
        i = url2i[r["url"]]
        assert r["frame_idx"] % 2 == 0
        assert r["n_frames"] == synth.VIDEO_FRAMES
        assert (r["width"], r["height"]) == (s, s)
        assert r["fps_num"] == synth.VIDEO_FPS
        for p, col in enumerate(("mean_y", "mean_u", "mean_v")):
            v = (i * a + r["frame_idx"] * b + y * c + x * d + p * e) % 251
            assert r[col] == v.mean(), (r["url"], col)


from hypothesis import given, settings
from hypothesis import strategies as st
import numpy as np


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 6), st.integers(1, 24), st.integers(1, 24),
       st.booleans(), st.integers(1, 60))
def test_y4m_roundtrip_property(f, h, w, mono, fps_num):
    """Any frame count / dims / colourspace round-trips losslessly."""
    rng = np.random.default_rng(f * 1000 + h * 37 + w)
    shape = (f, h, w) if mono else (f, h, w, 3)
    fr = rng.integers(0, 256, shape, dtype=np.uint8)
    from geotiff_processor_spark.functions.y4m import decode_y4m, encode_y4m
    ww, hh, fps, back = decode_y4m(encode_y4m(fr, (fps_num, 1)))
    assert (ww, hh, fps) == (w, h, (fps_num, 1))
    assert np.array_equal(back, fr)


def test_decode_video_mono_payloads(spark):
    """Cmono streams (a format the codec supports) must decode to
    luma-only rows, not crash the executor (regression: means indexing
    assumed 3 planes)."""
    import pandas as pd
    from geotiff_processor_spark.functions.y4m import encode_y4m
    fr = np.arange(2 * 4 * 4, dtype=np.uint8).reshape(2, 4, 4)
    pdf = pd.DataFrame({"url": ["m1"], "y4m": [encode_y4m(fr)]})
    df = spark.createDataFrame(pdf)
    rows = multimodal.decode_video(df, payload_col="y4m",
                                   key_col="url", every=1).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["mean_y"] == fr[r["frame_idx"]].mean()
        assert r["mean_u"] is None and r["mean_v"] is None


def test_y4m_subsampled_chroma_roundtrip():
    """C420 (every siting variant) and C422: replication upsample,
    same documented policy as the JPEG decoder's."""
    import numpy as np

    from geotiff_processor_spark.functions.y4m import (
        decode_y4m, encode_y4m_subsampled)

    rng = np.random.default_rng(6)
    y = rng.integers(0, 256, (2, 8, 10), dtype=np.uint8)
    u = rng.integers(0, 256, (2, 4, 5), dtype=np.uint8)
    v = rng.integers(0, 256, (2, 4, 5), dtype=np.uint8)
    data = encode_y4m_subsampled(y, u, v, b"420")
    exp = np.stack([y,
                    np.repeat(np.repeat(u, 2, 1), 2, 2),
                    np.repeat(np.repeat(v, 2, 1), 2, 2)], axis=-1)
    for variant in (b"420", b"420jpeg", b"420mpeg2", b"420paldv"):
        w, h, _fps, out = decode_y4m(
            data.replace(b"C420\n", b"C" + variant + b"\n"))
        assert (w, h) == (10, 8)
        assert (out == exp).all(), variant
    u2 = rng.integers(0, 256, (2, 8, 5), dtype=np.uint8)
    v2 = rng.integers(0, 256, (2, 8, 5), dtype=np.uint8)
    _w, _h, _f, out = decode_y4m(encode_y4m_subsampled(y, u2, v2, b"422"))
    assert (out == np.stack(
        [y, np.repeat(u2, 2, 2), np.repeat(v2, 2, 2)], axis=-1)).all()
    # odd dims rejected for 420
    import pytest
    with pytest.raises(ValueError, match="even"):
        decode_y4m(b"YUV4MPEG2 W9 H8 F25:1 C420\nFRAME\n" + b"0" * 200)
