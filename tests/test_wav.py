"""RIFF/WAVE PCM codec: lossless round trip, chunk walking, robustness.

Reference analog: codec work is GDAL-side in the reference
(/root/reference/export_formats/previews.py:24-39); the engine owns its
codecs (PNG/JPEG/WAV family).
"""

import struct

import numpy as np
import pytest

from geotiff_processor_spark.functions import wav as W
from geotiff_processor_spark.operators import multimodal
from geotiff_processor_spark.sources import synth


def test_roundtrip_mono_and_stereo_lossless():
    rng = np.random.default_rng(11)
    for ch in (1, 2, 4):
        s = rng.integers(-32768, 32768, (333, ch)).astype(np.int16)
        rate, back = W.decode_wav(W.encode_wav(s, 22_050))
        assert rate == 22_050
        assert back.shape == (333, ch)
        assert (back == s).all()
    # 1-D mono input round-trips as (n, 1)
    s1 = rng.integers(-32768, 32768, 100).astype(np.int16)
    _, back = W.decode_wav(W.encode_wav(s1))
    assert back.shape == (100, 1)
    assert (back[:, 0] == s1).all()


def test_decoder_skips_unknown_chunks():
    """Other writers put LIST/fact chunks before data — the chunk walk
    must skip them (incl. odd-length word alignment)."""
    s = np.arange(-10, 10, dtype=np.int16)
    data = bytearray(W.encode_wav(s, 8000))
    # splice an odd-length junk chunk right after "fmt "
    fmt_end = data.find(b"data")
    junk = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"  # padded
    spliced = bytes(data[:fmt_end]) + junk + bytes(data[fmt_end:])
    spliced = (b"RIFF" + struct.pack("<I", len(spliced) - 8)
               + spliced[8:])
    rate, back = W.decode_wav(spliced)
    assert rate == 8000
    assert (back[:, 0] == s).all()


def test_decoder_rejects_non_pcm_and_truncated():
    s = np.zeros(8, np.int16)
    data = bytearray(W.encode_wav(s))
    with pytest.raises(ValueError, match="RIFF"):
        W.decode_wav(b"OggS" + bytes(data[4:]))
    # format tag 3 (float) unsupported
    fmt_at = bytes(data).find(b"fmt ") + 8
    data2 = bytearray(data)
    data2[fmt_at] = 3
    with pytest.raises(ValueError, match="unsupported"):
        W.decode_wav(bytes(data2))
    with pytest.raises(ValueError, match="truncated"):
        W.decode_wav(bytes(data[:20]))


def test_decode_audio_matches_formula(spark, sf_dir):
    """Engine parse of the planted payloads reproduces the integer
    sample formula's features exactly (the oracle identity)."""
    media = synth.build_media_wav(spark, sf_dir).limit(30)
    rows = multimodal.decode_audio(media, payload_col="wav",
                                   key_col="url").collect()
    assert len(rows) == 30
    a, b, c = synth.WAV_COEFS
    # recompute per-url from the url's event id via the media table
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    import pyspark.sql.functions as F
    url2i = {r["url"]: r["i"] for r in events.select(
        F.col("event_id").alias("i"),
        F.expr(synth.SQL_URL).alias("url")).collect()}
    t = np.arange(synth.WAV_FRAMES, dtype=np.int64)
    for r in rows:
        i = url2i[r["url"]]
        ch = 1 + i % 2
        cs = np.arange(ch, dtype=np.int64)
        s = ((i * a + t[:, None] * b + cs[None, :] * c) % 4096) - 2048
        assert r["n_frames"] == synth.WAV_FRAMES
        assert r["sample_rate"] == synth.WAV_RATE
        assert r["n_channels"] == ch
        assert r["peak"] == int(np.abs(s).max())
        assert r["mean_abs"] == np.abs(s).mean()
