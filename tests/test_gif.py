"""GIF LZW codec: lossless round trip, block walking, robustness.

Closes the 'gif' sniffed-magic slot — every magic kind
operators/multimodal.py recognizes now decodes for real.
"""

import numpy as np
import pytest

from geotiff_processor_spark.functions import gif as G
from geotiff_processor_spark.operators import multimodal
from geotiff_processor_spark.sources import synth


def test_roundtrip_lossless_various_shapes():
    rng = np.random.default_rng(5)
    for h, w in ((16, 16), (3, 9), (1, 1), (37, 41)):
        idx = rng.integers(0, 256, (h, w), dtype=np.uint8)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        img = G.decode_gif(G.encode_gif(idx, pal))
        assert img.shape == (h, w, 3)
        assert np.array_equal(img, pal[idx.astype(np.int32)])


def test_decoder_skips_extensions():
    """GCE/comment extensions sit between the screen descriptor and the
    image block in real files — the block walk must skip them."""
    idx = np.arange(16, dtype=np.uint8).reshape(4, 4)
    pal = np.zeros((256, 3), np.uint8)
    pal[:16] = np.arange(16)[:, None] * 10
    data = G.encode_gif(idx, pal)
    at = data.find(b"\x2C")
    gce = b"\x21\xF9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    comment = b"\x21\xFE\x05hello\x00"
    spliced = data[:at] + gce + comment + data[at:]
    img = G.decode_gif(spliced)
    assert np.array_equal(img, pal[idx.astype(np.int32)])


def test_decoder_rejects_bad_inputs():
    idx = np.zeros((4, 4), np.uint8)
    pal = np.zeros((256, 3), np.uint8)
    data = bytearray(G.encode_gif(idx, pal))
    with pytest.raises(ValueError, match="not a GIF"):
        G.decode_gif(b"\x89PNG" + bytes(data[4:]))
    # truncate inside a local color table (descriptor starts right
    # after the 13-byte header when there is no GCT)
    lct = G.encode_gif(idx, pal, local_palette=True)
    assert lct[13] == 0x2C
    with pytest.raises(ValueError, match="truncated"):
        G.decode_gif(lct[:13 + 10 + 100])


def test_interlace_and_local_color_table_roundtrip():
    """All four descriptor layouts (sequential/interlaced x GCT/LCT)
    decode to the SAME pixels — the layout-rotation invariant the
    synth media table and its oracle rely on."""
    rng = np.random.default_rng(11)
    for h, w in ((16, 16), (3, 9), (1, 1), (37, 41), (8, 5)):
        idx = rng.integers(0, 256, (h, w), dtype=np.uint8)
        pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
        want = pal[idx.astype(np.int32)]
        for interlace in (False, True):
            for lct in (False, True):
                data = G.encode_gif(idx, pal, interlace=interlace,
                                    local_palette=lct)
                got = G.decode_gif(data)
                assert np.array_equal(got, want), (h, w, interlace, lct)
                # flags actually round-tripped through the descriptor
                # (offset computed structurally — find(0x2C) could hit
                # an arbitrary palette byte)
                at = 13 + (0 if lct else 768)
                assert data[at] == 0x2C
                assert bool(data[at + 9] & 0x40) == interlace
                assert bool(data[at + 9] & 0x80) == lct


def test_interlace_row_permutation_is_appendix_e():
    """Pin the four-pass order on a height where every pass is
    non-empty (GIF89a appendix E)."""
    rows = G._interlace_rows(10).tolist()
    assert rows == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]


def test_lzw_clear_boundary_exact():
    """Images larger than the 254-code CLEAR cadence must still round
    trip exactly (table reset mid-stream)."""
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 256, (64, 64), dtype=np.uint8)  # 4096 codes
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    assert np.array_equal(G.decode_gif(G.encode_gif(idx, pal)),
                          pal[idx.astype(np.int32)])


def test_decode_images_gif_matches_formula(spark, sf_dir):
    """Engine LZW-parse of planted payloads reproduces the palette
    arithmetic exactly (the oracle identity), strict mode live."""
    media = synth.build_media_gif(spark, sf_dir).limit(20)
    rows = multimodal.decode_images(media, payload_col="gif",
                                    key_col="url", strict=True).collect()
    assert len(rows) == 20
    a, b, c = synth.GIF_IDX_COEFS
    p, q, r = synth.GIF_PAL_COEFS
    s = synth.GIF_SIZE
    import pyspark.sql.functions as F
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    url2i = {rr["url"]: rr["i"] for rr in events.select(
        F.col("event_id").alias("i"),
        F.expr(synth.SQL_URL).alias("url")).collect()}
    y = np.arange(s, dtype=np.int64)[:, None]
    x = np.arange(s, dtype=np.int64)[None, :]
    for row in rows:
        i = url2i[row["url"]]
        assert (row["height"], row["width"]) == (s, s)
        idx = (i * a + y * b + x * c) % 256
        for ch, col in enumerate(("mean_r", "mean_g", "mean_b")):
            v = (idx * p + ch * q + r) % 256
            assert row[col] == v.mean(), (row["url"], col)


def test_decoder_truncation_raises_valueerror_not_indexerror():
    """Cut anywhere, the decoder must fail with the documented
    ValueError family (strict decode_images surfaces it verbatim)."""
    idx = np.arange(256, dtype=np.uint8).reshape(16, 16)
    pal = np.arange(256 * 3, dtype=np.uint32).astype(np.uint8) \
        .reshape(256, 3)
    data = G.encode_gif(idx, pal)
    at = data.find(b"\x2C")
    gce = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
    data = data[:at] + gce + data[at:]
    for cut in (7, 12, at - 1, at + 3, at + 11, len(data) // 2,
                len(data) - 2):
        with pytest.raises(ValueError):
            G.decode_gif(data[:cut])
