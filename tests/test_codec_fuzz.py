"""Hypothesis fuzz for the pure-python codecs (no Spark session):
shrinkable random-content round trips across the whole option space."""

import numpy as np
from hypothesis import given, settings, strategies as st

from geotiff_processor_spark.functions import gif as G
from geotiff_processor_spark.functions import jpeg as J


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 5), st.integers(1, 5),
       st.booleans(), st.booleans())
def test_gif_roundtrip_fuzz(seed, h, w, interlace, lct):
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, 256, (h * 7, w * 5)).astype(np.uint8)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    out = G.decode_gif(G.encode_gif(idx, pal, interlace=interlace,
                                    local_palette=lct))
    assert np.array_equal(out, pal[idx.astype(np.int32)])


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**32 - 1), st.sampled_from(["444", "420", "422"]),
       st.integers(0, 3))
def test_jpeg_progressive_equals_baseline_fuzz(seed, sub, ri):
    rng = np.random.RandomState(seed)
    if sub == "444":
        shapes = [(16, 16)] * 3
    elif sub == "420":
        shapes = [(16, 16), (8, 8), (8, 8)]
    else:
        shapes = [(16, 16), (16, 8), (16, 8)]
    planes = [rng.randint(0, 256, s).astype(np.uint8) for s in shapes]
    base = J.decode_jpeg(J.encode_jpeg_planes(planes, subsample=sub,
                                              restart_interval=ri))
    prog = J.decode_jpeg(J.encode_jpeg_progressive(
        planes, subsample=sub, restart_interval=ri))
    plain = J.decode_jpeg(J.encode_jpeg_planes(planes, subsample=sub))
    assert (base == plain).all()   # restarts never change pixels
    assert (prog == plain).all()   # progressive == baseline, always


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(10, 400))
def test_jpeg_truncation_never_leaks_raw_errors(seed, cut):
    rng = np.random.RandomState(seed)
    planes = [rng.randint(0, 256, (16, 16)).astype(np.uint8)
              for _ in range(3)]
    data = J.encode_jpeg_progressive(planes)
    cut = min(cut * 7, len(data) - 1)
    try:
        out = J.decode_jpeg(data[:cut])
    except ValueError:
        pass
    else:
        assert out.shape == (16, 16, 3)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(5, 200))
def test_gif_truncation_never_leaks_raw_errors(seed, cut):
    rng = np.random.RandomState(seed)
    idx = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    data = G.encode_gif(idx, pal, interlace=bool(seed & 1),
                        local_palette=bool(seed & 2))
    cut = min(cut * 7, len(data) - 1)
    try:
        out = G.decode_gif(data[:cut])
    except ValueError:
        pass
    else:
        assert out.shape == (16, 16, 3)
