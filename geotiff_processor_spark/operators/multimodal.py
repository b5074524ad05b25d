"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. Every magic kind the sniffer knows decodes for REAL:
PNG via ``functions.png`` (stdlib zlib), baseline JPEG via
``functions.jpeg`` (huffman + IDCT + YCbCr->RGB), GIF via
``functions.gif`` (LZW), RIFF/WAVE via ``functions.wav``, and video
via ``functions.y4m`` — no PIL/libjpeg/ffmpeg needed. Unknown payload
kinds fall back to a deterministic fake decoder (default) or raise
(strict mode) — the slot where ffmpeg would plug in on a real cluster
for compressed video/audio containers.

Operators:
- ``extract_media_meta``: sniff magic bytes + sizes from the binary
  column — native expressions only (substring on binary), no Python.
- ``decode_images``: mapInPandas batch decoder — real PNG decode where
  the magic matches, fake/strict elsewhere; emits (h, w, mean RGB),
  the post-decode feature extraction of a training pipeline.
- ``thumbnail_stats``: "resize" analog — block-average the pixel grid
  to a fixed thumbnail, emit per-channel means (the reference's
  preview downsample, /root/reference/export_formats/previews.py:24-39).
- ``frame_sample``: 1:N UDTF-shaped sampler for video-like payloads —
  emits every k-th frame index with a deterministic frame fingerprint
  (sha256(payload || ':' || idx) — ASCII-safe so the DuckDB oracle
  reproduces it).

Scale notes: payloads never shuffle (all ops are map-side; aggregations
happen on extracted features); binary columns stay columnar in parquet
and are pruned unless referenced. The per-payload loop inside the
decode kernel is inherent to codec work (each payload is one compressed
stream); the batch boundary is still Arrow-columnar.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STRICT_DECODE = False  # flip to surface NotImplementedError in executors

_MAGIC = [
    ("jpeg", b"\xff\xd8\xff"),
    ("png", b"\x89PNG"),
    ("gif", b"GIF8"),
    ("tiff", b"II*\0"),
    ("tiff", b"MM\0*"),
    ("riff", b"RIFF"),
    ("y4m", b"YUV4"),
    ("html", b"<htm"),
]


def extract_media_meta(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Typed metadata from the binary column with native expressions:
    (n_bytes, magic, kind). No Python; stays in whole-stage codegen."""
    prefix = F.expr(f"substring({payload_col}, 1, 4)")
    kind = F.lit("bin")
    for name, magic in reversed(_MAGIC):
        kind = F.when(
            F.expr(f"substring({payload_col}, 1, {len(magic)})")
            == F.lit(bytearray(magic)), name).otherwise(kind)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.length(F.col(payload_col)).alias("n_bytes"),
            F.hex(prefix).alias("magic_hex"),
            kind.alias("kind"),
        ),
    )


def _fake_decode(payload: bytes, h: int = 16, w: int = 16) -> np.ndarray:
    """Deterministic fake decoder: payload-hash-seeded uint8 HxWx3 image.

    Stands in for PIL/libjpeg (absent in this container). Deterministic
    so goldens are stable; same batch shape as a real decoder.
    """
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def decode_images(df: DataFrame, payload_col: str = "html",
                  key_col: str = "url", h: int = 16, w: int = 16,
                  strict: bool | None = None) -> DataFrame:
    """Batch image decode via mapInPandas (Arrow-vectorized transfer).

    Returns (key, height, width, mean_r, mean_g, mean_b) — the feature
    extraction a training pipeline runs post-decode. PNG, baseline
    JPEG and GIF payloads all decode for REAL (functions.png/.jpeg/
    .gif); unknown payload kinds use the deterministic fake decoder,
    or raise with strict=True (the remaining ffmpeg slot for
    compressed containers this repo has no codec for).
    """
    strict = STRICT_DECODE if strict is None else strict
    schema = (f"{key_col} string, height int, width int,"
              " mean_r double, mean_g double, mean_b double")

    def decode(batches):
        from ..functions.gif import decode_gif
        from ..functions.jpeg import decode_jpeg_batch
        from ..functions.png import decode_png
        from ..functions.tiff import decode_tiff
        for pdf in batches:
            keys = pdf[key_col].tolist()
            payloads = [bytes(p) for p in pdf[payload_col]]
            imgs: list = [None] * len(payloads)
            jpeg_idx: list[int] = []
            for i, p in enumerate(payloads):
                if p[:4] == b"\x89PNG":
                    imgs[i] = decode_png(p)[:, :, :3]
                elif p[:3] == b"\xff\xd8\xff":
                    jpeg_idx.append(i)  # stage-2-batched below
                elif p[:4] == b"GIF8":
                    imgs[i] = decode_gif(p)
                elif p[:4] in (b"II*\0", b"MM\0*"):
                    arr = decode_tiff(p)[0]
                    if arr.ndim != 3:          # float DEM -> gray 3-band
                        arr = np.repeat(
                            arr.astype(np.float64)[:, :, None], 3, axis=2)
                    imgs[i] = arr
                elif strict:
                    raise ValueError(
                        f"no codec for payload magic {p[:4]!r}: only the"
                        " built-in PNG, JPEG, GIF and (Geo)TIFF codecs"
                        " are available in this container (ffmpeg slot)")
                else:
                    imgs[i] = _fake_decode(p, h, w)
            if jpeg_idx:
                decoded = decode_jpeg_batch([payloads[i] for i in jpeg_idx])
                for i, img in zip(jpeg_idx, decoded):
                    imgs[i] = img
            # per-channel means batched across same-shape uint8 images
            # (integer pixel sums are exact in float64, so the batched
            # reduction is bit-identical to per-image means); float
            # images (DEM gray) keep the per-image path for exact fp
            # reduction-order equivalence
            n = len(imgs)
            hh = [0] * n
            ww = [0] * n
            mr = [0.0] * n
            mg = [0.0] * n
            mb = [0.0] * n
            by_shape: dict[tuple, list[int]] = {}
            for i, im in enumerate(imgs):
                hh[i], ww[i] = im.shape[0], im.shape[1]
                if im.dtype == np.uint8:
                    by_shape.setdefault(im.shape, []).append(i)
                else:
                    m = im.reshape(-1, 3).mean(axis=0)
                    mr[i], mg[i], mb[i] = (float(m[0]), float(m[1]),
                                           float(m[2]))
            for idxs in by_shape.values():
                arr = np.stack([imgs[i] for i in idxs])
                m = arr.reshape(len(idxs), -1, 3).mean(axis=1)
                for j, i in enumerate(idxs):
                    mr[i], mg[i], mb[i] = (float(m[j, 0]), float(m[j, 1]),
                                           float(m[j, 2]))
            yield pd.DataFrame({key_col: keys, "height": hh, "width": ww,
                                "mean_r": mr, "mean_g": mg, "mean_b": mb})

    return df.select(key_col, payload_col).mapInPandas(decode, schema=schema)


def decode_geotiff(df: DataFrame, payload_col: str = "tiff",
                   key_col: str = "url") -> DataFrame:
    """Batch GeoTIFF decode via mapInPandas (functions/tiff.py): the
    reference's own ingest format, parsed for real — strip walk,
    PackBits/Deflate decompression, AND the georeferencing tags
    (ModelTiepoint + GeoKeyDirectory EPSG), so the oracle checks the
    geo transform alongside pixel content.

    Returns (key, height, width, mean_r, mean_g, mean_b, lonm, latm,
    epsg) — tiepoint reported in exact millidegrees. Payload bytes
    never shuffle; all downstream math is on extracted features."""
    schema = (f"{key_col} string, height int, width int,"
              " mean_r double, mean_g double, mean_b double,"
              " lonm bigint, latm bigint, epsg int")

    def decode(batches):
        from ..functions.tiff import decode_tiff
        for pdf in batches:
            out = {key_col: pdf[key_col].tolist(), "height": [],
                   "width": [], "mean_r": [], "mean_g": [], "mean_b": [],
                   "lonm": [], "latm": [], "epsg": []}
            for payload in pdf[payload_col]:
                arr, meta = decode_tiff(bytes(payload))
                if arr.ndim != 3:              # float DEM -> gray 3-band
                    arr = np.repeat(
                        arr.astype(np.float64)[:, :, None], 3, axis=2)
                means = arr.reshape(-1, 3).mean(axis=0)
                tie = meta["tiepoint"] or (None, None)
                out["height"].append(meta["height"])
                out["width"].append(meta["width"])
                out["mean_r"].append(float(means[0]))
                out["mean_g"].append(float(means[1]))
                out["mean_b"].append(float(means[2]))
                out["lonm"].append(
                    None if tie[0] is None else round(tie[0] * 1000))
                out["latm"].append(
                    None if tie[1] is None else round(tie[1] * 1000))
                out["epsg"].append(meta["epsg"])
            yield pd.DataFrame(
                {k: (pd.array(v, "Int64") if k in ("lonm", "latm", "epsg")
                     else v) for k, v in out.items()})

    return df.select(key_col, payload_col).mapInPandas(decode, schema=schema)


def dem_pixels(df: DataFrame, payload_col: str = "tiff",
               key_col: str = "map_id") -> DataFrame:
    """1:N GeoTIFF-DEM explode: one float32 DEM payload -> one row per
    pixel (key, px, py, elev) — the raster-as-table bridge that lets
    every downstream raster operator (hillshade, pyramid, zonal,
    percentile) run on REAL ingested bytes. Arrow-batched; each payload
    decodes in the executor that holds it (at fleet scale a directory
    of DEM tiles decodes embarrassingly parallel, one task per file
    split), and only (key, int, int, double) rows ever shuffle."""
    schema = f"{key_col} string, px int, py int, elev double"

    def gen(batches):
        from ..functions.tiff import decode_tiff
        for pdf in batches:
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                arr, _ = decode_tiff(bytes(payload))
                if arr.ndim != 2:
                    raise ValueError(
                        "dem_pixels expects single-band float DEM TIFFs")
                h, w = arr.shape
                yy, xx = np.mgrid[0:h, 0:w]
                yield pd.DataFrame({
                    key_col: np.repeat(key, h * w),
                    "px": xx.ravel().astype(np.int32),
                    "py": yy.ravel().astype(np.int32),
                    "elev": arr.ravel().astype(np.float64),
                })

    return df.select(key_col, payload_col).mapInPandas(gen, schema)


def decode_audio(df: DataFrame, payload_col: str = "wav",
                 key_col: str = "url") -> DataFrame:
    """Batch audio decode via mapInPandas: REAL RIFF/WAVE PCM16 parse
    (functions/wav.py) -> per-payload amplitude features
    (frames, rate, channels, mean |sample|, peak |sample|) — the
    feature extraction an audio training pipeline runs post-decode.
    PCM is lossless, so planted integer-formula payloads make this
    end-to-end hash-checkable against a SQL oracle."""
    schema = (f"{key_col} string, n_frames int, sample_rate int,"
              " n_channels int, mean_abs double, peak int")

    def decode(batches):
        from ..functions.wav import decode_wav
        for pdf in batches:
            decoded = [decode_wav(bytes(p)) for p in pdf[payload_col]]
            n = len(decoded)
            out = {key_col: pdf[key_col].tolist(),
                   "n_frames": [a.shape[0] for _, a in decoded],
                   "sample_rate": [r for r, _ in decoded],
                   "n_channels": [a.shape[1] for _, a in decoded],
                   "mean_abs": [0.0] * n, "peak": [0] * n}
            # |sample| mean/peak batched across same-shape payloads
            # (round 6): integer sums are exact in float64 at any
            # reduction order, so values are identical to per-payload
            by_shape: dict[tuple, list[int]] = {}
            for i, (_r, a) in enumerate(decoded):
                by_shape.setdefault(a.shape, []).append(i)
            for idxs in by_shape.values():
                aa = np.abs(np.stack(
                    [decoded[i][1] for i in idxs]).astype(np.int64))
                means = aa.reshape(len(idxs), -1).mean(axis=1)
                peaks = aa.reshape(len(idxs), -1).max(axis=1)
                for j, i in enumerate(idxs):
                    out["mean_abs"][i] = float(means[j])
                    out["peak"][i] = int(peaks[j])
            yield pd.DataFrame(out)

    return df.select(key_col, payload_col).mapInPandas(decode, schema=schema)


def decode_video(df: DataFrame, payload_col: str = "y4m",
                 key_col: str = "url", every: int = 2) -> DataFrame:
    """Batch video decode + frame sampling via mapInPandas: REAL
    YUV4MPEG2 parse (functions/y4m.py) -> one row per SAMPLED frame
    (every ``every``-th) with per-plane means — the decode +
    frame-sample + feature-extract stage of a multimodal training
    pipeline, now on real bytes end to end (this replaces the fake
    fingerprint path for video payloads; reference analog: the
    reference's media work all shells to external tools,
    /root/reference/export_formats/previews.py:24-39).

    1:N UDTF-shaped like ``frame_sample``; Y4M is lossless, so planted
    integer-formula payloads are hash-checkable against a SQL oracle.
    Scale: map-side only, payloads never shuffle; sampling inside the
    kernel means unsampled frames are decoded but never emitted (a
    frame-seeking decoder would skip them; Y4M's fixed frame size
    makes the skip trivial, kept simple here)."""
    schema = (f"{key_col} string, frame_idx int, n_frames int,"
              " width int, height int, fps_num int,"
              " mean_y double, mean_u double, mean_v double")

    def decode(batches):
        from ..functions.y4m import decode_y4m
        for pdf in batches:
            decoded = [(key, decode_y4m(bytes(payload)))
                       for key, payload in zip(pdf[key_col],
                                               pdf[payload_col])]
            # per-frame plane means batched across same-shape payloads
            # (round 6): uint8 sums are exact in float64 at any
            # reduction order, so values match the per-payload means
            all_means: list = [None] * len(decoded)
            by_shape: dict[tuple, list[int]] = {}
            for i, (_k, (_w, _h, _fps, frames)) in enumerate(decoded):
                by_shape.setdefault(frames.shape, []).append(i)
            for idxs in by_shape.values():
                stack = np.stack([decoded[i][1][3] for i in idxs]) \
                    .astype(np.float64)
                ms = stack.mean(axis=(2, 3))
                for j, i in enumerate(idxs):
                    all_means[i] = ms[j]
            rows = {k: [] for k in (key_col, "frame_idx", "n_frames",
                                    "width", "height", "fps_num",
                                    "mean_y", "mean_u", "mean_v")}
            for i, (key, (w, h, fps, frames)) in enumerate(decoded):
                mono = frames.ndim == 3  # Cmono: luma only, no chroma
                means = all_means[i]
                for fi in range(0, frames.shape[0], every):
                    rows[key_col].append(key)
                    rows["frame_idx"].append(fi)
                    rows["n_frames"].append(frames.shape[0])
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["fps_num"].append(fps[0])
                    if mono:
                        rows["mean_y"].append(float(means[fi]))
                        rows["mean_u"].append(None)
                        rows["mean_v"].append(None)
                    else:
                        rows["mean_y"].append(float(means[fi, 0]))
                        rows["mean_u"].append(float(means[fi, 1]))
                        rows["mean_v"].append(float(means[fi, 2]))
            yield pd.DataFrame(rows)

    return df.select(key_col, payload_col).mapInPandas(decode, schema=schema)


def thumbnail_stats(df: DataFrame, payload_col: str = "html",
                    key_col: str = "url", src: int = 16,
                    thumb: int = 4) -> DataFrame:
    """Resize analog: decode then block-average to a thumb x thumb grid;
    emits one row per thumbnail cell (UDTF-shaped 1:N)."""
    k = src // thumb
    schema = (f"{key_col} string, ty int, tx int,"
              " mean_r double, mean_g double, mean_b double")

    def resize(batches):
        for pdf in batches:
            rows = {key_col: [], "ty": [], "tx": [],
                    "mean_r": [], "mean_g": [], "mean_b": []}
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                img = _fake_decode(bytes(payload), src, src).astype(np.float64)
                # block average: (thumb, k, thumb, k, 3) -> mean over k-axes
                blocks = img.reshape(thumb, k, thumb, k, 3).mean(axis=(1, 3))
                for ty in range(thumb):
                    for tx in range(thumb):
                        rows[key_col].append(key)
                        rows["ty"].append(ty)
                        rows["tx"].append(tx)
                        rows["mean_r"].append(float(blocks[ty, tx, 0]))
                        rows["mean_g"].append(float(blocks[ty, tx, 1]))
                        rows["mean_b"].append(float(blocks[ty, tx, 2]))
            yield pd.DataFrame(rows)

    return df.select(key_col, payload_col).mapInPandas(resize, schema=schema)


def frame_sample(df: DataFrame, payload_col: str = "html",
                 key_col: str = "url", n_frames: int = 12,
                 every: int = 4) -> DataFrame:
    """Video frame-sampling analog: treat the payload as an n_frames
    sequence, emit every `every`-th frame with a deterministic
    fingerprint sha256(payload || ':' || ascii(frame_idx)) — the index
    suffix is ASCII (not packed bytes) so DuckDB's VARCHAR-only sha256
    reproduces it and the query is hash-match oracle-checkable."""
    schema = f"{key_col} string, frame_idx int, frame_sha string"

    def sample(batches):
        for pdf in batches:
            keys, idxs, shas = [], [], []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                p = bytes(payload)
                for i in range(0, n_frames, every):
                    keys.append(key)
                    idxs.append(i)
                    shas.append(hashlib.sha256(
                        p + b":" + str(i).encode()).hexdigest()[:16])
            yield pd.DataFrame(
                {key_col: keys, "frame_idx": idxs, "frame_sha": shas})

    return df.select(key_col, payload_col).mapInPandas(sample, schema=schema)


def image_dhash(df: DataFrame, payload_col: str = "png",
                key_col: str = "url",
                strict: bool | None = None) -> DataFrame:
    """Perceptual difference hash (dHash) per image — the multimodal
    near-dup key: decode (real codecs), integer luma
    (299R + 587G + 114B, exact in int32), then one bit per horizontal
    neighbor pair (gray[y][x] > gray[y][x+1]) packed row-major into a
    bigint ((w-1) * h bits; 56 for the 8x8 media table). Images whose
    hash collides are near-duplicates up to brightness/contrast shifts
    — group on the hash exactly like text dedup groups on md5.

    Exactness: every step is integer arithmetic on decoded pixels, so
    for losslessly-coded payloads (PNG/GIF) the hash is a pure
    function of the planted formula and the DuckDB oracle recomputes
    it bit-for-bit.

    Returns (key, dhash bigint).
    """
    strict = STRICT_DECODE if strict is None else strict
    schema = f"{key_col} string, dhash bigint"

    def gen(batches):
        from ..functions.gif import decode_gif
        from ..functions.jpeg import decode_jpeg
        from ..functions.png import decode_png
        for pdf in batches:
            keys = pdf[key_col].tolist()
            imgs = []
            for payload in pdf[payload_col]:
                p = bytes(payload)
                if p[:4] == b"\x89PNG":
                    img = decode_png(p)[:, :, :3]
                elif p[:3] == b"\xff\xd8\xff":
                    img = decode_jpeg(p)
                elif p[:4] == b"GIF8":
                    img = decode_gif(p)
                elif strict:
                    raise ValueError(
                        f"no codec for payload magic {p[:4]!r}")
                else:
                    img = _fake_decode(p, 8, 8)
                imgs.append(img)
            # luma + bit packing vectorized across the batch, grouped
            # by shape (round 6: ~7 numpy calls per image before) —
            # identical integer arithmetic, just batched
            hashes: list[int | None] = [None] * len(imgs)
            by_shape: dict[tuple, list[int]] = {}
            for i, im in enumerate(imgs):
                by_shape.setdefault(im.shape, []).append(i)
            for idxs in by_shape.values():
                arr = np.stack([imgs[i] for i in idxs]).astype(np.int64)
                g = (299 * arr[..., 0] + 587 * arr[..., 1]
                     + 114 * arr[..., 2])
                bits = (g[:, :, :-1] > g[:, :, 1:]).reshape(len(idxs), -1)
                weights = np.left_shift(
                    np.uint64(1), np.arange(bits.shape[1], dtype=np.uint64))
                vals = (bits.astype(np.uint64) * weights).sum(axis=1)
                for i, v in zip(idxs, vals):
                    hashes[i] = int(v)
            yield pd.DataFrame({key_col: keys,
                                "dhash": pd.array(hashes, "int64")})

    return df.mapInPandas(gen, schema)


def sql_image_dhash(dialect: str = "duckdb") -> str:
    """The identical 56-bit dHash of the 8x8 PNG media formula as SQL
    over (i): per (y, x<7) bit (g(x,y) > g(x+1,y)) << (y*7+x), summed.
    Bit shifts on bigint are exact (sum of distinct powers < 2^56)."""
    from ..sources.synth import MEDIA_CHANNEL_COEFS, MEDIA_SIZE

    (r_i, r_x, r_y), (g_i, g_x, g_y), (b_i, b_x, b_y) = \
        MEDIA_CHANNEL_COEFS

    def gray(x: str) -> str:
        return (f"(299 * ((i*{r_i} + {x}*{r_x} + y*{r_y}) % 256)"
                f" + 587 * ((i*{g_i} + {x}*{g_x} + y*{g_y}) % 256)"
                f" + 114 * ((i*{b_i} + {x}*{b_x} + y*{b_y}) % 256))")

    if dialect == "duckdb":
        shift = "(cast(1 as bigint) << cast(y * 7 + x as integer))"
    else:
        shift = "shiftleft(cast(1 as bigint), cast(y * 7 + x as int))"
    bit = (f"case when {gray('x')} > {gray('(x + 1)')}"
           f" then {shift} else 0 end")
    s = MEDIA_SIZE
    if dialect == "duckdb":
        grid = (f"(SELECT range AS x FROM range({s - 1})) xs,"
                f" (SELECT range AS y FROM range({s})) ys")
    else:
        grid = (f"(SELECT explode(sequence(0, {s - 2})) AS x) xs,"
                f" (SELECT explode(sequence(0, {s - 1})) AS y) ys")
    return (f"SELECT i, cast(sum({bit}) as bigint) AS dhash"
            f" FROM p0, {grid} GROUP BY i")
