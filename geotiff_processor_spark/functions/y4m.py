"""Pure-python/numpy YUV4MPEG2 (.y4m) video codec.

Completes the real-decoder media family (PNG: ``functions/png.py``,
JPEG: ``functions/jpeg.py``, WAV: ``functions/wav.py``): the video
slot in ``operators/multimodal.py`` was the last one still served by
the deterministic fake decoder. Y4M is the canonical uncompressed
interchange format (mjpegtools/ffmpeg): a one-line ASCII stream header
followed by ``FRAME`` records of raw planar YUV — so, like WAV, the
real parser costs less than the fake and the round trip is lossless,
which makes planted payloads end-to-end oracle-checkable (DuckDB
recomputes plane statistics straight from the integer pixel formula
while the engine parses the actual bytes).

Reference analog: the reference shells out to GDAL/external tools for
all media work (e.g. previews, ``/root/reference/export_formats/
previews.py:24-39``); this engine owns its codecs because a 100 TB
pipeline decodes in executors where native libraries (ffmpeg here)
may not be installable.

Supported: C444 (planar 4:4:4, the lossless-per-pixel layout), Cmono,
and subsampled C420 (all siting variants: 420/420jpeg/420mpeg2/
420paldv — plane sizes are identical, siting only matters to
resamplers) and C422; subsampled chroma upsamples by sample
replication, the same documented policy as the JPEG decoder's.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(f, h, w, 3) uint8 planar-content YUV frames -> C444 .y4m bytes.

    A (f, h, w) array encodes Cmono (luma only).
    """
    if frames.dtype != np.uint8:
        raise ValueError("encode_y4m expects uint8 frames")
    mono = frames.ndim == 3
    if not mono and (frames.ndim != 4 or frames.shape[3] != 3):
        raise ValueError("expected (f,h,w,3) YUV or (f,h,w) mono")
    f, h, w = frames.shape[:3]
    cs = b"mono" if mono else b"444"
    head = b"%s W%d H%d F%d:%d Ip A1:1 C%s\n" % (
        _MAGIC, w, h, fps[0], fps[1], cs)
    parts = [head]
    for k in range(f):
        parts.append(b"FRAME\n")
        if mono:
            parts.append(frames[k].tobytes())
        else:
            # planar: full Y plane, then U, then V
            for p in range(3):
                parts.append(np.ascontiguousarray(frames[k, :, :, p])
                             .tobytes())
    return b"".join(parts)


def decode_y4m(data: bytes) -> tuple[int, int, tuple[int, int], np.ndarray]:
    """C444/mono .y4m bytes -> (w, h, (fps_num, fps_den), frames).

    frames is (f, h, w, 3) uint8 for C444 and (f, h, w) for mono.
    Unknown stream-header parameters (X metadata, interlacing tags)
    are skipped, like the PNG decoder's ancillary chunks; FRAME-line
    parameters are tolerated too.
    """
    data = bytes(data)
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    fps = (25, 1)
    cs = b"420"  # Y4M default when no C tag is present
    for tok in data[len(_MAGIC) + 1:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps = (int(num), int(den))
        elif tag == b"C":
            cs = val
    if w <= 0 or h <= 0:
        raise ValueError("missing/invalid W or H in stream header")
    sub = None  # (x_factor, y_factor) for subsampled chroma
    if cs == b"mono":
        planes, fsize = 1, w * h
    elif cs == b"444":
        planes, fsize = 3, 3 * w * h
    elif cs in (b"420", b"420jpeg", b"420mpeg2", b"420paldv"):
        if w % 2 or h % 2:
            raise ValueError("C420 needs even dimensions")
        planes, sub = 3, (2, 2)
        fsize = w * h + 2 * ((w // 2) * (h // 2))
    elif cs == b"422":
        if w % 2:
            raise ValueError("C422 needs even width")
        planes, sub = 3, (2, 1)
        fsize = w * h + 2 * ((w // 2) * h)
    else:
        raise ValueError(
            f"unsupported colourspace C{cs.decode()}; this codec handles "
            "C444, C420*, C422 and Cmono")
    pos = nl + 1
    out = []
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos:pos + 5] != b"FRAME":
            raise ValueError("corrupt FRAME header")
        pos = fnl + 1
        if pos + fsize > len(data):
            raise ValueError("truncated frame payload")
        raw = np.frombuffer(data, np.uint8, count=fsize, offset=pos)
        if planes == 1:
            out.append(raw.reshape(h, w))
        elif sub is None:
            out.append(raw.reshape(3, h, w).transpose(1, 2, 0))
        else:
            fx, fy = sub
            cw, ch = w // fx, h // fy
            y_pl = raw[:w * h].reshape(h, w)
            u_pl = raw[w * h:w * h + cw * ch].reshape(ch, cw)
            v_pl = raw[w * h + cw * ch:].reshape(ch, cw)
            up = [np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
                  for p in (u_pl, v_pl)]
            out.append(np.stack([y_pl, up[0], up[1]], axis=-1))
        pos += fsize
    if not out:
        raise ValueError("no frames")
    return w, h, fps, np.stack(out)


def encode_y4m_subsampled(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                          cs: bytes = b"420",
                          fps: tuple[int, int] = (25, 1)) -> bytes:
    """Subsampled planar encode: y is (f, h, w); u/v at stored chroma
    resolution ((f, h/2, w/2) for C420, (f, h, w/2) for C422)."""
    if cs not in (b"420", b"422"):
        raise ValueError("cs must be b'420' or b'422'")
    f, h, w = y.shape
    want = (f, h // 2, w // 2) if cs == b"420" else (f, h, w // 2)
    for p in (u, v):
        if p.shape != want or p.dtype != np.uint8:
            raise ValueError(f"chroma plane must be uint8 {want}")
    head = b"%s W%d H%d F%d:%d Ip A1:1 C%s\n" % (
        _MAGIC, w, h, fps[0], fps[1], cs)
    parts = [head]
    for k in range(f):
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(y[k]).tobytes())
        parts.append(np.ascontiguousarray(u[k]).tobytes())
        parts.append(np.ascontiguousarray(v[k]).tobytes())
    return b"".join(parts)
