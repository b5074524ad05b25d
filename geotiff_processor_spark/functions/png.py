"""Pure-python/numpy PNG codec (stdlib zlib — no PIL/libjpeg needed).

Un-stubs the multimodal decode slot (round-2 verdict item 4): the
container has no image libraries, but PNG is just zlib + per-scanline
filters, both expressible with the stdlib and numpy. The encoder exists
so ``synth`` can plant REAL image payloads deterministically; the
decoder is the production path inside the ``decode_images`` Arrow
kernel.

Supported: 8-bit RGB (color type 2) and RGBA (6), non-interlaced, all
five scanline filters. Reference analog: the JPEG preview sink of
``/root/reference/export_formats/previews.py:24-39`` (there GDAL owns
the codec; here the engine does, because the 100 TB pipeline decodes in
executors where native codecs may not be installable).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal RGB8 PNG writer. ``filter_type`` applies one fixed filter
    to every scanline (0=None 1=Sub 2=Up 3=Average 4=Paeth) — non-zero
    values exist to exercise the decoder's unfilter paths in tests."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w, _ = img.shape
    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros((w, 3), np.int16)
    for y in range(h):
        row = img[y].astype(np.int16)
        left = np.zeros_like(row)
        left[1:] = row[:-1]
        if filter_type == 0:
            enc = row
        elif filter_type == 1:
            enc = row - left
        elif filter_type == 2:
            enc = row - prev
        elif filter_type == 3:
            enc = row - (left + prev) // 2
        elif filter_type == 4:
            upleft = np.zeros_like(row)
            upleft[1:] = prev[:-1]
            enc = row - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"unknown filter {filter_type}")
        raw.append(filter_type)
        raw += (enc % 256).astype(np.uint8).tobytes()
        prev = row
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=upper-left)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit RGB/RGBA PNG to (h, w, c) uint8.

    CRC-checked chunk walk, zlib inflate, then per-scanline unfilter:
    None/Up/Sub are fully vectorized (Sub is a per-channel cumsum mod
    256); Average/Paeth fall back to a per-pixel scan within the row
    (their recurrences are inherently sequential in x).
    """
    if bytes(data[:8]) != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, bytearray()
    n = len(data)
    while pos + 12 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = bytes(data[pos + 4:pos + 8])
        body = bytes(data[pos + 8:pos + 8 + length])
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">II5B", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or ctype not in (2, 6) or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={ctype}"
            f" interlace={interlace}); this codec handles 8-bit"
            " RGB/RGBA non-interlaced")
    nc = 3 if ctype == 2 else 4
    stride = w * nc
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    rows = arr[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = int(ftypes[y])
        cur = rows[y]
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: per-channel prefix sum mod 256
            rec = (cur.reshape(w, nc).cumsum(axis=0) % 256).reshape(stride)
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f in (3, 4):  # Average / Paeth: sequential in x
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = rec[x - nc] if x >= nc else 0
                b = prev[x]
                if f == 3:
                    rec[x] = (cur[x] + (a + b) // 2) % 256
                else:
                    c = prev[x - nc] if x >= nc else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                    rec[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"unknown scanline filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec.astype(np.int32)
    return out.reshape(h, w, nc)
