"""Pure-python/numpy RIFF/WAVE PCM codec (stdlib struct only).

Completes the multimodal decode family (PNG: ``functions/png.py``,
JPEG: ``functions/jpeg.py``): the "riff" magic slot in
``operators/multimodal.py`` was a fake-decoder stub; WAV is just a
chunked RIFF header around raw PCM, so the real thing costs less than
the fake. Reference analog: the reference shells out to GDAL for all
codec work (e.g. previews, ``/root/reference/export_formats/
previews.py:24-39``); this engine owns its codecs because a 100 TB
pipeline decodes in executors where native libraries may not be
installable.

Supported: PCM (format tag 1), 16-bit signed little-endian samples,
any sample rate / channel count. Raises on compressed/float formats
(the ffmpeg slot, documented like the PNG/JPEG codec limits).

Decoding is exact (PCM is lossless), so planted payloads whose samples
derive from an integer formula are end-to-end oracle-checkable: DuckDB
recomputes amplitude statistics straight from the formula while the
engine parses the actual bytes.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """(n,) mono or (n, ch) int16 samples -> RIFF/WAVE PCM16 bytes."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()  # interleaved frames
    byte_rate = sample_rate * ch * 2
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate,
                      block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 bytes -> (sample_rate, (n, ch) int16 array).

    Chunk-walks the RIFF container (unknown chunks are skipped, like
    the PNG decoder's ancillary chunks), so files with LIST/INFO or
    fact chunks from other writers decode too.
    """
    if bytes(data[:4]) != b"RIFF" or bytes(data[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos = 12
    fmt = None
    pcm = None
    n = min(len(data), riff_len + 8)
    while pos + 8 <= n:
        tag = bytes(data[pos:pos + 4])
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = bytes(data[pos + 8:pos + 8 + clen])
        if tag == b"fmt ":
            if clen < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    tag_fmt, ch, rate, _byte_rate, _block, bits = fmt
    if tag_fmt != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV (format={tag_fmt} bits={bits}); this codec"
            " handles 16-bit PCM (the ffmpeg slot)")
    arr = np.frombuffer(pcm[: (len(pcm) // (2 * ch)) * 2 * ch], "<i2")
    return rate, arr.reshape(-1, ch)
