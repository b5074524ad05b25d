"""Pure-python PNG codec: round-trips, filters, error paths."""

import numpy as np
import pytest

from geotiff_processor_spark.functions import png


def test_roundtrip_all_filters():
    rng = np.random.default_rng(0)
    for shape in [(8, 8), (16, 5), (1, 1), (3, 17), (32, 32)]:
        img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        for f in range(5):
            back = png.decode_png(png.encode_png(img, filter_type=f))
            assert back.shape == img.shape
            assert (back == img).all(), (shape, f)


def test_gradients_stress_filters():
    """Smooth gradients exercise the predictors' wraparound arithmetic."""
    y, x = np.mgrid[0:24, 0:31]
    img = np.stack([(x * 9) % 256, (y * 7) % 256, (x + y) % 256],
                   axis=-1).astype(np.uint8)
    for f in range(5):
        assert (png.decode_png(png.encode_png(img, f)) == img).all(), f


def test_rejects_non_png():
    with pytest.raises(ValueError, match="signature"):
        png.decode_png(b"<html><body>hi</body></html>")


def test_rejects_corrupt_crc():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    data = bytearray(png.encode_png(img))
    data[20] ^= 0xFF  # flip a byte inside IHDR body
    with pytest.raises(ValueError, match="CRC"):
        png.decode_png(bytes(data))


def test_rejects_unsupported_depth():
    import struct
    import zlib
    ihdr = struct.pack(">II5B", 4, 4, 16, 2, 0, 0, 0)  # 16-bit depth
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    with pytest.raises(ValueError, match="unsupported"):
        png.decode_png(sig + chunk(b"IHDR", ihdr) + chunk(b"IEND", b""))


def test_multiple_idat_chunks():
    """Decoders must concatenate split IDAT streams."""
    import struct
    import zlib
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    data = png.encode_png(img)
    # re-split the single IDAT into two chunks
    sig, rest = data[:8], data[8:]
    (ln,) = struct.unpack(">I", rest[:4])
    ihdr_chunk = rest[:12 + ln]
    rest2 = rest[12 + ln:]
    (ln2,) = struct.unpack(">I", rest2[:4])
    idat_body = rest2[8:8 + ln2]
    mid = len(idat_body) // 2

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    rebuilt = (sig + ihdr_chunk + chunk(b"IDAT", idat_body[:mid])
               + chunk(b"IDAT", idat_body[mid:]) + chunk(b"IEND", b""))
    assert (png.decode_png(rebuilt) == img).all()


def test_rgba_decodes():
    """Color type 6 (RGBA) path: hand-build an RGBA PNG."""
    import struct
    import zlib
    h, w = 3, 5
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    raw = bytearray()
    for yrow in img:
        raw.append(0)
        raw += yrow.tobytes()
    ihdr = struct.pack(">II5B", w, h, 8, 6, 0, 0, 0)
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    data = (sig + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))
    back = png.decode_png(data)
    assert back.shape == (h, w, 4)
    assert (back == img).all()


def test_png_gray_indexed_adam7_roundtrips():
    """Round trips across the full new option space: gray/indexed
    color types x all five filters x sequential/Adam7."""
    import numpy as np

    from geotiff_processor_spark.functions.png import (
        decode_png, encode_png, encode_png_indexed)

    rng = np.random.default_rng(21)
    for h, w in ((8, 8), (1, 1), (13, 9), (5, 31)):
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
        idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        for ft in range(5):
            for il in (False, True):
                assert (decode_png(encode_png(rgb, ft, il)) == rgb).all()
                g3 = decode_png(encode_png(gray, ft, il))
                assert (g3 == np.stack([gray] * 3, -1)).all()
                p3 = decode_png(encode_png_indexed(idx, pal, ft, il))
                assert (p3 == pal[idx.astype(np.int32)]).all()
    # indexed: out-of-range index rejected on decode
    import pytest
    small = np.array([[3]], np.uint8)
    data = bytearray(encode_png_indexed(small, pal[:4]))
    # shrink the PLTE claim: rebuild with a 2-entry palette + index 3
    with pytest.raises(ValueError, match="index out of range"):
        encode_png_indexed(small, pal[:2])
