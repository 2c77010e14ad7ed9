"""PNG codec (operators/png.py): lossless round-trip, all five filter
types (hand-filtered streams), palette/alpha composition, error
boundaries, and the image_features integration."""

import struct
import zlib

import numpy as np
import pytest

from seronet_data_validator_spark.operators.png import (
    decode_png,
    png_bytes,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _manual_png(w, h, color, raw_scanlines: bytes, extra=b"") -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + extra
        + _chunk(b"IDAT", zlib.compress(raw_scanlines)) + _chunk(b"IEND", b"")
    )


def test_rgb_roundtrip_exact():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (21, 13, 3)).astype(np.uint8)
    w, h, out = decode_png(png_bytes(img))
    assert (w, h) == (13, 21)
    assert np.array_equal(out, img)  # PNG is lossless: bit-exact


def test_grayscale_roundtrip_exact():
    rng = np.random.default_rng(6)
    g = rng.integers(0, 256, (9, 17)).astype(np.uint8)
    _, _, out = decode_png(png_bytes(g))
    assert np.array_equal(out[:, :, 0], g)
    assert np.array_equal(out[:, :, 0], out[:, :, 2])


def test_all_filter_types_unfilter_correctly():
    """Forward-filter a known image with each filter type per scanline
    (the spec's own definitions) and require exact recovery."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (5, 8, 3)).astype(np.uint8)
    bpp, stride = 3, 8 * 3
    flat = img.reshape(5, stride).astype(np.int32)
    lines = []
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        enc = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())
    png = _manual_png(8, 5, 2, b"".join(lines))
    _, _, out = decode_png(png)
    assert np.array_equal(out, img)


def test_palette_and_alpha():
    # 2x2 palette image: indices 0..3, palette with one transparent entry
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 3])
    png = _manual_png(
        2, 2, 3, raw,
        extra=_chunk(b"PLTE", plte) + _chunk(b"tRNS", bytes([255, 255, 255, 0])),
    )
    _, _, out = decode_png(png)
    assert tuple(out[0, 0]) == (255, 0, 0)
    assert tuple(out[1, 1]) == (255, 255, 255)  # transparent -> white

    # RGBA: half-transparent red over white
    rgba = np.zeros((1, 1, 4), np.uint8)
    rgba[0, 0] = [255, 0, 0, 128]
    raw = b"\x00" + rgba.tobytes()
    _, _, out = decode_png(_manual_png(1, 1, 6, raw))
    assert tuple(out[0, 0]) == (255, 127, 127)  # 255*(1-128/255) rounds to 127


def test_error_boundaries():
    img = np.full((4, 4, 3), 9, np.uint8)
    good = png_bytes(img)
    with pytest.raises(ValueError):
        decode_png(good[:40])  # truncated
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n fake")  # signature but no chunks
    # 16-bit depth decodes since r5 (high-byte mapping): a hand-built
    # all-zero 2x2 16-bit truecolor stream yields black pixels
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png16 = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr16)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 26)) + _chunk(b"IEND", b"")
    )
    w16, h16, px16 = decode_png(png16)
    assert (w16, h16) == (2, 2) and int(px16.max()) == 0


def test_image_features_handles_png(spark):
    from seronet_data_validator_spark.operators.multimodal import image_features

    img = np.full((10, 12, 3), 60, np.uint8)
    rows = [
        ("png", bytearray(png_bytes(img))),
        ("fake", bytearray(b"\x89PNG\r\n\x1a\n fake")),
    ]
    df = spark.createDataFrame(rows, "item_id string, bytes binary")
    out = {r["item_id"]: r for r in image_features(df).collect()}
    assert (out["png"]["width"], out["png"]["height"]) == (12, 10)
    assert abs(out["png"]["mean_luma"] - 60.0) < 0.01  # lossless
    assert out["fake"]["width"] is None  # corrupt stream still quarantines


def test_adam7_interlaced_roundtrip():
    """Adam7: the seven passes unfilter independently and scatter back —
    decode(interlaced) must equal decode(sequential) pixel-for-pixel."""
    rng = np.random.default_rng(12)
    rgb = rng.integers(0, 256, (23, 17, 3), np.uint8)  # odd dims hit empty/partial passes
    w, h, seq = decode_png(png_bytes(rgb))
    w2, h2, ilaced = decode_png(png_bytes(rgb, interlace=1))
    assert (w, h) == (17, 23) == (w2, h2)
    assert np.array_equal(seq, rgb) and np.array_equal(ilaced, rgb)
    # tiny images where several passes are empty
    for dims in ((1, 1), (2, 3), (5, 4)):
        small = rng.integers(0, 256, (*dims, 3), np.uint8)
        _, _, out = decode_png(png_bytes(small, interlace=1))
        assert np.array_equal(out, small)


def test_16bit_depth_high_byte_mapping():
    """16-bit samples map to the 8-bit contract by the high byte; the
    encoder widens v -> v*257 so the round trip is exact, including
    interlaced 16-bit."""
    rng = np.random.default_rng(13)
    rgb = rng.integers(0, 256, (9, 11, 3), np.uint8)
    _, _, out = decode_png(png_bytes(rgb, depth=16))
    assert np.array_equal(out, rgb)
    _, _, out2 = decode_png(png_bytes(rgb, depth=16, interlace=1))
    assert np.array_equal(out2, rgb)
    gray = rng.integers(0, 256, (7, 5), np.uint8)
    _, _, outg = decode_png(png_bytes(gray, depth=16))
    assert np.array_equal(outg, np.repeat(gray[:, :, None], 3, axis=2))


def test_unsupported_depths_still_raise():
    import struct as _s
    import zlib as _z

    def chunk(ctype, data):
        return _s.pack(">I", len(data)) + ctype + data + _s.pack(
            ">I", _z.crc32(ctype + data) & 0xFFFFFFFF
        )

    ihdr = _s.pack(">IIBBBBB", 4, 4, 4, 0, 0, 0, 0)  # 4-bit depth
    blob = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _z.compress(b"\x00" * 12)) + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="bit depth 4"):
        decode_png(blob)
