"""PNG codec in pure stdlib+numpy (RFC 2083 / ISO 15948 — public spec).

PNG's only compression is DEFLATE, which ships in the standard library
(`zlib`), so unlike JPEG there is no entropy-coding work to hand-roll: the
decoder is chunk parsing + per-scanline unfiltering (the five public filter
types, including Paeth) + layout. Supported: 8- and 16-bit depths (16-bit
maps to the 8-bit contract by taking the high byte), Adam7 interlace (the
seven passes unfilter independently and scatter into the output grid),
color types 0 (grayscale), 2 (truecolor), 3 (palette), 4 (gray+alpha), 6
(RGBA); alpha is composited over white (feature extraction wants opaque
pixels). Out of scope with explicit errors: 1/2/4-bit depths.

The encoder (`png_bytes`) writes color type 2 with filter 0 — deterministic
fixture bytes for tests and a valid PNG for any external viewer.

Scale shape: identical to the other image decoders — a per-row numpy
function behind multimodal._decode_image, executed inside narrow
mapInArrow passes. Unfiltering is a per-scanline loop (Paeth is a true
recurrence across rows), vectorized across each row's pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters. `raw` is the decompressed stream
    (h rows of 1 filter byte + stride data bytes); returns (h, stride)."""
    out = np.zeros((h, stride), np.uint8)
    rows = raw.reshape(h, stride + 1)
    for y in range(h):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-recurrences
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    v = line[x] + a
                elif ftype == 3:
                    v = line[x] + ((a + b) >> 1)
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pred
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


# Adam7 pass grid: (x0, y0, dx, dy) per pass, spec §8.2
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def decode_png(b: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PNG buffer → (width, height, rgb uint8). Alpha composited
    over white; palette expanded; grayscale replicated to RGB; 16-bit
    samples take the high byte; Adam7 passes de-interlaced."""
    if len(b) < 8 or b[:8] != _SIG:
        raise ValueError("not a PNG buffer")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    trns = None
    try:
        while pos + 8 <= len(b):
            length, ctype = struct.unpack_from(">I4s", b, pos)
            data = b[pos + 8 : pos + 8 + length]
            pos += 12 + length  # length + type + data + crc
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"PLTE":
                plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
            elif ctype == b"tRNS":
                trns = np.frombuffer(data, np.uint8)
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
    except struct.error as exc:
        raise ValueError(f"corrupt PNG stream: {exc}") from exc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth not in (8, 16):
        raise NotImplementedError(
            f"PNG bit depth {depth} not supported (8/16 only)"
        )
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if color not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color}")
    ch = _CHANNELS[color]
    bpp = ch * depth // 8
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT: {exc}") from exc

    def to_px(flat: np.ndarray, ph: int, pw: int) -> np.ndarray:
        """(ph, pw*bpp) unfiltered bytes → (ph, pw, ch) uint8 samples."""
        if depth == 8:
            return flat.reshape(ph, pw, ch)
        # 16-bit big-endian: the high byte is the 8-bit contract value
        return flat.reshape(ph, pw, ch, 2)[:, :, :, 0]

    if interlace == 0:
        stride = w * bpp
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel data length mismatch")
        px = to_px(_unfilter(raw, h, stride, bpp), h, w)
    else:  # Adam7: each pass is an independently filtered sub-image
        px = np.zeros((h, w, ch), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * bpp
            need = ph * (stride + 1)
            if off + need > len(raw):
                raise ValueError("PNG pixel data length mismatch (interlaced)")
            sub = to_px(_unfilter(raw[off : off + need], ph, stride, bpp), ph, pw)
            px[y0::dy, x0::dx] = sub
            off += need
        if off != len(raw):
            raise ValueError("PNG pixel data length mismatch (interlaced)")

    if color == 3:  # palette
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        idx = px[:, :, 0]
        rgb = plte[idx]
        if trns is not None:  # palette alpha -> composite over white
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = trns
            a = alpha[idx].astype(np.float64)[..., None] / 255.0
            rgb = np.round(rgb * a + 255.0 * (1 - a)).astype(np.uint8)
        return w, h, rgb
    if color == 0:
        return w, h, np.repeat(px, 3, axis=2)
    if color == 2:
        return w, h, px
    # 4 (gray+alpha) / 6 (rgba): composite over white
    rgb = px[:, :, :-1]
    if color == 4:
        rgb = np.repeat(rgb, 3, axis=2)
    a = px[:, :, -1].astype(np.float64)[..., None] / 255.0
    return w, h, np.round(rgb * a + 255.0 * (1 - a)).astype(np.uint8)


def png_bytes(
    rgb: np.ndarray, *, depth: int = 8, interlace: int = 0
) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w) grayscale uint8 array as PNG
    (color type 2/0, filter 0 per scanline, one zlib stream). ``depth=16``
    widens each sample to v*257 (so the decoder's high-byte mapping
    round-trips exactly); ``interlace=1`` writes Adam7 passes."""
    if rgb.ndim == 2:
        color, arr = 0, rgb[:, :, None]
    else:
        color, arr = 2, rgb
    h, w, ch = arr.shape

    def scanbytes(a: np.ndarray) -> bytes:
        ph, pw, _ = a.shape
        if depth == 8:
            flat = a.reshape(ph, pw * ch)
        elif depth == 16:
            wide = a.astype(np.uint16) * 257  # 0xAB -> 0xABAB
            flat = wide.astype(">u2").view(np.uint8).reshape(ph, pw * ch * 2)
        else:
            raise ValueError(f"unsupported encode depth {depth}")
        return np.concatenate(
            [np.zeros((ph, 1), np.uint8), flat], axis=1
        ).tobytes()

    if interlace == 0:
        raw = scanbytes(arr)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(scanbytes(sub))
        raw = b"".join(parts)
    idat = zlib.compress(raw, 9)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    return (
        _SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )
