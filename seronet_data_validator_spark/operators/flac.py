"""FLAC codec subset in pure Python+numpy (public format spec / RFC 9639).

Closes the lossless-audio-codec boundary the codec registry names
(`flac` rows carried WAV bytes until now): a native decoder for the
fixed-predictor subset of FLAC plus a matching encoder for fixtures and
round-trip tests. FLAC is lossless, so every test is bit-exact.

Supported (decode): 1-8 channels (stereo additionally via left/side,
right/side, mid/side decorrelation), every spec bit depth 4-32 (frame
header override or STREAMINFO), CONSTANT / VERBATIM / FIXED order 0-4 /
LPC order 1-32 subframes, wasted-bits shifts, Rice-coded residuals (both
4- and 5-bit parameter variants, any partition order, escape-to-raw
partitions including the nbits=0 all-zero case), UTF-8 frame numbers,
CRC-8 header verification — no remaining NotImplementedError boundary on
the decode side. The matching encoder emits fixed predictors 0-2, genuine
LPC subframes (Levinson-Durbin quantized coefficients), all three stereo
decorrelation modes, bit depths 8/12/16/20/24/32 and up to 8 independent
channels, so every decode path round-trips bit-exactly in tests.

Execution shape: like the other codecs this is a per-row decode behind
the Arrow feature passes; entropy decoding is a per-symbol Python loop —
correct for fixtures and production shapes, swapped for a codec library
at deployment behind the same dispatch (operators/audio._decode_view).
"""

from __future__ import annotations

import struct

import numpy as np

_SYNC = 0b11111111111110  # 14-bit frame sync


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 — frame header."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial 0x8005, init 0 — whole frame."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a 1

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


class _BitReader:
    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos  # byte position
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            if self.pos >= len(self.buf):
                raise ValueError("truncated FLAC stream")
            v = (v << 1) | ((self.buf[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def unary(self) -> int:
        q = 0
        while True:
            if self.pos >= len(self.buf):
                raise ValueError("truncated FLAC stream")
            byte = self.buf[self.pos]
            rem = 8 - self.bit
            chunk = byte & ((1 << rem) - 1)
            if chunk == 0:
                q += rem
                self.bit = 0
                self.pos += 1
                continue
            lead = rem - chunk.bit_length()
            q += lead
            self.bit += lead + 1
            if self.bit >= 8:
                self.bit -= 8
                self.pos += 1
            return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _zigzag_encode(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, v << 1, ((-v) << 1) - 1)


def _rice_write(w: _BitWriter, residual: np.ndarray, param: int) -> None:
    for u in _zigzag_encode(residual.astype(np.int64)):
        u = int(u)
        w.unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


def _rice_read(r: _BitReader, n: int, param: int) -> np.ndarray:
    out = np.empty(n, np.int64)
    for i in range(n):
        q = r.unary()
        u = (q << param) | (r.read(param) if param else 0)
        out[i] = (u >> 1) ^ -(u & 1)  # zigzag decode
    return out


_FIXED_COEFS = {  # order -> s[n] prediction in terms of previous samples
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    e = x.astype(np.int64)
    for _ in range(order):
        e = np.diff(e)
    return e


def _fixed_restore(warmup: np.ndarray, residual: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-k finite difference given the k warmup samples."""
    if order == 0:
        return residual
    # D^j of the warmup, j = 0..order-1; integrate from the highest order
    diffs = [warmup.astype(np.int64)]
    for _ in range(order - 1):
        diffs.append(np.diff(diffs[-1]))
    cur = residual.astype(np.int64)
    for j in range(order - 1, -1, -1):
        cur = np.cumsum(cur) + diffs[j][-1]
    return np.concatenate([warmup.astype(np.int64), cur])


def _utf8_number(n: int) -> bytes:
    """FLAC's extended UTF-8 coding of the frame number."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    n_bytes = 2
    while bits > 1 + 5 * (n_bytes - 1) + (7 - n_bytes):
        n_bytes += 1
    lead = (0xFF << (8 - n_bytes)) & 0xFF
    shift = 6 * (n_bytes - 1)
    out.append(lead | (n >> shift))
    for i in range(n_bytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    n_bytes = 0
    mask = 0x80
    while first & mask:
        n_bytes += 1
        mask >>= 1
    v = first & (mask - 1)
    for _ in range(n_bytes - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 frame number")
        v = (v << 6) | (b & 0x3F)
    return v


def _levinson(autoc: np.ndarray, order: int) -> np.ndarray:
    """Levinson-Durbin recursion: autocorrelation[0..order] → LPC coefs
    (prediction s[n] ≈ Σ a[j]·s[n-1-j]). Falls back to the fixed order-2
    predictor when the signal is degenerate (zero energy)."""
    if autoc[0] <= 0:
        return np.array([2.0, -1.0][: max(order, 1)])
    err = float(autoc[0])
    a = np.zeros(order)
    for i in range(order):
        acc = float(autoc[i + 1]) - float(np.dot(a[:i], autoc[i:0:-1]))
        k = acc / err if err > 1e-12 else 0.0
        a[: i + 1] = np.concatenate([a[:i] - k * a[i - 1 :: -1], [k]]) if i else [k]
        err *= 1.0 - k * k
        if err <= 0:
            break
    return a


def _quantize_lpc(a: np.ndarray, precision: int) -> tuple[np.ndarray, int]:
    """Quantize float LPC coefs to `precision`-bit signed ints + shift."""
    cmax = float(np.max(np.abs(a))) if len(a) else 0.0
    if cmax <= 0:
        return np.zeros(len(a), np.int64), 0
    # largest shift (≤15) keeping every coef inside the signed range
    shift = min(15, max(0, precision - 1 - int(np.floor(np.log2(cmax))) - 1))
    lim = (1 << (precision - 1)) - 1
    q = np.clip(np.round(a * (1 << shift)), -lim - 1, lim).astype(np.int64)
    return q, shift


def _lpc_residual(x: np.ndarray, coefs: np.ndarray, shift: int) -> np.ndarray:
    """Residual of the quantized-LPC predictor (exact integer arithmetic)."""
    order = len(coefs)
    n = len(x)
    if n <= order:
        return np.zeros(0, np.int64)
    # prediction for i >= order: (Σ coef[j]·x[i-1-j]) >> shift
    acc = np.zeros(n - order, np.int64)
    for j in range(order):
        acc += coefs[j] * x[order - 1 - j : n - 1 - j]
    return x[order:] - (acc >> shift)


def _lpc_restore(
    warmup: np.ndarray, residual: np.ndarray, coefs: list[int], shift: int
) -> np.ndarray:
    """Invert the LPC predictor sample-by-sample (sequential dependency)."""
    order = len(coefs)
    out = np.empty(order + len(residual), np.int64)
    out[:order] = warmup
    o = out.tolist()  # python ints: no overflow, fast scalar loop
    for i in range(order, len(out)):
        acc = 0
        for j in range(order):
            acc += coefs[j] * o[i - 1 - j]
        o[i] = residual[i - order] + (acc >> shift)
    return np.array(o, np.int64)


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v & (1 << (bits - 1)) else v


def _write_subframe(
    w: _BitWriter, blk: np.ndarray, sbps: int, *, lpc_order: int = 0
) -> None:
    """Encode one channel's block: FIXED order 0-2 by default, or a genuine
    LPC subframe when lpc_order > 0 and the block is long enough."""
    bs = len(blk)
    w.write(0, 1)  # subframe header: zero padding
    if lpc_order and bs > lpc_order:
        order = lpc_order
        xf = blk.astype(np.float64)
        autoc = np.array(
            [float(np.dot(xf[: bs - k], xf[k:])) for k in range(order + 1)]
        )
        coefs, shift = _quantize_lpc(_levinson(autoc, order), 12)
        res = _lpc_residual(blk, coefs, shift)
        w.write(0b100000 | (order - 1), 6)  # LPC subframe
        w.write(0, 1)  # no wasted bits
        for s in blk[:order]:
            w.write(int(s) & ((1 << sbps) - 1), sbps)
        w.write(12 - 1, 4)  # qlp precision - 1
        w.write(shift, 5)
        for c in coefs:
            w.write(int(c) & 0xFFF, 12)
    else:
        best_order, best_res, best_cost = 0, blk, None
        for order in range(0, 3):
            if bs <= order:
                break
            res_o = _fixed_residual(blk, order)
            cost = int(np.abs(res_o).sum())
            if best_cost is None or cost < best_cost:
                best_order, best_res, best_cost = order, res_o, cost
        order, res = best_order, best_res
        w.write(0b001000 | order, 6)  # FIXED subframe, given order
        w.write(0, 1)  # no wasted bits
        for s in blk[:order]:
            w.write(int(s) & ((1 << sbps) - 1), sbps)
    mean = float(np.mean(np.abs(res))) if len(res) else 0.0
    param = max(0, int(np.ceil(np.log2(mean + 1))) + 1)
    if param <= 14:  # 4-bit Rice (escape code 15 reserved)
        w.write(0b00, 2)
        w.write(0, 4)  # partition order 0
        w.write(param, 4)
    else:  # high bit depths: 5-bit Rice parameter (escape code 31)
        param = min(30, param)
        w.write(0b01, 2)
        w.write(0, 4)
        w.write(param, 5)
    _rice_write(w, res, param)


# frame-header bits-per-sample codes (RFC 9639 §9.1.3); 0b000 = STREAMINFO
_BPS_CODE = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110, 32: 0b111}
_BPS_FROM_CODE = {v: k for k, v in _BPS_CODE.items()}


def flac_bytes(
    samples: np.ndarray,
    sr: int,
    *,
    block_size: int = 4096,
    lpc_order: int = 0,
    stereo_mode: str = "left_side",
    bps: int = 16,
) -> bytes:
    """Encode integer samples as a FLAC stream. `samples` is 1-D (mono) or
    (n, ch) with up to 8 channels; `bps` is any spec depth 4-32 (depths
    with a frame-header code are signalled per-frame, others via
    STREAMINFO); `lpc_order` > 0 emits genuine LPC subframes
    (Levinson-Durbin, 12-bit quantized coefs) instead of FIXED 0-2;
    `stereo_mode` (2-channel input only) picks the decorrelation:
    independent / left_side / right_side / mid_side. 3+ channels always
    encode independently. Deterministic; spec-conforming CRCs."""
    if not 4 <= bps <= 32:
        raise ValueError(f"FLAC bits-per-sample must be 4-32, got {bps}")
    samples = np.asarray(samples, np.int64)
    multi = samples.ndim == 2
    n_ch = samples.shape[1] if multi else 1
    if not 1 <= n_ch <= 8:
        raise ValueError(f"FLAC supports 1-8 channels, got {n_ch}")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if samples.size and (samples.min() < lo or samples.max() > hi):
        raise ValueError(f"sample out of range for {bps}-bit encode")
    n = samples.shape[0]
    stereo = multi and n_ch == 2
    # STREAMINFO: min/max block, min/max frame (0 = unknown), sr/ch/bps/total
    si = struct.pack(">HH", min(block_size, max(n, 16)), block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (sr << 44) | ((n_ch - 1) << 41) | ((bps - 1) << 36) | n
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16  # md5 unset
    header = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si

    ch_code = {  # frame-header channel assignment + per-channel extra bit
        "independent": (0b0001, (0, 0)),
        "left_side": (0b1000, (0, 1)),
        "right_side": (0b1001, (1, 0)),
        "mid_side": (0b1010, (0, 1)),
    }
    out = bytearray(header)
    frame_no = 0
    for start in range(0, n, block_size):
        blk = samples[start : start + block_size]
        bs = blk.shape[0]
        w = _BitWriter()
        w.write(_SYNC, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed-blocksize stream
        w.write(0b0111, 4)  # blocksize: 16-bit at end of header
        w.write(0b0000, 4)  # sample rate: from STREAMINFO
        if stereo:
            code, extra = ch_code[stereo_mode]
        else:
            code, extra = n_ch - 1, (0,) * n_ch
        w.write(code, 4)
        w.write(_BPS_CODE.get(bps, 0b000), 3)
        w.write(0, 1)  # reserved
        for b in _utf8_number(frame_no):
            w.write(b, 8)
        w.write(bs - 1, 16)
        assert w.n == 0  # header fields are byte-aligned here
        w.write(_crc8(bytes(w.out)), 8)

        if stereo:
            left, right = blk[:, 0], blk[:, 1]
            if stereo_mode == "independent":
                chans = [left, right]
            elif stereo_mode == "left_side":
                chans = [left, left - right]
            elif stereo_mode == "right_side":
                chans = [left - right, right]
            else:  # mid_side
                chans = [(left + right) >> 1, left - right]
        elif multi:
            chans = [blk[:, c] for c in range(n_ch)]
        else:
            chans = [blk]
        for ch, x in enumerate(chans):
            _write_subframe(w, x, bps + extra[ch], lpc_order=lpc_order)
        w.align()
        frame = bytes(w.out)
        out += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)


def _read_subframe(r: _BitReader, bs: int, sbps: int) -> np.ndarray:
    """Decode one subframe (any type) → int64 samples of length bs."""
    r.read(1)  # zero padding
    sf_type = r.read(6)
    wasted = 0
    if r.read(1):  # wasted-bits flag: unary k-1 follows
        wasted = r.unary() + 1
        sbps -= wasted
    if sf_type == 0:  # CONSTANT
        samples = np.full(bs, _signed(r.read(sbps), sbps), np.int64)
    elif sf_type == 1:  # VERBATIM
        samples = np.array([_signed(r.read(sbps), sbps) for _ in range(bs)], np.int64)
    elif 8 <= sf_type <= 12 or sf_type >= 32:  # FIXED / LPC
        is_lpc = sf_type >= 32
        order = (sf_type & 0x1F) + 1 if is_lpc else sf_type & 0x7
        warm = np.array([_signed(r.read(sbps), sbps) for _ in range(order)], np.int64)
        if is_lpc:
            prec = r.read(4) + 1
            if prec == 16:
                raise ValueError("invalid LPC precision code 15")
            shift = _signed(r.read(5), 5)
            if shift < 0:
                raise ValueError("negative LPC shift is invalid")
            coefs = [_signed(r.read(prec), prec) for _ in range(order)]
        method = r.read(2)
        if method > 1:
            raise ValueError("reserved residual coding method")
        pbits = 4 if method == 0 else 5
        part_order = r.read(4)
        n_parts = 1 << part_order
        res_parts = []
        for p in range(n_parts):
            cnt = (bs >> part_order) - (order if p == 0 else 0)
            param = r.read(pbits)
            if param == (1 << pbits) - 1:  # escape: raw n-bit residuals
                nbits = r.read(5)
                if nbits == 0:  # all-zero partition (valid per spec)
                    res_parts.append(np.zeros(cnt, np.int64))
                else:
                    raw = np.array([r.read(nbits) for _ in range(cnt)], np.int64)
                    sign = 1 << (nbits - 1)
                    res_parts.append(np.where(raw & sign, raw - (sign << 1), raw))
            else:
                res_parts.append(_rice_read(r, cnt, param))
        residual = np.concatenate(res_parts) if res_parts else np.zeros(0, np.int64)
        if is_lpc:
            samples = _lpc_restore(warm, residual, coefs, shift)
        else:
            samples = _fixed_restore(warm, residual, order)
    else:
        raise ValueError(f"reserved subframe type {sf_type}")
    return samples << wasted if wasted else samples


def _decode_all(b: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a FLAC stream → (int64 samples shaped (n, channels), sr, bps).

    Full channel fidelity: stereo streams return both channels after
    undoing the frame's decorrelation mode; 3+ channels decode
    independently in stream order."""
    if len(b) < 42 or b[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    sr = bps = channels = None
    total = 0
    while True:
        if pos + 4 > len(b):
            raise ValueError("truncated FLAC metadata")
        hdr = b[pos]
        length = int.from_bytes(b[pos + 1 : pos + 4], "big")
        btype = hdr & 0x7F
        data = b[pos + 4 : pos + 4 + length]
        pos += 4 + length
        if btype == 0:  # STREAMINFO
            packed = int.from_bytes(data[10:18], "big")
            sr = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
        if hdr & 0x80:  # last metadata block
            break
    if sr is None:
        raise ValueError("FLAC stream without STREAMINFO")
    if not 1 <= channels <= 8 or not 4 <= bps <= 32:
        raise ValueError(f"invalid STREAMINFO: {channels}ch/{bps}-bit")

    chunks: list[np.ndarray] = []
    while pos < len(b):
        r = _BitReader(b, pos)
        sync = r.read(14)
        if sync != _SYNC:
            raise ValueError("lost FLAC frame sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        r.read(1)
        if ch_code > 0b1010:
            raise ValueError(f"reserved channel assignment {ch_code}")
        _read_utf8_number(r)
        if bs_code == 0b0110:
            bs = r.read(8) + 1
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        elif bs_code == 0b0001:
            bs = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError(f"reserved blocksize code {bs_code}")
        if sr_code == 0b1100:
            r.read(8)
        elif sr_code in (0b1101, 0b1110):
            r.read(16)
        if bps_code == 0b000:
            frame_bps = bps  # from STREAMINFO
        elif bps_code in _BPS_FROM_CODE:
            frame_bps = _BPS_FROM_CODE[bps_code]
        else:
            raise ValueError(f"reserved bits-per-sample code {bps_code}")
        hdr_end = r.pos  # byte-aligned by construction of the header fields
        expect = r.read(8)
        if expect != _crc8(b[pos:hdr_end]):
            raise ValueError("FLAC frame header CRC mismatch")

        if ch_code <= 0b0111:  # 1-8 independent channels
            n_frame_ch = ch_code + 1
            subs = [_read_subframe(r, bs, frame_bps) for _ in range(n_frame_ch)]
            frame = np.stack(subs, axis=1)
        else:  # stereo decorrelation: the side channel carries one extra bit
            extra = (0, 1) if ch_code in (0b1000, 0b1010) else (1, 0)
            c0 = _read_subframe(r, bs, frame_bps + extra[0])
            c1 = _read_subframe(r, bs, frame_bps + extra[1])
            if ch_code == 0b1000:  # left/side
                left, right = c0, c0 - c1
            elif ch_code == 0b1001:  # right/side
                left, right = c1 + c0, c1
            else:  # mid/side
                m = (c0 << 1) | (c1 & 1)
                left, right = (m + c1) >> 1, (m - c1) >> 1
            frame = np.stack([left, right], axis=1)
        r.align()
        crc = struct.unpack_from(">H", b, r.pos)[0]
        if crc != _crc16(b[pos : r.pos]):
            raise ValueError("FLAC frame CRC mismatch")
        pos = r.pos + 2
        chunks.append(frame)

    out = (
        np.concatenate(chunks)
        if chunks
        else np.zeros((0, channels or 1), np.int64)
    )
    if total:
        out = out[:total]
    lim = 1 << (bps - 1)
    if np.any(out >= lim) or np.any(out < -lim):
        raise ValueError(f"decoded sample out of {bps}-bit range")
    return out, int(sr), int(bps)


def decode_flac_full(b: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream → (samples shaped (n, channels), sr) at native
    bit depth: int16 for depths ≤16, int32 above. Samples are NOT
    renormalized — a 24-bit stream returns its raw 24-bit integers."""
    out, sr, bps = _decode_all(b)
    return out.astype(np.int32 if bps > 16 else np.int16), sr


def decode_flac(b: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream → (mono int16 samples, sr) — the engine's
    audio-contract shape (operators/audio._decode_view). Mono 16-bit
    streams are bit-exact; multichannel streams downmix deterministically
    as the floor-shift mean of the exact integer channel sum (for stereo:
    (L+R)>>1); non-16-bit depths rescale by a power of two (>> for deeper,
    << for shallower), all before any dtype narrowing."""
    full, sr, bps = _decode_all(b)
    n_ch = full.shape[1]
    mix = full[:, 0] if n_ch == 1 else full.sum(axis=1) // n_ch
    if bps > 16:
        mix = mix >> (bps - 16)
    elif bps < 16:
        mix = mix << (16 - bps)
    return mix.astype(np.int16), sr
