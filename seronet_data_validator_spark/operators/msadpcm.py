"""Microsoft ADPCM WAV codec (format code 0x0002) — pure numpy, public spec.

The second ADPCM family after IMA (adpcm.py), and the other compressed
format legacy WAV corpora commonly ship in. Spec: the Microsoft WAVE
format registry for wFormatTag 0x0002 (Multimedia Programming Interface
and Data Specifications / New Multimedia Data Types update): a two-tap
linear predictor with seven published coefficient pairs carried IN the
fmt chunk, a signed 4-bit quantized error, and a per-nibble step (iDelta)
adapted through the published 16-entry table. The predictor shift is the
arithmetic ``>> 8`` every interoperable decoder uses.

Block layout (mono, ``block_align`` bytes, each block independent):
``bPredictor u8 | iDelta i16le | iSamp1 i16le | iSamp2 i16le`` then
packed 4-bit codes, HIGH nibble first (the opposite order of IMA). The
two header samples are emitted verbatim (iSamp2 first), so a block
carries ``2 + (block_align - 7) * 2`` samples.

Per nibble (signed two's-complement ``e`` in [-8, 7]):

    predictor = (samp1 * coeff1 + samp2 * coeff2) >> 8
    sample    = clamp_int16(predictor + e * delta)
    samp2, samp1 = samp1, sample
    delta     = max(16, (ADAPTATION[nibble] * delta) >> 8)

Block independence makes the decoder fully vectorizable across blocks,
exactly like adpcm.py: the state loop runs once per within-block nibble
position with every block advancing in numpy lanes — O(samples_per_block)
Python iterations per clip regardless of length.

The encoder builds fixtures and round-trip tests: it quantizes the error
to the NEAREST representable step against the same reconstruction the
decoder runs, so ``decode(encode(x))`` equals the encoder's internal
reconstruction exactly — which is what the driver contract's
recursive-CTE oracle replays sample by sample.

Reference parity: /root/reference validates metadata only; codec decode
is part of the beyond-reference audio surface (BASELINE.json input_hint).
"""

from __future__ import annotations

import struct

import numpy as np

ADAPTATION_TABLE = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230],
    dtype=np.int64,
)
#: The seven standard predictor pairs (written into, and re-read from,
#: the fmt chunk per spec).
ADAPT_COEFF1 = np.array([256, 512, 0, 192, 240, 460, 392], dtype=np.int64)
ADAPT_COEFF2 = np.array([0, -256, 0, 64, 0, -208, -232], dtype=np.int64)

_FMT_MS_ADPCM = 0x02


def samples_per_block(block_align: int) -> int:
    return 2 + (block_align - 7) * 2


def msadpcm_bytes(
    samples_i16: np.ndarray,
    sr_hz: int,
    *,
    block_align: int = 256,
    predictor: int = 0,
    initial_delta: int = 16,
) -> bytes:
    """Encode mono int16 → an MS ADPCM WAV blob (fmt 0x0002, the standard
    7-pair coefficient table in the fmt chunk, fact chunk carrying the true
    sample count, final block zero-nibble padded)."""
    s = np.asarray(samples_i16, dtype=np.int64).ravel()
    n = len(s)
    spb = samples_per_block(block_align)
    c1 = int(ADAPT_COEFF1[predictor])
    c2 = int(ADAPT_COEFF2[predictor])
    blocks = bytearray()
    pos = 0
    while pos < n:
        chunk = s[pos : pos + spb]
        samp2 = int(chunk[0])
        samp1 = int(chunk[1]) if len(chunk) > 1 else samp2
        delta = int(initial_delta)
        blocks += struct.pack("<Bhhh", predictor, delta, samp1, samp2)
        nibbles = []
        for raw in chunk[2:]:
            pred = (samp1 * c1 + samp2 * c2) >> 8
            err = int(raw) - pred
            # nearest representable step, floor-div ties-up, clamped to the
            # signed 4-bit range — any quantizer round-trips exactly, this
            # one maximizes SNR
            q = (2 * err + delta) // (2 * delta)
            q = max(-8, min(7, q))
            sample = max(-32768, min(32767, pred + q * delta))
            samp2, samp1 = samp1, sample
            nib = q & 0x0F
            delta = max(16, (int(ADAPTATION_TABLE[nib]) * delta) >> 8)
            nibbles.append(nib)
        nibbles += [0] * (spb - 2 - len(nibbles))  # pad the final block
        packed = bytearray()
        for hi, lo in zip(nibbles[0::2], nibbles[1::2]):
            packed.append((hi << 4) | lo)
        blocks += packed
        pos += spb
    byte_rate = (sr_hz * block_align + spb - 1) // spb
    coeffs = b"".join(
        struct.pack("<hh", int(a), int(b))
        for a, b in zip(ADAPT_COEFF1, ADAPT_COEFF2)
    )
    fmt = struct.pack(
        "<4sIHHIIHHHHH",
        b"fmt ", 50, _FMT_MS_ADPCM, 1, sr_hz, byte_rate, block_align, 4, 32, spb, 7,
    ) + coeffs
    fact = struct.pack("<4sII", b"fact", 4, n)
    data = struct.pack("<4sI", b"data", len(blocks))
    hdr = b"RIFF" + struct.pack(
        "<I", 4 + len(fmt) + len(fact) + len(data) + len(blocks)
    ) + b"WAVE"
    return hdr + fmt + fact + data + bytes(blocks)


def decode_msadpcm_wav(buf: bytes | np.ndarray) -> tuple[np.ndarray, int]:
    """Decode an MS ADPCM WAV blob → (mono int16 samples, sr). Walks the
    RIFF chunks (fmt/fact/data in any order), reads the coefficient table
    from the fmt chunk as the spec requires, then runs the block-parallel
    state loop."""
    b = bytes(buf) if not isinstance(buf, (bytes, bytearray)) else bytes(buf)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    pos, fmt_chunk, fact_n, data = 12, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt_chunk = body
        elif cid == b"fact" and sz >= 4:
            (fact_n,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt_chunk is None or data is None or len(fmt_chunk) < 22:
        raise ValueError("MS ADPCM WAV missing fmt/data chunk")
    tag, ch, sr, _br, block_align, bits, _cb, spb, ncoef = struct.unpack_from(
        "<HHIIHHHHH", fmt_chunk, 0
    )
    if tag != _FMT_MS_ADPCM or ch != 1 or bits != 4:
        raise ValueError(f"unsupported MS ADPCM layout {tag}/{ch}ch/{bits}-bit")
    if spb != samples_per_block(block_align):
        raise ValueError("inconsistent wSamplesPerBlock")
    if len(fmt_chunk) < 22 + 4 * ncoef or ncoef == 0:
        raise ValueError("MS ADPCM fmt chunk missing coefficient table")
    pairs = np.frombuffer(fmt_chunk, "<i2", 2 * ncoef, offset=22).astype(np.int64)
    coeff1, coeff2 = pairs[0::2].copy(), pairs[1::2].copy()
    nb = len(data) // block_align
    if nb == 0 or len(data) % block_align:
        raise ValueError("MS ADPCM data not a whole number of blocks")
    blk = np.frombuffer(data, np.uint8, nb * block_align).reshape(nb, block_align)
    bpred = np.minimum(blk[:, 0].astype(np.int64), ncoef - 1)
    c1, c2 = coeff1[bpred], coeff2[bpred]
    delta = blk[:, 1:3].copy().view("<i2").astype(np.int64).ravel()
    samp1 = blk[:, 3:5].copy().view("<i2").astype(np.int64).ravel()
    samp2 = blk[:, 5:7].copy().view("<i2").astype(np.int64).ravel()
    packed = blk[:, 7:]
    out = np.empty((nb, spb), np.int64)
    out[:, 0] = samp2
    out[:, 1] = samp1
    for j in range(spb - 2):
        byte = packed[:, j >> 1]
        nib = (byte >> 4) if (j & 1) == 0 else (byte & 0x0F)
        nib = nib.astype(np.int64)
        signed = np.where(nib >= 8, nib - 16, nib)
        pred = (samp1 * c1 + samp2 * c2) >> 8
        sample = np.clip(pred + signed * delta, -32768, 32767)
        samp2, samp1 = samp1, sample
        delta = np.maximum(16, (ADAPTATION_TABLE[nib] * delta) >> 8)
        out[:, j + 2] = sample
    flat = out.ravel()
    if fact_n is not None:
        flat = flat[:fact_n]
    return flat.astype(np.int16), int(sr)
