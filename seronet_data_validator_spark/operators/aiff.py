"""AIFF and AU (Sun/NeXT) audio containers in pure stdlib+numpy.

Two more public uncompressed-audio interchange formats join the decode
dispatch (operators/audio._decode_view), so a corpus mixing WAV, FLAC,
AIFF and AU clips validates through one pipeline. Both are published
specs: AIFF-C is Apple's EA IFF 85 profile ("FORM"/"AIFF" chunks, COMM +
SSND, big-endian PCM, sample rate as an 80-bit IEEE 754 extended float);
AU is the Sun ".snd" header (six big-endian u32 fields) over big-endian
PCM or G.711 µ-law payloads. PCM in both is a byte-order transpose of
the WAV path — lossless, so every lane carries bit-exact value checks.

Supported: AIFF PCM 8/16/24-bit, 1-8 channels; AU encodings 1 (µ-law),
2 (8-bit linear), 3 (16-bit linear), 4 (24-bit linear), 1-8 channels.
The matching encoders emit canonical minimal files for fixtures and the
driver value oracles. Depth mapping onto the engine's int16 mono
contract matches the WAV/FLAC convention: floor-mean downmix of the
exact integer channel sum, then a power-of-two rescale.
"""

from __future__ import annotations

import struct

import numpy as np


def _f80_encode(v: int) -> bytes:
    """Integer → 80-bit IEEE extended float (sign/15-bit exp/64-bit
    mantissa with explicit leading 1) — AIFF's sampleRate field."""
    if v <= 0:
        raise ValueError("sample rate must be positive")
    e = v.bit_length() - 1
    mant = v << (63 - e)
    return struct.pack(">H", 16383 + e) + struct.pack(">Q", mant)


def _f80_decode(b: bytes) -> int:
    """80-bit extended float → nearest integer (sample rates are whole)."""
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    if se & 0x8000:
        raise ValueError("negative AIFF sample rate")
    e = se - 16383
    if not 0 <= e <= 63:
        raise ValueError(f"AIFF sample rate exponent {e} out of range")
    # mantissa has the binary point after bit 63; shift back down
    return int(round(mant / (1 << (63 - e))))


def aiff_bytes(samples: np.ndarray, sr: int, *, bits: int = 16) -> bytes:
    """Encode integer samples ((n,) mono or (n, ch)) as a canonical AIFF
    file: COMM then SSND, big-endian PCM at ``bits`` ∈ {8, 16, 24}."""
    samples = np.asarray(samples, np.int64)
    ch = samples.shape[1] if samples.ndim == 2 else 1
    if not 1 <= ch <= 8:
        raise ValueError(f"AIFF encoder supports 1-8 channels, got {ch}")
    if bits not in (8, 16, 24):
        raise ValueError(f"unsupported AIFF bit depth {bits}")
    lim = 1 << (bits - 1)
    if samples.size and (samples.min() < -lim or samples.max() > lim - 1):
        raise ValueError(f"sample out of range for {bits}-bit AIFF")
    n_frames = samples.shape[0]
    flat = samples.reshape(-1)
    if bits == 8:
        data = flat.astype(">i1").tobytes()
    elif bits == 16:
        data = flat.astype(">i2").tobytes()
    else:
        u = (flat & 0xFFFFFF).astype(np.uint32)
        b3 = np.empty((len(flat), 3), np.uint8)
        b3[:, 0] = (u >> 16) & 0xFF
        b3[:, 1] = (u >> 8) & 0xFF
        b3[:, 2] = u & 0xFF
        data = b3.tobytes()
    comm = (
        b"COMM"
        + struct.pack(">i", 18)
        + struct.pack(">hIh", ch, n_frames, bits)
        + _f80_encode(int(sr))
    )
    ssnd = b"SSND" + struct.pack(">iII", 8 + len(data), 0, 0) + data
    if len(ssnd) % 2:
        ssnd += b"\x00"  # IFF chunks pad to even length
    body = b"AIFF" + comm + ssnd
    return b"FORM" + struct.pack(">i", len(body)) + body


def decode_aiff(b: bytes) -> tuple[np.ndarray, int, int]:
    """Decode an AIFF file → (int64 samples shaped (n, ch) at native
    depth, sr, bits). Walks IFF chunks generically (even-padded), requires
    COMM before interpreting SSND per the spec's one-of-each rule."""
    if len(b) < 12 or b[:4] != b"FORM" or b[8:12] != b"AIFF":
        raise ValueError("not an AIFF file")
    pos = 12
    ch = bits = sr = n_frames = None
    sound: bytes | None = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack(">i", b[pos + 4 : pos + 8])
        if size < 0 or pos + 8 + size > len(b):
            raise ValueError("truncated AIFF chunk")
        payload = b[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
        if cid == b"COMM":
            if size < 18:
                raise ValueError("short COMM chunk")
            ch, n_frames, bits = struct.unpack(">hIh", payload[:8])
            sr = _f80_decode(payload[8:18])
        elif cid == b"SSND":
            offset, _block = struct.unpack(">II", payload[:8])
            sound = payload[8 + offset :]
    if ch is None or sound is None:
        raise ValueError("AIFF missing COMM or SSND chunk")
    if not 1 <= ch <= 8 or bits not in (8, 16, 24):
        raise ValueError(f"unsupported AIFF shape {ch}ch/{bits}-bit")
    need = n_frames * ch * (bits // 8)
    if len(sound) < need:
        raise ValueError("AIFF sound data shorter than declared frames")
    if bits == 8:
        flat = np.frombuffer(sound, ">i1", count=n_frames * ch).astype(np.int64)
    elif bits == 16:
        flat = np.frombuffer(sound, ">i2", count=n_frames * ch).astype(np.int64)
    else:
        raw = (
            np.frombuffer(sound, np.uint8, count=need)
            .reshape(-1, 3)
            .astype(np.int64)
        )
        flat = (raw[:, 0] << 16) | (raw[:, 1] << 8) | raw[:, 2]
        flat = np.where(flat & 0x800000, flat - (1 << 24), flat)
    return flat.reshape(-1, ch), int(sr), int(bits)


AU_ULAW = 1
AU_PCM8 = 2
AU_PCM16 = 3
AU_PCM24 = 4


def au_bytes(samples: np.ndarray, sr: int, *, encoding: int = AU_PCM16) -> bytes:
    """Encode integer samples ((n,) mono or (n, ch)) as a Sun AU file.
    PCM encodings take linear samples at the encoding's depth; µ-law
    (encoding 1) takes already-companded uint8 code bytes."""
    samples = np.asarray(samples, np.int64)
    ch = samples.shape[1] if samples.ndim == 2 else 1
    if not 1 <= ch <= 8:
        raise ValueError(f"AU encoder supports 1-8 channels, got {ch}")
    flat = samples.reshape(-1)
    if encoding == AU_PCM16:
        data = flat.astype(">i2").tobytes()
    elif encoding == AU_PCM8:
        data = flat.astype(">i1").tobytes()
    elif encoding == AU_PCM24:
        u = (flat & 0xFFFFFF).astype(np.uint32)
        b3 = np.empty((len(flat), 3), np.uint8)
        b3[:, 0] = (u >> 16) & 0xFF
        b3[:, 1] = (u >> 8) & 0xFF
        b3[:, 2] = u & 0xFF
        data = b3.tobytes()
    elif encoding == AU_ULAW:
        data = flat.astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported AU encoding {encoding}")
    hdr = struct.pack(">4sIIIII", b".snd", 24, len(data), encoding, int(sr), ch)
    return hdr + data


def decode_au(b: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a Sun AU file → (int64 samples shaped (n, ch) at native
    depth, sr, bits). µ-law expands through the shared G.711 table (16-bit
    lane). Honors a data size of 0xFFFFFFFF (unknown → rest of file)."""
    if len(b) < 24 or b[:4] != b".snd":
        raise ValueError("not an AU file")
    offset, size, encoding, sr, ch = struct.unpack(">IIIII", b[4:24])
    if offset < 24 or offset > len(b):
        raise ValueError("bad AU data offset")
    if not 1 <= ch <= 8:
        raise ValueError(f"unsupported AU channel count {ch}")
    data = b[offset:]
    if size != 0xFFFFFFFF:
        if size > len(data):
            raise ValueError("truncated AU payload")
        data = data[:size]
    if encoding == AU_PCM16:
        n = len(data) // 2 // ch * ch
        flat = np.frombuffer(data, ">i2", count=n).astype(np.int64)
        bits = 16
    elif encoding == AU_PCM8:
        n = len(data) // ch * ch
        flat = np.frombuffer(data, ">i1", count=n).astype(np.int64)
        bits = 8
    elif encoding == AU_PCM24:
        n = len(data) // 3 // ch * ch
        raw = np.frombuffer(data, np.uint8, count=n * 3).reshape(-1, 3).astype(np.int64)
        flat = (raw[:, 0] << 16) | (raw[:, 1] << 8) | raw[:, 2]
        flat = np.where(flat & 0x800000, flat - (1 << 24), flat)
        bits = 24
    elif encoding == AU_ULAW:
        from seronet_data_validator_spark.operators.audio import _ULAW_TABLE

        n = len(data) // ch * ch
        flat = _ULAW_TABLE[np.frombuffer(data, np.uint8, count=n)].astype(np.int64)
        bits = 16
    else:
        raise ValueError(f"unsupported AU encoding {encoding}")
    return flat.reshape(-1, ch), int(sr), bits
