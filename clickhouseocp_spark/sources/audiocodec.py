"""Dependency-free audio codec: PCM WAV (RIFF) in pure numpy, from the
public RIFF/WAVE spec — the audio analog of ``sources/imagecodec``.  The
container ships no audio libraries, but linear-PCM WAV is pure byte layout,
so the multimodal audio tier can be REAL for it: parse the RIFF chunk list,
read ``fmt `` (PCM 8/16/32-bit int or 32/64-bit IEEE float), and expose the
``data`` block as a (frames, channels) numpy array without copying more
than the sample block.

Compressed formats (MP3/AAC/Opus) need ffmpeg-class decoders and stay
behind the deterministic-fake gate in ``sources/multimodal``.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}
_FLOAT_DTYPES = {32: np.dtype("<f4"), 64: np.dtype("<f8")}


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(frames,) or (frames, channels) int16/float32 → PCM WAV bytes.

    float32 input is written as IEEE-float WAV (format code 3), int16 as
    classic PCM (format code 1) — both round-trip bitwise."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"expected (frames,) or (frames, channels), got {samples.shape}")
    if samples.dtype == np.float32:
        fmt_code, bits = 3, 32
        payload = np.ascontiguousarray(samples, dtype="<f4").tobytes()
    elif samples.dtype == np.int16:
        fmt_code, bits = 1, 16
        payload = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    else:
        raise ValueError(f"supported sample dtypes: int16, float32 (got {samples.dtype})")
    n_ch = samples.shape[1]
    block = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", fmt_code, n_ch, sample_rate, sample_rate * block, block, bits
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def sniff_wav(data: bytes) -> bool:
    """True iff the payload is a RIFF/WAVE container (12-byte magic check —
    prose can't collide: requires literal ``RIFF`` and ``WAVE``)."""
    return len(data) >= 44 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM/IEEE-float WAV → ((frames, channels) array, sample_rate).

    Walks the RIFF chunk list (LIST/fact/cue chunks are skipped, as the spec
    allows any chunk order before ``data``)."""
    if not sniff_wav(data):
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    fmt_code = n_ch = rate = bits = None
    samples = None
    while pos + 8 <= end:
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt " and size >= 16:
            fmt_code, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", data, body)
            if fmt_code == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                fmt_code = struct.unpack_from("<H", data, body + 24)[0]
        elif cid == b"data":
            if fmt_code is None:
                raise ValueError("WAV data chunk before fmt chunk")
            if fmt_code == 1:
                dt = _PCM_DTYPES.get(bits)
            elif fmt_code == 3:
                dt = _FLOAT_DTYPES.get(bits)
            else:
                raise ValueError(f"unsupported WAV format code {fmt_code}")
            if dt is None:
                raise ValueError(f"unsupported bit depth {bits} for format {fmt_code}")
            count = min(size, len(data) - body) // np.dtype(dt).itemsize
            count -= count % max(n_ch, 1)
            if count <= 0:
                raise ValueError("empty/truncated WAV data chunk")
            flat = np.frombuffer(data, dtype=dt, count=count, offset=body)
            samples = flat.reshape(-1, n_ch)
        pos = body + size + (size % 2)  # chunks are word-aligned
    if samples is None:
        raise ValueError("WAV has no data chunk")
    return samples, rate


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Scalar features a curation pipeline filters on — duration, RMS
    loudness, zero-crossing rate, peak — all numpy reductions (the Arrow
    batch shape makes a Pandas-UDF column of these pure C-loop work)."""
    x = samples.astype(np.float64)
    if samples.dtype == np.int16:
        x /= 32768.0
    elif samples.dtype == np.uint8:
        x = (x - 128.0) / 128.0
    mono = x.mean(axis=1)
    n = len(mono)
    zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    return {
        "n_frames": n,
        "n_channels": samples.shape[1],
        "sample_rate": int(sample_rate),
        "duration_s": round(n / sample_rate, 6),
        "rms": round(float(np.sqrt(np.mean(mono**2))), 6),
        "peak": round(float(np.abs(mono).max(initial=0.0)), 6),
        "zcr": round(zc / max(n - 1, 1), 6),
    }
