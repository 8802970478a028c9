"""Pure-numpy RIFF/PCM WAV codec + the real audio tier end-to-end."""

import numpy as np
import pytest

from clickhouseocp_spark.sources.audiocodec import (
    audio_features,
    decode_wav,
    encode_wav,
    sniff_wav,
)


def test_wav_int16_stereo_round_trip():
    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32767, size=(1000, 2), dtype=np.int16)
    data = encode_wav(samples, 44100)
    assert sniff_wav(data)
    back, rate = decode_wav(data)
    assert rate == 44100 and back.dtype == np.int16
    assert np.array_equal(back, samples)


def test_wav_float32_mono_round_trip_and_odd_padding():
    x = np.sin(np.linspace(0, 20, 321)).astype(np.float32)  # odd byte count? no
    data = encode_wav(x, 16000)
    back, rate = decode_wav(data)
    assert rate == 16000 and back.shape == (321, 1)
    assert np.array_equal(back[:, 0], x)
    # odd-length data chunk (uint8 path not supported for encode; fake by
    # int16 frame count 1 channel x odd frames → even bytes; instead check
    # the chunk walker skips a LIST chunk before data)
    lst = b"LIST" + (7).to_bytes(4, "little") + b"INFOabc" + b"\x00"
    patched = data[:12] + lst + data[12:]
    import struct

    patched = (
        b"RIFF"
        + struct.pack("<I", len(patched) - 8)
        + patched[8:]
    )
    back2, _ = decode_wav(patched)
    assert np.array_equal(back2, back)


def test_wav_rejects_prose_and_truncation():
    assert not sniff_wav(b"RIFF raffle WAVEforms are fun" )  # len < 44 → False
    assert not sniff_wav(b"x" * 100)
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all, just bytes" * 4)
    good = encode_wav(np.zeros(64, dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        decode_wav(good[:40])


def test_audio_features_closed_form_square_wave():
    # ±0.5 full-scale square wave, half-period 3, 97 frames
    n, h = 97, 3
    sign = 1 - 2 * ((np.arange(n) // h) % 2)
    feats = audio_features((sign * 16384).astype(np.int16)[:, None], 8000)
    assert feats["n_frames"] == n and feats["n_channels"] == 1
    assert feats["rms"] == 0.5 and feats["peak"] == 0.5
    assert feats["duration_s"] == round(n / 8000, 6)
    assert feats["zcr"] == round(((n - 1) // h) / (n - 1), 6)


def test_audio_meta_through_spark(spark):
    from clickhouseocp_spark.sources.multimodal import (
        extract_audio_meta,
        synthesize_square_wav,
    )

    base = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    wavs = synthesize_square_wav(base)
    meta = {r.doc_id: r for r in extract_audio_meta(wavs).collect()}
    assert len(meta) == 30
    for i in (0, 13, 29):
        n = 800 + (i % 50) * 16
        h = 2 + i % 7
        r = meta[i]
        assert r.n_frames == n and r.sample_rate == 8000 and r.n_channels == 1
        assert r.rms == 0.5 and r.peak == 0.5
        assert r.zcr == round(((n - 1) // h) / (n - 1), 6)
