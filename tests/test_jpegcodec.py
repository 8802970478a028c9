"""Baseline JPEG codec (sources/jpegcodec, round 6): bounded-error round
trips across subsampling modes and restart intervals, exact paths for
constant blocks, dispatch through the multimodal tier, and clean rejection
of non-baseline profiles."""

import numpy as np
import pytest

from clickhouseocp_spark.sources.imagecodec import decode_any, sniff_format
from clickhouseocp_spark.sources.jpegcodec import decode_jpeg, encode_jpeg


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 3) % 256, (y * 4) % 256, ((x + y) * 2) % 256], axis=2
    ).astype(np.uint8)


def test_roundtrip_444_and_420_with_restarts():
    """Quality-95 round trips stay within a few codes per sample on smooth
    content, for every (subsampling, restart) combination — odd dimensions
    exercise MCU padding and crop."""
    img = _gradient(41, 57)
    for sub in ("4:4:4", "4:2:0"):
        for ri in (0, 3):
            back = decode_jpeg(
                encode_jpeg(img, quality=95, subsampling=sub, restart_interval=ri)
            )
            assert back.shape == img.shape
            err = np.abs(back.astype(int) - img.astype(int)).max()
            assert err <= (2 if sub == "4:4:4" else 6), (sub, ri, err)


def test_exact_paths_and_grayscale():
    """Constant-color blocks survive quantization exactly (DC-only spectrum);
    grayscale emits a 1-component stream that decodes to (h, w)."""
    c = np.full((16, 16, 3), 77, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(c, quality=90)), c)

    y, x = np.mgrid[0:24, 0:40]
    g = ((x * 2 + y) % 256).astype(np.uint8)
    gb = decode_jpeg(encode_jpeg(g, quality=95, restart_interval=2))
    assert gb.shape == g.shape
    assert np.abs(gb.astype(int) - g.astype(int)).max() <= 1


def test_sniff_dispatch_and_multimodal_gate():
    """0xFFD8+marker sniffs as JPEG; decode_any and decode_image route to
    the real decoder; resize re-encodes as JPEG."""
    from clickhouseocp_spark.sources.multimodal import decode_image, resize_image

    data = encode_jpeg(_gradient(12, 20))
    assert sniff_format(data) == "JPEG"
    arr, fmt = decode_any(data)
    assert fmt == "JPEG" and arr.shape == (12, 20, 3)
    assert decode_image(data) == (20, 12, "JPEG")

    resized = resize_image(data, 8, 6)
    arr2, fmt2 = decode_any(resized)
    assert fmt2 == "JPEG" and arr2.shape == (6, 8, 3)


def test_non_baseline_rejected():
    """Progressive (SOF2) and truncated streams raise ValueError, never
    return garbage pixels."""
    data = bytearray(encode_jpeg(_gradient(8, 8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0")
