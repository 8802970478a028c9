"""Dependency-free image codec: uncompressed BMP and binary PPM/PGM in pure
numpy (both formats from their public specs — BMP: BITMAPINFOHEADER layout,
bottom-up BGR rows padded to 4 bytes; PPM/PGM: the netpbm ``P6``/``P5``
binary headers).  No PIL/libvips in this container, but these two formats
need nothing beyond byte slicing, so the multimodal decode tier can be REAL
for them — ``sources/multimodal.decode_image`` dispatches here on magic
bytes and only falls back to the deterministic fake for payloads that are
not actually images.

Everything operates on ``uint8`` arrays shaped (height, width, 3) (RGB) or
(height, width) (grayscale); decoding never copies more than the pixel
block.  Resize is nearest-neighbor via integer index maps — exact, fast,
and all-numpy, which is the right primitive for thumbnail/feature-extract
plumbing at scale (a Pandas-UDF batch of these is pure C-loop work).
"""

from __future__ import annotations

import struct

import numpy as np

_DIB_SIZES = (40, 52, 56, 108, 124)  # BITMAPINFOHEADER and the V4/V5 family


# ---------------------------------------------------------------------------
# PPM / PGM (netpbm binary)
# ---------------------------------------------------------------------------


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (h, w, 3) → binary PPM (``P6``), or (h, w) → PGM (``P5``)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (h,w,3) or (h,w) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def _ppm_header_tokens(data: bytes, n: int) -> tuple[list[int], int]:
    """Parse ``n`` whitespace-separated ints after the magic, skipping
    ``#`` comments; returns (values, offset-just-past-final-whitespace)."""
    vals: list[int] = []
    i = 2
    while len(vals) < n:
        if i >= len(data):
            raise ValueError("truncated netpbm header")
        c = data[i : i + 1]
        if c == b"#":  # comment to end of line
            j = data.find(b"\n", i)
            i = len(data) if j < 0 else j + 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(data) and data[j : j + 1].isdigit():
                j += 1
            vals.append(int(data[i:j]))
            i = j
        else:
            raise ValueError(f"bad netpbm header byte {c!r}")
    if i >= len(data) or not data[i : i + 1].isspace():
        raise ValueError("netpbm header must end in single whitespace")
    return vals, i + 1


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (``P6``) → (h, w, 3) uint8; PGM (``P5``) → (h, w)."""
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    (w, h, maxval), off = _ppm_header_tokens(data, 3)
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    if px.size != need:
        raise ValueError("truncated netpbm pixel block")
    return px.reshape((h, w, 3)) if ch == 3 else px.reshape((h, w))


# ---------------------------------------------------------------------------
# BMP (uncompressed 24/32-bit BI_RGB)
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 RGB (h, w, 3) → 24-bit BI_RGB BMP (bottom-up, rows padded to 4)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h,w,3) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pixels = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + dib + pixels


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP → (h, w, 3) uint8 RGB.

    Handles bottom-up (positive height, the overwhelmingly common layout)
    and top-down (negative height) row order."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    dib = struct.unpack_from("<I", data, 14)[0]
    if dib not in _DIB_SIZES:
        raise ValueError(f"unsupported DIB header size {dib}")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"only uncompressed 24/32-bit BI_RGB supported (bpp={bpp}, "
            f"compression={compression})"
        )
    h = abs(h_signed)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    need = stride * h
    raw = np.frombuffer(data, dtype=np.uint8, count=need, offset=pix_off)
    if raw.size != need:
        raise ValueError("truncated BMP pixel block")
    rows = raw.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if h_signed > 0:  # bottom-up → flip to natural row order
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, 2::-1])  # BGR(A) → RGB


# ---------------------------------------------------------------------------
# dispatch + resize
# ---------------------------------------------------------------------------


def sniff_format(data: bytes) -> str | None:
    """Magic-byte sniff, strict enough that prose never matches: BMP needs
    ``BM`` + a known DIB header size; netpbm needs ``P5``/``P6`` + a digit
    header.  Returns 'BMP' / 'PPM' / 'PGM' / None."""
    if len(data) >= 54 and data[:2] == b"BM":
        if struct.unpack_from("<I", data, 14)[0] in _DIB_SIZES:
            return "BMP"
    if len(data) > 3 and data[:2] in (b"P6", b"P5") and data[2:3].isspace():
        try:
            _ppm_header_tokens(data, 3)
        except ValueError:
            return None
        return "PPM" if data[:2] == b"P6" else "PGM"
    return None


def decode_any(data: bytes) -> tuple[np.ndarray, str]:
    """Decode a BMP/PPM/PGM payload → (pixel array, format name)."""
    fmt = sniff_format(data)
    if fmt == "BMP":
        return decode_bmp(data), fmt
    if fmt in ("PPM", "PGM"):
        return decode_ppm(data), fmt
    raise ValueError("unrecognized image payload (supported: BMP, PPM, PGM)")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (pixel-center rule,
    matching the classical NN convention): all-numpy, no interpolation
    error, deterministic everywhere."""
    h, w = arr.shape[:2]
    yi = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xi = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return np.ascontiguousarray(arr[yi][:, xi])
