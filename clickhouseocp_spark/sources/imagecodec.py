"""Dependency-free image codec: PNG, JPEG, uncompressed BMP, and binary
PPM/PGM in pure stdlib+numpy (all from their public specs — PNG: RFC 2083
chunk layout, zlib-deflated scanlines with the five per-row filters; JPEG:
ITU-T T.81 baseline sequential DCT in the sibling ``jpegcodec`` module;
BMP: BITMAPINFOHEADER layout, bottom-up BGR rows padded to 4 bytes;
PPM/PGM: the netpbm ``P6``/``P5`` binary headers).  No PIL/libvips in this
container, but these formats need nothing beyond ``zlib`` and numpy, so the
multimodal decode tier is REAL for every mainstream still-image format —
``sources/multimodal.decode_image`` dispatches here on magic bytes and only
falls back to the deterministic fake for payloads that are not actually
images (video containers remain the one genuinely library-bound tier).

Everything operates on ``uint8`` arrays shaped (height, width, 3) (RGB) or
(height, width) (grayscale); decoding never copies more than the pixel
block.  Resize is nearest-neighbor via integer index maps — exact, fast,
and all-numpy, which is the right primitive for thumbnail/feature-extract
plumbing at scale (a Pandas-UDF batch of these is pure C-loop work).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Sequence

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
# PNG (RFC 2083: 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: color type → samples per pixel (8-bit depth only; palette (3) unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filters: Sequence[int] | int = 0) -> bytes:
    """uint8 (h, w[, ch]) → PNG.  ch ∈ {1 gray, 2 gray+alpha, 3 RGB,
    4 RGBA}; (h, w) is treated as grayscale.  ``filters`` picks the per-row
    filter type (0-4), either one value for every row or a per-row sequence
    — useful for exercising every unfilter path in tests; 0 (None) is the
    fastest to encode and what the synthetic tier uses."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"expected (h,w[,1|2|3|4]) uint8, got {arr.shape}")
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if isinstance(filters, int):
        filters = [filters] * h
    if len(filters) != h or any(f not in range(5) for f in filters):
        raise ValueError("filters must be 0-4, one per row")
    flat = arr.reshape(h, w * ch).astype(np.int16)
    prev = np.zeros(w * ch, dtype=np.int16)
    out = bytearray()
    for y in range(h):
        row, f = flat[y], filters[y]
        out.append(f)
        out += bytes(_png_filter_row(row, prev, ch, f))
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 9))
        + _png_chunk(b"IEND", b"")
    )


def _png_filter_row(row: np.ndarray, prev: np.ndarray, bpp: int, f: int) -> np.ndarray:
    """Apply PNG filter ``f`` to one raw scanline (int16 in, uint8 out)."""
    left = np.concatenate([np.zeros(bpp, dtype=np.int16), row[:-bpp]])
    upleft = np.concatenate([np.zeros(bpp, dtype=np.int16), prev[:-bpp]])
    if f == 0:
        filt = row
    elif f == 1:  # Sub
        filt = row - left
    elif f == 2:  # Up
        filt = row - prev
    elif f == 3:  # Average
        filt = row - ((left + prev) >> 1)
    else:  # Paeth
        filt = row - _paeth(left, prev, upleft)
    return (filt % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=up-left)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 (h, w) for grayscale or (h, w, ch) otherwise.

    Supports the formats the encoder emits plus anything else 8-bit
    non-interlaced in color types 0/2/4/6 with any mix of the five row
    filters; CRCs are verified.  Unfiltering is row-sequential (the spec's
    data dependency) but vectorized along the row: None/Up are whole-row
    numpy ops; Sub is a per-lane cumulative sum; Average/Paeth walk pixels
    with numpy lane arithmetic — fine batch-side, where mapInPandas hands
    the codec whole Arrow batches and the C loops dominate."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_SIG), None, bytearray()
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack_from(">I", data, pos), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != zlib.crc32(tag + body) & 0xFFFFFFFF:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"only 8-bit gray/graya/RGB/RGBA supported (depth={depth}, "
            f"color_type={color_type})"
        )
    if comp != 0 or filt_method != 0 or interlace != 0:
        raise ValueError("unsupported PNG compression/filter/interlace method")
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline block has wrong size")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes, filt = rows[:, 0], rows[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), dtype=np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        f, row = int(ftypes[y]), filt[y]
        if f == 0:
            rec = row
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            rec = row.reshape(-1, ch).cumsum(axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (row + prev) % 256
        elif f == 3:  # Average — left-dependent, walk pixels
            rec = np.empty(stride, dtype=np.int16)
            left = np.zeros(ch, dtype=np.int16)
            for x in range(0, stride, ch):
                px = (row[x : x + ch] + ((left + prev[x : x + ch]) >> 1)) % 256
                rec[x : x + ch] = left = px
        elif f == 4:  # Paeth — left/up-left-dependent, walk pixels
            rec = np.empty(stride, dtype=np.int16)
            left = np.zeros(ch, dtype=np.int16)
            upleft = np.zeros(ch, dtype=np.int16)
            for x in range(0, stride, ch):
                up = prev[x : x + ch]
                px = (row[x : x + ch] + _paeth(left, up, upleft)) % 256
                rec[x : x + ch] = left = px
                upleft = up
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = prev = rec
    result = out.astype(np.uint8).reshape(h, w, ch)
    return result[:, :, 0] if ch == 1 else np.ascontiguousarray(result)


# ---------------------------------------------------------------------------
# dispatch + resize
# ---------------------------------------------------------------------------


def sniff_format(data: bytes) -> str | None:
    """Magic-byte sniff, strict enough that prose never matches: PNG needs
    the full 8-byte signature (which contains non-ASCII bytes — prose cannot
    collide); BMP needs ``BM`` + a known DIB header size; netpbm needs
    ``P5``/``P6`` + a digit header.  Returns 'PNG' / 'BMP' / 'PPM' / 'PGM' /
    None."""
    if data[: len(_PNG_SIG)] == _PNG_SIG:
        return "PNG"
    if len(data) >= 4 and data[:2] == b"\xff\xd8" and data[2] == 0xFF:
        return "JPEG"  # SOI + next marker prefix — prose cannot collide
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "GIF"
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
    """Decode a PNG/JPEG/BMP/PPM/PGM payload → (pixel array, format name)."""
    fmt = sniff_format(data)
    if fmt == "PNG":
        return decode_png(data), fmt
    if fmt == "JPEG":
        from clickhouseocp_spark.sources.jpegcodec import decode_jpeg

        return decode_jpeg(data), fmt
    if fmt == "GIF":
        from clickhouseocp_spark.sources.gifcodec import decode_gif

        return decode_gif(data), fmt
    if fmt == "BMP":
        return decode_bmp(data), fmt
    if fmt in ("PPM", "PGM"):
        return decode_ppm(data), fmt
    raise ValueError(
        "unrecognized image payload (supported: PNG, JPEG, GIF, BMP, PPM, PGM)"
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (pixel-center rule,
    matching the classical NN convention): all-numpy, no interpolation
    error, deterministic everywhere."""
    h, w = arr.shape[:2]
    yi = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xi = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return np.ascontiguousarray(arr[yi][:, xi])
