"""Dependency-free GIF codec (GIF87a/89a, the public W3C/CompuServe spec):
LZW-compressed palette images in pure stdlib+numpy — the last mainstream
web-corpus still format after PNG/JPEG/BMP/netpbm.

Scope:

- encoder: uint8 (h, w) images whose values index a 256-entry grayscale
  palette (v → rgb(v,v,v)) or (h, w, 3) RGB with ≤ 256 distinct colors
  (exact palette built from the data; more colors raise — palette
  quantization is a modeling choice this engine does not hide behind)
- decoder: any single-frame non-interlaced GIF87a/89a — global or local
  color table, variable LZW minimum code size, 89a extension blocks
  skipped; interlaced images and animation beyond the first frame are
  rejected with clear errors
- both directions return (h, w, 3) uint8 RGB (the palette is resolved),
  plus :func:`decode_gif_indices` for the raw palette indices

The LZW stream is bit-packed little-endian in ≤255-byte sub-blocks per the
spec; decode is a table-walk (the classic dictionary algorithm), encode
emits fresh codes greedily with the standard clear-code reset at 4096.
Used by ``sources/multimodal.decode_image`` via ``imagecodec.sniff_format``
('GIF87a'/'GIF89a' magic).
"""

from __future__ import annotations

import struct

import numpy as np


# --- LZW (variable-width, little-endian bit packing) ------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    pos = 0

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    prev: bytes | None = None
    i = 0
    while i < len(data) or nbits >= code_size:
        while nbits < code_size and i < len(data):
            acc |= data[i] << nbits
            nbits += 8
            i += 1
        if nbits < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([k]) for k in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        n = len(entry)
        if pos + n > n_pixels:
            n = n_pixels - pos  # tolerate trailing padding
        out[pos : pos + n] = np.frombuffer(entry[:n], dtype=np.uint8)
        pos += n
        if pos >= n_pixels:
            break
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if pos != n_pixels:
        raise ValueError(f"LZW stream ended early ({pos}/{n_pixels} pixels)")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    w = b""
    for v in indices.tobytes():
        wk = w + bytes([v])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:  # table full → clear and restart (the standard reset)
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = end + 1
        w = bytes([v])
    if w:
        emit(table[w])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --- container -------------------------------------------------------------


def encode_gif(arr: np.ndarray) -> bytes:
    """uint8 (h, w) grayscale (palette v → rgb(v,v,v)) or (h, w, 3) RGB
    with ≤256 distinct colors → single-frame GIF89a."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        palette = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        indices = arr
    elif arr.ndim == 3 and arr.shape[2] == 3:
        flat = arr.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(
                f"GIF palette limit: {len(colors)} distinct colors > 256 "
                "(quantize upstream; this codec never quantizes silently)"
            )
        palette = np.zeros((256, 3), dtype=np.uint8)
        palette[: len(colors)] = colors
        indices = inverse.astype(np.uint8).reshape(arr.shape[:2])
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {arr.shape}")
    h, w = indices.shape
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, 8 bits/channel, 256
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += palette.tobytes()
    out += b"," + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    min_code = 8
    out.append(min_code)
    lzw = _lzw_encode(indices.reshape(-1), min_code)
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00;"  # block terminator + trailer
    return bytes(out)


def decode_gif_indices(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """GIF → (palette (n,3) uint8, indices (h,w) uint8) of the first frame."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=n * 3, offset=pos).reshape(
            n, 3
        )
        pos += n * 3
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # 89a extension: label + sub-blocks, skip
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            palette = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                palette = np.frombuffer(
                    data, dtype=np.uint8, count=n * 3, offset=pos
                ).reshape(n, 3)
                pos += n * 3
            if palette is None:
                raise ValueError("GIF frame has no color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            indices = _lzw_decode(bytes(lzw), min_code, iw * ih).reshape(ih, iw)
            return palette, indices
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("no image frame in GIF")


def decode_gif(data: bytes) -> np.ndarray:
    """GIF → (h, w, 3) uint8 RGB (first frame, palette resolved)."""
    palette, indices = decode_gif_indices(data)
    return palette[indices]
