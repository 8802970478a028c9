"""AVI/MJPEG video-container codec — pure stdlib struct + the repo's own
JPEG codec; closes the video-container gate for the one mainstream container
that needs NO inter-frame decoder (Motion-JPEG stores every frame as an
independent baseline JPEG, which ``sources/jpegcodec`` already decodes).

AVI is a RIFF file (the public Microsoft 'AVI RIFF File Reference'):

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' — main header (µs/frame, total frames, width, height, ...)
        LIST 'strl'
          'strh' — stream header (fccType 'vids', handler 'MJPG', rate, ...)
          'strf' — BITMAPINFOHEADER (biCompression 'MJPG')
      LIST 'movi'
        '00dc' <len> <jpeg bytes>   (one chunk per frame, even-padded)
      ['idx1' index — optional; readers must work without it, we skip it]

The encoder exists to make the decoder's fixtures real files (same policy
as the PNG/JPEG/GIF/WAV tiers: synthesize with our encoder, decode with our
decoder, verify against a closed-form oracle); both ends are exercised
per-payload in the multimodal queries.  Other containers (MP4/MKV/WebM)
genuinely need ffmpeg-class inter-frame decoders and stay behind the
deterministic-fake gate.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """RGB uint8 frames (equal dims) → a minimal, spec-conformant MJPEG AVI.
    Every frame is a real baseline JPEG from ``jpegcodec.encode_jpeg``."""
    from clickhouseocp_spark.sources.jpegcodec import encode_jpeg

    if not frames:
        raise ValueError("encode_avi_mjpeg: need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("encode_avi_mjpeg: frames must share dimensions")
    jpegs = [encode_jpeg(f, quality=95, subsampling="4:2:0") for f in frames]
    max_jpeg = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_jpeg * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags (AVIF_HASINDEX off; 0x10 = AVIF_WASCAPTUREFILE-ish ok)
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_jpeg,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale, dwRate → fps frames/sec
            0,  # dwStart
            len(frames),  # dwLength
            max_jpeg,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (-1 default)
            0,  # dwSampleSize (0 = variable)
        )
        + struct.pack("<4h", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        w * h * 3,  # biSizeImage
        0, 0, 0, 0,  # XPels, YPels, ClrUsed, ClrImportant
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _dib_row_stride(width: int) -> int:
    return ((width * 3 + 3) // 4) * 4


def encode_avi_dib(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """RGB uint8 frames → an UNCOMPRESSED AVI (biCompression = BI_RGB).
    DIB frames store bottom-up BGR rows padded to 4-byte boundaries in
    '00db' chunks — the other AVI payload that needs no inter-frame
    decoder."""
    if not frames:
        raise ValueError("encode_avi_dib: need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("encode_avi_dib: frames must share dimensions")
    stride = _dib_row_stride(w)
    dibs = []
    for f in frames:
        bgr = f[::-1, :, ::-1]  # bottom-up rows, RGB→BGR
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        dibs.append(rows.tobytes())
    frame_bytes = stride * h

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_bytes * fps, 0, 0x10,
        len(frames), 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0, 0, 1, fps, 0, len(frames), frame_bytes, 0xFFFFFFFF, 0,
        )
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24,
        b"\x00\x00\x00\x00",  # biCompression = BI_RGB (uncompressed)
        frame_bytes, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00db", d) for d in dibs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_dib_frame(buf: bytes, width: int, height: int) -> np.ndarray:
    stride = _dib_row_stride(width)
    if len(buf) < stride * height:
        raise ValueError("AVI DIB frame shorter than stride*height")
    rows = np.frombuffer(buf[: stride * height], dtype=np.uint8).reshape(
        height, stride
    )
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    return bgr[::-1, :, ::-1].copy()  # bottom-up → top-down, BGR → RGB


def decode_avi_mjpeg(data: bytes):
    """AVI bytes → (width, height, fps, frames) with ``frames`` a list of
    decoded RGB uint8 arrays — ``jpegcodec.decode_jpeg`` per MJPG chunk, or
    the bottom-up BGR DIB decode for uncompressed BI_RGB streams (round 8).
    Walks the RIFF tree without requiring an idx1 index; raises ValueError
    on non-AVI input and NotImplementedError for inter-frame-coded video
    streams (those need ffmpeg-class decoders)."""
    from clickhouseocp_spark.sources.jpegcodec import decode_jpeg

    if not sniff_avi(data):
        raise ValueError("not a RIFF/AVI payload")
    width = height = n_frames = 0
    fps = 0.0
    compression = None
    frames: list[np.ndarray] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal width, height, n_frames, fps, compression
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body_start = pos + 8
            body_end = body_start + size
            if fourcc == b"LIST":
                list_type = buf[body_start : body_start + 4]
                if list_type in (b"hdrl", b"strl", b"movi"):
                    walk(buf, body_start + 4, body_end)
            elif fourcc == b"avih":
                (
                    usec, _mbps, _pad, _flags, total, _init, _nstreams, _sbuf,
                    w_, h_,
                ) = struct.unpack_from("<10I", buf, body_start)
                width, height, n_frames = w_, h_, total
                fps = 1_000_000 / usec if usec else 0.0
            elif fourcc == b"strf":
                compression = buf[body_start + 16 : body_start + 20]
            elif fourcc[2:4] in (b"dc", b"db"):
                # hdrl precedes movi in the RIFF layout, so the stream's
                # compression is known before the first frame — refuse
                # non-MJPEG/non-BI_RGB BEFORE handing bytes to a decoder
                if compression == b"\x00\x00\x00\x00":
                    # biCompression = BI_RGB: uncompressed bottom-up BGR DIB
                    frames.append(
                        _decode_dib_frame(buf[body_start:body_end], width, height)
                    )
                elif compression in (b"MJPG", b"mjpg", None):
                    frames.append(decode_jpeg(buf[body_start:body_end]))
                else:
                    raise NotImplementedError(
                        f"AVI video stream compression {compression!r} needs "
                        "ffmpeg; only MJPG and uncompressed BI_RGB decode here"
                    )
            pos = body_end + (body_end % 2)  # chunks are even-aligned

    walk(data, 12, 8 + struct.unpack_from("<I", data, 4)[0])
    if compression not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00", None):
        raise NotImplementedError(
            f"AVI video stream compression {compression!r} needs ffmpeg; "
            "only MJPG and uncompressed BI_RGB decode here"
        )
    return width, height, fps, frames
