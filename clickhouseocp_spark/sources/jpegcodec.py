"""Dependency-free baseline JPEG codec (ITU-T T.81, public spec) in pure
stdlib+numpy — closing the LAST multimodal decode gate: with this, every
mainstream still-image format the corpus tier handles (PNG, JPEG, BMP,
PPM/PGM) decodes for real in this container, no media library needed.

Scope (baseline sequential DCT, the profile ~all camera/web JPEGs use):

- encoder: 8-bit grayscale or RGB → JFIF 4:4:4, Annex K quantization
  tables scaled by the libjpeg quality formula, Annex K standard Huffman
  tables, byte-stuffed entropy stream
- decoder: SOF0 baseline, 1- or 3-component, arbitrary sampling factors
  (4:4:4 / 4:2:2 / 4:2:0 — chroma upsampled by pixel replication), DRI
  restart intervals, byte-stuffing removal; progressive (SOF2) and
  arithmetic coding are rejected with a clear error

The DCT is the orthonormal matrix form (C·B·Cᵀ) — one ``einsum`` over all
blocks of a component at once, so the per-image cost is a handful of BLAS
calls plus the bit-serial Huffman walk.  JPEG is lossy by design: the
round-trip contract is bounded error (quality 95 keeps a smooth gradient
within a few codes per sample), which is what the registry query pins
in-query, PSNR-style, rather than bit equality.

Used by ``sources/multimodal.decode_image`` via magic-byte dispatch
(``imagecodec.sniff_format`` returns 'JPEG' on the 0xFFD8 SOI marker +
a valid following marker byte).
"""

from __future__ import annotations

import struct

import numpy as np

# --- spec constants (ITU-T T.81 Annex K) -----------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

_QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

#: standard Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: orthonormal 8x8 DCT-II matrix: row u, col x
_DCT_M = np.array(
    [
        [
            (np.sqrt(1.0 / 8) if u == 0 else np.sqrt(2.0 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the libjpeg quality convention."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QUANT_LUM, _QUANT_CHROM):
        q = np.floor((base * scale + 50) / 100)
        out.append(np.clip(q, 1, 255))
    return out[0], out[1]


# --- Huffman code construction ---------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical per the spec's Generate_size/code."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for the bit-serial decode walk."""
    return {(l, c): s for s, (c, l) in _build_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed byte
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # EOI or other marker mid-stream: feed 1-bits (spec says the
                # stream is padded; a well-formed file never reads past EOI)
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Consume up to the RSTn marker at a restart boundary."""
        self.acc = 0
        self.n = 0
        while self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# --- encoder ---------------------------------------------------------------


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 95,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JFIF JPEG.

    ``subsampling`` is '4:4:4' (every component full resolution) or '4:2:0'
    (chroma box-averaged 2×2, the camera/web default — MCU = 4 Y blocks +
    Cb + Cr).  ``restart_interval`` > 0 emits DRI + RSTn markers every that
    many MCUs (predictors reset, stream byte-aligned) — both knobs exist so
    the decoder's general sampling/restart paths are testable against real
    streams, not just the encoder's simplest shape."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        planes = [arr.astype(np.float64) - 128.0]
        samps = [(1, 1)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "4:2:0":
            cb, cr = _box2(cb), _box2(cr)
            samps = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "4:4:4":
            samps = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    qlum, qchrom = _quality_tables(quality)
    ncomp = len(planes)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # quantized zigzag coefficient GRID per component (by, bx, 64)
    def block_grid(plane: np.ndarray, qtab: np.ndarray, sh: int, sv: int):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        bl = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ux,bcxy,vy->bcuv", _DCT_M, bl, _DCT_M)
        q = np.round(coef / qtab.reshape(8, 8)).astype(np.int64)
        return q.reshape(ph // 8, pw // 8, 64)[:, :, ZIGZAG]

    zz = [
        block_grid(p, qlum if i == 0 else qchrom, samps[i][0], samps[i][1])
        for i, p in enumerate(planes)
    ]

    dc_codes = [_build_codes(*(_DC_LUM if i == 0 else _DC_CHROM)) for i in range(ncomp)]
    ac_codes = [_build_codes(*(_AC_LUM if i == 0 else _AC_CHROM)) for i in range(ncomp)]

    out = bytearray()
    bw = _BitWriter()
    pred = [0] * ncomp

    def put_block(ci: int, blk: np.ndarray) -> None:
        diff = int(blk[0]) - pred[ci]
        pred[ci] = int(blk[0])
        s = _category(diff)
        code, ln = dc_codes[ci][s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        for k in range(1, 64):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[ci][0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_codes[ci][(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            code, ln = ac_codes[ci][0x00]  # EOB
            bw.write(code, ln)

    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                pred = [0] * ncomp
            for ci in range(ncomp):
                sh, sv = samps[ci]
                for v in range(sv):
                    for hh in range(sh):
                        put_block(ci, zz[ci][my * sv + v, mx * sh + hh])
            mcu_count += 1
    bw.flush()
    out += bw.out
    entropy = bytes(out)

    # --- markers
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    hdr = bytearray(b"\xff\xd8")  # SOI
    hdr += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    hdr += seg(0xFFDB, bytes([0]) + bytes(qlum[ZIGZAG].astype(np.uint8)))
    if ncomp == 3:
        hdr += seg(0xFFDB, bytes([1]) + bytes(qchrom[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, (samps[i][0] << 4) | samps[i][1], 0 if i == 0 else 1])
    hdr += seg(0xFFC0, sof)
    tables = [(0, 0, _DC_LUM), (1, 0, _AC_LUM)]
    if ncomp == 3:
        tables += [(0, 1, _DC_CHROM), (1, 1, _AC_CHROM)]
    for cls, tid, (bits, vals) in tables:
        hdr += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        hdr += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        tid = 0 if i == 0 else 1
        sos += bytes([i + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    hdr += seg(0xFFDA, sos)
    return bytes(hdr) + entropy + b"\xff\xd9"


def _box2(p: np.ndarray) -> np.ndarray:
    """2×2 box average (chroma downsample), edge-padded to even dims."""
    ph = (p.shape[0] + 1) // 2 * 2
    pw = (p.shape[1] + 1) // 2 * 2
    p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
    return p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))


# --- decoder ---------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 (h, w) grayscale or (h, w, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG segment header")
        (ln,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                zzq = np.frombuffer(body, dtype=np.uint8, count=64, offset=i + 1)
                tab = np.zeros(64)
                tab[ZIGZAG] = zzq
                qtabs[tid] = tab.reshape(8, 8).astype(np.float64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                htabs[(cls, tid)] = _build_decoder(bits, vals)
                i += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0}: only baseline sequential (SOF0) supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS → entropy-coded data follows
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tids = body[1 + 2 * c], body[2 + 2 * c]
                scan.append({"id": cid, "dc": tids >> 4, "ac": tids & 0xF})
            if frame is None:
                raise ValueError("SOS before SOF")
            return _decode_scan(
                data, pos, frame, scan, qtabs, htabs, restart_interval
            )
    raise ValueError("no scan data found")


def _decode_scan(data, pos, frame, scan, qtabs, htabs, restart_interval):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    # per-component coefficient planes (in blocks)
    planes = []
    for c in comps:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        planes.append(np.zeros((bh * 8, bw * 8)))
    by_id = {s["id"]: s for s in scan}
    br = _BitReader(data, pos)
    pred = [0] * len(comps)

    def decode_block(ci: int) -> np.ndarray:
        s = by_id[comps[ci]["id"]]
        dc_tab = htabs[(0, s["dc"])]
        ac_tab = htabs[(1, s["ac"])]
        blk = np.zeros(64)

        def huff(tab) -> int:
            code, ln = 0, 0
            while ln <= 16:
                code = (code << 1) | br.bit()
                ln += 1
                sym = tab.get((ln, code))
                if sym is not None:
                    return sym
            raise ValueError("invalid Huffman code in scan")

        t = huff(dc_tab)
        diff = 0
        if t:
            v = br.bits(t)
            diff = v if v >= (1 << (t - 1)) else v - (1 << t) + 1
        pred[ci] += diff
        blk[0] = pred[ci]
        k = 1
        while k < 64:
            rs = huff(ac_tab)
            r, sz = rs >> 4, rs & 0xF
            if sz == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC run past end of block")
            v = br.bits(sz)
            blk[k] = v if v >= (1 << (sz - 1)) else v - (1 << sz) + 1
            k += 1
        out = np.zeros(64)
        out[ZIGZAG] = blk
        return out.reshape(8, 8) * qtabs[comps[ci]["q"]]

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_restart()
                pred[:] = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            coefs = decode_block(ci)
                            px = _DCT_M.T @ coefs @ _DCT_M
                            y0 = (my * c["v"] + v) * 8
                            x0 = (mx * c["h"] + hh) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            except _RestartMarker:
                raise ValueError("unexpected restart marker mid-MCU") from None
            mcu_count += 1

    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci] + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[: frame["h"], : frame["w"]])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
