"""Multimodal column support: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas`` (driver north
star; the reference side analog is ClickHouse's String/binary columns +
user_files staging, Dockerfile:180-190).

The Spark-side plumbing is real — schema, partitioning, UDF signature, Arrow
batch shape.  Decoding is REAL for every mainstream still-image format: PNG
(stdlib zlib + numpy, all five row filters), JPEG (baseline sequential DCT —
``sources/jpegcodec``, 4:4:4/4:2:2/4:2:0 + restart intervals), uncompressed
BMP, and binary PPM/PGM (``sources/imagecodec`` — pure-stdlib codecs from
the public specs; no media libraries needed), detected by strict magic-byte
sniffing.  MJPEG/AVI video containers decode for real too (round 7 —
``sources/avicodec``: RIFF walk + per-frame JPEG).  For other payloads and
inter-frame containers (the one tier that
genuinely needs ffmpeg, absent in this container) :func:`decode_image`
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder derives pseudo dimensions from the payload hash
(stable across runs/executors, good enough to exercise every seam).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F


def attach_binary_payload(
    df: DataFrame, text_col: str, id_col: str, media_type: str = "image/fake"
) -> DataFrame:
    """Carry a binary payload column + media-type tag (in a real pipeline the
    payload arrives from object storage; here it is the utf-8 document bytes)."""
    return df.select(
        id_col,
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
    )


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, str]:
    """Decode an image payload → (width, height, format).

    REAL for PNG / JPEG / uncompressed BMP / binary PPM / PGM (pure
    stdlib+numpy codecs in ``sources/imagecodec`` + ``jpegcodec``); the
    strict magic sniff means prose bytes never reach the real decoders.
    Non-image payloads raise unless ``fake=True``, where a deterministic
    stand-in derives dimensions from the sha256 digest (stable everywhere,
    exercising the full Spark data path).
    """
    from clickhouseocp_spark.sources import imagecodec

    payload = bytes(payload)
    if imagecodec.sniff_format(payload) is not None:
        try:
            arr, fmt = imagecodec.decode_any(payload)
            return arr.shape[1], arr.shape[0], fmt
        except ValueError:
            pass  # sniff false-positive (e.g. prose starting "P5 9 9 255 ")
    from clickhouseocp_spark.sources.avicodec import decode_avi_mjpeg, sniff_avi

    if sniff_avi(payload):
        # MJPEG/AVI decodes for real (round 7); other containers below
        w, h, _fps, _frames = decode_avi_mjpeg(payload)
        return w, h, "AVI"
    if not fake:
        raise NotImplementedError(
            "payload is not PNG/JPEG/GIF/BMP/PPM/PGM/AVI(MJPEG); MP4/MKV/WebM "
            "containers require ffmpeg — run with fake=True for the "
            "deterministic stand-in decoder"
        )
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192  # 64..255 — plausible thumbnail dims
    height = 64 + digest[1] % 192
    return width, height, "FAKE"


def extract_media_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Metadata extraction over binary payloads via mapInPandas: one Arrow
    batch in, one metadata frame out — n_bytes, sha256 prefix, (fake-)decoded
    dimensions.  The iterator-of-batches shape is exactly what a real decoder
    plugs into; partitioning is inherited from the scan (no shuffle)."""
    import pandas as pd

    schema = (
        f"{id_col} long, n_bytes long, sha256_16 string, "
        "width int, height int, fmt string"
    )

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            dims = [decode_image(p, fake=True) for p in payloads]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256_16": payloads.map(
                        lambda p: hashlib.sha256(p).hexdigest()[:16]
                    ),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "fmt": [d[2] for d in dims],
                }
            )

    return df.mapInPandas(meta, schema=schema)


def sample_media_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_frames: int = 4,
) -> DataFrame:
    """Video frame-sampling plumbing: each binary payload fans out to its
    sampled frames via ``mapInPandas`` — the iterator-of-batches seam a real
    decoder (pyav/ffmpeg) plugs into.  The deterministic stand-in derives
    ``1 + n_bytes % max_frames`` frames and a sha256 frame digest of
    (payload ‖ '#' ‖ index) — stable across runs/executors AND replayable in
    plain SQL, so the fan-out is fully oracle-checkable.

    Scale shape: the fan-out happens inside the scan partition (no shuffle);
    emitted rows carry only the digest, never the frame tensor — at 100 TB a
    real pipeline would write frames columnar per partition the same way."""
    import pandas as pd

    schema = f"{id_col} long, frame_idx int, frame_sha string"

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                n = 1 + len(p) % max_frames
                for j in range(n):
                    ids.append(i)
                    idxs.append(j)
                    shas.append(
                        hashlib.sha256(p + b"#" + str(j).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_sha": shas}
            )

    return df.mapInPandas(frames, schema=schema)


def synthesize_square_wav(
    df: DataFrame, id_col: str = "doc_id", sample_rate: int = 8000
) -> DataFrame:
    """Deterministic WAV fixture generator (mapInPandas, no shuffle): per id,
    a mono int16 square wave — amplitude ±16384 (= ±0.5 full-scale exactly),
    half-period ``2 + id % 7`` frames, length ``800 + (id % 50) * 16`` frames
    — encoded as real RIFF/PCM bytes (``sources/audiocodec``).  Square waves
    make every downstream feature CLOSED-FORM (rms = peak = 0.5, zcr =
    floor((n-1)/h)/(n-1)), so the full encode→decode→feature path is
    replayable in plain SQL."""
    import numpy as np
    import pandas as pd

    from clickhouseocp_spark.sources.audiocodec import encode_wav

    schema = f"{id_col} long, payload binary, media_type string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col].values:
                i = int(i)
                n = 800 + (i % 50) * 16
                h = 2 + i % 7
                sign = 1 - 2 * ((np.arange(n) // h) % 2)
                payloads.append(
                    encode_wav((sign * 16384).astype(np.int16), sample_rate)
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": payloads,
                    "media_type": "audio/wav",
                }
            )

    return df.select(id_col).mapInPandas(gen, schema=schema)


def synthesize_gradient_bmp(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic BMP fixture generator (mapInPandas, no shuffle): per id,
    a real 24-bit BI_RGB bitmap (``sources/imagecodec.encode_bmp``) of
    ``(16 + id % 32) x (8 + id % 16)`` gradient pixels.  Dimensions and the
    exact file size (54 + padded-stride x height) are closed-form, so the
    encode→decode path is replayable in plain SQL."""
    import numpy as np
    import pandas as pd

    from clickhouseocp_spark.sources.imagecodec import encode_bmp

    schema = f"{id_col} long, payload binary, media_type string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col].values:
                i = int(i)
                w, h = 16 + i % 32, 8 + i % 16
                y, x = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [(x * 7 + i) % 256, (y * 5) % 256, (x + y) % 256], axis=2
                ).astype(np.uint8)
                payloads.append(encode_bmp(img))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": payloads,
                    "media_type": "image/bmp",
                }
            )

    return df.select(id_col).mapInPandas(gen, schema=schema)


def synthesize_gradient_png(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PNG fixture generator (mapInPandas, no shuffle): per id,
    a real zlib-deflated RGB PNG (``sources/imagecodec.encode_png``) of
    ``(16 + id % 32) x (8 + id % 16)`` pixels with ``pixel(x,y,c) =
    x + y + c`` (max 47+23+2 < 256, so no wraparound) and the row filter
    CYCLING through all five types (``y % 5``) — every unfilter path runs on
    every image.  The pixel SUM is closed-form
    (``3h·Σx + 3w·Σy + 3wh``), so the encode→decode path is value-checkable
    in plain SQL even though the compressed byte size is not."""
    import numpy as np
    import pandas as pd

    from clickhouseocp_spark.sources.imagecodec import encode_png

    schema = f"{id_col} long, payload binary, media_type string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col].values:
                i = int(i)
                w, h = 16 + i % 32, 8 + i % 16
                y, x = np.mgrid[0:h, 0:w]
                c = np.arange(3)
                img = (x[:, :, None] + y[:, :, None] + c).astype(np.uint8)
                payloads.append(
                    encode_png(img, filters=[r % 5 for r in range(h)])
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": payloads,
                    "media_type": "image/png",
                }
            )

    return df.select(id_col).mapInPandas(gen, schema=schema)


def _gradient_rgb(i: int):
    """The shared deterministic per-id test image: (16 + i%32) × (8 + i%16)
    RGB with pixel(x,y,c) = x + y + c (smooth — the shape JPEG quantization
    preserves within a few codes at quality 95)."""
    import numpy as np

    w, h = 16 + i % 32, 8 + i % 16
    y, x = np.mgrid[0:h, 0:w]
    return (x[:, :, None] + y[:, :, None] + np.arange(3)).astype(np.uint8)


def synthesize_gradient_jpeg(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic JPEG fixture generator (mapInPandas, no shuffle): per
    id, a real baseline JFIF JPEG (``sources/jpegcodec.encode_jpeg``) of the
    shared gradient image at quality 95 with 4:2:0 chroma subsampling and a
    2-MCU restart interval — the realistic camera/web shape, exercising the
    decoder's subsampled-MCU and RSTn paths on every payload."""
    import pandas as pd

    from clickhouseocp_spark.sources.jpegcodec import encode_jpeg

    schema = f"{id_col} long, payload binary, media_type string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_jpeg(
                    _gradient_rgb(int(i)),
                    quality=95,
                    subsampling="4:2:0",
                    restart_interval=2,
                )
                for i in pdf[id_col].values
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": payloads,
                    "media_type": "image/jpeg",
                }
            )

    return df.select(id_col).mapInPandas(gen, schema=schema)


def verify_image_roundtrip(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_abs_err: int = 8,
) -> DataFrame:
    """Decode binary image payloads and verify them against the shared
    per-id gradient: dimensions, format, and a bounded-error contract
    (``bounded_ok`` = max abs per-sample deviation ≤ ``max_abs_err``) — the
    lossy-codec analog of the PNG tier's exact pixel sum, value-checkable by
    a SQL oracle as a pinned TRUE.  Same scan-partition mapInPandas shape;
    only scalars leave the executor."""
    import numpy as np
    import pandas as pd

    from clickhouseocp_spark.sources.imagecodec import decode_any

    schema = (
        f"{id_col} long, width int, height int, n_channels int, "
        "fmt string, bounded_ok boolean"
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col].values, pdf[payload_col]):
                arr, fmt = decode_any(bytes(payload))
                want = _gradient_rgb(int(i))
                ok = (
                    arr.shape == want.shape
                    and int(
                        np.abs(arr.astype(np.int64) - want.astype(np.int64)).max()
                    )
                    <= max_abs_err
                )
                nch = 1 if arr.ndim == 2 else arr.shape[2]
                rows.append(
                    (int(i), arr.shape[1], arr.shape[0], nch, fmt, bool(ok))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "n_channels", "fmt", "bounded_ok",
                ],
            )

    return df.mapInPandas(verify, schema=schema)


def synthesize_gradient_gif(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic GIF fixture generator (mapInPandas, no shuffle): per
    id, a real LZW-compressed grayscale-palette GIF89a
    (``sources/gifcodec.encode_gif``) of ``(16 + id % 32) x (8 + id % 16)``
    pixels with ``pixel(x,y) = x + 2y`` (max 93 < 256 — no wraparound).
    Grayscale palettes round-trip exactly (v → rgb(v,v,v)), so the decoded
    RGB pixel sum is closed-form: ``3·(h·Σx + 2w·Σy)``."""
    import numpy as np
    import pandas as pd

    from clickhouseocp_spark.sources.gifcodec import encode_gif

    schema = f"{id_col} long, payload binary, media_type string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col].values:
                i = int(i)
                w, h = 16 + i % 32, 8 + i % 16
                y, x = np.mgrid[0:h, 0:w]
                payloads.append(encode_gif((x + 2 * y).astype(np.uint8)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": payloads,
                    "media_type": "image/gif",
                }
            )

    return df.select(id_col).mapInPandas(gen, schema=schema)


def extract_image_pixels(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Full decode over binary image payloads via mapInPandas: dimensions,
    format, channel count, and the integer pixel sum (the value-checkable
    reduction of the decoded tensor).  Same no-shuffle scan-partition shape
    as :func:`extract_media_meta`; pixels never leave the executor — only
    scalar reductions do, which is the 100 TB contract for any decode →
    feature-extract stage."""
    import numpy as np
    import pandas as pd

    from clickhouseocp_spark.sources.imagecodec import decode_any

    schema = (
        f"{id_col} long, width int, height int, n_channels int, "
        "fmt string, px_sum long"
    )

    def pixels(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col].values, pdf[payload_col]):
                arr, fmt = decode_any(bytes(payload))
                nch = 1 if arr.ndim == 2 else arr.shape[2]
                rows.append(
                    (
                        int(i),
                        arr.shape[1],
                        arr.shape[0],
                        nch,
                        fmt,
                        int(arr.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "n_channels", "fmt", "px_sum"],
            )

    return df.mapInPandas(pixels, schema=schema)


def extract_audio_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Audio metadata/feature extraction over binary payloads via
    mapInPandas: REAL for RIFF/PCM WAV (``sources/audiocodec`` — frames,
    channels, rate, duration, RMS, peak, zero-crossing rate), raising for
    compressed formats (no ffmpeg in this container).  Partitioning is
    inherited from the scan — no shuffle; only scalar features leave the
    executor, never the sample block."""
    import pandas as pd

    from clickhouseocp_spark.sources.audiocodec import audio_features, decode_wav

    schema = (
        f"{id_col} long, n_frames long, n_channels long, sample_rate long, "
        "duration_s double, rms double, peak double, zcr double"
    )

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                samples, rate = decode_wav(bytes(p))
                rows.append({id_col: i, **audio_features(samples, rate)})
            yield pd.DataFrame(rows)

    return df.mapInPandas(meta, schema=schema)


def resize_image(
    payload: bytes, width: int, height: int, fake: bool = False
) -> bytes:
    """Resize an image payload to (width, height).

    REAL for PNG/JPEG/GIF/BMP/PPM/PGM payloads: decode (``sources/imagecodec``)
    → nearest-neighbor index-map resize → re-encode in the same format, all
    stdlib+numpy.  Non-image payloads raise; with ``fake=True`` the
    stand-in emits a deterministic pseudo-bitmap — a sha256-keyed byte
    stream of exactly width*height bytes — so the batch shapes, sizes, and
    downstream hashing are all real."""
    from clickhouseocp_spark.sources import imagecodec

    payload = bytes(payload)
    fmt = imagecodec.sniff_format(payload)
    if fmt is not None:
        try:
            arr, fmt = imagecodec.decode_any(payload)
            resized = imagecodec.resize_nearest(arr, width, height)
            if fmt == "PNG":
                return imagecodec.encode_png(resized)
            if fmt == "JPEG":
                from clickhouseocp_spark.sources.jpegcodec import encode_jpeg

                return encode_jpeg(resized)
            if fmt == "GIF":
                from clickhouseocp_spark.sources.gifcodec import encode_gif

                # nearest-neighbor resize never invents colors → the
                # palette stays within the GIF limit
                return encode_gif(resized)
            if fmt == "BMP":
                return imagecodec.encode_bmp(resized)
            return imagecodec.encode_ppm(resized)
        except ValueError:
            pass  # sniff false-positive → treat as non-image below
    if not fake:
        raise NotImplementedError(
            "payload is not PNG/JPEG/GIF/BMP/PPM/PGM; MP4/MKV/WebM containers "
            "require ffmpeg — run with fake=True for the deterministic stand-in"
        )
    seed = hashlib.sha256(payload + b"@" + f"{width}x{height}".encode()).digest()
    reps = (width * height) // len(seed) + 1
    return (seed * reps)[: width * height]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch resize over binary payloads (mapInPandas, fake decoder): emits
    (id, resized payload, n_bytes) with the real Arrow batch shape."""
    import pandas as pd

    schema = f"{id_col} long, resized binary, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [resize_image(p, width, height, fake=True) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "resized": out,
                    "n_bytes": [len(b) for b in out],
                }
            )

    return df.mapInPandas(run, schema=schema)


def _gradient_frame(i: int, f: int):
    """Per-(id, frame) gradient: the shared per-id dims with a +4·frame
    brightness shift so every frame differs deterministically (bounded well
    below uint8 wrap for the fixture dims)."""
    import numpy as np

    w, h = 16 + i % 32, 8 + i % 16
    y, x = np.mgrid[0:h, 0:w]
    return (x[:, :, None] + y[:, :, None] + np.arange(3) + 4 * f).astype(
        np.uint8
    )


def synthesize_gradient_avi(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic AVI fixture generator (mapInPandas, no shuffle): per
    id, a real RIFF/AVI container holding 2 + id%3 frames of the shifted
    gradient — MJPEG (``encode_avi_mjpeg``, baseline-JPEG frames) for even
    ids, uncompressed BI_RGB DIB (``encode_avi_dib``, round 8) for odd
    ids, so both intra-frame payload tiers decode through the same RIFF
    walk."""
    import pandas as pd

    from clickhouseocp_spark.sources.avicodec import (
        encode_avi_dib,
        encode_avi_mjpeg,
    )

    schema = f"{id_col} long, payload binary, media_type string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, types = [], []
            for i in pdf[id_col].values:
                frames = [
                    _gradient_frame(int(i), f) for f in range(2 + int(i) % 3)
                ]
                enc = encode_avi_mjpeg if int(i) % 2 == 0 else encode_avi_dib
                payloads.append(enc(frames, fps=10))
                types.append(
                    "video/avi" if int(i) % 2 == 0 else "video/avi; codec=rgb"
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": payloads,
                    "media_type": types,
                }
            )

    return df.select(id_col).mapInPandas(gen, schema=schema)


def verify_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_abs_err: int = 8,
) -> DataFrame:
    """Decode MJPEG-AVI payloads and emit one row per FRAME with the
    per-frame bounded-error contract against the recomputed shifted
    gradient — the video analog of verify_image_roundtrip.  Decode runs
    inside the scan partition (mapInPandas); frame tensors never leave the
    executor, only per-frame scalars do."""
    import numpy as np
    import pandas as pd

    from clickhouseocp_spark.sources.avicodec import decode_avi_mjpeg

    schema = (
        f"{id_col} long, frame_idx int, width int, height int, "
        "n_frames int, fps double, bounded_ok boolean"
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col].values, pdf[payload_col]):
                w, h, fps, frames = decode_avi_mjpeg(bytes(payload))
                for f, arr in enumerate(frames):
                    want = _gradient_frame(int(i), f)
                    ok = (
                        arr.shape == want.shape
                        and int(
                            np.abs(
                                arr.astype(np.int64) - want.astype(np.int64)
                            ).max()
                        )
                        <= max_abs_err
                    )
                    rows.append(
                        (int(i), f, w, h, len(frames), float(fps), bool(ok))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "frame_idx", "width", "height", "n_frames",
                    "fps", "bounded_ok",
                ],
            )

    return df.mapInPandas(verify, schema=schema)
