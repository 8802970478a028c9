"""Multimodal column support: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas`` (driver north
star; the reference side analog is ClickHouse's String/binary columns +
user_files staging, Dockerfile:180-190).

The Spark-side plumbing is real — schema, partitioning, UDF signature, Arrow
batch shape.  The actual media decoding is stubbed because no image/audio
libraries ship in this container: :func:`decode_image` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder derives pseudo dimensions from the payload hash (stable across
runs/executors, good enough to exercise every seam).
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
    """STUB: decode an image payload → (width, height, format).

    Real decoding needs PIL/libvips, not available in this container.  With
    ``fake=True`` a deterministic stand-in derives dimensions from the sha256
    digest — stable everywhere, exercising the full Spark data path.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/libvips; run with fake=True for the "
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


def resize_image(
    payload: bytes, width: int, height: int, fake: bool = False
) -> bytes:
    """STUB: resize an image payload to (width, height).

    Real resizing needs PIL/libvips (absent in this container).  With
    ``fake=True`` the stand-in emits a deterministic pseudo-bitmap — a
    sha256-keyed byte stream of exactly width*height bytes — so the batch
    shapes, sizes, and downstream hashing are all real."""
    if not fake:
        raise NotImplementedError(
            "image resizing requires PIL/libvips; run with fake=True for the "
            "deterministic stand-in"
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
