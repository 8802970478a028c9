"""Avro format support (SURVEY §2.1 file formats; the reference ships Avro
via its engine pin — `format_schemas/` staging, /root/reference
Dockerfile:188 — and the Kafka engine commonly pairs with it).

Spark's native path is the external ``spark-avro`` module
(``org.apache.spark:spark-avro_2.13:<spark-version>``), absent in this
container, so — exactly like :mod:`protobuf_io` — the surface here is a
dependency-free implementation of the PUBLIC Avro 1.11 spec (Object
Container Files: magic ``Obj\\x01``, metadata map with ``avro.schema``
JSON + ``avro.codec``, 16-byte sync marker, blocks of zigzag-varint-framed
binary records):

- :func:`avro_schema_json` — Avro record schema (nullable unions) derived
  from a DataFrame schema; usable directly as a ``format_schemas/`` file.
- :func:`write_avro` — one container file per partition, written from the
  executors (``mapPartitionsWithIndex``; only a (partition, row-count) pair
  returns to the driver).  Scale shape: no collect, no shuffle — the same
  layout ``df.write.format("avro")`` produces.
- :func:`read_avro` — distributed parse: ``binaryFile`` scan + per-file
  decode in ``mapInPandas``; the schema comes from the first file's header
  (one bounded driver-side open, like reading a parquet footer).
- :func:`avro_available` / jar coordinates — the gate for swapping in the
  native module when present (README documents the enable path).

When ``spark-avro`` IS on the classpath, files written here read back with
``spark.read.format("avro")`` unchanged (container format is the interop
contract) — the gated test proves it the moment a jar appears.
"""

from __future__ import annotations

import io
import json
import os
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

#: Spark simpleString type → Avro primitive type (flat records only; nested
#: arrays/maps/structs stay on the parquet path, same subset as protobuf_io)
_AVRO_TYPES = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}

_MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # deterministic sync marker (any 16 bytes is valid)

#: enable path for the native module (same Spark minor as the installed
#: pyspark; see README "Optional format jars")
SPARK_AVRO_COORDINATES = "org.apache.spark:spark-avro_2.13:{spark_version}"


def avro_schema_json(df: DataFrame, name: str = "Record", namespace: str = "chspark") -> str:
    """Avro record schema for a flat DataFrame — every field a nullable
    union, matching how Spark's own avro writer emits nullable columns."""
    fields = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t not in _AVRO_TYPES:
            raise ValueError(
                f"unsupported Avro field type {t!r} for {f.name!r} "
                "(flat primitive records only; use parquet for nested data)"
            )
        fields.append({"name": f.name, "type": ["null", _AVRO_TYPES[t]]})
    return json.dumps(
        {"type": "record", "name": name, "namespace": namespace, "fields": fields}
    )


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _enc_long(n: int) -> bytes:
    n = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _dec_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def _enc_value(avro_t: str, v) -> bytes:
    # nullable union: index 0 = null, 1 = value
    if v is None:
        return _enc_long(0)
    out = _enc_long(1)
    if avro_t in ("int", "long"):
        return out + _enc_long(int(v))
    if avro_t == "float":
        return out + struct.pack("<f", float(v))
    if avro_t == "double":
        return out + struct.pack("<d", float(v))
    if avro_t == "boolean":
        return out + (b"\x01" if v else b"\x00")
    if avro_t == "string":
        b = str(v).encode()
        return out + _enc_long(len(b)) + b
    if avro_t == "bytes":
        b = bytes(v)
        return out + _enc_long(len(b)) + b
    raise ValueError(f"unsupported avro type {avro_t}")


def _dec_value(avro_t: str, buf: io.BytesIO):
    if _dec_long(buf) == 0:
        return None
    if avro_t in ("int", "long"):
        return _dec_long(buf)
    if avro_t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if avro_t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if avro_t == "boolean":
        return buf.read(1) == b"\x01"
    if avro_t == "string":
        return buf.read(_dec_long(buf)).decode()
    if avro_t == "bytes":
        return buf.read(_dec_long(buf))
    raise ValueError(f"unsupported avro type {avro_t}")


def _header(schema_json: str) -> bytes:
    meta = {"avro.schema": schema_json.encode(), "avro.codec": b"null"}
    out = _MAGIC + _enc_long(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _enc_long(len(kb)) + kb + _enc_long(len(v)) + v
    return out + _enc_long(0) + _SYNC  # end of metadata map blocks


def write_avro(df: DataFrame, path: str) -> int:
    """Write *df* as Avro container files, one per partition, from the
    executors.  Returns the total row count (the only thing collected)."""
    schema_json = avro_schema_json(df)
    types = [_AVRO_TYPES[f.dataType.simpleString()] for f in df.schema.fields]
    os.makedirs(path, exist_ok=True)
    header = _header(schema_json)

    def write_part(idx: int, rows) -> Iterator[tuple[int, int]]:
        body = b""
        n = 0
        for row in rows:
            for t, v in zip(types, row):
                body += _enc_value(t, v)
            n += 1
        fname = os.path.join(path, f"part-{idx:05d}.avro")
        with open(fname, "wb") as f:
            f.write(header)
            if n:
                f.write(_enc_long(n) + _enc_long(len(body)) + body + _SYNC)
        yield idx, n

    counts = df.rdd.mapPartitionsWithIndex(write_part).collect()
    return sum(n for _, n in counts)


def _parse_container(data: bytes) -> tuple[str, list[tuple]]:
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file")
    schema_json = ""
    while True:
        n_entries = _dec_long(buf)
        if n_entries == 0:
            break
        for _ in range(abs(n_entries)):
            k = buf.read(_dec_long(buf)).decode()
            v = buf.read(_dec_long(buf))
            if k == "avro.schema":
                schema_json = v.decode()
    sync = buf.read(16)
    schema = json.loads(schema_json)
    types = [
        (f["type"][1] if isinstance(f["type"], list) else f["type"])
        for f in schema["fields"]
    ]
    rows: list[tuple] = []
    while True:
        first = buf.read(1)
        if not first:
            break
        buf.seek(-1, 1)
        n = _dec_long(buf)
        _dec_long(buf)  # block byte size (codec null → raw)
        for _ in range(n):
            rows.append(tuple(_dec_value(t, buf) for t in types))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema_json, rows


_AVRO_TO_SPARK = {
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
    "string": "string",
    "bytes": "binary",
}


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro read: binaryFile scan, per-file decode in
    mapInPandas.  Schema from the first file's header (bounded driver open,
    the parquet-footer analog)."""
    import pandas as pd

    first = sorted(
        f for f in os.listdir(path) if f.endswith(".avro")
    )
    if not first:
        raise ValueError(f"no .avro files under {path}")
    with open(os.path.join(path, first[0]), "rb") as f:
        head = f.read(1 << 20)
    schema = json.loads(_parse_container_header_schema(head))
    names = [f["name"] for f in schema["fields"]]
    spark_schema = ", ".join(
        f"{f['name']} {_AVRO_TO_SPARK[f['type'][1] if isinstance(f['type'], list) else f['type']]}"
        for f in schema["fields"]
    )

    files = spark.read.format("binaryFile").load(os.path.join(path, "*.avro"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                _, rows = _parse_container(bytes(content))
                yield pd.DataFrame(rows, columns=names)

    return files.select("content").mapInPandas(decode, schema=spark_schema)


def _parse_container_header_schema(data: bytes) -> str:
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file")
    while True:
        n_entries = _dec_long(buf)
        if n_entries == 0:
            return ""
        for _ in range(abs(n_entries)):
            k = buf.read(_dec_long(buf)).decode()
            v = buf.read(_dec_long(buf))
            if k == "avro.schema":
                return v.decode()


def avro_available(spark: SparkSession) -> bool:
    """True iff the external spark-avro module is registered as a data
    source (absent in this container; enable per README 'Optional format
    jars').  Uses Spark's own DataSource lookup — a bare Class.forName is
    not enough, the distribution bundles avro-* library jars without the
    spark-avro connector."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False
