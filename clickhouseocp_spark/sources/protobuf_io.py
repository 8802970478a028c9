"""Protobuf format support (SURVEY §2.1 file formats; the reference ships
Protobuf/Cap'n Proto schema support via `format_schemas/`, /root/reference
Dockerfile:188).

Spark's path is `from_protobuf`/`to_protobuf` (spark-protobuf module) with a
compiled descriptor-set file.  This container has neither the spark-protobuf
jar nor protoc, so the surface is availability-gated exactly like Avro and
Kafka; the wiring below is real and the test lights up when the jar appears.

``build_descriptor_set`` hand-encodes the FileDescriptorSet wire format for
flat (scalar-field) messages — protobuf's wire encoding is public and simple
(tag = field<<3 | wire-type, varints, length-delimited blobs), which keeps
schema declaration dependency-free, mirroring how the reference declares
`format_schemas/` as plain files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

#: FieldDescriptorProto.type numbers for supported scalar fields
_PB_TYPES = {
    "double": 1,
    "float": 2,
    "int64": 3,
    "int32": 5,
    "bool": 8,
    "string": 9,
    "bytes": 12,
}


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _tag(field: int, wire: int) -> bytes:
    return bytes([(field << 3) | wire])


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _vi(field: int, n: int) -> bytes:
    return _tag(field, 0) + _varint(n)


def _s(field: int, text: str) -> bytes:
    return _ld(field, text.encode())


def build_descriptor_set(
    message: str, fields: dict[str, str], package: str = "chspark"
) -> bytes:
    """Serialized FileDescriptorSet declaring one proto3 message with the
    given scalar ``fields`` (name → proto type).  Feed the bytes to a file
    and pass its path to from_protobuf/to_protobuf."""
    field_protos = b""
    for num, (name, ptype) in enumerate(fields.items(), start=1):
        if ptype not in _PB_TYPES:
            raise ValueError(f"unsupported proto type {ptype!r} for {name!r}")
        # FieldDescriptorProto: name=1, number=3, label=4 (OPTIONAL=1), type=5
        field_protos += _ld(
            2, _s(1, name) + _vi(3, num) + _vi(4, 1) + _vi(5, _PB_TYPES[ptype])
        )
    msg = _s(1, message) + field_protos  # DescriptorProto: name=1, field=2
    # FileDescriptorProto: name=1, package=2, message_type=4, syntax=12
    fdp = _s(1, f"{package}.proto") + _s(2, package) + _ld(4, msg) + _s(12, "proto3")
    return _ld(1, fdp)  # FileDescriptorSet.file = 1


def protobuf_available(spark: SparkSession) -> bool:
    """True iff the spark-protobuf module is on the classpath (absent in this
    container — availability-gated like Avro/Kafka)."""
    import os
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql.protobuf.functions import to_protobuf

    path = os.path.join(tempfile.mkdtemp(prefix="chspark_pb_"), "probe.desc")
    with open(path, "wb") as f:
        f.write(build_descriptor_set("Probe", {"x": "int64"}))
    try:
        spark.range(1).select(
            to_protobuf(F.struct(F.col("id").alias("x")), "chspark.Probe", path)
        ).collect()
        return True
    except Exception as e:
        if "PROTOBUF_NOT_LOADED" in str(e):
            return False
        raise


def to_protobuf_col(col: Column, message: str, desc_path: str) -> Column:
    from pyspark.sql.protobuf.functions import to_protobuf

    return to_protobuf(col, message, desc_path)


def from_protobuf_col(col: Column, message: str, desc_path: str) -> Column:
    from pyspark.sql.protobuf.functions import from_protobuf

    return from_protobuf(col, message, desc_path)


def protobuf_round_trip(df: DataFrame, message: str, fields: dict[str, str]) -> DataFrame:
    """Encode the given columns into one protobuf binary column and decode it
    back — the INSERT FORMAT Protobuf / SELECT FORMAT Protobuf pair."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    path = os.path.join(tempfile.mkdtemp(prefix="chspark_pb_"), "schema.desc")
    with open(path, "wb") as f:
        f.write(build_descriptor_set(message, fields))
    cols = list(fields)
    enc = df.select(to_protobuf_col(F.struct(*cols), f"chspark.{message}", path).alias("pb"))
    dec = enc.select(from_protobuf_col(F.col("pb"), f"chspark.{message}", path).alias("m"))
    return dec.select(*[F.col(f"m.{c}").alias(c) for c in cols])
