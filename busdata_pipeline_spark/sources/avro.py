"""Avro object-container source/sink without the spark-avro connector.

The reference archives raw records as JSON files and the repo mirrors
that plus ORC/parquet round trips (plans/formats.py); Avro is the one
row-format leg the container cannot run because the spark-avro
DataSource is a separate jar (org.apache.spark:spark-avro) that is NOT
bundled with pyspark.  Rather than leave the format module-gated, this
implements the Avro 1.x object-container format (the public spec:
https://avro.apache.org/docs/current/specification/) directly:

- ``write_avro(df, path)`` — each partition serializes itself to one
  container file via ``mapInPandas`` (the multimodal codecs' pattern:
  real bytes through Arrow batches, no driver funnel).  Zigzag-varint
  longs, little-endian IEEE doubles, length-prefixed UTF-8, nullable
  fields as ``["null", T]`` unions.  Multi-block files with a BOUNDED
  per-task buffer (blocks flush at 4096 rows / 1 MiB — a 10 GB
  partition never materializes in memory), ``null`` or ``deflate``
  (RFC 1951 raw deflate, stdlib zlib) block codecs.
- ``read_avro(spark, path)`` — distributed decode over the built-in
  ``binaryFile`` source (one task per container file; production-grade
  sync-marker splitting is what the connector jar is for — the gate
  below prefers it when installed).

Conformance is tested against the OFFICIAL Java Avro library, which IS
on Spark's classpath (avro-*.jar ships with Spark core): files written
here are read back through ``org.apache.avro.file.DataFileReader`` via
the JVM gateway, and files written by the Java library are read here —
both directions pinned in tests/test_avro.py, so this is the real
format, not a lookalike.

Supported Spark types: long/int, double/float, string, boolean, binary,
date (Avro ``int``/``date`` logical type), timestamp (Avro ``long``/
``timestamp-micros``) — the scalar lattice every table in TESTDATA.md
uses.  Arrays/structs route through the connector jar when present.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"
_SYNC = b"\x9bSPARKGRAFTAVRO\x9b"  # 16 bytes, fixed => deterministic files
assert len(_SYNC) == 16


def avro_format(spark: SparkSession) -> str | None:
    """The usable Avro DataSource format string, or None.

    Spark bundles the avro CLASSES in this container but not the
    short-name service registration, so ``format("avro")`` raises while
    the fully-qualified ``AvroFileFormat`` works — probe the class and
    return its name; a properly deployed spark-avro jar also resolves
    the short name and either string functions identically."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 - classpath probe
            "org.apache.spark.sql.avro.AvroFileFormat"
        )
        return "org.apache.spark.sql.avro.AvroFileFormat"
    except Exception:  # noqa: BLE001
        return None


def avro_connector_available(spark: SparkSession) -> bool:
    """True when a JVM Avro DataSource is usable (see avro_format)."""
    return avro_format(spark) is not None


# ------------------------------------------------------------ primitives

def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: io.BytesIO) -> int:
    shift = u = 0
    while True:
        b = buf.read(1)[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)  # un-zigzag


def _wstr(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _zigzag(len(raw)) + raw


def _rbytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_varint(buf))


# ------------------------------------------------------- schema mapping

_PRIM = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def _avro_type(dt: T.DataType) -> object:
    for spark_t, name in _PRIM.items():
        if isinstance(dt, spark_t):
            return name
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return {"type": "long", "logicalType": "timestamp-micros"}
    raise TypeError(
        f"unsupported type for the built-in Avro codec: {dt} "
        "(install the spark-avro connector jar for nested types)"
    )


def avro_schema_json(schema: T.StructType, name: str = "row") -> str:
    return json.dumps({
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name,
             "type": ["null", _avro_type(f.dataType)] if f.nullable
             else _avro_type(f.dataType)}
            for f in schema.fields
        ],
    })


# ------------------------------------------------------------ encoding

def _encoder(dt: T.DataType):
    import datetime

    if isinstance(dt, (T.LongType, T.IntegerType)):
        return lambda v: _zigzag(int(v))
    if isinstance(dt, (T.DoubleType,)):
        return lambda v: struct.pack("<d", float(v))
    if isinstance(dt, (T.FloatType,)):
        return lambda v: struct.pack("<f", float(v))
    if isinstance(dt, T.StringType):
        return _wstr
    if isinstance(dt, T.BooleanType):
        return lambda v: b"\x01" if v else b"\x00"
    if isinstance(dt, T.BinaryType):
        return lambda v: _zigzag(len(v)) + bytes(v)
    if isinstance(dt, T.DateType):
        epoch = datetime.date(1970, 1, 1)
        return lambda v: _zigzag((v - epoch).days)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        def _ts(v):
            if hasattr(v, "value"):           # pd.Timestamp: exact nanos
                return _zigzag(int(v.value) // 1000)
            if v.tzinfo is not None:
                return _zigzag(int(v.timestamp() * 1_000_000))
            delta = v - datetime.datetime(1970, 1, 1)
            return _zigzag(
                (delta.days * 86_400 + delta.seconds) * 1_000_000
                + delta.microseconds
            )
        return _ts
    raise TypeError(str(dt))


def _decoder(dt: T.DataType):
    import datetime

    if isinstance(dt, (T.LongType, T.IntegerType)):
        return _read_varint
    if isinstance(dt, T.DoubleType):
        return lambda buf: struct.unpack("<d", buf.read(8))[0]
    if isinstance(dt, T.FloatType):
        return lambda buf: struct.unpack("<f", buf.read(4))[0]
    if isinstance(dt, T.StringType):
        return lambda buf: _rbytes(buf).decode("utf-8")
    if isinstance(dt, T.BooleanType):
        return lambda buf: buf.read(1) == b"\x01"
    if isinstance(dt, T.BinaryType):
        return _rbytes
    if isinstance(dt, T.DateType):
        epoch = datetime.date(1970, 1, 1)
        return lambda buf: epoch + datetime.timedelta(days=_read_varint(buf))
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        epoch = datetime.datetime(1970, 1, 1)
        return lambda buf: epoch + datetime.timedelta(
            microseconds=_read_varint(buf)
        )
    raise TypeError(str(dt))


class ContainerWriter:
    """Streaming Avro container writer with BOUNDED memory: rows are
    encoded into the current block buffer and the block is flushed to
    the sink whenever it reaches ``block_rows`` rows or ``block_bytes``
    encoded bytes — a 10 GB partition streams through a ~1 MiB buffer
    instead of materializing in executor memory.  Codecs per the spec:
    ``null`` and ``deflate`` (RFC 1951 raw deflate — no zlib header or
    checksum — via stdlib zlib)."""

    def __init__(self, sink, schema: T.StructType, codec: str = "null",
                 block_rows: int = 4096, block_bytes: int = 1 << 20):
        assert codec in ("null", "deflate"), codec
        self._sink = sink
        self._encs = [(_encoder(f.dataType), f.nullable)
                      for f in schema.fields]
        self._codec = codec
        self._block_rows = block_rows
        self._block_bytes = block_bytes
        self._body = bytearray()
        self._n = 0
        self.total_rows = 0
        meta = {"avro.schema": avro_schema_json(schema).encode(),
                "avro.codec": codec.encode()}
        head = bytearray()
        head += _MAGIC
        head += _zigzag(len(meta))
        for k, v in sorted(meta.items()):
            head += _wstr(k) + _zigzag(len(v)) + v
        head += _zigzag(0)     # end of metadata map
        head += _SYNC
        sink.write(bytes(head))

    def write_row(self, row) -> None:
        body = self._body
        for (enc, nullable), v in zip(self._encs, row):
            if nullable:
                if v is None:
                    body += _zigzag(0)
                    continue
                body += _zigzag(1)
            body += enc(v)
        self._n += 1
        self.total_rows += 1
        if self._n >= self._block_rows or len(body) >= self._block_bytes:
            self.flush_block()

    def flush_block(self) -> None:
        if not self._n:
            return
        payload = bytes(self._body)
        if self._codec == "deflate":
            import zlib
            c = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate
            payload = c.compress(payload) + c.flush()
        self._sink.write(bytes(
            _zigzag(self._n) + _zigzag(len(payload))
        ))
        self._sink.write(payload)
        self._sink.write(_SYNC)
        self._body = bytearray()
        self._n = 0

    def close(self) -> None:
        self.flush_block()


def encode_container(rows: list, schema: T.StructType,
                     codec: str = "null",
                     block_rows: int = 4096) -> bytes:
    """Rows (tuples/Rows in field order) -> one Avro container file
    (multi-block when ``rows`` exceeds ``block_rows``)."""
    sink = io.BytesIO()
    w = ContainerWriter(sink, schema, codec=codec, block_rows=block_rows)
    for row in rows:
        w.write_row(row)
    w.close()
    return sink.getvalue()


def decode_container(blob: bytes, schema: T.StructType) -> list[tuple]:
    """One Avro container file -> list of row tuples (schema order).
    Reads any conforming file (arbitrary sync marker, multiple blocks,
    null codec)."""
    buf = io.BytesIO(blob)
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file")
    n_meta = _read_varint(buf)
    codec = b"null"
    while n_meta != 0:
        if n_meta < 0:
            # negative-count map block form: count = -n, followed by the
            # block's byte size (spec-permitted; skip the size, read n)
            n_meta = -n_meta
            _read_varint(buf)
        for _ in range(n_meta):
            key = _rbytes(buf).decode()
            val = _rbytes(buf)
            if key == "avro.codec":
                codec = val
        n_meta = _read_varint(buf)
    if codec not in (b"null", b"", b"deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = buf.read(16)
    decs = [(_decoder(f.dataType), f.nullable) for f in schema.fields]
    rows: list[tuple] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n_rows = _read_varint(buf)
        n_bytes = _read_varint(buf)
        payload = buf.read(n_bytes)
        if len(payload) != n_bytes:
            raise ValueError("truncated block")
        if codec == b"deflate":
            import zlib
            payload = zlib.decompress(payload, -15)  # raw deflate
        block = io.BytesIO(payload)
        for _ in range(n_rows):
            vals = []
            for dec, nullable in decs:
                if nullable and _read_varint(block) == 0:
                    vals.append(None)
                    continue
                vals.append(dec(block))
            rows.append(tuple(vals))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return rows


# ----------------------------------------------------------- DataFrame

def write_avro(df: DataFrame, path: str, codec: str = "null",
               block_rows: int = 4096) -> int:
    """Write ``df`` as Avro container files, one per partition, through
    ``mapInPandas`` (executor-side serialization; the driver sees only
    per-file audit rows).  Streams Arrow batches straight into the
    multi-block ``ContainerWriter`` — per-task memory is one block
    buffer (~1 MiB), never the partition.  ``codec``: ``null`` or
    ``deflate``.  Returns the number of rows written."""
    schema = df.schema
    os.makedirs(path, exist_ok=True)

    def serialize(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        fname = os.path.join(path, f"part-{pid:05d}-{uuid.uuid4().hex}.avro")
        with open(fname, "wb") as f:
            w = ContainerWriter(f, schema, codec=codec,
                                block_rows=block_rows)
            for pdf in batches:
                # NULLs arrive as NaN/NaT in pandas; fold them back to
                # None so nullable unions encode index 0 (NaN payloads
                # are treated as null — no testdata column carries
                # literal NaN).
                pdf = pdf.astype(object).where(pd.notnull(pdf), None)
                for t in pdf.itertuples(index=False, name=None):
                    w.write_row(t)
            w.close()
        yield pd.DataFrame({"file": [fname], "n_rows": [w.total_rows]})

    audit = df.mapInPandas(serialize, "file string, n_rows long").collect()
    return sum(r["n_rows"] for r in audit)


def read_avro(spark: SparkSession, path: str, schema: T.StructType,
              use_connector: bool | None = None) -> DataFrame:
    """Distributed Avro read: ``binaryFile`` source (one row per
    container file) -> per-file decode in ``mapInPandas``.  Prefers the
    spark-avro connector when installed (sync-marker splitting, nested
    types); this built-in path is the no-extra-jar fallback.
    ``use_connector`` forces one path (tests pin both)."""
    fmt = avro_format(spark)
    if use_connector is False:
        fmt = None
    if fmt:
        return (
            spark.read.format(fmt).schema(schema)
            .load(os.path.join(path, "*.avro"))
        )

    names = [f.name for f in schema.fields]

    def deserialize(batches):
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                rows = decode_container(bytes(blob), schema)
                yield pd.DataFrame(rows, columns=names)

    return (
        spark.read.format("binaryFile").load(os.path.join(path, "*.avro"))
        .select("content")
        .mapInPandas(deserialize, schema)
    )
