"""Built-in Avro container codec (sources/avro.py): lossless DataFrame
round trip, and SPEC CONFORMANCE against the official Java Avro library
that ships on Spark's classpath — files we write are read by
org.apache.avro.file.DataFileReader, and files IT writes are read by
our decoder.  That pins the real format, not a lookalike."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from busdata_pipeline_spark.sources import table
from busdata_pipeline_spark.sources.avro import (
    decode_container,
    encode_container,
    read_avro,
    write_avro,
)
from tests.conftest import SF0001

def _events_df(spark):
    ev = table(spark, SF0001, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.col("ts").alias("ts"),
        F.to_date("ts").alias("d"),
    )
    return ev.limit(500)


def test_roundtrip_events_lossless(spark, tmp_path):
    """Python-codec write -> read through BOTH read paths (the JVM
    connector when resolvable, and the pure-Python binaryFile decode)
    must equal the source — including NULLs in the nullable double."""
    df = _events_df(spark)
    path = str(tmp_path / "av")
    n = write_avro(df, path)
    assert n == df.count()
    cols = df.columns
    a = sorted(map(tuple, df.select(*cols).collect()))
    for use_connector in (None, False):
        back = read_avro(spark, path, df.schema,
                         use_connector=use_connector)
        b = sorted(map(tuple, back.select(*cols).collect()))
        assert a == b, f"use_connector={use_connector}"
        assert (back.where(F.col("value").isNull()).count()
                == df.where(F.col("value").isNull()).count())


def test_java_avro_reads_our_files(spark, tmp_path):
    """Spec conformance, direction 1: the official JVM Avro reader
    consumes a file written by the pure-Python encoder."""
    rows = [(1, "alpha", 1.5, True), (2, None, None, False),
            (3, "gamma", -2.25, None)]
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("flag", T.BooleanType(), True),
    ])
    p = str(tmp_path / "ours.avro")
    with open(p, "wb") as f:
        f.write(encode_container(rows, schema))

    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while reader.hasNext():
        rec = reader.next()
        name = rec.get("name")
        got.append((
            rec.get("id"),
            str(name) if name is not None else None,
            rec.get("score"),
            rec.get("flag"),
        ))
    reader.close()
    assert got == rows


def test_our_reader_reads_java_avro_files(spark, tmp_path):
    """Spec conformance, direction 2: decode a container written by the
    official JVM Avro writer (its own sync marker, its own varints)."""
    jvm = spark._jvm
    sjson = ('{"type":"record","name":"row","fields":['
             '{"name":"id","type":"long"},'
             '{"name":"name","type":["null","string"]},'
             '{"name":"score","type":["null","double"]}]}')
    avsc = jvm.org.apache.avro.Schema.Parser().parse(sjson)
    p = str(tmp_path / "theirs.avro")
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(avsc)
    )
    writer.create(avsc, jvm.java.io.File(p))
    mk = jvm.org.apache.avro.generic.GenericData.Record
    for i, (name, score) in enumerate(
            [("x", 0.5), (None, None), ("z", -9.75)]):
        rec = mk(avsc)
        rec.put("id", i)
        rec.put("name", name)
        rec.put("score", score)
        writer.append(rec)
    writer.close()

    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ])
    with open(p, "rb") as f:
        rows = decode_container(f.read(), schema)
    assert rows == [(0, "x", 0.5), (1, None, None), (2, "z", -9.75)]


def test_partitioned_write_one_file_per_partition(spark, tmp_path):
    df = spark.range(100).repartition(4).select(
        F.col("id"), (F.col("id") * 2.0).alias("dbl")
    )
    path = str(tmp_path / "parts")
    assert write_avro(df, path) == 100
    files = [f for f in os.listdir(path) if f.endswith(".avro")]
    assert len(files) == 4
    back = read_avro(spark, path, df.schema)
    assert back.count() == 100
    assert {r["id"] for r in back.collect()} == set(range(100))


def test_date_and_timestamp_logical_types(spark, tmp_path):
    schema = T.StructType([
        T.StructField("d", T.DateType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ])
    vals = [(datetime.date(2024, 2, 29),
             datetime.datetime(2024, 2, 29, 12, 34, 56, 789012)),
            (None, None)]
    blob = encode_container(vals, schema)
    assert decode_container(blob, schema) == vals


def test_multiblock_deflate_roundtrip(spark, tmp_path):
    """Multi-block (block_rows << row count) + deflate codec through
    both write/read paths: bounded-buffer writes must produce files
    every reader consumes identically."""
    df = _events_df(spark)
    path = str(tmp_path / "av_deflate")
    n = write_avro(df, path, codec="deflate", block_rows=64)
    assert n == df.count()
    cols = df.columns
    a = sorted(map(tuple, df.select(*cols).collect()))
    back = read_avro(spark, path, df.schema, use_connector=False)
    assert sorted(map(tuple, back.select(*cols).collect())) == a
    # deflate actually compressed (events text/doubles deflate well)
    import glob
    import os as _os
    sz = sum(_os.path.getsize(f) for f in glob.glob(f"{path}/*.avro"))
    plain = str(tmp_path / "av_plain")
    write_avro(df, plain, codec="null", block_rows=64)
    sz_plain = sum(_os.path.getsize(f)
                   for f in glob.glob(f"{plain}/*.avro"))
    assert sz < sz_plain


def test_java_avro_reads_our_multiblock_deflate(spark, tmp_path):
    """Spec conformance for the new write shapes: the official JVM
    reader consumes a MULTI-BLOCK DEFLATE file written here."""
    rows = [(i, f"name-{i}" * 3, i / 7.0) for i in range(1000)]
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ])
    p = str(tmp_path / "ours_deflate.avro")
    blob = encode_container(rows, schema, codec="deflate", block_rows=100)
    with open(p, "wb") as f:
        f.write(blob)

    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while reader.hasNext():
        rec = reader.next()
        got.append((rec.get("id"), str(rec.get("name")), rec.get("score")))
    reader.close()
    assert got == rows


def test_our_reader_reads_java_deflate_files(spark, tmp_path):
    """Direction 2 for the codec: decode a DEFLATE container written by
    the official JVM writer (its codec impl, its block splits)."""
    jvm = spark._jvm
    sjson = ('{"type":"record","name":"row","fields":['
             '{"name":"id","type":"long"},'
             '{"name":"payload","type":"string"}]}')
    avsc = jvm.org.apache.avro.Schema.Parser().parse(sjson)
    p = str(tmp_path / "theirs_deflate.avro")
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(avsc)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    # tiny sync interval to force multiple blocks from the Java side
    writer.setSyncInterval(256)
    writer.create(avsc, jvm.java.io.File(p))
    mk = jvm.org.apache.avro.generic.GenericData.Record
    want = []
    for i in range(500):
        rec = mk(avsc)
        rec.put("id", i)
        rec.put("payload", f"row-{i}-" + "x" * (i % 13))
        writer.append(rec)
        want.append((i, f"row-{i}-" + "x" * (i % 13)))
    writer.close()

    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("payload", T.StringType(), False),
    ])
    with open(p, "rb") as f:
        rows = decode_container(f.read(), schema)
    assert rows == want
