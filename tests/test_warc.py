"""WARC source/sink pins (sources/warc.py): byte-level framing, hostile
payloads (header-lookalike text), malformed-file rejection, and full
round-trip equality.  The registered query's oracle parity is covered
by driver_sim / test_oracle_parity."""

from __future__ import annotations

import glob

import pytest

from busdata_pipeline_spark.sources.warc import (
    _encode_record,
    parse_warc_bytes,
    read_warc,
    write_warc,
)

HOSTILE = (
    "line one\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nfake\r\n\r\n tail"
)


def test_record_framing_exact():
    blob = _encode_record(7, "héllo", "en", "src1")
    assert blob.startswith(b"WARC/1.0\r\n")
    # Content-Length counts UTF-8 BYTES, not chars
    assert b"Content-Length: 6\r\n" in blob
    (rec,) = list(parse_warc_bytes(blob))
    assert rec == (7, "héllo", "en", "src1", 6)


def test_hostile_payload_roundtrips():
    """A payload containing WARC header lines must survive: parsing is
    Content-Length-driven, never delimiter-driven."""
    blob = _encode_record(1, HOSTILE, "en", "s") + _encode_record(
        2, "after", "de", "s"
    )
    recs = list(parse_warc_bytes(blob))
    assert [r[0] for r in recs] == [1, 2]
    assert recs[0][1] == HOSTILE
    assert recs[1][1] == "after"


def test_malformed_raises():
    good = _encode_record(1, "x", "en", "s")
    with pytest.raises(ValueError, match="version line"):
        list(parse_warc_bytes(b"JUNK" + good))
    # truncated terminator -> framing error
    with pytest.raises(ValueError, match="terminator"):
        list(parse_warc_bytes(good[:-2]))
    # lying Content-Length -> bad terminator
    bad = good.replace(b"Content-Length: 1\r\n", b"Content-Length: 2\r\n")
    with pytest.raises(ValueError):
        list(parse_warc_bytes(bad))


def test_spark_roundtrip_exact(spark, sf_dir, tmp_path):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang", "source")
    )
    path = str(tmp_path / "warc_out")
    n = write_warc(docs.repartition(3), path)
    assert n == docs.count()
    assert len(glob.glob(f"{path}/*.warc")) == 3
    back = read_warc(spark, path).drop("n_bytes")
    got = sorted(map(tuple, back.collect()))
    want = sorted(map(tuple, docs.collect()))
    assert got == want


def test_warc_roundtrips_nulls_and_hostile_metadata(spark, tmp_path):
    """NULL text/lang/source survive distinctly from ''/'None', and
    CR/LF/colon/whitespace-laden metadata cannot corrupt framing."""
    from busdata_pipeline_spark.sources.warc import read_warc, write_warc

    rows = [
        (1, None, None, "s", None),
        (2, "", "en", None, None),
        (3, "body", "a\r\nContent-Length: 999", "  padded  ", None),
        (4, "x", "None", "colon:host", None),
    ]
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3]) for r in rows],
        "doc_id long, text string, lang string, source string",
    ).coalesce(1)
    path = str(tmp_path / "hostile_warc")
    assert write_warc(df, path) == 4
    back = {
        r["doc_id"]: (r["text"], r["lang"], r["source"])
        for r in read_warc(spark, path).collect()
    }
    assert back[1] == (None, None, "s")
    assert back[2] == ("", "en", None)  # '' stays '', NULL stays NULL
    assert back[3] == ("body", "a\r\nContent-Length: 999", "  padded  ")
    assert back[4] == ("x", "None", "colon:host")  # literal 'None' kept


def test_null_doc_id_rejected_at_write():
    """ADVICE r8: a NULL doc_id used to serialize as '<urn:doc:None>' —
    the write succeeded but every later read of the file failed in
    int().  Must fail at encode time instead."""
    import pytest

    with pytest.raises(ValueError, match="doc_id"):
        _encode_record(None, "text", "en", "src")
