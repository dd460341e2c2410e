"""WARC (ISO 28500) source/sink — the container format web-crawl
pretraining corpora actually ship in (Common Crawl's WARC/WET files).

The reference archives raw JSON (`/root/reference/data_collector.py`
writes one JSON file per day); a 100 TB LLM-data pipeline's raw tier is
WARC instead, so the engine carries a real reader/writer for it:

- ``write_warc(df, path)`` — one ``.warc`` file per partition via
  ``mapInPandas`` (executor-side serialization, the Avro/multimodal
  pattern: bytes flow through Arrow batches, never the driver).
  Records are spec-shaped: ``WARC/1.0`` version line, named headers,
  ``Content-Length`` in UTF-8 BYTES, blank line, payload, blank line —
  so payloads containing header-lookalike text round-trip exactly
  (parsing is length-driven, never delimiter-driven).
- ``read_warc(spark, path)`` — distributed decode over the built-in
  ``binaryFile`` source: one task per ``.warc`` file, which is exactly
  how production crawlers parallelize WARC (a Common Crawl segment is
  ~1 GB per file; record-level splitting buys nothing at that shape).

Corpus fields ride as ``WARC-X-*`` extension headers (the spec reserves
the namespace for them), so the round trip is schema-complete for the
``documents`` table without a sidecar.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_VERSION = b"WARC/1.0\r\n"

#: read_warc output schema (documents-table shape + byte audit).
_READ_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_bytes long"
)


def _hval(v) -> str:
    """Header-safe, exactly-reversible value encoding: percent-encode
    everything outside [A-Za-z0-9_.~-] so CR/LF/colon injection cannot
    corrupt record framing and leading/trailing whitespace survives the
    reader's strip (one hostile metadata row must not poison the
    partition file)."""
    from urllib.parse import quote

    return quote(str(v), safe="")


def _encode_record(doc_id, text, lang, source) -> bytes:
    if doc_id is None:
        # a NULL id would write '<urn:doc:None>', which read_warc's
        # int() then rejects — the write would succeed but every later
        # read of the file fails.  Fail at write time instead
        # (ADVICE r8).
        raise ValueError("WARC record requires a non-null doc_id")
    if int(doc_id) != doc_id:
        # int() would silently truncate a non-integral numeric id
        # (3.7 -> 3), corrupting the record id; fail at write time
        # like the null-id guard (ADVICE r9).
        raise ValueError(f"WARC doc_id must be integral, got {doc_id!r}")
    payload = ("" if text is None else str(text)).encode("utf-8")
    lines = [
        "WARC-Type: resource",
        f"WARC-Record-ID: <urn:doc:{int(doc_id)}>",
    ]
    # NULL metadata = header absent (NOT the string 'None'); NULL text
    # is flagged so '' and NULL round-trip distinctly.
    if lang is not None:
        lines.append(f"WARC-X-Lang: {_hval(lang)}")
    if source is not None:
        lines.append(f"WARC-X-Source: {_hval(source)}")
    if text is None:
        lines.append("WARC-X-Text-Null: 1")
    lines.append(f"Content-Length: {len(payload)}")
    head = ("\r\n".join(lines) + "\r\n\r\n").encode("utf-8")
    return _VERSION + head + payload + b"\r\n\r\n"


def parse_warc_bytes(blob: bytes):
    """Yield (doc_id, text, lang, source, n_bytes) from one WARC file's
    bytes.  Length-driven: after the header block, exactly
    Content-Length payload bytes are consumed, then the record
    terminator — malformed framing raises rather than resyncing (a
    corrupt raw-tier file should fail loudly; the JSONL source is the
    lenient leg)."""
    pos = 0
    n = len(blob)
    while pos < n:
        if not blob.startswith(_VERSION, pos):
            raise ValueError(f"bad WARC version line at byte {pos}")
        head_end = blob.index(b"\r\n\r\n", pos)
        headers = {}
        for line in blob[pos + len(_VERSION):head_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii")] = v.strip().decode("utf-8")
        clen = int(headers["Content-Length"])
        body_start = head_end + 4
        body_end = body_start + clen
        if blob[body_end:body_end + 4] != b"\r\n\r\n":
            raise ValueError(f"bad record terminator at byte {body_end}")
        rid = headers["WARC-Record-ID"]
        if not (rid.startswith("<urn:doc:") and rid.endswith(">")):
            raise ValueError(f"unexpected record id {rid!r}")
        from urllib.parse import unquote

        lang = headers.get("WARC-X-Lang")
        source = headers.get("WARC-X-Source")
        yield (
            int(rid[len("<urn:doc:"):-1]),
            None if "WARC-X-Text-Null" in headers
            else blob[body_start:body_end].decode("utf-8"),
            None if lang is None else unquote(lang),
            None if source is None else unquote(source),
            clen,
        )
        pos = body_end + 4


def write_warc(df: DataFrame, path: str) -> int:
    """Write (doc_id, text, lang, source) rows as WARC files, one per
    partition, executor-side.  Returns rows written (the driver sees
    only per-file audit rows, never payloads)."""
    os.makedirs(path, exist_ok=True)

    def serialize(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        fname = os.path.join(path, f"part-{pid:05d}-{uuid.uuid4().hex}.warc")
        n_rows = 0
        with open(fname, "wb") as f:
            for pdf in batches:
                for t in pdf.itertuples(index=False):
                    f.write(
                        _encode_record(t.doc_id, t.text, t.lang, t.source)
                    )
                    n_rows += 1
        yield pd.DataFrame({"file": [fname], "n_rows": [n_rows]})

    audit = df.select("doc_id", "text", "lang", "source").mapInPandas(
        serialize, "file string, n_rows long"
    )
    return sum(r["n_rows"] for r in audit.collect())


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC decode: binaryFile (one row per file) -> per-file
    parse in mapInPandas."""

    def deserialize(batches):
        import pandas as pd

        cols = ["doc_id", "text", "lang", "source", "n_bytes"]
        for pdf in batches:
            for blob in pdf["content"]:
                yield pd.DataFrame(
                    list(parse_warc_bytes(bytes(blob))), columns=cols
                )

    return (
        spark.read.format("binaryFile")
        .load(os.path.join(path, "*.warc"))
        .select("content")
        .mapInPandas(deserialize, _READ_SCHEMA)
    )
