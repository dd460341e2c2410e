"""Strict replica of the external driver's hash-level comparison.

Round 1 taught us `tests/oracle_check.compare` (Python ``==`` on values)
is WEAKER than the driver's check: three queries passed locally but
failed the driver's ``hash_match``.  The two failure classes were

  1. IEEE signed zero: DuckDB ``ROUND`` of a tiny negative yields
     ``-0.0`` while Spark yields ``0.0`` — equal under ``==``, different
     bytes/repr (etl_w2_lag_rate, etl_w3_lead_backfill).
  2. Integer width: DuckDB ``SUM(int)`` returns HUGEINT (int128) while
     Spark emits BIGINT — identical values, different type-level
     serialization (rel_pivot_segment_by_type).

This comparator is therefore deliberately STRICTER than value equality:

  * floats compare by their IEEE-754 bit pattern (catches -0.0, and any
    last-ulp divergence the driver's hash would see);
  * column types on both engines map to a canonical lattice and must
    match exactly (hugeint != bigint, float32 != float64,
    decimal(p,s) scale-sensitive);
  * rows and columns are canonically sorted the same way on both sides
    before comparison, mirroring the driver's sort-columns-by-name rule.

Round 7 added the third failure class: the REAL driver canonicalizes
through pandas (``toPandas()`` / ``.df()``), where list cells are
unsortable ndarrays, Spark Decimals stay objects while DuckDB decimals
collapse to float64, and TIMESTAMPTZ becomes tz-aware — all invisible
to this module's collect()/fetchall() canonicalization.  The
output-type GATE below therefore rejects any such schema outright (see
``gate_output_types``), restoring the invariant:

Anything green here should be green under the driver; anything red here
must be fixed by canonicalizing BOTH engines (cast in the oracle SQL,
cast/normalize in the Spark plan — see plans/registry.normalize_output),
or — for gate failures — by serializing/flattening the offending column
on both sides.
"""

from __future__ import annotations

import math
import re
import struct
from datetime import date, datetime
from decimal import Decimal

# ---------------------------------------------------------------------------
# Canonical type lattice.

_SPARK_CANON = {
    "tinyint": "i8",
    "smallint": "i16",
    "int": "i32",
    "bigint": "i64",
    "float": "f32",
    "double": "f64",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "binary": "bytes",
}

_DUCK_CANON = {
    "TINYINT": "i8",
    "SMALLINT": "i16",
    "INTEGER": "i32",
    "BIGINT": "i64",
    "HUGEINT": "i128",
    "UTINYINT": "u8",
    "USMALLINT": "u16",
    "UINTEGER": "u32",
    "UBIGINT": "u64",
    "FLOAT": "f32",
    "DOUBLE": "f64",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts",
    # TIMESTAMPTZ is deliberately NOT collapsed into "ts": the real
    # driver materializes DuckDB results via .df(), where TIMESTAMPTZ
    # becomes a tz-AWARE pandas column and fails the schema compare
    # against Spark's tz-naive output (round-7 rel_resample_linear_interp).
    "TIMESTAMP WITH TIME ZONE": "tstz",
    "TIMESTAMP_NS": "ts",
    "BLOB": "bytes",
}

_DEC_RE = re.compile(r"^decimal\((\d+),\s*(-?\d+)\)$", re.I)
_ARR_SPARK_RE = re.compile(r"^array<(.+)>$")
_ARR_DUCK_RE = re.compile(r"^(.+)\[\]$")


def canon_spark_type(dt: str) -> str:
    dt = dt.strip()
    m = _ARR_SPARK_RE.match(dt)
    if m:
        return f"list<{canon_spark_type(m.group(1))}>"
    m = _DEC_RE.match(dt)
    if m:
        return f"dec({m.group(1)},{m.group(2)})"
    return _SPARK_CANON.get(dt, dt)


def canon_duck_type(dt: str) -> str:
    dt = str(dt).strip()
    m = _ARR_DUCK_RE.match(dt)
    if m:
        return f"list<{canon_duck_type(m.group(1))}>"
    m = _DEC_RE.match(dt)
    if m:
        return f"dec({m.group(1)},{m.group(2)})"
    return _DUCK_CANON.get(dt.upper(), dt)


# ---------------------------------------------------------------------------
# Bit-exact value canonicalization.


def canon_value(v) -> str:
    """Serialize one cell so that two cells collide iff the driver's
    hash would treat them as identical."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        # bit pattern: -0.0 != 0.0, last-ulp differences visible
        return "f:" + struct.pack("<d", v).hex()
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, Decimal):
        return f"d:{v}"
    if isinstance(v, datetime):
        return "t:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return "D:" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}={canon_value(v[k])}" for k in sorted(v)
        ) + "}"
    return "s:" + str(v)


# ---------------------------------------------------------------------------
# Output-type gate — the round-7 lesson.
#
# The REAL driver canonicalizes through pandas (Spark ``toPandas()``,
# DuckDB ``.df()``), then sorts rows and hashes cell values.  Four type
# families survive THIS module's collect()/fetchall() canonicalization
# but break the driver's pandas one:
#
#   * list/map/struct cells  -> numpy.ndarray / dict in pandas; the
#     driver's row sort raises ``TypeError: unhashable type`` (4 of the
#     8 round-7 reds);
#   * DECIMAL cells          -> Spark keeps ``decimal.Decimal`` objects,
#     DuckDB converts to float64 — equal values, different hash input
#     (3 round-7 reds);
#   * tz-aware timestamps    -> DuckDB TIMESTAMPTZ becomes a tz-aware
#     pandas column, Spark output is tz-naive — schema mismatch (1 red);
#   * binary cells           -> bytes vs object-dtype rendering is
#     engine-dependent.
#
# Any registered query whose OUTPUT schema contains one of these fails
# here loudly, naming the column, BEFORE the values are even compared —
# so the sim can never again say green where the driver says red.

# note: DuckDB renders maps as MAP(k, v) and structs as STRUCT(...),
# Spark as map<k,v> / struct<...> — match case-insensitively on both.
_GATE_BANNED_PREFIXES = (
    "list<", "map<", "map(", "struct", "dec(", "tstz", "bytes",
)


def gate_output_types(cols_types: dict[str, str], engine: str) -> list[str]:
    """Return human-readable offenders for driver-unhashable output
    columns.  ``cols_types`` maps lower-cased column name -> canonical
    type (from canon_spark_type / canon_duck_type)."""
    bad = []
    for c, t in sorted(cols_types.items()):
        if t.lower().startswith(_GATE_BANNED_PREFIXES):
            bad.append(f"{engine}.{c}:{t}")
    return bad


def canon_rows(rows, col_order):
    out = [
        "|".join(canon_value(r[i]) for i in col_order) for r in rows
    ]
    out.sort()
    return out


def strict_compare(spark_df, con, sql: str) -> tuple[bool, str]:
    """Run the Spark plan and the DuckDB oracle; compare at driver-hash
    strictness.  Returns (ok, message)."""
    s_cols = [c.lower() for c in spark_df.columns]
    s_types = {c.lower(): canon_spark_type(t) for c, t in spark_df.dtypes}

    rel = con.sql(sql)
    d_cols = [c.lower() for c in rel.columns]
    d_types = {
        c.lower(): canon_duck_type(t)
        for c, t in zip(rel.columns, rel.types)
    }

    offenders = gate_output_types(s_types, "spark") + gate_output_types(
        d_types, "duckdb"
    )
    if offenders:
        return False, (
            "output-type gate: driver-unhashable column(s) "
            + ", ".join(offenders)
            + " — serialize (to_json/concat_ws), flatten to scalars, or "
            "cast decimals to VARCHAR/rounded DOUBLE on BOTH engines"
        )

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    for c in sorted(s_cols):
        if s_types[c] != d_types[c]:
            return False, f"type of '{c}': spark={s_types[c]} duckdb={d_types[c]}"

    s_rows = [tuple(r) for r in spark_df.collect()]
    d_rows = rel.fetchall()
    if len(s_rows) != len(d_rows):
        return False, f"rows: spark={len(s_rows)} duckdb={len(d_rows)}"

    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    a = canon_rows(s_rows, s_order)
    b = canon_rows(d_rows, d_order)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value bits differ, first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows, strict)"


def strict_compare_streaming(spark_df, con, sql: str,
                             batch: int = 200_000) -> tuple[bool, str]:
    """Memory-bounded sibling of strict_compare for replica-rung
    differentials whose OUTPUT no longer fits a driver collect (the
    round-11 quotient oracles made the 100x ORACLES cheap, leaving the
    25M-200M-row result sets as the remaining bound).

    Same schema/type gates and the same per-cell canonicalization as
    strict_compare; instead of sorting both sides in Python it asks
    EACH ENGINE to sort by every output column (name order, ascending,
    NULLS FIRST) and zips the two streams row by row.  This is
    value-exact — any cell whose canonical bytes differ fails — with
    O(batch) memory.

    Sort-key canonicalization (VERDICT-r11 task 4): the ENGINE side
    cannot emit -0.0 (normalize_output guards every registered query),
    but the ORACLE can, and an oracle row whose float sort key is -0.0
    could be ordered differently than the engine's 0.0 twin — a
    misaligned zip then cascades spurious diffs onto unrelated rows.
    The DuckDB ORDER BY therefore normalizes -0.0 -> 0.0 on the SORT
    KEYS ONLY (values are still compared raw), so a genuine -0.0
    divergence reports as exactly one cell diff at the right row.

    Remaining caveat (ADVICE-r11): string ordering is each engine's
    binary collation.  Spark's default UTF8_BINARY and DuckDB's binary
    collation both order by UTF-8 bytes (= code-point order), so they
    agree on all well-formed text including supplementary-plane
    characters; text columns holding invalid UTF-8 or engine-specific
    collation overrides could still zip-misalign and report a spurious
    'value bits differ' — a FALSE RED only, never a silent pass."""
    s_cols = [c.lower() for c in spark_df.columns]
    s_types = {c.lower(): canon_spark_type(t) for c, t in spark_df.dtypes}

    rel = con.sql(sql)
    d_cols = [c.lower() for c in rel.columns]
    d_types = {
        c.lower(): canon_duck_type(t)
        for c, t in zip(rel.columns, rel.types)
    }
    offenders = gate_output_types(s_types, "spark") + gate_output_types(
        d_types, "duckdb"
    )
    if offenders:
        return False, (
            "output-type gate: driver-unhashable column(s) "
            + ", ".join(offenders)
        )
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    for c in sorted(s_cols):
        if s_types[c] != d_types[c]:
            return False, f"type of '{c}': spark={s_types[c]} duckdb={d_types[c]}"

    cols = sorted(s_cols)
    sorted_spark = spark_df.selectExpr(*cols).orderBy(*cols)
    qcols = ", ".join(f'"{c}"' for c in cols)
    keys = []
    for c in cols:
        if d_types[c] in ("f64", "f32"):
            # -0.0 -> 0.0 on the sort key only (see docstring); NULL
            # and NaN fall through the CASE unchanged
            keys.append(
                f'(CASE WHEN "{c}" = 0 THEN 0.0 ELSE "{c}" END) '
                "NULLS FIRST"
            )
        else:
            keys.append(f'"{c}" NULLS FIRST')
    d_rel = con.sql(
        f"SELECT {qcols} FROM ({sql}) __t ORDER BY {', '.join(keys)}"
    )

    s_it = sorted_spark.toLocalIterator()
    n = 0
    while True:
        d_batch = d_rel.fetchmany(batch)
        for d_row in d_batch:
            try:
                s_row = next(s_it)
            except StopIteration:
                return False, f"rows: spark={n} duckdb=more (>= {n + 1})"
            a = "|".join(canon_value(v) for v in tuple(s_row))
            b = "|".join(canon_value(v) for v in d_row)
            if a != b:
                return False, (
                    f"value bits differ at sorted row {n}: "
                    f"spark={a[:160]} duckdb={b[:160]}"
                )
            n += 1
        if not d_batch:
            break
    try:
        next(s_it)
        return False, f"rows: spark=more (> {n}) duckdb={n}"
    except StopIteration:
        pass
    return True, f"ok ({n} rows, strict, streamed)"
