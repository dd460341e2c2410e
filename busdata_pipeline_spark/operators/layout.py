"""Physical-layout operators: clustering data for scan-time skipping.

Partitioning (e.g. by event_date — operators/warehouse.py) prunes whole
directories; WITHIN a partition, parquet still splits data into row
groups carrying min/max statistics per column.  If rows are written in
random order, every row group spans the full value range and no filter
can skip anything; range-clustering the write (repartitionByRange +
sortWithinPartitions) makes row-group min/max ranges disjoint, so a
selective filter reads a handful of row groups instead of the whole
partition — the Z-order/liquid-clustering idea in its 1-D form, using
nothing but vanilla Spark writes.

At 100 TB this is the difference between a time-slice query scanning a
day's full partition and scanning ~one row group per file; the test
(tests/test_layout.py) asserts the actual row-group statistics, not just
intent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(df: DataFrame, path: str, cluster_col: str,
                    files: int = 4,
                    block_bytes: int = 64 * 1024 * 1024) -> None:
    """Write ``df`` range-clustered on ``cluster_col``: ranged into
    ``files`` non-overlapping spans, sorted within each.  Row-group
    size (and so skipping granularity) is governed by
    ``parquet.block.size`` — BYTES, the only knob the parquet writer
    actually honors; tests shrink it to force many groups per file."""
    (
        df.repartitionByRange(files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .option("parquet.block.size", str(block_bytes))
        .option("parquet.page.size", str(max(1024, block_bytes // 2)))
        .parquet(path)
    )


def row_group_spans(path: str, column: str) -> list[tuple]:
    """(min, max) per parquet row group for ``column`` across all files —
    the statistics the reader's predicate pushdown skips on."""
    import glob
    import os

    import pyarrow.parquet as pq

    spans = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            for c in range(grp.num_columns):
                col = grp.column(c)
                if col.path_in_schema == column and col.statistics:
                    spans.append((col.statistics.min, col.statistics.max))
    return spans


def _scale_to_buckets(col, lo, hi, bits: int):
    """Scale a numeric column into integer buckets [0, 2^bits) by linear
    min/max normalization (engine-side expression, no Python per row)."""
    from pyspark.sql import functions as F

    buckets = (1 << bits) - 1
    if hi == lo:
        return F.lit(0).cast("long")
    frac = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(
        F.lit(buckets).cast("long"),
        F.greatest(F.lit(0).cast("long"), (frac * buckets).cast("long")),
    )


def zorder_expr(xb, yb, bits: int):
    """Bit-interleave two bucket columns into a Z-value (Morton code):
    bit i of x lands at position 2i, bit i of y at 2i+1.  Unrolled into
    a chain of shift/mask ORs — pure codegen, no UDF."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(xb.bitwiseAND(F.lit(1 << i)), i))
            .bitwiseOR(F.shiftleft(yb.bitwiseAND(F.lit(1 << i)), i + 1))
        )
    return z


def write_zorder_clustered(df: DataFrame, path: str, x_col: str, y_col: str,
                           files: int = 4, bits: int = 16,
                           block_bytes: int = 64 * 1024 * 1024) -> None:
    """2-D Z-order clustering: rows are laid out along a Morton curve
    over (x_col, y_col), so row-group min/max statistics become
    selective in BOTH dimensions at once — a 2-D box predicate skips
    row groups on whichever column it constrains, where 1-D range
    clustering only ever helps its single sort column.

    The per-column (min, max) needed for bucket scaling is one 1-row
    aggregate (bounded driver contract); everything else — scaling,
    bit interleave, ranged repartition, in-file sort — is engine-side
    expression code.  The curve key is dropped before write; only the
    physical row order (and therefore the statistics) carries it."""
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(x_col).alias("xlo"), F.max(x_col).alias("xhi"),
        F.min(y_col).alias("ylo"), F.max(y_col).alias("yhi"),
    ).first()
    xb = _scale_to_buckets(F.col(x_col), stats.xlo, stats.xhi, bits)
    yb = _scale_to_buckets(F.col(y_col), stats.ylo, stats.yhi, bits)
    (
        df.withColumn("_z", zorder_expr(xb, yb, bits))
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("parquet.block.size", str(block_bytes))
        .option("parquet.page.size", str(max(1024, block_bytes // 2)))
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Driver-replayable Morton variant.  ``zorder_expr`` above is the
# general-``bits`` unrolled interleave used by write_zorder_clustered
# (layout-only: the curve key is dropped at write).  This section is the
# fixed-8-bit mask-ladder form (log-depth tree: 6 bitwise ops/dimension
# vs 2·bits OR terms) whose expression tree the DuckDB oracle of
# plans/pruning.etl_zorder_skipping mirrors LITERALLY — the driver
# hash-checks every Morton code, so the code column is kept, not dropped.

#: bits per dimension (256 bins each → 16-bit interleaved code).
Z_BITS = 8


def _spread_bits(c):
    """Spread an 8-bit int's bits to even positions (16-bit result) via
    the classic mask-and-shift ladder — pure JVM bitwise expressions, so
    the code stays inside whole-stage codegen and is replayable in any
    engine with shifts/and/or (the oracle mirrors it literally)."""
    from pyspark.sql import functions as F

    c = c.bitwiseOR(F.shiftleft(c, 4)).bitwiseAND(F.lit(0x0F0F))
    c = c.bitwiseOR(F.shiftleft(c, 2)).bitwiseAND(F.lit(0x3333))
    c = c.bitwiseOR(F.shiftleft(c, 1)).bitwiseAND(F.lit(0x5555))
    return c


def zorder_code(xbin, ybin):
    """Interleave two Z_BITS-bit bin columns into a Morton code: x in
    even bit positions, y in odd."""
    from pyspark.sql import functions as F

    return _spread_bits(xbin).bitwiseOR(F.shiftleft(_spread_bits(ybin), 1))


def write_zordered(df: DataFrame, path: str, zcol: str = "z",
                   files: int = 4,
                   block_bytes: int = 64 * 1024 * 1024) -> None:
    """Write range-clustered on a precomputed Morton-code column: row
    groups become Z-curve segments, i.e. 2-D tiles, so BOTH dimensions'
    min/max statistics are tight — a 2-D box predicate skips on either.
    One-dimensional clustering can only serve one of the two columns;
    this is the multi-dimension answer (the Z-order layout classic
    OLAP stores apply before scan-heavy workloads)."""
    (
        df.repartitionByRange(files, zcol)
        .sortWithinPartitions(zcol)
        .write.mode("overwrite")
        .option("parquet.block.size", str(block_bytes))
        .option("parquet.page.size", str(max(1024, block_bytes // 2)))
        .parquet(path)
    )


def row_groups_intersecting_box(path: str, xcol: str, xlo, xhi,
                                ycol: str, ylo, yhi) -> tuple[int, int]:
    """(intersecting, total) row groups whose [min,max] stats overlap the
    2-D box — exactly the set a statistics-pushdown reader must scan."""
    import glob
    import os

    import pyarrow.parquet as pq

    hit = total = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            grp = md.row_group(rg)
            stats = {}
            for c in range(grp.num_columns):
                col = grp.column(c)
                if col.path_in_schema in (xcol, ycol) and col.statistics:
                    stats[col.path_in_schema] = (
                        col.statistics.min, col.statistics.max
                    )
            total += 1
            if xcol not in stats or ycol not in stats:
                # Statistics are writer-optional per column chunk; a
                # group without them can never be pruned, so a
                # statistics-pushdown reader must scan it.
                hit += 1
                continue
            (xmn, xmx) = stats[xcol]
            (ymn, ymx) = stats[ycol]
            if xmx >= xlo and xmn <= xhi and ymx >= ylo and ymn <= yhi:
                hit += 1
    return hit, total
