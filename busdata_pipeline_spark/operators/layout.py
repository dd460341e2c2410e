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
                    rows_per_group: int = 10_000) -> None:
    """Write ``df`` range-clustered on ``cluster_col``: ranged into
    ``files`` non-overlapping spans, sorted within each, with bounded
    parquet row groups so min/max stats stay selective."""
    (
        df.repartitionByRange(files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .option("parquet.block.size", str(64 * 1024 * 1024))
        .option("spark.sql.parquet.rowGroupSize", str(rows_per_group))
        .option("parquet.page.row.count.limit", str(rows_per_group))
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
