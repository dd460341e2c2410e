"""S1/S2 as a first-class Spark data source (Spark 4 Python DataSource
API).

``sources/collector.py`` expresses the reference's HTTP fan-out
(/root/reference/data_collector.py:36,54-66,176-188) as a ``mapInPandas``
over an id DataFrame; this module re-expresses the same contract at the
layer a Spark user expects a *source* to live:

    spark.read.format("breadcrumbs")
         .option("n_vehicles", "199").option("parts", "8").load()

Each ``InputPartition`` owns a slice of the vehicle-id range, so the
fetch fan-out IS the source's partitioning — on a cluster, partitions
spread across executors, task retries are fetch retries, and downstream
operators see an ordinary partitioned DataFrame.  The fetcher is
resolved by NAME (options are strings — a data source cannot smuggle a
callable), with the same offline posture as the collector: ``fake`` is
the deterministic stub, ``http`` names the production fetcher that this
container deliberately leaves unimplemented.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: DDL of the produced rows — the raw breadcrumb fields keyed by vehicle
#: (matches collector.FETCHED field-for-field).
BREADCRUMB_DDL = (
    "EVENT_NO_TRIP bigint, EVENT_NO_STOP bigint, OPD_DATE string, "
    "METERS double, ACT_TIME bigint, GPS_LATITUDE double, "
    "GPS_LONGITUDE double, VEHICLE_ID int"
)

_COLS = [c.split()[0] for c in BREADCRUMB_DDL.split(", ")]


class BreadcrumbDataSource(DataSource):
    """format name ``breadcrumbs``; options:

    - ``n_vehicles`` (default 199, the reference's fleet size) — ids
      1..n, or ``first_id`` to offset;
    - ``parts`` (default 8) — number of input partitions (the fan-out
      width; the reference's MAX_WORKERS=10 analog);
    - ``fetch`` (default ``fake``) — fetcher name.
    """

    @classmethod
    def name(cls) -> str:
        return "breadcrumbs"

    def schema(self) -> str:
        return BREADCRUMB_DDL

    def reader(self, schema) -> "BreadcrumbReader":
        return BreadcrumbReader(self.options)


class BreadcrumbReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.first_id = int(options.get("first_id", 1))
        self.n_vehicles = int(options.get("n_vehicles", 199))
        self.parts = max(1, int(options.get("parts", 8)))
        self.fetch = options.get("fetch", "fake")

    def partitions(self):
        ids = list(range(self.first_id, self.first_id + self.n_vehicles))
        step = -(-len(ids) // self.parts)
        return [
            InputPartition(ids[i:i + step])
            for i in range(0, len(ids), step)
        ]

    def read(self, partition):
        # Executor-side: resolve the fetcher by name and pull each
        # vehicle in this partition's slice.  Import inside read() —
        # the reader object must pickle without engine modules loaded.
        from busdata_pipeline_spark.sources.collector import (
            fake_fetcher,
            http_fetcher,
        )

        fetcher = {"fake": fake_fetcher, "http": http_fetcher}[self.fetch]
        for vid in partition.value:
            for rec in fetcher(vid) or []:
                row = dict(rec)
                row["VEHICLE_ID"] = vid
                yield tuple(row.get(c) for c in _COLS)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(BreadcrumbDataSource)
