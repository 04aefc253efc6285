"""Custom Python DataSources (Spark 4 `pyspark.sql.datasource` API).

The reference's extract layer is a pull-based HTTP feed client
(pipeline/extract.py: paged ERDDAP requests → DataFrame); the sandbox
has no network, so sources/erddap.py covers the file:// transport. This
module covers the OTHER half of the connector axis: Spark 4's Python
DataSource API, the public mechanism a reference user would employ to
mount ANY custom feed directly into `spark.read.format(...)` /
`spark.readStream.format(...)` without JVM code.

Two sources over one deterministic feed definition:

- `ocean_sensor_feed` (batch): plans `n_parts` InputPartitions, each
  generating its row range independently on an executor — the
  partition-planning contract that makes a custom source scale out
  (100 TB feed → thousands of partitions, no driver bottleneck).
- `ocean_sensor_stream` (streaming): a SimpleDataSourceStreamReader
  with dict offsets {"i": next_row}; micro-batch boundaries are
  offset-range slices, and `readBetweenOffsets` makes replay exact —
  the source is deterministic, so ANY slicing yields the same table.

The feed itself is pure arithmetic — row i carries
sha256("feed:{i%50}:{i//50}") truncated to 24 bits mod 10000 — i.e.
the repo's portable salted-sha256 RNG device, so a DuckDB oracle can
recompute the entire feed from `range(n)` and the registered queries
(queries/connector_ops.py) are value-exact, not rows-only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

FEED_SENSORS = 50
FEED_MOD = 10000


def feed_row(i: int) -> tuple[int, int, int]:
    """Row i of the feed: (sensor_id, tick, reading_centi).

    reading_centi = first 24 bits of sha256("feed:<sensor>:<tick>")
    mod 10000 — reproducible in any engine with sha256 and string
    concat (the DuckDB oracle inlines exactly this formula).
    """
    sid, tick = i % FEED_SENSORS, i // FEED_SENSORS
    h = hashlib.sha256(f"feed:{sid}:{tick}".encode()).hexdigest()
    return sid, tick, int(h[:6], 16) % FEED_MOD


class _FeedBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 10000))
        self.n_parts = max(1, int(options.get("n_parts", 8)))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(p) for p in range(self.n_parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        p = partition.value
        chunk = -(-self.n_rows // self.n_parts)  # ceil-div
        for i in range(p * chunk, min(self.n_rows, (p + 1) * chunk)):
            yield feed_row(i)


class SensorFeedDataSource(DataSource):
    """Batch source: `spark.read.format("ocean_sensor_feed")
    .option("n_rows", N).option("n_parts", P).load()`."""

    @classmethod
    def name(cls) -> str:
        return "ocean_sensor_feed"

    def schema(self) -> str:
        return "sensor_id INT, tick INT, reading_centi INT"

    def reader(self, schema) -> _FeedBatchReader:
        return _FeedBatchReader(self.options)


class _FeedStreamReader(SimpleDataSourceStreamReader):
    """Poll-based stream over the same feed: each micro-batch advances
    the row offset by `batch_rows` until `max_rows`; at the cap, read()
    reports no progress (empty batch, unchanged offset), so
    processAllAvailable() terminates."""

    def __init__(self, options: dict):
        self.batch_rows = int(options.get("batch_rows", 500))
        self.max_rows = int(options.get("max_rows", 2000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["i"]
        hi = min(lo + self.batch_rows, self.max_rows)
        return iter([feed_row(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([feed_row(i) for i in range(start["i"], end["i"])])


class SensorFeedStreamSource(DataSource):
    """Streaming source: `spark.readStream.format("ocean_sensor_stream")`
    with deterministic offset-sliced micro-batches."""

    @classmethod
    def name(cls) -> str:
        return "ocean_sensor_stream"

    def schema(self) -> str:
        return "sensor_id INT, tick INT, reading_centi INT"

    def simpleStreamReader(self, schema) -> _FeedStreamReader:
        return _FeedStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Idempotently register both sources on a session (re-registration
    overwrites, verified on 4.1.2 — safe for repeated query calls)."""
    spark.dataSource.register(SensorFeedDataSource)
    spark.dataSource.register(SensorFeedStreamSource)
