"""Custom Python DataSource (Spark 4 DataSource API) for the
CityStream generator — the S6 producer as a first-class pluggable
source instead of a mapped rate source.

`spark.dataSource.register(CityEventDataSource)` then:

    spark.read.format("cityevents").option("n", 1000).load()
    spark.readStream.format("cityevents").option("max_value", 400)
        .option("rows_per_batch", 100).load()

Both emit the rate-source contract (timestamp, value) with the SAME
deterministic (2024-01-01 + 5s·seq) clock as
`generator.city_event_batch`, so `_city_event_projection` maps either
onto the CityEvent shape and the batch twin is bit-identical — the
test pins that.

Scale/semantics notes:
- the batch reader splits the value range into `num_partitions`
  InputPartitions — generation is executor-parallel, not a driver
  loop;
- the stream reader's offset is a plain {"value": n} cursor:
  `latestOffset` advances by `rows_per_batch` per trigger up to
  `max_value` (bounded ⇒ processAllAvailable terminates; unbounded
  rate-style sources never drain), `partitions(start, end)` replays
  any [start, end) slice deterministically, so checkpoint recovery
  re-reads identical rows — exactly the replayability contract a
  Kafka offset range provides (reference S1).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
_STEP_S = 5


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _rows(start: int, end: int):
    for v in range(start, end):
        yield (_EPOCH + timedelta(seconds=v * _STEP_S), v)


class _CityEventBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("num_partitions", 8))

    def partitions(self):
        per = max(1, -(-self.n // self.num_partitions))
        return [_Range(lo, min(lo + per, self.n)) for lo in range(0, self.n, per)]

    def read(self, partition: _Range):
        yield from _rows(partition.start, partition.end)


class _CityEventStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_value = int(options.get("max_value", 1000))

    def initialOffset(self):
        return {"value": 0}

    def latestOffset(self):
        # monotone cursor, capped so a drain-style trigger terminates
        if not hasattr(self, "_cursor"):
            self._cursor = 0
        self._cursor = min(self._cursor + self.rows_per_batch, self.max_value)
        return {"value": self._cursor}

    def partitions(self, start: dict, end: dict):
        return [_Range(start["value"], end["value"])]

    def read(self, partition: _Range):
        yield from _rows(partition.start, partition.end)

    def commit(self, end: dict) -> None:
        pass  # nothing to release: the generator is stateless


class CityEventDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cityevents"

    def schema(self) -> str:
        return "timestamp timestamp, value bigint"

    def reader(self, schema) -> DataSourceReader:
        return _CityEventBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _CityEventStreamReader(self.options)
