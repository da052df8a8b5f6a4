"""Custom Python data source (Spark 4 DataSource API).

The reference reads only text files (``MapRedWord2Vec.scala:61``
TextInputFormat); a complete engine also needs the EXTENSIBLE source
surface — the API a user implements to scan systems Spark has no
built-in connector for (internal services, simulators, bespoke
stores). This module implements it end to end with a deterministic
sensor-reading generator so the scan is oracle-able: the same closed
formula is re-evaluated by DuckDB over ``range()``.

Scale shape: ``partitions()`` declares the parallelism contract —
each ``InputPartition`` carries only its sensor slice, so N executors
scan N disjoint shards with no coordination, exactly like file splits.
The generator is pure arithmetic; a real connector would open its
shard's connection in ``read()``.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

N_SHARDS = 4


def sensor_temp(sensor_id: int, reading_idx: int) -> float:
    """Closed-form deterministic reading — the cross-engine contract
    (IEEE double divide, identical in DuckDB)."""
    return 20.0 + ((sensor_id * 31 + reading_idx * 7) % 100) / 10.0


class SensorDataSource(DataSource):
    """``spark.read.format("sensor_sim")`` — options: sensors, readings."""

    @classmethod
    def name(cls) -> str:
        return "sensor_sim"

    def schema(self) -> str:
        return "sensor_id int, reading_idx int, temp_c double"

    def reader(self, schema) -> "SensorReader":
        return SensorReader(self.options)

    def simpleStreamReader(self, schema) -> "SensorSimpleStreamReader":
        return SensorSimpleStreamReader(self.options)


class SensorReader(DataSourceReader):
    def __init__(self, options):
        self.n_sensors = int(options.get("sensors", 8))
        self.n_readings = int(options.get("readings", 1000))

    def partitions(self):
        return [InputPartition(i) for i in range(N_SHARDS)]

    def read(self, partition):
        shard = partition.value
        for s in range(self.n_sensors):
            if s % N_SHARDS != shard:
                continue
            for r in range(self.n_readings):
                yield (s, r, sensor_temp(s, r))


def register_sensor_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine —
    latest registration wins per the DataSource API contract).

    The module is registered with cloudpickle for BY-VALUE pickling:
    the streaming source runner is a separate Python process that does
    NOT see sparkContext-shipped py-files at planning time, so a
    by-reference pickle (the default for importable modules) raises
    ModuleNotFoundError whenever the driver's cwd isn't the repo root.
    By-value serialization makes the connector location-independent."""
    # PySpark serializes with its VENDORED cloudpickle — registering
    # the standalone cloudpickle package would be a no-op here.
    from pyspark import cloudpickle

    import mapreduce_word2vec_spark.sources.python_datasource as _self

    cloudpickle.register_pickle_by_value(_self)
    spark.dataSource.register(SensorDataSource)


N_STREAM_BLOCKS = 4


class SensorSimpleStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector (Spark 4
    ``SimpleDataSourceStreamReader``): offsets are reading-index
    blocks; each micro-batch delivers one block for every sensor.
    ``read`` past the last block reports no-new-data (same offset), so
    ``processAllAvailable()`` terminates deterministically; replays
    between committed offsets regenerate the same closed-form rows,
    which is the exactly-once contract a real changelog reader must
    honor."""

    def __init__(self, options):
        self.n_sensors = int(options.get("sensors", 8))
        # Honor the SAME 'readings' option as the batch reader (the
        # stream silently pinned 1000 before): fixed 4 blocks, the
        # last block absorbs the remainder.
        self.n_readings = int(options.get("readings", 1000))
        self.per_block = max(1, self.n_readings // N_STREAM_BLOCKS)

    def initialOffset(self):
        return {"block": 0}

    def read(self, start):
        b = int(start["block"])
        if b >= N_STREAM_BLOCKS:
            return iter([]), start
        return iter(self._rows(b)), {"block": b + 1}

    def readBetweenOffsets(self, start, end):
        rows = []
        for b in range(int(start["block"]), int(end["block"])):
            rows.extend(self._rows(b))
        return iter(rows)

    def commit(self, end):
        pass

    def _rows(self, block: int) -> list:
        # Materialized rows wrapped in iter() by the callers: the
        # prefetcher requires an iterator (it calls next() to probe
        # emptiness) that is ALSO picklable for partition planning —
        # a list_iterator is both; a generator pickles not at all.
        base = block * self.per_block
        end = (
            self.n_readings
            if block == N_STREAM_BLOCKS - 1
            else min(base + self.per_block, self.n_readings)
        )
        return [
            (s, r, sensor_temp(s, r))
            for s in range(self.n_sensors)
            for r in range(base, end)
        ]
