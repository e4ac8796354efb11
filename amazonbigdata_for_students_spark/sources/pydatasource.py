"""Custom connector via the Python Data Source API (Spark 4).

The reference's batch ingress is an hourly CSV layout on object storage
(`generator.py:241-245` — one headered file per hour at
``prefix/YYYY/MM/DD/HH.csv``). Besides the built-in-reader path
(`readers.read_hourly_csv`), this module exposes the same layout as a
from-scratch ``DataSource`` — the shape a production connector
(Kafka/Kinesis/JDBC/SaaS API) takes when no built-in source fits:

- the DRIVER plans splits: ``partitions()`` lists the leaf files and
  derives the (year, month, day, hour) partition values from each path —
  pure metadata, no row is read at planning time;
- each EXECUTOR task reads exactly one ``InputPartition`` independently
  in ``read()`` — so parallelism scales with the number of hourly files,
  and a 100 TB archive fans out across the cluster with no coordination
  beyond the initial listing.

Arrow moves the Python-produced batches to the JVM; downstream plans
(aggregates, joins) run JVM-side as usual.
"""

from __future__ import annotations

import csv
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class HourlyFilePartition(InputPartition):
    """One hourly CSV file = one split; carries the path-derived
    partition-column values so executors never re-parse paths."""

    def __init__(self, path: str, year: int, month: int, day: int, hour: int):
        self.path = path
        self.year = year
        self.month = month
        self.day = day
        self.hour = hour


class HourlyCsvReader(DataSourceReader):
    def __init__(self, options: dict):
        root = options.get("path")
        if not root:
            raise ValueError("hourly_csv source requires .option('path', <root>)")
        self.root = root

    def partitions(self) -> list[InputPartition]:
        # the ONE listing implementation (shared with the stream reader's
        # offset space — see _list_hourly_files)
        return _list_hourly_files(self.root)

    def read(self, partition: HourlyFilePartition) -> Iterator[tuple]:
        return _rows_of([partition])


def _list_hourly_files(root: str) -> list[HourlyFilePartition]:
    """Deterministic (path-sorted) listing shared by the batch planner and
    the streaming offset space: index into THIS list is the stream
    offset, so replays between committed offsets re-read exactly the same
    files (the replayability contract exactly-once sinks rely on)."""
    parts: list[HourlyFilePartition] = []
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for f in sorted(files):
            if not f.endswith(".csv"):
                continue
            rel = os.path.relpath(dirpath, root)
            segs = rel.split(os.sep)
            if len(segs) != 3:
                continue  # not a YYYY/MM/DD leaf
            y, m, d = (int(s) for s in segs)
            parts.append(
                HourlyFilePartition(os.path.join(dirpath, f), y, m, d, int(f[:-4]))
            )
    return parts


def _rows_of(parts: list[HourlyFilePartition]) -> Iterator[tuple]:
    for p in parts:
        with open(p.path, newline="") as fh:
            for row in csv.DictReader(fh):
                yield (
                    int(row["event_id"]),
                    row["ts"],
                    int(row["user_id"]),
                    row["event_type"],
                    float(row["value"]),
                    p.year,
                    p.month,
                    p.day,
                    p.hour,
                )


class HourlyCsvStreamReader(SimpleDataSourceStreamReader):
    """Streaming leg of the connector (Spark 4 Python streaming data
    source): the hourly archive consumed INCREMENTALLY, ``filesPerBatch``
    files per micro-batch. The offset is {"idx": files_consumed} into the
    path-sorted listing — the file-position-offset pattern every
    archive/queue connector uses (Kinesis sequence numbers, JDBC
    high-water marks). ``read`` advances the offset; ``readBetweenOffsets``
    replays a committed range byte-identically, which is what lets the
    engine recover a failed batch without duplicating or dropping rows.

    SimpleDataSourceStreamReader executes driver-side by design (the
    prototype tier of the API); a production connector for this layout
    would implement the partitioned ``streamReader`` so each micro-batch
    fans its files across executors — same offset algebra, per-partition.
    """

    def __init__(self, options: dict):
        root = options.get("path")
        if not root:
            raise ValueError("hourly_csv source requires .option('path', <root>)")
        self.root = root
        self.per_batch = int(options.get("filesPerBatch", "8"))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        files = _list_hourly_files(self.root)
        i = int(start["idx"])
        j = min(i + self.per_batch, len(files))
        # iter(list(...)): the engine consumes an ITERATOR into its
        # prefetch cache (next()-driven) AND pickles the remainder on
        # handoff — a bare generator fails pickling, a bare list fails
        # next(); a list_iterator satisfies both
        return iter(list(_rows_of(files[i:j]))), {"idx": j}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        files = _list_hourly_files(self.root)
        return iter(list(_rows_of(files[int(start["idx"]) : int(end["idx"])])))

    def commit(self, end: dict) -> None:
        pass  # archive files need no acknowledgment


class HourlyCsvDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hourly_csv"

    def schema(self) -> str:
        return (
            "event_id bigint, ts string, user_id bigint, event_type string, "
            "value double, year int, month int, day int, hour int"
        )

    def reader(self, schema) -> DataSourceReader:
        return HourlyCsvReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return HourlyCsvStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the hourly_csv format on a session."""
    spark.dataSource.register(HourlyCsvDataSource)
