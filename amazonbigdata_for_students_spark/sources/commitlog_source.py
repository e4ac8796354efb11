"""Commit-log table as a STREAMING source (Spark 4 Python Data Source API).

The write path (``commitlog.py``) gives the table atomic versions; this
module closes the loop by making those versions consumable as a structured
stream — the "table as a change stream" pattern Delta/Iceberg users rely
on for incremental ETL (reference comps. 10-11: long-term storage feeding
downstream jobs without re-scans).

Offsets ARE commit versions: ``latestOffset`` is one log listing,
``partitions(start, end)`` maps each version in ``(start, end]`` to the
data directories its manifest added — pure metadata on the driver, no row
read at planning time — and each executor task reads exactly one delta
directory via pyarrow, yielding Arrow record batches straight to the JVM.
Version-granular offsets make recovery exact: after a checkpoint restart
the stream resumes from the committed version, so every commit is
processed exactly once (``src_commitlog_stream`` drives this end to end
with two availableNow runs over one checkpoint).

At 100 TB: planning cost is O(#commits) JSON reads; read parallelism is
one task per delta dir (compaction keeps that bounded); the stream never
rewinds into compacted history because offsets advance monotonically with
the log.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_PA_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "date32[day]": "date",
}


def _ddl_for(path: str) -> str:
    """Derive the source DDL from one committed file's Arrow schema."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(_one_parquet_file(path))
    cols = []
    for f in schema:
        t = str(f.type)
        if t.startswith("timestamp"):
            ddl = "timestamp"
        elif t.startswith("decimal"):
            ddl = t
        else:
            ddl = _PA_DDL.get(t)
            if ddl is None:
                raise ValueError(f"commitlog source: unmapped arrow type {t}")
        cols.append(f"{f.name} {ddl}")
    return ", ".join(cols + ["_commit_version int"])


def _one_parquet_file(data_dir: str) -> str:
    for f in sorted(os.listdir(data_dir)):
        if f.endswith(".parquet"):
            return os.path.join(data_dir, f)
    raise FileNotFoundError(f"no parquet files in {data_dir}")


class DeltaPartition(InputPartition):
    def __init__(self, data_dir: str, version: int):
        self.data_dir = data_dir
        self.version = version


class CommitLogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("commitlog source requires .option('path', <table dir>)")
        self._commits_dir = os.path.join(path, "_commits")
        self._data_dir = os.path.join(path, "data")

    # -- log inspection (driver-side metadata only) -----------------------
    def _snapshot(self) -> list[dict]:
        manifests = []
        for i, name in enumerate(sorted(os.listdir(self._commits_dir))):
            if not name.endswith(".json"):
                continue
            if name != f"{i:012d}.json":
                break  # contiguous prefix only — same torn-read guard as reads
            with open(os.path.join(self._commits_dir, name)) as f:
                manifests.append(json.load(f))
        return manifests

    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        return {"version": len(self._snapshot()) - 1}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        parts: list[InputPartition] = []
        for m in self._snapshot():
            v = m["version"]
            if start["version"] < v <= end["version"]:
                parts.extend(
                    DeltaPartition(os.path.join(self._data_dir, t), v)
                    for t in m.get("adds", ())
                )
        return parts

    def read(self, partition: DeltaPartition) -> Iterator:
        """Executor-side: stream one delta dir as Arrow batches (never a
        row-at-a-time Python loop), appending the version column."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        for f in sorted(os.listdir(partition.data_dir)):
            if not f.endswith(".parquet"):
                continue
            table = pq.read_table(os.path.join(partition.data_dir, f))
            vcol = pa.array([partition.version] * len(table), type=pa.int32())
            yield from table.append_column("_commit_version", vcol).to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; the log itself is immutable


class CommitLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "commitlog"

    def schema(self) -> str:
        log_path = self.options.get("path")
        snap_dir = os.path.join(log_path, "_commits")
        for name in sorted(os.listdir(snap_dir)):
            if name.endswith(".json"):
                with open(os.path.join(snap_dir, name)) as f:
                    m = json.load(f)
                if m.get("adds"):
                    return _ddl_for(
                        os.path.join(log_path, "data", m["adds"][0])
                    )
        raise ValueError("commitlog source: empty log, cannot infer schema")

    def streamReader(self, schema) -> DataSourceStreamReader:
        return CommitLogStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the commitlog streaming format."""
    spark.dataSource.register(CommitLogDataSource)
