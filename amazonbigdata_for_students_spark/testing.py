"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registered query's Spark side and its DuckDB oracle over the same
parquet tables and compares row count, column names, and an
order-insensitive value comparison (rows sorted, columns sorted by name),
so every mismatch the driver would flag is reproducible locally first.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):
            # Spark-written table (gen_sf.py output): a directory of part
            # files rather than the driver testdata's single file
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<NULL>"
        if pd.isna(v):
            return "<NULL>"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"{int(v)}.0"
            return repr(v)
        if isinstance(v, (bool,)):
            return str(bool(v))
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    out = df.map(norm)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare_query(spark, q, sf_dir: str, con=None) -> CompareResult:
    """Run one registry Query against its oracle; None oracle => rows-only."""
    sdf = q.fn(spark, sf_dir)
    spdf = sdf.toPandas()
    if q.oracle is None:
        return CompareResult(q.name, True, f"rows-only: {len(spdf)} rows")
    close = con is None
    con = con or duckdb_connect(sf_dir)
    try:
        odf = con.execute(q.oracle).fetchdf()
    finally:
        if close:
            con.close()
    if len(spdf) != len(odf):
        return CompareResult(q.name, False, f"row count: spark={len(spdf)} oracle={len(odf)}")
    if sorted(spdf.columns) != sorted(odf.columns):
        return CompareResult(
            q.name, False, f"columns: spark={sorted(spdf.columns)} oracle={sorted(odf.columns)}"
        )
    if len(spdf) == 0:
        return CompareResult(q.name, True, "0 rows (both empty)")
    a, b = _canon(spdf), _canon(odf)
    if a.equals(b):
        return CompareResult(q.name, True, f"{len(spdf)} rows")
    diff_mask = (a != b).any(axis=1)
    idx = diff_mask[diff_mask].index[:3]
    lines = []
    for i in idx:
        for c in a.columns:
            if a.at[i, c] != b.at[i, c]:
                lines.append(f"row {i} col {c}: spark={a.at[i, c]!r} oracle={b.at[i, c]!r}")
    return CompareResult(q.name, False, f"{diff_mask.sum()} differing rows; " + "; ".join(lines[:6]))
