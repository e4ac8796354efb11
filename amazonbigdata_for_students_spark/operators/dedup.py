"""Dedup operator family beyond exact/MinHash (north star; SURVEY.md U6):
SimHash fingerprints at two fidelities.

* simhash16: portable SQL-expressible variant (md5-nibble top bits) —
  gets a DuckDB oracle (plans/text.py registers it).
* simhash64: the production variant — 64-bit token hashes, bit-majority
  vote, Hamming-distance bucketing — vectorized numpy inside an
  Arrow-batched pandas UDF (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

# --- 64-bit SimHash (pandas UDF path) --------------------------------------

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _fnv1a64(token: str) -> np.uint64:
    """Deterministic 64-bit FNV-1a — stable across runs/processes (Python's
    hash() is salted per process; never use it for data keys)."""
    h = _FNV_OFFSET
    for b in token.encode("utf-8"):
        h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
    return h


def simhash64_udf() -> Column:
    """Arrow-batched SimHash over a tokens array column: per document,
    sum +-1 per bit over token hashes, sign → bit. Returns int64 (the
    64-bit fingerprint reinterpreted as signed)."""

    @F.pandas_udf(T.LongType())
    def simhash64(tokens: pd.Series) -> pd.Series:
        out = np.zeros(len(tokens), dtype=np.int64)
        for i, toks in enumerate(tokens):
            if toks is None or len(toks) == 0:
                continue
            hashes = np.fromiter(
                (_fnv1a64(t) for t in toks), dtype=np.uint64, count=len(toks)
            )
            # bits matrix: (n_tokens, 64) of {0,1} → vote = 2*sum - n
            bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                np.int32
            )
            votes = 2 * bits.sum(axis=0) - len(hashes)
            sig = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sig)
        return pd.Series(out)

    return simhash64


def simhash64_fingerprints(df: DataFrame, tokens_col: str = "toks") -> DataFrame:
    return df.withColumn("simhash64", simhash64_udf()(F.col(tokens_col)))


def simhash_band_candidates(
    fingerprints: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash64",
    n_bands: int = 8,
) -> DataFrame:
    """Near-dup candidate pairs by banded SimHash: split the 64-bit
    signature into n_bands equal bands; docs sharing any band are
    candidates. Pigeonhole bound: a pair at Hamming distance d can differ
    in at most d bands, so every pair with d <= n_bands - 1 is GUARANTEED
    to share an identical band; pairs at d >= n_bands may be missed
    (recall < 1 there). With the default n_bands=8 the candidate set is
    complete for d <= 7. GroupBy-on-band replaces the O(n²) pairwise scan
    — the scalable shape."""
    bands = fingerprints.select(
        id_col,
        sig_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col(sig_col), i * (64 // n_bands))
                        .bitwiseAND(F.lit((1 << (64 // n_bands)) - 1))
                        .alias("key"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, sig_col, F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{sig_col}").alias("sig_a"),
            F.col(f"b.{sig_col}").alias("sig_b"),
        )
        .distinct()
    )


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of XOR — JVM-side bit_count, no UDF."""
    return F.bit_count(a.bitwiseXOR(b))
