"""Approximate nearest-neighbor search (north star U5, scale path).

Brute-force cosine (plans/vectors.py) is exact but O(n) per query — the
right baseline, wrong at 100 TB. The scale path here is random-hyperplane
LSH: h(v) = sign-bits of v·P for a seeded plane matrix P, so candidate
generation is a groupBy on the bucket key (plus multi-probe neighbors)
instead of a scan. Recall vs the exact baseline is the test contract
(approx operators get planted-truth tests, not hash oracles —
SURVEY.md §7 "What's hard" item 4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T


def _planes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, n_bits))


def lsh_bucket_udf(dim: int, n_bits: int = 8, seed: int = 42) -> Column:
    """Arrow-batched bucketer: packs sign(v·P) into an int bucket id.
    The plane matrix is generated deterministically per (dim, n_bits,
    seed) and closed over — pickled once per task, not per row."""
    planes = _planes(dim, n_bits, seed)
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim) — one Arrow batch
        bits = (mat @ planes) > 0
        return pd.Series(bits @ weights)

    return bucket


def ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed top-k: score only vectors whose bucket is within
    `probe_hamming` bit-flips of the query's bucket (multi-probe), then
    exact cosine on the candidates. At scale: bucket counts ~ n/2^bits per
    bucket, and the candidate filter is a broadcast IN-list of bucket ids —
    no shuffle of the embedding table at all. probe_hamming trades recall
    for candidate volume: clustered data needs 1; near-uniform data needs
    2+ (or fewer bits)."""
    dim = len(query_vec)
    bucket = lsh_bucket_udf(dim, n_bits, seed)
    with_buckets = embeddings.withColumn("_bucket", bucket(F.col(vec_col)))

    planes = _planes(dim, n_bits, seed)
    qbits = (np.asarray(query_vec) @ planes) > 0
    weights = (1 << np.arange(n_bits)).astype(np.int64)
    qbucket = int(qbits @ weights)
    probe = [
        qbucket ^ mask
        for mask in range(1 << n_bits)
        if bin(mask).count("1") <= probe_hamming
    ]

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(v, q, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    norm_v = F.sqrt(F.aggregate(F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x))
    norm_q = float(np.linalg.norm(query_vec))
    sim = dot / (norm_v * F.lit(norm_q))

    return (
        with_buckets.filter(F.col("_bucket").isin(probe))
        .select(id_col, F.round(sim, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )
