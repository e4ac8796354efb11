"""Skew-mitigation helpers (SURVEY.md §4 item 2d).

Bot IPs are hot keys by construction (reference:
log-generator/generator.py:137-154): one key can carry orders of
magnitude more rows than the median. AQE's skew-join splitting covers the
join case; these helpers cover aggregation and give an explicit salted
join for when AQE is unavailable (e.g. streaming micro-batches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    salt_buckets: int = 16,
    final_aggs: list[Column] | None = None,
) -> DataFrame:
    """Two-phase aggregation under a salt: phase 1 aggregates on
    (keys, salt) — splitting a hot key across `salt_buckets` reducers —
    phase 2 merges partials on keys alone. `aggs` are the phase-1
    aggregates (aliased); `final_aggs` merge them (default: sum columns
    named like phase-1 outputs).

    For algebraic aggregates Spark's own partial aggregation already does
    this map-side; salting matters when the *reduce* side of one key
    exceeds a single task (extreme skew) or for non-algebraic aggregates.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(*aggs)
    agg_names = [c for c in partial.columns if c not in (*keys, "_salt")]
    final_aggs = final_aggs or [F.sum(c).alias(c) for c in agg_names]
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed large-left x small-right equi-join without AQE: salt the
    left's key, explode the right across every salt value, join on
    (key, salt). Right side grows `salt_buckets`x — use only when right
    is broadcast-sized but a plain broadcast is not available."""
    l_salted = left.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    r_exploded = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = l_salted.join(r_exploded, [key, "_salt"], how)
    return out.drop("_salt")
