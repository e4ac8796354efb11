"""Geospatial operators (extension surface): the grid-blocked radius
join — the candidates-then-verify pattern (same family as the shingle/
simhash dedups) applied to coordinates, which is how distributed
engines run "pairs within d km" without an O(n²) cross join.

Determinism discipline: positions derive from md5 bits of the stable
user key (integer math), the blocking grid is pure integer floor
division, and the haversine distance is rounded to 4 decimals (≈10 cm)
before the threshold compare and the output — absorbing any last-bit
libm difference between engines, the txt_perplexity_filter precedent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.readers import load_table
from .registry import REGISTRY, query

# A ~55 km x ~42 km metro box: lat in [40.0, 40.5), lon in [-74.0, -73.5).
# u20a/u20b = 20-bit md5 draws => position granularity ~0.5/2^20 deg.
_RADIUS_KM = 5.0
# Lossless blocking needs cell edge >= radius on BOTH axes; the lon axis is
# the binding one at 40°N: 0.06° * 111 km * cos(40°) ≈ 5.1 km >= 5 km.
# (tests/test_operators.py proves recall == brute force.)
_CELL_DEG = 0.06
_EARTH_KM = 6371.0

_POS_SQL = """
    pos AS (
      SELECT user_id,
             40.0 + 0.5 * ({ua} / 1048576.0) AS lat,
             -74.0 + 0.5 * ({ub} / 1048576.0) AS lon
      FROM (SELECT DISTINCT user_id FROM events)
    )
""".format(
    ua="(" + " + ".join(
        f"CAST(strpos('0123456789abcdef', substring(md5('lat|' || CAST(user_id AS VARCHAR)), {i}, 1)) - 1 AS BIGINT) * {16 ** (5 - i)}"
        for i in range(1, 6)
    ) + ")",
    ub="(" + " + ".join(
        f"CAST(strpos('0123456789abcdef', substring(md5('lon|' || CAST(user_id AS VARCHAR)), {i}, 1)) - 1 AS BIGINT) * {16 ** (5 - i)}"
        for i in range(1, 6)
    ) + ")",
)



def _user_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, lat, lon, cy, cx): md5-derived positions bucketed into the
    blocking grid — shared by the plain and salted radius joins."""
    ev = load_table(spark, sf_dir, "events").select("user_id").distinct()

    def u20(seed: str) -> F.Column:
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + "|"), F.col("user_id").cast("string"))), 1, 5
            ),
            16,
            10,
        ).cast("long")

    pos = ev.select(
        "user_id",
        (F.lit(40.0) + 0.5 * (u20("lat") / F.lit(1048576.0))).alias("lat"),
        (F.lit(-74.0) + 0.5 * (u20("lon") / F.lit(1048576.0))).alias("lon"),
    )
    return pos.select(
        "user_id",
        "lat",
        "lon",
        F.floor(F.col("lat") / _CELL_DEG).cast("long").alias("cy"),
        F.floor(F.col("lon") / _CELL_DEG).cast("long").alias("cx"),
    )


def _ring_lhs(cells: DataFrame) -> DataFrame:
    """One side exploded into its 3x3 neighbor-cell ring."""
    return (
        cells.withColumn("dy", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])))
        .withColumn("dx", F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])))
        .select(
            F.col("user_id").alias("user_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
            (F.col("cy") + F.col("dy")).alias("cy"),
            (F.col("cx") + F.col("dx")).alias("cx"),
        )
    )


def _haversine() -> F.Column:
    # lazy: Column construction needs an active SparkContext
    return F.round(
        2
        * _EARTH_KM
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("lat_b") - F.col("lat_a")) / 2), 2)
                + F.cos(F.radians("lat_a"))
                * F.cos(F.radians("lat_b"))
                * F.pow(F.sin(F.radians(F.col("lon_b") - F.col("lon_a")) / 2), 2)
            )
        ),
        4,
    )


@query(
    "geo_radius_join",
    oracle=f"""
    WITH {_POS_SQL},
    cells AS (
      SELECT user_id, lat, lon,
             CAST(floor(lat / {_CELL_DEG}) AS BIGINT) AS cy,
             CAST(floor(lon / {_CELL_DEG}) AS BIGINT) AS cx
      FROM pos
    ),
    lhs AS (
      SELECT c.user_id, c.lat, c.lon, c.cy + dy.d AS cy, c.cx + dx.d AS cx
      FROM cells c,
           (SELECT unnest([-1, 0, 1]) AS d) dy,
           (SELECT unnest([-1, 0, 1]) AS d) dx
    ),
    pairs AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             round(2 * {_EARTH_KM} * asin(sqrt(
               pow(sin(radians(b.lat - a.lat) / 2), 2)
               + cos(radians(a.lat)) * cos(radians(b.lat))
                 * pow(sin(radians(b.lon - a.lon) / 2), 2)
             )), 4) AS dist_km
      FROM lhs a JOIN cells b ON a.cy = b.cy AND a.cx = b.cx
      WHERE a.user_id < b.user_id
    )
    SELECT user_a, user_b, dist_km
    FROM pairs
    WHERE dist_km <= {_RADIUS_KM}
    """,
    tags=("J8", "F4", "F8"),
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked spatial radius join — all user pairs within
    {RADIUS} km, the proximity primitive under geofenced alerting,
    contact tracing, and store-visit attribution. The scalable shape:
    bucket every point into a {CELL}° grid cell (integer floor — exact),
    explode one side into its 3x3 neighbor ring (the ring covers the
    radius by construction: cell edge >= radius on both axes), hash-join on
    the cell key, then verify candidates with the exact haversine — a
    candidates-then-verify plan identical in spirit to the shingle-
    blocked dedup joins, never an all-pairs product. Positions are
    md5-derived integers (deterministic, partition-independent);
    distances round to 4 decimals (~10 cm) before the threshold and the
    output, so both engines agree exactly even at the radius boundary.
    At 100 TB: candidate volume follows points-per-cell density (tune
    cell size to radius), the join is a plain equi-join AQE can size,
    and skewed megacity cells are exactly the salted-join case."""
    cells = _user_cells(spark, sf_dir)
    lhs = _ring_lhs(cells)
    rhs = cells.select(
        F.col("user_id").alias("user_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        "cy",
        "cx",
    )
    return (
        lhs.join(rhs, ["cy", "cx"])
        .filter(F.col("user_a") < F.col("user_b"))
        .select("user_a", "user_b", _haversine().alias("dist_km"))
        .filter(F.col("dist_km") <= _RADIUS_KM)
    )


# Salting knobs for the hot-cell variant: a cell with more than _HOT_MEMBERS
# resident points is "hot" (a megacity cell) and its resident side is split
# across _N_SALTS sub-buckets. 4 is tuned so the committed testdata exercises
# both branches (sf0.01 cells hold 1..7 members, avg 2.3); production sets it
# to the per-task candidate budget (e.g. 10^4-10^5 members).
_HOT_MEMBERS = 4
_N_SALTS = 8


@query(
    "geo_radius_join_salted",
    oracle=REGISTRY["geo_radius_join"].oracle,
    tags=("J8", "J7", "F8"),
)
def geo_radius_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened twin of geo_radius_join (the salted-cell variant its
    docstring promises — VERDICT r5 item 4): identical answer, bounded
    per-task candidate groups when point density is zipfy (megacity
    cells). Mechanics — the salted_hot_key_join pattern applied to a
    blocked SELF join: per-cell member counts (one aggregate over the
    cell census, broadcastable because the grid is bounded) mark hot
    cells; the resident (rhs) side keeps ONE row per point, salted by
    xxhash64(user_id) % {_N_SALTS}; the ring-exploded (lhs) side
    replicates across all {_N_SALTS} salts for hot target cells only
    (cold cells join on salt 0 with no replication). The join key grows
    to (cy, cx, salt), so a hot cell's candidate group shrinks by the
    salt fan-out while every pair is still produced exactly once —
    recall == the unsalted plan by construction, and the shared oracle
    hash-gates it. This is the fallback for when AQE skew-splitting
    cannot help: AQE splits a skewed PARTITION, but a single monster
    cell is one JOIN KEY and can only be subdivided by salting."""
    cells = _user_cells(spark, sf_dir)
    counts = cells.groupBy("cy", "cx").agg(F.count("*").alias("n_members"))
    hot = counts.filter(F.col("n_members") > _HOT_MEMBERS).select(
        "cy", "cx", F.lit(True).alias("is_hot")
    )
    # rhs: one row per point; hot cells spread members over _N_SALTS buckets
    rhs = (
        cells.join(F.broadcast(hot), ["cy", "cx"], "left")
        .select(
            F.col("user_id").alias("user_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
            "cy",
            "cx",
            F.when(
                F.col("is_hot"),
                F.pmod(F.xxhash64("user_id"), F.lit(_N_SALTS)).cast("int"),
            )
            .otherwise(F.lit(0))
            .alias("salt"),
        )
    )
    # lhs: ring-exploded probes replicate across salts for hot cells only
    lhs = (
        _ring_lhs(cells)
        .join(F.broadcast(hot), ["cy", "cx"], "left")
        .withColumn(
            "salt",
            F.explode(
                F.when(
                    F.col("is_hot"),
                    F.array(*[F.lit(i) for i in range(_N_SALTS)]),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("is_hot")
    )
    return (
        lhs.join(rhs, ["cy", "cx", "salt"])
        .filter(F.col("user_a") < F.col("user_b"))
        .select("user_a", "user_b", _haversine().alias("dist_km"))
        .filter(F.col("dist_km") <= _RADIUS_KM)
    )
