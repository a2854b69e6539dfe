"""Geo radius join: "pairs of points within r km" without a cross
join.

The reference pipeline works with specimen lat/long coordinates
(utils/parse.py coordinate cleaning, create_sheets_ultimate.py
geocoding / coordinate masking); finding nearby specimens —
duplicate collection events, locality clustering — is the natural
next query, and the naive answer is an O(n²) distance matrix.

Scale shape (grid blocking): bucket every point into a Δ°×Δ° cell,
equi-join each point's cell against its 3×3 cell neighborhood
(generated with one ``explode`` of 9 offsets — candidate generation
is a plain shuffle join on cell keys), then verify true distance.
Δ is chosen so r km fits inside one cell (Δ° ≥ r/111.0 at the
equator, padded for longitude shrink at the corpus's max |lat|);
every true pair is then guaranteed to share at least one of the 9
cells — no recall loss, candidates bounded by local point density,
not corpus size. The classic skew guard applies: a ``max_cell``
cap drops pathological pile-ups (a default coordinate like (0, 0)
at 100 TB would otherwise square).

Distance: one haversine evaluation per CANDIDATE pair (never per
all-pair). The trig terms follow the repo's libm policy — the final
distance is rounded to 3 dp (meters) before the threshold compare,
and the DuckDB oracle replays the identical formula; sin/cos/atan2
agree between the JVM and DuckDB at far finer than 3 dp for
coordinate-range inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["haversine_km", "geo_radius_join"]

#: mean Earth radius, km (IUGG).
EARTH_R_KM = 6371.0088


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km, rounded to 3 dp (≈ meter)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2
    dl = F.radians(lon2 - lon1) / 2
    a = F.sin(dp) * F.sin(dp) + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    return F.round(
        2 * EARTH_R_KM * F.atan2(F.sqrt(a), F.sqrt(1 - a)), 3
    )


def geo_radius_join(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    *,
    radius_km: float,
    max_abs_lat: float = 66.0,
    max_cell: int = 10_000,
) -> DataFrame:
    """Self-join: ``(id_a < id_b, dist_km ≤ radius_km)`` pairs.

    ``max_abs_lat`` bounds the latitudes the grid must stay sound
    for: cell width Δ° = radius/111 · 1/cos(max_abs_lat) in
    longitude keeps r km inside one cell even where meridians
    converge (points beyond the bound still join correctly in
    latitude but may miss longitude-wrapped pairs — polar data needs
    a dedicated projection, documented limitation).
    """
    import math

    dlat = radius_km / 111.0
    dlon = radius_km / (111.0 * math.cos(math.radians(max_abs_lat)))
    pts = df.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
        F.floor(F.col(lat_col) / dlat).cast("long").alias("cy"),
        F.floor(F.col(lon_col) / dlon).cast("long").alias("cx"),
    )
    # left side: each point replicated into its 3×3 neighborhood so
    # the join itself is a plain equi-join on the (cy, cx) cell key
    offsets = F.array(
        *[
            F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    left = pts.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.explode(offsets).alias("o"),
        "cy",
        "cx",
    ).select(
        "id_a",
        "lat_a",
        "lon_a",
        (F.col("cy") + F.col("o.dy")).alias("cy"),
        (F.col("cx") + F.col("o.dx")).alias("cx"),
    )
    # skew guard on the un-replicated side
    cell_sizes = pts.groupBy("cy", "cx").agg(F.count(F.lit(1)).alias("n"))
    right = pts.join(
        cell_sizes.where(F.col("n") <= max_cell).select("cy", "cx"),
        ["cy", "cx"],
    ).select(
        "cy",
        "cx",
        F.col("id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
    )
    dist = haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        left.join(right, ["cy", "cx"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("dist_km"))
        .where(F.col("dist_km") <= radius_km)
        .dropDuplicates(["id_a", "id_b"])
    )
