"""X11 reverse geocoding — offline, deterministic.

The reference calls Nominatim per sample inside a Python loop
(``create_sheets_ultimate.py:641-732``: geolocator at :643, reverse at
:687, 'country:state' formatting, invalid/NaN → 'not provided').
A network geocoder is non-deterministic and rate-limited — the engine
replaces it with an offline point-in-region lookup with the same
output contract:

    (lat, long) → 'USA:<State>' | 'not provided'

``REGION_BOXES`` ships a coarse western-US box set sufficient for the
reference's CCGP domain (California + neighbors). With a handful of
regions the right physical plan is a chained ``when`` over literals —
pure whole-stage codegen, zero shuffle, no join. For a real polygon
table (thousands of regions) the same contract is served by a
broadcast range join on a coarse grid cell (equi-join on cell id,
then exact point-in-polygon on the few candidates); a service-backed
variant belongs behind ``mapPartitions`` with rate limiting. Tests
pin the offline path (SURVEY.md §7.4 determinism requirement).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (state, lat_min, lat_max, long_min, long_max) — coarse, deterministic;
# earlier entries win on overlap.
REGION_BOXES: list[tuple[str, float, float, float, float]] = [
    ("California", 32.5, 42.0, -124.5, -114.1),
    ("Oregon", 42.0, 46.3, -124.6, -116.5),
    ("Nevada", 35.0, 42.0, -120.0, -114.0),
    ("Arizona", 31.3, 37.0, -114.8, -109.0),
    ("Washington", 45.5, 49.0, -124.8, -116.9),
]


def reverse_geocode_expr(lat: Column, long: Column) -> Column:
    """'USA:<State>' for the first REGION_BOXES hit, else / on null
    coordinates 'not provided' (the reference's invalid/NaN branch)."""
    expr = F.lit(None).cast("string")
    # build the when-chain back to front so earlier boxes take priority
    for state, lat_min, lat_max, long_min, long_max in reversed(REGION_BOXES):
        hit = (
            (lat >= lat_min)
            & (lat <= lat_max)
            & (long >= long_min)
            & (long <= long_max)
        )
        expr = F.when(hit, F.lit(f"USA:{state}")).otherwise(expr)
    return F.coalesce(expr, F.lit("not provided"))
