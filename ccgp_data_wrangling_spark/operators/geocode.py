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

import math
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
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


# Reference parity constants (create_sheets_ultimate.py:641-732):
# invalid/NaN coordinates → 'not provided' (:679,:684); a geocoder miss
# → 'USA:California,' including the trailing comma (:717).
NOT_PROVIDED = "not provided"
SERVICE_MISS = "USA:California,"

GeocodeService = Callable[[float, float], "str | None"]


def service_reverse_geocode(
    df: DataFrame,
    lat_col: str,
    long_col: str,
    *,
    service: GeocodeService | None = None,
    out_col: str = "geo_loc",
    max_calls_per_sec: float | None = 1.0,
    service_partitions: int = 1,
) -> DataFrame:
    """Reverse geocode via an injected service, with the offline
    :func:`reverse_geocode_expr` as the no-service fallback.

    Contract matches the reference loop (create_sheets_ultimate.py:
    641-732): invalid/NaN coordinates → ``'not provided'``; a service
    miss (``None``) → ``'USA:California,'`` (the reference's literal
    fallback, trailing comma included); otherwise the service's
    ``'country:state'`` string verbatim.

    Scale shape — the part the reference's per-row loop gets wrong:

    * the service is called once per DISTINCT coordinate pair, never
      per row: distinct() first, then the looked-up dimension
      broadcast-joins back onto the fact table;
    * the distinct pairs are coalesced onto ``service_partitions``
      tasks (default 1) because a rate-limited external API is a
      per-client budget, not a parallelizable resource — 1000 executors
      hammering Nominatim is a ban, not a speedup;
    * ``max_calls_per_sec`` enforces the budget inside the task with
      inter-call sleeps (Nominatim's published policy is 1 req/s);
      an in-task dict also memoizes within the partition;
    * offline mode (``service=None``) is a pure Column expression —
      zero shuffle, zero Python.
    """
    if service is None:
        return df.withColumn(
            out_col, reverse_geocode_expr(F.col(lat_col), F.col(long_col))
        )

    interval = 1.0 / max_calls_per_sec if max_calls_per_sec else 0.0

    def lookup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        seen: dict[tuple[float, float], str] = {}
        last_call = 0.0
        for pdf in batches:
            out = []
            for lat, lng in zip(pdf["__lat"], pdf["__long"]):
                key = (lat, lng)
                if key not in seen:
                    wait = last_call + interval - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                    last_call = time.monotonic()
                    got = service(float(lat), float(lng))
                    seen[key] = got if got is not None else SERVICE_MISS
                out.append(seen[key])
            yield pd.DataFrame(
                {"__lat": pdf["__lat"], "__long": pdf["__long"], out_col: out}
            )

    valid = (
        F.col(lat_col).isNotNull()
        & F.col(long_col).isNotNull()
        & ~F.isnan(lat_col)
        & ~F.isnan(long_col)
    )
    coords = (
        df.where(valid)
        .select(
            F.col(lat_col).cast("double").alias("__lat"),
            F.col(long_col).cast("double").alias("__long"),
        )
        .distinct()
        .coalesce(service_partitions)
    )
    dim = coords.mapInPandas(
        lookup, schema=f"__lat double, __long double, {out_col} string"
    )
    joined = df.join(
        F.broadcast(dim),
        (F.col(lat_col).cast("double") == F.col("__lat"))
        & (F.col(long_col).cast("double") == F.col("__long")),
        "left",
    ).drop("__lat", "__long")
    return joined.withColumn(out_col, F.coalesce(out_col, F.lit(NOT_PROVIDED)))


def offline_box_service(lat: float, long: float) -> str | None:
    """A deterministic in-process ``GeocodeService``: the REGION_BOXES
    lookup with the service-side country naming (reference maps
    'United States' → 'USA' at create_sheets_ultimate.py:696).
    Returns ``None`` (miss) outside every box, so the operator's
    SERVICE_MISS branch is exercised without any network.
    """
    if math.isnan(lat) or math.isnan(long):
        return None
    for state, lat_min, lat_max, long_min, long_max in REGION_BOXES:
        if lat_min <= lat <= lat_max and long_min <= long <= long_max:
            return f"USA:{state}"
    return None
