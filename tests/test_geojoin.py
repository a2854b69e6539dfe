"""Geo radius join tests (operators/geojoin.py)."""

from __future__ import annotations

from ccgp_data_wrangling_spark.operators.geojoin import (
    geo_radius_join,
    haversine_km,
)


def test_known_distance(spark):
    from pyspark.sql import functions as F

    df = spark.range(1)
    # Paris → London ≈ 343.5 km
    d = df.select(
        haversine_km(
            F.lit(48.8566), F.lit(2.3522), F.lit(51.5074), F.lit(-0.1278)
        ).alias("d")
    ).collect()[0]["d"]
    assert abs(d - 343.5) < 1.0


def test_cell_boundary_pairs_found(spark):
    """Points straddling a grid-cell boundary must still pair — the
    3×3 neighborhood guarantee."""
    # radius 25 km → dlat ≈ 0.2252°; put two points 0.01° apart
    # across a cell edge, plus one far away
    rows = [
        (1, 0.2250, 10.0),
        (2, 0.2260, 10.0),   # ~0.11 km from point 1, different lat cell
        (3, 40.0, -100.0),
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    out = {(r["id_a"], r["id_b"]) for r in geo_radius_join(
        df, "id", "lat", "lon", radius_km=25.0
    ).collect()}
    assert out == {(1, 2)}


def test_antimeridian_limitation_documented(spark):
    """Points across ±180° do NOT pair (documented grid limitation)."""
    rows = [(1, 0.0, 179.99), (2, 0.0, -179.99)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    out = geo_radius_join(df, "id", "lat", "lon", radius_km=25.0).collect()
    assert out == []


def test_max_cell_guard_drops_pileup(spark):
    """A degenerate pile-up cell larger than max_cell is dropped."""
    rows = [(i, 0.0, 0.0) for i in range(50)] + [(100, 10.0, 10.0), (101, 10.001, 10.0)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    out = {(r["id_a"], r["id_b"]) for r in geo_radius_join(
        df, "id", "lat", "lon", radius_km=25.0, max_cell=10
    ).collect()}
    assert out == {(100, 101)}
