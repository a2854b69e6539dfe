"""Service-backed reverse geocode: injected-service path, call budget,
miss/invalid fallbacks, offline fallback when no service configured.

The injected services are defined as closures (cloudpickle ships them
by value to executor workers) and record their calls in a temp file —
executor processes share the filesystem but not the test's memory.
"""

import time

from ccgp_data_wrangling_spark.operators.geocode import (
    NOT_PROVIDED,
    SERVICE_MISS,
    offline_box_service,
    service_reverse_geocode,
)


def _logging_service(log_path):
    def service(lat, long):
        with open(log_path, "a") as fh:
            fh.write(f"{lat},{long}\n")
        return offline_box_service(lat, long)

    return service


def _read_log(log_path):
    with open(log_path) as fh:
        return sorted(
            tuple(float(x) for x in line.split(",")) for line in fh if line.strip()
        )


def _pts(spark, rows):
    return spark.createDataFrame(rows, "sample string, lat double, long double")


def test_service_called_once_per_distinct_coord(spark, tmp_path):
    log = str(tmp_path / "calls.log")
    open(log, "w").close()
    df = _pts(
        spark,
        [
            ("s1", 36.5, -119.0),  # California
            ("s2", 36.5, -119.0),  # duplicate coord — no extra call
            ("s3", 44.0, -120.0),  # Oregon
            ("s4", 10.0, 10.0),    # no box → service miss
            ("s5", None, None),    # invalid → never reaches the service
        ],
    )
    out = dict(
        service_reverse_geocode(
            df, "lat", "long", service=_logging_service(log), max_calls_per_sec=None
        )
        .select("sample", "geo_loc")
        .collect()
    )
    assert out == {
        "s1": "USA:California",
        "s2": "USA:California",
        "s3": "USA:Oregon",
        "s4": SERVICE_MISS,
        "s5": NOT_PROVIDED,
    }
    # one call per DISTINCT valid coordinate, none for nulls
    assert _read_log(log) == [(10.0, 10.0), (36.5, -119.0), (44.0, -120.0)]


def test_rate_limit_spaces_calls(spark, tmp_path):
    log = str(tmp_path / "calls.log")
    open(log, "w").close()

    def stamping_service(lat, long):
        with open(log, "a") as fh:
            fh.write(f"{time.monotonic()}\n")
        return "USA:Test"

    df = _pts(spark, [("a", 36.5, -119.0), ("b", 44.0, -120.0), ("c", 33.0, -112.0)])
    service_reverse_geocode(
        df, "lat", "long", service=stamping_service, max_calls_per_sec=20.0
    ).collect()
    with open(log) as fh:
        stamps = sorted(float(line) for line in fh if line.strip())
    assert len(stamps) == 3
    # 3 calls at 20 req/s → consecutive calls ≥ ~50 ms apart
    assert all(b - a >= 0.045 for a, b in zip(stamps, stamps[1:]))


def test_no_service_falls_back_to_offline_expr(spark):
    df = _pts(spark, [("a", 36.5, -119.0), ("b", 10.0, 10.0)])
    out = dict(
        service_reverse_geocode(df, "lat", "long")
        .select("sample", "geo_loc")
        .collect()
    )
    # offline path: out-of-region is 'not provided' (no service to miss)
    assert out == {"a": "USA:California", "b": NOT_PROVIDED}
    # and it is a pure Column plan: no mapInPandas / python eval node
    plan = (
        service_reverse_geocode(df, "lat", "long")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan


def test_service_df_plan_has_single_broadcast_join(spark):
    df = _pts(spark, [("a", 36.5, -119.0)])
    plan = (
        service_reverse_geocode(
            df, "lat", "long", service=offline_box_service, max_calls_per_sec=None
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
