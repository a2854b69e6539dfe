"""Unit tests for the X-function cleaning library against a golden
Python model of the reference semantics (utils/parse.py:16-105,
250-289). The model reimplements documented behavior — it is not a
code copy.
"""

from __future__ import annotations

import re
import string

import pytest
from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.functions import (
    check_date,
    check_lat,
    check_long,
    clean_name,
    dms2dd,
    fuzzy_ratio,
    impute_default,
    scrub_array,
    scrub_sentinels,
    split_lat,
    split_long,
)

# --------------------------- golden model ---------------------------


def gold_split(s: str | None, which: str):
    if s is None:
        return None
    s = "".join(x for x in s if x not in string.ascii_letters)
    if len(s.split(",")) == 2:
        return s.split(",")[0 if which == "lat" else 1]
    if len(s.split(" ")) == 4:
        return s.split(" ")[0 if which == "lat" else 2]
    if len(s.split("_")) == 2:
        return s.split("_")[0 if which == "lat" else 1]
    return None


def gold_dms2dd(s):
    if s is None:
        return None
    s = str(s)
    if any(d in s for d in ["°", "'", '"']):
        try:
            parts = re.split("[°'\"]+", s)
            if len(parts) == 4:
                deg, mins, secs, direction = parts
                dd = float(deg) + float(mins) / 60 + float(secs) / 3600
                return -dd if direction in ("S", "W") else dd
            if len(parts) == 3:
                deg, mins, direction = parts
                dd = float(deg) + float(mins) / 60
                return -dd if direction in ("S", "W") else dd
            return None
        except ValueError:
            return 0.0
    try:
        return float(s)  # engine: try_cast passthrough (ref defers the cast)
    except ValueError:
        return None


def gold_check_date(s):
    if s is None:
        return None
    if len(str(s).split(",")) == 2:
        return "/".join(str(s).split(","))
    if len(str(s).split("/")) == 3:
        m, d, y = str(s).split("/")
        return f"{y}-{m.zfill(2)}-{d.zfill(2)}"
    return s


# --------------------------- cases ---------------------------

LATLON_CASES = [
    "32.11,128.11",
    "38.05104 N 120.62301 W",
    "33.4_117.2",
    "garbage with spaces everywhere",
    "12.5",
    None,
]

DMS_CASES = [
    "0°51'56.29\"S",
    "10°30'N",
    "45°XX'12\"E",
    "33.77",
    "badvalue",
    None,
]

DATE_CASES = ["3/7/2021", "11/23/1999", "2020,2021", "2021-05-06", "whenever", None]


def _run_one(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(col_fn(F.col("v")).alias("out")).collect()]


def test_split_lat_long(spark):
    got_lat = _run_one(spark, split_lat, LATLON_CASES)
    got_long = _run_one(spark, split_long, LATLON_CASES)
    assert got_lat == [gold_split(v, "lat") for v in LATLON_CASES]
    assert got_long == [gold_split(v, "long") for v in LATLON_CASES]


def test_dms2dd(spark):
    got = _run_one(spark, dms2dd, DMS_CASES)
    want = [gold_dms2dd(v) for v in DMS_CASES]
    for g, w in zip(got, want):
        if w is None:
            assert g is None
        else:
            assert g == pytest.approx(w)


def test_check_date(spark):
    got = _run_one(spark, check_date, DATE_CASES)
    assert got == [gold_check_date(v) for v in DATE_CASES]


def test_check_lat_long(spark):
    vals = ["-33.5", "33.5", "0.0", "0", None, "junk"]
    got_lat = _run_one(spark, check_lat, vals)
    got_long = _run_one(spark, check_long, vals)
    assert got_lat == [33.5, 33.5, 0.0, 0.0, None, None]
    assert got_long == [-33.5, -33.5, 0.0, 0.0, None, None]


def test_clean_name(spark):
    vals = ["CC13.1 SelS", "plain", "a.b.c d", None]
    got = _run_one(spark, clean_name, vals)
    assert got == ["CC13_1_SelS", "plain", "a_b_c_d", None]


def test_scrub_sentinels(spark):
    vals = ["Not determined yet", "   ", "", "NaN", "not provided", "keep me", None]
    got = _run_one(spark, scrub_sentinels, vals)
    assert got == [None, None, None, None, None, "keep me", None]


def test_scrub_array(spark):
    df = spark.createDataFrame(
        [(["a.fq.gz", "", "NaN", "b.fq.gz", "nan"],), (None,)], "v array<string>"
    )
    got = [r[0] for r in df.select(scrub_array(F.col("v")).alias("o")).collect()]
    assert got == [["a.fq.gz", "b.fq.gz"], None]


def test_impute_default(spark):
    vals = ["", None, "x"]
    got = _run_one(spark, lambda c: impute_default(c, "missing"), vals)
    assert got == ["missing", "missing", "x"]


def test_fuzzy_ratio(spark):
    df = spark.createDataFrame([("kitten", "sitting"), ("abc", "abc")], "a string, b string")
    got = [r[0] for r in df.select(fuzzy_ratio(F.col("a"), F.col("b")).alias("o")).collect()]
    # lev(kitten,sitting)=3 → 100*(13-3)/13
    assert got[0] == pytest.approx(100.0 * 10 / 13)
    assert got[1] == pytest.approx(100.0)
