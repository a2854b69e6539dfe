"""Sheet-generation policy operators: the reference's biosample-sheet
geo/coordinate logic as reusable Column transforms.

* :func:`merge_geo_loc_name` — X9, reference
  ``create_sheets_ultimate.py:295-319`` (5-branch geo_loc_name merge).
* :func:`mask_coordinates` — X10, reference
  ``create_sheets_ultimate.py:452-520`` (protected/exclude coordinate
  masking policy over joined per-sample flags, J10).

Truthiness discipline: the reference tests pandas values with Python
truthiness, under which ``float('nan')`` is TRUTHY — an artifact, not
a semantic (SURVEY.md §7.4). This engine uses the deterministic rule
``blank(x) = x IS NULL OR x = ''`` / ``truthy(x) = NOT blank(x)``,
which coincides with the reference for every non-NaN value.

Everything here is a when/otherwise chain — pure whole-stage-codegen
expressions, no UDFs, no shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _blank(c: Column) -> Column:
    return c.isNull() | (c == "")


def merge_geo_loc_name(
    geo: Column, locality: Column, county: Column, state: Column
) -> Column:
    """X9: merge *geo_loc_name from locality/county/state fields.

    Branch map (reference create_sheets_ultimate.py:295-319):

    * geo and locality both blank →
        - county AND state blank        → 'missing'
        - state blank, county present   → 'missing'  (the "NOT SURE" branch)
        - county AND state present      → 'USA: <state>: <county>'
        - county blank, state present   → NULL — the reference's elif
          chain has no branch for this (its ``(county null) and
          (county)`` arm is unreachable), so the value stays missing
          and the later required-column fill turns it into
          'not provided'.
    * geo present, locality blank → geo (unchanged)
    * geo blank, locality present → locality
    * both present → geo || ':' || locality
    """
    return (
        F.when(
            _blank(geo) & _blank(locality),
            F.when(_blank(county) & _blank(state), F.lit("missing"))
            .when(_blank(state) & ~_blank(county), F.lit("missing"))
            .when(
                ~_blank(county) & ~_blank(state),
                F.concat(F.lit("USA: "), state, F.lit(": "), county),
            )
            .otherwise(F.lit(None).cast("string")),
        )
        .when(~_blank(geo) & _blank(locality), geo)
        .when(_blank(geo) & ~_blank(locality), locality)
        .otherwise(F.concat(geo, F.lit(":"), locality))
    )


def impute_required(col: Column) -> Column:
    """Required-column fill: ''/NULL → 'not provided'
    (create_sheets_ultimate.py:324-329, runs AFTER the X9 merge)."""
    return F.coalesce(F.nullif(col, F.lit("")), F.lit("not provided"))


def mask_coordinates(
    *,
    existing_geo: Column,
    protected: Column,
    exclude: Column,
    lat_str: Column,
    long_str: Column,
    township: Column,
    range_: Column,
    section: Column,
    geocoded: Column,
) -> tuple[Column, Column]:
    """X10: returns ``(geo_loc_name_out, lat_lon_out)``.

    Policy (reference create_sheets_ultimate.py:452-520; flags are the
    upper-cased strings of J10's coordinate classification):

    * protected=TRUE, exclude=TRUE  → lat_lon := 'not provided'
      (geo unchanged).
    * protected=TRUE, exclude=FALSE → geo := geocoded || ', ' ||
      township-range-section (both reference branches assign the same
      value), lat_lon unchanged.
    * protected=FALSE & exclude=FALSE, or both flags absent →
      lat_lon := 'not provided' if lat and long are the string 'NaN'
      else lat || ',' || long; geo := geocoded, except when the
      existing geo is present and geocoded != 'not provided':
      existing 'missing' is replaced by geocoded, anything else
      becomes geocoded || ', ' || existing.
    * any other flag combination → both unchanged (the reference's
      elif chain has no branch for e.g. FALSE/TRUE).
    """
    p = F.upper(F.coalesce(protected, F.lit("")))
    e = F.upper(F.coalesce(exclude, F.lit("")))
    trs = F.concat(township, F.lit("-"), range_, F.lit("-"), section)
    lat_lon_val = F.when(
        (lat_str == "NaN") & (long_str == "NaN"), F.lit("not provided")
    ).otherwise(F.concat(lat_str, F.lit(","), long_str))
    open_branch = ((p == "FALSE") & (e == "FALSE")) | (
        (p == "NAN") & (e == "NAN")
    ) | ((p == "") & (e == ""))

    geo_out = (
        F.when(p.eqNullSafe("TRUE") & e.eqNullSafe("FALSE"),
               F.concat(geocoded, F.lit(", "), trs))
        .when(
            open_branch,
            F.when(
                ~_blank(existing_geo) & (geocoded != "not provided"),
                F.when(existing_geo == "missing", geocoded).otherwise(
                    F.concat(geocoded, F.lit(", "), existing_geo)
                ),
            ).otherwise(geocoded),
        )
        .otherwise(existing_geo)
    )
    lat_lon_out = (
        F.when((p == "TRUE") & (e == "TRUE"), F.lit("not provided"))
        .when(open_branch, lat_lon_val)
        .otherwise(F.lit(None).cast("string"))
    )
    return geo_out, lat_lon_out
