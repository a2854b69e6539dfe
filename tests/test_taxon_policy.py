"""Per-taxon sheet projection policy (operators/taxon_policy.py)."""

from __future__ import annotations

import pytest

from ccgp_data_wrangling_spark.operators.taxon_policy import (
    SHEET_POLICY,
    apply_column_policy,
    policy_columns,
)


def test_policy_order_and_intersection():
    avail = ["tissue", "*sample_name", "County", "internal_note", "*organism"]
    got = policy_columns("biosample", "plant", avail)
    # policy order, not availability order; decoy excluded
    assert got == ["*sample_name", "*organism", "County", "tissue"]


def test_vertebrate_uses_starred_tissue():
    assert "*tissue" in SHEET_POLICY[("biosample", "vertebrate")]
    assert "tissue" not in SHEET_POLICY[("biosample", "vertebrate")]
    assert "tissue" in SHEET_POLICY[("biosample", "plant")]


def test_sra_policy_shared_across_taxa():
    assert (
        SHEET_POLICY[("sra", "plant")]
        is SHEET_POLICY[("sra", "invertebrate")]
    )


@pytest.mark.parametrize(
    "sheet,taxon,match",
    [("biosample", "fungus", "data type"), ("excel", "plant", "sheet type")],
)
def test_invalid_inputs_raise(sheet, taxon, match):
    with pytest.raises(ValueError, match=match):
        policy_columns(sheet, taxon, ["*sample_name"])


def test_apply_projects_dataframe(spark):
    df = spark.createDataFrame(
        [("s1", "org", "x")], ["*sample_name", "*organism", "internal_note"]
    )
    out = apply_column_policy(df, "biosample", "invertebrate")
    assert out.columns == ["*sample_name", "*organism"]
