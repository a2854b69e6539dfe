"""Entity-resolution pipeline tests (pipelines/resolution.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.pipelines.resolution import resolve_entities


def _resolve(spark, rows, **kw):
    df = spark.createDataFrame(rows, "rec_id long, name string, balance double")
    return {
        r["entity_id"]: (r["n_records"], r["canonical_name"], r["max_balance"])
        for r in resolve_entities(df, **kw).collect()
    }


def test_variants_merge_transitively(spark):
    """a~b and b~c chain into one entity even if a,c never pair."""
    rows = [
        (1, "Acme 001", 10.0),
        (2, "Acme 001 inc", 10.0),       # pairs with 1 (jac 2/3)
        (3, "Acme 001 inc intl", 10.0),  # pairs with 2 (3/4), not 1 (2/4 = .5*.8+.2=.6 ok actually)
        (9, "Zeta 777", 5.0),
    ]
    out = _resolve(spark, rows)
    assert set(out) == {1, 9}
    assert out[1] == (3, "Acme 001 inc intl", 10.0)
    assert out[9] == (1, "Zeta 777", 5.0)


def test_singletons_survive(spark):
    rows = [(1, "Solo 123", 1.0), (2, "Other 456", 2.0)]
    out = _resolve(spark, rows)
    assert out == {1: (1, "Solo 123", 1.0), 2: (1, "Other 456", 2.0)}


def test_no_digits_block_excluded_but_record_kept(spark):
    """Records with digit-less names never form pairs (degenerate
    block) yet still appear as singleton entities."""
    rows = [(1, "no digits here", 1.0), (2, "no digits here", 1.0)]
    out = _resolve(spark, rows)
    assert set(out) == {1, 2}


def test_balance_disagreement_can_break_match(spark):
    """Same name tokens → jac 1.0 always matches; weaker overlap
    needs the balance bonus to clear the threshold."""
    rows = [
        (1, "Acme 001 alpha beta gamma", 10.0),
        (2, "Acme 001 x y z", 99.0),  # jac 2/8 = .25 → .2 < .4: no match
        (3, "Acme 001 x y z", 55.0),  # jac 1.0 with 2 → merges with 2 only
    ]
    out = _resolve(spark, rows)
    # 2 and 3 share all tokens (jac 1.0 → ≥.4 regardless of balance)
    assert set(out) == {1, 2}
    assert out[2][0] == 2
