"""Privacy operator tests (operators/privacy.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.operators.privacy import (
    k_anonymity_audit,
    tokenize_columns,
)


def test_tokenize_preserves_joins_and_kills_values(spark):
    a = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "id int, name string"
    )
    b = spark.createDataFrame(
        [("alice", 10), ("carol", 20)], "name string, score int"
    )
    ta = tokenize_columns(a, ["name"], salt="s1")
    tb = tokenize_columns(b, ["name"], salt="s1")
    joined = ta.join(tb, "name").select("id", "score").collect()
    assert [(r["id"], r["score"]) for r in joined] == [(1, 10)]
    # raw values are gone; tokens are salted (differ across salts)
    vals = {r["name"] for r in ta.collect()}
    assert "alice" not in vals
    t2 = {r["name"] for r in tokenize_columns(a, ["name"], salt="s2").collect()}
    assert vals.isdisjoint(t2)


def test_tokenize_null_stays_null(spark):
    df = spark.createDataFrame([(1, None)], "id int, name string")
    out = tokenize_columns(df, ["name"], salt="s").collect()[0]
    assert out["name"] is None


def test_k_anonymity_flags_small_groups_incl_null(spark):
    rows = (
        [("US", "A")] * 5
        + [("US", "B")] * 2
        + [(None, "A")] * 1
    )
    df = spark.createDataFrame(rows, "country string, seg string")
    out = {
        (r["country"], r["seg"]): (r["group_size"], r["deficit"])
        for r in k_anonymity_audit(df, ["country", "seg"], k=3).collect()
    }
    assert out == {("US", "B"): (2, 1), (None, "A"): (1, 2)}


def test_pii_redact_patterns_counts_and_disjointness(spark):
    from pyspark.sql import functions as F

    from ccgp_data_wrangling_spark.operators.privacy import pii_redact

    rows = [
        (1, "write a@b.io or ann.lee+x@sub.ex.org today"),
        (2, "ssn 123-45-6789 is not phone 415-555-1234"),
        (3, "hosts 10.0.0.1 and 192.168.255.7, ver 1.2"),
        (4, "clean text with numbers 12345 and words"),
        (5, "dup 1.2.3.4 1.2.3.4 mail z@q.co ssn 999-11-2222"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    red, counts = pii_redact(F.col("t"))
    got = {
        r.id: r
        for r in df.select(
            "id",
            red.alias("red"),
            *[c.alias(k) for k, c in counts.items()],
        ).collect()
    }
    assert got[1].n_email == 2 and "[EMAIL]" in got[1].red
    assert "a@b.io" not in got[1].red and "sub.ex.org" not in got[1].red
    # SSN (3-2-4) and phone (3-3-4) never claim each other
    assert (got[2].n_ssn, got[2].n_phone) == (1, 1)
    assert got[2].red == "ssn [SSN] is not phone [PHONE]"
    # IPv4 needs all four octets; a bare version number stays
    assert got[3].n_ip == 2
    assert got[3].red == "hosts [IP] and [IP], ver 1.2"
    assert (got[4].n_email, got[4].n_ssn, got[4].n_phone, got[4].n_ip) == (
        0, 0, 0, 0,
    )
    assert got[4].red == rows[3][1]
    assert (got[5].n_ip, got[5].n_email, got[5].n_ssn) == (2, 1, 1)
