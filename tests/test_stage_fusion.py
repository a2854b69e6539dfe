"""The r14 stage-fusion optimization changed operator internals:
extractor operators accept a ``pre=`` batch transformer fused into
their single mapInPandas stage, and webdataset exposes its explode
core as ``wds_sample_batches``. These tests pin the contract the
optimization relies on — the fused form produces row-identical
output to the two-stage chain it replaced — at the operator level,
independent of the registered queries' oracle checks.

(Synthesizers are defined inside each test so cloudpickle ships
them by value; a module-level def in an unimportable test module
would be pickled by reference and fail on executors.)"""

from __future__ import annotations

import pandas as pd

from ccgp_data_wrangling_spark.operators.multimodal import (
    extract_real_features,
)
from ccgp_data_wrangling_spark.sources.pdf import build_pdf, pdf_documents
from ccgp_data_wrangling_spark.sources.webdataset import (
    build_wds_shard,
    wds_sample_batches,
    wds_samples,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_pdf_documents_pre_matches_chained(spark):
    def synth(batches):
        for pdf in batches:
            payloads = [
                build_pdf([[f"page for {int(d)}", f"tail {int(d) % 3}"]])
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    docs = spark.range(12).selectExpr("id AS doc_id")
    chained = pdf_documents(
        docs.mapInPandas(synth, schema="doc_id long, payload binary")
    )
    fused = pdf_documents(docs, pre=synth)
    assert _rows(fused) == _rows(chained)
    assert len(_rows(fused)) == 12


def test_extract_real_features_pre_matches_chained(spark):
    def synth(batches):
        for pdf in batches:
            payloads = [
                b"P5\n4 2\n255\n" + bytes([int(i) % 200 + 10] * 8)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].values,
                    "payload": payloads,
                    "media_type": "image/pgm",
                }
            )

    ev = spark.range(10)
    chained = extract_real_features(
        ev.mapInPandas(
            synth,
            schema="id long, payload binary, media_type string",
        )
    )
    fused = extract_real_features(ev, pre=synth)
    assert _rows(fused) == _rows(chained)
    assert len(_rows(fused)) == 10


def test_wds_sample_batches_composes_like_wds_samples(spark):
    """Triple-stage fusion core: synth -> wds_sample_batches in one
    stage must explode identically to synth stage -> wds_samples."""

    def synth(batches):
        for pdf in batches:
            payloads = []
            for sid in pdf["shard_id"]:
                s = int(sid)
                payloads.append(
                    build_wds_shard(
                        [
                            (
                                f"{s}-{j}",
                                {
                                    "pgm": b"P5\n2 2\n255\n"
                                    + bytes([s % 99 + j] * 4),
                                    "cls": str((s + j) % 5).encode(),
                                },
                            )
                            for j in range(2)
                        ]
                    )
                )
            yield pd.DataFrame(
                {"shard_id": pdf["shard_id"].values, "payload": payloads}
            )

    ev = spark.range(6).selectExpr("id AS shard_id")
    chained = wds_samples(
        ev.mapInPandas(synth, schema="shard_id long, payload binary")
    ).select("shard_id", "sample_key", "n_parts")
    fused = ev.mapInPandas(
        lambda it: (
            pdf[["shard_id", "sample_key", "n_parts"]]
            for pdf in wds_sample_batches(synth(it))
        ),
        schema="shard_id long, sample_key string, n_parts int",
    )
    assert _rows(fused) == _rows(chained)
    assert len(_rows(fused)) == 12  # 6 shards x 2 samples


def test_pre_is_off_by_default(spark):
    """Without pre=, the operators still select-narrow their input
    (the original contract): extra columns are tolerated."""

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        build_pdf([["x"]]) for _ in pdf["doc_id"]
                    ],
                    "extra": pdf["doc_id"].values,
                }
            )

    docs = spark.range(3).selectExpr("id AS doc_id", "id * 2 AS extra")
    media = docs.mapInPandas(
        synth, schema="doc_id long, payload binary, extra long"
    )
    out = pdf_documents(media)
    assert len(_rows(out)) == 3
