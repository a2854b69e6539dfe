"""Registry-wide decade-scaling sweep (round-7 verdict task 7 → r8).

Times each family at sf0.1 and at the 10× anti-gaming scale-up from
tools/make_scaled_sf.py (id-shifted, vowel-permuted, rotation-
decorrelated — naive copying would fake quadratic truth), fits
``exponent = log(t_big / t_small) / log(factor)`` per family, and —
new in r8 — measures the three incremental dedup streams' per-batch
fold time and state growth, turning the "state never grows / folds
are delta-bound" claim into numbers:

* per-batch fold seconds over N sequential batches: a fold that
  joins state × state (instead of delta × (state ∪ delta)) shows
  monotonically growing per-batch time; a delta-bound fold stays
  flat (late/early ratio ≈ 1, noise aside);
* state rows after every batch: linear in DISTINCT content folded.

Writes SCALING_SWEEP_r10.json.  Usage:
    python tools/make_scaled_sf.py          # once, builds /tmp/sf_scaled
    python tools/scaling_sweep.py           # full sweep (~1 h idle box)
    python tools/scaling_sweep.py q1 q2     # subset, for iteration
    SPARK_GRAFT_SWEEP_STREAMS=0 ...         # skip the stream harness
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from ccgp_data_wrangling_spark.caching import CacheScope, use_scope
from ccgp_data_wrangling_spark.queries import all_queries
from ccgp_data_wrangling_spark.session import get_spark

SMALL = "/root/testdata/sf0.1"
BIG = os.environ.get("SPARK_GRAFT_SCALED_DIR", "/tmp/sf_scaled")
FACTOR = float(os.environ.get("SPARK_GRAFT_SCALED_FACTOR", "10"))
OUT = os.environ.get("SPARK_GRAFT_SWEEP_OUT", "SCALING_SWEEP_r10.json")

FLAGSHIP = [
    "j1_linkage_fileset",
    "minhash_neardup_planted",
    "fingerprint_hamming_neardup",
    "tfidf_cosine_neardup",
    "span_dedup_crossdoc",
    "ann_ivf_multiquery_planted",
]

# r7 sweep families, carried for round-over-round comparability
R7_FAMILIES = [
    "q1_pricing_summary", "q3_top_orders", "r1_adjacent_pairs",
    "t_hourly_rollup", "ngram_jaccard_neardup",
    "containment_join_retrieval", "knn_top10_cosine",
    "interval_coverage_users", "dedup_exact_canonical", "token_counts",
    "kmv_distinct_users", "bm25_topk_retrieval", "rag_retrieve_chunks",
    "cdc_chunk_dedup_shifted", "entity_resolution_golden",
    "bigram_lm_score", "repetition_filter_gopher", "market_basket_pairs",
    "url_normalize_dedup", "event_path_trigrams", "simhash_dup_planted",
    "embedding_cosine_neardup", "curation_pipeline_e2e",
    "semantic_dedup_lsh_planted", "trajectory_hausdorff_pairs",
    "image_phash_neardup_dedup", "quality_model_filter",
]

# r8 additions: the previously-unfitted heavy families (verdict #7)
R8_FAMILIES = [
    "bpe_encode_token_count", "audio_clip_match",
    "multimodal_curation_e2e", "wds_shard_ingest",
    "warc_ingest_extract", "line_dedup_firstwins",
    "multimodal_mp4_keyframes", "multimodal_mp4_fragmented_keyframes",
    "multimodal_tiff_compressed_decode", "multimodal_mp3_layer3_spectrum",
    "image_orientation_dedup", "triangle_count_linkgraph",
    "bfs_seed_distance", "pdf_encrypted_extract", "pagerank_link_graph",
    "hll_distinct_users", "pack_context_windows",
    "contamination_ngram_overlap",
    # late-r8 fixture-bearing gates (filter chains / low-bpp / 16-bit
    # / reservoir variants rotate inside these)
    "pdf_text_extract", "audio_id3_metadata", "multimodal_bmp_decode",
]

# r9 additions: embedded-image extraction (plain / encrypted / G4
# scanned), MP3 stereo + short blocks, the EBML/WebM container walk
R9_FAMILIES = [
    "pdf_image_extract", "pdf_encrypted_image_extract",
    "pdf_g4_image_extract", "multimodal_mp3_stereo_spectrum",
    "multimodal_mp3_shortblock_spectrum", "multimodal_webm_keyframes",
]

# r10 additions: LSF MP3 decode, DOCX/ODT ingest, the JBIG2 generic
# and symbol/text paths, and the density-constant trajectory re-fit
# the r9 verdict asked for (task #7)
R10_FAMILIES = [
    "multimodal_mp3_lsf_spectrum",
    "multimodal_mp3_lsf_intensity_spectrum", "docx_text_extract",
    "odt_text_extract", "epub_text_extract", "rtf_text_extract",
    "pdf_jbig2_image_extract",
    "pdf_jbig2_text_extract", "pdf_jbig2_halftone_extract",
    "pdf_jbig2_refine_extract", "pdf_bpc_image_extract",
    "trajectory_hausdorff_density_const",
]

# r11 additions: the third OOXML format + loose HTML, MP3 Layer II,
# JPEG 2000 (/JPXDecode)
R11_FAMILIES = [
    "pptx_text_extract", "html_text_extract",
    "multimodal_mp3_layer2_subband_decode", "pdf_jpx_image_extract",
    "pdf_jbig2_refagg_extract",
]

# r12 additions: lossy 9/7 JPX (+4:2:0), Layer II stereo/LSF/free
# format, REFAGGNINST>1, tiled TIFF, HMMR halftones, ODS/ODP ingest
R12_FAMILIES = [
    "pdf_jpx97_image_extract",
    "multimodal_mp3_layer2_stereo_decode",
    "pdf_jbig2_agg_extract", "multimodal_tiff_tiled_decode",
    "pdf_jbig2_hmmr_halftone_extract",
    "ods_cell_extract", "odp_text_extract",
]

# r13 additions: JPX structural closure (tiles/layers/progressions/
# precincts/derived/truncation/ROI), legacy .doc, FLAC PCM,
# JPEG-in-TIFF + planar
R13_FAMILIES = [
    "pdf_jpx_structured_extract", "doc_text_extract",
    "multimodal_flac_decode", "multimodal_tiff_jpeg_planar_decode",
]

# r10-verdict task #8: coding-variant rotations that ride INSIDE a
# family (SDHUFF, TRANSPOSED, SBREFINE, custom tables, HENABLESKIP,
# unknown-length, JPX containers/RCT/slack, Layer II tables) must
# PROVABLY execute at the decade scale — each family below exposes
# its rotation as output columns, and the sweep records the distinct
# variant combinations seen at BOTH scales. A variant present at
# sf0.1 but absent at 10× (or vice versa) is a silent coverage hole.
VARIANT_COLUMNS: dict[str, list[str]] = {
    "pdf_jbig2_text_extract": [
        "refcorner", "transposed", "dict_coding", "has_generic",
        "refined", "custom_table", "text_coding",
    ],
    "pdf_jbig2_image_extract": ["variant"],
    "pdf_jbig2_halftone_extract": ["template", "enableskip"],
    "pdf_bpc_image_extract": ["bpc", "inverted"],
    "multimodal_mp3_layer2_subband_decode": ["steps", "scfsi"],
    "pdf_jpx_image_extract": ["n_channels", "levels", "container"],
    "pdf_jbig2_refagg_extract": ["rtemplate", "refcorner"],
    "pdf_jpx97_image_extract": [
        "n_channels", "levels", "q_planes", "container", "subsampled",
    ],
    "multimodal_mp3_layer2_stereo_decode": [
        "mode", "version", "free_format",
    ],
    "pdf_jbig2_agg_extract": ["rtemplate", "refcorner"],
    "multimodal_tiff_tiled_decode": [
        "compression", "predictor", "n_channels", "tile_w",
    ],
    "pdf_jpx_structured_extract": [
        "progression", "transform", "derived", "truncated_planes",
        "n_tiles", "n_layers", "precincted", "comp_overrides", "roi",
    ],
    "multimodal_flac_decode": [
        "variant", "n_channels", "bps", "channel_mode",
    ],
    "multimodal_tiff_jpeg_planar_decode": [
        "compression", "tiled", "planar", "jpeg_tables",
        "n_channels",
    ],
}


def variant_coverage(qs, spark, names: list[str]) -> dict[str, dict]:
    """Distinct variant-column combinations (with row counts) per
    family at both scales — the rotation-execution proof."""
    out: dict[str, dict] = {}
    for name in names:
        cols = VARIANT_COLUMNS[name]
        try:
            rec: dict[str, object] = {"columns": cols}
            for label, d in (("sf0.1", SMALL), ("10x", BIG)):
                with CacheScope() as sc, use_scope(sc):
                    rows = (
                        qs[name](spark, d)
                        .groupBy(*cols)
                        .count()
                        .collect()
                    )
                rec[label] = sorted(
                    "|".join(str(r[c]) for c in cols)
                    + f" x{r['count']}"
                    for r in rows
                )
                rec[f"n_variants_{label}"] = len(rows)
            rec["variants_match"] = [
                v.rsplit(" x", 1)[0] for v in rec["sf0.1"]
            ] == [v.rsplit(" x", 1)[0] for v in rec["10x"]]
            out[name] = rec
            print(
                f"{name}: {rec['n_variants_sf0.1']} variants at "
                f"sf0.1, {rec['n_variants_10x']} at 10x, match="
                f"{rec['variants_match']}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — sweep must not die
            out[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name}: ERROR {e}", flush=True)
    return out


def _traj_density_const(spark, d: str):
    """Sweep-only variant of trajectory_hausdorff_pairs (r9 verdict
    task #7): the registered query's 12×9 home-region arena is FIXED,
    so a 10× user scale-up packs 10× users per cell and the TRUE pair
    count grows ~quadratically (output exponent ≈ 2 — the fixture's
    truth growth, not the operator's cost). This variant scales the
    arena with √(distinct users) so per-cell occupancy — and planted
    pair density — stays constant across the decade; its runtime fit
    should track its output fit ≈ 1.0, proving the operator. One
    bounded scalar action (the distinct-user count) sizes the grid."""
    import math as _math

    from pyspark.sql import functions as _F

    from ccgp_data_wrangling_spark.catalog import load_table
    from ccgp_data_wrangling_spark.operators.trajectory import (
        trajectory_hausdorff_pairs,
    )

    ev = load_table(spark, d, "events")
    n_users = ev.select(
        _F.countDistinct("user_id").alias("n")
    ).first()["n"]
    # ~40 users per home cell at any scale, 4:3 grid aspect
    gx = max(4, round(_math.sqrt(n_users / 40.0 * 4.0 / 3.0)))
    gy = max(3, round(gx * 3.0 / 4.0))
    pts = ev.select(
        _F.col("user_id").alias("uid"),
        ((_F.col("user_id") % gx) * 8 + _F.col("event_id") % 7)
        .cast("double").alias("x"),
        ((_F.col("user_id") % gy) * 8 + _F.col("event_id") % 5)
        .cast("double").alias("y"),
        _F.col("event_id"),
    )
    return trajectory_hausdorff_pairs(
        pts, "uid", "x", "y", "event_id",
        cell_size=8.0, threshold=8.0, max_points=30,
    )


def time_query(qs, spark, name: str, d: str) -> float:
    samples = []
    with CacheScope() as sc, use_scope(sc):
        for _ in range(3):
            df = qs[name](spark, d)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
    return round(sorted(samples)[1], 3)


def count_rows(qs, spark, name: str, d: str) -> int:
    with CacheScope() as sc, use_scope(sc):
        return qs[name](spark, d).count()


def fit(qs, spark, names: list[str]) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for name in names:
        try:
            t_small = time_query(qs, spark, name, SMALL)
            t_big = time_query(qs, spark, name, BIG)
            # result cardinality at both scales: a runtime exponent
            # above 1.0 whose output exponent is at least as large is
            # output-bound BY THE ARTIFACT ITSELF (the truth the query
            # must emit grows that fast), not an engine defect —
            # previously this argument lived in SCALING.md prose only
            rows_small = count_rows(qs, spark, name, SMALL)
            rows_big = count_rows(qs, spark, name, BIG)
            out[name] = {
                "t_sf0.1_sec": t_small,
                "t_10x_sec": t_big,
                "exponent": round(
                    math.log(max(t_big, 1e-3) / max(t_small, 1e-3))
                    / math.log(FACTOR),
                    3,
                ),
                "rows_sf0.1": rows_small,
                "rows_10x": rows_big,
                "output_exponent": round(
                    math.log(max(rows_big, 1) / max(rows_small, 1))
                    / math.log(FACTOR),
                    3,
                ),
            }
            print(f"{name}: {t_small} -> {t_big} "
                  f"(exp {out[name]['exponent']}, "
                  f"rows {rows_small} -> {rows_big})", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must not die mid-run
            out[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name}: ERROR {e}", flush=True)
    return out


def stream_harness(spark, n_batches: int = 6) -> dict:
    """Per-batch fold time + state growth for the three incremental
    dedup states, fed sequential slices of the sf0.1 documents table.
    A delta-bound fold's per-batch time is flat in the batch index;
    state rows grow with distinct content only."""
    from ccgp_data_wrangling_spark.streaming.hamming_stream import (
        HammingDedupState,
    )
    from ccgp_data_wrangling_spark.streaming.linededup_stream import (
        LineDedupState,
    )
    from ccgp_data_wrangling_spark.streaming.neardup_stream import (
        MinHashDedupState,
    )

    docs = spark.read.parquet(f"{SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.cache().count()
    root = tempfile.mkdtemp(prefix="sweep_streams_")
    out: dict[str, dict] = {}
    try:
        setups = {
            "minhash_stream": (
                MinHashDedupState(spark, os.path.join(root, "mh")),
                lambda st, b: st.fold(b, "doc_id", "text"),
                lambda st: st.signatures().count(),
            ),
            "hamming_stream": (
                HammingDedupState(spark, os.path.join(root, "hm")),
                lambda st, b: st.fold(
                    b.select(
                        F.col("doc_id").alias("id"),
                        F.xxhash64("text").alias("fp"),
                    )
                ),
                lambda st: st.fingerprints().count(),
            ),
            "linededup_stream": (
                LineDedupState(spark, os.path.join(root, "ld")),
                lambda st, b: st.fold(b).count(),
                lambda st: st.owners().count(),
            ),
        }
        for name, (state, fold, rows) in setups.items():
            per_batch: list[float] = []
            state_rows: list[int] = []
            for i in range(n_batches):
                batch = docs.where(
                    F.col("doc_id") % n_batches == i
                )
                t0 = time.perf_counter()
                fold(state, batch)
                per_batch.append(round(time.perf_counter() - t0, 3))
                state_rows.append(rows(state))
            # late/early ratio over batches 2..N (batch 1 pays state
            # bootstrap); a state×state leak grows this with N
            late, early = per_batch[-1], per_batch[1]
            out[name] = {
                "per_batch_sec": per_batch,
                "state_rows": state_rows,
                "late_over_early": round(late / max(early, 1e-3), 2),
            }
            print(f"{name}: folds {per_batch} state {state_rows}",
                  flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        docs.unpersist()
    return out


def _child_fit(out_path: str, names: list[str]) -> None:
    qs = dict(all_queries())
    qs["trajectory_hausdorff_density_const"] = _traj_density_const
    spark = get_spark()
    res = fit(qs, spark, names)
    with open(out_path, "w") as fh:
        json.dump(res, fh)


def _child_variants(out_path: str) -> None:
    qs = all_queries()
    spark = get_spark()
    res = variant_coverage(qs, spark, list(VARIANT_COLUMNS))
    with open(out_path, "w") as fh:
        json.dump(res, fh)


def _child_streams(out_path: str) -> None:
    spark = get_spark()
    try:
        res = stream_harness(spark)
    except Exception as e:  # noqa: BLE001 — artifact > purity
        res = {"error": f"{type(e).__name__}: {e}"}
    with open(out_path, "w") as fh:
        json.dump(res, fh)


GROUP = 10  # families per child process


def main() -> None:
    """Parent mode: spawn each family group (and the stream harness)
    in a FRESH subprocess/SparkSession — a single long-lived JVM
    accumulates enough pressure over ~100 timed 10× executions to
    die mid-sweep (r8 first attempt: executor OOM after the
    trajectory family, killing every later fit)."""
    import subprocess

    if not Path(BIG, "documents.parquet").exists():
        sys.exit(f"{BIG} missing — run tools/make_scaled_sf.py first")
    if len(sys.argv) >= 3 and sys.argv[1] == "--fit":
        _child_fit(sys.argv[2], sys.argv[3:])
        return
    if len(sys.argv) >= 3 and sys.argv[1] == "--streams":
        _child_streams(sys.argv[2])
        return
    if len(sys.argv) >= 3 and sys.argv[1] == "--variants":
        _child_variants(sys.argv[2])
        return
    names = sys.argv[1:]
    t0 = time.time()
    sections: dict[str, list[str]] = (
        {"families": names}
        if names
        else {"flagship": FLAGSHIP,
              "families": R7_FAMILIES + R8_FAMILIES + R9_FAMILIES
              + R10_FAMILIES + R11_FAMILIES + R12_FAMILIES
              + R13_FAMILIES}
    )
    result: dict[str, dict] = {}
    tmpdir = tempfile.mkdtemp(prefix="sweep_parts_")
    try:
        for section, sec_names in sections.items():
            merged: dict[str, dict] = {}
            for gi in range(0, len(sec_names), GROUP):
                group = sec_names[gi : gi + GROUP]
                part = os.path.join(tmpdir, f"{section}_{gi}.json")
                proc = subprocess.run(
                    [sys.executable, __file__, "--fit", part, *group],
                    cwd=str(Path(__file__).resolve().parent.parent),
                )
                if proc.returncode == 0 and os.path.exists(part):
                    merged.update(json.load(open(part)))
                else:
                    for n in group:
                        merged.setdefault(
                            n, {"error": "child process died"}
                        )
            result[section] = merged
        if not names and os.environ.get(
            "SPARK_GRAFT_SWEEP_STREAMS", "1"
        ) != "0":
            part = os.path.join(tmpdir, "streams.json")
            proc = subprocess.run(
                [sys.executable, __file__, "--streams", part],
                cwd=str(Path(__file__).resolve().parent.parent),
            )
            result["streams"] = (
                json.load(open(part))
                if proc.returncode == 0 and os.path.exists(part)
                else {"error": "child process died"}
            )
        if not names:
            part = os.path.join(tmpdir, "variants.json")
            proc = subprocess.run(
                [sys.executable, __file__, "--variants", part],
                cwd=str(Path(__file__).resolve().parent.parent),
            )
            result["variant_coverage"] = (
                json.load(open(part))
                if proc.returncode == 0 and os.path.exists(part)
                else {"error": "child process died"}
            )
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    artifact = {
        "factor": FACTOR,
        "small_dir": SMALL,
        "big_dir": BIG,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "wall_sec": round(time.time() - t0, 1),
        **result,
    }
    with open(OUT, "w") as fh:
        json.dump(artifact, fh, indent=1)
        fh.write("\n")
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
