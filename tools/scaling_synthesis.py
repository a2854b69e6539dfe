"""Generate the SCALING.md deployment-synthesis table from the
latest sweep artifact (r10 verdict task #10): one row per measured
family — runtime/output decade exponents, the dominant shuffle, and
the ONE cluster-level knob that matters at 100 TB.

Usage: python tools/scaling_synthesis.py SCALING_SWEEP_r11.json
Prints markdown to stdout; paste into SCALING.md.
"""

from __future__ import annotations

import json
import sys

# family → (dominant shuffle profile, cluster knob that matters)
PROFILE: dict[str, tuple[str, str]] = {
    "q1_pricing_summary": ("map-side-combining hash agg", "spark.sql.shuffle.partitions sized to agg cardinality"),
    "q3_top_orders": ("2 equi-joins + TakeOrdered", "AQE auto-broadcast of the dim sides"),
    "r1_adjacent_pairs": ("per-key window", "partition count vs distinct keys"),
    "t_hourly_rollup": ("hash agg on (hour)", "shuffle partitions"),
    "ngram_jaccard_neardup": ("gram-hash inverted-index join", "max_gram_df prefix cap (candidate d² bound)"),
    "containment_join_retrieval": ("token equi-join", "output-bound: result rows set the floor"),
    "knn_top10_cosine": ("broadcast queries + TakeOrdered", "query-batch size (broadcast ceiling)"),
    "interval_coverage_users": ("per-key running-max window", "per-user partition sizing (AQE straggler split)"),
    "dedup_exact_canonical": ("hash groupBy on content hash", "shuffle partitions"),
    "token_counts": ("explode + 2-level hash agg", "map-side combine (partial agg) stays on"),
    "kmv_distinct_users": ("fixed-size sketch partials", "k (sketch width) — exchange is O(groups·k)"),
    "bm25_topk_retrieval": ("postings equi-join", "vocabulary broadcast threshold"),
    "rag_retrieve_chunks": ("centroid-pruned probe join", "IVF n_probe × centroid partition count"),
    "cdc_chunk_dedup_shifted": ("segment-hash rollup", "anchor mask width (chunk size)"),
    "entity_resolution_golden": ("block-key join + Σ|block|² pairs", "max_block degenerate-block cap"),
    "bigram_lm_score": ("explode + broadcast model join", "model table broadcast (vocab-sized)"),
    "repetition_filter_gopher": ("pure column expressions", "none — codegen-resident"),
    "market_basket_pairs": ("basket self-join on order key", "basket-size cap / AQE skew split"),
    "url_normalize_dedup": ("hash groupBy on normalized URL", "shuffle partitions"),
    "event_path_trigrams": ("per-user window + hash agg", "per-user partition sizing"),
    "simhash_dup_planted": ("band-bucket join", "band count/width vs corpus size"),
    "embedding_cosine_neardup": ("SRP-bucket join + exact verify", "srp_adaptive_params (bits track log2 n)"),
    "curation_pipeline_e2e": ("chained column stages + 1 agg", "none — scan-bound"),
    "semantic_dedup_lsh_planted": ("cluster+SRP bucket self-join", "max_cluster / max_bucket caps"),
    "trajectory_hausdorff_pairs": ("cell co-occupancy join", "cell_size ≈ threshold (candidate bound)"),
    "image_phash_neardup_dedup": ("fingerprint groupBy + band join", "exact-dup collapse BEFORE banding"),
    "quality_model_filter": ("broadcast (bucket, weight) join", "model broadcast (KB-sized)"),
    "bpe_encode_token_count": ("vocab-sized pair-count shuffles", "localCheckpoint cadence (lineage)"),
    "audio_clip_match": ("fingerprint equi-join", "fingerprint fanout per track"),
    "multimodal_curation_e2e": ("Arrow decode + hash agg", "files.maxPartitionBytes (blob batching)"),
    "wds_shard_ingest": ("mapInPandas explode", "shard count = parallelism knob"),
    "warc_ingest_extract": ("mapInPandas explode", "one-gzip-member-per-record (splittability)"),
    "line_dedup_firstwins": ("line-key window", "xxhash64 line keys (shuffle bytes)"),
    "multimodal_mp4_keyframes": ("metadata-sized sample tables", "keyframe byte-range fetch, never whole files"),
    "multimodal_mp4_fragmented_keyframes": ("metadata-sized sample tables", "same as mp4 keyframes"),
    "multimodal_tiff_compressed_decode": ("Arrow decode", "files.maxPartitionBytes"),
    "multimodal_mp3_layer3_spectrum": ("Arrow decode", "frame batching"),
    "image_orientation_dedup": ("decode + fingerprint groupBy", "orientation BEFORE fingerprint"),
    "triangle_count_linkgraph": ("oriented wedge join", "√(2m) hub orientation bound"),
    "bfs_seed_distance": ("per-round frontier join", "localCheckpoint cadence"),
    "pdf_encrypted_extract": ("Arrow decode (crypto amortized)", "per-doc KDF cost — batch documents"),
    "pagerank_link_graph": ("ranks⋈edges per round", "degree table reuse; AQE skew join"),
    "hll_distinct_users": ("2^p-row register partials", "p (register width)"),
    "pack_context_windows": ("per-doc window pack", "window size vs doc length"),
    "contamination_ngram_overlap": ("gram equi-join", "max_df cap"),
    "pdf_text_extract": ("Arrow decode", "files.maxPartitionBytes"),
    "audio_id3_metadata": ("Arrow parse", "none — scan-bound"),
    "multimodal_bmp_decode": ("Arrow decode", "none — scan-bound"),
    "pdf_image_extract": ("Arrow decode", "files.maxPartitionBytes"),
    "pdf_encrypted_image_extract": ("Arrow decode + crypto", "per-doc KDF amortization"),
    "pdf_g4_image_extract": ("Arrow decode", "none — scan-bound"),
    "multimodal_mp3_stereo_spectrum": ("Arrow decode", "none — scan-bound"),
    "multimodal_mp3_shortblock_spectrum": ("Arrow decode", "none — scan-bound"),
    "multimodal_webm_keyframes": ("Arrow container walk", "cluster-aligned splits"),
    "multimodal_mp3_lsf_spectrum": ("Arrow decode", "none — scan-bound"),
    "multimodal_mp3_lsf_intensity_spectrum": ("Arrow decode", "none — scan-bound"),
    "docx_text_extract": ("Arrow zip+XML explode", "files.maxPartitionBytes"),
    "odt_text_extract": ("Arrow zip+XML explode", "files.maxPartitionBytes"),
    "epub_text_extract": ("Arrow zip+XML explode", "files.maxPartitionBytes"),
    "rtf_text_extract": ("Arrow control-stream parse", "none — scan-bound"),
    "pdf_jbig2_image_extract": ("Arrow MQ decode", "per-doc decode cost — batch pages"),
    "pdf_jbig2_text_extract": ("Arrow MQ decode", "same"),
    "pdf_jbig2_halftone_extract": ("Arrow MQ decode", "same"),
    "pdf_jbig2_refine_extract": ("Arrow MQ decode", "same"),
    "pdf_jbig2_refagg_extract": ("Arrow MQ decode", "same"),
    "pdf_bpc_image_extract": ("Arrow unpack", "none — scan-bound"),
    "trajectory_hausdorff_density_const": ("cell co-occupancy join", "arena scales with users (density-constant)"),
    "pptx_text_extract": ("Arrow zip+XML explode", "files.maxPartitionBytes"),
    "html_text_extract": ("Arrow regex strip", "none — scan-bound"),
    "multimodal_mp3_layer2_subband_decode": ("Arrow decode", "none — scan-bound"),
    "pdf_jpx_image_extract": ("Arrow EBCOT decode", "per-image cost ∝ pixels×planes — code-block parallelism"),
    "j1_linkage_fileset": ("span equi-join", "broadcast variant side / salt_buckets fallback"),
    "minhash_neardup_planted": ("ids-only band-bucket join", "max_bucket cap; bands from threshold"),
    "fingerprint_hamming_neardup": ("band equi-join", "band layout derived from max_hamming"),
    "tfidf_cosine_neardup": ("prefix-filter candidate join", "dense_vocab regime switch"),
    "span_dedup_crossdoc": ("span-key window", "max_window_df boilerplate cap"),
    "ann_ivf_multiquery_planted": ("centroid-pruned probe join", "n_probe × centroid partitioning"),
}


def main() -> None:
    art = json.load(open(sys.argv[1]))
    rows = []
    for section in ("flagship", "families"):
        for name, rec in art.get(section, {}).items():
            if "error" in rec:
                rows.append((name, None, None, rec["error"]))
                continue
            rows.append(
                (name, rec["exponent"], rec["output_exponent"], None)
            )
    rows.sort(key=lambda r: -(r[1] if r[1] is not None else 9))
    print("| Family | runtime exp | output exp | dominant exchange | the knob at 100 TB |")
    print("|---|---|---|---|---|")
    for name, e, oe, err in rows:
        prof, knob = PROFILE.get(
            name, ("(see shuffle-budget table)", "—")
        )
        if err:
            print(f"| {name} | ERROR | — | {prof} | {knob} |")
        else:
            print(f"| {name} | {e} | {oe} | {prof} | {knob} |")


if __name__ == "__main__":
    main()
