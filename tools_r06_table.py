"""Build the OPTIMIZATION_r06.md final checklist table from the
measurement JSONs: r5 driver baseline (BENCH_r05.json sf1.0 contended),
round-start local profile (BENCH/r06_before_sf1.json, driver sf1.0
data), and the end-of-round local-tier run (stdin JSON line from
bench_extra).

Usage: python tools_r06_table.py <final_bench_extra_json_file>
Prints the markdown table to stdout.
"""

import json
import sys

ACTIONS = {
    "frame_rms": "w4 doc-scan spread",
    "doc_stats": "w4 doc-scan spread",
    "asof_join": "examined; events path parallel — left",
    "sessionize": "examined; one window shuffle — left",
    "session_tempo": "examined; events-bound — left",
    "rolling": "examined; left",
    "minhash_lsh": "w1 spread",
    "simhash": "w1 _spread_mat (filter-below-exchange fix)",
    "embed_neardup": "w1 tiled pair fold",
    "normalized_dedup": "w2 entry spread",
    "incremental_dedup": "examined; semi-join O(new) — left",
    "ann_topk": "w1 corpus spread",
    "ivf_ann": "w2 ivf_assign spread",
    "kernel_features": "w4 doc-scan spread (kernel untouched)",
    "spectral_flux": "w4 doc-scan spread",
    "spectral_contrast": "w4 doc-scan spread",
    "rhythm": "w4 doc-scan spread",
    "text_quality": "w2 entry spread",
    "pii_redact": "w2 entry spread",
    "span_dedup": "w2 duplicate_span_stats spread",
    "repetition": "w1 spread; linear two-shuffle shape",
    "tfidf": "w1 window df(t) + spread",
    "pack_shards": "examined; two-phase prefix sums — left",
    "encode_tokens": "w2 encode_documents spread",
    "chunk_documents": "examined; narrow — left",
    "hashed_embedding": "w1 spread; md5-per-word is the contract",
    "quantize_embed": "examined; narrow — left",
    "corpus_profile": "examined; left",
    "ann_recall": "w1 via brute/ivf spreads",
    "curate": "examined; composition of spread ops",
    "tpch_q1": "examined; 1-row-group scan inherent — left",
    "kernel_full_geometry": "w4 doc-scan spread (kernel untouched)",
    "semantic_dedup": "w1 tiled pair fold + spreads",
    "bigram_surprisal": "w1 spread+mat; join form kept (not yet)",
    "quality_classifier": "w2 entry spread",
    "bpe_merges": "examined; bounded merge collect — left",
    "temperature_sample": "examined; left",
    "cap_per_group": "examined; left",
    "silence_segments": "w4 doc-scan spread",
    "mfcc_delta": "w4 + w6 _spread_mat (pushdown fix)",
    "seq_metadata": "examined; narrow projection — left",
    "bpe_encode": "examined; bounded vocab broadcast — left",
    "drift_psi": "examined; left",
    "pit_assembly": "examined; as-of shape — left",
    "snapshot_diff": "examined; left",
    "dsir_select": "w1 inline target tag (join removed) + spread",
    "bm25": "w1 window df(t) (corpus pass deduped)",
    "fertility": "examined; one aggregate — left",
    "c4_clean": "w1+w2 spreads",
    "pca_power": "examined; driver-roundtrip inherent — left",
    "epoch_shuffle": "examined; two-phase prefix — left",
    "leak_split": "examined; component rounds — not yet",
    "span_scrub": "w1 _spread_mat",
    "padding_waste": "examined; left",
    "shard_manifest": "examined; left",
    "pack_nosplit": "examined; left",
    "hll_distinct": "w1 spread",
    "cms_freq": "w1 spread",
    "kl_drift": "w2 divergence-spine spread",
    "zipf_slope": "examined; left",
    "source_overlap": "w1 spread (explode parallelized)",
    "bleu": "w1 tagged explode -> w6 mapInArrow clip",
    "containment": "w1 _spread_mat + w3 window df",
    "allpairs_jaccard": "w1 _spread_mat + w3 window df",
    "rrf_hybrid": "w1 via bm25/brute upstreams",
    "edit_neardup": "w1 _spread_mat; hot-bucket skew left",
    "pq_ann": "examined; broadcast ADC shape — left",
    "bloom_membership": "w1 spread; k-md5 probes contract",
    "npmi": "w1 spread+mat",
    "gopher_quality": "w1+w2 spreads",
    "line_scrub": "w1 _spread_mat + w2 entry spread",
    "cdc_chunks": "w1 spread -> w5 _spread_mat (pushdown fix)",
    "textrank": "w1 spread",
    "lq_quantiles": "examined; register agg — left",
    "hill_tail": "examined; _hist_prefix engine — left",
    "boot_ci": "examined; one agg + broadcast — left",
    "survival": "examined; _hist_prefix engine — left",
}


def main() -> None:
    final = json.load(open(sys.argv[1]))["mins"]
    r05 = json.load(open("BENCH_r05.json"))["parsed"]["queries"]
    start = json.load(open("BENCH/r06_before_sf1.json"))["mins"]
    print("| query | r5 driver sf1.0 (contended) | round-start local"
          " (driver data) | final local sf1.0 clone | action |")
    print("|---|---|---|---|---|")
    tot5 = tot_f = 0.0
    for q, t in final.items():
        r5 = r05.get(q)
        st = start.get(q)
        if r5:
            tot5 += r5
        tot_f += t
        print(f"| {q} | {r5 if r5 is not None else '—'} |"
              f" {st if st is not None else '—'} | {t} |"
              f" {ACTIONS.get(q, '—')} |")
    print(f"| **total** | **{round(tot5, 1)}** | — |"
          f" **{round(tot_f, 1)}** | |")


if __name__ == "__main__":
    main()
