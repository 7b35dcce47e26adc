#!/usr/bin/env python3
"""Time the DuckDB oracle SQL for each headline bench query — the single-node
reference wall-time that BENCH_r{N}.json is graded against (BASELINE.json's
"within 2x of BASELINE" metric).

DuckDB is the same engine the driver uses as the correctness oracle, run here
with all cores on the same box as the Spark bench, so spark_sec/duckdb_sec is
an apples-to-apples single-node throughput ratio.

Usage: baseline.py <sfDir> <oracle_sql.json> [repeat]
Writes baseline_times.json to cwd (read by Bench.scala and BASELINE.md).
"""
import sys, json, time, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Must match Bench.headline (Bench.scala).
HEADLINE = ["q_join", "q_asof_join", "q_range_join",
            "q_epochs_window", "q_stream_epochs", "q_stateful_map",
            "q_ttl_map", "q_key_distribute", "q_agg_salted", "q_dedup_exact",
            "q_dedup_minhash", "q_ngram_jaccard", "q_dedup_components",
            "q_fingerprint_winnow",
            "q_ann_brute", "q_ann_ivf", "q_ann_lsh", "q_tokens", "q_tfidf",
            "q_quality", "q_pipeline",
            "q_dedup_minhash_pruned", "q_dedup_incremental",
            "q_dedup_semantic", "q_distinct_sketch", "q_stream_join",
            "q_upsert", "q_corpus_diff", "q_percentile_sketch",
            "q_mix_sample", "q_cap_per_source", "q_contamination_bloom",
            "q_trim_spans", "q_dsir_weights", "q_gopher_rules",
            "q_ann_ivf_indexed", "q_ccnet_buckets", "q_dsir_select",
            "q_clf_quality", "q_profile", "q_html_extract",
            "q_pipeline_web", "q_bpe_encode",
            "q_c4_rules", "q_dedup_lines", "q_shard_by_tokens",
            "q_pmi", "q_heavy_hitters", "q_url_blocklist",
            "q_sample_priority", "q_prune_prototypes",
            "q_heavy_hitters_grouped", "q_layout_prune", "q_bpe_fertility",
            "q_dedup_substring", "q_dedup_components_incremental",
            "q_ann_ivf_requantized",
            "q_lm_bigram", "q_lm_kn", "q_mix_doremi", "q_dedup_soft",
            "q_spm_encode", "q_pipeline_d4",
            "q_dedup_minhash_oph", "q_dedup_minhash_bbit",
            "q_phrase_blocklist", "q_script_profile",
            "q_corpus_overlap", "q_rank_fusion",
            "q_ann_margin", "q_span_corrupt", "q_fim", "q_ann_mrl", "q_mine_pairs", "q_source_keywords",
            "q_wordpiece_encode", "q_bpe_bytes_encode", "q_ann_whiten",
            "q_compression_ratio", "q_zipf_fit", "q_bm25", "q_hybrid_search",
            "q_boilerplate", "q_outliers_mad", "q_lm_jm", "q_overlap_matrix",
            "q_tokenizer_coverage", "q_curriculum", "q_dedup_jaccard_weighted",
            "q_select_moore_lewis", "q_agg_salted_auto",
            "q_decontaminate_semantic", "q_psi_drift", "q_clf_kappa"]


def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    with open(oracle_path) as f:
        oracle = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    times = {}
    for name in HEADLINE:
        sql = oracle.get(name)
        if sql is None:
            times[name] = None  # rows-only query: no SQL-expressible oracle
            continue
        best = None
        for _ in range(repeat):
            t0 = time.monotonic()
            n = len(con.execute(sql).fetchall())
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = max(round(best, 3), 0.001)  # floor: 0.0 breaks ratio division downstream
        print(f"[baseline] {name:22s} {best:8.3f}s  ({n} rows)", file=sys.stderr)

    out = {"sf": sf_dir, "engine": f"duckdb-{duckdb.__version__}",
           "repeat": repeat, "queries": times,
           "total": round(sum(v for v in times.values() if v is not None), 3)}
    with open("baseline_times.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
