"""Scale ladder: measure the dedup/similarity families at sf0.1 and at
the 10x generated corpus (tools/gen_scale_ladder.py), and print the
sf0.1 -> 10x wall-clock ratios.

A linear-scaling operator shows ratio ~10 (same per-row cost); the
bucketed pair stages are allowed ratio > 10 only as far as their
capped expansion predicts. Run AFTER generating the ladder data:

    python tools/gen_scale_ladder.py
    python tools/bench_ladder.py [passes]

Results land in SCALE.md's measured-scaling table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LADDER_QUERIES = [
    "near_dedup",
    "semantic_dedup",
    "fuzzy_name_pairs",
    "bm25_indexed",
    "topk_cosine_indexed",
    # round-4 session 5: the graph/basket families (10x lineitem —
    # 10x orders x 10x suppliers, constant per-order density)
    "pagerank",
    "triangle_count",
    "bfs_reachability",
    "copurchase_lift",
    # round-4 session 6: statistics family (10x events — 10x users,
    # preserved count/type/value distributions; 10x lineitem/documents
    # for the moment matrix and Zipf fit). All single-scan closed-form
    # aggregates: expected ratio <= 10.
    "corr_matrix",
    "zipf_fit",
    "gini_concentration",
    "mann_whitney",
    "kaplan_meier",
    "cusum_drift",
    # round-4 session 8: quadratic-capped pair stages (theilsen's
    # per-user cap, golden_record's nation-blocked edit-1 pairs with
    # ~constant per-name neighborhoods), broadcast-probe scoring (JW),
    # single-scan linear passes (PCA, histogram/first-seen rollups,
    # conformal). Expected ratio <= ~10 for every one of them.
    "theilsen_trend",
    "jaro_winkler_topk",
    "golden_record",
    # round 5: the full clusters path (star-contraction CC) at 10x —
    # VERDICT r4 item 4
    "entity_resolution",
    "pca_project",
    "histogram_quantile_rollup",
    "distinct_rollup",
    "forecast_conformal",
    # round-5 session 2: oracle-backed MinHash-LSH (capped bucketed
    # pairs), DSIR (two small shuffles + broadcast stats), KS test
    # (single scan + per-type windows), propensity matching (bucketed
    # band join), degree assortativity (degree joins + 1-row moments),
    # Mahalanobis (broadcast moments + TakeOrdered). Expected <= ~10.
    "minhash_jaccard",
    "dsir_weights",
    "ks_test",
    "propensity_match",
    "degree_assortativity",
    "mahalanobis_anomaly",
    # round 6: oracle-verifiable SimHash (narrow fold + block buckets),
    # integer-exact embedding LSH (narrow sign bits + capped buckets),
    # substring fingerprints (char-gram explode cut by 0-mod-p),
    # per-source quantile windows, token-yield dedup rollup. Expected
    # <= ~10 for all (the gram explodes are linear; buckets capped).
    "simhash_hamming",
    "embedding_lsh_cosine",
    "substring_fingerprint_dups",
    "quality_quantile_normalize",
    "token_yield_report",
    # round-6 session 2: Gopher gates + interval/engagement rollups are
    # single-scan or user-day-sized (expected <= ~10);
    # itemsets are order-bounded C(g,2)/C(g,3); MMR's pool is
    # CONSTANT-sized (expected ~flat beyond the relevance scan);
    # DTW/cross-corr run on |groups|x|days| grids (expected ~flat);
    # hilbert is a per-row fold (expected <= ~10).
    "gopher_rules",
    "interval_merge",
    "active_user_rollup",
    # blocking_eval's exhaustive-truth form is fixture-only (truth pair
    # work is quadratic in shingle df — measured 3.6e9 co-pairs at 10x
    # on this corpus's dense shingle space); the ladder measures the
    # constant-truth-work sampled form a growing corpus actually runs.
    "blocking_eval_sampled",
    "rocchio_expand",
    "mmr_rerank",
    "dtw_distance",
    "hilbert_zonemap",
    "cross_corr_lag",
    "frequent_itemsets",
    "nelson_aalen",
    # round 7: md5 phash pipeline (capped block buckets), literal
    # k-means E-step + JL projection (narrow folds — expected <= ~10),
    # robust/trend/categorical statistics (rank window or daily-grid
    # bounded — trimmed_mean <= ~10, mann_kendall ~flat in corpus size
    # since the day grid is date-range-bounded), corpus diagnostics
    # (zipf top-N fit <= ~10; source-overlap join bounded by source
    # count; info-gain single aggregate <= ~10).
    "media_md5_near_dup",
    "kmeans_literal_assign",
    "trimmed_mean",
    "mann_kendall",
    "chisq_independence",
    "zipf_slope",
    "cross_source_overlap",
    "source_info_gain",
    "jl_project",
    # round-7 batch 2: daily-grid windows (runs test ~flat in corpus
    # size), value-distribution windows (W1 <= ~10), distinct+count
    # aggregates (SRM <= ~10)
    "runs_test",
    "wasserstein_value_drift",
    "srm_check",
    # round-7 batch 3: grid self-joins (ACF ~flat), constant-size tail
    # windows (Hill <= ~10), two-aggregate rollups (HHI <= ~10)
    "acf_daily",
    "hill_tail_index",
    "source_hhi",
    # round-7 batch 4: 256-cell KS audit (<= ~10 via the distinct),
    # lag-window transition entropy (<= ~10), content-hash histogram
    # (<= ~10, map-side combined)
    "hash_uniformity_audit",
    "markov_entropy_rate",
    "dup_cluster_histogram",
    # round-7 batch 5: user-day first-seen rollup (<= ~10), LSH band
    # histogram (same capped pipeline as minhash_jaccard, <= ~10)
    "new_user_share",
    "near_dup_threshold_sweep",
    "embedding_norm_profile",
    # round-8 additions: literal-synopsis vector twins (narrow folds,
    # expected ~linear), repetition/coverage/drift text passes
    # (combined aggregates, <=10x), rank/sequential stats (window on
    # the type key, <=10x), byte-entropy (bounded 256 rows/doc wire)
    "pq_literal_adc",
    "ivf_literal_probe",
    "embedding_clip_bounds",
    "dup_ngram_ratio",
    "kruskal_wallis",
    "sprt_ab_test",
    "vocab_coverage_estimate",
    "spearman_activity_value",
    "top_terms_drift",
    "media_byte_entropy",
    "rbo_bm25_length_norm",
    "lang_label_audit",
    "overdispersion_index",
    "activation_latency",
    "media_type_sniff",
    "lsh_band_planner",
    "logrank_test",
    "event_freshness",
    "embedding_distance_profile",
]

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join("spark-warehouse", "ladder_sf1")


def main() -> None:
    """argv: [passes] [queries-csv]. The csv filter measures a subset
    (e.g. just a round's new operators) without re-paying the whole
    ladder."""
    global LADDER_QUERIES
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if len(sys.argv) > 2:
        only = set(sys.argv[2].split(","))
        LADDER_QUERIES = [q for q in LADDER_QUERIES if q in only]
    if not os.path.isdir(SF1):
        raise SystemExit(f"{SF1} missing — run tools/gen_scale_ladder.py first")

    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.plans import (
        QUERIES,
    )
    from csv_data_ingestion_pipeline_with_idempotency_on_google_cloud_platform_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="bench_ladder", cpus="32")
    spark.range(1000).count()
    spark.range(0, 10_000, 1, 32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    results: dict[str, dict[str, float]] = {}
    for name in LADDER_QUERIES:
        results[name] = {}
        for label, sf_dir in (("sf0.1", SF01), ("10x", SF1)):
            best = float("inf")
            for p in range(passes):
                t0 = time.monotonic()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.monotonic() - t0
                best = min(best, dt)
                print(f"# {name} @ {label} pass {p}: {dt:.2f}s", file=sys.stderr)
            results[name][label] = round(best, 3)

    print(f"{'query':24} {'sf0.1':>8} {'10x':>8} {'ratio':>7}")
    for name, r in results.items():
        ratio = r["10x"] / r["sf0.1"] if r["sf0.1"] > 0 else float("nan")
        print(f"{name:24} {r['sf0.1']:>8.2f} {r['10x']:>8.2f} {ratio:>7.2f}")
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
