"""Scale-slope probe: run representative operators at sf0.1 and at a
10x-row synthetic blow-up, and report the time slope.

Naive row duplication would distort JOIN multiplicities (duplicated
dimension keys fan out fact joins quadratically), so the blow-up remaps
keys into disjoint id spaces per copy CONSISTENTLY across tables:
l_orderkey/o_orderkey share one remap, l_partkey/p_partkey another,
l_suppkey/s_suppkey and o_custkey/c_custkey likewise — every fact row
joins exactly its own copy's dimension rows, preserving base join
fan-out. nation/region stay fixed (a country list does not grow with
the corpus). That makes BOTH families honest: single-table semantics
(scan, aggregate, window-per-key, text/dedup/multimodal, per-user
event ops: 10x rows, 10x groups, same per-group history) AND the
fact+dims joins (report_sales_by_*, as-of join, the whole ETL
pipeline: 10x facts against 10x-wider dims at 1:1 multiplicity).

A slope <= 10x for 10x data means the operator is at-worst linear at
this size; slopes near 1x mean fixed (scheduling/codegen) costs still
dominate. Superlinear slopes (>10x) would flag an accidental quadratic
— none exist (see SCALE_PROBE.md for a recorded run).

Usage:  python scale_probe.py   (writes /tmp/scale10, prints a table)

Skew mode (round-5 verdict task #5):

    python scale_probe.py --skew zipf     (or SPARK_GRAFT_PROBE_SKEW=zipf)

The standard blow-up deliberately preserves UNIFORM key fan-out, so the
salted paths had never been probed against the keys they exist for.
``--skew zipf`` builds a second blow-up whose events.user_id follows a
Zipf(1)-like law over ONE shared key domain across copies (inverse-CDF
``floor(nu^u)`` with u hashed from event_id): at 10 copies the hottest
key owns ~7% of ALL rows (~400k rows on one reducer key at sf0.1×10).
It then times, at base and at the skewed blow-up:

- plain shuffle join vs the salted join (``join_salted_skew``), both
  with autoBroadcastJoinThreshold=-1 (at 100 TB the dimension is not
  broadcast-able — that is exactly when skew matters), the plain join
  with AQE skew-split on AND off (AQE is the first-line defense; the
  salt is for when AQE cannot observe sizes);
- ``distrank.add_global_row_number`` (plain range bins — a mega-tie
  collapses into ONE bin) vs ``add_global_row_number_skewed`` (tie runs
  split by a bounded fine_bin), ranking events by the zipf-hot key.
"""

from __future__ import annotations

import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
BIG = f"/tmp/scale{COPIES}"

QUERIES = [
    "agg_pricing_summary", "window_gaps_islands", "events_time_bucket_15min",
    "events_sliding_window_rollup", "agg_value_histogram",
    "text_stats", "text_langid", "text_tfidf_top3", "text_sequence_pack",
    "text_freq_items_sketch", "pipeline_corpus_clean",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_winnow_fingerprints", "dedup_chunk_dupe_ratio",
    "multimodal_features", "multimodal_resize",
    "sim_lsh_topk", "udf_ewma_per_user",
    "events_pii_scrub", "docs_pii_clean_ratio",
    "events_funnel_conversion", "agg_trimmed_mean", "text_token_budget_sample",
    "dedup_semdedup_purge",
    "embed_pca_gramian", "embed_int8_quantize", "multimodal_decode_gif",
    "multimodal_video_frames",
    # multi-table joins (consistent per-copy key remaps keep 1:1 fan-out)
    "report_sales_by_customer", "report_sales_by_supplier",
    "join_asof_last_view", "tpch_q3_shipping_priority",
    "join3_projection",
    # restart-session additions: layout, maintenance, PQ, streaming/CDC
    "layout_hilbert_buckets", "maintenance_zone_map_prune",
    "maintenance_snapshot_diff", "sim_pq_adc_topk",
    "cdc_apply_changelog", "stream_hourly_rollup_merge",
    # governance / ER / video-container / spatial additions
    "privacy_k_anonymity", "sample_stratified_split",
    "er_fuzzy_parts", "multimodal_video_avi_mjpeg", "geo_grid_nn_join",
    "incremental_join_merge", "pipeline_training_mix",
    "agg_join_size_estimate", "quality_expectations", "agg_market_basket",
    "agg_pareto_frontier", "join_point_in_time_features",
    "events_pattern_regex", "multimodal_mp4_metadata",
    # session additions: layout/ingest/feature/graph/experiment operators
    "join_bucketed_no_shuffle", "archive_tar_webdataset",
    "feat_target_encoding_loo", "feat_hashing_trick",
    "sample_systematic_every_k", "graph_common_neighbors",
    "text_inverted_index", "window_sliding_median_exact",
    "ts_cusum_changepoint", "ts_theil_sen_trend", "ab_test_proportion_z",
    "join_bloom_semi_reduction", "dedup_containment_ngram",
    "embed_random_projection",
    # later session additions
    "text_count_min_sketch", "text_bm25_topk", "multimodal_image_phash",
    "events_survival_nelson_aalen", "profile_dataset_card",
    "agg_log2_histogram", "events_bot_burst_detect",
    "events_max_concurrent_sessions", "events_attribution_multitouch",
    "maintenance_cbo_stats", "maintenance_commit_log_replay",
    "sql_scripting_adaptive_threshold", "join_dpp_partitioned_fact",
    "events_dau_wau", "agg_abc_classification", "window_rolling_ols_slope",
    "agg_hhi_concentration", "agg_bootstrap_ci",
    "ts_weekday_seasonality_index", "agg_chi_square_independence",
    "agg_ks_two_sample", "privacy_dp_noisy_counts",
    "embed_matryoshka_recall", "sample_hard_negatives",
    "stream_bot_burst_merge", "multimodal_video_scene_cuts",
    "fn_trigram_similarity_topk",
    "text_ngram_novelty", "window_hampel_outliers", "text_compression_ratio",
    "join_asof_tolerance", "udf_sql_registered_pandas",
    "agg_top_movers_period_delta", "multimodal_audio_silence_trim",
    "quality_luhn_checksum", "multimodal_pdf_catalog",
    "text_boilerplate_segment_dedup",
    "incremental_session_stitch", "agg_bucketed_no_shuffle",
    "events_bounce_rate",
    # round-3 final-session additions
    "source_multiformat_roundtrip", "maintenance_time_travel_read",
    "text_url_canonicalize", "text_bpe_train_merges",
    "multimodal_image_resize", "dedup_exact_substring_spans",
    "incremental_scd2_apply", "rag_hybrid_rrf_fusion",
    "window_fifo_allocation", "events_ohlc_hourly", "fn_aes_roundtrip",
    "privacy_erasure_propagation", "events_session_window_builtin",
    "sql_execute_immediate", "fn_collation_group",
    "incremental_partition_backfill",
    "source_json_corrupt_quarantine", "pipeline_observe_metrics",
    "layout_sorted_files", "stream_watermark_late_drop",
    "sample_balanced_classes", "privacy_tokenize_consistent",
    "source_codec_matrix", "incremental_late_arriving_dimension",
    "dedup_incremental_new_docs", "sql_identifier_dynamic_table",
    "maintenance_vacuum_orphans", "quality_volume_anomaly_days",
    "events_decay_weighted_score",
    # sixth-session additions (source_python_datasource_agg is
    # SF-invariant by design, graph_sssp_bellman_ford's graph is
    # bounded by the doc_id<100 cap like the other graph queries)
    "udf_cogroup_asof_merge", "udf_iterator_batch_scoring",
    "ts_autocorrelation", "sim_mmr_diversify",
    "source_hive_partitioned_prune", "source_schema_evolution_merge",
    "privacy_t_closeness", "stream_sliding_complete_mode",
    "stream_restart_resume_counts", "text_dsir_importance",
    "events_wilson_ctr_ranking", "join_interval_overlap_binned",
    "udf_arrow_native_scalar", "ab_did_two_period", "sql_named_parameters",
    "join_hint_strategy_invariance", "window_largest_remainder_apportion",
    "maintenance_two_table_atomic_publish", "privacy_randomized_response",
    "rag_rank_biased_overlap", "incremental_agg_retraction",
    "udf_udtf_analyze_schema", "sample_negative_unigram_cdf",
    "maintenance_merge_on_read", "graph_kcore_peel", "text_rake_keywords",
    "sample_temporal_split_leakage", "events_markov_stationary_power",
    "incremental_sliding_refresh", "events_littles_law_audit",
    "quality_functional_dependency_audit", "dedup_store_retention_gc",
    "udf_broadcast_lookup_scoring", "stream_sink_batchid_idempotence",
    "layout_consistent_hash_ring", "events_time_weighted_average",
    "multimodal_image_patches", "ts_linear_interpolate_grid",
    "source_provenance_input_file", "pipeline_mixture_temperature",
    "events_feature_drift_psi", "source_fixed_width_parse",
    "text_zipf_slope", "events_attribution_time_decay",
    "incremental_scan_composite_hwm", "ab_mann_whitney_u",
    "text_code_detection", "setop_symmetric_difference",
    # round-4 additions: the three distrank rewrites (distributed
    # global NTILE / boundary sweep) + the new MP4 MJPEG decode lane
    "events_rfm_segmentation", "multimodal_decode_mp4_frames",
    "window_ntile_quartiles",
    # round-5 addition: the moov-at-end MJPEG lane (tail-window sniff)
    "multimodal_decode_mp4_moov_tail",
    # round-6 additions (verdict task #3): RANGE frames over numeric
    # keys and a copy-on-write maintenance representative
    "window_range_between_numeric", "maintenance_compact_small_files",
]

#: Special-cased: the reference's whole-job ETL scenario (incremental
#: scan -> 3-way join -> cache -> 2 concurrent reports -> parquet sinks
#: -> bookmark commit) is a function of (spark, sf_dir, out_dir), not a
#: registry entry; probed alongside the queries.
PROBE_ETL = True


def build_big() -> None:
    import duckdb

    expected = [
        "documents", "events", "lineitem", "orders", "customer",
        "supplier", "part", "embeddings", "nation", "region",
    ]
    if all(os.path.exists(f"{BIG}/{t}.parquet") for t in expected):
        return  # corpus for this COPIES already built (BIG embeds COPIES)
    os.makedirs(BIG, exist_ok=True)
    con = duckdb.connect()
    remaps = {
        # Text CONTENT is remapped per copy too (every token prefixed
        # with the copy id): for content-keyed operators — dedup,
        # shingling, chunk hashing — the shingle space IS the key
        # space. Duplicating text verbatim would give every doc
        # COPIES-1 exact twins, growing the TRUE duplicate-pair
        # universe ×COPIES² by construction and measuring the data
        # regime, not the operator (observed: the exact ground-truth
        # join inside dedup_minhash_lsh at 16× for 10× data on
        # verbatim copies, linear once shingle spaces are disjoint).
        "documents": (
            "doc_id + i * 1000000 AS doc_id, "
            "regexp_replace(text, '(\\S+)', 'c' || i || '_\\1', 'g') AS text, "
            "lang, source, n_chars"
        ),
        "events": (
            "event_id + i * 100000000 AS event_id, user_id + i * 1000000 AS user_id, "
            "ts, event_type, value, props"
        ),
        # Shared remap constants per KEY DOMAIN, not per table, so every
        # fact row joins exactly its own copy's dimension rows (1:1 join
        # fan-out preserved): orderkey +i*1e8 on both sides, partkey /
        # suppkey / custkey +i*1e6 on both sides.
        "lineitem": (
            "l_orderkey + i * 100000000 AS l_orderkey, "
            "l_partkey + i * 1000000 AS l_partkey, "
            "l_suppkey + i * 1000000 AS l_suppkey, "
            "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
            "l_returnflag, l_linestatus, l_shipdate"
        ),
        "orders": (
            "o_orderkey + i * 100000000 AS o_orderkey, "
            "o_custkey + i * 1000000 AS o_custkey, "
            "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        ),
        "customer": (
            "c_custkey + i * 1000000 AS c_custkey, c_name, c_nationkey, "
            "c_acctbal, c_mktsegment"
        ),
        "supplier": (
            "s_suppkey + i * 1000000 AS s_suppkey, s_name, s_nationkey, s_acctbal"
        ),
        "part": (
            "p_partkey + i * 1000000 AS p_partkey, p_name, p_brand, p_type, "
            "p_size, p_retailprice"
        ),
        # label is remapped too: cluster-scoped operators (SemDeDup) key
        # on it, and a real clustering grows cell COUNT with the corpus
        # (k ∝ n, bounded cell size) — leaving label fixed would grow
        # cells 10× instead and fake a quadratic out of per-cell work.
        "embeddings": (
            "vec_id + i * 1000000 AS vec_id, "
            "CAST(label + i * 10 AS INTEGER) AS label, embedding"
        ),
    }
    for table, cols in remaps.items():
        con.execute(
            f"COPY (SELECT {cols} FROM '{BASE}/{table}.parquet', "
            f"unnest(range({COPIES})) AS g(i)) "
            f"TO '{BIG}/{table}.parquet' (FORMAT parquet)"
        )
    # nation/region: fixed-size dims (a country list does not grow with
    # the corpus) — copied once, unscaled.
    for table in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM '{BASE}/{table}.parquet') "
            f"TO '{BIG}/{table}.parquet' (FORMAT parquet)"
        )


ZIPF_BIG = f"/tmp/scale{COPIES}_zipf"


def build_big_zipf() -> None:
    """Blow-up with POWER-LAW fact keys: events.user_id is drawn from
    one SHARED Zipf-like domain across all copies (the hot key must be
    hot across the whole corpus, not per-copy), event_id stays
    per-copy-offset for uniqueness, and customer is copied once
    unscaled so join multiplicity stays 1:1 per key."""
    import duckdb

    if all(os.path.exists(f"{ZIPF_BIG}/{t}.parquet") for t in ("events", "customer")):
        return
    os.makedirs(ZIPF_BIG, exist_ok=True)
    con = duckdb.connect()
    nu = con.execute(
        f"SELECT max(c_custkey) FROM '{BASE}/customer.parquet'"
    ).fetchone()[0]
    # inverse-CDF Zipf(1) tail: u ~ U[0,1) from a hash of the unique
    # event id, rank = floor(nu^u) in [1, nu] — P(rank <= r) = ln r /
    # ln nu, so rank 1 owns ln2/ln(nu) of ALL rows across copies
    con.execute(
        f"""
        COPY (
          SELECT event_id + i * 100000000 AS event_id,
                 GREATEST(1, LEAST({nu}, CAST(POWER({nu},
                     (hash(event_id + i * 100000000) % 1000000) / 1000000.0
                 ) AS BIGINT))) AS user_id,
                 ts, event_type, value, props
          FROM '{BASE}/events.parquet', unnest(range({COPIES})) AS g(i)
        ) TO '{ZIPF_BIG}/events.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"COPY (SELECT * FROM '{BASE}/customer.parquet') "
        f"TO '{ZIPF_BIG}/customer.parquet' (FORMAT parquet)"
    )


def skew_probe() -> None:
    """Salted-vs-unsalted lanes under real power-law keys (see module
    docstring). Prints one slope table; salted lanes must stay ~flat
    per-row while the unprotected lanes degrade."""
    from pyspark.sql import functions as F

    from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.distrank import (
        add_global_row_number,
        add_global_row_number_skewed,
        range_bin,
    )
    from aws_glue_pyspark_incrementality_and_parallelism_spark.plans.catalog import REGISTRY
    from aws_glue_pyspark_incrementality_and_parallelism_spark.session import build_spark
    from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import load_table

    build_big_zipf()
    spark = build_spark(app_name="skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # at 100 TB the dimension is not broadcast-able; forcing the
    # shuffle join is the point of the probe
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def join_unsalted(sfd: str):
        e = load_table(spark, sfd, "events")
        c = load_table(spark, sfd, "customer").select("c_custkey", "c_mktsegment")
        return (
            e.join(c, e.user_id == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,4)"))
                .cast("double")
                .alias("total_value"),
            )
        )

    def rank_plain(sfd: str):
        e = load_table(spark, sfd, "events").select("event_id", "user_id")
        span = e.agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi")).collect()[0]
        return add_global_row_number(
            e, "user_id", "event_id", span["lo"], span["hi"], "rn"
        )

    def rank_skewed(sfd: str):
        e = load_table(spark, sfd, "events").select("event_id", "user_id")
        span = e.agg(
            F.min("user_id").alias("lo"), F.max("user_id").alias("hi"),
            F.min("event_id").alias("elo"), F.max("event_id").alias("ehi"),
        ).collect()[0]
        # fine_bin: bounded (256) range bin over the tiebreak — monotone
        # in event_id within a tie, the bigint analogue of prefix2_bin
        e = e.withColumn(
            "__fb", range_bin(F.col("event_id"), span["elo"], span["ehi"], 256)
        )
        return add_global_row_number_skewed(
            e, "user_id", "event_id", "__fb", span["lo"], span["hi"], "rn"
        )

    SALT = 16

    def agg_algebraic_plain(sfd: str):
        # algebraic agg (count/sum): map-side partial aggregation
        # already neutralizes key skew — each task emits one partial
        # row per local key, so the hot key's reducer sees ~#tasks
        # rows, not #rows. Expected FLAT; recorded to document WHY the
        # salted path targets holistic aggregates, not these.
        e = load_table(spark, sfd, "events")
        return e.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("total"),
        )

    def agg_holistic_plain(sfd: str):
        # holistic agg (collect_list): no map-side combine — EVERY row
        # of the hot key crosses the shuffle to one reducer task.
        e = load_table(spark, sfd, "events")
        return e.groupBy("user_id").agg(
            F.size(F.collect_list("event_id")).alias("n_collected")
        )

    def agg_holistic_salted(sfd: str):
        # two-phase: collect per (key, salt) — the hot key fans across
        # SALT reducers — then re-aggregate the per-salt sizes.
        e = load_table(spark, sfd, "events").withColumn(
            "_salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT)).cast("int")
        )
        return (
            e.groupBy("user_id", "_salt")
            .agg(F.size(F.collect_list("event_id")).alias("n_part"))
            .groupBy("user_id")
            .agg(F.sum("n_part").cast("int").alias("n_collected"))
        )

    lanes = [
        ("join_unsalted(+AQE skew)", join_unsalted, None),
        ("join_unsalted(-AQE skew)", join_unsalted, "false"),
        ("join_salted_skew", lambda sfd: REGISTRY["join_salted_skew"].fn(spark, sfd), None),
        ("rank_plain_bins", rank_plain, None),
        ("rank_skewed_bins", rank_skewed, None),
        ("agg_algebraic_plain", agg_algebraic_plain, None),
        ("agg_holistic_plain", agg_holistic_plain, None),
        ("agg_holistic_salted", agg_holistic_salted, None),
    ]

    def run(fn, sfd: str) -> float:
        t0 = time.perf_counter()
        fn(sfd).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    print(f"# skew probe: base={BASE}  zipf-blowup={ZIPF_BIG} ({COPIES}x rows, "
          f"hottest key ~ln2/ln(nu) of all rows)")
    for name, fn, aqe_skew in lanes:
        if aqe_skew is not None:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe_skew)
        try:
            run(fn, BASE)  # warm
            base = min(run(fn, BASE), run(fn, BASE))
            big = min(run(fn, ZIPF_BIG), run(fn, ZIPF_BIG))
            print(f"{name:28s} sf0.1={base:6.2f}s  {COPIES}x-zipf={big:6.2f}s  "
                  f"slope={big / base:5.1f}x")
        finally:
            if aqe_skew is not None:
                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.stop()


def main() -> None:
    from aws_glue_pyspark_incrementality_and_parallelism_spark.plans.catalog import REGISTRY
    from aws_glue_pyspark_incrementality_and_parallelism_spark.session import build_spark

    build_big()
    spark = build_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sfd: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sfd).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    def drain() -> None:
        """Release accumulated executor state between measurements.

        localCheckpoint blocks from prior queries (MinHash candidates,
        component labels) are only freed when the JVM ContextCleaner sees
        the RDD unreferenced — py4j releases lazily, so without an
        explicit GC nudge a later query can measure the earlier queries'
        memory pressure instead of its own cost (observed: EWMA 6s
        isolated vs 160s after the dedup suite in one session)."""
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    only = os.environ.get("SPARK_GRAFT_PROBE_ONLY")
    if only:
        wanted = set(only.split(","))
        unknown = wanted - set(QUERIES)
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_PROBE_ONLY names not in QUERIES: {sorted(unknown)}")
        todo = [q for q in QUERIES if q in wanted]
    else:
        todo = QUERIES

    worst = 0.0
    for name in todo:
        run(name, BASE)  # warm codegen + Python worker pool
        drain()
        base = min(run(name, BASE), run(name, BASE))
        drain()
        big = min(run(name, BIG), run(name, BIG))
        drain()
        slope = big / base
        worst = max(worst, slope)
        print(f"{name:32s} sf0.1={base:6.2f}s  {COPIES}x={big:6.2f}s  slope={slope:5.1f}x")

    if PROBE_ETL and not only:
        import tempfile

        from aws_glue_pyspark_incrementality_and_parallelism_spark import pipeline

        def run_etl(sfd: str) -> float:
            with tempfile.TemporaryDirectory() as tmp:
                t0 = time.perf_counter()
                pipeline.run_etl(spark, sfd, tmp)
                return time.perf_counter() - t0

        run_etl(BASE)  # warm
        drain()
        base = min(run_etl(BASE), run_etl(BASE))
        drain()
        big = min(run_etl(BIG), run_etl(BIG))
        drain()
        slope = big / base
        worst = max(worst, slope)
        print(f"{'etl_pipeline_concurrent':32s} sf0.1={base:6.2f}s  {COPIES}x={big:6.2f}s  slope={slope:5.1f}x")

    print(f"worst slope: {worst:.1f}x for {COPIES}x data "
          f"({'OK - subquadratic' if worst <= COPIES * 1.5 else 'SUPERLINEAR - investigate'})")
    spark.stop()


if __name__ == "__main__":
    skew_mode = os.environ.get("SPARK_GRAFT_PROBE_SKEW")
    if "--skew" in sys.argv:
        skew_mode = sys.argv[sys.argv.index("--skew") + 1]
    if skew_mode:
        if skew_mode != "zipf":
            raise SystemExit(f"unknown skew mode {skew_mode!r} (only 'zipf')")
        skew_probe()
    else:
        main()
