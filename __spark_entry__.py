"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Every entry maps to an operator in SURVEY.md §2 or to the
LLM-data-pipeline layer (dedup / similarity / text / multimodal).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from clickhouse_sinker_nali_spark.operators import advanced as A
from clickhouse_sinker_nali_spark.operators import aggstate as AST
from clickhouse_sinker_nali_spark.operators import classifier as CL
from clickhouse_sinker_nali_spark.operators import bpe as B
from clickhouse_sinker_nali_spark.operators import curation as C
from clickhouse_sinker_nali_spark.operators import dedup as D
from clickhouse_sinker_nali_spark.operators import graph as G
from clickhouse_sinker_nali_spark.operators import ingest as I
from clickhouse_sinker_nali_spark.operators import multimodal as M
from clickhouse_sinker_nali_spark.operators import relational as R
from clickhouse_sinker_nali_spark.operators import scale as SC
from clickhouse_sinker_nali_spark.operators import similarity as S
from clickhouse_sinker_nali_spark.operators import text as T
from clickhouse_sinker_nali_spark.operators import warehouse as W
from clickhouse_sinker_nali_spark.operators import warehouse_ext as WX


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing-summary aggregation) on sf0.001."""
    return R.q1_pricing_summary(spark, "/root/testdata/sf0.001")


# The driver's correctness gate hashes the FIRST 50 ``queries()`` entries;
# r1-r7 all exposed the same 50, leaving 132 registry entries local-sweep-
# green but never driver-verified (r7 verdict task #3).  This window
# surfaces 50 previously-unseen names — including every operator the r8
# unpartitioned-window fixes touched — so the cumulative driver-verified
# set reaches 100/182.  The full registry stays ordered/grouped in
# ``_all_queries``; rotation only reorders the returned dict.
_R8_WINDOW = [
    # r8-touched (unpartitioned-window family + its oracle dependencies)
    "vocab_topk", "inverted_index_postings", "bm25_topk", "kmv_set_ops",
    "perplexity_buckets", "bpe_pair_counts", "unigram_logprob",
    "dsir_importance", "bigram_kn_logprob", "doremi_weights",
    # TPC-H shapes never driver-checked
    "q2_min_cost_supplier", "q6_forecast_revenue", "q8_market_share",
    "q9_product_profit", "q11_important_stock", "q12_priority_counts",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_counts", "q19_disjunctive_revenue",
    "q20_excess_suppliers", "q21_waiting_suppliers", "q22_idle_customers",
    # scale / sketch operators (incl. the two allowlisted bounded windows)
    "gapfill_daily_locf", "sequence_pack",
    "kmv_distinct_sketch", "quantile_sketch_bottomk", "cms_heavy_hitters",
    "hll_distinct_sketch",
    # dedup / ANN (dedup_embedding_cosine_cells and lsh_bucket_stats
    # ceded their slots to the two r8-born operators below: both are
    # sf1-hash-green and cells is sf10-hash-proven this round, while the
    # newborns have never been driver-checked)
    "semdedup", "dedup_lsh_recall", "dedup_jaccard_prefix",
    "dedup_tfidf_cosine", "ann_pq_topk",
    "ann_ivfpq_topk", "ann_ivf_hier_topk", "ann_matryoshka_topk",
    "knn_label_vote", "intradoc_line_dedup", "hybrid_retrieval_rrf",
    # text quality / curation / graph
    "gopher_quality_filter", "c4_filters", "boilerplate_lines",
    "ccnet_buckets", "normalize_text", "tfidf_top_terms", "decontaminate",
    "curation_pipeline", "doc_pagerank",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = _all_queries()
    rotated = {n: q[n] for n in _R8_WINDOW}
    rotated.update((n, f) for n, f in q.items() if n not in rotated)
    return rotated


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational / analytics layer
        "q1_pricing_summary": R.q1_pricing_summary,
        "q3_shipping_priority": R.q3_shipping_priority,
        "q5_star_join": R.q5_star_join,
        "q7_volume_by_year": R.q7_volume_by_year,
        "q10_returned_revenue": R.q10_returned_revenue,
        "window_user_events": R.window_user_events,
        "sessionize_events": R.sessionize_events,
        "rollup_orders": R.rollup_orders,
        "cube_lineitem": R.cube_lineitem,
        "set_ops_nations": R.set_ops_nations,
        "topk_parts": R.topk_parts,
        "distinct_event_users": R.distinct_event_users,
        "approx_distinct_users": R.approx_distinct_users,
        "asof_join_events_orders": R.asof_join_events_orders,
        "range_join_buckets": R.range_join_buckets,
        "q4_exists_priority": R.q4_exists_priority,
        "q17_small_quantity_revenue": R.q17_small_quantity_revenue,
        "q18_large_volume_customers": R.q18_large_volume_customers,
        # dedup family (documents / embeddings)
        "dedup_exact": D.dedup_exact,
        "dedup_ngram_jaccard": D.dedup_ngram_jaccard,
        "minhash_signatures": D.minhash_signatures,
        "dedup_minhash_lsh": D.dedup_minhash_lsh,
        "minhash_index_delta": D.minhash_index_delta,
        "simhash_signatures": D.simhash_signatures,
        "dedup_simhash": D.dedup_simhash,
        "dedup_embedding_cosine": D.dedup_embedding_cosine,
        "dedup_clusters": D.dedup_clusters,
        "dedup_exact_substring": D.dedup_exact_substring,
        # similarity search
        "ann_bruteforce_topk": S.ann_bruteforce_topk,
        "ann_lsh_topk": S.ann_lsh_topk,
        "ann_ivf_topk": S.ann_ivf_topk,
        "ann_ivf_persisted": S.ann_ivf_persisted,
        # oracle-checked since r7: fixed-point (integer-sum) Lloyd update
        # makes each sweep bit-reproducible, so the DuckDB twin replays the
        # full refinement chain (was rows-only through r6)
        "ann_ivf_kmeans_topk": S.ann_ivf_kmeans_topk,
        "embedding_quantize": S.embedding_quantize,
        "ann_int8_topk": S.ann_int8_topk,
        # text analysis
        "lang_id": T.lang_id,
        "token_stats": T.token_stats,
        "quality_score": T.quality_score,
        "doc_fingerprint": T.doc_fingerprint,
        # multimodal (Pandas-UDF plumbing, deterministic fake decode)
        "multimodal_decode_meta": M.multimodal_decode_meta,
        "multimodal_frame_sample": M.multimodal_frame_sample,
        "multimodal_resize": M.multimodal_resize,
        "multimodal_features": M.multimodal_features,
        # ingest-engine parity (parsers / coercion / datetime / shard / enrich)
        "ingest_json_coerce": I.ingest_json_coerce,
        "ingest_csv_parse": I.ingest_csv_parse,
        "ingest_datetime_layouts": I.ingest_datetime_layouts,
        "shard_routing": I.shard_routing,
        "geoip_enrich": I.geoip_enrich,
        "class_normalize": I.class_normalize,
        "prometheus_series_split": I.prometheus_series_split,
        # second wave: nested paths, anti-join dedup, pivot, subqueries,
        # percentiles
        "nested_json_paths": A.nested_json_paths,
        "series_antijoin_dedup": A.series_antijoin_dedup,
        "pivot_event_types": A.pivot_event_types,
        "customers_semi_anti": A.customers_semi_anti,
        "price_percentiles": A.price_percentiles,
        "time_bucket_rollup": A.time_bucket_rollup,
        "multires_rollup": A.multires_rollup,
        "prometheus_metric_rows": A.prometheus_metric_rows,
        # third wave: PII scrub, deterministic sampling / splits, skew salting
        "pii_redact": T.pii_redact,
        "stratified_sample": A.stratified_sample,
        "train_val_test_split": A.train_val_test_split,
        "sample_per_group": A.sample_per_group,
        "skew_join_salted": SC.skew_join_salted,
        "zorder_events": SC.zorder_events,
        # corpus analysis: vocab building, repetition quality, decontamination
        "vocab_topk": T.vocab_topk,
        "bpe_pair_counts": B.bpe_pair_counts,
        "bpe_learn_merges": B.bpe_learn_merges,
        "bpe_encode": B.bpe_encode,
        "ngram_repetition": T.ngram_repetition,
        "decontaminate": T.decontaminate,
        # flagship composition: full curation chain
        "curation_pipeline": C.curation_pipeline,
        # fourth wave: warehouse query family + gap-fill + sequence packing
        "q6_forecast_revenue": W.q6_forecast_revenue,
        "q12_priority_counts": W.q12_priority_counts,
        "q14_promo_revenue": W.q14_promo_revenue,
        "q16_supplier_part_counts": W.q16_supplier_part_counts,
        "q13_customer_distribution": W.q13_customer_distribution,
        "q8_market_share": W.q8_market_share,
        "q19_disjunctive_revenue": W.q19_disjunctive_revenue,
        "q22_idle_customers": W.q22_idle_customers,
        "grouping_sets_orders": W.grouping_sets_orders,
        "gapfill_daily_locf": A.gapfill_daily_locf,
        "sequence_pack": C.sequence_pack,
        "tfidf_top_terms": T.tfidf_top_terms,
        "length_histogram": T.length_histogram,
        "pmi_bigrams": T.pmi_bigrams,
        "funnel_counts": A.funnel_counts,
        "cohort_retention": A.cohort_retention,
        "quantile_sketch_bottomk": A.quantile_sketch_bottomk,
        # fifth wave: distinct sketch, anomaly scan, moving window, postings
        "kmv_distinct_sketch": A.kmv_distinct_sketch,
        "cms_heavy_hitters": A.cms_heavy_hitters,
        "gopher_quality_filter": T.gopher_quality_filter,
        "c4_filters": T.c4_filters,
        "boilerplate_lines": T.boilerplate_lines,
        "ccnet_buckets": T.ccnet_buckets,
        "semdedup": S.semdedup,
        "ann_matryoshka_topk": S.ann_matryoshka_topk,
        "mixture_sample": C.mixture_sample,
        "bpe_fertility_by_lang": B.bpe_fertility_by_lang,
        "dedup_lsh_recall": D.dedup_lsh_recall,
        "dsir_importance": T.dsir_importance,
        "zscore_day_anomalies": A.zscore_day_anomalies,
        "rolling_7day_revenue": W.rolling_7day_revenue,
        "inverted_index_postings": T.inverted_index_postings,
        "doc_pagerank": G.doc_pagerank,
        "doc_triangles": G.doc_triangles,
        "weighted_sample_pps": A.weighted_sample_pps,
        "entity_extract": I.entity_extract,
        "unigram_logprob": T.unigram_logprob,
        "profile_columns": A.profile_columns,
        "scd2_customer_status": W.scd2_customer_status,
        "cdc_apply": W.cdc_apply,
        "full_outer_reconcile": R.full_outer_reconcile,
        "chunk_documents": C.chunk_documents,
        "gdpr_delete_cascade": C.gdpr_delete_cascade,
        "bm25_topk": T.bm25_topk,
        "knn_label_vote": S.knn_label_vote,
        "bloom_membership": D.bloom_membership,
        "perplexity_buckets": T.perplexity_buckets,
        "contrastive_pairs": S.contrastive_pairs,
        "export_shards": C.export_shards,
        "normalize_text": T.normalize_text,
        "ann_recall_audit": S.ann_recall_audit,
        "multimodal_audio_chunks": M.multimodal_audio_chunks,
        "dedup_jaccard_prefix": D.dedup_jaccard_prefix,
        # sixth wave: the six remaining TPC-H query shapes — all 22 covered
        **WX.QUERIES,
        # mergeable aggregate state (AggregatingMergeTree twin) + segment-
        # level exact-substring dedup as a document transform
        "agg_state_roundtrip": AST.agg_state_roundtrip,
        "segment_dedup": C.segment_dedup,
        "quality_classifier_scores": CL.quality_classifier_scores,
        "temperature_resample": C.temperature_resample,
        # seventh wave: training-order / budget ops (curriculum interleave,
        # per-source token budgets, seeded epoch shuffle) + the sliding
        # COUNT-DISTINCT rollup via explode-to-contributing-windows
        "curriculum_order": C.curriculum_order,
        "token_budget_select": C.token_budget_select,
        "epoch_shuffle": C.epoch_shuffle,
        "sliding_distinct_users": W.sliding_distinct_users,
        # PQ: the memory-bound ANN scale path (4-bit subspace codes + ADC)
        "ann_pq_topk": S.ann_pq_topk,
        # IVF-PQ: cell pruning × code compression (the FAISS default shape)
        "ann_ivfpq_topk": S.ann_ivfpq_topk,
        # composition proof: budget -> shuffle -> pack in one plan
        "make_training_run": C.make_training_run,
        # crawl-to-crawl reconciliation + tokenizer alphabet statistic
        "snapshot_diff": W.snapshot_diff,
        "char_coverage": T.char_coverage,
        "window_funcs_extended": R.window_funcs_extended,
        # hypertable family completion: irregular-sampling statistic
        "time_weighted_avg": A.time_weighted_avg,
        # full merge_asof surface: backward/forward/nearest/tolerance
        "asof_join_variants": R.asof_join_variants,
        # closed-form OLS drift detection (exact-sum determinism)
        "user_value_trend": A.user_value_trend,
        # graph family completion: clique-ness of each dup neighborhood
        "doc_clustering": G.doc_clustering,
        # bit-reproducible HLL (mergeable registers, integer harmonic sum)
        "hll_distinct_sketch": A.hll_distinct_sketch,
        # theta-sketch set algebra: union/intersection from bottom-k alone
        "kmv_set_ops": A.kmv_set_ops,
        # interval x interval overlap via month-grid equi-join rewrite
        "interval_overlap_join": W.interval_overlap_join,
        # reshaping pair completion: wide -> long round-trip of the pivot
        "unpivot_event_metrics": A.unpivot_event_metrics,
        # categorical-drift monitor (order-free decimal chi-square sum)
        "chisq_independence": A.chisq_independence,
        # dedup-aware training weights: one survivor per cluster
        "cluster_weighted_sample": C.cluster_weighted_sample,
        # Kneser-Ney bigram LM scoring (continuation-count smoothing)
        "bigram_kn_logprob": T.bigram_kn_logprob,
        # sparse weighted-cosine near-dup (postings join, df-capped)
        "dedup_tfidf_cosine": D.dedup_tfidf_cosine,
        # diversity-maximizing data selection (Gonzalez greedy, k scans)
        "coreset_kcenter": S.coreset_kcenter,
        # contrastive-training negatives: nearest different-label vectors
        "hard_negatives": S.hard_negatives,
        # dynamic-batching twin: similar-length batches + padding waste
        "length_bucket_batches": C.length_bucket_batches,
        # MLM example builder: hash-gated token masking + labels
        "mlm_masking": C.mlm_masking,
        # robust outlier scan: median/MAD modified z-scores
        "mad_outliers": A.mad_outliers,
        # model-signal mixture weights (DoReMi-lite excess softmax)
        "doremi_weights": C.doremi_weights,
        # file lineage + order-insensitive content checksums per input file
        "ingest_provenance": I.ingest_provenance,
        # code-switch detection: windowed lang-ID + sessionized collapse
        "lang_segments": T.lang_segments,
        # outlier treatment: per-group quantile clipping audit
        "winsorize_values": A.winsorize_values,
        # corpus drift: bounded JS divergence between vocabulary halves
        "vocab_jsd_drift": T.vocab_jsd_drift,
        # video shot segmentation: UDF frame stage feeding window analytics
        "multimodal_shot_bounds": M.multimodal_shot_bounds,
        # capstone: one-row corpus health dashboard over the quality families
        "corpus_health_report": C.corpus_health_report,
        # per-key salt factors from the observed histogram (AQE-free skew fix)
        "skew_join_adaptive": SC.skew_join_adaptive,
        # retrieval evaluation: MRR + nDCG vs an independent truth signal
        "ir_eval_metrics": T.ir_eval_metrics,
        # engagement distribution: session survival curve S(t)
        "session_survival": A.session_survival,
        # first-order Markov behavior model: P(next event | current)
        "event_transitions": A.event_transitions,
        # hard-negative mining on the IVF-PQ scale path (probe -> ADC
        # shortlist with label predicate -> exact re-rank)
        "hard_negatives_ivfpq": S.hard_negatives_ivfpq,
        # embedding near-dup pairs blocked on the IVF cell id (bounded
        # blocks; the scale form of dedup_embedding_cosine)
        "dedup_embedding_cosine_cells": D.dedup_embedding_cosine_cells,
        # IVF with hierarchical O(sqrt(K)) corpus cell assignment (the
        # sf1 smoke's N*K flat-assignment fix)
        "ann_ivf_hier_topk": S.ann_ivf_hier_topk,
        # Arrow/NumPy-vectorized exact scoring (the interpreted-fold
        # constant's throughput fix; same oracle as the fold form)
        "ann_bruteforce_arrow": S.ann_bruteforce_arrow,
        "ann_pq_arrow": S.ann_pq_arrow,
        "ann_ivf_arrow": S.ann_ivf_arrow,
        "ann_ivfpq_arrow": S.ann_ivfpq_arrow,
        # composed hier×Arrow IVF assignment with broadcast-variable
        # centroid distribution (the K≈10⁵⁺ web-scale index-build shape)
        "ann_ivf_hier_arrow": S.ann_ivf_hier_arrow,
        # cell-blocked embedding dedup with the same hier assignment (the
        # dedup axis of the flat-assignment quadratic fix)
        "dedup_embedding_cosine_cells_hier": D.dedup_embedding_cosine_cells_hier,
        # r6: hot-bucket-cap observability (the recall dial's first read)
        "lsh_bucket_stats": D.lsh_bucket_stats,
        # r8: within-page repeated-line cleanup (intra-doc scope — the
        # missing member of the line family next to boilerplate_lines'
        # cross-doc df rule and segment_dedup's global first-occurrence)
        "intradoc_line_dedup": T.intradoc_line_dedup,
        # r8: hybrid retrieval — reciprocal-rank fusion of bm25_topk and
        # the exact dense ranking (composition of existing retrievers)
        "hybrid_retrieval_rrf": T.hybrid_retrieval_rrf,
        # r8: c-TF-IDF labels for the embedding-space clusters (corpus
        # exploration — the BERTopic readout over the IVF cells)
        "topic_clusters": T.topic_clusters,
        # r8: expected S-curve recall of every power-of-two banding of
        # the signature over the observed pair population (the LSH
        # tuning readout next to lsh_bucket_stats' cost side)
        "minhash_band_tuning": D.minhash_band_tuning,
        # r8: per-stage attrition through the quality chain (pure
        # composition of the filters' own keep booleans)
        "curation_funnel": T.curation_funnel,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": R.Q1_SQL,
        "q3_shipping_priority": R.Q3_SQL,
        "q5_star_join": R.Q5_SQL,
        "q7_volume_by_year": R.Q7_SQL,
        "q10_returned_revenue": R.Q10_SQL,
        "window_user_events": R.WINDOW_SQL,
        "sessionize_events": R.SESSIONIZE_SQL,
        "rollup_orders": R.ROLLUP_SQL,
        "cube_lineitem": R.CUBE_SQL,
        "set_ops_nations": R.SET_OPS_SQL,
        "topk_parts": R.TOPK_SQL,
        "distinct_event_users": R.DISTINCT_SQL,
        # r6: delegated to the grouped deterministic HLL, so the former
        # rows-only sketch query now has a full value-hash oracle
        "approx_distinct_users": R.APPROX_DISTINCT_SQL,
        "asof_join_events_orders": R.ASOF_SQL,
        "range_join_buckets": R.RANGE_JOIN_SQL,
        "q4_exists_priority": R.Q4_EXISTS_SQL,
        "q17_small_quantity_revenue": R.Q17_SCALAR_SQL,
        "q18_large_volume_customers": R.Q18_HAVING_SQL,
        "dedup_exact": D.DEDUP_EXACT_SQL,
        "dedup_ngram_jaccard": D.DEDUP_JACCARD_SQL,
        "minhash_signatures": D.MINHASH_SIG_SQL,
        "dedup_minhash_lsh": D.DEDUP_MINHASH_SQL,
        "minhash_index_delta": D.MINHASH_INDEX_DELTA_SQL,
        "simhash_signatures": D.SIMHASH_SIG_SQL,
        "dedup_simhash": D.DEDUP_SIMHASH_SQL,
        "dedup_embedding_cosine": D.DEDUP_EMBEDDING_SQL,
        "dedup_clusters": D.DEDUP_CLUSTERS_SQL,
        "dedup_exact_substring": D.DEDUP_SUBSTRING_SQL,
        "ann_bruteforce_topk": S.ANN_BRUTEFORCE_SQL,
        "ann_lsh_topk": S.ANN_LSH_SQL,
        "ann_ivf_topk": S.ANN_IVF_SQL,
        # identical results to ann_ivf_topk; the difference is the physical
        # plan (persisted cell-partitioned index + static partition pruning)
        "ann_ivf_persisted": S.ANN_IVF_SQL,
        # full Lloyd-refinement replay (3 chained sweeps, fixed-point update)
        "ann_ivf_kmeans_topk": S.ANN_IVF_KMEANS_SQL,
        "embedding_quantize": S.EMBEDDING_QUANTIZE_SQL,
        "ann_int8_topk": S.ANN_INT8_SQL,
        "lang_id": T.LANG_ID_SQL,
        "token_stats": T.TOKEN_STATS_SQL,
        "quality_score": T.QUALITY_SQL,
        "doc_fingerprint": T.DOC_FINGERPRINT_SQL,
        "multimodal_decode_meta": M.MULTIMODAL_DECODE_SQL,
        "multimodal_frame_sample": M.MULTIMODAL_FRAMES_SQL,
        "multimodal_resize": M.MULTIMODAL_RESIZE_SQL,
        "multimodal_features": M.MULTIMODAL_FEATURES_SQL,
        "ingest_json_coerce": I.INGEST_JSON_SQL,
        "ingest_csv_parse": I.INGEST_CSV_SQL,
        "ingest_datetime_layouts": I.INGEST_DATETIME_SQL,
        "shard_routing": I.SHARD_SQL,
        "geoip_enrich": I.GEOIP_SQL,
        "class_normalize": I.CLASS_NORMALIZE_SQL,
        "prometheus_series_split": I.PROMETHEUS_SQL,
        "nested_json_paths": A.NESTED_JSON_SQL,
        "series_antijoin_dedup": A.SERIES_ANTIJOIN_SQL,
        "pivot_event_types": A.PIVOT_SQL,
        "customers_semi_anti": A.SEMI_ANTI_SQL,
        "price_percentiles": A.PERCENTILES_SQL,
        "time_bucket_rollup": A.TIME_BUCKET_SQL,
        "multires_rollup": A.MULTIRES_ROLLUP_SQL,
        "prometheus_metric_rows": A.PROMETHEUS_METRIC_SQL,
        "pii_redact": T.PII_REDACT_SQL,
        "stratified_sample": A.STRATIFIED_SAMPLE_SQL,
        "train_val_test_split": A.TRAIN_VAL_TEST_SQL,
        "sample_per_group": A.SAMPLE_PER_GROUP_SQL,
        "skew_join_salted": SC.SKEW_JOIN_SQL,
        "zorder_events": SC.ZORDER_SQL,
        "vocab_topk": T.VOCAB_TOPK_SQL,
        "bpe_pair_counts": B.BPE_PAIR_COUNTS_SQL,
        "bpe_learn_merges": B.BPE_LEARN_MERGES_SQL,
        "bpe_encode": B.BPE_ENCODE_SQL,
        "ngram_repetition": T.NGRAM_REPETITION_SQL,
        "decontaminate": T.DECONTAMINATE_SQL,
        "curation_pipeline": C.CURATION_SQL,
        "q6_forecast_revenue": W.Q6_SQL,
        "q12_priority_counts": W.Q12_SQL,
        "q14_promo_revenue": W.Q14_SQL,
        "q16_supplier_part_counts": W.Q16_SQL,
        "q13_customer_distribution": W.Q13_SQL,
        "q8_market_share": W.Q8_SQL,
        "q19_disjunctive_revenue": W.Q19_SQL,
        "q22_idle_customers": W.Q22_SQL,
        "grouping_sets_orders": W.GROUPING_SETS_SQL,
        "gapfill_daily_locf": A.GAPFILL_SQL,
        "sequence_pack": C.SEQUENCE_PACK_SQL,
        "tfidf_top_terms": T.TFIDF_SQL,
        "length_histogram": T.LENGTH_HISTOGRAM_SQL,
        "pmi_bigrams": T.PMI_BIGRAMS_SQL,
        "funnel_counts": A.FUNNEL_SQL,
        "cohort_retention": A.COHORT_SQL,
        "quantile_sketch_bottomk": A.QUANTILE_SKETCH_SQL,
        "kmv_distinct_sketch": A.KMV_SKETCH_SQL,
        "cms_heavy_hitters": A.CMS_HEAVY_HITTERS_SQL,
        "gopher_quality_filter": T.GOPHER_FILTER_SQL,
        "c4_filters": T.C4_FILTERS_SQL,
        "boilerplate_lines": T.BOILERPLATE_SQL,
        "ccnet_buckets": T.CCNET_BUCKETS_SQL,
        "semdedup": S.SEMDEDUP_SQL,
        "ann_matryoshka_topk": S.ANN_MATRYOSHKA_SQL,
        "mixture_sample": C.MIXTURE_SAMPLE_SQL,
        "bpe_fertility_by_lang": B.BPE_FERTILITY_SQL,
        "dedup_lsh_recall": D.DEDUP_LSH_RECALL_SQL,
        "dsir_importance": T.DSIR_IMPORTANCE_SQL,
        "zscore_day_anomalies": A.ZSCORE_ANOMALY_SQL,
        "rolling_7day_revenue": W.ROLLING_7DAY_SQL,
        "inverted_index_postings": T.INVERTED_INDEX_SQL,
        "doc_pagerank": G.DOC_PAGERANK_SQL,
        "doc_triangles": G.DOC_TRIANGLES_SQL,
        "weighted_sample_pps": A.WEIGHTED_SAMPLE_SQL,
        "entity_extract": I.ENTITY_EXTRACT_SQL,
        "unigram_logprob": T.UNIGRAM_LOGPROB_SQL,
        "profile_columns": A.PROFILE_COLUMNS_SQL,
        "scd2_customer_status": W.SCD2_SQL,
        "cdc_apply": W.CDC_APPLY_SQL,
        "full_outer_reconcile": R.FULL_OUTER_SQL,
        "chunk_documents": C.CHUNK_SQL,
        "gdpr_delete_cascade": C.GDPR_CASCADE_SQL,
        "bm25_topk": T.BM25_SQL,
        "knn_label_vote": S.KNN_LABEL_VOTE_SQL,
        "bloom_membership": D.BLOOM_MEMBERSHIP_SQL,
        "perplexity_buckets": T.PPL_BUCKETS_SQL,
        "contrastive_pairs": S.CONTRASTIVE_SQL,
        "export_shards": C.EXPORT_SHARDS_SQL,
        "normalize_text": T.NORMALIZE_TEXT_SQL,
        "ann_recall_audit": S.ANN_RECALL_SQL,
        "multimodal_audio_chunks": M.MULTIMODAL_AUDIO_SQL,
        # lossless prefix filter: the oracle is the NAIVE formulation —
        # value-parity of the optimized physical strategy is the contract
        "dedup_jaccard_prefix": D.DEDUP_JACCARD_PREFIX_SQL,
        **WX.ORACLES,
        "agg_state_roundtrip": AST.AGG_STATE_SQL,
        "segment_dedup": C.SEGMENT_DEDUP_SQL,
        "quality_classifier_scores": CL.QUALITY_CLASSIFIER_SQL,
        "temperature_resample": C.TEMPERATURE_RESAMPLE_SQL,
        "curriculum_order": C.CURRICULUM_ORDER_SQL,
        "token_budget_select": C.TOKEN_BUDGET_SQL,
        "epoch_shuffle": C.EPOCH_SHUFFLE_SQL,
        "sliding_distinct_users": W.SLIDING_DISTINCT_SQL,
        "ann_pq_topk": S.ANN_PQ_SQL,
        "ann_ivfpq_topk": S.ANN_IVFPQ_SQL,
        "make_training_run": C.MAKE_TRAINING_RUN_SQL,
        "snapshot_diff": W.SNAPSHOT_DIFF_SQL,
        "char_coverage": T.CHAR_COVERAGE_SQL,
        "window_funcs_extended": R.WINDOW_FUNCS_EXT_SQL,
        "time_weighted_avg": A.TIME_WEIGHTED_AVG_SQL,
        "asof_join_variants": R.ASOF_VARIANTS_SQL,
        "user_value_trend": A.USER_VALUE_TREND_SQL,
        "doc_clustering": G.DOC_CLUSTERING_SQL,
        "hll_distinct_sketch": A.HLL_SKETCH_SQL,
        "kmv_set_ops": A.KMV_SET_OPS_SQL,
        "interval_overlap_join": W.INTERVAL_OVERLAP_SQL,
        "unpivot_event_metrics": A.UNPIVOT_SQL,
        "chisq_independence": A.CHISQ_SQL,
        "cluster_weighted_sample": C.CLUSTER_WEIGHTED_SQL,
        "bigram_kn_logprob": T.BIGRAM_KN_SQL,
        "dedup_tfidf_cosine": D.DEDUP_TFIDF_COSINE_SQL,
        "coreset_kcenter": S.CORESET_KCENTER_SQL,
        "hard_negatives": S.HARD_NEGATIVES_SQL,
        "length_bucket_batches": C.LENGTH_BUCKET_SQL,
        "mlm_masking": C.MLM_MASKING_SQL,
        "mad_outliers": A.MAD_OUTLIERS_SQL,
        "doremi_weights": C.DOREMI_SQL,
        "ingest_provenance": I.INGEST_PROVENANCE_SQL,
        "lang_segments": T.LANG_SEGMENTS_SQL,
        "winsorize_values": A.WINSORIZE_SQL,
        "vocab_jsd_drift": T.VOCAB_JSD_SQL,
        "multimodal_shot_bounds": M.MULTIMODAL_SHOTS_SQL,
        "corpus_health_report": C.CORPUS_HEALTH_SQL,
        "skew_join_adaptive": SC.SKEW_ADAPTIVE_SQL,
        "ir_eval_metrics": T.IR_EVAL_SQL,
        "session_survival": A.SESSION_SURVIVAL_SQL,
        "event_transitions": A.EVENT_TRANSITIONS_SQL,
        "hard_negatives_ivfpq": S.HARD_NEGATIVES_IVFPQ_SQL,
        "dedup_embedding_cosine_cells": D._dedup_cells_sql(),
        "ann_ivf_hier_topk": S.ANN_IVF_HIER_SQL,
        "ann_bruteforce_arrow": S.ANN_BRUTEFORCE_SQL,
        "ann_pq_arrow": S.ANN_PQ_SQL,
        "ann_ivf_arrow": S.ANN_IVF_SQL,
        "ann_ivfpq_arrow": S.ANN_IVFPQ_SQL,
        "ann_ivf_hier_arrow": S.ANN_IVF_HIER_SQL,
        "dedup_embedding_cosine_cells_hier": D._dedup_cells_hier_sql(),
        "lsh_bucket_stats": D.LSH_BUCKET_STATS_SQL,
        "intradoc_line_dedup": T.INTRADOC_DEDUP_SQL,
        "hybrid_retrieval_rrf": T.HYBRID_RRF_SQL,
        "topic_clusters": T._topic_clusters_sql(),
        "minhash_band_tuning": D._band_tuning_sql(),
        "curation_funnel": T._curation_funnel_sql(),
    }
