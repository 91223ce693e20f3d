"""The external driver correctness-checks exactly the FIRST 50 registered
queries (verified against round-1 CORRECTNESS output: its 50 names were
``list(queries())[:50]`` order-identical). These tests pin the contract:
the window holds exactly 50 oracle-backed queries covering every SURVEY
§2 component family, so no component ships unverified again.
"""

from aind_protein_data_transformation_spark.queries import DRIVER_WINDOW, oracle_sql, queries

WINDOW = 50

# One representative per component family that MUST sit inside the
# driver's window (VERDICT.md round 1, "Next round" #1).
REQUIRED_IN_WINDOW = {
    # previously-red oracles, now fixed — need green driver rows
    # (q_json_functions earned seven greens r2–r8 and rotated to the
    # tail in round 9; multimodal_frame_sample likewise r2–r8)
    "text_token_count_bpe",
    # families that had NO correctness rows in round 1
    "asof_purchase_last_click",
    "pyramid_windowed_mean",
    "pyramid_cascade_l2",
    "stack_deal_round_robin",
    "stack_regex_rename",
    "ome_channel_windows",
    "ome_scale_recurrence",
    "grid_block_slices",
    # (streaming_sliding_window earned seven greens r3–r9 and rotated
    # to the tail in round 10; streaming_tumbling_window earned ten
    # r3–r12 and rotated in round 13 — late_data_policy + session keep
    # the windowed-agg machinery in window)
    "streaming_session_window",
    "streaming_stateful_totals",
    "streaming_dedup_watermark",
    "streaming_late_data_policy",
    # new this round
    "similarity_kmeans_assign",
    # (sink_parquet_roundtrip earned eleven greens r2–r12 and rotated
    # in round 13; the write→read loop slot passes to the clustered
    # write below)
    # promoted round 13 (VERDICT round 12 #6 + r12 window note): the
    # foreachBatch + per-batch-clustering streaming ingest composition,
    # green on first exposure (sink_zorder_clustered_scan likewise r13
    # and rotated to the tail in round 14 — the clustered write→scan
    # slot passes to the string-surrogate variant below)
    "streaming_clustered_ingest",
    # promoted round 14 (VERDICT round 13 #3/#4): the last two non-twin
    # never-driver-sampled queries — the zero-Exchange bucketed
    # co-located join (plan-asserted in the query itself) and the
    # string-surrogate clustered write→scan. After these land green,
    # rotation stops per the declared policy.
    "sink_bucketed_join",
    "sink_zorder_string_scan",
    # promoted round 15 (VERDICT round 14 #2): the skew-salting lever —
    # two-phase exact-DECIMAL salted aggregate (plans/scale.py) — was
    # the last non-twin never-driver-sampled query after the r14
    # additions; one like-for-like swap (out: q_math_functions, ten
    # greens) and rotation stops for real.
    "q_salted_sum_skewproof",
    # round-2 red rows the round-3 ts fix must show green in the driver
    # (VERDICT.md round 2 "Next round" #1 done-criteria). The inner asof
    # variant and multimodal_payload_stats earned their green rows in
    # round 3 and rotated to the tail in round 4 to free window slots.
    "asof_purchase_last_click",
    # promoted round 3 (VERDICT round 2 #8): first driver row for the
    # curation family's repetition stats; rotated to the tail round 12
    # after nine consecutive greens (r3–r11) — the family slot passes to
    # tf-idf keywords, its last never-driver-green algorithm
    "text_tfidf_keywords",
    # promoted round 4 (VERDICT round 3 #2/#3): scale-safe percentile
    # plan + first driver rows for connected components and
    # unigram-logprob quality scoring (sample_hash_split earned four
    # green rounds r4–r7 and rotated to the tail in round 8)
    "q_percentiles_rank_select",
    "dedup_cluster_components",
    "text_unigram_logprob",
    # promoted round 5 (VERDICT round 4 #3): first driver rows for the
    # round-4 §2B additions — reshape (PIVOT), batch sessionization,
    # the interval-RANGE window frame, and the window-analytic family
    "q_pivot_status_by_priority",
    "q_sessionize_events",
    "q_window_interval_range",
    # (q_lead_lag_gaps earned greens r1, r5–r10 and rotated to the tail
    # in round 11; running_totals + interval_range keep window machinery)
    # promoted round 6 (VERDICT round 5 #1): first driver rows for the
    # co-moment aggregates and the UNPIVOT half of reshape — the only
    # §2B rows never driver-confirmed in rounds 1–5. q_approx_aggregates
    # and streaming_foreachbatch_sink rotated to the tail after four
    # green driver rounds each (r2–r5).
    "q_corr_regr_aggregates",
    "q_unpivot_flag_measures",
    # promoted round 9 (VERDICT round 8 #2): first driver rows for the
    # three components never driver-confirmed in eight rounds — the
    # two-phase distributed prefix sum (sequence packing), watermarked
    # stream-stream join state, and the dim-dispatched int8 quantize
    "pack_sequences_fixed",
    "streaming_stream_join",
    "embedding_quantize_int8",
    # promoted round 10 (VERDICT round 9 #4): first driver rows for the
    # outer stream-join state semantics, the PII regex scan, and the
    # A-ES weighted reservoir — the highest-value never-confirmed
    # variants left after round 9 closed the component tail
    "streaming_stream_left_join",
    "pii_redact_scan",
    "sample_weighted_reservoir",
    # promoted round 11 (VERDICT round 10 #2): fresh driver rows for the
    # three longest-unconfirmed algorithm variants — LeftAnti (the one
    # join type whose own query last saw the driver in r3), CUBE (only
    # rollup of the grouping trio has a multi-round record), and the
    # SemDeDup cluster-bucketed keep (never driver-confirmed)
    "q_anti_join_customers_without_orders",
    "q_cube_status_priority",
    "dedup_semantic_keep",
}


def test_window_is_exactly_50():
    assert len(DRIVER_WINDOW) == WINDOW
    assert len(set(DRIVER_WINDOW)) == WINDOW


def test_registry_leads_with_window():
    assert list(queries())[:WINDOW] == DRIVER_WINDOW


def test_window_queries_all_have_oracles():
    osql = oracle_sql()
    missing = [n for n in DRIVER_WINDOW if n not in osql]
    assert not missing, f"window queries without oracle: {missing}"


def test_required_components_inside_window():
    missing = REQUIRED_IN_WINDOW - set(DRIVER_WINDOW)
    assert not missing, f"component representatives outside window: {missing}"


def test_tail_components_are_covered_in_window():
    """Every tail query must be a redundant variant: its component family
    has an in-window representative (documented pairing)."""
    covered_by = {
        # q5 rotated out of the window in round 2 to admit the
        # decontamination family; the multi-table broadcast-join family
        # keeps q3 as its in-window representative.
        "q5_local_supplier_volume": "q3_shipping_priority",
        "q7_nation_volume": "q3_shipping_priority",
        "q8_market_share": "q3_shipping_priority",
        "q10_returned_items": "q3_shipping_priority",
        "q14_promo_share": "q1_pricing_summary",
        "q4_order_priority": "q_anti_join_customers_without_orders",
        "q6_forecast_revenue": "q1_pricing_summary",
        "q9_product_type_profit": "q3_shipping_priority",
        # q13 is a left-outer join + grouped count; with
        # q_outer_join_order_fill rotated to the tail round 7, the
        # in-window outer/equi-join representative is q3
        "q13_order_count_distribution": "q3_shipping_priority",
        "q18_large_volume_customers": "q3_shipping_priority",
        # scalar/exists subqueries are Catalyst-rewritten into joins
        # (scalar -> single-row broadcast NLJ, exists -> LeftSemi); with
        # q_scalar_subquery rotated to the tail in round 4 the subquery
        # family's in-window representative is the semi join
        "q15_top_supplier": "q_anti_join_customers_without_orders",
        "q17_small_quantity_revenue": "q_anti_join_customers_without_orders",
        "q19_disjunctive_pushdown": "q1_pricing_summary",
        "q22_dormant_customers": "q_anti_join_customers_without_orders",
        # round-3 completion of the 22 TPC-H shapes: each maps to the
        # in-window representative of its dominant operator family
        "q2_min_acctbal_supplier": "q_anti_join_customers_without_orders",
        "q11_important_suppliers": "q_anti_join_customers_without_orders",
        "q16_supplier_part_counts": "q_anti_join_customers_without_orders",
        # rotated to the tail round 4 (two green driver rounds each);
        # LeftSemi/LeftAnti share Catalyst's join machinery, the asof
        # variants share one operator, payload/frame share the binary
        # metadata plumbing
        # (q_anti_join_customers_without_orders rotated back INTO the
        # window round 11 — VERDICT round 10 #2)
        "q_scalar_subquery": "q_anti_join_customers_without_orders",
        "asof_inner_error_context": "asof_purchase_last_click",
        # the skew-resistant banded form, answer-identical by property
        # test and by shared oracle with the in-window plain form
        "asof_banded_last_click": "asof_purchase_last_click",
        "multimodal_payload_stats": "similarity_ivf_ann",
        "q20_excess_share_suppliers": "q_anti_join_customers_without_orders",
        "q21_sole_blame_suppliers": "q_anti_join_customers_without_orders",
        # deterministic hash-keyed sampling/sharding: the portable-hash
        # + bucketed-groupBy family is represented by exact dedup
        # (sample_hash_split rotated to the tail round 8 after four
        # green driver rounds r4–r7; the hash-derived-decision shape is
        # the same xxhash64/pmod machinery dedup_exact drives)
        # dedup_exact rotated to the tail round 11 after ten straight
        # greens; the hash-keyed sampling family's in-window
        # representative is now the weighted reservoir (same
        # xxhash64-derived-decision machinery), and exact dedup's
        # sha2+dropDuplicates shape is covered by minhash's
        # portable-hash + groupBy pipeline
        "dedup_exact": "dedup_minhash_lsh",
        "sample_hash_split": "sample_weighted_reservoir",
        # rotated to the tail round 9 after eight consecutive driver
        # greens (r1–r8): the non-equi/range-join machinery keeps the
        # in-window as-of join (time-range matching, same range-bucketed
        # shape) plus the local theta-join twins
        "q_theta_join_price_band": "asof_purchase_last_click",
        # rotated to the tail round 9 after seven greens (r2–r8); the
        # scalar projection-over-scan shape keeps date/math/conditional
        # in window (nested-JSON parsing keeps its local oracle suite)
        "q_json_functions": "q1_pricing_summary",
        # SemDeDup-style cluster-bucketed representative keep: the
        # bucketed embedding near-dup family's in-window representative
        # (dedup_semantic_keep rotated INTO the window round 11)
        # rotated to the tail round 8 after seven consecutive driver
        # greens (r1–r7), freeing the slot for the new SRP-LSH
        # embedding near-dup's first driver row: simhash's
        # bit-signature + banded-blocking machinery is the in-window
        # minhash query's shape (and SRP itself is the sign-projection
        # twin of the same construction)
        "dedup_simhash": "dedup_minhash_lsh",
        "sample_stratified": "sample_weighted_reservoir",
        # alpha=0.5 temperature resampling: the data-computed-rates
        # hash-Bernoulli family, driver-checked via sample_hash_split
        # in r4–r7 (same xxhash64-Bernoulli mechanism as dedup_exact's
        # portable-hash machinery, which keeps the window slot)
        "sample_temperature_alpha": "sample_weighted_reservoir",
        # mixing = the stratified hash-Bernoulli mechanism with
        # data-computed rates; same family shapes
        "sample_mix_to_target": "sample_weighted_reservoir",
        "shard_assign_balanced": "sample_weighted_reservoir",
        # window-ranking top-k: dense_rank/ntile live in running_totals,
        # sort+limit in q3 (TakeOrderedAndProject)
        "q_topk_per_group": "q_window_running_totals",
        # rotated to the tail round 11 (greens r1, r5-r10): lead/lag is
        # the same WindowExec machinery as the in-window frame queries
        "q_lead_lag_gaps": "q_window_running_totals",
        # rotated to the tail round 11 (greens r1-r4, r8-r10); the scalar
        # projection-over-scan shape keeps math/conditional in window
        "q_date_functions": "q1_pricing_summary",
        "q_ntile_wealth_deciles": "q_window_running_totals",
        # (q_grouping_sets rotated INTO the window round 12 — VERDICT
        # round 11 #2 — completing the grouping-analytics trio)
        "q_distinct_agg": "q1_pricing_summary",
        "q_rank_variants": "q_window_running_totals",
        # pivot is Catalyst-rewritten conditional aggregation (q1 family);
        # unpivot is a zero-shuffle projection over a grouped aggregate
        "q_pivot_status_matrix": "q1_pricing_summary",
        "q_unpivot_nation_metrics": "q_rollup_region_nation_revenue",
        # explode-over-tokens: the in-window BPE token counter drives
        # the same split+explode+hash-agg machinery
        "q_explode_tokens": "text_token_count_bpe",
        "q_exists_subquery": "q_anti_join_customers_without_orders",
        "q_percentiles_exact": "q_percentiles_rank_select",
        # MAD = two composed rank-select passes; the percentile
        # family's in-window representative covers the machinery
        "q_mad_robust_stats": "q_percentiles_rank_select",
        # rotated out round 3 for text_repetition_stats; conditional-agg +
        # 2-table equi-join shape keeps q1/q3/semi/anti/outer in window
        "q12_shipmode_priority": "q1_pricing_summary",
        # rotated to the tail round 5 after four green driver rounds
        # each, freeing slots for the round-4 reshape/sessionization/
        # window-analytic additions: the scalar packs keep
        # string/array/json in window (date/math/conditional are the
        # same projection-over-scan shape), and the text family keeps
        # quality/bpe/unigram-logprob (winnow is the same
        # tokenize+hash+window machinery)
        # round-8 rotation (VERDICT round 7 #4): date/math/conditional
        # rotate BACK into the window (no driver row since r4);
        # string/array rotate to the tail after seven consecutive green
        # rounds each — the scalar-pack projection-over-scan shape keeps
        # date/math in window, and the array-HOF machinery
        # (aggregate/transform/zip_with) is driven end-to-end by the
        # in-window cosine/IVF similarity queries via functions/vector.py
        "q_string_functions": "q1_pricing_summary",
        "q_array_functions": "similarity_cosine_topk",
        "doc_fingerprint_winnow": "text_quality_stats",
        "q_stddev_variance": "q1_pricing_summary",
        "q_minmax_by": "q1_pricing_summary",
        # json rotated out round 9; map/json scalar shapes share the
        # projection-over-scan machinery with the in-window date pack
        "q_map_functions": "q1_pricing_summary",
        "text_lang_id": "text_quality_stats",
        # (text_tfidf_keywords rotated INTO the window round 12 —
        # VERDICT round 11 #2 — the curation family's last never-green)
        # rotated to the tail round 12 after seven greens (r1–r4,
        # r8–r11); the scalar projection-over-scan shape keeps
        # q_math_functions in window
        "q_conditional_price_bands": "q1_pricing_summary",
        # rotated to the tail round 12 after nine consecutive greens
        # (r3–r11); the curation family keeps decontamination + PII in
        # window plus the incoming tf-idf rotation
        "text_repetition_stats": "decontaminate_ngram_overlap",
        # rotated to the tail round 7 after six green driver rounds
        # (r1–r6), freeing the slot for pyramid_channel_stats' first
        # driver row (§2A A12): the left-outer join + COALESCE fill
        # machinery keeps q3 (equi-join star) in window plus the local
        # outer-join twins; the ledger holds its six greens
        "q_outer_join_order_fill": "q3_shipping_priority",
        "streaming_dedup": "streaming_dedup_watermark",
        # stream-stream interval join: the watermark/event-time-state
        # family is represented in-window by tumbling + stateful_totals
        # rotated to the tail round 10 (VERDICT round 9 #4) after nine,
        # nine, and seven consecutive driver greens respectively:
        # ngram-jaccard shares the shingle-hash join machinery with the
        # in-window minhash query; the clean-corpus pipeline composes
        # the in-window quality/token machinery; sliding windows are
        # the in-window tumbling query's watermarked window-agg shape
        "dedup_ngram_jaccard": "dedup_minhash_lsh",
        "pipeline_clean_corpus": "text_quality_stats",
        # (tumbling itself rotated round 13 after ten greens r3–r12;
        # late_data_policy IS a tumbling window agg + watermark policy,
        # so both tumbling-shape tail queries map there)
        "streaming_sliding_window": "streaming_late_data_policy",
        "streaming_tumbling_window": "streaming_late_data_policy",
        # multimodal family rotated fully to the tail round 9
        # (frame_sample driver-green r2–r8): the Arrow-batched
        # mapInPandas numpy-kernel surface is driven in-window by the
        # GEMM index build (similarity_ivf_ann) and the SRP signer
        "multimodal_frame_sample": "similarity_ivf_ann",
        "multimodal_decode_stub": "similarity_ivf_ann",
        "multimodal_feature_extract": "similarity_ivf_ann",
        # boilerplate mining/ratio: distinct-shingle explode + df
        # aggregation + broadcast-back — the shingle-df machinery the
        # in-window decontamination query drives end-to-end
        "text_frequent_ngrams": "decontaminate_ngram_overlap",
        "curate_boilerplate_ratio": "decontaminate_ngram_overlap",
        # round-4 reshape/stats additions: pivot/unpivot and the
        # co-moment aggregates are conditional/hash aggregates (q1's
        # family); batch sessionization is window frames + running sum
        # (the running-totals family)
        "q_histogram_equi_width": "q1_pricing_summary",
        # rotated to the tail round 6 after four green driver rounds
        # each (r2–r5), freeing slots for the co-moment + UNPIVOT
        # promotions: approx sketches are partial-aggregatable hash
        # aggregates (q1 family, plus the local tolerance/differential
        # suites keep both sketch queries); foreachBatch is the
        # in-window readStream machinery driving the in-window batch
        # parquet sink per micro-batch
        "q_approx_aggregates": "q1_pricing_summary",
        "q_sketch_reaggregation": "q1_pricing_summary",
        # foreachBatch micro-batch landing is exactly the in-window
        # clustered-ingest query's machinery (foreachBatch + batch
        # parquet writes per micro-batch)
        "streaming_foreachbatch_sink": "streaming_clustered_ingest",
        # rotated round 13 after eleven greens r2–r12: the parquet
        # write→scan loop stays in window via the clustered write
        # queries; the CSV sink/scan leg keeps its local oracle
        # differential
        "sink_parquet_roundtrip": "sink_zorder_string_scan",
        # rotated round 14 after its first-exposure r13 green (VERDICT
        # round 13 #4): the clustered write→scan slot passes to the
        # string-surrogate variant, which is the same zorder_layout →
        # pruned-box-scan loop plus the round-13 string machinery
        "sink_zorder_clustered_scan": "sink_zorder_string_scan",
        # rotated round 15 after ten greens (r1–r4, r8–r14), freeing the
        # slot for q_salted_sum_skewproof's first driver row (VERDICT
        # round 14 #2): the scalar projection-over-scan shape is q1's
        # codegen'd projection + conditional aggregates, and the pack
        # keeps its local oracle differential
        "q_math_functions": "q1_pricing_summary",
        # rotated round 14 after twelve consecutive greens r1–r13, the
        # longest-serving join veteran (VERDICT round 13 #3 freed the
        # slot for the bucketed join): LeftSemi is the same
        # BroadcastHashJoin machinery as the in-window LeftAnti row
        # over the same two tables
        "q_semi_join_customers_with_orders":
            "q_anti_join_customers_without_orders",
    }
    window = set(DRIVER_WINDOW)
    tail = [n for n in queries() if n not in window]
    unmapped = [n for n in tail if n not in covered_by]
    assert not unmapped, f"tail queries without a documented in-window twin: {unmapped}"
    bad = {t: w for t, w in covered_by.items() if w not in window}
    assert not bad, f"twin not in window: {bad}"


# --------------------------------------------------- driver-row ledger
#
# Static record of which rounds the external driver confirmed each query
# green (extracted from the committed CORRECTNESS_r0N.json artifacts;
# update per round after the driver runs). The ledger test below closes
# the starvation hole VERDICT round 5 called out: the covered_by map
# only pins tail->window *query* twins, so a component whose queries all
# sat in the tail mapped to a DIFFERENT family's representative (as
# co-moments was, mapped to q1) could rotate forever without a driver
# row. The invariant: every component family either already holds >=1
# driver-green round, or has a representative in the CURRENT window
# (i.e. is scheduled for its first driver row this round).
DRIVER_GREEN_ROUNDS = {
    "asof_inner_error_context": (3,),
    "asof_purchase_last_click": (3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "decontaminate_ngram_overlap": (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "dedup_cluster_components": (4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "dedup_embedding_cosine": (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "dedup_exact": (1, 2, 3, 4, 5, 6, 7, 8, 9, 10,),
    "dedup_minhash_lsh": (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "dedup_ngram_jaccard": (1, 2, 3, 4, 5, 6, 7, 8, 9,),
    "dedup_simhash": (1, 2, 3, 4, 5, 6, 7,),
    "doc_fingerprint_winnow": (1, 2, 3, 4),
    "grid_block_slices": (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "multimodal_frame_sample": (2, 3, 4, 5, 6, 7, 8,),
    "multimodal_payload_stats": (2, 3),
    "ome_channel_windows": (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "ome_scale_recurrence": (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "pipeline_clean_corpus": (1, 2, 3, 4, 5, 6, 7, 8, 9,),
    "pyramid_cascade_l2": (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "pyramid_windowed_mean": (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "q10_returned_items": (1,),
    "q12_shipmode_priority": (2,),
    "q14_promo_share": (1,),
    "q1_pricing_summary": (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "q3_shipping_priority": (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "q5_local_supplier_volume": (1,),
    "q7_nation_volume": (1,),
    "q8_market_share": (1,),
    "q_anti_join_customers_without_orders": (1, 2, 3, 11, 12, 13, 14, 15,),
    "q_approx_aggregates": (2, 3, 4, 5),
    "q_array_functions": (1, 2, 3, 4, 5, 6, 7,),
    "q_conditional_price_bands": (1, 2, 3, 4, 8, 9, 10, 11,),
    "q_cube_status_priority": (1, 11, 12, 13, 14, 15,),
    "q_date_functions": (1, 2, 3, 4, 8, 9, 10,),
    "q_distinct_agg": (1,),
    "q_exists_subquery": (1,),
    "q_explode_tokens": (1,),
    "q_grouping_sets": (1, 12, 13, 14, 15,),
    "q_json_functions": (2, 3, 4, 5, 6, 7, 8,),
    "q_lead_lag_gaps": (1, 5, 6, 7, 8, 9, 10,),
    "q_map_functions": (1,),
    "q_math_functions": (1, 2, 3, 4, 8, 9, 10, 11, 12, 13, 14,),
    "q_minmax_by": (1,),
    "q_ntile_wealth_deciles": (1,),
    "q_outer_join_order_fill": (1, 2, 3, 4, 5, 6,),
    "q_percentiles_exact": (1,),
    "q_percentiles_rank_select": (4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "q_pivot_status_by_priority": (5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "q_rank_variants": (1,),
    "q_rollup_region_nation_revenue": (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "q_scalar_subquery": (1, 2, 3),
    "q_semi_join_customers_with_orders": (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,),
    "q_sessionize_events": (5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "q_set_ops_customer_segments": (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "q_stddev_variance": (1,),
    "q_string_functions": (1, 2, 3, 4, 5, 6, 7,),
    "q_theta_join_price_band": (1, 2, 3, 4, 5, 6, 7, 8,),
    "q_topk_per_group": (1,),
    "q_window_interval_range": (5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "q_window_running_totals": (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "sample_hash_split": (4, 5, 6, 7,),
    "similarity_cosine_topk": (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "similarity_ivf_ann": (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "similarity_kmeans_assign": (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "sink_parquet_roundtrip": (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,),
    "stack_deal_round_robin": (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "stack_regex_rename": (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "streaming_dedup_watermark": (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "streaming_foreachbatch_sink": (2, 3, 4, 5),
    "streaming_late_data_policy": (3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "streaming_session_window": (3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "streaming_sliding_window": (3, 4, 5, 6, 7, 8, 9,),
    "streaming_stateful_totals": (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "streaming_tumbling_window": (3, 4, 5, 6, 7, 8, 9, 10, 11, 12,),
    "text_lang_id": (1,),
    "text_quality_stats": (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "text_repetition_stats": (3, 4, 5, 6, 7, 8, 9, 10, 11,),
    "text_token_count_bpe": (2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "text_unigram_logprob": (4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "q_corr_regr_aggregates": (6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "q_unpivot_flag_measures": (6, 7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "pyramid_channel_stats": (7, 8, 9, 10, 11, 12, 13, 14, 15,),
    "dedup_embedding_srp": (8, 9, 10, 11, 12, 13, 14, 15,),
    # first driver rows round 9 (the last three never-confirmed
    # components, VERDICT round 8 #2)
    "embedding_quantize_int8": (9, 10, 11, 12, 13, 14, 15,),
    "streaming_stream_join": (9, 10, 11, 12, 13, 14, 15,),
    "pack_sequences_fixed": (9, 10, 11, 12, 13, 14, 15,),
    # first driver rows round 10 (VERDICT round 9 #4 rotations:
    # outer stream-join state, PII regex scan, A-ES reservoir)
    "pii_redact_scan": (10, 11, 12, 13, 14, 15,),
    "sample_weighted_reservoir": (10, 11, 12, 13, 14, 15,),
    "streaming_stream_left_join": (10, 11, 12, 13, 14, 15,),
    # first driver row round 11 (VERDICT round 10 #2 rotation:
    # SemDeDup cluster-bucketed representative keep)
    "dedup_semantic_keep": (11, 12, 13, 14, 15,),
    # first driver row round 12 (VERDICT round 11 #2 rotation: the
    # curation family's last never-driver-green algorithm; green on
    # first exposure alongside q_grouping_sets' first row completing
    # the rollup/cube/grouping-sets trio)
    "text_tfidf_keywords": (12, 13, 14, 15,),
    # first driver rows round 13 (VERDICT round 12 #6 + window note):
    # both green on first exposure — the round-12 clustered-layout
    # operator's own write→scan query and the foreachBatch +
    # append-clustering streaming-ingest composition
    "sink_zorder_clustered_scan": (13,),
    "streaming_clustered_ingest": (13, 14, 15,),
    # first driver rows round 14 (VERDICT round 13 #3/#4): both green on
    # first exposure — the zero-Exchange bucketed co-located join (plan
    # assertion inside the query) and the order-preserving
    # string-surrogate clustered write→scan
    "sink_bucketed_join": (14, 15,),
    "sink_zorder_string_scan": (14, 15,),
    # first driver row round 15 (VERDICT round 14 #2 rotation: the
    # skew-salting lever's two-phase exact-DECIMAL salted aggregate —
    # green on first exposure; the last non-twin never-sampled query,
    # rotation complete per the declared policy)
    "q_salted_sum_skewproof": (15,),
}

# SURVEY.md §2B component families -> the registry queries that exercise
# them (a family is "driver-confirmed" if ANY member has a green row).
# §2A is omitted: all 25 array-layer ops held green rows by round 2 and
# their queries never left the window.
COMPONENT_QUERIES = {
    "scan+sink": ["q1_pricing_summary", "sink_parquet_roundtrip",
                  "sink_zorder_clustered_scan", "sink_zorder_string_scan",
                  "sink_bucketed_join", "q_json_functions"],
    "projection+filter": ["q1_pricing_summary", "q_string_functions"],
    "equi_outer_join": ["q3_shipping_priority", "q_outer_join_order_fill"],
    "semi_anti_join": ["q_semi_join_customers_with_orders",
                       "q_anti_join_customers_without_orders"],
    "theta_range_join": ["q_theta_join_price_band"],
    "asof_join": ["asof_purchase_last_click", "asof_inner_error_context",
                  "asof_banded_last_click"],
    "hash_aggregate": ["q1_pricing_summary", "q_distinct_agg"],
    "rollup_cube_grouping_sets": ["q_rollup_region_nation_revenue",
                                  "q_cube_status_priority",
                                  "q_grouping_sets"],
    "approx_aggregates": ["q_approx_aggregates", "q_sketch_reaggregation"],
    "window_ranking": ["q_window_running_totals", "q_rank_variants",
                       "q_ntile_wealth_deciles", "q_topk_per_group"],
    "window_analytic": ["q_lead_lag_gaps"],
    "window_frames": ["q_window_running_totals", "q_window_interval_range"],
    "sort_limit_topk": ["q3_shipping_priority", "q_topk_per_group"],
    "set_ops": ["q_set_ops_customer_segments"],
    "scalar_string": ["q_string_functions"],
    "scalar_datetime": ["q_date_functions"],
    "scalar_math": ["q_math_functions"],
    "scalar_array_hof": ["q_array_functions", "q_explode_tokens"],
    "scalar_map_json": ["q_json_functions", "q_map_functions"],
    "scalar_conditional": ["q_conditional_price_bands"],
    "subquery_rewrites": ["q_scalar_subquery", "q_exists_subquery"],
    "percentiles_exact": ["q_percentiles_rank_select",
                          "q_percentiles_exact", "q_mad_robust_stats"],
    "llm_dedup": ["dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
                  "dedup_simhash", "dedup_embedding_cosine",
                  "dedup_cluster_components"],
    "llm_similarity": ["similarity_cosine_topk", "similarity_ivf_ann",
                       "similarity_kmeans_assign"],
    "llm_text": ["text_quality_stats", "text_token_count_bpe",
                 "text_unigram_logprob", "text_lang_id",
                 "doc_fingerprint_winnow", "pipeline_clean_corpus"],
    "curation": ["decontaminate_ngram_overlap", "text_repetition_stats",
                 "pii_redact_scan", "text_tfidf_keywords"],
    # one §2B row: "Sampling / packing / reservoir"
    "sampling_packing_reservoir": ["sample_hash_split", "sample_stratified",
                                   "sample_weighted_reservoir",
                                   "pack_sequences_fixed"],
    "multimodal": ["multimodal_frame_sample", "multimodal_payload_stats"],
    "udf_surface+streaming": ["streaming_stateful_totals",
                              "streaming_tumbling_window",
                              "streaming_sliding_window",
                              "streaming_session_window",
                              "streaming_dedup_watermark",
                              "streaming_late_data_policy",
                              "streaming_foreachbatch_sink",
                              "streaming_clustered_ingest"],
    "reshape_pivot": ["q_pivot_status_by_priority", "q_pivot_status_matrix"],
    "reshape_unpivot": ["q_unpivot_flag_measures",
                        "q_unpivot_nation_metrics"],
    "co_moment_aggregates": ["q_corr_regr_aggregates"],
    "sessionization": ["q_sessionize_events"],
}


def test_ledger_names_are_registered():
    reg = set(queries())
    ghosts = [n for n in DRIVER_GREEN_ROUNDS if n not in reg]
    assert not ghosts, f"ledger names not in registry: {ghosts}"
    ghosts = [q for qs in COMPONENT_QUERIES.values() for q in qs
              if q not in reg]
    assert not ghosts, f"component map names not in registry: {ghosts}"


def test_no_component_family_is_starved():
    """Every §2B component family has >=1 past driver-green round, or a
    representative sitting in the CURRENT window (scheduled for its
    first driver row). Rotation that would leave a family with neither
    fails here before it ships."""
    window = set(DRIVER_WINDOW)
    starved = [
        fam for fam, qs in COMPONENT_QUERIES.items()
        if not any(DRIVER_GREEN_ROUNDS.get(q) for q in qs)
        and not any(q in window for q in qs)
    ]
    assert not starved, f"component families with no driver exposure: {starved}"


def test_rotated_out_queries_earned_their_rest():
    """A query may sit in the tail only after >=2 driver-green rounds,
    unless a same-family twin is in the window or has >=2 greens (the
    covered_by redundancy case). Guards against rotating a query out on
    its first green."""
    window = set(DRIVER_WINDOW)
    # Rotation completed in round 15 (every non-twin query now holds a
    # driver-green row); no promotions outstanding.
    promoted_this_round = set()
    fam_of = {}
    for fam, qs in COMPONENT_QUERIES.items():
        for q in qs:
            fam_of.setdefault(q, fam)
    weak = []
    for q, rounds in DRIVER_GREEN_ROUNDS.items():
        if q in window or len(rounds) >= 2 or q not in fam_of:
            # queries outside the component map (TPC-H shape variants)
            # are adjudicated by covered_by in the tail test above
            continue
        fam = fam_of.get(q)
        twins = [t for t in COMPONENT_QUERIES.get(fam, []) if t != q]
        ok = any(
            t in window or t in promoted_this_round
            or len(DRIVER_GREEN_ROUNDS.get(t, ())) >= 2
            for t in twins
        )
        if not ok:
            weak.append(q)
    assert not weak, f"rotated out after a single green with no covered twin: {weak}"
