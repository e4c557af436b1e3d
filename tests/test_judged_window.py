"""The driver judges the FIRST 50 registered queries; defer=True is the
only rotation mechanism. These invariants make a misaligned window a
red pytest instead of a red round (VERDICT r4 #7)."""

from __future__ import annotations

from apache_iceberg_pyiceberg_local_data_lakehouse_spark.queries import (
    JUDGED_NAMES,
    JUDGED_WINDOW,
    N_JUDGED,
    ORACLES,
    QUERIES,
)


def test_window_is_exactly_fifty():
    assert N_JUDGED == JUDGED_WINDOW, (
        f"{N_JUDGED} non-deferred registrations; the driver judges "
        f"exactly {JUDGED_WINDOW} - add defer=True somewhere"
    )
    assert list(QUERIES)[:JUDGED_WINDOW] == JUDGED_NAMES


def test_round8_rotations_are_in_window():
    """VERDICT r7 #1: rotate ALL 18 never-judged oracle-backed entries
    (the entire r7 feature wave) into the window; the deferred residents
    (the 19 r6 first-timers after their second green plus q5e/q5f/q5g)
    keep local DuckDB parity via tests/test_oracle_parity.py."""
    must_be_judged = {
        "q76_sql_metadata_agg",
        "q77_mv_agg_incremental",
        "q78_sql_merge_alter",
        "q79_shallow_clone",
        "q7a_bigram_lm",
        "q7b_resample_gapfill",
        "q7c_canonical_dedup",
        "q7d_cherrypick_recovery",
        "q7e_masked_view",
        "q7f_json_flatten",
        "q7g_auto_maintain",
        "q7h_scan_estimate",
        "q7i_curation_pipeline_v2",
        "q7j_event_funnel",
        "q7k_cohort_retention",
        "q7l_data_expectations",
        "q7m_rolling_anomalies",
        "q7n_mv_avg_incremental",
    }
    assert must_be_judged <= set(JUDGED_NAMES)
    rotated_out = {
        # r8 defer-outs (each with >=2 driver greens, r6+r7)
        "q59_token_chunking",
        "q4d_bpe_vocab_fit",
        "q5e_repetition_quality",
        "q5f_benchmark_contamination",
        "q5g_semantic_dedup",
        "q5h_incremental_near_dedup",
        "q5k_corpus_mix",
        "q5l_unigram_lm_score",
        "q5m_sequence_packing",
        "q5n_bin_packing",
        "q5o_curation_pipeline",
        "q5p_quantized_ann",
        "q6i_lakehouse_merge_sync",
        "q6j_lakehouse_analyze_stats",
        "q6k_lakehouse_in_list_lookup",
        "q6l_lakehouse_hourly_prune",
        "q6m_lakehouse_partition_overwrite",
        "q6n_lakehouse_sql_lifecycle",
        # earlier rotations that must stay out
        "q01_pricing_summary",
        "q03_shipping_priority",
        "q05_region_revenue",
        "q13_top_orders_per_customer",
        "q30_events_tumbling_1h",
        "q32_events_sessionization",
        "q41_dedup_token_jaccard",
        "q50_knn_bruteforce",
        "q35_asof_join",
        "q36_trailing_window_count",
        "q37_session_range_join",
        "q70_hll_distinct_bound",
        "q71_quantile_sketch_bound",
        "q5i_weighted_sample",
        "q5j_hashed_embeddings",
    }
    assert not rotated_out & set(JUDGED_NAMES)
    # rotated-out entries stay registered (local parity keeps running)
    assert rotated_out <= set(QUERIES)


def test_every_registration_has_an_oracle():
    """81/81 in r4; keep it total - rows-only checks are strictly weaker
    evidence."""
    assert set(QUERIES) == set(ORACLES)
