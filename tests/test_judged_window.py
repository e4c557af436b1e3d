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


def test_round7_rotations_are_in_window():
    """VERDICT r6 #1: rotate ALL 15 never-judged oracle-backed entries
    (the entire r6 feature wave) into the window; the deferred residents
    (q01/q03/q05/q13/q30/q32/q41/q50 with 6 green rounds, q35-q37,
    q70/q71, q5i/q5j) keep local DuckDB parity via
    tests/test_oracle_parity.py."""
    must_be_judged = {
        "q6q_snapshot_isolation_gc",
        "q6r_sql_time_travel",
        "q6s_changelog_images",
        "q6t_metadata_agg_pushdown",
        "q6u_runtime_join_pruning",
        "q6v_row_lineage",
        "q6w_incremental_mv_refresh",
        "q6x_cdc_replication",
        "q6y_tombstone_consolidation",
        "q72_bm25_topk",
        "q73_hybrid_rrf_fusion",
        "q74_pq_ann_topk",
        "q75_jsonl_ingest",
        "q5q_paragraph_dedup",
        "q5r_exact_substring_dedup",
    }
    assert must_be_judged <= set(JUDGED_NAMES)
    rotated_out = {
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
