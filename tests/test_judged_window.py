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


def test_round6_rotations_are_in_window():
    """VERDICT r5: keep the five HUGEINT-artifact reds in the window so
    the oracle cast gets its driver-green row, and rotate every
    never-judged oracle-backed entry in."""
    must_be_judged = {
        # r5's five hash-only reds, oracles fixed at head (BIGINT casts)
        "q6c_lakehouse_position_delete",
        "q6d_lakehouse_mor_update",
        "q6e_incremental_over_mor",
        "q5e_repetition_quality",
        "q5g_semantic_dedup",
        # first-time-judged rotations (never had a CORRECTNESS row)
        "q4d_bpe_vocab_fit",
        "q59_token_chunking",
        "q5h_incremental_near_dedup",
        "q5i_weighted_sample",
        "q5j_hashed_embeddings",
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
        "q6o_lakehouse_column_default",
        "q6p_lakehouse_materialized_view",
    }
    assert must_be_judged <= set(JUDGED_NAMES)


def test_every_registration_has_an_oracle():
    """81/81 in r4; keep it total - rows-only checks are strictly weaker
    evidence."""
    assert set(QUERIES) == set(ORACLES)
