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


def test_round5_rotations_are_in_window():
    """The entries VERDICT r4 asked to certify this round must sit
    inside the judged window; q6c stays until a driver row shows green."""
    must_be_judged = {
        "q6c_lakehouse_position_delete",  # r4's one red row, fixed at head
        "q6d_lakehouse_mor_update",
        "q55b_ann_ivf_topk",
        "q6e_incremental_over_mor",
        "q6f_lakehouse_branch_wap",
        # r5 rotations (restore, SQL views, quality/contamination/SemDeDup)
        "q6g_lakehouse_restore",
        "q6h_lakehouse_sql_views",
        "q5e_repetition_quality",
        "q5f_benchmark_contamination",
        "q5g_semantic_dedup",
    }
    assert must_be_judged <= set(JUDGED_NAMES)


def test_every_registration_has_an_oracle():
    """81/81 in r4; keep it total - rows-only checks are strictly weaker
    evidence."""
    assert set(QUERIES) == set(ORACLES)
