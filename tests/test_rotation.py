"""Driver-window rotation planner: the demotion policy is computed from
CORRECTNESS history + registry tier tags, not hand-maintained lists."""

from __future__ import annotations


def _plan(queries, oracles, tiers, hist, next_round):
    import sys

    sys.path.insert(0, "tools")
    from rotation import plan

    return plan(queries, oracles, tiers, hist, next_round)


def test_breadth_with_two_greens_demotes_op_never_does():
    queries = ["op_a", "breadth_b", "breadth_c", "breadth_err"]
    oracles = {q: "SELECT 1" for q in queries}
    tiers = {
        "op_a": "op",
        "breadth_b": "breadth",
        "breadth_c": "breadth",
        "breadth_err": "breadth",
    }
    hist = {
        # op with many greens: NEVER demotes
        "op_a": [(1, "pass"), (2, "pass"), (3, "pass")],
        # breadth with 2 greens: demotes
        "breadth_b": [(1, "pass"), (2, "pass")],
        # breadth with 1 green: stays active
        "breadth_c": [(2, "pass")],
        # breadth with 2 greens BUT latest is an error: must re-prove
        "breadth_err": [(1, "pass"), (2, "pass"), (3, "err")],
    }
    window, demoted, _ = _plan(queries, oracles, tiers, hist, 4)
    assert demoted == ["breadth_b"]
    assert "breadth_b" not in window
    assert "op_a" in window and "breadth_c" in window
    # err outranks everything, demoted or not
    assert window[0] == "breadth_err"


def test_policy_order_err_then_never_then_stalest_oracle_first():
    queries = ["stale3", "never_rows", "never_oracle", "err_q", "fresh"]
    oracles = {"stale3": "S", "never_oracle": "S", "err_q": "S", "fresh": "S"}
    tiers = {q: "op" for q in queries}
    hist = {
        "stale3": [(1, "pass")],
        "err_q": [(3, "err")],
        "fresh": [(3, "pass")],
    }
    window, demoted, _ = _plan(queries, oracles, tiers, hist, 4)
    assert not demoted
    assert window[0] == "err_q"
    # both never-checked precede stale; oracle-backed first
    assert window[1:3] == ["never_oracle", "never_rows"]
    assert window[3] == "stale3"
    assert window[4] == "fresh"


def test_registry_tiers_resolve_and_no_parity_query_is_breadth():
    from etl_excel_csv_sql_spark.plans import registry
    import etl_excel_csv_sql_spark.plans.lifecycle_queries  # noqa: F401

    tiers = {n: s.tier for n, s in registry._REGISTRY.items()}
    assert set(tiers.values()) <= {"op", "breadth"}
    # §2 reference-parity evidence queries must keep rotating
    for name in (
        "excel_roundtrip", "csv_roundtrip", "jdbc_live_roundtrip",
        "settings_catalog", "watermark_lifecycle", "folder_queue_lifecycle",
        "invoice_pipeline_e2e", "semi_join_inlist", "in_list_literal",
        "update_join_writeback", "quarantine_split_rows", "found_report",
        "lock_fallback_naming", "sql_compose_quoting",
        "settings_validation_outcomes", "retention_sweep_report",
    ):
        assert tiers[name] == "op", name
