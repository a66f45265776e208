"""Unit tests for the plan-audit anti-pattern heuristics (pure string
functions — the full sweep over live plans is tools/plan_audit.py)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from plan_audit import _window_partition_free, audit_plan  # noqa: E402


def test_partitioned_window_not_flagged():
    line = (
        "Window [percent_rank() windowspecdefinition(lang#12, xent#45 ASC "
        "NULLS FIRST, specifiedwindowframe(RangeFrame, unboundedpreceding$(),"
        " currentrow$())) AS pr#99]"
    )
    assert not _window_partition_free(line)
    assert audit_plan(line) == []


def test_order_only_window_flagged():
    line = (
        "Window [row_number() windowspecdefinition(xent#45 ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$()))"
        " AS rn#7]"
    )
    assert _window_partition_free(line)
    assert [f["kind"] for f in audit_plan(line)] == ["global_window"]


def test_frame_only_window_flagged_but_rnk_whitelisted():
    frame_only = (
        "Window [sum(cnt#3L) windowspecdefinition(specifiedwindowframe("
        "RowFrame, unboundedpreceding$(), currentrow$())) AS s#8L]"
    )
    assert _window_partition_free(frame_only)
    assert [f["kind"] for f in audit_plan(frame_only)] == ["global_window"]
    # the ranking helper's offsets-table windows carry an __rnk name on
    # the plan line and are exempt (<= shuffle-partitions rows by design)
    rnk = frame_only.replace("cnt#3L", "__rnk_cnt#3L")
    assert audit_plan(rnk) == []


def test_cartesian_and_row_udf_flagged():
    plan = "CartesianProduct\n+- BatchEvalPython [f(x#1)]"
    kinds = sorted(f["kind"] for f in audit_plan(plan))
    assert kinds == ["cartesian", "python_udf_row"]


def test_arrow_python_paths_not_flagged():
    plan = (
        "ArrowEvalPython [g(x#1)]\n"
        "+- MapInPandas [h(y#2)]\n"
        "+- FlatMapGroupsInPandas [k(z#3)]"
    )
    assert audit_plan(plan) == []


def test_bnlj_flagged():
    plan = "BroadcastNestedLoopJoin BuildRight, Inner"
    assert [f["kind"] for f in audit_plan(plan)] == ["bnlj"]


def test_audit_artifact_current_and_clean():
    """PLAN_AUDIT.json must cover the live registry with zero
    unwhitelisted flags — a new entry (or a plan change that trips a
    flag) requires re-running tools/plan_audit.py, exactly like the
    COVERAGE totals guard keeps documented counts honest."""
    import json

    import __spark_entry__ as E

    audit = json.loads(
        (Path(__file__).resolve().parent.parent / "PLAN_AUDIT.json").read_text()
    )
    assert audit["flagged"] == [], (
        "unwhitelisted plan flags — adjudicate via tools/plan_audit.py"
    )
    live = set(E.queries())
    audited = set(audit["entries"])
    assert live == audited, (
        f"registry drift vs PLAN_AUDIT.json — re-run tools/plan_audit.py "
        f"(missing: {sorted(live - audited)}; stale: {sorted(audited - live)})"
    )
    errs = {k: v for k, v in audit["entries"].items() if "error" in v}
    assert not errs, errs
