"""Measure one (or a few) gate entries with bench.py's methodology —
cold run, primed warm re-counts, task-time deltas — without paying the
full 45-entry headliner pass. The bisect/verification tool behind
round-level bench claims (e.g. the r9 knn_cosine_pq regression):
run it at HEAD and inside a `git worktree` of a past round's snapshot
and compare task-s on the same host within minutes of each other.

Usage: python tools/bench_one.py knn_cosine_pq [more_entries...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCH_REPEATS (3).
Prints one JSON line per entry.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from scipi_spark.session import get_spark
from scipi_spark.taskmetrics import TaskTimer


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: bench_one.py <entry> [entry...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    spark = get_spark(app_name="scipi-spark-bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    timer = TaskTimer(spark)

    for name in names:
        fn = qs[name]
        # same shape as bench.py: untimed warmup at sf0.001 (codegen/JIT),
        # settle, cold run, primed warm re-counts with per-sample settle
        try:
            fn(spark, "/root/testdata/sf0.001").count()
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        time.sleep(2.0)

        w, tr, _tc = timer.measure(lambda: fn(spark, sf_dir).count())
        cold_w, cold_t = round(w, 3), round(tr, 3)

        warm_df = fn(spark, sf_dir)
        warm_df.count()  # priming execution
        heavy = cold_t > 5.0
        tasks: list[float] = []
        walls: list[float] = []
        for _ in range(max(repeats, 3)):
            gc.collect()
            if heavy:
                spark._jvm.System.gc()
                time.sleep(2.0)
            else:
                time.sleep(0.5)
            w, tr, _tc = timer.measure(lambda: warm_df.count())
            walls.append(round(w, 3))
            tasks.append(round(tr, 3))
        del warm_df
        print(json.dumps({
            "entry": name,
            "sf_dir": sf_dir,
            "cold_wall": cold_w,
            "cold_task": cold_t,
            "warm_task_min": min(tasks),
            "warm_task_samples": sorted(tasks),
            "warm_wall_min": min(walls),
        }))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
