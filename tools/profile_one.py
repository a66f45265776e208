"""Per-stage task-time profile of one gate entry's WARM execution.

Usage: python tools/profile_one.py <entry> [sf_dir]
Builds the entry, primes it once (operator-internal persists
materialize), then runs ONE timed count and prints each stage's
executorRunTime delta with its name — the stage-level drill-down the
bench's per-query totals can't give (UI is disabled in this sandbox).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from scipi_spark.session import get_spark  # noqa: E402
from scipi_spark import taskmetrics  # noqa: E402


def stage_names(spark):
    sc = spark.sparkContext
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        sc._gateway.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    out = {}
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        out[(s.stageId(), s.attemptId())] = (
            s.name(), s.numCompleteTasks(), s.executorRunTime(),
        )
    return out


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scipi-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    fn = qs[name]
    warm_df = fn(spark, sf_dir)
    warm_df.count()  # priming
    taskmetrics.quiesce(spark)
    before = stage_names(spark)
    t0 = time.time()
    n = warm_df.count()
    wall = time.time() - t0
    taskmetrics.quiesce(spark)
    after = stage_names(spark)
    deltas = []
    for key, (nm, tasks, rt) in after.items():
        prev = before.get(key)
        drt = rt - (prev[2] if prev else 0)
        dtasks = tasks - (prev[1] if prev else 0)
        if drt > 0 or dtasks > 0:
            deltas.append((drt, dtasks, key[0], nm))
    deltas.sort(reverse=True)
    total = sum(d[0] for d in deltas)
    print(f"# {name}: rows={n} wall={wall:.2f}s task_total={total/1000:.2f}s")
    for drt, dtasks, sid, nm in deltas:
        print(f"  {drt/1000:7.2f}s  {dtasks:4d} tasks  stage {sid}: {nm[:110]}")


if __name__ == "__main__":
    main()
