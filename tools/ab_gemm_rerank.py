"""A/B protocol for the GEMM rerank kernel (r12 verdict #7): for each
entry, interleaved OFF/ON repetitions of a full rebuild+execute (the
scoring stage re-runs each time; everything else is identical, so the
delta IS the scoring-stage delta). Task-seconds via
scipi_spark.taskmetrics (contention-robust). Prints one JSON line per
entry with per-mode samples.

RESULT (r13, sf1, recorded in OPTIMIZATION_r13.md): the kernel LOST —
knn_cosine_brute 0.29x, knn_cosine_pq 0.65x, knn_cosine_lsh 0.88x
(min-of-3 interleaved task-s). The conf-gated kernel was reverted from
cosine_pre after the measurement, so the ON mode of this tool now
measures the same plan as OFF; the tool is kept as the record of the
protocol behind the numbers.

Usage: SPARK_GRAFT_SF_DIR=/root/perfdata/sf1 python tools/ab_gemm_rerank.py [entries...]
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

DEFAULT = [
    "knn_cosine_brute",
    "knn_cosine_lsh",
    "knn_cosine_pq",
    "knn_join",
    "emb_neardup_planted",
]
CONF = "spark.scipi.ann.gemmRerank"


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/perfdata/sf1")
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))
    spark = get_spark(app_name="scipi-spark-ab-gemm")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    timer = TaskTimer(spark)

    for name in names:
        fn = qs[name]
        try:
            fn(spark, "/root/testdata/sf0.001").count()  # codegen warmup
        except Exception as exc:
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
            continue
        samples = {"off": [], "on": []}
        rows = {}
        for _ in range(reps):
            for mode in ("off", "on"):
                spark.conf.set(CONF, "true" if mode == "on" else "false")
                spark.catalog.clearCache()
                gc.collect()
                time.sleep(1.0)
                w, tr, _tc = timer.measure(lambda: fn(spark, sf_dir).count())
                samples[mode].append(round(tr, 3))
        spark.conf.unset(CONF)
        print(json.dumps({
            "entry": name,
            "sf_dir": sf_dir,
            "off_task": samples["off"],
            "on_task": samples["on"],
            "off_min": min(samples["off"]),
            "on_min": min(samples["on"]),
            "speedup_min": round(min(samples["off"]) / max(min(samples["on"]), 1e-9), 3),
        }))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
