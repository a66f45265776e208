"""Scale evidence for the persisted ANN store probe (round-9 verdict #1).

The sf0.1 embeddings table (2,000 rows) cannot distinguish a sublinear
probe from a linear one — its curve flipped between slope 0.08 (r8) and
1.03 (r9) on the same code. This tool measures the probe on a
deterministic 100K x 64-dim synthetic fixture across >=2 decades of
corpus size (1K -> 10K -> 100K), comparing:

- ``auto``  — the production path: ``write_ann_store`` with bits=None
  (``auto_bits``: bits ~ log2(n/64), persisted in the version marker;
  the probe self-configures). Expected: per-query candidate count ~
  constant => probe task-s ~ flat in n (sublinear slope).
- ``fixed`` — the pre-round-10 default (bits=6 at every n). Expected:
  bucket occupancy n/64 per table => probe task-s ~ linear in n.

Per (mode, n): one store build (untimed), one untimed warm-up probe,
then WARM_SAMPLES timed probes of a fixed 16-query batch; the minimum
executor-task-time is the steady-state cost (same methodology as
tools/scaling_curves.py — task time, not wall, is contention-robust on
this shared box). The headline is the log-log slope between the two
largest n per mode. Writes ANN_SCALE.json at the repo root.

The fixture is regenerated deterministically (numpy PCG64 seed 7) into
$SPARK_GRAFT_FIXTURE_DIR (default /tmp/scipi_ann_fixture) — 100K
vectors ~ 26 MB parquet, cached across runs, never committed.

Usage: python tools/ann_scale_curve.py     (~4 min)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE_DIR = os.environ.get(
    "SPARK_GRAFT_FIXTURE_DIR", "/tmp/scipi_ann_fixture"
)
NS = [1_000, 10_000, 100_000]
DIM = 64
TABLES = 16
K = 10
QUERY_IDS = list(range(16))
WARM_SAMPLES = 3


def build_fixture(path: str, n: int, dim: int = DIM) -> None:
    """Deterministic quasi-uniform unit vectors, chunked so the writer
    never holds more than 10K rows in memory."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(os.path.join(path, "_DONE")):
        return
    os.makedirs(path, exist_ok=True)
    rng = np.random.Generator(np.random.PCG64(7))
    writer = None
    schema = pa.schema(
        [pa.field("vec_id", pa.int64()), pa.field("embedding", pa.list_(pa.float32()))]
    )
    out = os.path.join(path, "embeddings.parquet")
    for start in range(0, n, 10_000):
        m = min(10_000, n - start)
        X = rng.normal(size=(m, dim)).astype("float32")
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        batch = pa.record_batch(
            [
                pa.array(range(start, start + m), type=pa.int64()),
                pa.array(list(X), type=pa.list_(pa.float32())),
            ],
            schema=schema,
        )
        if writer is None:
            writer = pq.ParquetWriter(out, schema)
        writer.write_batch(batch)
    if writer is not None:
        writer.close()
    open(os.path.join(path, "_DONE"), "w").close()


def main() -> None:
    from pyspark.sql import functions as F

    from scipi_spark.operators import similarity
    from scipi_spark.session import get_spark
    from scipi_spark.sources import storectl
    from scipi_spark.taskmetrics import TaskTimer

    build_fixture(FIXTURE_DIR, max(NS))
    spark = get_spark(app_name="scipi-ann-scale")
    spark.sparkContext.setLogLevel("ERROR")
    timer = TaskTimer(spark)
    emb_all = spark.read.parquet(
        os.path.join(FIXTURE_DIR, "embeddings.parquet")
    )

    results: dict = {"dim": DIM, "tables": TABLES, "k": K, "modes": {}}

    # in-memory near-dup family on the same fixture (r9 verdict #1 asked
    # for similarity-FAMILY curves, not just the store probe): every
    # vector is a query, so the honest optimum is O(n) — slope ~1 — vs
    # the all-pairs baseline's slope 2. Banded LSH with auto-sized bits
    # keeps expected bucket occupancy constant, which is exactly what
    # makes the candidate count linear instead of quadratic.
    neardup: dict = {}
    for n in NS:
        emb = emb_all.filter(F.col("vec_id") < n).localCheckpoint(eager=True)
        bits = similarity.auto_bits(n)

        def run_nd():
            return similarity.cosine_neardup_pairs(
                emb, threshold=0.95, bits=bits, tables=8
            ).count()

        run_nd()
        tasks = []
        for _ in range(WARM_SAMPLES):
            time.sleep(0.5)
            _w, tr, _tc = timer.measure(run_nd)
            tasks.append(round(tr, 3))
        neardup[str(n)] = {"bits": bits, "task": min(tasks),
                           "task_samples": sorted(tasks)}
        print(f"neardup n={n} bits={bits} task={min(tasks)}", flush=True)
        emb.unpersist()
    xs = [math.log10(n) for n in (NS[0], NS[-1])]
    ys = [math.log10(max(neardup[str(n)]["task"], 1e-3))
          for n in (NS[0], NS[-1])]
    results["neardup_inmem"] = {
        "curve": neardup,
        "slope_full_range": round((ys[1] - ys[0]) / (xs[1] - xs[0]), 3),
        "honest_optimum_slope": 1.0,
    }

    for mode in ("auto", "fixed"):
        curve: dict = {}
        for n in NS:
            emb = emb_all.filter(F.col("vec_id") < n).localCheckpoint(
                eager=True
            )
            table = f"ann_scale_{mode}_{n}"
            root = os.path.join(FIXTURE_DIR, "stores", table)
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            spark.sql(f"DROP TABLE IF EXISTS {table}_vectors")
            if storectl.current_dir(root) is None:
                similarity.write_ann_store(
                    emb,
                    root,
                    table=table,
                    bits=(None if mode == "auto" else 6),
                    tables=TABLES,
                )
            else:
                similarity.open_ann_store(spark, root, table=table)
            bits = (storectl.current_params(root) or {}).get("bits", 6)
            probe = emb.filter(F.col("vec_id").isin(QUERY_IDS))

            def run():
                return similarity.knn_from_store(
                    probe, table=table, k=K, path=root
                ).count()

            run()  # untimed warm-up (registration, codegen)
            tasks, walls, cands = [], [], None
            for _ in range(WARM_SAMPLES):
                time.sleep(0.5)
                w, tr, _tc = timer.measure(run)
                tasks.append(round(tr, 3))
                walls.append(round(w, 3))
            curve[str(n)] = {
                "bits": bits,
                "task": min(tasks),
                "task_samples": sorted(tasks),
                "wall": min(walls),
            }
            print(f"{mode} n={n} bits={bits} task={min(tasks)}", flush=True)
            emb.unpersist()
        xs = [math.log10(n) for n in NS[-2:]]
        ys = [math.log10(max(curve[str(n)]["task"], 1e-3)) for n in NS[-2:]]
        slope = (ys[1] - ys[0]) / (xs[1] - xs[0])
        # full-range slope across the >=2-decade span
        x0 = math.log10(NS[0])
        y0 = math.log10(max(curve[str(NS[0])]["task"], 1e-3))
        results["modes"][mode] = {
            "curve": curve,
            "slope_top_decade": round(slope, 3),
            "slope_full_range": round(
                (ys[1] - y0) / (xs[1] - x0), 3
            ),
        }
    with open(os.path.join(REPO, "ANN_SCALE.json"), "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(json.dumps(results["modes"], indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
