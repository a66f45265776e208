"""Interleaved ABAB micro-benchmark of the pair-expansion + pair-count
aggregation stage in winnow_overlap_pairs and market_basket_pairs:
old = nested transform/struct/flatten comprehension (interpreted HOFs),
new = chained codegen'd explodes + filter. Both run over the SAME
checkpointed input in one session, noop-sinked (guide §1.4), N
alternating rounds — the protocol behind the r13 pair-expansion claim
(full-entry bench_one at sf1 swings ±3x run-to-run and cannot resolve
a 2x stage change; this isolates the stage the way ab_gemm_rerank.py
isolated the rerank).

Usage: SPARK_GRAFT_SF_DIR=/root/perfdata/sf1 python tools/ab_pairexp.py
Env:   AB_ROUNDS (default 4).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scipi_spark.operators import dedup
from scipi_spark.session import get_spark
from scipi_spark.sources.tables import load_table
from scipi_spark.taskmetrics import TaskTimer

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/perfdata/sf1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))

spark = get_spark(app_name="ab-pairexp")
spark.sparkContext.setLogLevel("ERROR")
timer = TaskTimer(spark)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# ---- winnow: build the entry's plists once, checkpointed ----
docs = load_table(spark, SF, "documents").select("doc_id", "text")
nxt = docs.select((F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("t2"))
comp = (
    docs.join(nxt, "doc_id")
    .filter(F.col("doc_id") % 5 == 0)
    .select(
        (-F.col("doc_id") - 1).alias("doc_id"),
        F.concat("text", F.lit(" "), "t2").alias("text"),
    )
)
fps = dedup.winnow_fingerprints(docs.unionByName(comp), k=8, w=4)
plists = (
    fps.groupBy("fp")
    .agg(F.collect_list("doc_id").alias("ds"))
    .filter(F.size("ds") <= 50)
    .localCheckpoint(eager=True)
)
n_pl = plists.count()
print(f"# plists rows: {n_pl}", flush=True)


def winnow_old():
    pair_structs = F.filter(
        F.flatten(
            F.transform(
                "ds",
                lambda x: F.transform(
                    F.col("ds"),
                    lambda y: F.struct(x.alias("contained"), y.alias("container")),
                ),
            )
        ),
        lambda s: s.contained != s.container,
    )
    return (
        plists.filter(F.size("ds") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.contained").alias("contained"),
            F.col("p.container").alias("container"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )


def winnow_new():
    return (
        plists.filter(F.size("ds") >= 2)
        .select(F.explode("ds").alias("contained"), "ds")
        .select("contained", F.explode("ds").alias("container"))
        .filter(F.col("contained") != F.col("container"))
        .groupBy("contained", "container")
        .agg(F.count(F.lit(1)).alias("inter"))
    )


# ---- basket: build the entry's sets once, checkpointed ----
li = load_table(spark, SF, "lineitem").select(
    F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
)
sets = (
    li.distinct()
    .groupBy("okey")
    .agg(F.sort_array(F.collect_set("part")).alias("parts"))
    .localCheckpoint(eager=True)
)
n_sets = sets.count()
print(f"# sets rows: {n_sets}", flush=True)


def basket_old():
    return (
        sets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("parts"),
                        lambda a, i: F.transform(
                            F.slice(F.col("parts"), i + 2, F.size("parts")),
                            lambda b: F.struct(a.alias("pa"), b.alias("pb")),
                        ),
                    )
                )
            ).alias("p")
        )
        .groupBy(F.col("p.pa").alias("part_a"), F.col("p.pb").alias("part_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )


def basket_new():
    return (
        sets.select(F.explode("parts").alias("part_a"), "parts")
        .select("part_a", F.explode("parts").alias("part_b"))
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )


results = {}
for label, old_fn, new_fn in [
    ("winnow", winnow_old, winnow_new),
    ("basket", basket_old, basket_new),
]:
    # untimed warmup of both shapes (codegen/JIT)
    noop(old_fn())
    noop(new_fn())
    olds, news = [], []
    for r in range(ROUNDS):
        for mode, fn, acc in (("old", old_fn, olds), ("new", new_fn, news)):
            spark.sparkContext.setJobDescription(f"{label}:{mode}:{r}")
            time.sleep(1.0)
            w, tr, tc = timer.measure(lambda: noop(fn()))
            acc.append((round(w, 2), round(tr, 1), round(tc, 1)))
            print(f"# {label} {mode} r{r}: wall {w:.2f} task {tr:.1f} cpu {tc:.1f}", flush=True)
    results[label] = {
        "old_task": [t for _, t, _ in olds],
        "new_task": [t for _, t, _ in news],
        "old_cpu": [c for _, _, c in olds],
        "new_cpu": [c for _, _, c in news],
        "old_task_min": min(t for _, t, _ in olds),
        "new_task_min": min(t for _, t, _ in news),
    }

print(json.dumps(results))
