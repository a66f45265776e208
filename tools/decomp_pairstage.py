"""Decompose the (post-r13) pair-stage cost: expansion-only (explode ->
explode -> filter, noop-sinked) vs the full pair-count aggregation, on
the same checkpointed inputs at sf1. Quantifies how much of the
remaining stage cost is the inherent pair-keyed hash aggregation."""
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
spark = get_spark(app_name="decomp-pairstage")
spark.sparkContext.setLogLevel("ERROR")
timer = TaskTimer(spark)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


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

li = load_table(spark, SF, "lineitem").select(
    F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
)
sets = (
    li.distinct()
    .groupBy("okey")
    .agg(F.sort_array(F.collect_set("part")).alias("parts"))
    .localCheckpoint(eager=True)
)

w_pairs = (
    plists.filter(F.size("ds") >= 2)
    .select(F.explode("ds").alias("contained"), "ds")
    .select("contained", F.explode("ds").alias("container"))
    .filter(F.col("contained") != F.col("container"))
)
b_pairs = (
    sets.select(F.explode("parts").alias("part_a"), "parts")
    .select("part_a", F.explode("parts").alias("part_b"))
    .filter(F.col("part_a") < F.col("part_b"))
)

print("# winnow pair rows:", w_pairs.count(), flush=True)
print("# basket pair rows:", b_pairs.count(), flush=True)

stages = {
    "winnow_expand_only": lambda: noop(w_pairs),
    "winnow_full_agg": lambda: noop(
        w_pairs.groupBy("contained", "container").agg(F.count(F.lit(1)).alias("c"))
    ),
    "basket_expand_only": lambda: noop(b_pairs),
    "basket_full_agg": lambda: noop(
        b_pairs.groupBy("part_a", "part_b").agg(F.count(F.lit(1)).alias("c"))
    ),
}
for name, fn in stages.items():
    fn()  # warmup
for r in range(3):
    for name, fn in stages.items():
        spark.sparkContext.setJobDescription(f"{name}:{r}")
        time.sleep(1.0)
        w, tr, tc = timer.measure(fn)
        print(f"# {name} r{r}: wall {w:.2f} task {tr:.1f} cpu {tc:.1f}", flush=True)
