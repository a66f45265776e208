"""Interleaved ABAB: dedup_ngram_jaccard's inter(a,b) subtree as the
current posting SELF-JOIN vs a posting-list shape with the r13
chained-explode pair expansion, over the SAME checkpointed postings.
Also value-equality-checked once before timing."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scipi_spark.operators.dedup import _shingle_index
from scipi_spark.session import get_spark
from scipi_spark.sources.tables import load_table
from scipi_spark.taskmetrics import TaskTimer

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/perfdata/sf1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))
spark = get_spark(app_name="ab-ngram")
spark.sparkContext.setLogLevel("ERROR")
timer = TaskTimer(spark)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


docs = load_table(spark, SF, "documents")
sizes, postings = _shingle_index(docs, "doc_id", "text", 3, None, materialize=True)
print("# postings:", postings.count(), flush=True)


def join_shape():
    a = postings.alias("a")
    b = postings.alias("b")
    return (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )


def plist_shape():
    plists = (
        postings.groupBy("sh")
        .agg(F.collect_list("doc").alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    return (
        plists.select(F.explode("ds").alias("doc_a"), "ds")
        .select("doc_a", F.explode("ds").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )


# one-time value equality on the small SF data loaded separately
chk_docs = load_table(spark, "/root/testdata/sf0.01", "documents")
cs, cp = _shingle_index(chk_docs, "doc_id", "text", 3, None, materialize=True)
ja = (
    cp.alias("a")
    .join(
        cp.alias("b"),
        (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")),
    )
    .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
    .agg(F.count(F.lit(1)).alias("inter"))
)
pl = (
    cp.groupBy("sh")
    .agg(F.collect_list("doc").alias("ds"))
    .filter(F.size("ds") >= 2)
    .select(F.explode("ds").alias("doc_a"), "ds")
    .select("doc_a", F.explode("ds").alias("doc_b"))
    .filter(F.col("doc_a") < F.col("doc_b"))
    .groupBy("doc_a", "doc_b")
    .agg(F.count(F.lit(1)).alias("inter"))
)
ra = sorted(map(tuple, ja.collect()))
rb = sorted(map(tuple, pl.collect()))
print("# equality @sf0.01:", ra == rb, len(ra), flush=True)

noop(join_shape())
noop(plist_shape())
olds, news = [], []
for r in range(ROUNDS):
    for mode, fn, acc in (("join", join_shape, olds), ("plist", plist_shape, news)):
        spark.sparkContext.setJobDescription(f"ngram:{mode}:{r}")
        time.sleep(1.0)
        w, tr, tc = timer.measure(lambda: noop(fn()))
        acc.append((round(w, 2), round(tr, 1), round(tc, 1)))
        print(f"# ngram {mode} r{r}: wall {w:.2f} task {tr:.1f} cpu {tc:.1f}", flush=True)
print("join min task:", min(t for _, t, _ in olds), "plist min task:", min(t for _, t, _ in news))
