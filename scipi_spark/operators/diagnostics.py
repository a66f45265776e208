"""Plan-time diagnostics for 1000-executor runs: the numbers an engineer
(or an auto-tuner) reads BEFORE choosing a join/agg strategy.

The first citizen is the key-skew profile — the single statistic that
decides between a plain shuffle join, a broadcast, AQE skew splitting,
or explicit salting (`analytics.keyword_count_salted` is this package's
salted twin; this operator is how you find out that you need it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skew_profile(
    df: DataFrame,
    key_col: str,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` heaviest keys of ``key_col`` with per-key share and the
    corpus-wide skew summary on every row: total rows, distinct keys,
    median per-key count, and skew_ratio = max/median — the number that
    says whether this key can anchor a shuffle (ratio ~1: uniform;
    ratio >> 10: salt it or let AQE split it).

    One count aggregation on the key [the only data-sized shuffle], one
    1-row summary aggregate (exact median over the per-key counts —
    swap for approx_percentile when key cardinality itself is extreme)
    broadcast back onto the k ranked rows. Ties rank deterministically
    by key string."""
    counts = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    stats = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
        F.expr("percentile(cnt, 0.5)").alias("median_cnt"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    topk = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    return topk.crossJoin(F.broadcast(stats)).select(
        "rank",
        "key",
        "cnt",
        "n_keys",
        "total_rows",
        F.round(F.col("cnt") / F.col("total_rows"), 6).alias("share"),
        F.round("median_cnt", 6).alias("median_cnt"),
        F.round(F.col("max_cnt") / F.col("median_cnt"), 6).alias(
            "skew_ratio"
        ),
    )
