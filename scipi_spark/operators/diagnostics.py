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
    approx_median: bool = False,
) -> DataFrame:
    """Top-``k`` heaviest keys of ``key_col`` with per-key share and the
    corpus-wide skew summary on every row: total rows, distinct keys,
    median per-key count, and skew_ratio = max/median — the number that
    says whether this key can anchor a shuffle (ratio ~1: uniform;
    ratio >> 10: salt it or let AQE split it).

    One count aggregation on the key [the only data-sized shuffle], one
    1-row summary aggregate broadcast back onto the k heaviest rows.
    The top-k is ``orderBy().limit(k)`` — Spark plans it as
    ``TakeOrderedAndProject`` (per-partition bounded heaps merged at the
    driver, k rows of network), never a global sort; the rank column is
    then a window over only those k rows. ``approx_median=True`` swaps
    the exact median (which gathers every per-key count into one
    aggregation buffer) for ``approx_percentile`` — use it when key
    cardinality itself is extreme (the diagnostic only needs the order
    of magnitude of the ratio). Ties rank deterministically by key
    string."""
    counts = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    median = (
        F.expr("approx_percentile(cnt, 0.5, 10000)").cast("double")
        if approx_median
        else F.expr("percentile(cnt, 0.5)")
    )
    stats = counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
        median.alias("median_cnt"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    # TakeOrderedAndProject: bounded heaps, k rows — the global
    # row_number window this replaced sorted the whole key table on one
    # reducer. The rank window below sees only the k surviving rows.
    topk = (
        counts.orderBy(F.desc("cnt"), F.asc("key"))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("key"))),
        )
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
