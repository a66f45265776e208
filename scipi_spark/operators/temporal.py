"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded range (interval) join — composed from existing DataFrame ops so
Catalyst still plans them (SURVEY §2.7 lists these as reference absences;
they're table stakes for a complete analytics engine).

Scale design:

- **as-of join** avoids the naive inequality join (O(n*m) theta join)
  entirely: both sides union into one stream tagged by origin, one window
  sorted by (by-keys, time) carries the last right-side row forward —
  a single shuffle on the by-keys, linear work, no cross product. This is
  the standard log-merge formulation (what kdb/QuestDB do natively).
- **range join** keeps the join equi- by bucketing time into
  ``tolerance``-sized bins and joining on (by, bin±1), then filtering the
  exact predicate: candidate pairs are bounded by bucket co-residency,
  never |left|x|right|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_seconds(df: DataFrame, colname: str) -> Column:
    """Fractional epoch seconds for any time-like column. TIMESTAMP_NTZ
    has no direct numeric cast, so it routes through TIMESTAMP first
    (session timezone is pinned to UTC in :mod:`scipi_spark.session`, so
    the wall clock IS the epoch); plain numerics pass through."""
    dtype = df.schema[colname].dataType.simpleString()
    c = F.col(colname)
    if dtype.startswith("timestamp"):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_on: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.time <= left.time`` (per ``by`` keys). Right value columns are
    suffixed; left rows with no prior right row get NULLs.

    Implementation: tag + union + last_value(ignorenulls) over a window
    ordered by (time, right-before-left at ties) — one shuffle on ``by``.
    """
    by = by or []
    r_on = right_on or on
    rcols = [c for c in right.columns if c != r_on and c not in by]

    lhs = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in rcols]).alias("s")).schema[
                "s"
            ].dataType
        ).alias("_rrow"),
    )
    rhs = right.select(
        *by,
        F.col(r_on).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s")).schema[
                "s"
            ].dataType
        ).alias("_lrow"),
        F.struct(*[F.col(c) for c in rcols]).alias("_rrow"),
    )
    # right rows sort before left rows at equal timestamps, so a tie
    # matches (right.ts == left.ts is "not after")
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lhs.unionByName(rhs).withColumn(
        "_last_r", F.last("_rrow", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_side") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col("_last_r")[c].alias(c + suffix) for c in rcols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_on: str | None = None,
    lower_seconds: int = 0,
    upper_seconds: int = 300,
    suffix: str = "_r",
) -> DataFrame:
    """Pairs where ``left.time - upper <= right.time <= left.time - lower``
    (per ``by`` keys) — e.g. "right events in the 5 minutes before each
    left event".

    Implementation: both sides bucketed into ``upper_seconds``-wide epoch
    bins; candidates come from an equi-join on (by, bin) probing the left
    bin and its predecessor, then the exact inequality filters. Candidate
    count is bounded by bucket co-residency, never |left| x |right|."""
    by = by or []
    r_on = right_on or on
    rcols = [c for c in right.columns if c not in by]
    width = max(upper_seconds, 1)

    lhs = left.withColumn("_tl", _epoch_seconds(left, on)).withColumn(
        "_bk", F.floor(F.col("_tl") / width).cast("long")
    )
    rhs = right.select(
        *by,
        *[F.col(c).alias(c + suffix) for c in rcols],
        _epoch_seconds(right, r_on).alias("_tr"),
        F.floor(_epoch_seconds(right, r_on) / width).cast("long").alias("_rbk"),
    )
    probes = lhs.withColumn(
        "_probe", F.explode(F.array(F.col("_bk"), F.col("_bk") - 1))
    )
    cond = [probes["_probe"] == rhs["_rbk"]] + [probes[c] == rhs[c] for c in by]
    joined = probes.join(rhs, cond)
    for c in by:
        joined = joined.drop(rhs[c])
    t_l, t_r = F.col("_tl"), F.col("_tr")
    return joined.filter(
        (t_r <= t_l - lower_seconds) & (t_r >= t_l - upper_seconds)
    ).drop("_bk", "_probe", "_rbk", "_tl", "_tr")
