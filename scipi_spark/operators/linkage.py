"""Entity resolution / record linkage — the STRUCTURED-record twin of the
document dedup family (``operators/dedup.py`` finds near-duplicate TEXT;
this finds records that denote the same real-world ENTITY under field
noise: the Fellegi & Sunter 1969 pipeline every modern ER system —
Splink, dedupe, Zingg — distributes the same way):

1. **blocking** — candidate pairs only WITHIN a cheap deterministic
   block (here: the first name token), the cut that turns O(n^2)
   comparison into sum-of-block-squares;
2. **pairwise scoring** — word-set Jaccard over the name field (exact
   integer set sizes, one division: cross-engine bit-parity for free);
3. **transitive closure** — matched pairs are edges; an entity is a
   connected component (``graph.connected_components``' hash-min
   superstep loop), its id the minimum record id.

Scale shape: the block join shuffles on the block key only; scoring is
per-pair column arithmetic (whole-stage codegen, no UDF); the closure
runs on the (sparse) MATCH graph, not the record corpus. No stage ever
holds all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def name_words(col: Column | str) -> Column:
    """Distinct whitespace tokens of the name field — the comparison
    set. Distinctness makes |intersection| / |union| exact integers."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(F.filter(F.split(c, r"\s+"), lambda t: t != ""))


def candidate_pairs(
    df: DataFrame, id_col: str = "rec_id", name_col: str = "name"
) -> DataFrame:
    """Blocked candidate pairs (id_a < id_b) with both word sets
    attached. Block key = the FIRST name token: same-entity records
    must agree on it (the standard blocking contract — recall lost to
    a corrupted first token is recovered in real systems by a second
    blocking pass on another key; the plumbing is identical)."""
    recs = df.select(
        F.col(id_col).alias("rid"), name_words(name_col).alias("w")
    ).withColumn("blk", F.element_at("w", 1))
    a, b = recs.alias("a"), recs.alias("b")
    return a.join(
        b,
        (F.col("a.blk") == F.col("b.blk")) & (F.col("a.rid") < F.col("b.rid")),
    ).select(
        F.col("a.rid").alias("id_a"),
        F.col("b.rid").alias("id_b"),
        F.col("a.w").alias("wa"),
        F.col("b.w").alias("wb"),
    )


def match_pairs(
    df: DataFrame,
    id_col: str = "rec_id",
    name_col: str = "name",
    threshold: float = 0.5,
) -> DataFrame:
    """(id_a, id_b, jaccard) for blocked pairs whose name word-set
    Jaccard reaches ``threshold``."""
    pairs = candidate_pairs(df, id_col, name_col)
    jac = F.size(F.array_intersect("wa", "wb")) / F.size(
        F.array_union("wa", "wb")
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def entity_ids(
    df: DataFrame,
    matches: DataFrame,
    id_col: str = "rec_id",
) -> DataFrame:
    """(rec_id, entity_id): transitive closure of the match graph —
    records chained by any sequence of matches share one entity id (the
    component's minimum record id); unmatched records keep their own.
    The closure iterates over the MATCH graph only, so its cost tracks
    the duplicate rate, not the corpus."""
    from scipi_spark.operators import graph

    comp = graph.connected_components(
        matches.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    ids = df.select(F.col(id_col).alias("rec_id"))
    return ids.join(
        comp.withColumnRenamed("id", "rec_id"), "rec_id", "left"
    ).select(
        "rec_id",
        F.coalesce("comp", "rec_id").cast("long").alias("entity_id"),
    )
