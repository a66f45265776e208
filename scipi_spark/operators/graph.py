"""Generic iterative graph algorithms beyond the reference's Gelly call:
connected components (used for duplicate-cluster assembly over near-dup
pair sets) via hash-min label propagation.

Scale shape: each iteration is one message aggregation (min over
neighbors) + one join — identical shuffle profile to the LPA loop, with
``localCheckpoint`` lineage cuts. Hash-min needs O(graph diameter)
iterations — the right trade for near-dup cluster graphs, whose
components are shallow (duplicates of a common document). For
adversarially deep graphs (long chains) the upgrade path is the
large-star/small-star contraction of Kiveris et al. (O(log n) rounds);
this implementation instead detects non-convergence and warns/raises."""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    strict: bool = False,
) -> DataFrame:
    """(id, component) where component = min vertex id reachable.

    Vertex ids must be orderable (numeric or string); the component label
    is the minimum id in the component. If labels are still changing
    after ``max_iterations`` (component diameter exceeds the budget) the
    result would be a silently split clustering — so this raises when
    ``strict`` else emits a RuntimeWarning."""
    bidir = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .distinct()
        .persist()
    )
    labels = (
        bidir.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )

    changed = 1
    for _ in range(max_iterations):
        nbr_min = (
            bidir.join(labels, bidir.b == labels.id)
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    bidir.unpersist()
    if changed != 0:
        msg = (
            "connected_components did not converge within "
            f"max_iterations={max_iterations}; component labels are split "
            "(a component's diameter exceeds the iteration budget) — "
            "raise max_iterations"
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select("id", "comp")


def dedup_clusters(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """Near-duplicate clusters from a pair set (e.g. MinHash-LSH output):
    connected components over the pair graph -> (doc, cluster) with
    cluster = min doc id; singleton docs are absent (they form no pair)."""
    return connected_components(pairs, src=id_a, dst=id_b).select(
        F.col("id").alias("doc"), F.col("comp").alias("cluster")
    )
