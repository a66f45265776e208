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
    stats: dict | None = None,
) -> DataFrame:
    """(id, component) where component = min vertex id reachable.

    Vertex ids must be orderable (numeric or string); the component label
    is the minimum id in the component. If labels are still changing
    after ``max_iterations`` (component diameter exceeds the budget) the
    result would be a silently split clustering — so this raises when
    ``strict`` else emits a RuntimeWarning.

    ``stats``: pass a dict to receive {"rounds", "converged"} — the
    round count is the scale-governing quantity (it tracks component
    DIAMETER, a structural property, not vertex count; the per-round
    cost is what grows with n), so scale evidence reports both
    (tools/graph_scale_curve.py)."""
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
    rounds = 0
    for _ in range(max_iterations):
        rounds += 1
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
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = changed == 0
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


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 12,
    strict: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """(id, comp) connected components via alternating large-star /
    small-star contraction (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) — the O(log n)-round upgrade over
    :func:`connected_components`' O(diameter) hash-min propagation, for
    adversarially DEEP graphs (long chains, lattice crawl graphs) where
    a diameter-sized iteration budget is unaffordable.

    Each round is two conditional-star operations over the current edge
    multiset, each one aggregation + one projection on the same (u,
    neighbor) shuffle key:

    - large-star: for every u, connect each neighbor v > u to
      m = min(N(u) ∪ {u});
    - small-star: for every u, connect each neighbor v <= u (v != m)
      to m.

    Both preserve connectivity and strictly shrink tree height; the
    fixpoint is a star forest where every vertex points at its
    component's minimum id. Convergence is checked the same way as the
    hash-min variant (any edge change left?) and needs O(log n) rounds
    with high probability — 12 covers graphs far beyond any realistic
    near-dup corpus. Equivalence with hash-min is pytest-pinned on
    random graphs; the chain test shows star converging where hash-min's
    same-round budget provably splits."""
    # current edge set as canonical (a, b) pairs, self-loops dropped
    cur = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    vertices = (
        cur.select(F.col("a").alias("id"))
        .unionByName(cur.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def star(e: DataFrame, large: bool) -> DataFrame:
        # neighborhoods in both directions + the self edge, so min(N(u) ∪ {u})
        nbrs = (
            e.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .unionByName(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
            .unionByName(  # self edge for EVERY endpoint: small-star must
                # link u itself to m, and b-side-only vertices have one too
                e.select(F.col("a").alias("u"), F.col("a").alias("v"))
                .unionByName(
                    e.select(F.col("b").alias("u"), F.col("b").alias("v"))
                )
                .distinct()
            )
        )
        m = nbrs.groupBy("u").agg(F.min("v").alias("m"))
        joined = nbrs.join(m, "u")
        if large:
            kept = joined.filter(F.col("v") > F.col("u"))
        else:
            kept = joined.filter(
                (F.col("v") <= F.col("u")) & (F.col("v") != F.col("m"))
            )
        return (
            kept.select(
                F.least("v", "m").alias("a"), F.greatest("v", "m").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    converged = False
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        nxt = star(star(cur, large=True), large=False).localCheckpoint(eager=True)
        changed = (
            nxt.exceptAll(cur).limit(1).count() + cur.exceptAll(nxt).limit(1).count()
        )
        cur = nxt
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        msg = (
            "connected_components_star did not reach its star-forest "
            f"fixpoint within max_rounds={max_rounds} — raise max_rounds"
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    # fixpoint edges are (min, member) stars; singletons got contracted
    # away, every other vertex appears on the b side exactly once
    labels = cur.select(F.col("b").alias("id"), F.col("a").alias("comp"))
    return vertices.join(labels, "id", "left").select(
        "id", F.coalesce("comp", F.col("id")).alias("comp")
    )


def dedup_clusters(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """Near-duplicate clusters from a pair set (e.g. MinHash-LSH output):
    connected components over the pair graph -> (doc, cluster) with
    cluster = min doc id; singleton docs are absent (they form no pair)."""
    return connected_components(pairs, src=id_a, dst=id_b).select(
        F.col("id").alias("doc"), F.col("comp").alias("cluster")
    )


def cluster_representatives(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Per-document keep/drop decision for near-dup clusters: within each
    cluster keep exactly ONE representative — the member with the highest
    ``score_col`` (ties to the smallest doc id), the standard "keep the
    best copy" step after clustering (dedup pipelines keep the longest /
    highest-quality member, not an arbitrary one).

    Input ``clusters`` is :func:`dedup_clusters` output (doc, cluster);
    singletons are absent there and are trivially their own keepers, so
    the output covers clustered docs only: (doc, cluster, rep, keep).

    Scale shape: the cluster table holds only duplicated docs — usually
    far smaller than the corpus, but corpus-scale on heavy-dup crawls —
    so the score-lookup join is left unhinted: AQE broadcasts it when it
    is small and falls back to a shuffle join on the doc id (bucketable
    on both sides) when it is not. The representative choice is one
    window over the cluster key; partition sizes are duplicate
    multiplicities, never corpus-sized."""
    from pyspark.sql import Window

    scored = docs.select(
        F.col(id_col).alias("doc"), F.col(score_col).alias("score")
    )
    members = clusters.join(scored, "doc")
    w = (
        Window.partitionBy("cluster")
        .orderBy(F.desc("score"), F.asc("doc"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return members.select(
        "doc",
        "cluster",
        F.first("doc").over(w).alias("rep"),
    ).withColumn("keep", F.col("doc") == F.col("rep"))


def cooccurrence_pairs(df: DataFrame, set_col: str = "authors") -> DataFrame:
    """Distinct canonical (u < v) co-occurrence pairs from a set-valued
    column — a per-row array comprehension (no join: the pair fan-out
    happens inside the row before the single distinct)."""
    pairs = F.flatten(
        F.transform(
            set_col,
            lambda a, i: F.filter(
                F.transform(
                    set_col,
                    lambda b, j: F.when(
                        i < j,
                        F.struct(
                            F.least(a, b).alias("u"), F.greatest(a, b).alias("v")
                        ),
                    ),
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .distinct()
    )


def triangle_counts(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Per-vertex triangle counts over an undirected simple graph given
    as canonical distinct edges.

    Degree-oriented wedge closure (the standard O(m^1.5) scheme): every
    edge is directed from its lower-(degree, id) endpoint to the higher
    one — a total acyclic order, so each triangle is enumerated exactly
    once as lo -> mid -> hi.  Orientation by DEGREE (not id) bounds the
    out-degree of every vertex at O(sqrt(m)), so hub vertices cannot
    explode the wedge join (measured 28.5s -> see SCALE.md with id
    orientation on the sf0.1 co-author graph, where 1000 authors share
    dense order cliques).  The oriented wedge self-join groups by the
    wedge CENTER, and the closing edge lookup is an equi-join on the
    oriented pair.  Triangle membership is emitted with one explode
    (NOT a triple self-union, which would execute the join chain three
    times)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("x"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient: lo = endpoint with smaller (degree, id); rank r breaks all
    # ties so the orientation is a strict total order
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    o = (
        e.join(du, on="u")
        .join(dv, on="v")
        .select(
            F.when(
                F.struct(F.col("du"), F.col("u"))
                < F.struct(F.col("dv"), F.col("v")),
                F.struct(
                    F.col("u").alias("lo"),
                    F.col("v").alias("hi"),
                    F.struct(
                        F.col("dv").alias("d"), F.col("v").alias("x")
                    ).alias("hi_rank"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("lo"),
                    F.col("u").alias("hi"),
                    F.struct(
                        F.col("du").alias("d"), F.col("u").alias("x")
                    ).alias("hi_rank"),
                )
            )
            .alias("e")
        )
        .select("e.lo", "e.hi", "e.hi_rank")
        .persist()
    )
    w1, w2 = o.alias("w1"), o.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.lo") == F.col("w2.lo"))
        & (F.col("w1.hi_rank") < F.col("w2.hi_rank")),
    ).select(
        F.col("w1.lo").alias("a"),
        F.col("w1.hi").alias("b"),
        F.col("w2.hi").alias("c"),
    )
    # the closing edge b-c is oriented b -> c (b precedes c in the same
    # total order), so one equi-join closes every wedge
    closer = o.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    tri = wedges.join(closer, on=["b", "c"])
    members = tri.select(
        F.explode(F.array("a", "b", "c")).alias("vertex")
    )
    out = members.groupBy("vertex").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    return out


def pagerank(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    damping: float = 0.85,
    iterations: int = 5,
    normalized: bool = False,
) -> DataFrame:
    """PageRank over an undirected graph (canonical distinct edges; both
    directions are materialized once here), run for a FIXED number of
    iterations so the result is deterministic and cross-engine
    checkable — no float convergence test.

    Scale shape per iteration: one message aggregation (sum of
    rank/degree over in-neighbors) + one broadcast-free equi-join,
    hash-partitioned on vertex id — the same shuffle profile as the LPA
    loop. Degrees are computed once and cached with the edge list;
    lineage is cut by localCheckpoint every other iteration. No dangling
    mass term: every vertex of an edge list has degree >= 1."""
    bidir = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
            )
        ).alias("e")
    ).select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
    deg = bidir.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    adj = bidir.join(deg, on="a").persist()
    n = adj.select("a").distinct().count()
    base = (1.0 - damping) / n

    ranks = deg.select("a", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        contrib = (
            adj.join(ranks, on="a")
            .groupBy("b")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("m"))
        )
        ranks = contrib.select(
            F.col("b").alias("a"),
            (F.lit(base) + F.lit(damping) * F.col("m")).alias("rank"),
        )
        if i % 2 == 1:
            ranks = ranks.localCheckpoint()
    adj.unpersist()
    out = ranks.select(F.col("a").alias("vertex"), "rank")
    if normalized:
        # rank * n keeps ~6 significant digits under round-6 hashing
        # regardless of graph size (raw ranks live at the 1/n scale)
        out = out.select("vertex", (F.col("rank") * n).alias("rank"))
    return out


def kcore_peel(
    edges: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 12,
) -> DataFrame:
    """Synchronous k-core peeling (Matula & Beck's iterative
    degree-prune, the distributed formulation every Pregel-family
    system uses): round r+1 keeps exactly the vertices with >= ``k``
    neighbors alive at round r; the fixpoint is the k-core — the
    maximal subgraph where every vertex has degree >= k, the classic
    graph-level quality/robustness screen (spam farms and tendrils
    peel out, the dense collaboration core survives).

    Output: (vertex, survived_rounds, in_core) for every vertex with
    at least one edge — ``survived_rounds`` = last round the vertex
    was alive (0-based; a degree-<k vertex peels immediately with 0),
    capped at ``max_rounds`` which core vertices always carry, so the
    column doubles as a peel-depth ("how peripheral") score.

    Scale shape: per round, ONE degree aggregation over the surviving
    edge set (map-side combine) + semi-joins against the alive set,
    with a ``localCheckpoint`` lineage cut per round — the same
    driver-coordinated superstep loop as C8's LPA and hash-min CC.
    Round count is bounded by the peel depth, a STRUCTURAL property
    (how long the thinnest tendril is), not the vertex count; corpora
    with bounded tendril depth converge in O(depth) rounds at any
    scale. If the loop hits ``max_rounds`` before the alive set
    stabilizes, the remaining vertices are reported as core at the
    cap — callers needing exactness on adversarially deep graphs
    (a single long chain) raise the cap. The ``converged`` output
    column (constant per call) records whether the fixpoint was
    actually reached inside the cap, so a capped non-converged peel
    is visible to quality-screen callers instead of silently labeling
    unpeeled tendrils as core (round-9 advice)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    alive = sym.select(F.col("a").alias("v")).distinct().localCheckpoint(
        eager=True
    )
    n_alive = alive.count()
    peeled = None
    final_round = max_rounds
    converged = n_alive == 0
    for r in range(max_rounds):
        deg = (
            sym.join(alive.withColumnRenamed("v", "a"), "a")
            .join(alive.select(F.col("v").alias("b")), "b")
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        nxt = (
            deg.filter(F.col("deg") >= k)
            .select(F.col("a").alias("v"))
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        dropped = alive.join(nxt, "v", "left_anti").select(
            "v", F.lit(r).cast("long").alias("survived_rounds")
        )
        peeled = dropped if peeled is None else peeled.unionByName(dropped)
        alive = nxt
        if n_next == n_alive:
            converged = True
            break  # fixpoint: everyone still alive has degree >= k forever
        n_alive = n_next
    core = alive.select(
        "v", F.lit(final_round).cast("long").alias("survived_rounds")
    )
    out = core if peeled is None else peeled.unionByName(core)
    return out.select(
        F.col("v").alias("vertex"),
        "survived_rounds",
        (F.col("survived_rounds") >= max_rounds).alias("in_core"),
        F.lit(converged).alias("converged"),
    )
