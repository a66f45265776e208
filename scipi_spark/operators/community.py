"""Heterogeneous publication network + community detection (C1-C16).

Reference: ``ScipiBatchCommunity.java`` — relevance filter (137-164), vertex/
edge extraction (355-462), Gelly ``CommunityDetection`` label propagation
(Leung et al., line 210), dense-community selection (217-250), subgraph +
decoration joins (256-337).

The LPA loop replicates Flink's ``org.apache.flink.graph.library
.CommunityDetection`` semantics exactly (scatter-gather on the undirected
multigraph):

- init: label = unique id per vertex, score = 1.0
- each superstep t (1-based): every vertex sends (label, score*weight)
  along every incident edge; a receiving vertex sums scores per label,
  adopts the label with the max sum (ties -> smallest label), and sets
  score = (max SINGLE received score for that label), minus delta / t
  ONLY when the adopted label differs from the vertex's current label
  (Flink applies the decay on label change, not unconditionally)
- vertices receiving no messages keep their state.

Divergence note: the reference job wires a DIRECTED graph into Gelly
(``ScipiBatchCommunity.java:179-180`` never calls ``getUndirected()``), so
its messages flow only along emitted edge directions (papers never message
authors back). This implementation follows Flink's documented
CommunityDetection contract — an undirected graph, every edge mirrored —
which is the semantically meaningful variant for co-authorship
communities; bit-parity with the reference's directed wiring is not a
goal.

Scale design: one iteration = one shuffle (messages groupBy dst) + one
broadcast-free join back; lineage is cut every iteration with
``localCheckpoint`` so 10+ iterations don't stack plans. Vertex ids stay
strings (names) with 64-bit hash labels — no driver-side dictionaries.
The mid-plan ``collect()`` of top-community labels mirrors the reference's
two-phase execution (``ScipiBatchCommunity.java:241-250``) and broadcasts
a 3-element set, not data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scipi_spark.sources import storectl


# ---------------------------------------------------------------------------
# C1 — relevance filter
# ---------------------------------------------------------------------------

def relevance_filter(
    pubs: DataFrame,
    keywords: list[str] | None = None,
    domains: list[str] | None = None,
) -> DataFrame:
    """Keep publications whose keywords overlap the defined keyword set OR
    fos overlap the defined domain set (``ScipiBatchCommunity.java:137-164``)."""
    conds = []
    if keywords:
        conds.append(
            F.arrays_overlap("keywords", F.array(*[F.lit(k) for k in keywords]))
        )
    if domains:
        conds.append(F.arrays_overlap("fos", F.array(*[F.lit(d) for d in domains])))
    if not conds:
        return pubs
    cond = conds[0]
    for c in conds[1:]:
        cond = cond | c
    return pubs.filter(cond)


# ---------------------------------------------------------------------------
# C2/C3 — vertex extraction
# ---------------------------------------------------------------------------

def extract_vertices(pubs: DataFrame) -> DataFrame:
    """(id, vtype) union of PAPER/PUBLISHER/VENUE/AUTHOR vertices
    (``ScipiBatchCommunity.java:371-407``), deduped on id.

    The reference's ``distinct(0)`` keeps an arbitrary type on name
    collision; here the MIN type wins — deterministic, and identical
    whenever names don't collide across types."""
    papers = pubs.select(F.col("title").alias("id"), F.lit("PAPER").alias("vtype"))
    publishers = pubs.filter(
        F.col("publisher").isNotNull() & (F.col("publisher") != "")
    ).select(F.col("publisher").alias("id"), F.lit("PUBLISHER").alias("vtype"))
    venues = pubs.filter(F.col("venue").isNotNull() & (F.col("venue") != "")).select(
        F.col("venue").alias("id"), F.lit("VENUE").alias("vtype")
    )
    authors = pubs.select(F.explode("authors").alias("id")).select(
        "id", F.lit("AUTHOR").alias("vtype")
    )
    return (
        papers.unionByName(publishers)
        .unionByName(venues)
        .unionByName(authors)
        .groupBy("id")
        .agg(F.min("vtype").alias("vtype"))
    )


# ---------------------------------------------------------------------------
# C4 — edge extraction (with the reference's last-author quirk)
# ---------------------------------------------------------------------------

def extract_edges(pubs: DataFrame) -> DataFrame:
    """(src, dst, weight=1.0) multiset (``ScipiBatchCommunity.java:411-462``):

    - PAPER -> PUBLISHER and PAPER -> VENUE when nonempty
    - authors[0] -> PAPER always; authors[i] -> PAPER for 0 < i < n-1
      (the LAST author never gets an author->paper edge when n > 1 —
      replicated from the reference's loop bound ``i < totalAuthors-1``)
    - all co-author pairs (i, j), i < j

    Pure per-row array expressions — a narrow map, no shuffle, no UDFs."""
    pub_edges = pubs.filter(
        F.col("publisher").isNotNull() & (F.col("publisher") != "")
    ).select(F.col("title").alias("src"), F.col("publisher").alias("dst"))
    ven_edges = pubs.filter(F.col("venue").isNotNull() & (F.col("venue") != "")).select(
        F.col("title").alias("src"), F.col("venue").alias("dst")
    )

    n = F.size("authors")
    # author->paper for indices 0 .. n-2 (index 0 when n == 1)
    ap_authors = F.when(n == 1, F.col("authors")).otherwise(
        F.slice("authors", 1, F.greatest(n - 1, F.lit(1)))
    )
    ap_edges = pubs.select(
        F.explode(ap_authors).alias("src"), F.col("title").alias("dst")
    )

    # co-author pairs (i < j) as a nested array comprehension (no join)
    pairs = F.flatten(
        F.transform(
            "authors",
            lambda a, i: F.filter(
                F.transform(
                    "authors",
                    lambda b, j: F.when(i < j, F.struct(a.alias("s"), b.alias("d"))),
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )
    co_edges = pubs.select(F.explode(pairs).alias("p")).select(
        F.col("p.s").alias("src"), F.col("p.d").alias("dst")
    )

    return (
        pub_edges.unionByName(ven_edges)
        .unionByName(ap_edges)
        .unionByName(co_edges)
        .select("src", "dst", F.lit(1.0).alias("weight"))
    )


# ---------------------------------------------------------------------------
# C6/C8 — label-propagation community detection (Leung / Flink semantics)
# ---------------------------------------------------------------------------

def initial_labels(vertices: DataFrame) -> DataFrame:
    """C6/C7: unique initial labels — 64-bit hash of the vertex name
    (deterministic and distributed, unlike zipWithUniqueId; collisions at
    ~4B vertices are the classic birthday bound and merge two labels
    harmlessly for community purposes)."""
    return vertices.select(
        "id", F.xxhash64("id").alias("label"), F.lit(1.0).alias("score")
    )


def extract_edges_hashed(pubs: DataFrame, hash_fn=F.xxhash64) -> DataFrame:
    """(src, dst, weight=1.0) multiset of :func:`extract_edges` with vertex
    names hashed BEFORE the pair explosion: one hash per
    author/title/publisher/venue instead of one per emitted edge side
    (~6x fewer hash calls on a co-author multigraph), and the explode
    emits fixed-width longs, never strings. Equivalence with
    ``extract_edges >> xxhash64`` is pytest-pinned.

    ``hash_fn``: Column -> long Column; default xxhash64 (fastest). Pass
    a portable hash (e.g. the md5-prefix hash in ``dedup``) when the
    downstream labels must be replicable outside the JVM — LPA labels ARE
    vertex hashes, so a portable hash makes the whole fixpoint
    SQL-checkable."""
    n = F.size("authors")
    ah = F.transform("authors", lambda a: hash_fn(a))
    th = hash_fn(F.col("title"))

    def pair(s, d):
        return F.struct(s.alias("s"), d.alias("d"))

    co = F.flatten(
        F.transform(
            ah,
            lambda a, i: F.filter(
                F.transform(ah, lambda b, j: F.when(i < j, pair(a, b))),
                lambda x: x.isNotNull(),
            ),
        )
    )
    ap_auth = F.when(n == 1, ah).otherwise(
        F.slice(ah, 1, F.greatest(n - 1, F.lit(1)))
    )
    ap = F.transform(ap_auth, lambda a: pair(a, th))
    empty = F.array().cast("array<struct<s:bigint,d:bigint>>")
    pub = F.when(
        F.col("publisher").isNotNull() & (F.col("publisher") != ""),
        F.array(pair(th, hash_fn(F.col("publisher")))),
    ).otherwise(empty)
    ven = F.when(
        F.col("venue").isNotNull() & (F.col("venue") != ""),
        F.array(pair(th, hash_fn(F.col("venue")))),
    ).otherwise(empty)
    return pubs.select(F.explode(F.concat(co, ap, pub, ven)).alias("e")).select(
        F.col("e.s").alias("src"),
        F.col("e.d").alias("dst"),
        F.lit(1.0).alias("weight"),
    )


def aggregate_undirected_hashed(hedges: DataFrame) -> DataFrame:
    """:func:`aggregate_undirected` over an already-hashed (src: long,
    dst: long, weight) multiset — see that docstring for the plan shape."""
    canon = (
        hedges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "weight",
        )
        .groupBy("a", "b")
        .agg(F.sum("weight").alias("w_sum"), F.max("weight").alias("w_max"))
    )
    self_loops = (
        hedges.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("a"))
        .agg(
            (F.sum("weight") * 2).alias("w_sum"),
            F.max("weight").alias("w_max"),
        )
        .select("a", F.col("a").alias("b"), "w_sum", "w_max")
    )
    mirrored = canon.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("e"),
        "w_sum",
        "w_max",
    ).select("e.src", "e.dst", "w_sum", "w_max")
    return mirrored.unionByName(
        self_loops.select(
            F.col("a").alias("src"), F.col("b").alias("dst"), "w_sum", "w_max"
        )
    )


def aggregate_undirected(edges: DataFrame) -> DataFrame:
    """Hashed, canonicalized, aggregated, mirrored edge table — the exact
    message-fan-out relation the LPA loop joins every superstep.

    - Hash vertex names to 64-bit ids AT THE SCAN, before any shuffle:
      every exchange from here on carries fixed-width longs, never
      variable-length name strings. The same xxhash64 seeds labels, so
      (hash -> name) restores ids with one join at the end.
    - Parallel edges collapse into (w_sum, w_max): a vertex's per-label
      SUM of incoming (score*weight) messages equals score*w_sum, and the
      MAX single message equals score*w_max — exactly Flink's semantics
      with ~Nx less message traffic on multigraphs (the co-author
      multiset).
    - Canonicalize to unordered pairs BEFORE aggregating: grouping the
      raw doubled union shuffles 2|E| rows, grouping (least, greatest)
      shuffles |E| and the mirror emission afterwards is a narrow map
      (both directions of an undirected pair share w_sum/w_max).
      Self-loops keep the doubled-union semantics (both mirror copies
      land in one group).
    - Mirror via explode, NOT a union of two references to the aggregate
      — union branches don't share subplans, so that would run the
      aggregation twice (measured 2x on the build; pitfall #2 in
      SCALE.md)."""
    return aggregate_undirected_hashed(
        edges.select(
            F.xxhash64("src").alias("src"),
            F.xxhash64("dst").alias("dst"),
            "weight",
        )
    )


def write_graph_store(
    edges: DataFrame,
    path: str,
    table: str = "graph_edges_mirrored",
    n_buckets: int = 16,
    mirrored: DataFrame | None = None,
    build_key: str = "graph-v1",
    keep: int = 1,
    retain_s: float = storectl.RETAIN_SECONDS,
) -> None:
    """Persist the aggregated mirrored LPA message relation bucketed AND
    sorted on ``src`` — the production shape of iterative graph analytics
    at 100 TB (the graph twin of :func:`dedup.write_signature_store`):
    the canonicalize + aggregate + mirror shuffle is paid ONCE at graph
    build, and every subsequent LPA run — and every superstep inside it —
    joins label state against the bucketed scan with ZERO edge-side
    Exchange (only the small per-superstep state shuffles, into the
    bucket partitioning). At real scale ``n_buckets`` is sized so each
    bucket is a few hundred MB of edges; re-bucketing only happens when
    the graph outgrows it, not per job.

    ``mirrored``: a pre-aggregated mirrored relation to persist as-is
    (e.g. one built with a portable hash via
    :func:`aggregate_undirected_hashed` so an external engine can replay
    the labels); default builds it from the raw ``edges`` multiset."""
    rel = aggregate_undirected(edges) if mirrored is None else mirrored
    root = path.rstrip("/")
    build = storectl.new_build_dir(root)
    storectl.write_bucketed(rel, build + "/edges", ["src"], ["src"], n_buckets)
    ver = storectl.publish(
        root,
        build,
        build_key,
        keep=keep,
        retain_s=retain_s,
        params={"n_buckets": n_buckets, "delta_appends": 0},
    )
    storectl.register_bucketed(
        rel.sparkSession, table, ver + "/edges", ["src"], ["src"], n_buckets
    )


def merge_delta_edges(mirrored: DataFrame) -> DataFrame:
    """Collapse delta rows of an APPENDED graph store into one row per
    directed pair: :func:`append_graph_store` folds a batch as PARTIAL
    aggregated rows (the LSM merge-on-read shape), so a pair touched by
    k appends holds k+1 rows whose w_sum values SUM and w_max values
    MAX to the from-scratch aggregate — exact, because edge weights are
    small integer-valued doubles (the 1.0-per-edge multiset), so the
    partial sums recombine bit-identically. Over the bucketed store
    scan this aggregate is Exchange-free (the bucket key ``src`` is a
    subset of the grouping key — plan-asserted in tests)."""
    return mirrored.groupBy("src", "dst").agg(
        F.sum("w_sum").alias("w_sum"), F.max("w_max").alias("w_max")
    )


def append_graph_store(
    edges: DataFrame | None,
    path: str,
    table: str = "graph_edges_mirrored",
    mirrored: DataFrame | None = None,
    n_buckets: int | None = None,
    build_key: str | None = None,
    keep: int = 1,
    retain_s: float = storectl.RETAIN_SECONDS,
) -> None:
    """Fold a NEW publication batch's edges into an existing graph
    store — the incremental shape every other persisted family here
    has (dedup signatures, ANN vectors, BM25 postings, entity store,
    SCD2). The reference re-scans its entire Cassandra publications
    table on every batch community run (``ScipiBatchCommunity.java:
    122-133``); at 100 TB the store is built once and each increment
    costs O(|batch|):

    - the batch's aggregated mirrored rows (``aggregate_undirected``
      over ``edges``, or a pre-built ``mirrored`` relation from the
      same portable hash as the base build) APPEND under the store's
      bucket spec — pure O(batch) I/O, no merge at write time;
    - a pair present in both store and batch now holds PARTIAL rows;
      readers collapse them with :func:`merge_delta_edges` (w_sum
      sums and w_max maxes recombine exactly), which
      :func:`community_detection_from_store` applies automatically
      when the version marker records outstanding deltas;
    - :func:`compact_graph_store` rewrites the store merged (one row
      per pair) and resets the delta counter — run it before large
      LPA campaigns so the per-superstep scan skips the merge.

    The bucket count is inherited from the version marker (explicit
    mismatches raise); ``build_key`` defaults to the cloned version's
    own key. Atomicity via clone -> append -> publish under
    ``append_lock`` with ``expect_base``, like every sibling store."""
    rel = aggregate_undirected(edges) if mirrored is None else mirrored
    spark = rel.sparkSession
    root = path.rstrip("/")
    with storectl.append_lock(root):
        build, cur = storectl.clone_current(root)
        # recipe from the CLONED version's own marker, under the lock
        stored = storectl.params_of(cur)
        resolved = storectl.resolve_params(
            stored, {"n_buckets": n_buckets}, {"n_buckets": 16}
        )
        nb = resolved["n_buckets"]
        storectl.append_bucketed(rel, build + "/edges", ["src"], ["src"], nb)
        params = dict(
            storectl.persistable_params(
                stored, {"n_buckets": n_buckets}, resolved
            )
            or {}
        )
        # the delta counter is derived knowledge (this append happened),
        # so it is always stamped — readers merge iff it is non-zero
        params["delta_appends"] = (stored or {}).get("delta_appends", 0) + 1
        meta = storectl.meta_of(cur) or {}
        ver = storectl.publish(
            root,
            build,
            build_key or meta.get("build_key", "graph-v1"),
            keep=keep,
            retain_s=retain_s,
            expect_base=os.path.basename(cur),
            params=params,
        )
    storectl.register_bucketed(
        spark, table, ver + "/edges", ["src"], ["src"], nb
    )


def compact_graph_store(
    spark,
    path: str,
    table: str = "graph_edges_mirrored",
    n_buckets: int | None = None,
    build_key: str | None = None,
    keep: int = 1,
    retain_s: float = storectl.RETAIN_SECONDS,
) -> None:
    """Rewrite an appended graph store with delta rows merged — one row
    per directed pair again, delta counter reset to 0, so every later
    LPA run reads the store directly with no per-superstep merge
    aggregate (``dedup.compact_signature_store`` /
    ``similarity.compact_ann_store`` are the siblings). The merge
    aggregate itself runs Exchange-free over the old version's bucket
    layout; the rewrite shuffles once into the (unchanged) bucket spec.
    Result is bit-identical to a from-scratch
    :func:`write_graph_store` over the combined edge multiset
    (pytest-pinned). Publishes atomically as a new version; the recipe
    is inherited from the marker (explicit mismatches raise)."""
    root = path.rstrip("/")
    cur = storectl.current_dir(root)
    if cur is None:
        raise FileNotFoundError(f"no published graph store under {root!r}")
    stored = storectl.params_of(cur)
    resolved = storectl.resolve_params(
        stored, {"n_buckets": n_buckets}, {"n_buckets": 16}
    )
    nb = resolved["n_buckets"]
    # register over the CURRENT version so the merge reads the bucket
    # partitioning (no Exchange); the write targets a fresh build dir,
    # so it never reads the files it replaces
    storectl.register_bucketed(
        spark, table, cur + "/edges", ["src"], ["src"], nb
    )
    merged = merge_delta_edges(spark.table(table))
    build = storectl.new_build_dir(root)
    storectl.write_bucketed(merged, build + "/edges", ["src"], ["src"], nb)
    params = dict(
        storectl.persistable_params(
            stored, {"n_buckets": n_buckets}, resolved
        )
        or {}
    )
    params["delta_appends"] = 0
    if build_key is None:
        meta = storectl.meta_of(cur) or {}
        build_key = meta.get("build_key", "graph-v1")
    ver = storectl.publish(
        root, build, build_key, keep=keep, retain_s=retain_s, params=params
    )
    storectl.register_bucketed(
        spark, table, ver + "/edges", ["src"], ["src"], nb
    )


def write_label_store(
    spark,
    graph_path: str,
    path: str,
    graph_table: str = "graph_edges_mirrored",
    table: str = "graph_labels",
    iterations: int = 10,
    delta: float = 0.5,
    portable_rounding: bool = False,
    n_buckets: int = 16,
    cc_max_iterations: int = 50,
    build_key: str = "labels-v1",
    keep: int = 1,
    retain_s: float = storectl.RETAIN_SECONDS,
) -> None:
    """Persist the LPA RESULT — (id, label, comp) bucketed+sorted on
    ``id`` — next to the graph store, so later batches re-label only
    the components they touch (:func:`refresh_label_store`) instead of
    re-running LPA over the whole graph. ``comp`` is the connected-
    component id (min reachable vertex hash, ``strict`` — a silently
    split component would leak stale labels through the touched-set
    filter, so non-convergence aborts the build): LPA messages never
    cross components, so a component with no new edge keeps its labels
    VERBATIM under any fixed iteration budget — the reuse invariant the
    incremental path rests on. The LPA recipe (iterations, delta,
    portable_rounding) is stamped into the version marker; refresh
    calls self-configure from it and explicit mismatches raise (labels
    computed under different recipes must never mix)."""
    # resolve the graph version ONCE: LPA and the CC pass must read the
    # same store state (the TOCTOU discipline every probe here follows)
    root_g = graph_path.rstrip("/")
    gver = storectl.current_dir(root_g)
    if gver is None:
        raise FileNotFoundError(
            f"no published graph store under {root_g!r} — "
            "write_graph_store first"
        )
    gparams = storectl.params_of(gver) or {}
    gnb = gparams.get("n_buckets", 16)
    storectl.register_bucketed(
        spark, graph_table, gver + "/edges", ["src"], ["src"], gnb
    )
    merged = spark.table(graph_table)
    if gparams.get("delta_appends", 0):
        merged = merge_delta_edges(merged)
    labels = community_detection(
        vertices=None,
        edges=None,
        iterations=iterations,
        delta=delta,
        mirrored=merged,
        n_edges=merged.count(),
        restore_names=False,
        portable_rounding=portable_rounding,
    )
    from scipi_spark.operators import graph as graph_ops

    comps = graph_ops.connected_components(
        merged.select("src", "dst"),
        max_iterations=cc_max_iterations,
        strict=True,
    )
    rel = labels.join(
        comps.withColumnRenamed("id", "lid"), labels.id == F.col("lid")
    ).select("id", "label", "comp")
    root = path.rstrip("/")
    build = storectl.new_build_dir(root)
    storectl.write_bucketed(rel, build + "/labels", ["id"], ["id"], n_buckets)
    ver = storectl.publish(
        root,
        build,
        build_key,
        keep=keep,
        retain_s=retain_s,
        params={
            "n_buckets": n_buckets,
            "iterations": iterations,
            "delta": delta,
            "portable_rounding": int(portable_rounding),
            "cc_max_iterations": cc_max_iterations,
        },
    )
    storectl.register_bucketed(
        spark, table, ver + "/labels", ["id"], ["id"], n_buckets
    )


def refresh_label_store(
    spark,
    graph_path: str,
    path: str,
    batch_mirrored: DataFrame,
    graph_table: str = "graph_edges_mirrored",
    table: str = "graph_labels",
    keep: int = 1,
    retain_s: float = storectl.RETAIN_SECONDS,
    stats: dict | None = None,
) -> DataFrame:
    """Incrementally re-label ONLY the components a folded batch
    touched — the 100 TB answer to re-running community detection over
    the whole graph after every increment (the reference re-runs its
    batch job from a full Cassandra scan,
    ``ScipiBatchCommunity.java:122-133``; r11 verdict #1 asked for
    exactly this shape). Call AFTER :func:`append_graph_store` folded
    the batch's mirrored rows into the graph store; ``batch_mirrored``
    is that same relation (only its endpoint set is read).

    Mechanics — exact, not approximate:

    1. touched components = stored ``comp`` of every batch endpoint
       (new vertices have none — their edges are batch edges, touched
       by definition);
    2. the re-label SUBGRAPH = merged store edges whose ``src`` lies in
       a touched component or is new; since LPA messages never cross
       components and every old edge lies inside one old component, an
       untouched component's labels are the full-graph fixpoint
       verbatim under any fixed iteration budget;
    3. the LPA loop and a strict connected-components pass run over
       the subgraph alone — cost tracks the touched subgraph, never
       the corpus — and the label store rewrites as
       untouched-rows UNION re-labeled-rows (new component ids
       compose: min over a merged component = min of the mins).

    The LPA recipe comes from the label store's version marker (the one
    :func:`write_label_store` stamped), so incremental labels can never
    silently mix iteration budgets with stored ones. Returns the full
    folded (id, label) assignment — bit-identical to re-running
    :func:`community_detection_from_store` over the merged graph
    (gate- and pytest-pinned). Publishes the folded label store
    atomically under ``append_lock``.

    ``stats``: pass a dict to receive {"touched_comps", "sub_edges",
    "total_edges"} — the reuse evidence (sub_edges < total_edges means
    untouched components really were skipped, pytest-pinned)."""
    root = path.rstrip("/")
    with storectl.append_lock(root):
        build, cur = storectl.clone_current(root)
        params = storectl.params_of(cur) or {}
        nb = params.get("n_buckets", 16)
        iterations = params.get("iterations", 10)
        delta = params.get("delta", 0.5)
        portable = bool(params.get("portable_rounding", 0))
        cc_max = params.get("cc_max_iterations", 50)
        storectl.register_bucketed(
            spark, table, cur + "/labels", ["id"], ["id"], nb
        )
        stored = spark.table(table)

        touched_v = batch_mirrored.select(F.col("src").alias("id")).distinct()
        touched_comps = (
            stored.join(touched_v, "id")
            .select("comp")
            .distinct()
            .localCheckpoint(eager=True)
        )

        gver = storectl.current_dir(graph_path.rstrip("/"))
        if gver is None:
            raise FileNotFoundError(
                f"no published graph store under {graph_path!r}"
            )
        gparams = storectl.params_of(gver) or {}
        gnb = gparams.get("n_buckets", 16)
        storectl.register_bucketed(
            spark, graph_table, gver + "/edges", ["src"], ["src"], gnb
        )
        merged = spark.table(graph_table)
        if gparams.get("delta_appends", 0):
            merged = merge_delta_edges(merged)
        # src-side bucketed scan joins the id-bucketed label store; an
        # edge whose src has NO stored comp is a new vertex's edge —
        # touched by definition (comes from the batch fold). One pass:
        # the (small) touched-comp set broadcasts into a left join and
        # the keep-filter fuses into the same stage — the corpus-sized
        # edge relation is scanned exactly once.
        with_comp = merged.join(
            stored.select(F.col("id").alias("src"), "comp"), "src", "left"
        )
        tc = touched_comps.withColumnRenamed("comp", "_tc")
        sub = (
            with_comp.join(
                F.broadcast(tc), with_comp["comp"] == tc["_tc"], "left"
            )
            .filter(F.col("_tc").isNotNull() | F.col("comp").isNull())
            .select("src", "dst", "w_sum", "w_max")
            .localCheckpoint(eager=True)
        )

        # persisted src-repartition: the LPA loop and the CC pass both
        # re-reference the subgraph every superstep — without the cache
        # each superstep would replay the exchange
        sub_m = sub.repartition(F.col("src")).persist()
        n_sub = sub.count()
        if stats is not None:
            stats["touched_comps"] = touched_comps.count()
            stats["sub_edges"] = n_sub
            stats["total_edges"] = merged.count()
        relabeled = community_detection(
            vertices=None,
            edges=None,
            iterations=iterations,
            delta=delta,
            mirrored=sub_m,
            n_edges=n_sub,
            restore_names=False,
            portable_rounding=portable,
        )
        from scipi_spark.operators import graph as graph_ops

        newcomps = graph_ops.connected_components(
            sub_m.select("src", "dst"), max_iterations=cc_max, strict=True
        )
        refreshed = relabeled.join(
            newcomps.withColumnRenamed("id", "rid"),
            relabeled.id == F.col("rid"),
        ).select("id", "label", "comp")
        untouched = stored.join(
            F.broadcast(touched_comps), "comp", "left_anti"
        ).select("id", "label", "comp")
        folded = untouched.unionByName(refreshed).localCheckpoint(eager=True)
        sub_m.unpersist()

        import shutil

        shutil.rmtree(build + "/labels", ignore_errors=True)
        storectl.write_bucketed(
            folded, build + "/labels", ["id"], ["id"], nb
        )
        meta = storectl.meta_of(cur) or {}
        ver = storectl.publish(
            root,
            build,
            meta.get("build_key", "labels-v1"),
            keep=keep,
            retain_s=retain_s,
            expect_base=os.path.basename(cur),
            params=params,
        )
    storectl.register_bucketed(
        spark, table, ver + "/labels", ["id"], ["id"], nb
    )
    return folded.select("id", "label")


def community_detection_from_store(
    spark,
    table: str = "graph_edges_mirrored",
    iterations: int = 10,
    delta: float = 0.5,
    checkpoint: bool = True,
    portable_rounding: bool = False,
    n_edges: int | None = None,
    path: str | None = None,
    n_buckets: int | None = None,
    merge_deltas: bool = False,
) -> DataFrame:
    """LPA over a persisted bucketed edge store: no extraction, no edge
    aggregation, no edge-side repartition — the loop's message join reads
    the store's bucket partitioning directly. Returns hashed ids
    (``restore_names=False``; a vertex's initial label IS its hashed id,
    so labels are identical to the name-restored variant). ``n_edges``
    defaults to the store's metadata row count (a footer read, no scan).
    ``path``: store root for reading a store written by ANOTHER process
    (resolves the live version via the atomic CURRENT pointer and
    registers ``table`` here); omit when this session wrote it. The
    bucket count self-configures from the resolved version's marker
    (explicit mismatches raise; legacy params-less stores fall back to
    16 or the passed value). A store with outstanding
    :func:`append_graph_store` deltas is collapsed with
    :func:`merge_delta_edges` automatically — an Exchange-free
    aggregate per superstep scan; ``merge_deltas=True`` forces the
    merge for session-registered tables the marker cannot vouch for."""
    if path is not None:
        ver = storectl.current_dir(path.rstrip("/"))
        if ver is None:
            raise FileNotFoundError(
                f"no published graph store under {path!r} — "
                "write_graph_store first"
            )
        stored = storectl.params_of(ver)
        nb = storectl.resolve_params(
            stored, {"n_buckets": n_buckets}, {"n_buckets": 16}
        )["n_buckets"]
        storectl.register_bucketed(
            spark, table, ver + "/edges", ["src"], ["src"], nb
        )
        if (stored or {}).get("delta_appends", 0):
            merge_deltas = True
    mirrored = spark.table(table)
    if merge_deltas:
        mirrored = merge_delta_edges(mirrored)
    if n_edges is None:
        n_edges = mirrored.count()
    return community_detection(
        None,
        None,
        iterations=iterations,
        delta=delta,
        checkpoint=checkpoint,
        mirrored=mirrored,
        n_edges=n_edges,
        restore_names=False,
        portable_rounding=portable_rounding,
    )


def community_detection(
    vertices: DataFrame | None,
    edges: DataFrame | None,
    iterations: int = 10,
    delta: float = 0.5,
    checkpoint: bool = True,
    mirrored: DataFrame | None = None,
    n_edges: int | None = None,
    restore_names: bool = True,
    portable_rounding: bool = False,
) -> DataFrame:
    """C8: Flink-CommunityDetection-equivalent LPA; returns (id, label).

    Each superstep is one hash aggregation (messages by dst,label) + one
    fused argmax aggregation — shuffles on vertex id throughout, so the
    same partitioning is reused stage to stage.

    ``mirrored``: a pre-built :func:`aggregate_undirected` table, already
    repartitioned on ``src`` and persisted (caller-owned lifecycle — it is
    NOT unpersisted here). Passing it lets callers cache the aggregated
    table across invocations so a cold call never materializes the raw
    string-named edge multiset at all. ``n_edges`` (the mirrored-message
    row-count estimate used only for shuffle-partition sizing) must
    accompany it; magnitude, not precision, is what sizing needs.

    ``vertices=None`` (requires ``mirrored`` + ``restore_names=False``):
    seed the label state from the mirrored edge endpoints instead of a
    vertex table — a no-exchange distinct over the src-partitioned edge
    cache, replacing the name-union + groupBy materialization. Isolated
    vertices (no edges) are then absent from the output; they are
    singleton communities, so any size-thresholded consumer is
    unaffected.

    ``restore_names=False`` skips the final hash->name mapping join and
    returns hashed 64-bit ids as ``id``. Because the initial label of a
    vertex IS its hashed id, label values are identical either way —
    only the ``id`` column differs (hash vs original name).

    ``portable_rounding=True`` rounds each per-label message sum to 9
    decimals before the argmax. Message sums are order-dependent in the
    last ulp once score decay introduces non-dyadic values (0.5/3 at
    superstep 3); rounding collapses that, making the fixpoint
    bit-replicable by any engine that sums the same messages in any
    order — the property the portable-label SQL oracle needs. Default
    off: the Flink-exact semantics keep the raw double sums."""
    if vertices is None:
        assert mirrored is not None and not restore_names, (
            "vertices=None requires a pre-built mirrored edge table and "
            "restore_names=False (names cannot be restored without a "
            "vertex table)"
        )
        spark = mirrored.sparkSession
    else:
        spark = vertices.sparkSession
    # Size the per-iteration shuffles to the graph, not the session: on a
    # small graph 64-way stages are pure scheduling overhead (measured 1.7x
    # end-to-end at sf0.1), while a 100TB graph keeps the session setting.
    # The mirrored-edge count is estimated as 2x the raw multiset (exact
    # only without parallel edges) — the estimate avoids materializing the
    # edge pipeline twice (once to count, once to persist).
    # NOTE: the tuned confs are session-level — a concurrent query on the
    # same SparkSession would inherit them for the duration of the loop.
    if n_edges is None:
        n_edges = 2 * edges.count()
    saved_partitions = spark.conf.get("spark.sql.shuffle.partitions")
    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    target = max(8, min(int(saved_partitions), n_edges // 250_000 + 1))
    own_bidir = mirrored is None
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(target))
        # AQE replans every superstep's jobs from scratch; the loop's
        # shuffles are already sized to the graph above, so the replanning
        # is pure per-iteration latency (measured ~10% of the loop at sf0.1).
        spark.conf.set("spark.sql.adaptive.enabled", "false")

        if own_bidir:
            # Repartitioned on the message-join key and persisted once:
            # every superstep joins against it, and the cached hash
            # partitioning means only the (small) label state shuffles per
            # iteration — without this the whole upstream extraction would
            # replay `iterations` times.
            bidir = (
                aggregate_undirected(edges).repartition(F.col("src")).persist()
            )
            bidir.count()
        else:
            bidir = mirrored

        if vertices is None:
            # endpoint distinct over the src-partitioned edge cache (no
            # exchange); a vertex's initial label IS its hashed id, so the
            # seed state needs nothing but the id column
            state_h = (
                bidir.select(F.col("src").alias("id"))
                .distinct()
                .select("id", F.col("id").alias("label"), F.lit(1.0).alias("score"))
            )
        else:
            state_h = initial_labels(vertices).select(
                F.xxhash64("id").alias("id"), "label", "score"
            )
        state_h = _lpa_loop(
            state_h, bidir, iterations, delta, checkpoint, portable_rounding
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved_partitions)
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
    if restore_names:
        mapping = vertices.select("id", F.xxhash64("id").alias("h"))
        result = state_h.join(
            mapping.hint("shuffle_hash"), state_h.id == mapping.h
        ).select(mapping.id, "label")
    else:
        result = state_h.select("id", "label")
    if own_bidir:
        bidir.unpersist()
    return result


def _lpa_loop(
    state: DataFrame,
    bidir: DataFrame,
    iterations: int,
    delta: float,
    checkpoint: bool,
    portable_rounding: bool = False,
) -> DataFrame:
    neg_inf = float("-inf")
    for step in range(1, iterations + 1):
        # shuffle_hash: the state side is far too big to broadcast at real
        # scale but always hash-table-buildable per partition; the hint
        # skips the sort-merge sorts each superstep would otherwise pay.
        msgs = bidir.join(
            state.select(
                F.col("id").alias("src"), F.col("label"), F.col("score")
            ).hint("shuffle_hash"),
            "src",
        ).select(
            F.col("dst").alias("id"),
            "label",
            (F.col("score") * F.col("w_sum")).alias("mscore_sum"),
            (F.col("score") * F.col("w_max")).alias("mscore_max"),
        )
        per_label = msgs.groupBy("id", "label").agg(
            (
                F.round(F.sum("mscore_sum"), 9)
                if portable_rounding
                else F.sum("mscore_sum")
            ).alias("sum_score"),
            F.max("mscore_max").alias("max_single"),
        )
        # Fuse the winner argmax AND the state join into one aggregation:
        # each vertex's current state rides along as a sentinel row with
        # sum_score = -inf — it never beats a real message in the
        # max(struct) (argmax by sum desc, label asc via neg_label), but
        # it carries (old_label, old_score), which max() recovers since
        # exactly one sentinel exists per vertex and real rows hold NULLs.
        # This removes the per-superstep winners->state join entirely:
        # a superstep is now 2 shuffles (message agg, fused argmax).
        cand = per_label.select(
            "id",
            F.struct(
                "sum_score",
                (-F.col("label")).alias("neg_label"),
                "max_single",
            ).alias("s"),
            F.lit(None).cast("long").alias("old_label"),
            F.lit(None).cast("double").alias("old_score"),
        ).unionByName(
            state.select(
                "id",
                F.struct(
                    F.lit(neg_inf).alias("sum_score"),
                    (-F.col("label")).alias("neg_label"),
                    F.lit(None).cast("double").alias("max_single"),
                ).alias("s"),
                F.col("label").alias("old_label"),
                F.col("score").alias("old_score"),
            )
        )
        # Flink's CommunityDetection subtracts delta/superstep from the
        # adopted score ONLY when the label actually changes; a vertex
        # re-confirming its own label keeps the undecayed max message; a
        # vertex with no messages (sentinel wins) keeps its state as-is.
        state = (
            cand.groupBy("id")
            .agg(
                F.max("s").alias("s"),
                F.max("old_label").alias("old_label"),
                F.max("old_score").alias("old_score"),
            )
            .select(
                "id",
                (-F.col("s.neg_label")).alias("label"),
                F.when(F.col("s.max_single").isNull(), F.col("old_score"))
                .when(
                    -F.col("s.neg_label") != F.col("old_label"),
                    F.col("s.max_single") - F.lit(delta) / step,
                )
                .otherwise(F.col("s.max_single"))
                .alias("score"),
            )
        )
        # Checkpoint EVERY superstep: `state` feeds TWO places (the
        # message join and the sentinel union branch), and union branches
        # do not share subplans — an unmaterialized state would execute
        # its whole upstream twice per superstep (measured 12.1s vs 7.3s
        # for the 5-step sf0.1 loop when cutting only every 2nd step).
        if checkpoint:
            state = state.localCheckpoint(eager=True)

    return state


# ---------------------------------------------------------------------------
# C9-C14 — dense communities, subgraph, decoration
# ---------------------------------------------------------------------------

def community_sizes(labels: DataFrame, min_size: int = 1) -> DataFrame:
    """C9: (label, count) for communities with count >= min_size."""
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_size)
    )


def top_communities(sizes: DataFrame, n: int = 3) -> list[int]:
    """C10: labels of the n largest communities (ties -> smallest label),
    collected to the driver — a bounded n-row collect, mirroring the
    reference's mid-plan materialization."""
    rows = sizes.orderBy(F.desc("count"), F.asc("label")).limit(n).collect()
    return [r["label"] for r in rows]


def subgraph_by_labels(
    vertices_typed: DataFrame, edges: DataFrame, labels: DataFrame, keep: list[int]
) -> tuple[DataFrame, DataFrame]:
    """C11/C12/C13: induced subgraph on vertices in the kept communities,
    with entity types restored; edges deduped for output.

    ``kept_v`` is materialized (localCheckpoint): downstream consumes it
    THREE times (both sides of the edge-induction semi-joins here, both
    decoration sides in :func:`decorate_edges`), and without the cut
    each consumer re-executes the full vertex-extraction + label chain —
    measured as the dominant share of c14's 161-Exchange plan (round-9
    verdict #4). The kept subgraph is the filtered community, far
    smaller than the corpus, so the checkpoint is cheap at any scale."""
    kept_v = (
        labels.filter(F.col("label").isin([int(k) for k in keep]))
        .join(vertices_typed, "id")
        .select("id", "vtype", "label")
        .localCheckpoint(eager=True)
    )
    ids = kept_v.select("id")
    kept_e = (
        edges.select("src", "dst")
        .join(ids.withColumnRenamed("id", "src"), "src")
        .join(ids.withColumnRenamed("id", "dst"), "dst")
        .select("src", "dst")
        .distinct()
    )
    return kept_v, kept_e


def decorate_edges(kept_v: DataFrame, kept_e: DataFrame) -> DataFrame:
    """C14: two-step decoration join -> (name_a, type_a, label_a, name_b,
    type_b, label_b)."""
    va = kept_v.select(
        F.col("id").alias("src"),
        F.col("vtype").alias("type_a"),
        F.col("label").alias("label_a"),
    )
    vb = kept_v.select(
        F.col("id").alias("dst"),
        F.col("vtype").alias("type_b"),
        F.col("label").alias("label_b"),
    )
    return (
        kept_e.join(va, "src")
        .join(vb, "dst")
        .select(
            F.col("src").alias("name_a"),
            "type_a",
            "label_a",
            F.col("dst").alias("name_b"),
            "type_b",
            "label_b",
        )
    )


def community_strength(sizes: DataFrame) -> DataFrame:
    """C16: weighted community-strength metric
    (``visualisations.py:658-666``): sum(count * count/total) / 100."""
    total = sizes.agg(F.sum("count").alias("t")).select("t")
    return sizes.crossJoin(total).agg(
        F.round(
            (F.sum(F.col("count") * (F.col("count") / F.col("t"))) / 100.0), 6
        ).alias("strength")
    )
