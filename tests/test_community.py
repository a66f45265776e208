"""Community module tests (C1-C16): extraction semantics (incl. the
last-author quirk), and the LPA loop vs a pure-Python replication of
Flink's CommunityDetection on a planted-partition co-authorship graph."""

from __future__ import annotations

import itertools
import random
from collections import defaultdict

from pyspark.sql import functions as F

from scipi_spark.operators import community as comm

PUB_SCHEMA = (
    "title string, publisher string, venue string, authors array<string>, "
    "keywords array<string>, fos array<string>"
)


def _pubs(spark):
    rows = [
        ("p1", "acm", "kdd", ["a1", "a2", "a3"], ["graph"], ["cs"]),
        ("p2", None, "kdd", ["a2"], ["ml"], ["cs"]),
        ("p3", "acm", None, ["a4", "a5"], ["db"], ["bio"]),
    ]
    return spark.createDataFrame(rows, PUB_SCHEMA)


def test_relevance_filter(spark):
    pubs = _pubs(spark)
    assert comm.relevance_filter(pubs, keywords=["graph"]).count() == 1
    assert comm.relevance_filter(pubs, domains=["cs"]).count() == 2
    assert comm.relevance_filter(pubs, keywords=["db"], domains=["cs"]).count() == 3
    assert comm.relevance_filter(pubs).count() == 3


def test_extract_vertices(spark):
    got = {
        (r["id"], r["vtype"]) for r in comm.extract_vertices(_pubs(spark)).collect()
    }
    assert ("p1", "PAPER") in got
    assert ("acm", "PUBLISHER") in got
    assert ("kdd", "VENUE") in got
    assert ("a1", "AUTHOR") in got
    assert len(got) == 3 + 1 + 1 + 5  # papers + acm + kdd + authors


def test_extract_edges_last_author_quirk(spark):
    edges = [
        (r["src"], r["dst"]) for r in comm.extract_edges(_pubs(spark)).collect()
    ]
    # paper->publisher/venue
    assert ("p1", "acm") in edges and ("p1", "kdd") in edges
    assert ("p2", "kdd") in edges
    # author->paper: a1,a2 yes; a3 (last of 3) NO
    assert ("a1", "p1") in edges and ("a2", "p1") in edges
    assert ("a3", "p1") not in edges
    # single author gets the edge
    assert ("a2", "p2") in edges
    # two authors: first yes, last no
    assert ("a4", "p3") in edges and ("a5", "p3") not in edges
    # all co-author pairs i<j
    assert ("a1", "a2") in edges and ("a1", "a3") in edges and ("a2", "a3") in edges
    assert ("a4", "a5") in edges


# ---------------------------------------------------------------------------
# pure-Python replication of Flink CommunityDetection (scatter-gather)
# ---------------------------------------------------------------------------

def _lpa_py(init_labels, edges, iterations, delta):
    """init_labels: {id: int}; edges: multiset of (src, dst, weight)."""
    out_neighbors = defaultdict(list)
    for s, d, w in edges:
        out_neighbors[s].append((d, w))
        out_neighbors[d].append((s, w))
    label = dict(init_labels)
    score = {v: 1.0 for v in init_labels}
    for step in range(1, iterations + 1):
        sums = defaultdict(float)
        maxs = {}
        for v in init_labels:
            for (nbr, w) in out_neighbors[v]:
                m = score[v] * w
                sums[(nbr, label[v])] += m
                key = (nbr, label[v])
                if key not in maxs or m > maxs[key]:
                    maxs[key] = m
        new_label, new_score = {}, {}
        by_vertex = defaultdict(list)
        for (v, lbl), s in sums.items():
            by_vertex[v].append((lbl, s))
        for v, lblscores in by_vertex.items():
            # max sum, ties -> smallest label
            best = sorted(lblscores, key=lambda t: (-t[1], t[0]))[0][0]
            new_label[v] = best
            # Flink decays the score only when the label changes
            penalty = delta / step if best != label[v] else 0.0
            new_score[v] = maxs[(v, best)] - penalty
        for v in init_labels:
            if v in new_label:
                label[v], score[v] = new_label[v], new_score[v]
    return label


def test_lpa_matches_python_reference(spark):
    rng = random.Random(7)
    # planted partition: 3 communities of 12, dense intra, sparse inter
    communities = [[f"c{c}v{i}" for i in range(12)] for c in range(3)]
    edges = []
    for c in communities:
        for a, b in itertools.combinations(c, 2):
            if rng.random() < 0.6:
                edges.append((a, b, 1.0))
    allv = [v for c in communities for v in c]
    for _ in range(5):
        a, b = rng.sample(allv, 2)
        edges.append((a, b, 1.0))

    vdf = spark.createDataFrame([(v,) for v in allv], "id string")
    edf = spark.createDataFrame(edges, "src string, dst string, weight double")
    got = {
        r["id"]: r["label"]
        for r in comm.community_detection(vdf, edf, iterations=10, delta=0.5).collect()
    }

    init = {
        r["id"]: r["label"]
        for r in vdf.select("id", F.xxhash64("id").alias("label")).collect()
    }
    want = _lpa_py(init, edges, iterations=10, delta=0.5)
    assert got == want
    # sanity: intra-community agreement dominates
    for c in communities:
        labels = [got[v] for v in c]
        majority = max(set(labels), key=labels.count)
        assert labels.count(majority) >= len(c) // 2


def test_dense_communities_and_decoration(spark):
    pubs = _pubs(spark)
    vertices = comm.extract_vertices(pubs)
    edges = comm.extract_edges(pubs)
    labels = comm.community_detection(vertices, edges, iterations=5, delta=0.5)
    sizes = comm.community_sizes(labels, min_size=2)
    top = comm.top_communities(sizes, n=2)
    assert len(top) <= 2
    kept_v, kept_e = comm.subgraph_by_labels(vertices, edges, labels, top)
    dec = comm.decorate_edges(kept_v, kept_e)
    assert set(dec.columns) == {
        "name_a", "type_a", "label_a", "name_b", "type_b", "label_b"
    }
    # every decorated edge endpoint is in a kept community
    kept_ids = {r["id"] for r in kept_v.collect()}
    for r in dec.collect():
        assert r["name_a"] in kept_ids and r["name_b"] in kept_ids


def test_community_strength(spark):
    sizes = spark.createDataFrame(
        [(1, 10), (2, 30)], "label long, count long"
    )
    got = comm.community_strength(sizes).collect()[0]["strength"]
    # total=40; sum(10*10/40 + 30*30/40)/100 = (2.5+22.5)/100 = 0.25
    assert got == 0.25


def test_extract_edges_hashed_equivalence(spark):
    """extract_edges_hashed must equal extract_edges followed by
    xxhash64 on both endpoints — same multiset, weights included."""
    pubs = _pubs(spark)
    via_strings = sorted(
        map(
            tuple,
            comm.extract_edges(pubs)
            .select(
                F.xxhash64("src").alias("src"),
                F.xxhash64("dst").alias("dst"),
                "weight",
            )
            .collect(),
        )
    )
    direct = sorted(map(tuple, comm.extract_edges_hashed(pubs).collect()))
    assert direct == via_strings


def test_lpa_endpoint_seed_matches_vertex_seed(spark):
    """vertices=None + restore_names=False must produce the same
    community-size histogram as the named path (every vertex here has an
    edge, so no isolated-vertex divergence)."""
    pubs = _pubs(spark)
    vertices = comm.extract_vertices(pubs)
    edges = comm.extract_edges(pubs)
    named = comm.community_detection(vertices, edges, iterations=3, delta=0.5)
    mirrored = (
        comm.aggregate_undirected_hashed(comm.extract_edges_hashed(pubs))
        .repartition(2, F.col("src"))
        .persist()
    )
    hashed = comm.community_detection(
        vertices=None,
        edges=None,
        iterations=3,
        delta=0.5,
        mirrored=mirrored,
        n_edges=edges.count() * 2,
        restore_names=False,
    )
    hist = lambda df: sorted(
        r["count"]
        for r in df.groupBy("label").agg(F.count(F.lit(1)).alias("count")).collect()
    )
    # labels are xxhash64(name) in both paths, so full (label, size)
    # equality holds, not just the histogram
    named_sizes = sorted(
        map(tuple, comm.community_sizes(named, min_size=1).collect())
    )
    hashed_sizes = sorted(
        map(tuple, comm.community_sizes(hashed, min_size=1).collect())
    )
    assert named_sizes == hashed_sizes
    assert hist(named) == hist(hashed)
    mirrored.unpersist()


def test_graph_store_lpa_matches_direct(spark, tmp_path):
    """LPA over the persisted bucketed edge store equals LPA over the
    directly-built mirrored table (labels are identical, not just
    histogram-equal), and the store's message join consumes the bucket
    partitioning with NO edge-side Exchange."""
    import re

    pubs = _pubs(spark)
    edges = comm.extract_edges(pubs)
    comm.write_graph_store(
        edges, str(tmp_path / "graph_store"), table="t_graph_store", n_buckets=4
    )
    try:
        store_lpa = comm.community_detection_from_store(
            spark, table="t_graph_store", iterations=3, delta=0.5
        )
        mirrored = (
            comm.aggregate_undirected_hashed(comm.extract_edges_hashed(pubs))
            .repartition(2, F.col("src"))
            .persist()
        )
        direct = comm.community_detection(
            vertices=None,
            edges=None,
            iterations=3,
            delta=0.5,
            mirrored=mirrored,
            n_edges=edges.count() * 2,
            restore_names=False,
        )
        assert sorted(map(tuple, store_lpa.collect())) == sorted(
            map(tuple, direct.collect())
        )
        mirrored.unpersist()

        # plan evidence: the message join runs with ZERO Exchange — the
        # store scan carries the bucket partitioning, and the state seed
        # (derived from the store's endpoints) inherits it, so neither
        # side shuffles at all
        stored = spark.table("t_graph_store")
        state = stored.select(F.col("src").alias("id")).distinct().select(
            "id", F.col("id").alias("label"), F.lit(1.0).alias("score")
        )
        msgs = stored.join(
            state.select(
                F.col("id").alias("src"), F.col("label"), F.col("score")
            ).hint("shuffle_hash"),
            "src",
        )
        jvm = msgs.sparkSession._jvm
        plan = msgs._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 0
        assert "Bucketed: true" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_graph_store")


def test_community_pipeline_composed_lifecycle(spark):
    """The composed C1->C14 gate row (entry `community_pipeline`): the
    poison cross-community publication must be dropped by C1 (if it
    survived, all 34 planted components would merge into one and the
    top-3 cut would collapse); LPA converges to one label per component;
    the decorated output is exactly the top-3 components' edges."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    pubs = entrymod._planted_pipeline_pubs(spark, sf)
    # 34 planted + 1 noise
    assert pubs.count() == 35
    relevant = comm.relevance_filter(
        pubs, keywords=["planted"], domains=["graphs"]
    )
    assert relevant.filter(F.col("title") == "noisepaper").count() == 0
    assert relevant.count() == 34

    out = entrymod._q_community_pipeline(spark, sf).collect()
    # component sizes 16/14/12 -> edge counts 92/67/46 (2 + (a-1) + C(a,2)
    # for a = 13/11/9 authors)
    assert len(out) == 92 + 67 + 46
    by_comm = defaultdict(int)
    for r in out:
        assert r["community_a"] == r["community_b"]  # components disjoint
        by_comm[r["community_a"]] += 1
    assert by_comm == {"paper0": 92, "paper1": 67, "paper2": 46}
    types = {(r["type_a"], r["type_b"]) for r in out}
    # every edge family of C4 appears decorated: paper->pub, paper->ven,
    # author->paper, author co-authorship
    assert types == {
        ("PAPER", "PUBLISHER"),
        ("PAPER", "VENUE"),
        ("AUTHOR", "PAPER"),
        ("AUTHOR", "AUTHOR"),
    }
    # the last-author quirk: per component, author->paper edges = n-1
    ap = [r for r in out if r["type_a"] == "AUTHOR" and r["type_b"] == "PAPER"]
    ap_by = defaultdict(int)
    for r in ap:
        ap_by[r["community_a"]] += 1
    assert ap_by == {"paper0": 12, "paper1": 10, "paper2": 8}


def test_graph_store_append_fold_matches_rebuild(spark, tmp_path):
    """Round-12: the graph-store fold. Build the store from slice A,
    fold slice B in via append_graph_store (partial aggregated rows),
    and the merged relation — and the LPA labels over it — must be
    bit-identical to a from-scratch write_graph_store over A union B.
    Also pins: the merge aggregate over the bucketed scan is
    Exchange-free, compaction rewrites the store one-row-per-pair and
    resets the delta counter, and a recipe-mismatched append raises."""
    import re

    import pytest

    from scipi_spark.sources import storectl

    # slices share the (a1, a2) co-author pair (and a4's self-pub in B
    # adds a fresh vertex), so the fold really exercises partial-row
    # merging, not just disjoint appends
    slice_a = spark.createDataFrame(
        [
            ("p1", "acm", "kdd", ["a1", "a2", "a3"], ["graph"], ["cs"]),
            ("p2", None, "kdd", ["a2"], ["ml"], ["cs"]),
        ],
        PUB_SCHEMA,
    )
    slice_b = spark.createDataFrame(
        [
            ("p3", "acm", None, ["a1", "a2"], ["db"], ["bio"]),
            ("p4", "mit", "vldb", ["a4", "a5"], ["db"], ["bio"]),
        ],
        PUB_SCHEMA,
    )
    pubs = slice_a.unionByName(slice_b)
    edges_a = comm.extract_edges(slice_a)
    edges_b = comm.extract_edges(slice_b)
    root = str(tmp_path / "gstore")
    full_root = str(tmp_path / "gfull")
    for t in ("t_gs_app", "t_gs_full"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        comm.write_graph_store(edges_a, root, table="t_gs_app", n_buckets=4)
        comm.append_graph_store(edges_b, root, table="t_gs_app")
        comm.write_graph_store(
            comm.extract_edges(pubs), full_root, table="t_gs_full",
            n_buckets=4,
        )
        # relation-level bit-identity: merged delta rows == rebuild
        merged = sorted(
            map(tuple, comm.merge_delta_edges(spark.table("t_gs_app")).collect())
        )
        rebuilt = sorted(map(tuple, spark.table("t_gs_full").collect()))
        assert merged == rebuilt
        # the store really holds delta rows before compaction
        assert spark.table("t_gs_app").count() > len(merged)

        # the merge aggregate consumes the bucket partitioning: no
        # Exchange anywhere in its plan
        plan = comm.merge_delta_edges(
            spark.table("t_gs_app")
        )._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 0
        assert "Bucketed: true" in plan

        # LPA from the appended store (auto-merge via the marker) ==
        # LPA from the rebuilt store
        lpa_app = comm.community_detection_from_store(
            spark, table="t_gs_app", iterations=3, delta=0.5, path=root
        )
        lpa_full = comm.community_detection_from_store(
            spark, table="t_gs_full", iterations=3, delta=0.5, path=full_root
        )
        assert sorted(map(tuple, lpa_app.collect())) == sorted(
            map(tuple, lpa_full.collect())
        )

        # recipe mismatch raises; recipe inheritance works
        with pytest.raises(ValueError, match="param mismatch"):
            comm.append_graph_store(
                edges_b, root, table="t_gs_app", n_buckets=8
            )

        # compaction: one row per pair, delta counter reset, relation
        # unchanged, and the next from_store call reads it direct
        comm.compact_graph_store(spark, root, table="t_gs_app")
        assert sorted(map(tuple, spark.table("t_gs_app").collect())) == rebuilt
        ver = storectl.current_dir(root)
        assert (storectl.params_of(ver) or {}).get("delta_appends") == 0
        lpa_compacted = comm.community_detection_from_store(
            spark, table="t_gs_app", iterations=3, delta=0.5, path=root
        )
        assert sorted(map(tuple, lpa_compacted.collect())) == sorted(
            map(tuple, lpa_full.collect())
        )
    finally:
        for t in ("t_gs_app", "t_gs_full"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_label_store_incremental_relabel(spark, tmp_path):
    """Round-12: touched-component-only re-labeling. Slice A holds two
    DISJOINT communities; the batch touches only the first (plus a
    brand-new vertex pair). refresh_label_store must (1) produce the
    identical full label set as re-running LPA over the merged store,
    and (2) actually SKIP the untouched component — the subgraph edge
    count is strictly below the merged total (the stats out-param)."""
    slice_a = spark.createDataFrame(
        [
            ("p1", None, "v1", ["a1", "a2", "a3"], ["x"], ["cs"]),
            ("p2", None, "v1", ["a2", "a3"], ["x"], ["cs"]),
            ("p3", None, "v2", ["b1", "b2"], ["x"], ["cs"]),
            ("p4", None, "v2", ["b2", "b3"], ["x"], ["cs"]),
        ],
        PUB_SCHEMA,
    )
    batch = spark.createDataFrame(
        [
            ("p5", None, "v1", ["a1", "a4"], ["x"], ["cs"]),
            ("p6", None, "v9", ["c1", "c2"], ["x"], ["cs"]),
        ],
        PUB_SCHEMA,
    )
    groot = str(tmp_path / "graph")
    lroot = str(tmp_path / "labels")
    for t in ("t_rl_graph", "t_rl_labels"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        comm.write_graph_store(
            comm.extract_edges(slice_a), groot, table="t_rl_graph", n_buckets=4
        )
        comm.write_label_store(
            spark, groot, lroot, graph_table="t_rl_graph",
            table="t_rl_labels", iterations=3, n_buckets=4,
        )
        agg_b = comm.aggregate_undirected(comm.extract_edges(batch))
        comm.append_graph_store(
            None, groot, table="t_rl_graph", mirrored=agg_b
        )
        stats = {}
        folded = comm.refresh_label_store(
            spark, groot, lroot, agg_b,
            graph_table="t_rl_graph", table="t_rl_labels", stats=stats,
        )
        full = comm.community_detection_from_store(
            spark, table="t_rl_graph", iterations=3, delta=0.5, path=groot
        )
        assert sorted(map(tuple, folded.collect())) == sorted(
            map(tuple, full.collect())
        )
        # the untouched b-community was never re-entered: the subgraph
        # is strictly smaller than the merged graph, and exactly one
        # stored component was touched
        assert stats["touched_comps"] == 1
        assert 0 < stats["sub_edges"] < stats["total_edges"]
        # the persisted store itself holds the folded labels (a second
        # read sees them without recompute)
        stored = spark.table("t_rl_labels").select("id", "label")
        assert sorted(map(tuple, stored.collect())) == sorted(
            map(tuple, full.collect())
        )
    finally:
        for t in ("t_rl_graph", "t_rl_labels"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
