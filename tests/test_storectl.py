"""Atomic versioned store publication (sources/storectl.py).

Round-7 verdict #1: the old ``mode("overwrite").saveAsTable`` publish
let a second process read a 0-row store mid-rebuild (silent wrong
answer) and a writer crash leave the store half-written forever. These
tests pin the replacement protocol:

- pointer/marker semantics (pure filesystem, no Spark);
- crash windows: an unpublished build is invisible, a dangling CURRENT
  reads as absent;
- build_key gating: a store built with a different recipe is not reused;
- the REAL two-process race: a second engine process probes an ANN
  store in a loop while this process rebuilds it repeatedly — every
  probe must return the full result set (old or new complete version,
  never 0 rows).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

from conftest import REPO, SF_SMOKE

from scipi_spark.sources import storectl


def _write_dummy_version(root, build_key="k1", payload="a", retain_s=None):
    build = storectl.new_build_dir(str(root))
    os.makedirs(os.path.join(build, "data"), exist_ok=True)
    with open(os.path.join(build, "data", "f.txt"), "w") as fh:
        fh.write(payload)
    kw = {} if retain_s is None else {"retain_s": retain_s}
    return storectl.publish(str(root), build, build_key, **kw)


def test_publish_and_resolve(tmp_path):
    root = tmp_path / "store"
    assert storectl.current_dir(str(root)) is None
    ver = _write_dummy_version(root, "k1")
    assert storectl.current_dir(str(root)) == ver
    assert storectl.current_dir(str(root), "k1") == ver
    # different recipe -> treated as absent (forces rebuild)
    assert storectl.current_dir(str(root), "other") is None
    meta = storectl.current_meta(str(root))
    assert meta["build_key"] == "k1"


def test_unpublished_build_is_invisible(tmp_path):
    root = tmp_path / "store"
    ver1 = _write_dummy_version(root, "k1")
    # a second writer stages a build but crashes before publish
    build = storectl.new_build_dir(str(root))
    with open(os.path.join(build, "junk"), "w") as fh:
        fh.write("partial")
    assert storectl.current_dir(str(root)) == ver1  # reader undisturbed


def test_dangling_current_reads_as_absent(tmp_path):
    root = tmp_path / "store"
    _write_dummy_version(root, "k1")
    with open(root / "CURRENT", "w") as fh:
        fh.write("v_999999_deadbeef")  # GC'd / never-completed version
    assert storectl.current_dir(str(root)) is None


def test_missing_marker_reads_as_absent(tmp_path):
    root = tmp_path / "store"
    ver = _write_dummy_version(root, "k1")
    os.remove(os.path.join(ver, storectl.MARKER))
    assert storectl.current_dir(str(root)) is None


def test_publish_gc_keeps_predecessor_and_retention_window(tmp_path):
    root = tmp_path / "store"
    # retain_s=0: GC is purely count-based -> oldest goes immediately
    v1 = _write_dummy_version(root, "k", "one", retain_s=0)
    v2 = _write_dummy_version(root, "k", "two", retain_s=0)
    v3 = _write_dummy_version(root, "k", "three", retain_s=0)
    assert storectl.current_dir(str(root)) == v3
    assert os.path.isdir(v2)  # predecessor retained for in-flight readers
    assert not os.path.isdir(v1)  # beyond keep AND beyond retention
    with open(os.path.join(v3, "data", "f.txt")) as fh:
        assert fh.read() == "three"


def test_publish_gc_respects_retention_window(tmp_path):
    """A version newer than the retention window survives GC even when
    it is beyond the keep count — the guarantee an in-flight reader
    needs (deleting it makes that reader's table silently read empty)."""
    root = tmp_path / "store"
    vers = [_write_dummy_version(root, "k", str(i)) for i in range(4)]
    assert all(os.path.isdir(v) for v in vers)  # all inside the window


def test_version_numbers_monotonic(tmp_path):
    root = tmp_path / "store"
    names = [os.path.basename(_write_dummy_version(root, "k")) for _ in range(3)]
    nums = [int(n[2:8]) for n in names]
    assert nums == sorted(nums) and len(set(nums)) == 3


def test_store_root_env_override(monkeypatch):
    import __spark_entry__ as entrymod

    monkeypatch.setenv("SPARK_GRAFT_STORE_DIR", "/tmp/alt_warehouse")
    assert entrymod._store_root("t1") == "/tmp/alt_warehouse/t1"
    monkeypatch.delenv("SPARK_GRAFT_STORE_DIR")
    assert entrymod._store_root("t1") == str(REPO / "spark-warehouse" / "t1")


_PROBE_SCRIPT = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession, functions as F
    from scipi_spark.operators import similarity

    store, sf = sys.argv[1], sys.argv[2]
    spark = (SparkSession.builder.master("local[2]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.warehouse.dir", sys.argv[3])
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(sf + "/embeddings.parquet")
    probe = emb.filter(F.col("vec_id").isin([1, 2, 3]))
    print("PROBE_READY", flush=True)
    counts = []
    for i in range(8):
        hits = similarity.knn_from_store(
            probe, table="race_ann", k=5, bits=6, tables=4, path=store
        )
        counts.append(hits.count())
    print("COUNTS " + json.dumps(counts), flush=True)

    """
)


def test_two_process_rebuild_race(spark, tmp_path):
    """THE round-7 failure mode, reproduced as a regression test: a
    second process probes while this one rebuilds the store in a tight
    loop. With atomic versioned publish every probe resolves a complete
    version — the full 15-row result every time, never 0."""
    from pyspark.sql import functions as F

    from scipi_spark.operators import similarity

    store = str(tmp_path / "race_store")
    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    similarity.write_ann_store(
        emb, store, table="race_ann_writer", bits=6, tables=4
    )

    script = tmp_path / "probe.py"
    script.write_text(_PROBE_SCRIPT.format(repo=str(REPO)))
    proc = subprocess.Popen(
        [sys.executable, str(script), store, SF_SMOKE, str(tmp_path / "wh2")],
        stdout=subprocess.PIPE,
        stderr=open(tmp_path / "probe_err.log", "w"),
        text=True,
    )
    try:
        # wait for the prober's Spark session, then rebuild continuously
        # underneath it until it finishes its probe loop
        line = proc.stdout.readline()
        while line and "PROBE_READY" not in line:
            line = proc.stdout.readline()
        assert line, "prober died before becoming ready"
        rebuilds = 0
        while proc.poll() is None and rebuilds < 12:
            similarity.write_ann_store(
                emb, store, table="race_ann_writer", bits=6, tables=4
            )
            rebuilds += 1
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rebuilds >= 2, "rebuild loop never overlapped the probes"
    counts_line = [ln for ln in out.splitlines() if ln.startswith("COUNTS ")]
    err_tail = (tmp_path / "probe_err.log").read_text()[-800:]
    assert counts_line, f"prober produced no counts: {out[-300:]} ERR: {err_tail}"
    counts = json.loads(counts_line[0][len("COUNTS "):])
    # 3 queries x k=5 from a complete store; a mid-rebuild read of the
    # old layout returned 0 here
    assert counts == [15] * len(counts), counts


def test_list_versions_ordering_and_completeness(tmp_path):
    root = tmp_path / "store"
    assert storectl.list_versions(str(root)) == []
    v1 = _write_dummy_version(root, "k", "one")
    v2 = _write_dummy_version(root, "k", "two")
    assert storectl.list_versions(str(root)) == [v1, v2]
    # an unpublished build and a marker-less dir are both invisible
    storectl.new_build_dir(str(root))
    os.remove(os.path.join(v1, storectl.MARKER))
    assert storectl.list_versions(str(root)) == [v2]


def test_ann_version_pinning_snapshot_isolation(spark, tmp_path):
    """Time travel: after an append publishes v2, the pinned v1 must
    return exactly the pre-append results (immutability), while CURRENT
    sees the appended vectors."""
    from pyspark.sql import functions as F

    from scipi_spark.operators import similarity

    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    ids = [r[0] for r in emb.select("vec_id").orderBy("vec_id").limit(60).collect()]
    half = ids[len(ids) // 2]
    store = str(tmp_path / "tt_store")
    similarity.write_ann_store(
        emb.filter(F.col("vec_id") < half), store, table="tt_cur",
        bits=6, tables=4,
    )
    probe = emb.filter(F.col("vec_id").isin(ids[-3:]))
    before = set(
        map(tuple, similarity.knn_from_store(
            probe, table="tt_cur", k=5, bits=6, tables=4
        ).collect())
    )
    similarity.append_ann_store(
        emb.filter((F.col("vec_id") >= half) & (F.col("vec_id") < ids[-3])),
        store, table="tt_cur", bits=6, tables=4,
    )
    vers = storectl.list_versions(store)
    assert len(vers) >= 2
    similarity.open_ann_store(spark, store, table="tt_v1", version_dir=vers[0])
    pinned = set(
        map(tuple, similarity.knn_from_store(
            probe, table="tt_v1", k=5, bits=6, tables=4
        ).collect())
    )
    assert pinned == before  # v1 is immutable under the append
    after = set(
        map(tuple, similarity.knn_from_store(
            probe, table="tt_cur", k=5, bits=6, tables=4
        ).collect())
    )
    assert after != before  # CURRENT sees the appended vectors
