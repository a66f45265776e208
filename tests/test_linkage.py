"""Entity-resolution semantics: blocking contract, scoring, and
transitive closure beyond the gate fixture's pair-only components."""

from __future__ import annotations

from scipi_spark.operators import linkage


def test_match_pairs_blocks_and_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "smith john a"),
            (2, "smith john b"),      # matches 1 (jaccard 2/4)
            (3, "smith peter x y"),   # same block, too far (1/6 vs 1)
            (4, "jones john a"),      # different block from 1 entirely
        ],
        "rec_id long, name string",
    )
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in linkage.match_pairs(df, threshold=0.5).collect()
    }
    assert set(out) == {(1, 2)}
    assert out[(1, 2)] == 0.5
    # blocking really prunes: (1,4) share 2/4 tokens but different first
    # token, so the pair is never even scored
    cands = {
        (r["id_a"], r["id_b"])
        for r in linkage.candidate_pairs(df).collect()
    }
    assert (1, 4) not in cands and (1, 2) in cands and (1, 3) in cands


def test_entity_ids_transitive_chain(spark):
    """A matches B, B matches C, A does NOT match C directly — the
    closure must still put all three in one entity (min id), while an
    unmatched record keeps its own id."""
    df = spark.createDataFrame(
        [
            (10, "k aa bb cc"),
            (11, "k aa bb zz"),   # vs 10: 3/5 = 0.6
            (12, "k aa zz yy"),   # vs 11: 3/5; vs 10: 2/6 = 0.33
            (99, "k qq rr ss"),   # singleton
        ],
        "rec_id long, name string",
    )
    matches = linkage.match_pairs(df, threshold=0.5)
    got = {
        (r["id_a"], r["id_b"]) for r in matches.select("id_a", "id_b").collect()
    }
    assert got == {(10, 11), (11, 12)}
    ents = {
        r["rec_id"]: r["entity_id"]
        for r in linkage.entity_ids(df, matches).collect()
    }
    assert ents == {10: 10, 11: 10, 12: 10, 99: 99}


def test_hot_block_cap_bounds_candidate_pairs(spark):
    """Round-10 verdict #2: a frequent first token must not go
    quadratic. 100 planted records share the block token 'hot' (4950
    pairs uncapped); with max_block_size=50 the oversized block is
    dropped WHOLE (the dedup.max_doc_freq recall trade) while normal
    blocks are untouched."""
    from pyspark.sql import functions as F

    hot = spark.range(100).select(
        (F.col("id") + 1000).alias("rec_id"),
        F.concat(F.lit("hot token"), F.col("id").cast("string")).alias("name"),
    )
    normal = spark.createDataFrame(
        [(1, "ok aa bb cc"), (2, "ok aa bb dd"), (3, "zz qq rr ss")],
        "rec_id long, name string",
    )
    df = normal.unionByName(hot)
    uncapped = linkage.candidate_pairs(df).count()
    assert uncapped == 1 + (100 * 99) // 2
    capped = {
        (r["id_a"], r["id_b"])
        for r in linkage.candidate_pairs(df, max_block_size=50).collect()
    }
    assert capped == {(1, 2)}  # hot block gone, normal block intact
    # the cap composes with matching: no hot pair is ever scored
    assert {
        (r["id_a"], r["id_b"])
        for r in linkage.match_pairs(df, threshold=0.5, max_block_size=50).collect()
    } == {(1, 2)}


def test_second_block_recovers_corrupted_first_token(spark):
    """The last-token second blocking pass finds pairs the first-token
    pass misses (corrupted first token), and the union is deduplicated
    (a pair co-blocked under both keys counts once)."""
    df = spark.createDataFrame(
        [
            (1, "x aa bb cc"),
            (2, "y aa bb cc"),   # first tokens differ, last agree; J = 3/5
            (3, "x aa bb cc"),   # same first AND last token as 1; J = 1
        ],
        "rec_id long, name string",
    )
    single = {
        (r["id_a"], r["id_b"])
        for r in linkage.match_pairs(df, threshold=0.5).collect()
    }
    assert single == {(1, 3)}
    both = linkage.match_pairs(df, threshold=0.5, second_block=True)
    rows = both.collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == {(1, 2), (2, 3), (1, 3)}
    assert len(rows) == 3  # (1,3) co-blocks under both keys, counted once


def test_fs_match_pairs_weights_nulls_and_threshold(spark):
    """Fellegi-Sunter per-field scoring: agreement adds log2(m/u),
    disagreement adds log2((1-m)/(1-u)), NULL on either side adds 0;
    the score is the field-ordered sum, thresholded."""
    import math

    df = spark.createDataFrame(
        [
            (1, "k1", "a", "p"),
            (2, "k1", "a", "q"),     # agree f1, f2; disagree f3
            (3, "k1", None, "p"),    # agree f1, f3; f2 null -> 0
            (4, "k2", "a", "p"),     # different block from 1-3
        ],
        "rec_id long, f1 string, f2 string, f3 string",
    )
    m, u = 0.9, 0.1
    aw = math.log2(m / u)
    dw = math.log2((1 - m) / (1 - u))
    out = {
        (r["id_a"], r["id_b"]): r["fs_score"]
        for r in linkage.fs_match_pairs(
            df, ["f1", "f2", "f3"], m, u, threshold=-100.0
        ).collect()
    }
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    assert out[(1, 2)] == round(aw + aw + dw, 6)
    assert out[(1, 3)] == round(aw + 0.0 + aw, 6)
    assert out[(2, 3)] == round(aw + 0.0 + dw, 6)
    # threshold keeps only the strongest pair: (1,3) scores 2*aw (two
    # agreements, the null field contributing nothing)
    kept = linkage.fs_match_pairs(
        df, ["f1", "f2", "f3"], m, u, threshold=(aw + 2 * aw) / 2
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in kept} == {(1, 3)}
    # multi-key blocking unions f1 and f2 blocks and dedups pairs:
    # (1,4) and (2,4) share f2='a' only
    multi = {
        (r["id_a"], r["id_b"])
        for r in linkage.fs_match_pairs(
            df, ["f1", "f2", "f3"], m, u,
            block_cols=["f1", "f2"], threshold=-100.0,
        ).collect()
    }
    assert multi == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)}


def _bridge_records(spark):
    """Corpus with two separate entities {1,2} and {5,6}; batch record
    100 matches a member of EACH (via the second blocking key), so the
    fold must MERGE the stored entities under the global min id."""
    corpus = spark.createDataFrame(
        [
            (1, "aa p q r"),
            (2, "aa p q s"),    # vs 1: 3/5
            (5, "bb p q r"),
            (6, "bb p q t"),    # vs 5: 3/5
            (9, "cc z y x"),    # singleton
        ],
        "rec_id long, name string",
    )
    batch = spark.createDataFrame(
        [(100, "aa p q bb"), (101, "dd only one")],
        "rec_id long, name string",
    )
    return corpus, batch


def test_entity_store_increment_matches_one_shot_closure(spark, tmp_path):
    """er_increment_from_store == one-shot entity_ids over the combined
    records — including the cross-entity MERGE a bridging batch record
    forces — and the store fold persists exactly that state."""
    corpus, batch = _bridge_records(spark)
    spark.sql("DROP TABLE IF EXISTS er_store_t1")
    root = str(tmp_path / "er")
    linkage.write_entity_store(
        corpus, root, table="er_store_t1", threshold=0.5, two_keys=1
    )
    got = {
        r["rec_id"]: r["entity_id"]
        for r in linkage.er_increment_from_store(
            spark, root, batch, table="er_store_t1"
        ).collect()
    }
    combined = corpus.unionByName(batch)
    want = {
        r["rec_id"]: r["entity_id"]
        for r in linkage.entity_ids(
            combined,
            linkage.match_pairs(combined, threshold=0.5, second_block=True),
        ).collect()
    }
    assert got == want
    assert want == {1: 1, 2: 1, 5: 1, 6: 1, 100: 1, 9: 9, 101: 101}

    # fold, then the persisted assignment equals the same closure and a
    # follow-up batch probes against the MERGED state
    linkage.append_entity_store(batch, root, table="er_store_t1")
    stored = {
        r["rec_id"]: r["entity_id"]
        for r in linkage.entity_store_assignment(spark, root).collect()
    }
    assert stored == want
    batch2 = spark.createDataFrame(
        [(200, "bb p q u")], "rec_id long, name string"  # vs 5: 3/5
    )
    got2 = {
        r["rec_id"]: r["entity_id"]
        for r in linkage.er_increment_from_store(
            spark, root, batch2, table="er_store_t1"
        ).collect()
    }
    assert got2[200] == 1  # inherits the merged entity, not 5


def test_entity_store_recipe_mismatch_raises(spark, tmp_path):
    import pytest

    corpus, batch = _bridge_records(spark)
    spark.sql("DROP TABLE IF EXISTS er_store_t2")
    root = str(tmp_path / "er")
    linkage.write_entity_store(
        corpus, root, table="er_store_t2", threshold=0.5, two_keys=1
    )
    with pytest.raises(ValueError, match="store param mismatch"):
        linkage.er_increment_from_store(
            spark, root, batch, table="er_store_t2", threshold=0.7
        )
    with pytest.raises(ValueError, match="store param mismatch"):
        linkage.append_entity_store(
            batch, root, table="er_store_t2", two_keys=0
        )
    # omitted args inherit the recipe
    assert linkage.er_increment_from_store(
        spark, root, batch, table="er_store_t2"
    ).count() == 7


def test_entity_store_probe_is_corpus_shuffle_free(spark, tmp_path):
    """The store's reason to exist: the probe's block join must read
    the bucketed blocks table without an Exchange (differential vs a
    plain-parquet copy of the identical rows)."""
    import re

    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    recs = docs.select(
        F.col("doc_id").alias("rec_id"),
        F.substring("text", 1, 60).alias("name"),
    )
    corpus = recs.filter("rec_id < 300")
    batch = recs.filter("rec_id >= 300")
    spark.sql("DROP TABLE IF EXISTS er_store_plan")
    root = str(tmp_path / "er")
    linkage.write_entity_store(corpus, root, table="er_store_plan", n_buckets=8)
    old = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        batch_rows = linkage._block_rows(
            batch, "rec_id", "name", False, None
        ).select(
            "blk", F.col("rid").alias("brid"), F.col("w").alias("bw")
        ).localCheckpoint(eager=True)
        plain_path = str(tmp_path / "blocks_plain")
        spark.table("er_store_plan").write.mode("overwrite").parquet(plain_path)

        def n_exchanges(index_df):
            probe = batch_rows.join(index_df, "blk")
            jvm = spark._jvm
            plan = probe._jdf.queryExecution().explainString(
                jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            return len(re.findall(r"\(\d+\) Exchange\b", plan)), plan

        n_bucketed, plan_b = n_exchanges(spark.table("er_store_plan"))
        n_plain, _ = n_exchanges(spark.read.parquet(plain_path))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
    assert "Bucketed: true" in plan_b
    assert n_bucketed == n_plain - 1, (n_bucketed, n_plain)


def test_compact_entity_store_repairs_replayed_append(spark, tmp_path):
    """A crash between an append and its fold marker replays the
    append: block rows and id rows land twice. Probe matching survives
    (the candidate join dedups pairs) but the id universe double-counts.
    compact_entity_store drops the duplicates and the store's
    assignment + a follow-up probe are bit-identical to the clean
    store's."""
    import os

    from pyspark.sql import functions as F
    from scipi_spark.sources import storectl

    corpus, batch = _bridge_records(spark)
    spark.sql("DROP TABLE IF EXISTS er_store_cmp")
    root = str(tmp_path / "er")
    linkage.write_entity_store(
        corpus, root, table="er_store_cmp", threshold=0.5, two_keys=1
    )
    clean_assign = {
        (r["rec_id"], r["entity_id"])
        for r in linkage.entity_store_assignment(spark, root).collect()
    }

    # simulate the crash-replayed append: clone the live version, append
    # the SAME block/id rows again, publish (exactly what a replayed
    # append_entity_store does before its marker lands)
    cur = storectl.current_dir(root)
    blocks = spark.read.parquet(cur + "/blocks").localCheckpoint(eager=True)
    ids = spark.read.parquet(cur + "/ids").localCheckpoint(eager=True)
    with storectl.append_lock(root):
        build, cur = storectl.clone_current(root)
        storectl.append_bucketed(
            blocks, build + "/blocks", ["blk"], ["blk"], 16
        )
        ids.write.mode("append").parquet(build + "/ids")
        storectl.publish(
            root, build, "er-v1", expect_base=os.path.basename(cur),
            params=storectl.current_params(root),
        )
    poisoned = linkage.entity_store_assignment(spark, root).count()
    assert poisoned == 2 * len(clean_assign)  # the corruption is real

    linkage.compact_entity_store(spark, root, table="er_store_cmp")
    repaired = {
        (r["rec_id"], r["entity_id"])
        for r in linkage.entity_store_assignment(spark, root).collect()
    }
    assert repaired == clean_assign
    got = {
        r["rec_id"]: r["entity_id"]
        for r in linkage.er_increment_from_store(
            spark, root, batch, table="er_store_cmp"
        ).collect()
    }
    assert got == {1: 1, 2: 1, 5: 1, 6: 1, 100: 1, 9: 9, 101: 101}
