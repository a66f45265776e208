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
