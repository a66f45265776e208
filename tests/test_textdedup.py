"""Text-analysis + dedup operator tests: synthetic fixtures with planted
exact/near duplicates, plus a MinHash-LSH recall measurement against the
exact n-gram Jaccard pairs on the real documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from scipi_spark.operators import dedup, textops
from tests.conftest import SF_SMOKE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_shingles_edges(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d"),
            (2, "a b"),  # shorter than k -> empty
            (3, "  x   y  z "),  # messy whitespace
            (4, "a b c a b c"),  # repeated shingles dedup
        ],
    )
    got = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", textops.word_shingles("text", 3).alias("sh")).collect()
    }
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == []
    assert got[3] == ["x y z"]
    assert got[4] == ["a b c", "b c a", "c a b"]


def test_exact_dup_groups_and_dedup(spark):
    df = _docs(
        spark,
        [
            (1, "hello world foo"),
            (2, "Hello   WORLD foo"),  # same after normalization
            (3, "different text entirely"),
            (4, "hello world foo"),
        ],
    )
    groups = dedup.exact_dup_groups(df).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 3
    assert groups[0]["canonical_id"] == 1

    kept = sorted(r["doc_id"] for r in dedup.dedup_exact(df).collect())
    assert kept == [1, 3]


def test_ngram_jaccard_identical_docs(spark):
    df = _docs(
        spark,
        [
            (1, "w1 w2 w3 w4 w5 w6"),
            (2, "w1 w2 w3 w4 w5 w6"),  # identical -> jaccard 1.0
            (3, "w1 w2 w3 w4 w5 zz"),  # 3 of 4 shingles shared with 1
            (4, "completely other words here now"),
        ],
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.1).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # docs 1,3: shingles of 1 = {123,234,345,456}, of 3 = {123,234,345,45z}
    # inter=3, union=5 -> 0.6
    assert pairs[(1, 3)] == 0.6
    assert (1, 4) not in pairs


def test_minhash_recall_vs_exact(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, num_perm=64, bands=16, threshold=0.3
        ).collect()
    }
    assert exact, "fixture should contain near-duplicates"
    # verification makes precision exact
    assert lsh <= exact
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_simhash_identical_and_blocking(spark):
    df = _docs(
        spark,
        [
            (1, "spark query engine fast scan"),
            (2, "spark query engine fast scan"),
            (3, "zebra yak xylophone walrus vulture"),
        ],
    )
    pairs = dedup.simhash_pairs(df, k=1, max_hamming=3).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 2)}
    assert pairs[0]["hamming"] == 0


def test_quality_features_shape(spark):
    df = _docs(spark, [(1, "the quick brown fox"), (2, "zz")])
    out = {r["doc_id"]: r for r in textops.quality_features(df).collect()}
    assert out[1]["q_n_tokens"] == 4
    assert 0.0 <= out[1]["q_score"] <= 1.0
    assert out[1]["q_stopword_ratio"] == 0.25
    assert out[2]["q_stopword_ratio"] == 0.0


def test_lang_id(spark):
    df = _docs(
        spark,
        [(1, "the cat sat on the mat and looked at a bird"), (2, "xx yy zz qq")],
    )
    got = {r["doc_id"]: r["l"] for r in df.select(
        "doc_id", textops.lang_id("text").alias("l")).collect()}
    assert got[1] == "en"
    assert got[2] == "unknown"
