"""The property that justifies hash-based sampling over df.sample:
assignments are a pure function of the key — stable under corpus
growth, repartitioning, and across tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from scipi_spark.operators import sampling


def _docs(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_split_stable_under_corpus_growth(spark):
    small = sampling.dataset_split(_docs(spark, 100), key="doc_id")
    large = sampling.dataset_split(_docs(spark, 200), key="doc_id")
    s = {r["doc_id"]: r["split"] for r in small.collect()}
    l = {r["doc_id"]: r["split"] for r in large.collect()}
    assert all(l[k] == v for k, v in s.items())  # no doc ever moves


def test_split_covers_and_weights_roughly_hold(spark):
    rows = sampling.dataset_split(_docs(spark, 5000), key="doc_id").collect()
    from collections import Counter

    c = Counter(r["split"] for r in rows)
    assert set(c) == {"train", "val", "test"}
    assert sum(c.values()) == 5000
    assert 0.85 < c["train"] / 5000 < 0.95


def test_deterministic_sample_join_consistent(spark):
    a = sampling.deterministic_sample(_docs(spark, 1000), 0.2, key="doc_id")
    b = sampling.deterministic_sample(
        _docs(spark, 1000).withColumn("extra", F.lit(1)), 0.2, key="doc_id"
    )
    ka = {r["doc_id"] for r in a.collect()}
    kb = {r["doc_id"] for r in b.collect()}
    assert ka == kb            # same survivors in any table
    assert 100 < len(ka) < 300  # ~20%


def test_split_unaffected_by_partitioning(spark):
    one = sampling.dataset_split(_docs(spark, 500).coalesce(1), key="doc_id")
    many = sampling.dataset_split(_docs(spark, 500).repartition(16), key="doc_id")
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))
