"""Thin SQL API + salted-aggregation tests."""

from __future__ import annotations

from scipi_spark import api
from scipi_spark.operators import analytics
from scipi_spark.sources.tables import publications_analog
from tests.conftest import SF_SMOKE


def test_open_session_sql_surface(spark):
    api.open_session(SF_SMOKE, spark)
    out = api.sql(
        spark,
        """
        SELECT r_name, count(*) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """,
    ).collect()
    assert len(out) == 5
    assert sum(r["n"] for r in out) == 25

    pubs = api.sql(spark, "SELECT count(*) AS n FROM publications").collect()
    assert pubs[0]["n"] > 0

    ev = api.sql(spark, "SELECT min(ts) AS t FROM events").collect()
    assert ev[0]["t"] is not None  # nanos handled by the registered view


def test_salted_equals_plain(spark):
    pubs = publications_analog(spark, SF_SMOKE)
    plain = sorted(map(tuple, analytics.keyword_count(pubs).collect()))
    salted = sorted(map(tuple, analytics.keyword_count_salted(pubs).collect()))
    assert plain == salted


def test_count_min_sketch_bounds_and_collisions(spark):
    """CMS one-sided guarantee: estimate >= exact for EVERY key, with
    equality when the width is collision-free and strict overcounts under
    forced collision pressure (width 2 << key cardinality)."""
    from pyspark.sql import functions as F

    pubs = publications_analog(spark, SF_SMOKE)
    items = pubs.select(F.explode("keywords").alias("keyword_name"))
    exact = {
        r["keyword_name"]: r["keyword_count"]
        for r in analytics.keyword_count(pubs).collect()
    }
    keys = spark.createDataFrame([(k,) for k in exact], "key string")

    wide = analytics.count_min_sketch(items, depth=4, width=4096)
    est_wide = {
        r["key"]: r["cms_est"]
        for r in analytics.cms_estimate(wide, keys, depth=4, width=4096).collect()
    }
    assert est_wide == exact  # 25 keys in 4096 buckets: no collisions

    narrow = analytics.count_min_sketch(items, depth=2, width=2)
    est_narrow = {
        r["key"]: r["cms_est"]
        for r in analytics.cms_estimate(narrow, keys, depth=2, width=2).collect()
    }
    assert all(est_narrow[k] >= exact[k] for k in exact)
    assert any(est_narrow[k] > exact[k] for k in exact)  # collisions occurred
    assert sum(exact.values()) >= max(est_narrow.values())  # bounded by N


def test_bloom_no_false_negatives_and_fp_pressure(spark):
    """Bloom guarantee: EVERY inserted key probes true, at any width;
    a deliberately tiny filter (m_bits=8) still has zero false negatives
    while absent keys mostly collide to true (false positives)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    items = docs.select(F.col("doc_id").cast("string").alias("key"))
    n = items.count()
    for m_bits in (8, 4096):
        bloom = analytics.bloom_build(items, m_bits=m_bits, k_hashes=4)
        got = {
            r["key"]: r["might_contain"]
            for r in analytics.bloom_might_contain(
                bloom, items, m_bits=m_bits, k_hashes=4
            ).collect()
        }
        assert len(got) == n and all(got.values())
    absent = spark.createDataFrame(
        [(f"nope:{i}",) for i in range(50)], "key string"
    )
    tiny = analytics.bloom_build(items, m_bits=8, k_hashes=4)
    fp = {
        r["key"]: r["might_contain"]
        for r in analytics.bloom_might_contain(
            tiny, absent, m_bits=8, k_hashes=4
        ).collect()
    }
    assert sum(fp.values()) > 40  # 8-bit filter over 50 keys: saturated


def test_quality_percentile_keep_frac_is_per_source(spark):
    """keep_frac keeps the top fraction of EACH source — the whole point
    vs a global cutoff."""
    from scipi_spark.operators import textops

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    kept = textops.quality_percentile(docs, keep_frac=0.4)
    per_src = {r["grp"]: r["n"] for r in kept.groupBy("grp").count()
               .withColumnRenamed("count", "n").collect()}
    totals = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    assert set(per_src) == set(totals)
    for src, tot in totals.items():
        # percent_rank >= 0.6 keeps ~40% of each source (exact count
        # depends on rank granularity; bounded within 2 of the target)
        assert abs(per_src[src] - 0.4 * (tot - 1) - 1) <= 2, (src, per_src[src], tot)


def test_sketches_merge_exactly(spark):
    """The scale claim behind both sketches: CMS sketches of two corpus
    halves merge by cell-wise ADDITION into exactly the full-corpus
    sketch; Bloom bit sets merge by DISTINCT UNION into exactly the
    full-corpus filter."""
    from pyspark.sql import functions as F

    pubs = publications_analog(spark, SF_SMOKE)
    items = pubs.select(
        F.explode("keywords").alias("keyword_name"),
        (F.col("doi").cast("long") % 2).alias("half"),
    )
    full = analytics.count_min_sketch(items)
    halves = [
        analytics.count_min_sketch(items.filter(F.col("half") == h))
        for h in (0, 1)
    ]
    merged = (
        halves[0].unionByName(halves[1])
        .groupBy("d", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    as_map = lambda df: {(r["d"], r["bucket"]): r["c"] for r in df.collect()}  # noqa: E731
    assert as_map(merged) == as_map(full)

    keys = items.select(F.col("keyword_name").alias("key"), "half")
    bfull = analytics.bloom_build(keys)
    bmerged = (
        analytics.bloom_build(keys.filter(F.col("half") == 0))
        .unionByName(analytics.bloom_build(keys.filter(F.col("half") == 1)))
        .distinct()
    )
    bits = lambda df: {r["bit"] for r in df.collect()}  # noqa: E731
    assert bits(bmerged) == bits(bfull)
