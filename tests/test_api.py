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
