"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator from SURVEY.md §2 (plus the
north-star LLM-pipeline operators) to a callable ``(spark, sf_dir) ->
DataFrame``; ``oracle_sql()`` gives the DuckDB-equivalent SQL for each
(omitted only for genuinely non-SQL-expressible ops, which get a rows-only
check). Column names and types are aligned on both sides.

SciPi's publication-domain pipelines run here against the
publications-analog mapping of the TPC-H-ish test tables (one order = one
publication; see ``scipi_spark/sources/tables.py``) so the DuckDB oracle can
verify them on the same parquet inputs. The same library functions run
unchanged over real publication corpora (see ``tests/test_ingest.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from scipi_spark.operators import analytics
from scipi_spark.sources.tables import publications_analog

# Analog-scale parameters: the reference thresholds (hyper>=100 authors)
# target 154M-paper corpora; the analog corpus has <=7 "authors" per record.
HYPER_THRESHOLD = 5
TOPICS_MIN_COUNT = 2000
V1_CUTOFF = 4


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: P7 keyword count over the sf0.001 publications analog."""
    pubs = publications_analog(spark, "/root/testdata/sf0.001")
    return analytics.keyword_count(pubs)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_p7(spark, sf_dir):
    return analytics.keyword_count(publications_analog(spark, sf_dir))


def _q_p8(spark, sf_dir):
    return analytics.fos_count(publications_analog(spark, sf_dir))


def _q_p9(spark, sf_dir):
    return analytics.yrwise_dist(publications_analog(spark, sf_dir))


def _q_p10(spark, sf_dir):
    return analytics.authorship_pattern(publications_analog(spark, sf_dir))


def _q_p11(spark, sf_dir):
    return analytics.avg_authors_per_paper(publications_analog(spark, sf_dir))


def _q_p12(spark, sf_dir):
    return analytics.hyper_authorship(
        publications_analog(spark, sf_dir), threshold=HYPER_THRESHOLD
    )


def _q_t1(spark, sf_dir):
    counts = analytics.keyword_count(publications_analog(spark, sf_dir))
    return analytics.topics_filter(counts, "keyword_count", TOPICS_MIN_COUNT)


def _q_v1(spark, sf_dir):
    ap = analytics.authorship_pattern(publications_analog(spark, sf_dir))
    return analytics.authorship_pattern_table(ap, cutoff=V1_CUTOFF)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "p7_keyword_count": _q_p7,
        "p8_fos_count": _q_p8,
        "p9_yrwise_dist": _q_p9,
        "p10_authorship_pattern": _q_p10,
        "p11_avg_authors_per_paper": _q_p11,
        "p12_hyper_authorship": _q_p12,
        "t1_topics_filter": _q_t1,
        "v1_authorship_pattern_table": _q_v1,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL over the raw parquet views)
# ---------------------------------------------------------------------------

# Publications-analog prelude: one order = one publication; authors = the
# order's distinct suppliers; keywords/fos = distinct part brand/type.
_PUBS_CTE = """
WITH per_order AS (
  SELECT l.l_orderkey AS okey,
         CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS n_authors
  FROM lineitem l
  GROUP BY 1
),
pubs AS (
  SELECT o.o_orderkey,
         CAST(year(o.o_orderdate) AS VARCHAR) AS year,
         p.n_authors
  FROM orders o JOIN per_order p ON o.o_orderkey = p.okey
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "p7_keyword_count": """
            SELECT p.p_brand AS keyword_name,
                   CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS keyword_count
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        "p8_fos_count": """
            SELECT p.p_type AS field_study_name,
                   CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS field_study_count
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        "p9_yrwise_dist": _PUBS_CTE
        + """
            SELECT year,
                   count(*) FILTER (WHERE n_authors = 1) AS single,
                   count(*) FILTER (WHERE n_authors > 1) AS joint,
                   count(*) FILTER (WHERE n_authors = 1)
                     + count(*) FILTER (WHERE n_authors > 1) AS total,
                   CAST(count(*) FILTER (WHERE n_authors = 1) AS DOUBLE)
                     / count(*) AS single_perc,
                   CAST(count(*) FILTER (WHERE n_authors > 1) AS DOUBLE)
                     / count(*) AS joint_perc
            FROM pubs
            GROUP BY year
        """,
        "p10_authorship_pattern": _PUBS_CTE
        + """
            SELECT n_authors AS author_unit,
                   count(*) AS no_articles,
                   n_authors * count(*) AS no_authors
            FROM pubs
            GROUP BY 1
        """,
        "p11_avg_authors_per_paper": _PUBS_CTE
        + """
            SELECT year,
                   count(*) AS no_articles,
                   CAST(sum(n_authors) AS BIGINT) AS no_authors,
                   CAST(sum(n_authors) AS DOUBLE) / count(*) AS avg_author_paper
            FROM pubs
            GROUP BY year
        """,
        "p12_hyper_authorship": _PUBS_CTE
        + f"""
            SELECT year AS hyper_authorship_year,
                   count(*) AS hyper_authorship_count
            FROM pubs
            WHERE n_authors >= {HYPER_THRESHOLD}
            GROUP BY year
        """,
        "t1_topics_filter": f"""
            SELECT * FROM (
              SELECT p.p_brand AS keyword_name,
                     CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS keyword_count
              FROM lineitem l
              JOIN part p ON l.l_partkey = p.p_partkey
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              GROUP BY 1
            ) WHERE keyword_count >= {TOPICS_MIN_COUNT}
        """,
        "v1_authorship_pattern_table": _PUBS_CTE
        + f"""
            , ap AS (
              SELECT n_authors AS author_unit,
                     count(*) AS no_articles,
                     n_authors * count(*) AS no_authors
              FROM pubs GROUP BY 1
            ), b AS (
              SELECT CASE WHEN author_unit > {V1_CUTOFF}
                          THEN {V1_CUTOFF + 1} ELSE author_unit END AS unit_bucket,
                     CAST(sum(no_articles) AS BIGINT) AS no_articles,
                     CAST(sum(no_authors) AS BIGINT) AS no_authors
              FROM ap GROUP BY 1
            )
            SELECT CASE WHEN unit_bucket > {V1_CUTOFF} THEN '>{V1_CUTOFF}'
                        ELSE CAST(unit_bucket AS VARCHAR) END AS author_unit,
                   no_articles,
                   no_authors,
                   round(no_articles * 100.0 / sum(no_articles) OVER (), 2)
                     AS perc_articles,
                   round(sum(no_articles) OVER (ORDER BY unit_bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         * 100.0 / sum(no_articles) OVER (), 2)
                     AS cum_perc_articles
            FROM b
        """,
    }
