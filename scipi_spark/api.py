"""Thin query API: one call opens a session with every test table (and the
publications analog) registered as temp views, so the whole engine surface
is additionally reachable through plain ``spark.sql`` — the string-query
interface the reference lacks (SURVEY §2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from scipi_spark.session import get_spark
from scipi_spark.sources.tables import TABLES, load_events, load_table, publications_analog


def open_session(
    sf_dir: str, spark: SparkSession | None = None
) -> SparkSession:
    """Register all driver tables + the ``publications`` analog view on a
    (new or given) session; afterwards any ANSI SQL over them just works."""
    spark = spark or get_spark(app_name="scipi-spark-sql")
    for name in TABLES:
        df = load_events(spark, sf_dir) if name == "events" else load_table(
            spark, sf_dir, name
        )
        df.createOrReplaceTempView(name)
    publications_analog(spark, sf_dir).createOrReplaceTempView("publications")
    return spark


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
