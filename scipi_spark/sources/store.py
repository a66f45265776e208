"""Publications store semantics (S5): the reference's Cassandra table is
keyed ((doi, title), id DESC) — upsert-by-(doi,title) with a time-uuid
tiebreaker (``src/scripts/cassandraDB:9-22``), i.e. reading the table
yields the LATEST record per (doi, title).

Here the store is parquet + a compaction view: ``latest_publications``
dedups by key keeping the max surrogate id — one window (or max_by
aggregate) over the key partitioning, the standard lakehouse
last-write-wins read."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_publications(pubs: DataFrame, id_col: str = "id") -> DataFrame:
    """Last-write-wins view: one row per (doi, title), highest id wins
    (the reference's clustering order ``publication_id DESC``)."""
    w = Window.partitionBy("doi", "title").orderBy(F.desc(id_col))
    return (
        pubs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def append_publications(pubs: DataFrame, path: str) -> None:
    """S5 sink: append-only parquet; readers compact via
    :func:`latest_publications`."""
    pubs.write.mode("append").parquet(path)
