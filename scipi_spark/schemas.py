"""Data model schemas (SURVEY §1).

The one core entity is ``Publication`` — reference:
``/root/reference/src/scipi/src/main/java/publication/Publication.java:15-48``
and the Cassandra DDL ``/root/reference/src/scripts/cassandraDB:9-22``.
Everything maps onto primitive fields + ``array<string>``; ``year`` is a
4-char string by reference semantics (validated by length, not parsed).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: The validated Publication record (post-ingest).
PUBLICATION_SCHEMA = T.StructType(
    [
        T.StructField("doi", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("id", T.StringType()),  # surrogate uuid-like id
        T.StructField("publisher", T.StringType()),
        T.StructField("venue", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("keywords", T.ArrayType(T.StringType())),
        T.StructField("year", T.StringType()),  # 4-char string, per reference
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("fos", T.ArrayType(T.StringType())),
        T.StructField("dataset", T.StringType()),  # "oag" | "dblp"
    ]
)

#: Raw OAG JSON shape — authors are structs with a ``name`` field
#: (reference deserializer ``ScipiStream.java:260-376``).
OAG_RAW_SCHEMA = T.StructType(
    [
        T.StructField("doi", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("publisher", T.StringType()),
        T.StructField("venue", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("year", T.StringType()),
        T.StructField("keywords", T.ArrayType(T.StringType())),
        T.StructField(
            "authors",
            T.ArrayType(T.StructType([T.StructField("name", T.StringType())])),
        ),
        T.StructField("fos", T.ArrayType(T.StringType())),
    ]
)

#: Raw DBLP JSON shape as emitted by the reference's SAX producer
#: (``DblpParser.java:62-160``; consumed by ``ScipiStream.java:379-462``).
DBLP_RAW_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("year", T.StringType()),
        T.StructField("conference", T.StringType()),
        T.StructField("publisher", T.StringType()),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("citations", T.ArrayType(T.StringType())),
    ]
)

#: Result-table schemas of the six continuous aggregations (SURVEY §1.2).
KEYWORDS_SCHEMA = T.StructType(
    [
        T.StructField("keyword_name", T.StringType()),
        T.StructField("keyword_count", T.LongType()),
    ]
)

YRWISEDIST_SCHEMA = T.StructType(
    [
        T.StructField("year", T.StringType()),
        T.StructField("single", T.LongType()),
        T.StructField("joint", T.LongType()),
        T.StructField("total", T.LongType()),
        T.StructField("single_perc", T.DoubleType()),
        T.StructField("joint_perc", T.DoubleType()),
    ]
)
