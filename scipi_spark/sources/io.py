"""File sources and sinks (SURVEY §2.1 S7-S11).

- CSV result sinks with overwrite (S7/S8 — the reference's
  ``writeAsCsv(OVERWRITE)``; S3 is the same call with an s3a:// path).
- JSONL read/write for publication corpora.
- DBLP XML ingest (S9/S10): the reference SAX-parses dblp.xml in a
  single producer JVM and emits JSON to Kafka. Here the same role is an
  iterparse generator -> DataFrame (driver-side, mirroring the
  single-node producer), plus ``to_kafka_json`` shaping rows into
  Kafka-ready (key, value-JSON) — actually writing needs the Kafka
  connector package at runtime.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scipi_spark.schemas import DBLP_RAW_SCHEMA


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """S7: overwrite CSV sink (arrays joined with '|' since CSV is flat).

    Quoting is RFC 4180 (``escape='"'`` → embedded quotes double as
    ``""``), so fields containing commas, quotes or newlines survive the
    roundtrip through :func:`read_csv` — the default backslash escape is
    a Spark-ism other CSV consumers trip over.

    NULL and empty string are pinned to DISTINCT encodings (round-8
    advice — Spark's defaults write both as nothing, so an empty text
    field silently came back NULL): NULL → the bare ``\\N`` sentinel
    (the MySQL-dump convention), empty string → ``""``. The one residual
    ambiguity is a field whose VALUE is the two characters ``\\N`` —
    inherent to any in-band sentinel; corpora where that matters should
    use the parquet shard sink."""
    flat = df
    for field in df.schema.fields:
        if field.dataType.typeName() == "array":
            flat = flat.withColumn(field.name, F.array_join(field.name, "|"))
    (
        flat.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("escape", '"')
        .option("nullValue", "\\N")
        .option("emptyValue", '""')
        .csv(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema=None, header: bool = True
) -> DataFrame:
    """Read back a :func:`write_csv` sink: RFC-4180 quote doubling plus
    ``multiLine`` so quoted embedded newlines reassemble. multiLine makes
    each file non-splittable — fine for result sinks; bulk training data
    goes through the parquet shard sink instead. null/empty options
    mirror :func:`write_csv` so NULL (``\\N``) and empty string (``""``)
    round-trip distinguishably."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("multiLine", "true")
        .option("escape", '"')
        .option("nullValue", "\\N")
        .option("emptyValue", "")
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Raw JSON-lines as a one-column text DF (the ingest parsers take it
    from here — malformed lines drop in validation, not at read)."""
    return spark.read.text(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.select(F.to_json(F.struct(*df.columns)).alias("value")).write.mode(
        "overwrite"
    ).text(path)


def read_jsonl_typed(spark: SparkSession, path: str, schema) -> DataFrame:
    """Typed read-back of a :func:`write_jsonl` sink: one ``from_json``
    over the text lines with an explicit schema — ``to_json`` escapes
    embedded newlines/quotes, so hostile text round-trips exactly. The
    splittable-text + from_json pair is the JSONL scan shape that
    parallelizes at 100 TB (unlike multiLine JSON)."""
    return (
        spark.read.text(path)
        .select(F.from_json(F.col("value"), schema).alias("r"))
        .select("r.*")
    )


def write_hive_partitioned(df: DataFrame, path: str, *cols: str, fmt: str = "parquet") -> None:
    """Hive-layout partitioned sink (``col=value/`` directories) — the
    100 TB corpus organization that makes partition PRUNING possible: a
    reader's equality/IN filter on a partition column eliminates whole
    directories at planning time (the scan shows ``PartitionFilters``,
    plan-asserted in tests), so a one-source read of a 1000-source
    corpus touches 1/1000th of the files regardless of corpus size.
    Partition columns must be low-cardinality (source, date, lang);
    high-cardinality keys belong to bucketing (``storectl``) instead —
    a per-key directory layout would melt the file listing."""
    df.write.mode("overwrite").partitionBy(*cols).format(fmt).save(path)


def write_range_sorted(df: DataFrame, path: str, *cols: str, n_ranges: int = 8) -> None:
    """Range-clustered parquet sink — the DATA-SKIPPING complement to
    :func:`write_hive_partitioned` for HIGH-cardinality keys where a
    directory per value is impossible: ``repartitionByRange`` on the
    sort key(s) makes every output file a disjoint key range, and
    ``sortWithinPartitions`` makes every row group within a file tight
    on that key too, so the parquet footer min/max statistics become
    maximally selective. A reader's range/equality filter on the key
    then skips whole files AND whole row groups inside surviving files
    at the parquet-reader level (PushedFilters) — at 100 TB this turns
    a point-in-time query over an events corpus from a full scan into
    a few-row-group read, the same zone-map effect ORDER BY clustering
    gives a warehouse table. (RangePartitioner samples the key to pick
    balanced boundaries, so skew produces uneven file sizes, not
    stragglers at read time.)"""
    (
        df.repartitionByRange(n_ranges, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16):
    """Z-order (Morton) key expression over ``cols`` — each column is
    affinely quantized into ``bits`` levels between its corpus min/max
    (ONE tiny aggregate, broadcast back as scalars: the whitelisted
    corpus-stats idiom) and the quantized bits are interleaved, all
    with built-in integer expressions inside whole-stage codegen (no
    UDF, no shuffle). Returns (keyed_df, "_z"): the input with the key
    column attached.

    Interleaving makes lexicographic order on ``_z`` a space-filling
    curve over the column space: rows close in EVERY dimension land
    close in the file order, so parquet footer min/max on ALL the
    z-ordered columns stay tight per row group — the multi-column
    data-skipping layout (Delta/Iceberg ``OPTIMIZE ZORDER BY``) that
    1-D :func:`write_range_sorted` cannot give (sorting by (a, b)
    leaves b's per-row-group ranges as wide as the corpus)."""
    from functools import reduce

    if not cols:
        raise ValueError("zorder_key needs at least one column")
    # the interleaved key must fit the POSITIVE range of a long: Spark's
    # shiftleft masks shift counts mod 64, so positions >= 64 would wrap
    # onto low bits and silently corrupt the curve, and bit 63 is the
    # sign bit (it would split the sort order at the sign boundary) —
    # clamp per-column precision to what 63 bits hold
    bits = min(bits, 63 // len(cols))
    if bits < 1:
        raise ValueError(
            f"zorder_key: {len(cols)} columns cannot share 63 key bits"
        )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    stats = df.agg(*aggs)
    keyed = df.crossJoin(F.broadcast(stats))
    levels = (1 << bits) - 1
    terms = []
    n = len(cols)
    for ci, c in enumerate(cols):
        span = F.greatest(
            (F.col(f"_mx_{c}") - F.col(f"_mn_{c}")).cast("double"),
            F.lit(1.0),
        )
        q = F.floor(
            (F.col(c) - F.col(f"_mn_{c}")).cast("double") * levels / span
        ).cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(q, i).bitwiseAND(F.lit(1)), i * n + ci
                )
            )
    z = reduce(lambda a, b: a + b, terms)  # disjoint bit positions
    keyed = keyed.withColumn("_z", z).drop(
        *[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols]
    )
    return keyed, "_z"


def write_zordered(
    df: DataFrame, path: str, cols: list[str], bits: int = 16,
    n_ranges: int = 8,
) -> None:
    """Z-order-clustered parquet sink: range-partition and sort by the
    Morton key of ``cols``, then drop the key — every output file and
    row group is a tight hyper-rectangle in the column space, so a
    conjunctive range predicate on ANY subset of the z-ordered columns
    skips files/row groups at the parquet-reader level. The multi-
    dimensional complement of :func:`write_range_sorted`; at 100 TB
    this is how a (user, time) or (tenant, key) point query avoids a
    full scan without a directory explosion."""
    keyed, z = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_ranges, z)
        .sortWithinPartitions(z)
        .drop(z)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """Columnar ORC sink (Spark-native writer, no extra package): the
    Hive-ecosystem interchange twin of the parquet shard sink — same
    overwrite semantics as :func:`write_csv`."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


#: DBLP publication element tags (DblpParser.java:62-160)
_DBLP_PUB_TAGS = {
    "article",
    "inproceedings",
    "proceedings",
    "book",
    "incollection",
    "phdthesis",
    "mastersthesis",
    "www",
}


def iter_dblp_records(xml_path: str) -> Iterator[dict]:
    """S9: streaming SAX-style parse of dblp-shaped XML. Yields raw dicts
    in the producer's JSON shape; records missing title/conference/year
    are dropped exactly like ``DblpParser.java:142-146``."""
    for _, elem in ET.iterparse(xml_path, events=("end",)):
        if elem.tag not in _DBLP_PUB_TAGS:
            continue
        rec = {
            "key": elem.get("key"),
            "title": None,
            "year": None,
            "conference": None,
            "publisher": None,
            "authors": [],
            "citations": [],
        }
        for child in elem:
            if child.tag == "title":
                rec["title"] = child.text
            elif child.tag == "year":
                rec["year"] = child.text
            elif child.tag in ("booktitle", "journal"):
                rec["conference"] = child.text
            elif child.tag == "publisher":
                rec["publisher"] = child.text
            elif child.tag == "author":
                if child.text:
                    rec["authors"].append(child.text)
            elif child.tag == "cite":
                if child.text and child.text != "...":
                    rec["citations"].append(child.text)
        elem.clear()
        # producer-side validation (DblpParser.java:142-146)
        if rec["title"] and rec["year"] and rec["conference"]:
            yield rec


def read_dblp_xml(spark: SparkSession, xml_path: str, batch_size: int = 10_000) -> DataFrame:
    """DBLP XML -> raw DataFrame in the DBLP JSON shape (feed to
    ``ingest.parse_dblp``/``validate_publications`` via a value column, or
    use directly). Mirrors the reference's single-JVM producer role; for
    distributed XML at scale, pre-split the archive into per-record files
    or use a spark-xml package."""
    rows = list(iter_dblp_records(xml_path))
    return spark.createDataFrame(rows, DBLP_RAW_SCHEMA)


def read_dblp_xml_distributed(
    spark: SparkSession, chunks_glob: str
) -> DataFrame:
    """Distributed S9: parse pre-split DBLP XML chunks in parallel.

    The single-JVM producer (``read_dblp_xml``, mirroring
    ``DblpParser.java:40-160``) cannot scale past one core or one
    machine's memory for the multi-GB dblp archive. The standard fix is
    record-boundary splitting: cut the archive between top-level records
    and wrap each chunk in a root element — then every chunk is
    independently well-formed and this reader parses them all in
    parallel. Only the file LISTING happens on the driver; each executor
    task streams its chunk files through the same incremental parser as
    the single-JVM path (Arrow-batched ``mapInPandas``), so the output
    rows are identical up to order. On a cluster the glob would point at
    shared storage (s3a://...), and parallelism = number of chunks."""
    import glob as globmod

    import pandas as pd

    files = sorted(globmod.glob(chunks_glob))
    if not files:
        raise FileNotFoundError(f"no XML chunks match {chunks_glob!r}")
    paths = spark.createDataFrame([(f,) for f in files], "path string")
    n = min(len(files), spark.sparkContext.defaultParallelism)

    def parse(batches):
        cols = [f.name for f in DBLP_RAW_SCHEMA.fields]
        for batch in batches:
            for path in batch["path"]:
                recs = list(iter_dblp_records(path))
                yield pd.DataFrame(
                    {c: [r[c] for r in recs] for c in cols}
                )

    return paths.repartition(n).mapInPandas(parse, DBLP_RAW_SCHEMA)


def write_dblp_xml_chunks(
    df: DataFrame, out_dir: str, records_per_chunk: int = 5000
) -> DataFrame:
    """Distributed XML chunk sink — the inverse of
    :func:`read_dblp_xml_distributed` and the writer half of the
    record-boundary-splitting scheme that makes the multi-GB dblp archive
    parallelizable: every executor task serializes its rows into
    independently well-formed ``<dblp>...</dblp>`` chunk files (values
    XML-escaped via ``xml.sax.saxutils``), at most ``records_per_chunk``
    records per file.

    No driver collect anywhere: each Arrow batch writes its own chunk
    (tmp-file + atomic rename), so the write scales with executors, not
    driver memory — on a cluster ``out_dir`` is shared storage. Returns
    a (path, n) DataFrame; trigger with ``.count()``.

    Input columns: key, title, year, conference, publisher,
    authors (array<string>) — the DBLP_RAW_SCHEMA shape minus citations
    (optional column, written as ``<cite>`` elements when present)."""
    import os
    import re
    import uuid
    from xml.sax.saxutils import escape as _sax_escape, quoteattr as _sax_quoteattr

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    has_cites = "citations" in df.columns

    # xml.sax.saxutils escapes markup but passes XML-1.0-INVALID control
    # characters (e.g. \x00-\x08) through verbatim, producing chunks
    # iterparse cannot re-read; strip them before escaping (round-7 advice).
    _xml_bad = re.compile(
        "[^\x09\x0a\x0d\x20-\ud7ff\ue000-\ufffd"
        "\U00010000-\U0010ffff]"
    )

    def escape(s):
        return _sax_escape(_xml_bad.sub("", s))

    def quoteattr(s):
        return _sax_quoteattr(_xml_bad.sub("", s))

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), records_per_chunk):
                sub = pdf.iloc[start : start + records_per_chunk]
                if not len(sub):
                    continue
                parts = ["<dblp>"]
                for _, r in sub.iterrows():
                    parts.append(f"<article key={quoteattr(str(r['key']))}>")
                    for a in r["authors"] if r["authors"] is not None else []:
                        parts.append(f"<author>{escape(str(a))}</author>")
                    for col, tag in (
                        ("title", "title"),
                        ("year", "year"),
                        ("conference", "journal"),
                        ("publisher", "publisher"),
                    ):
                        if r[col] is not None:
                            parts.append(
                                f"<{tag}>{escape(str(r[col]))}</{tag}>"
                            )
                    if has_cites and r["citations"] is not None:
                        for c in r["citations"]:
                            parts.append(f"<cite>{escape(str(c))}</cite>")
                    parts.append("</article>")
                parts.append("</dblp>")
                name = os.path.join(
                    out_dir, f"chunk_{uuid.uuid4().hex}.xml"
                )
                # explicit utf-8: executors under a C/POSIX locale would
                # otherwise raise UnicodeEncodeError on non-ASCII titles
                with open(name + ".tmp", "w", encoding="utf-8") as fh:
                    fh.write("\n".join(parts))
                os.rename(name + ".tmp", name)
                yield pd.DataFrame({"path": [name], "n": [len(sub)]})

    return df.mapInPandas(dump, "path string, n long")


def to_kafka_json(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """S10: shape rows into Kafka producer records — (key, value) with the
    row serialized as one JSON document, ready for
    ``.write.format("kafka")`` where the connector is available."""
    value = F.to_json(F.struct(*df.columns)).alias("value")
    if key_col is None:
        return df.select(value)
    return df.select(F.col(key_col).cast("string").alias("key"), value)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key: str = "doc_id",
    order_col: str | None = None,
    fmt: str = "parquet",
) -> None:
    """Write a training corpus as exactly ``n_shards`` deterministic
    shard files: shard = portable md5-bucket of ``key`` (the same
    bucketing as :mod:`scipi_spark.operators.sampling`, so a document's
    shard never changes across runs or cluster layouts), one output
    file per shard, rows sorted within each shard by ``order_col``
    (default: the key's bucket order, i.e. a deterministic corpus-level
    shuffle — exactly what a training loader wants, NOT ingestion
    order).

    Plan shape: one ``repartition(n_shards, shard)`` exchange +
    ``sortWithinPartitions`` (no global sort), written with
    ``partitionBy(shard)`` so loaders address shards as
    ``shard=K/part-*``. At 100 TB pick n_shards so each shard is
    ~0.5-2 GB; the writer never funnels through fewer tasks than
    shards."""
    from pyspark.sql import functions as F

    from scipi_spark.operators.sampling import hash_bucket, shard_assignment

    out = shard_assignment(df, key=key, n_shards=n_shards)
    order = order_col or "_order"
    if order_col is None:
        out = out.withColumn("_order", hash_bucket(key))
    (
        # key appended to the sort: the coarse bucket order alone has
        # ties, and file content must be byte-deterministic
        out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", order, key)
        .drop(*([] if order_col else ["_order"]))
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )
