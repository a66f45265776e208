"""Structured Streaming twins of the six continuous aggregations (P7-P12)
plus windowed/watermarked extensions beyond the reference surface.

Reference semantics (``ScipiStream.java:127-207``, SURVEY §1.4): unwindowed
per-key running aggregates whose every update upserts into a keyed store —
last-write-wins convergent totals, no watermarks, no event time. The Spark
mapping is ``groupBy(...).agg(...)`` in **update** output mode with a
``foreachBatch`` keyed upsert; the batch twins in
``operators.analytics`` are the golden answers the stream must converge to
(equivalence-tested in tests/test_streaming.py).

Kafka note: the source here is a file/JSONL stream (the test harness has no
brokers); swapping ``readStream.text`` for
``readStream.format("kafka").option("subscribe", topic)`` + the same
``value``-column parse is the only change needed in production — parsing,
validation, aggregation, and sinks are source-agnostic (S1/S2 in SURVEY
§2.1).

Scale: streaming state lives in the executor StateStore partitioned by the
group key — the same hash partitioning as the batch aggregation; update
mode emits only changed keys per micro-batch, so sink traffic is bounded
by key churn, not stream volume.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scipi_spark import ingest
from scipi_spark.operators import analytics

#: name -> batch-twin aggregation applicable to a streaming Publication DF.
#: (yrwise/aap derived columns are computed post-aggregate and work
#: identically in update mode.)
STREAMING_AGGREGATIONS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "keyword_count": analytics.keyword_count,
    "fos_count": analytics.fos_count,
    "yrwise_dist": analytics.yrwise_dist,
    "authorship_pattern": analytics.authorship_pattern,
    "avg_authors_per_paper": analytics.avg_authors_per_paper,
    "hyper_authorship": analytics.hyper_authorship,
}

#: primary key of each result table (SURVEY §1.2, Cassandra DDL)
AGGREGATION_KEYS: dict[str, list[str]] = {
    "keyword_count": ["keyword_name"],
    "fos_count": ["field_study_name"],
    "yrwise_dist": ["year"],
    "authorship_pattern": ["author_unit"],
    "avg_authors_per_paper": ["year"],
    "hyper_authorship": ["hyper_authorship_year"],
}


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    source: str = "oag",
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1/S2: the production source — Kafka topic -> validated Publication
    stream. Identical pipeline to the file shim from the value column on;
    requires the spark-sql-kafka connector package on the classpath (not
    present in the test container, which is why tests use the file shim)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .selectExpr("CAST(value AS STRING) AS value")
    )
    if source == "oag":
        return ingest.ingest_oag(raw)
    return ingest.ingest_dblp(raw)


def read_publications_stream(
    spark: SparkSession,
    path: str,
    source: str = "oag",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """JSONL file stream -> validated Publication stream (P1/P2 + P5).

    ``max_files_per_trigger=1`` replays one file per micro-batch, so a
    directory of chunked fixtures simulates arrival order."""
    raw = (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
    )
    if source == "oag":
        return ingest.ingest_oag(raw)
    if source == "dblp":
        return ingest.ingest_dblp(raw)
    raise ValueError(f"unknown source {source!r}")


# ---------------------------------------------------------------------------
# sinks
# ---------------------------------------------------------------------------

def parquet_upsert(
    spark: SparkSession, batch_df: DataFrame, keys: list[str], path: str
) -> None:
    """Keyed last-write-wins upsert into a parquet table (the Cassandra-
    upsert stand-in, S5/S6): existing rows whose key appears in the batch
    are replaced; everything else is kept.

    NOT transactional: the merge is staged to a temp dir (so the final
    write never reads the table it overwrites), but the final overwrite
    is a second full write — a crash between the two writes, or a
    concurrent reader mid-overwrite, can observe a partial table. The
    single-writer foreachBatch loop this serves tolerates that (the next
    micro-batch rewrites); anything needing real atomicity should sink to
    a table format with MERGE (Delta/Iceberg) instead. The rewrite cost
    is fine for the bounded result tables it serves (distinct keywords/
    years/team sizes — not fact data)."""
    import shutil

    batch_df = batch_df.dropDuplicates(keys)
    if os.path.exists(path):
        current = spark.read.parquet(path)
        merged = current.join(
            batch_df.select(*keys), keys, "left_anti"
        ).unionByName(batch_df)
    else:
        merged = batch_df
    tmp = path.rstrip("/") + "._tmp"
    try:
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_aggregation_upsert(
    spark: SparkSession,
    pubs_stream: DataFrame,
    which: str,
    out_path: str,
    checkpoint_path: str,
    **agg_kwargs,
):
    """P7-P12 streaming pipeline in update mode with the keyed upsert sink.
    Returns the StreamingQuery (caller awaits/stops)."""
    agg = STREAMING_AGGREGATIONS[which](pubs_stream, **agg_kwargs)
    keys = AGGREGATION_KEYS[which]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        parquet_upsert(spark, batch_df, keys, out_path)

    return (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(sink)
        .start()
    )


def run_streaming_dedup_against_store(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    table: str = "minhash_store_bands",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int | None = None,
    num_perm: int | None = None,
    bands: int | None = None,
    threshold: float = 0.5,
    n_buckets: int | None = None,
):
    """Continuous near-dup detection against a persisted corpus: each
    micro-batch (1) probes the bucketed signature store for its near-dup
    pairs — batch-vs-corpus plus batch-vs-batch, corpus side
    shuffle-free — (2) appends the pairs to the parquet sink, and (3)
    folds its own signatures into the store, so every later batch sees
    it as corpus. This is the always-on production shape of dedup: the
    expensive corpus state is an external bucketed index maintained
    incrementally, never recomputed.

    ``foreachBatch`` rather than a stream-stream join BECAUSE the corpus
    side is a mutable external index, not a stream: stream-stream joins
    buffer both sides in the state store, which is exactly the
    unbounded-state shape this design avoids.

    Replay semantics (foreachBatch is at-least-once): the pair sink is
    idempotent — each batch OVERWRITES its own ``batch_id=N`` partition
    directory, so a replay rewrites identical rows instead of appending
    duplicates. The store fold is guarded by a per-batch marker dir
    (``<store>/_folded/batch_N``) written AFTER the append: a replay
    that sees the marker skips the fold, so the batch's signatures enter
    the store once. Residual window: a crash between the append and the
    marker write replays the append, duplicating that batch's rows in
    the store (same class as parquet_upsert's documented non-atomicity)
    — a :func:`scipi_spark.operators.dedup.write_signature_store`
    compaction repairs it; a MERGE-capable table format makes the fold
    exact. The batch's shingle/minhash/band state is computed ONCE
    (:func:`~scipi_spark.operators.dedup.batch_lsh_state`) and shared by
    the probe and the append. Returns the StreamingQuery (caller
    awaits/stops)."""
    from scipi_spark.operators import dedup as dedup_ops

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)  # probe + append reuse
        # recipe self-configures from the store marker (explicit
        # mismatches raise) so the batch state below is banded under
        # exactly the stored coefficients
        bk, bnum_perm, bbands, _nb, _persist = dedup_ops._resolve_sig_params(
            store_path.rstrip("/"), k, num_perm, bands, n_buckets
        )
        state = dedup_ops.batch_lsh_state(
            batch_df, id_col, text_col, bk, bnum_perm, bbands
        )
        pairs = dedup_ops.minhash_lsh_increment_from_store(
            spark,
            store_path,
            batch_df,
            table=table,
            id_col=id_col,
            text_col=text_col,
            k=k,
            num_perm=num_perm,
            bands=bands,
            threshold=threshold,
            batch_state=state,
        )
        pairs.write.mode("overwrite").parquet(
            out_path.rstrip("/") + f"/batch_id={batch_id}"
        )
        marker = os.path.join(store_path, "_folded", f"batch_{batch_id}")
        if not os.path.exists(marker):
            dedup_ops.append_signature_store(
                batch_df,
                store_path,
                table=table,
                id_col=id_col,
                text_col=text_col,
                k=k,
                num_perm=num_perm,
                bands=bands,
                n_buckets=n_buckets,
                batch_state=state,
            )
            os.makedirs(marker, exist_ok=True)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(sink)
        .start()
    )


def run_streaming_ann_against_store(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    table: str = "ann_store_sigs",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int | None = None,
    tables: int | None = None,
    dim: int | None = None,
    seed: int | None = None,
    n_buckets: int | None = None,
    fold: bool = True,
):
    """Continuous similarity search against a persisted vector index:
    each micro-batch of embeddings (1) probes the bucketed ANN store for
    its top-k neighbors — corpus side shuffle-free, per-batch work
    O(|batch| x bucket occupancy) — (2) writes the hits to the parquet
    sink, and (3) optionally folds its own vectors into the store so
    every later batch can retrieve it (``fold=True`` is the
    index-ingestion shape; ``fold=False`` is pure query serving).

    Same ``foreachBatch`` rationale and replay semantics as
    :func:`run_streaming_dedup_against_store`: the corpus is a mutable
    external index (never stream-stream state), the hit sink overwrites
    its own ``batch_id=N`` partition (idempotent), and the fold is
    guarded by a per-batch marker dir written after the append — a crash
    inside the residual window duplicates one batch's vectors until a
    :func:`~scipi_spark.operators.similarity.compact_ann_store` repairs
    it. Returns the StreamingQuery (caller awaits/stops).

    The hash recipe defaults to None and self-configures from the
    store's version marker (round-10: concrete defaults would raise
    against any auto-sized store); explicitly mismatched values fail
    loudly through ``storectl.resolve_params``."""
    from scipi_spark.operators import similarity as sim_ops

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        batch_df = batch_df.localCheckpoint(eager=True)  # probe + fold reuse
        hits = sim_ops.knn_from_store(
            batch_df,
            table=table,
            k=k,
            bits=bits,
            tables=tables,
            dim=dim,
            seed=seed,
            id_col=id_col,
            vec_col=vec_col,
            path=store_path,
        )
        hits.write.mode("overwrite").parquet(
            out_path.rstrip("/") + f"/batch_id={batch_id}"
        )
        if fold:
            marker = os.path.join(store_path, "_folded", f"batch_{batch_id}")
            if not os.path.exists(marker):
                sim_ops.append_ann_store(
                    batch_df,
                    store_path,
                    table=table,
                    id_col=id_col,
                    vec_col=vec_col,
                    bits=bits,
                    tables=tables,
                    dim=dim,
                    seed=seed,
                    n_buckets=n_buckets,
                )
                os.makedirs(marker, exist_ok=True)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(sink)
        .start()
    )


def run_streaming_er_against_store(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    table: str = "er_store_blocks",
    id_col: str = "rec_id",
    name_col: str = "name",
    threshold: float | None = None,
    block_cap: int | None = None,
    two_keys: int | None = None,
    n_buckets: int | None = None,
):
    """Continuous entity resolution against a persisted entity store:
    each micro-batch of records (1) resolves against the bucketed block
    table — corpus side shuffle-free, closure over the batch's match
    graph only — (2) writes ITS OWN records' entity assignments to the
    parquet sink, and (3) folds the batch into the store (block rows
    append, the small non-root entity table rewrites, cross-entity
    merges included), so every later batch resolves against it. The
    converged store assignment equals the one-shot closure over
    corpus + all batches (pytest- and gate-pinned).

    Same ``foreachBatch`` rationale and replay semantics as
    :func:`run_streaming_dedup_against_store`: the corpus is a mutable
    external index, the assignment sink overwrites its own
    ``batch_id=N`` partition (idempotent), and the fold is guarded by a
    per-batch marker dir written after the append — batch ids double as
    closure node ids, so an unguarded replay would alias nodes. The
    matching recipe self-configures from the store's version marker;
    explicit mismatches raise (``storectl.resolve_params``). Returns
    the StreamingQuery (caller awaits/stops)."""
    from scipi_spark.operators import linkage as linkage_ops

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)  # probe + fold reuse
        kwargs = dict(
            table=table,
            id_col=id_col,
            name_col=name_col,
            threshold=threshold,
            block_cap=block_cap,
            two_keys=two_keys,
            n_buckets=n_buckets,
        )
        marker = os.path.join(store_path, "_folded", f"batch_{batch_id}")
        if not os.path.exists(marker):
            # fold + probe in one pass (append returns the folded
            # assignment, so the batch is blocked/scored exactly once)
            assignment = linkage_ops.append_entity_store(
                batch_df, store_path, **kwargs
            )
            os.makedirs(marker, exist_ok=True)
        else:
            # replay of an already-folded batch: probe only — a second
            # fold would alias the batch's node ids in the closure
            assignment = linkage_ops.er_increment_from_store(
                spark, store_path, batch_df, **kwargs
            )
        batch_ids = batch_df.select(
            F.col(id_col).cast("long").alias("rec_id")
        )
        assignment.join(batch_ids, "rec_id").write.mode("overwrite").parquet(
            out_path.rstrip("/") + f"/batch_id={batch_id}"
        )

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(sink)
        .start()
    )


def run_streaming_text_index_fold(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    query_terms: list[str],
    table: str = "text_index_postings",
    id_col: str = "doc_id",
    text_col: str = "text",
    topk: int = 10,
    n_buckets: int | None = None,
):
    """Continuous search indexing against the persisted BM25 store —
    the last streaming x store cross (dedup/ANN/ER/SCD2 already fold):
    each micro-batch of documents (1) FOLDS into the index
    (``textops.append_text_index_store`` — postings append under the
    same bucket spec, stats recomputed exactly), then (2) serves a
    fixed query against the just-published index and writes the top-k
    to the parquet sink, so the sink's per-batch partitions show the
    ranking evolve as the corpus grows and the final batch's result
    equals a from-scratch index over everything ingested
    (equivalence gate-pinned).

    Same ``foreachBatch`` rationale and replay semantics as the sibling
    sinks: the index is a mutable external store (never stream-stream
    state), the result sink overwrites its own ``batch_id=N`` partition
    (idempotent), and the fold is guarded by a per-batch marker dir —
    a replayed batch would otherwise double its postings and inflate
    its tf. Returns the StreamingQuery (caller awaits/stops)."""
    from scipi_spark.operators import textops as textops_ops

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint(eager=True)
        marker = os.path.join(store_path, "_folded", f"batch_{batch_id}")
        if not os.path.exists(marker):
            textops_ops.append_text_index_store(
                batch_df,
                store_path,
                table=table,
                id_col=id_col,
                text_col=text_col,
                n_buckets=n_buckets,
            )
            os.makedirs(marker, exist_ok=True)
        hits = textops_ops.bm25_from_store(
            spark,
            store_path,
            query_terms,
            table=table,
            topk=topk,
            id_col=id_col,
            n_buckets=n_buckets,
        )
        hits.write.mode("overwrite").parquet(
            out_path.rstrip("/") + f"/batch_id={batch_id}"
        )

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(sink)
        .start()
    )


def run_streaming_graph_store_fold(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    table: str = "graph_edges_mirrored",
    n_buckets: int | None = None,
    hash_fn=None,
):
    """Continuous graph maintenance against the persisted edge store —
    the graph member of the streaming x store family (dedup/ANN/ER/
    BM25/SCD2 all fold): each micro-batch of PUBLICATIONS (1) extracts
    its heterogeneous edges, aggregates them to the mirrored partial
    relation, and FOLDS it into the bucketed store
    (``community.append_graph_store`` — O(batch) appended delta rows,
    merged on read), then (2) writes the folded graph's 1-row summary
    (distinct directed pairs, total edge weight) to the parquet sink,
    so the sink's per-batch partitions show the graph grow and the
    converged store's LPA labels equal a from-scratch build over
    corpus + all batches (gate-pinned). This replaces the reference's
    re-scan-Cassandra-every-run batch shape
    (``ScipiBatchCommunity.java:122-133``) with an incremental one.

    Same ``foreachBatch`` rationale and replay semantics as the
    sibling sinks: the store is a mutable external index (never
    stream-stream state), the summary sink overwrites its own
    ``batch_id=N`` partition (idempotent), and the fold is guarded by
    a per-batch marker dir — an unguarded replay would double the
    batch's edge weights. ``hash_fn`` must match the base build's
    vertex hash (default ``community.aggregate_undirected``'s
    xxhash64). Returns the StreamingQuery (caller awaits/stops)."""
    from scipi_spark.operators import community as community_ops

    from scipi_spark.sources import storectl

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        marker = os.path.join(store_path, "_folded", f"batch_{batch_id}")
        if not os.path.exists(marker):
            edges = community_ops.extract_edges_hashed(
                batch_df, **({"hash_fn": hash_fn} if hash_fn else {})
            )
            rel = community_ops.aggregate_undirected_hashed(edges)
            community_ops.append_graph_store(
                None,
                store_path,
                table=table,
                mirrored=rel,
                n_buckets=n_buckets,
            )
            os.makedirs(marker, exist_ok=True)
        else:
            # replay of an already-folded batch (possibly in a FRESH
            # session where the append never registered the table):
            # register the live version explicitly before summarizing
            ver = storectl.current_dir(store_path.rstrip("/"))
            nb = (storectl.params_of(ver) or {}).get(
                "n_buckets", n_buckets or 16
            )
            storectl.register_bucketed(
                spark, table, ver + "/edges", ["src"], ["src"], nb
            )
        summary = community_ops.merge_delta_edges(spark.table(table)).agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("w_sum").alias("total_weight"),
        )
        summary.write.mode("overwrite").parquet(
            out_path.rstrip("/") + f"/batch_id={batch_id}"
        )

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(sink)
        .start()
    )


def run_aggregation_to_memory(
    spark: SparkSession, pubs_stream: DataFrame, which: str, name: str, **agg_kwargs
):
    """Complete-mode memory sink — the test/inspection path."""
    agg = STREAMING_AGGREGATIONS[which](pubs_stream, **agg_kwargs)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the FIRST arrival per key, emitting it
    immediately (append mode), with dedup state bounded by the watermark —
    ``dropDuplicatesWithinWatermark``, the production shape for keyed
    dedup over unbounded streams (plain ``dropDuplicates`` would grow
    state forever). State lives in the executor StateStore hash-
    partitioned by key, exactly like a streaming aggregation; the batch
    twin is ``distinct`` over the same key."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        key_cols
    )


# ---------------------------------------------------------------------------
# windowed/watermarked extensions (north-star; reference has none)
# ---------------------------------------------------------------------------

def tumbling_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (tumbling window, event_type): count + sum(value), tolerating
    late data up to the watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window variant (each event lands in window/slide buckets)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def stateful_user_stats(
    events: DataFrame,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum, min_ts, max_ts) maintained in explicit GroupState
    — the escape hatch for aggregations Spark's built-ins can't express
    (the reference's analog is Flink's keyed ``reduce`` with rich state,
    ``ScipiStream.java:146-207``).

    Emits one updated row per user per micro-batch (update semantics).
    State is partitioned by the group key in the executor StateStore, so
    it scales exactly like a streaming groupBy. The batch twin — what the
    converged output must equal — is ``events.groupBy(user_id).agg(count,
    sum, min(ts), max(ts))`` (equivalence-tested in test_streaming.py)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, n_events long, sum_value double, "
        "first_ts timestamp, last_ts timestamp"
    )
    state_schema = "n long, s double, mn timestamp, mx timestamp"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, s, mn, mx = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            lo, hi = pdf[ts_col].min(), pdf[ts_col].max()
            mn = lo if mn is None or lo < mn else mn
            mx = hi if mx is None or hi > mx else mx
        state.update((n, s, mn, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "first_ts": [mn],
                "last_ts": [mx],
            }
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity (dynamic-length windows — state merges as events arrive)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    bound: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval bound: pair
    each left event with right events of the same key arriving within
    ``[left.ts, left.ts + bound]`` (click-after-view attribution).

    Both sides carry watermarks and the join condition bounds BOTH
    event times, so Spark can size the join state and evict expired
    rows — without the bound, stream-stream join state grows forever.
    State is hash-partitioned by the join key in the StateStore, i.e.
    both streams co-partition on ``key`` exactly like a streaming
    aggregation; at 100 TB/day the bound (not the corpus) sizes memory.

    Works identically on batch frames (the theta join becomes a key
    equi-join + range filter), which is what the oracle entry runs."""
    l = left.withWatermark(ts_col, watermark).select(
        F.col(key).alias("l_key"),
        F.col(ts_col).alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r = right.withWatermark(ts_col, watermark).select(
        F.col(key).alias("r_key"),
        F.col(ts_col).alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    return l.join(
        r,
        F.expr(
            f"l_key = r_key AND r_ts >= l_ts AND r_ts <= l_ts + interval {bound}"
        ),
        "inner",
    ).select(
        F.col("l_key").alias(key),
        F.col("l_event_id").alias("view_id"),
        F.col("r_event_id").alias("click_id"),
        (F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")).alias(
            "lag_seconds"
        ),
    )


def media_decode_rollup(media_stream: DataFrame) -> DataFrame:
    """Streaming multimodal ingest: decode every arriving media payload
    with the REAL zero-dependency kernels (``multimodal.media_stats``
    is a stateless Arrow ``mapInPandas`` stage, so it composes with
    micro-batched execution unchanged) and maintain per-format running
    aggregates of the DECODED values — the "decode as data lands"
    pipeline a multimodal training corpus runs on arrival, with the
    decode on executors and only per-format counters as state.

    All aggregate columns are exact integers (counts and sums of
    decoded integer statistics), so the converged complete-mode table
    matches a batch SQL replay bit-for-bit. State is one row per
    format; the decode itself holds NO state — at 100 TB/day the
    memory bound is the format cardinality, not the corpus."""
    from scipi_spark.operators.multimodal import media_stats

    stats = media_stats(media_stream)
    return stats.groupBy("fmt").agg(
        F.count(F.lit(1)).cast("long").alias("n_assets"),
        F.sum("n").cast("long").alias("sum_vals"),
        F.sum("d1").cast("long").alias("sum_d1"),
        F.sum("peak").cast("long").alias("sum_peak"),
    )
