"""Embedding similarity search: brute-force cosine top-k (exactness
baseline) and LSH-bucketed ANN (the scale path).

Scale design:

- **brute force** is O(|queries| x |corpus|): correct tool when the query
  set is small (broadcast) — the corpus side streams through one narrow
  stage, no shuffle of the corpus at all; per-partition top-k is folded
  before the final k-row-per-query merge (TakeOrdered-style).
- **LSH (random hyperplanes)**: each vector gets a b-bit signature; only
  same-bucket pairs are scored. The bucket join is an equi-join on the
  signature — shuffles |corpus| rows once, never the cross product.
  Multi-probe (flipping one bit) trades compute for recall without
  re-shuffling the corpus.

The dot product stays in JVM expressions (``aggregate(zip_with(...))``
over double-cast arrays) — no Python on the hot path; arithmetic is
bit-identical to the DuckDB oracle's ``list_inner_product`` on DOUBLE[].
"""

from __future__ import annotations

import os
import random

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scipi_spark.sources import storectl


def _as_double(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _spread(df: DataFrame) -> DataFrame:
    """A small corpus parquet arrives as 1 scan partition; spread it so
    signature computation and scoring use every core. persist() is an
    optimizer barrier — Catalyst would otherwise push the scoring
    projection below the repartition, back into the single scan task."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target).persist()
    return df


def dot(a: Column, b: Column) -> Column:
    """Sequential (index-order) double dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    """dot/(||a||*||b||) — the norm factors are sqrt(dot(x,x)), matching
    the oracle's formula grouping exactly."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine()`` with the norm factors precomputed per ROW instead of
    per PAIR: na/nb must be exactly ``sqrt(dot(x,x))`` of their vector.

    Bit-identical to :func:`cosine` — the factors are the same doubles
    (sqrt of the same sequential aggregate) and the expression grouping
    ``dot/(na*nb)`` is unchanged; only WHERE the factors are evaluated
    moves.  Why it matters (guide §1.2 per-task work): the interpreted
    ``aggregate(zip_with)`` dot product is the per-pair unit cost of
    every scoring join, and ``cosine()`` pays it three times per pair.
    A scoring join over P candidate pairs drawn from N rows evaluates
    3P dots; precomputing norms on the row side evaluates P + N — for
    the dense all-pairs/candidate joins (P >> N) a ~3x on the scoring
    stage, at 100 TB exactly as at sf0.1.

    r13 NEGATIVE RESULT (r12 verdict #7): an Arrow-batched GEMM-form
    kernel for this dot product (dimension-major accumulation,
    bit-identical doubles) was built and A/B'd at sf1 via
    tools/ab_gemm_rerank.py — it LOST on every scoring-heavy entry
    (knn_cosine_brute 0.29x, knn_cosine_pq 0.65x, knn_cosine_lsh
    0.88x): shipping both 64-dim vectors across the Python boundary
    (~1 KB/pair) costs more than the interpreted JVM fold it replaces,
    and that ratio is scale-invariant (both sides linear in pairs).
    The kernel was reverted; OPTIMIZATION_r13.md records the numbers."""
    return dot(a, b) / (na * nb)


def _with_nrm(df: DataFrame, vec_col: str = "e", out: str = "nrm") -> DataFrame:
    """Attach the per-row norm sqrt(dot(e,e)) used by :func:`cosine_pre`."""
    v = F.col(vec_col)
    return df.withColumn(out, F.sqrt(dot(v, v)))


def knn_brute(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors (self excluded) for each query id.

    The query side is filtered then broadcast; ties on rounded cosine break
    by ascending neighbor id for determinism."""
    base = _with_nrm(
        _spread(embeddings).select(
            F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
        )
    )
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_pre(
                    F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm")
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def knn_hard_negatives(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training: for each
    query vector, the top-k most-similar vectors with a DIFFERENT label —
    the near-miss negatives that carry the gradient signal (random
    negatives are trivially separable; same-label neighbors are
    positives, not negatives).

    Same plan as :func:`knn_brute` with the label inequality fused into
    the post-crossJoin filter, so the pruning happens before the top-k
    window ranks anything: queries (with their labels) broadcast, dots
    JVM-side via the codegen ``aggregate(zip_with)`` kernel, one window
    per query id. At corpus scale, swap the broadcast-scored base for
    the LSH-bucketed candidate generator (:func:`knn_lsh`) and apply the
    same label filter to its exact-scoring stage — mining quality
    degrades gracefully with recall, never with correctness."""
    base = _with_nrm(
        _spread(embeddings).select(
            F.col(id_col).alias("vec_id"),
            F.col(label_col).alias("lab"),
            _as_double(vec_col).alias("e"),
        )
    )
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("lab").alias("qlab"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("lab") != F.col("qlab"))
        .select(
            "query_id",
            "vec_id",
            F.col("lab").alias("neg_label"),
            F.round(
                cosine_pre(
                    F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm")
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def auto_bits(
    n: int, target_occupancy: int = 64, floor: int = 4, cap: int = 24
) -> int:
    """Hyperplane bits sized from corpus cardinality: ``bits ~
    log2(n / target_occupancy)`` keeps EXPECTED bucket occupancy — and
    hence per-query candidate count — roughly constant as the corpus
    grows, which is what makes the LSH probe sublinear at 100x instead
    of O(n / 2^fixed_bits) (round-9 verdict #1: the fixed ``bits=6``
    store default made probe cost grow linearly past n ~ 64*2^6). Same
    rule :func:`knn_join` already applies in-memory; recall is held up
    by the independent-``tables`` dimension, not by occupancy."""
    import math

    return max(
        floor,
        min(cap, int(math.ceil(math.log2(max(n, 128) / float(target_occupancy))))),
    )


#: build recipe of ANN stores written/opened by THIS process, keyed by
#: catalog table name — lets :func:`knn_from_store` self-configure when
#: probed via ``table`` alone (no ``path``); cross-process probes resolve
#: the same dict from the version marker instead.
_ANN_PARAMS: dict = {}

#: legacy recipe assumed for stores whose marker predates persisted
#: params (pre-round-10 stores)
_ANN_DEFAULTS = {"bits": 6, "tables": 8, "dim": 64, "seed": 42, "n_buckets": 16}


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian random hyperplanes (driver-side literals —
    bits x dim doubles, broadcast as part of the plan)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Packed sign-bit signature of the vector against each hyperplane.

    Column-expression form — used for single-table blocking; for many
    tables prefer :func:`make_signatures_udf` (one Arrow-batched matmul
    instead of tables*bits*dim py4j-built literals, which costs seconds
    of driver-side plan construction)."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in p])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


def make_signatures_udf(all_planes: list[list[list[float]]]):
    """Vectorized multi-table signature kernel: one (n, dim) x (dim, L*b)
    matmul per Arrow batch, packed into one long per table. Sign bits at
    dot ~ 0 may differ from sequential summation in the last ulp — fine
    for bucketing (the op is approximate; scoring stays exact)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    tables = len(all_planes)
    bits = len(all_planes[0])
    M = np.array(
        [p for planes in all_planes for p in planes], dtype="float64"
    )  # (tables*bits, dim)
    powers = (1 << np.arange(bits, dtype="int64"))

    @pandas_udf("array<long>")
    def sigs(e: pd.Series) -> pd.Series:
        X = np.stack(e.to_numpy())  # (n, dim)
        B = (X @ M.T) >= 0  # (n, tables*bits)
        B = B.reshape(len(X), tables, bits).astype("int64")
        packed = (B * powers).sum(axis=2)  # (n, tables)
        return pd.Series(list(packed))

    return sigs


def knn_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    bits: int = 6,
    tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH: L independent
    tables of b bits each; a corpus vector is a candidate if it collides
    with the query in ANY table (plus 1-bit-flip probes when
    ``multiprobe``). Recall ~= 1-(1-q)^L with q = p^b (+ b*p^(b-1)*(1-p)
    for multiprobe), p = 1 - angle/pi.

    The candidate join is an equi-join on (table, signature): the corpus
    shuffles once regardless of L — L only widens the signature column.

    r12 plan notes: ``base`` is materialized AFTER the signature UDF —
    with the barrier below it (the old _spread-only persist), the corpus
    and query branches each re-ran the UDF, and the filter that
    InferFiltersFromGenerate derives from ``posexplode`` (size(sigs)>0)
    materialized a SECOND ArrowEvalPython per branch below the first: 4
    Python evaluations of the corpus per run, each paying worker fan-out
    (2 ArrowEvalPython nodes per branch in the before-plan). The r12
    form was ``persist()`` — which, on a function that returns a lazy
    DataFrame, has no unpersist site and accumulated cached blocks
    across calls in a long-lived session (r12 advice). r13: an eager
    ``localCheckpoint`` instead — the kernel still runs exactly once,
    the lineage cut still blocks the duplicated-filter rewrite, and the
    checkpoint RDD is released by the ContextCleaner when the returned
    DataFrame's handles drop (the same session contract every other ANN
    path in this module already uses). The probe side is explicitly
    broadcast: queries x tables x (1+bits) rows is tiny by
    construction, while the corpus is the 100 TB side — without the hint
    the optimizer broadcast the CORPUS (BuildRight over the exploded
    signature table), which inverts at scale."""
    all_planes = [hyperplanes(dim, bits, seed + 7919 * t) for t in range(tables)]
    sigs_udf = make_signatures_udf(all_planes)
    sc = embeddings.sparkSession.sparkContext
    src = embeddings
    if src.rdd.getNumPartitions() < sc.defaultParallelism:
        src = src.repartition(sc.defaultParallelism)
    base = _with_nrm(
        src.select(
            F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
        )
    ).withColumn("sigs", sigs_udf(F.col("e"))).localCheckpoint(eager=True)
    corpus = base.select(
        "vec_id", "e", "nrm", F.posexplode("sigs").alias("t", "sig")
    )

    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        F.posexplode("sigs").alias("t", "qsig"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qsig"),
            *[
                F.col("qsig").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(bits)
            ],
        )
        queries = queries.select(
            "query_id", "qe", "qn", "t", F.explode(probes).alias("qsig")
        )
    cand = (
        corpus.join(
            F.broadcast(queries),
            (queries.t == corpus.t)
            & (F.col("qsig") == F.col("sig"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_pre(
                    F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm")
                ),
                6,
            ).alias("cosine"),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def embedding_norm_screen(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    low: float = 0.1,
    dim: int | None = None,
) -> DataFrame:
    """Embedding sanity screen before anything consumes the vectors
    (ANN index, dedup, mixing): per-vector L2 norm plus defect flags —
    non-finite components, wrong dimensionality, near-zero norm. Broken
    embedder output (NaN rows, truncated vectors, zeroed batches) is a
    real failure mode at pipeline scale and silently poisons cosine math
    downstream (NaN propagates through every score it touches).

    One narrow scan-fused projection — the flags and the norm are pure
    array folds, no shuffle, no Python. ``dim=None`` skips the
    dimensionality check."""
    e = _as_double(vec_col)
    n_bad = F.aggregate(
        e,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.when(F.isnan(x) | x.isNull(), 1).otherwise(0),
    )
    norm = F.sqrt(F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x))
    cols = [
        F.col(id_col).alias("vec_id"),
        F.size(e).cast("long").alias("n_dim"),
        n_bad.alias("n_nonfinite"),
        # norm is undefined (NaN) with non-finite components — emit NULL
        # there so the value stays portable across engines
        F.when(n_bad == 0, F.round(norm, 6)).alias("l2_norm"),
    ]
    ok = (F.col("n_nonfinite") == 0) & (F.col("l2_norm") >= low)
    if dim is not None:
        ok = ok & (F.col("n_dim") == dim)
    return embeddings.select(*cols).withColumn("ok", ok)


def write_ann_store(
    embeddings: DataFrame,
    path: str,
    table: str = "ann_store_sigs",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int | None = None,
    tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    n_buckets: int = 16,
    build_key: str = "ann-v1",
    keep: int = 1,
    retain_s: float = storectl.RETAIN_SECONDS,
) -> None:
    """Persist a corpus's hyperplane-LSH ANN state once so later query
    batches probe it with ZERO corpus-side recompute — the vector-store
    shape (the embedding twin of ``dedup.write_signature_store``):

    - table ``<table>`` — exploded signature rows (t, sig, vec_id)
      bucketed AND sorted on (t, sig): the candidate equi-join on exactly
      the bucket keys reads the store with no Exchange and no Sort on the
      corpus side (plan-asserted in tests);
    - table ``<table>_vectors`` — (vec_id, e) bucketed+sorted on vec_id:
      the exact-scoring join shuffles only the (small) candidate set to
      the vectors' bucket layout, never the vectors themselves.

    Hyperplanes are fixed-seed, so signatures computed at probe time
    match the stored ones; every query batch is then O(|batch| x bucket
    occupancy) instead of re-hashing the corpus per search.

    Publication is atomic and cross-process safe (``sources.storectl``):
    both tables stage in a private build dir, and readers — this process
    or any other — resolve the store through the CURRENT pointer, so a
    probe concurrent with a rebuild sees the old or the new COMPLETE
    store, never a half-written one.

    ``bits=None`` (the default) AUTO-SIZES the hyperplane count from the
    corpus cardinality (:func:`auto_bits`) so bucket occupancy stays
    bounded as the store grows. Whatever recipe is used — auto or
    explicit — is persisted in the version marker; probes and
    appends self-configure from it, and explicitly mismatched values
    raise (``storectl.resolve_params``)."""
    base0 = _spread(embeddings).select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
    )
    if bits is None:
        # checkpoint BEFORE counting so the signing pass below reads the
        # materialized frame instead of re-scanning the raw input
        base0 = base0.localCheckpoint(eager=True)
        bits = auto_bits(base0.count())
    params = {
        "bits": bits,
        "tables": tables,
        "dim": dim,
        "seed": seed,
        "n_buckets": n_buckets,
    }
    all_planes = [hyperplanes(dim, bits, seed + 7919 * t) for t in range(tables)]
    sigs_udf = make_signatures_udf(all_planes)
    base = base0.withColumn("sigs", sigs_udf(F.col("e"))).localCheckpoint(
        eager=True
    )
    root = path.rstrip("/")
    build = storectl.new_build_dir(root)
    storectl.write_bucketed(
        base.select("vec_id", F.posexplode("sigs").alias("t", "sig")),
        build + "/sigs",
        ["t", "sig"],
        ["t", "sig"],
        n_buckets,
    )
    storectl.write_bucketed(
        base.select("vec_id", "e"),
        build + "/vectors",
        ["vec_id"],
        ["vec_id"],
        n_buckets,
    )
    ver = storectl.publish(
        root, build, build_key, keep=keep, retain_s=retain_s, params=params
    )
    _ANN_PARAMS[table] = params
    _register_ann(embeddings.sparkSession, table, ver, n_buckets)


def _register_ann(spark, table: str, ver: str, n_buckets: int) -> None:
    storectl.register_bucketed(
        spark, table, ver + "/sigs", ["t", "sig"], ["t", "sig"], n_buckets
    )
    storectl.register_bucketed(
        spark,
        table + "_vectors",
        ver + "/vectors",
        ["vec_id"],
        ["vec_id"],
        n_buckets,
    )


def open_ann_store(
    spark,
    path: str,
    table: str = "ann_store_sigs",
    n_buckets: int | None = None,
    build_key: str | None = None,
    version_dir: str | None = None,
) -> str | None:
    """Resolve the live version of an ANN store written by any process
    and register its catalog tables in THIS session — the reader half of
    the atomic-publish protocol. Returns the version dir, or None when
    no complete version exists (or ``build_key`` mismatches, meaning the
    on-disk store was built with a different recipe).

    ``version_dir``: pin a specific snapshot from
    ``storectl.list_versions`` instead of CURRENT — time travel over the
    immutable version history (e.g. probe the pre-append index while the
    appended one serves live traffic)."""
    ver = (
        version_dir
        if version_dir is not None
        else storectl.current_dir(path.rstrip("/"), build_key)
    )
    if ver is None:
        return None
    stored = storectl.params_of(ver)
    # an explicitly passed n_buckets that mismatches the store's recorded
    # value must raise like every sibling path (write/append/compact/
    # probe route through resolve_params) — silently registering the
    # bucketed tables with the wrong count would make every probe's
    # bucket-join read the wrong files (round-10 advice #2). Resolve
    # BEFORE touching _ANN_PARAMS: a raise after the cache write would
    # leave this table's previous registration paired with the NEW
    # store's recipe — the wrong-planes probe the cache hygiene below
    # exists to prevent.
    n_buckets = storectl.resolve_params(
        stored,
        {"n_buckets": n_buckets},
        {"n_buckets": _ANN_DEFAULTS["n_buckets"]},
    )["n_buckets"]
    if stored:
        _ANN_PARAMS[table] = stored
    else:
        # a legacy (pre-params) store must not inherit a recipe recorded
        # for a DIFFERENT store previously bound to this table name — a
        # stale entry would silently sign probes with the wrong planes
        _ANN_PARAMS.pop(table, None)
    _register_ann(spark, table, ver, n_buckets)
    return ver




def append_ann_store(
    embeddings: DataFrame,
    path: str,
    table: str = "ann_store_sigs",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int | None = None,
    tables: int | None = None,
    dim: int | None = None,
    seed: int | None = None,
    n_buckets: int | None = None,
    keep: int = 1,
    retain_s: float = storectl.RETAIN_SECONDS,
) -> None:
    """Fold a new embedding batch into an existing ANN store: signature
    rows and vectors append under the SAME bucket specs, so the probe's
    shuffle-free scan property is preserved (each append adds per-bucket
    files, it never re-shuffles the store).

    The hash recipe (bits/tables/dim/seed/n_buckets) is INHERITED from
    the store's version marker — appending under a different recipe
    would mix incompatible signatures into one table, so explicitly
    passed values that mismatch the marker raise
    (``storectl.resolve_params``).

    Append-only contract (the LSM trade, as in
    ``dedup.append_signature_store``): callers MUST feed vec_ids not
    already stored. A duplicated id leaves its vector row in the store
    twice; the scoring join then duplicates that candidate's scored rows
    and the per-query top-k window under-fills with distinct neighbors —
    repair with :func:`compact_ann_store` (one ``distinct()`` over the
    stored vectors, then a rewrite of both derived tables).

    Atomicity: the append hardlink-clones the current version (metadata
    only — no data bytes copy), adds the batch's files to the clone, and
    publishes it as a NEW version; concurrent readers keep the old
    complete version until the pointer flips."""
    root = path.rstrip("/")
    stored = storectl.current_params(root)
    requested = {"bits": bits, "tables": tables, "dim": dim, "seed": seed,
                 "n_buckets": n_buckets}
    params = storectl.resolve_params(stored, requested, _ANN_DEFAULTS)
    # legacy params-less store + omitted args: the resolved recipe is an
    # ASSUMPTION — republishing it as the store's recorded recipe would
    # later reject explicit-correct probes (round-10 advice #3)
    persist = storectl.persistable_params(stored, requested, params)
    bits, tables, dim, seed, n_buckets = (
        params["bits"], params["tables"], params["dim"], params["seed"],
        params["n_buckets"],
    )
    all_planes = [hyperplanes(dim, bits, seed + 7919 * t) for t in range(tables)]
    sigs_udf = make_signatures_udf(all_planes)
    base = (
        _spread(embeddings)
        .select(F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e"))
        .withColumn("sigs", sigs_udf(F.col("e")))
        .localCheckpoint(eager=True)
    )
    # serialized across processes: concurrent appenders queue on the
    # store's append lock so both batches land; publish's expect_base
    # check turns a bypassed lock into a loud StoreConflictError instead
    # of a silently dropped batch
    with storectl.append_lock(root):
        build, cur = storectl.clone_current(root)
        storectl.append_bucketed(
            base.select("vec_id", F.posexplode("sigs").alias("t", "sig")),
            build + "/sigs",
            ["t", "sig"],
            ["t", "sig"],
            n_buckets,
        )
        storectl.append_bucketed(
            base.select("vec_id", "e"),
            build + "/vectors",
            ["vec_id"],
            ["vec_id"],
            n_buckets,
        )
        meta = storectl.current_meta(root) or {}
        ver = storectl.publish(
            root,
            build,
            meta.get("build_key", "ann-v1"),
            keep=keep,
            retain_s=retain_s,
            expect_base=os.path.basename(cur),
            params=persist,
        )
    if persist is not None:
        _ANN_PARAMS[table] = persist
    else:
        _ANN_PARAMS.pop(table, None)  # assumed recipe: don't record it
    _register_ann(embeddings.sparkSession, table, ver, n_buckets)


def compact_ann_store(
    spark,
    path: str,
    table: str = "ann_store_sigs",
    bits: int | None = None,
    tables: int | None = None,
    dim: int | None = None,
    seed: int | None = None,
    n_buckets: int | None = None,
    build_key: str | None = None,
    keep: int = 1,
    retain_s: float = storectl.RETAIN_SECONDS,
) -> None:
    """Rebuild the ANN store from its own stored vectors with duplicate
    ids dropped — the repair for a crash-replayed append. The vectors
    table is the authoritative state (signatures are a pure fixed-seed
    function of it), so one distinct-by-id pass and a rewrite of both
    bucketed tables restores exact probe semantics; raw upstream
    embeddings are never touched. Among duplicate rows for one id the
    kept row is arbitrary — the append contract means they are replays
    of the same vector.

    Compaction builds a brand-new version from the live version's
    vectors and publishes it atomically — the live store never degrades
    mid-repair, and a compactor crash leaves the old version intact.
    ``build_key`` (default: inherited from the live version) stamps the
    published marker so callers can gate on "repaired" state. The hash
    recipe is inherited from the marker exactly as in
    :func:`append_ann_store` (explicit mismatches raise) — a compaction
    under different planes would orphan every probe."""
    root = path.rstrip("/")
    stored = storectl.current_params(root)
    requested = {"bits": bits, "tables": tables, "dim": dim, "seed": seed,
                 "n_buckets": n_buckets}
    params = storectl.resolve_params(stored, requested, _ANN_DEFAULTS)
    persist = storectl.persistable_params(stored, requested, params)
    bits, tables, dim, seed, n_buckets = (
        params["bits"], params["tables"], params["dim"], params["seed"],
        params["n_buckets"],
    )
    cur = storectl.current_dir(root)
    if cur is None:
        raise FileNotFoundError(f"no published ANN store under {root!r}")
    vectors = (
        spark.read.parquet(cur + "/vectors")
        .dropDuplicates(["vec_id"])
        .localCheckpoint(eager=True)
    )
    all_planes = [hyperplanes(dim, bits, seed + 7919 * t) for t in range(tables)]
    sigs_udf = make_signatures_udf(all_planes)
    signed = vectors.withColumn("sigs", sigs_udf(F.col("e"))).localCheckpoint(
        eager=True
    )
    build = storectl.new_build_dir(root)
    storectl.write_bucketed(
        signed.select("vec_id", F.posexplode("sigs").alias("t", "sig")),
        build + "/sigs",
        ["t", "sig"],
        ["t", "sig"],
        n_buckets,
    )
    storectl.write_bucketed(
        signed.select("vec_id", "e"),
        build + "/vectors",
        ["vec_id"],
        ["vec_id"],
        n_buckets,
    )
    if build_key is None:
        meta = storectl.current_meta(root) or {}
        build_key = meta.get("build_key", "ann-v1")
    ver = storectl.publish(
        root, build, build_key, keep=keep, retain_s=retain_s, params=persist
    )
    if persist is not None:
        _ANN_PARAMS[table] = persist
    else:
        _ANN_PARAMS.pop(table, None)  # assumed recipe: don't record it
    _register_ann(spark, table, ver, n_buckets)


def knn_from_store(
    queries: DataFrame,
    table: str = "ann_store_sigs",
    k: int = 10,
    bits: int | None = None,
    tables: int | None = None,
    dim: int | None = None,
    seed: int | None = None,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    path: str | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """Approximate top-k against a persisted :func:`write_ann_store`
    index: the query batch is signed with the same fixed-seed planes,
    candidates come from the (t, sig) equi-join against the bucketed
    store (corpus side Exchange-free), and exact cosines are computed by
    joining the candidate ids back to the bucketed vectors table. Same
    (bits, tables, multiprobe) semantics — and, for queries drawn from
    the indexed corpus, the same output — as :func:`knn_lsh`
    (equivalence pytest-pinned).

    ``path``: store root for probing an index written by ANOTHER process
    (resolves the live version through the atomic CURRENT pointer and
    registers the catalog tables here); omit it when this session just
    wrote/opened the store under ``table``.

    The plane recipe (bits/tables/dim/seed) SELF-CONFIGURES from the
    store — the version marker when ``path`` is given, else the recipe
    recorded when this process wrote/opened ``table``. A probe signed
    under different planes never errors on its own (its signatures just
    land in the wrong buckets and recall silently collapses), so
    explicitly passed values that mismatch the store's recipe raise
    (round-9 verdict #1)."""
    spark = queries.sparkSession
    # Resolve the version dir ONCE and read params from THAT version:
    # reading current_params and then letting open_ann_store re-resolve
    # CURRENT separately is a TOCTOU — a concurrent republish with a
    # different auto-sized recipe between the two reads would sign the
    # queries with stale planes against the new store, the silent
    # under-recall this self-configuration exists to prevent (round-10
    # advice #1). Params and registered data now come from one version.
    ver = None
    if path is not None:
        ver = storectl.current_dir(path.rstrip("/"))
        if ver is None:
            raise FileNotFoundError(
                f"no published ANN store under {path!r} — write_ann_store first"
            )
        stored = storectl.params_of(ver)
    else:
        stored = _ANN_PARAMS.get(table)
    params = storectl.resolve_params(
        stored,
        {"bits": bits, "tables": tables, "dim": dim, "seed": seed,
         "n_buckets": n_buckets},
        _ANN_DEFAULTS,
    )
    bits, tables, dim, seed = (
        params["bits"], params["tables"], params["dim"], params["seed"]
    )
    if path is not None:
        open_ann_store(
            spark,
            path,
            table=table,
            n_buckets=params["n_buckets"],
            version_dir=ver,
        )
    all_planes = [hyperplanes(dim, bits, seed + 7919 * t) for t in range(tables)]
    sigs_udf = make_signatures_udf(all_planes)
    q = (
        _with_nrm(
            queries.select(
                F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qe")
            ),
            vec_col="qe",
            out="qn",
        )
        .withColumn("sigs", sigs_udf(F.col("qe")))
        .localCheckpoint(eager=True)
    )
    qrows = q.select("query_id", F.posexplode("sigs").alias("t", "qsig"))
    if multiprobe:
        probes = F.array(
            F.col("qsig"),
            *[
                F.col("qsig").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(bits)
            ],
        )
        qrows = qrows.select("query_id", "t", F.explode(probes).alias("qsig"))
    store = spark.table(table)
    cand = (
        qrows.join(
            store,
            (qrows.t == store.t)
            & (F.col("qsig") == F.col("sig"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", "vec_id")
        .distinct()
    )
    vectors = _with_nrm(spark.table(table + "_vectors"))
    scored = (
        cand.join(vectors, "vec_id")
        .join(q.select("query_id", "qe", "qn"), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_pre(
                    F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm")
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def knn_join(
    embeddings: DataFrame,
    k: int = 3,
    bits: int | None = None,
    tables: int = 16,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """kNN GRAPH construction — every corpus vector gets its top-``k``
    cosine neighbors (the primitive under clustering-based curation,
    agglomerative dedup, and diversity analysis of embedding corpora).
    Output: (vec_id, neighbor_id, cosine, rank).

    The self-join twin of :func:`knn_lsh`: one signature table (L
    b-bit hyperplane tables per vector, Arrow-batched matmul,
    materialized ONCE — both self-join sides read it), candidates from
    an equi-join on (table, signature) with 1-bit multiprobe flips on
    the probe side (capped at 4 so fan-out stays constant as ``bits``
    grows with log2(n)), candidate ids deduped BEFORE the vectors are
    fetched (the wide embedding arrays move through two equi-joins, not
    the dedup shuffle), exact cosine scoring, one per-vector top-k
    window. ``bits`` defaults to max(4, log2(n/64)) so expected bucket
    occupancy — and with it candidate count per vector — stays constant
    as the corpus grows; recall lost to wider signatures is bought back
    with ``tables``. Everything after the signature kernel is JVM-side.

    The gate entry's settings reach measured recall 1.0 on the test
    corpus (deterministic seed-derived hyperplanes: verified-equal means
    always-equal), which lets the brute-force SQL oracle verify the
    full LSH machinery end-to-end — the same evidence style as
    knn_cosine_lsh/ivf."""
    import math

    base = _spread(embeddings).select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
    )
    if bits is None:
        n = base.count()
        bits = max(4, int(math.ceil(math.log2(max(n, 128) / 64.0))))
    all_planes = [hyperplanes(dim, bits, seed + 7919 * t) for t in range(tables)]
    sigs_udf = make_signatures_udf(all_planes)
    sigs = (
        base.select("vec_id", sigs_udf(F.col("e")).alias("sigs"))
        .select("vec_id", F.posexplode("sigs").alias("t", "sig"))
        .localCheckpoint(eager=True)  # both self-join sides read this
    )
    b_side = sigs.select(F.col("vec_id").alias("id_b"), "t", "sig")
    a_side = sigs.select(F.col("vec_id").alias("id_a"), "t", "sig")
    if multiprobe:
        probes = F.array(
            F.col("sig"),
            *[
                F.col("sig").bitwiseXOR(F.lit(1 << i).cast("long"))
                for i in range(min(bits, 4))
            ],
        )
        a_side = a_side.select("id_a", "t", F.explode(probes).alias("sig"))
    cand = (
        a_side.join(b_side, ["t", "sig"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    based = _with_nrm(base)
    ea = based.select(
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    eb = based.select(
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    scored = cand.join(ea, "id_a").join(eb, "id_b").select(
        F.col("id_a").alias("vec_id"),
        F.col("id_b").alias("neighbor_id"),
        F.round(
            cosine_pre(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def spherical_kmeans(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic spherical k-means coarse quantizer (the IVF training
    step). Returns a (n_centroids, dim) float64 numpy array of unit
    centroids.

    Distributed Lloyd iterations: assignment is a vectorized Arrow-batched
    argmax-dot against the broadcast centroid matrix (executors, one numpy
    matmul per batch); the update is ``posexplode(dim) -> groupBy(cluster,
    dim).avg`` — only k x dim aggregated values ever reach the driver, so
    the loop holds at any corpus size. Init = the first ``n_centroids``
    vectors by id (deterministic, seed-free)."""
    import numpy as np

    base = _spread(embeddings).select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
    )
    norm = (
        base.withColumn("nrm", F.sqrt(dot(F.col("e"), F.col("e"))))
        .select(
            "vec_id", F.transform("e", lambda x: x / F.col("nrm")).alias("e")
        )
        .persist()
    )
    first = norm.orderBy("vec_id").limit(n_centroids).collect()
    C = np.array([r["e"] for r in first], dtype="float64")
    C /= np.linalg.norm(C, axis=1, keepdims=True)

    for _ in range(iters):
        assign = assign_centroid_udf(C, nprobe=1)
        assigned = norm.select(
            F.element_at(assign(F.col("e")), 1).alias("c"), "e"
        )
        sums = (
            assigned.select("c", F.posexplode("e").alias("d", "v"))
            .groupBy("c", "d")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        newC = C.copy()
        acc = np.zeros_like(C)
        seen = set()
        for r in sums:
            acc[r["c"], r["d"]] = r["s"]
            seen.add(r["c"])
        for c in seen:
            v = acc[c]
            n = np.linalg.norm(v)
            if n > 0:
                newC[c] = v / n  # empty clusters keep their old centroid
        C = newC
    # blocking: the training cache is dead here, and letting the async
    # ContextCleaner free it later steals scheduler time from whatever
    # query runs next (measured as bench-timing noise on the entry that
    # follows this one).
    norm.unpersist(blocking=True)
    return C


def assign_centroid_udf(centroids, nprobe: int = 1):
    """Arrow-batched kernel: top-``nprobe`` centroid ids by dot product
    (cosine order for unit centroids) — one (batch, dim) x (dim, k) matmul."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype="float64")  # (k, dim)
    p = min(nprobe, len(C))

    @pandas_udf("array<int>")
    def assign(e: pd.Series) -> pd.Series:
        X = np.stack(e.to_numpy())  # (n, dim)
        S = X @ C.T  # (n, k)
        top = np.argpartition(-S, p - 1, axis=1)[:, :p]
        rows = np.arange(len(X))[:, None]
        order = np.argsort(-S[rows, top], axis=1, kind="stable")
        return pd.Series(list(top[rows, order].astype("int32")))

    return assign


def knn_ivf(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer: corpus vectors are
    inverted-listed under their nearest centroid; each query scores only
    the ``nprobe`` nearest lists. Candidate selection is an equi-join on
    the centroid id — the corpus shuffles once into k lists, queries
    explode into nprobe probes (recall rises with nprobe, reaching exact
    at nprobe=k).

    At cluster scale the inverted lists would be written bucketed-by-cell
    once and reused across query batches; here the train+assign runs
    inline. Scoring is the same JVM-side exact cosine as brute force."""
    C = spherical_kmeans(
        embeddings, n_centroids, train_iters, id_col=id_col, vec_col=vec_col
    )
    base = _spread(embeddings).select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
    )
    one = assign_centroid_udf(C, nprobe=1)
    corpus = _with_nrm(base).select(
        "vec_id", "e", "nrm", F.element_at(one(F.col("e")), 1).alias("cell")
    )
    probe = assign_centroid_udf(C, nprobe=nprobe)
    queries = _with_nrm(
        base.filter(F.col("vec_id").isin(query_ids)), out="qn"
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        "qn",
        F.explode(probe(F.col("e"))).alias("cell"),
    )
    cand = (
        queries.join(corpus, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_pre(
                    F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm")
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def cosine_allpairs_blocked(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold via blocked matrix products —
    the right tool for the OUTPUT-DENSE regime (low threshold, no planted
    structure), where any LSH degrades toward all-pairs but pays bucket-
    join machinery on top.  When the output is Theta(n^2)-ish, the
    optimal plan is the one with the best constant per pair: a blocked
    GEMM.

    Scale shape (the sqrt-replication all-pairs scheme): vectors hash
    into ``n_blocks`` balanced blocks; each unordered block pair (i<=j)
    is ONE task, and each vector is shuffled to exactly ``n_blocks``
    tasks — total communication n*B rows, vs the candidate-pair
    explosion an LSH join produces here.  Each task runs a single
    float64 matrix product over Arrow-delivered batches (numpy, all
    cores).  Grow B ~ sqrt(n/rows_per_task) to hold per-task memory
    constant; no task ever sees more than 2n/B vectors.

    Bit-parity: the GEMM only nominates candidates (threshold minus a
    1e-6 slack, far above float64 GEMM error ~1e-14 but wide enough to
    cover the round-to-6 boundary); every candidate is re-scored with
    the same JVM ``cosine()`` expression the exact variant and the SQL
    oracle use, so emitted values are bit-identical to theirs.  Recall
    is exact by construction — every pair shares exactly one task."""
    import numpy as np

    if n_blocks is None:
        # scale-adaptive block count (r13, guide §2: no constants tuned
        # for one scale): derive from the optimizer's planning-time size
        # estimate — zero extra jobs — targeting
        # ``spark.scipi.ann.blockRows`` rows per block (default 4096 ≈
        # tens of MB of replicated vectors and a ~1.3e9-flop GEMM per
        # block-pair task at dim 64). The 16-block floor reproduces the
        # measured-good local plan exactly at every bench SF (the
        # formula only exceeds it past ~65K vectors); the 512 cap keeps
        # the task count (B^2/2) and per-vector replication factor (B)
        # bounded at extreme sizes.
        spark = embeddings.sparkSession
        try:
            target = int(spark.conf.get("spark.scipi.ann.blockRows", "4096"))
            nbytes = int(
                embeddings._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
            n_est = nbytes // 300  # ~bytes per 64-float row, estimate
            n_blocks = max(16, min(512, -(-n_est // target)))
        except Exception:
            n_blocks = 16
    base = _spread(embeddings).select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
    )
    B = n_blocks
    blk = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(B)).cast("int")
    rows = base.select("vec_id", "e", blk.alias("blk"))
    # task ids for block pair (ba, bb), ba<=bb, encoded ba*B+bb: a row in
    # block b serves as the a-side of (b, j>=b) and the b-side of (i<b, b)
    upper = F.transform(
        F.sequence(F.col("blk"), F.lit(B - 1)),
        lambda j: F.col("blk") * B + j,
    )
    # sequence(0, blk-1) would generate a DESCENDING range for blk=0
    lower = F.when(
        F.col("blk") > 0,
        F.transform(
            F.sequence(F.lit(0), F.col("blk") - 1),
            lambda i: i * B + F.col("blk"),
        ),
    ).otherwise(F.array().cast("array<int>"))
    replicated = rows.select(
        "vec_id", "e", "blk", F.explode(F.concat(upper, lower)).alias("task")
    )
    slack = 1e-6  # covers round(,6) boundary pairs; GEMM error is ~1e-14

    def gemm(pdf: pd.DataFrame) -> pd.DataFrame:
        task = int(pdf["task"].iloc[0])
        ba, bb = divmod(task, B)
        ids = pdf["vec_id"].to_numpy()
        E = np.array(pdf["e"].tolist(), dtype=np.float64)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        if ba == bb:
            C = En @ En.T
            ii, jj = np.nonzero(np.triu(C >= threshold - slack, k=1))
            a_ids, b_ids = ids[ii], ids[jj]
        else:
            amask = (pdf["blk"] == ba).to_numpy()
            ii, jj = np.nonzero(En[amask] @ En[~amask].T >= threshold - slack)
            a_ids, b_ids = ids[amask][ii], ids[~amask][jj]
        lo = np.minimum(a_ids, b_ids)
        hi = np.maximum(a_ids, b_ids)
        return pd.DataFrame({"id_a": lo, "id_b": hi})

    cand = replicated.groupBy("task").applyInPandas(gemm, "id_a long, id_b long")
    based = _with_nrm(base)
    ea = based.select(
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
    )
    eb = based.select(
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    # no distinct needed: every unordered pair lives in exactly one task
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                cosine_pre(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int | None = None,
    tables: int = 16,
    multiprobe: bool = True,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """All pairs (a<b) with cosine >= threshold.

    ``bits=None`` is the exact O(n²) variant (the recall oracle / small-n
    verification tool). With ``bits`` set, this is the scale path — the
    embedding twin of MinHash banding: ``tables`` independent b-bit
    hyperplane signatures per vector; a pair is a candidate iff its
    signatures collide in ANY table (within Hamming-1 when ``multiprobe``,
    which flips each bit on one join side only). Candidates are scored
    with the exact cosine, so precision is exact and only recall is
    probabilistic: ~1-(1-q)^L with q = p^b + b*p^(b-1)*(1-p), p =
    1 - angle/pi.

    Shuffle shape: the corpus shuffles once on (table, signature) — never
    the cross product; candidate ids are deduped BEFORE scoring so the
    wide embedding arrays move through equi-joins, not the dedup shuffle.
    At larger corpora raise ``bits`` (~log2(n / target bucket size)) to
    keep buckets bounded; recall lost to wider signatures is bought back
    with ``tables``."""
    base = _spread(embeddings).select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
    )
    if bits is not None:
        all_planes = [
            hyperplanes(dim, bits, seed + 7919 * t) for t in range(tables)
        ]
        sigs_udf = make_signatures_udf(all_planes)
        # both sides of the candidate self-join read sigs — materialize
        # once or the Arrow signature UDF (the expensive stage) executes
        # twice (self-join sides never share subplans)
        sigs = base.select(
            "vec_id", sigs_udf(F.col("e")).alias("sigs")
        ).select("vec_id", F.posexplode("sigs").alias("t", "sig")).localCheckpoint(
            eager=True
        )
        b_side = sigs.select(
            F.col("vec_id").alias("id_b"), "t", "sig"
        )
        a_side = sigs.select(F.col("vec_id").alias("id_a"), "t", "sig")
        if multiprobe:
            # flip at most 4 bits: probe fan-out stays constant as bits
            # scales with log2(n), instead of growing the candidate join
            # by another factor of bits
            probes = F.array(
                F.col("sig"),
                *[
                    F.col("sig").bitwiseXOR(F.lit(1 << i).cast("long"))
                    for i in range(min(bits, 4))
                ],
            )
            a_side = a_side.select(
                "id_a", "t", F.explode(probes).alias("sig")
            )
        cand = (
            a_side.join(
                b_side,
                ["t", "sig"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        based = _with_nrm(base)
        ea = based.select(
            F.col("vec_id").alias("id_a"),
            F.col("e").alias("ea"),
            F.col("nrm").alias("na"),
        )
        eb = based.select(
            F.col("vec_id").alias("id_b"),
            F.col("e").alias("eb"),
            F.col("nrm").alias("nb"),
        )
        pairs = cand.join(ea, "id_a").join(eb, "id_b")
    else:
        based = _with_nrm(base)
        a = based.select(
            F.col("vec_id").alias("id_a"),
            F.col("e").alias("ea"),
            F.col("nrm").alias("na"),
        )
        b = based.select(
            F.col("vec_id").alias("id_b"),
            F.col("e").alias("eb"),
            F.col("nrm").alias("nb"),
        )
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    # no terminal dropDuplicates (r12): pairs are unique by construction
    # on BOTH paths — bits: candidate (id_a, id_b) are .distinct()-ed
    # before the two equi-joins on the unique vec_id key; exact: a
    # crossJoin filtered to id_a < id_b over unique ids. The old
    # belt-and-braces dedup was a full Exchange + two aggregate stages
    # over the scored output for zero row change (precondition, same as
    # every sibling operator: vec_id unique in the input).
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(
                cosine_pre(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# Embedding quantization
# ---------------------------------------------------------------------------

def quantize_embeddings_stats(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/serving shape
    of every large vector store (4x smaller than float32, SIMD-friendly
    dot products): scale = max|x| / 127, q_i = round(x_i / scale).

    Pure Column expressions (transform/aggregate/array_max) — a narrow
    map over the embedding column, no shuffle at all; at 100 TB this
    fuses into the scan and writes back columnar.

    Output pins every quantized element through exact integer aggregates
    (sum, L1, min, max — integers stay exact in doubles, so the values
    are order-independent) plus the round-6 scale and max reconstruction
    error, instead of shipping arrays through the value-hash gate."""
    e = F.transform(vec_col, lambda x: x.cast("double"))
    amax = F.array_max(F.transform(e, lambda x: F.abs(x)))
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    base = df.select(
        F.col(id_col).alias("vec_id"), e.alias("e"), scale.alias("scale")
    )
    q = F.transform("e", lambda x: F.round(x / F.col("scale"), 0))
    qsum = lambda expr: F.aggregate(
        expr, F.lit(0.0), lambda acc, x: acc + x
    )
    err = F.zip_with("e", "q", lambda x, qi: F.abs(x - qi * F.col("scale")))
    # metrics first, rounding in a SECOND projection: putting
    # round(scale,6) AS scale in the same select would shadow the child's
    # scale for the sibling err expression via lateral column alias
    # resolution (observed: max_err silently computed against the rounded
    # scale)
    metrics = base.withColumn("q", q).select(
        "vec_id",
        "scale",
        qsum(F.col("q")).cast("long").alias("q_sum"),
        qsum(F.transform("q", lambda x: F.abs(x))).cast("long").alias("q_l1"),
        F.array_min("q").cast("long").alias("q_min"),
        F.array_max("q").cast("long").alias("q_max"),
        F.array_max(err).alias("raw_err"),
    )
    return metrics.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        "q_sum",
        "q_l1",
        "q_min",
        "q_max",
        F.round("raw_err", 6).alias("max_err"),
    )


# ---------------------------------------------------------------------------
# Semantic deduplication (SemDeDup-style: cluster, then prune within cluster)
# ---------------------------------------------------------------------------

def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    nprobe: int = 2,
    train_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, the
    published recipe for embedding-space dedup of web-scale corpora):
    cluster the embeddings with a spherical k-means coarse quantizer,
    then WITHIN each cluster drop every vector whose cosine to some
    lower-id vector clears ``threshold``. Returns ``(vec_id, kept)``
    for every input vector — keep-policy is deterministic (the lowest
    id in a duplicate neighborhood survives; removal of ``v`` depends
    only on the existence of a more-senior near-duplicate, never on
    whether that senior was itself removed, exactly the non-chaining
    SemDeDup semantics).

    Scale shape: this is the regime where near-dup pairs are a sparse
    planted structure (true copies at cosine ~0.99), so clustering makes
    the quadratic term local — cost is sum of |cell|^2 over cells, not
    n^2, and the corpus shuffles once on the cell id. At 100 TB,
    ``n_centroids`` grows ~sqrt(n) (SemDeDup used 11k clusters for
    LAION) so cells stay bounded; the k-means update aggregates only
    k x dim values to the driver per iteration. Duplicates straddling a
    cell boundary are caught by assigning each vector to its ``nprobe``
    nearest cells (near-identical vectors have near-identical centroid
    score vectors, so their top-``nprobe`` sets overlap) — candidate
    pairs are deduped before scoring, and scoring reuses the exact
    JVM-side cosine, so precision is exact. ``train_iters`` defaults
    low: the centroids are only a partitioner — correctness never
    depends on their quality (near-dups co-locate at any centroid
    placement via nprobe), so extra Lloyd rounds buy balance, not
    accuracy. Pass ``centroids`` (a (k, dim) array from
    :func:`spherical_kmeans`) to skip training entirely — the
    production shape, where the quantizer is fitted once and reused
    across daily dedup runs.
    """
    C = (
        centroids
        if centroids is not None
        else spherical_kmeans(
            embeddings, n_centroids, train_iters, id_col=id_col, vec_col=vec_col
        )
    )
    base = _spread(embeddings).select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
    )
    # argmax-dot ordering is scale-invariant (centroids are unit), so the
    # raw doubles assign identically to their normalized form — and pair
    # scores on the raw doubles keep the arithmetic identical to the
    # exact-cosine oracle formula.
    probe = assign_centroid_udf(C, nprobe=nprobe)
    cells = _with_nrm(base).select(
        "vec_id", "e", "nrm", F.explode(probe(F.col("e"))).alias("cell")
    ).localCheckpoint(eager=True)  # both self-join sides read this
    a = cells.select(
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
        "cell",
    )
    b = cells.select(
        F.col("vec_id").alias("id_b"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
        "cell",
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(
                cosine_pre(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")),
                6,
            )
            >= F.lit(threshold)
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return base.join(
        dropped.withColumn("_dropped", F.lit(True)), "vec_id", "left"
    ).select("vec_id", (~F.coalesce("_dropped", F.lit(False))).alias("kept"))


# ---------------------------------------------------------------------------
# Planted near-duplicate fixture (shared by entries, oracles, and tests)
# ---------------------------------------------------------------------------

def perturbed_copies(
    df: DataFrame,
    dim: int = 64,
    factor: float = 0.1,
    id_offset: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "e",
) -> DataFrame:
    """Deterministic planted near-copies: e'_i = e_i + factor * e_{(i+1)
    mod dim}, ids shifted by ``id_offset`` — derived from the corpus
    (max id + 1) when not given, so the planted namespace is disjoint at
    ANY scale factor (a fixed constant collides once real ids reach it,
    round-3 advice) while copies keep HIGHER ids than their originals
    (semantic_dedup's lower-id-wins keep policy depends on it; cosine vs
    the original ~0.99 at factor=0.1 on random vectors). The SINGLE
    source of the planted construction — the DuckDB oracle comprehension
    ``[e[i] + 0.1 * e[(i % 64) + 1] for i in range(1, 65)]`` must stay
    bit-identical to this expression; keep them in lockstep."""
    if id_offset is None:
        id_offset = df.agg(F.max(id_col)).first()[0] + 1
    return df.select(
        (F.col(id_col) + F.lit(id_offset)).alias(id_col),
        F.transform(
            vec_col,
            lambda x, i: x
            + factor
            * F.element_at(F.col(vec_col), ((i + 1) % dim + 1).cast("int")),
        ).alias(vec_col),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — the compressed-corpus regime
# ---------------------------------------------------------------------------

def pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train PQ codebooks (Jégou et al. 2011): the vector splits into
    ``m`` subspaces of ``dim/m`` dims, each quantized independently by a
    ``ksub``-centroid k-means. Returns a (m, ksub, dim/m) float64 numpy
    array.

    Distributed shape mirrors :func:`spherical_kmeans`: assignment is one
    Arrow-batched numpy pass computing ALL m subspace argmins per batch
    (m small matmuls, no shuffle), the update is a single
    ``posexplode -> groupBy(subspace, code, dim)`` aggregation — only
    m x ksub x (dim/m) aggregated doubles reach the driver per
    iteration, so training holds at any corpus size (at 100 TB you'd
    train on a hash-sampled slice; the plumbing is identical). Init =
    subvectors of the first ``ksub`` vectors by id (deterministic,
    seed-free)."""
    import numpy as np

    assert dim % m == 0
    dsub = dim // m
    base = _spread(embeddings).select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
    )
    first = base.orderBy("vec_id").limit(ksub).collect()
    # C[s] : (ksub, dsub) codebook for subspace s
    C = np.array(
        [[r["e"][s * dsub : (s + 1) * dsub] for r in first] for s in range(m)],
        dtype="float64",
    )
    for _ in range(iters):
        codes_udf = pq_encode_udf(C)
        coded = base.select(F.posexplode(codes_udf(F.col("e"))).alias("s", "c"), "e")
        sums = (
            coded.select(
                "s",
                "c",
                F.posexplode(
                    F.slice(
                        "e", F.col("s") * dsub + 1, dsub
                    )
                ).alias("d", "v"),
            )
            .groupBy("s", "c", "d")
            .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        newC = C.copy()
        for r in sums:
            newC[r["s"], r["c"], r["d"]] = r["sv"] / r["n"]
        C = newC
    return C


def pq_encode_udf(codebooks):
    """Arrow kernel: (dim,) -> array<int> of m subspace code ids (argmin
    L2 to the subspace codebook — one (batch, dsub) x (dsub, ksub)
    matmul per subspace)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(codebooks, dtype="float64")  # (m, ksub, dsub)
    m, ksub, dsub = C.shape
    # ||c||^2 per subspace centroid, precomputed once
    c_sq = (C**2).sum(axis=2)  # (m, ksub)

    @pandas_udf("array<int>")
    def encode(e: pd.Series) -> pd.Series:
        X = np.stack(e.to_numpy())  # (n, dim)
        n = len(X)
        codes = np.empty((n, m), dtype="int32")
        for s in range(m):
            Xs = X[:, s * dsub : (s + 1) * dsub]  # (n, dsub)
            # argmin ||x - c||^2 = argmin (||c||^2 - 2 x.c)
            scores = c_sq[s][None, :] - 2.0 * (Xs @ C[s].T)
            codes[:, s] = np.argmin(scores, axis=1)
        return pd.Series(list(codes))

    return encode


def pq_encode(
    embeddings: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes: array<int>) — m bytes of code per vector in
    principle (ksub<=256), a 32x storage cut vs float32 at m=8 on
    dim=64: the shape that lets a 100 TB embedding corpus live in
    executor memory for scoring."""
    base = _spread(embeddings).select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
    )
    enc = pq_encode_udf(codebooks)
    return base.select("vec_id", enc(F.col("e")).alias("codes"))


def knn_cosine_pq(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    train_iters: int = 3,
    rerank: int | None = 50,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks=None,
) -> DataFrame:
    """Approximate top-k via PQ asymmetric distance computation (ADC):
    each query precomputes an (m, ksub) lookup table of subspace dot
    products against the codebooks; a corpus vector's approximate dot is
    the sum of m table lookups on its codes — no decompression, no
    corpus shuffle (scan -> narrow Arrow map -> per-partition top-k).

    ``rerank``: the standard two-stage shape — take the top ``rerank``
    ADC candidates per query, re-score those exactly, return the exact
    top ``k``. Precision of the final scores is exact; only recall is
    approximate (rising with rerank, ksub, and m)."""
    import numpy as np

    # codebooks may be passed in (the production shape: a daily ANN job
    # trains the quantizer once and every query batch reuses it; training
    # is deterministic so a retrain is bit-identical)
    C = (
        codebooks
        if codebooks is not None
        else pq_codebooks(
            embeddings, m, ksub, train_iters, dim, id_col=id_col, vec_col=vec_col
        )
    )
    base = _spread(embeddings).select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
    )
    qrows = base.filter(F.col("vec_id").isin(query_ids)).collect()
    dsub = dim // m
    # norms for cosine: query norm exact; corpus norm from reconstruction
    luts = {}  # qid -> (m, ksub) dot tables
    qnorm = {}
    for r in qrows:
        q = np.asarray(r["e"], dtype="float64")
        qnorm[r["vec_id"]] = float(np.sqrt((q**2).sum()))
        luts[r["vec_id"]] = np.stack(
            [C[s] @ q[s * dsub : (s + 1) * dsub] for s in range(m)]
        )
    # reconstructed corpus norms per code combination are vector-specific:
    # ||x_hat||^2 = sum_s ||c_{s,code_s}||^2
    c_sq = (np.asarray(C) ** 2).sum(axis=2)  # (m, ksub)
    qids = sorted(luts)
    lut_arr = np.stack([luts[q] for q in qids])  # (Q, m, ksub)
    qn_arr = np.array([qnorm[q] for q in qids])

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    top_r = rerank or k
    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("vec_id", LongType()),
            StructField("adc", DoubleType()),
        ]
    )
    qid_arr = np.array(qids, dtype="int64")
    sub = np.arange(m)
    Cn = np.asarray(C, dtype="float64")

    def adc_topk(batches):
        # Per-Arrow-batch FUSED encode + ADC + top-R fold (round-10:
        # the encode pandas_udf used to be its own Arrow stage over the
        # whole corpus; folding the m small argmin matmuls into this
        # kernel removes one corpus-wide Python round-trip). Only Q x R
        # rows leave each batch — the full Q x n score matrix never
        # materializes outside the kernel and never shuffles. Tie-break
        # (adc desc, vec_id asc) matches the final window's ordering
        # exactly.
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["e"].to_numpy())  # (n, dim)
            Cd = np.empty((len(X), m), dtype="int64")
            for s in range(m):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                Cd[:, s] = np.argmin(
                    c_sq[s][None, :] - 2.0 * (Xs @ Cn[s].T), axis=1
                )
            vids = pdf["vec_id"].to_numpy()
            dots = lut_arr[:, sub, Cd].sum(axis=2)  # (Q, n)
            cn = np.sqrt(c_sq[sub, Cd].sum(axis=1))  # (n,)
            cos = dots / (qn_arr[:, None] * np.maximum(cn, 1e-12)[None, :])
            frames = []
            for qi in range(len(qid_arr)):
                mask = vids != qid_arr[qi]
                idx = np.nonzero(mask)[0]
                order = np.lexsort((vids[idx], -cos[qi, idx]))[:top_r]
                sel = idx[order]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid_arr[qi],
                            "vec_id": vids[sel],
                            "adc": cos[qi, sel],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    pre = base.mapInPandas(adc_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    cand = pre.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= top_r
    )
    if rerank is None:
        return cand.select(
            "query_id", "vec_id", F.round("adc", 6).alias("cosine")
        )
    # exact re-rank of the short candidate list
    qe = _with_nrm(
        base.filter(F.col("vec_id").isin(query_ids)), out="qn"
    ).select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), "qn")
    exact = (
        cand.select("query_id", "vec_id")
        .join(_with_nrm(base), "vec_id")
        .join(F.broadcast(qe), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_pre(
                    F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm")
                ),
                6,
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return exact.withColumn("_rn", F.row_number().over(w2)).filter(
        F.col("_rn") <= k
    ).drop("_rn")


def label_coherence(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label prototype audit — the label-quality screen run before
    training a classifier on weakly-labeled embeddings: each label's
    exact mean vector (nearest-class-mean prototype), member count, and
    coherence = mean cosine of members to their own prototype. A label
    whose coherence sits far below the others is noisy or conflates two
    concepts; the same prototype table seeds nearest-class-mean
    classification and per-class sampling.

    Plan: one posexplode -> (label, pos) sum/count aggregation [the only
    corpus-sized shuffle; k*dim result rows], prototypes reassembled with
    array_sort (deterministic order), then members broadcast-join their
    label's prototype for one scoring pass + per-label rollup. Exact
    arithmetic: the prototype is a ratio of exact sums; double summation
    order differs between engines by ~1e-15, far below the round-6
    contract."""
    base = _spread(embeddings).select(
        F.col(label_col).alias("label"), _as_double(vec_col).alias("e")
    )
    comp = base.select("label", F.posexplode("e").alias("pos", "x"))
    stats = comp.groupBy("label", "pos").agg(
        F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n")
    )
    # Each prototype component divides by its OWN per-position count (the
    # count rides along in the collect_list struct) — matching the
    # oracle's per-position semantics unconditionally, including ragged
    # or null-holding embedding arrays (round-3 advice; previously a
    # single F.max(n) divided every component). The reported member
    # count n stays max over positions on both sides.
    cents = (
        stats.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sx", "n"))),
                lambda s: s.sx / s.n,
            ).alias("c"),
            F.max("n").cast("long").alias("n"),
        )
        .select("label", "n", "c")
    )
    cents = cents.withColumn("norm", F.sqrt(dot(F.col("c"), F.col("c"))))
    # a zero-norm prototype (exactly antipodal members) has no direction
    # to cohere to — those labels get NULL coherence instead of a 0/0
    # the prototype's norm column IS sqrt(dot(c,c)) — reuse it instead of
    # re-deriving it per member row (cosine_pre bit-identity argument)
    scored = base.join(
        F.broadcast(cents.filter(F.col("norm") > 0)), "label"
    ).select(
        "label",
        F.round(
            cosine_pre(
                F.col("e"),
                F.col("c"),
                F.sqrt(dot(F.col("e"), F.col("e"))),
                F.col("norm"),
            ),
            6,
        ).alias("cos"),
    )
    coh = scored.groupBy("label").agg(
        F.round(F.avg("cos"), 6).alias("coherence")
    )
    return (
        cents.select(
            "label", "n", F.round(F.col("norm"), 6).alias("centroid_norm")
        )
        .join(coh, "label", "left")
    )


def knn_cosine_ivfpq(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    train_iters: int = 3,
    rerank: int | None = 50,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
    codebooks=None,
) -> DataFrame:
    """IVF-PQ composite ANN (the FAISS IVFPQ shape, Jégou et al. 2011
    §V): an IVF coarse quantizer prunes the corpus to ``nprobe`` cells
    per query, and a RESIDUAL product quantizer scores the survivors by
    ADC — the two approximations compose, so the index is both
    list-pruned (scan cost ~ nprobe/n_centroids of the corpus) and
    32x-compressed (m bytes per vector).

    Training: spherical k-means centroids on the corpus, then PQ
    codebooks on the RESIDUALS e - c(e) (residuals are what makes the
    composite beat plain PQ: they are centered, so the sub-codebooks
    spend their 2^ksub codes on a tighter distribution). Both trainers
    are the existing deterministic distributed loops; pass
    ``centroids``/``codebooks`` to reuse a cached model (the production
    shape — train daily, probe per batch).

    Scoring (cosine via reconstruction): for query q and a vector in
    cell c with codes t, q . x_hat = q . c + sum_s LUT[s, t_s] with
    LUT = q-subvector dots against the residual codebooks; ||x_hat||^2
    = ||c||^2 + 2 c.r_hat + ||r_hat||^2 from per-cell precomputed code
    tables. All tables are (n_centroids x m x ksub) scalars built once
    per query batch on the driver and closed over an Arrow kernel; per
    batch only Q x R candidate rows leave each task, and the exact
    re-rank touches only those. Recall reaches 1.0 as nprobe ->
    n_centroids (the gate's oracle regime); production operates at
    nprobe << n_centroids."""
    import numpy as np

    C = (
        centroids
        if centroids is not None
        else spherical_kmeans(
            embeddings, n_centroids, train_iters, id_col=id_col,
            vec_col=vec_col,
        )
    )
    C = np.asarray(C, dtype="float64")  # (ncells, dim)
    base = _spread(embeddings).select(
        F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e")
    )
    one = assign_centroid_udf(C, nprobe=1)
    corpus = base.select(
        "vec_id", "e", F.element_at(one(F.col("e")), 1).alias("cell")
    ).localCheckpoint(eager=True)

    if codebooks is None:
        # residuals via a JVM-side subtract against the broadcast
        # centroid row (array literal join keeps it in codegen)
        cent_rows = [(int(i), [float(v) for v in C[i]]) for i in range(len(C))]
        spark = embeddings.sparkSession
        cdf = spark.createDataFrame(cent_rows, "cell int, cvec array<double>")
        resid = corpus.join(F.broadcast(cdf), "cell").select(
            "vec_id",
            F.zip_with("e", "cvec", lambda a, b: a - b).alias("r"),
        )
        codebooks = pq_codebooks(
            resid, m, ksub, train_iters, dim, id_col="vec_id", vec_col="r"
        )
    B = np.asarray(codebooks, dtype="float64")  # (m, ksub, dsub)
    dsub = dim // m

    # encode residuals (fused: subtract + subspace argmin in one kernel)
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    b_sq = (B**2).sum(axis=2)  # (m, ksub)

    @pandas_udf("array<int>")
    def enc(cell: pd.Series, e: pd.Series) -> pd.Series:
        X = np.stack(e.to_numpy()) - C[cell.to_numpy()]  # residuals
        out = np.empty((len(X), m), dtype="int32")
        for s in range(m):
            Xs = X[:, s * dsub : (s + 1) * dsub]
            out[:, s] = np.argmin(
                b_sq[s][None, :] - 2.0 * (Xs @ B[s].T), axis=1
            )
        return pd.Series(list(out))

    coded = corpus.select(
        "vec_id", "cell", enc(F.col("cell"), F.col("e")).alias("codes")
    )

    qrows = base.filter(F.col("vec_id").isin(query_ids)).collect()
    qids = sorted(r["vec_id"] for r in qrows)
    qe = {r["vec_id"]: np.asarray(r["e"], dtype="float64") for r in qrows}
    # per-query probed cells (top-nprobe by centroid dot on the
    # normalized query — same rule as assign_centroid_udf)
    probed = {}
    for qid in qids:
        q = qe[qid]
        qn = q / max(np.sqrt((q**2).sum()), 1e-12)
        order = np.argsort(-(C @ qn))
        probed[qid] = set(int(c) for c in order[:nprobe])
    # reconstruction norm tables, per (cell, subspace, code):
    # ||x_hat||^2 = ||c||^2 + 2 sum_s c_s . B[s,t_s] + sum_s ||B[s,t_s]||^2
    c_sq = (C**2).sum(axis=1)  # (ncells,)
    cb_dot = np.stack(
        [
            np.stack([C[c, s * dsub : (s + 1) * dsub] @ B[s].T
                      for s in range(m)])
            for c in range(len(C))
        ]
    )  # (ncells, m, ksub)
    lut = np.stack(
        [
            np.stack([B[s] @ qe[qid][s * dsub : (s + 1) * dsub]
                      for s in range(m)])
            for qid in qids
        ]
    )  # (Q, m, ksub)
    qc = np.stack([C @ qe[qid] for qid in qids])  # (Q, ncells)
    qnorm = np.array([np.sqrt((qe[qid] ** 2).sum()) for qid in qids])
    qid_arr = np.array(qids, dtype="int64")
    probe_mask = np.zeros((len(qids), len(C)), dtype=bool)
    for qi, qid in enumerate(qids):
        for c in probed[qid]:
            probe_mask[qi, c] = True
    top_r = rerank or k
    sub = np.arange(m)

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("vec_id", LongType()),
            StructField("adc", DoubleType()),
        ]
    )

    def adc_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cells = pdf["cell"].to_numpy()
            Cd = np.stack(pdf["codes"].to_numpy())  # (n, m)
            vids = pdf["vec_id"].to_numpy()
            # approximate dots and reconstruction norms for the batch
            r_dot = lut[:, sub, Cd].sum(axis=2)  # (Q, n): q . r_hat
            dots = qc[:, cells] + r_dot  # (Q, n)
            xn = np.sqrt(
                c_sq[cells]
                + 2.0 * cb_dot[cells[:, None], sub[None, :], Cd].sum(axis=1)
                + b_sq[sub, Cd].sum(axis=1)
            )  # (n,)
            cos = dots / (qnorm[:, None] * np.maximum(xn, 1e-12)[None, :])
            frames = []
            for qi in range(len(qid_arr)):
                mask = probe_mask[qi, cells] & (vids != qid_arr[qi])
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    continue
                order = np.lexsort((vids[idx], -cos[qi, idx]))[:top_r]
                sel = idx[order]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid_arr[qi],
                            "vec_id": vids[sel],
                            "adc": cos[qi, sel],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    pre = coded.mapInPandas(adc_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    cand = pre.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= top_r
    )
    if rerank is None:
        return cand.select(
            "query_id", "vec_id", F.round("adc", 6).alias("cosine")
        )
    qdf = _with_nrm(
        base.filter(F.col("vec_id").isin(query_ids)), out="qn"
    ).select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), "qn")
    exact = (
        cand.select("query_id", "vec_id")
        .join(_with_nrm(base), "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_pre(
                    F.col("qe"), F.col("e"), F.col("qn"), F.col("nrm")
                ),
                6,
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        exact.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
