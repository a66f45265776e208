"""Multimodal (image/audio/video) column plumbing for training-data
pipelines: opaque ``binary`` payloads + typed metadata structs, with
decode / feature-extraction / resize / frame-sampling as Arrow-batched
``mapInPandas`` stages.

The decode kernels are STUBS in this environment (no image/audio libs in
the container): ``decode_image`` raises ``NotImplementedError`` unless a
real decoder is injected, and ``fake_decode`` provides a deterministic
stand-in so the Spark-side plumbing — schema, partitioning, UDF
signatures, Arrow batch shapes — is real and tested end-to-end.

Scale notes: payload columns ride through pipelines as opaque bytes;
operators that don't touch them never deserialize them (columnar Parquet
reads prune the payload entirely). mapInPandas streams Arrow record
batches, so peak executor memory is one batch of payloads, not a
partition."""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: canonical media-asset schema: payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png/jpeg/wav/mp4/...
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real image decode — requires an imaging library not present in this
    container. Inject a decoder into the pipeline functions instead."""
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. Pillow); "
        "pass decoder=fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes) -> list[float]:
    """Deterministic decoder stand-in: 16 pseudo-channel statistics derived
    from a cryptographic digest of the payload — stable across runs,
    machines, and partitionings."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] = decode_image,
) -> DataFrame:
    """payload -> fixed-width feature vector via mapInPandas (Arrow
    batches). The default decoder raises NotImplementedError (stub);
    inject ``fake_decode`` (tests) or a real kernel (production)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize stage: payload -> payload at (width, height). The default
    resizer is a stub passthrough that tags dimensions without touching
    bytes (a real kernel decodes+resamples); the pipeline shape is what
    production code reuses."""

    def default_resizer(payload: bytes, w: int, h: int) -> bytes:
        return payload  # STUB: no imaging library in this container

    fn = resizer or default_resizer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": [fn(p, width, height) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.LongType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp based on
    metadata duration (the frame-grab kernel is the stubbed decode step;
    the row explosion, which is the Spark-side cost, is real)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "frame_ms": []}
            for aid, meta in zip(pdf["asset_id"], pdf["meta"]):
                duration = (meta.get("duration_ms") or 0) if meta is not None else 0
                for i, ts in enumerate(range(0, int(duration), every_ms)):
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(ts)
            yield pd.DataFrame(out)

    return (
        media.filter(media.media_type == "video")
        .select("asset_id", "meta")
        .mapInPandas(run, schema=FRAMES_SCHEMA)
    )
