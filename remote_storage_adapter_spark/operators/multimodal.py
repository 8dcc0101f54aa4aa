"""Multimodal (image/audio/video) column plumbing (task brief E4).

Media payloads are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extraction / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so the JVM⇄Python boundary moves
whole columns, not rows.

The container has no image/audio libraries, so the actual decoders are
STUBBED: ``decode_stub=True`` produces deterministic fake features
(derived from the payload bytes) with the real schema, partitioning and
batch shape; ``decode_stub=False`` raises ``NotImplementedError`` at
the point where Pillow/torchaudio/PyAV would be called. Everything
around the stub — schemas, the mapInPandas plumbing, batch iteration —
is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: typed metadata carried next to every media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", MEDIA_META_SCHEMA, False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from ``documents`` (the container has
    no real media): payload = UTF-8 bytes of the text, meta = image/raw.

    This keeps every downstream stage (binary column, partitioning,
    mapInPandas batches) real while the data is synthetic.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("raw").alias("format"),
            F.col("n_chars").cast("int").alias("width"),
            F.lit(1).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_real(payload: bytes, media_type: str):
    raise NotImplementedError(
        "real media decode requires Pillow/torchaudio/PyAV, which are "
        "not installed in this environment; run with decode_stub=True"
    )


def _fake_feature(payload: bytes, dim: int) -> list:
    """Deterministic pseudo-feature from the payload digest.

    Component i = big-endian uint16 of sha256-digest bytes [2i, 2i+2)
    (cycled), scaled to [0, 1] and rounded to 6 decimals — so any
    engine with sha256 recomputes a component exactly: a 6-decimal
    multiple survives the float32 feature column round-trip (float32
    error ≈6e-8 ≪ the 5e-7 re-round margin), keeping the stub
    oracle-checkable while the column type stays the realistic
    array<float>.
    """
    digest = hashlib.sha256(payload).digest()
    raw = (digest * ((dim * 2) // len(digest) + 1))[: dim * 2]
    return [
        round(int.from_bytes(raw[2 * i : 2 * i + 2], "big") / 65535.0, 6)
        for i in range(dim)
    ]


def extract_features(media: DataFrame, *, dim: int = 16,
                     decode_stub: bool = True) -> DataFrame:
    """payload → fixed-dim feature vector via Arrow-batched mapInPandas.

    Partition-preserving (no shuffle); each Python worker sees whole
    Arrow batches. With a real decoder this is where image resize /
    audio fbank / video frame-sample would run.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if not decode_stub:
                payloads.map(lambda p: _decode_real(p, "image"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(p).hexdigest()
                    ),
                    "feature": payloads.map(
                        lambda p: _fake_feature(p, dim)
                    ),
                }
            )

    parallelism = media.sparkSession.sparkContext.defaultParallelism
    return (
        media.select("media_id", "payload")
        .repartition(parallelism, "media_id")
        .mapInPandas(run, schema=FEATURE_SCHEMA)
    )


def resize(media: DataFrame, *, width: int, height: int,
           decode_stub: bool = True) -> DataFrame:
    """Image resize stage via Arrow-batched mapInPandas (stub decode).

    Real path: decode → PIL ``Image.resize((width, height))`` →
    re-encode. Stub: deterministic payload reshaping (truncate/cycle to
    the target pixel budget) so schema, meta update, and batch shape
    are real. Partition-preserving — no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not decode_stub:
                pdf["payload"].map(lambda p: _decode_real(p, "image"))

            def _resize(p: bytes) -> bytes:
                if not p:
                    return bytes(target)
                reps = target // len(p) + 1
                return (p * reps)[:target]

            out = pdf.copy()
            out["payload"] = pdf["payload"].map(_resize)
            meta = pd.DataFrame(list(pdf["meta"]))
            meta["width"] = width
            meta["height"] = height
            out["meta"] = meta.to_dict("records")
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, *, every_ms: int = 1000,
                 decode_stub: bool = True) -> DataFrame:
    """Video → sampled frames (stub): one synthetic frame row per
    ``every_ms`` of duration, demonstrating the 1→N expansion shape."""
    frames = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms - 1,
                F.lit(0),
            ).cast("long"),
        )
    )
    if not decode_stub:  # pragma: no cover
        raise NotImplementedError("real frame decode requires PyAV")
    return media.select(
        F.col("media_id"), frames.alias("frame_idx")
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
