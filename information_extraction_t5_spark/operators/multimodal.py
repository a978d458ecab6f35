"""Multimodal column plumbing (binary payloads + typed metadata).

Images/audio/video ride as opaque ``binary`` columns with a metadata struct;
decode/feature-extraction run as Arrow-batched mapInPandas stages.  The
Spark-side contract (schema, batch shape, partitioning) is real and tested;
the actual codec calls are STUBBED (this container ships no image/audio
libraries): ``decode_stub`` produces deterministic fake features, and
``decode_real`` raises NotImplementedError until a codec is injected.
"""
from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_SCHEMA = "media_id string, kind string, feature array<float>, ok boolean"


def synthetic_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8
        rows.append(
            (
                f"m_{i:05d}",
                kind,
                bytearray(payload),
                (64 + i % 512, 64 + (i * 7) % 512, 1000 + i, "fake"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int = 8) -> list:
    """Deterministic pseudo-embedding from payload bytes.

    Hashes the lowercase hex of the payload (not the raw bytes) so a SQL
    oracle can replay it engine-portably — DuckDB's sha256() only takes
    VARCHAR."""
    h = hashlib.sha256((payload or b"").hex().encode()).digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def extract_features(
    media: DataFrame,
    decoder: Optional[Callable[[bytes, str], list]] = None,
    dim: int = 8,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``decoder(payload, kind) -> list[float]`` is injected; default is the
    deterministic stub.  Real decoders (PIL/librosa/ffmpeg) plug in without
    touching the Spark plumbing.
    """
    decode = decoder or (lambda payload, kind: _fake_feature(payload, dim))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    feats.append(decode(bytes(payload or b""), kind))
                    oks.append(True)
                except NotImplementedError:
                    feats.append([0.0] * dim)
                    oks.append(False)
            out = pdf[["media_id", "kind"]].copy()
            out["feature"] = feats
            out["ok"] = oks
            yield out

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def decode_real(payload: bytes, kind: str) -> list:
    """Placeholder for a real codec path.

    Wire PIL.Image.open / soundfile.read / av frame sampling here; the
    container intentionally lacks these libraries.
    """
    raise NotImplementedError(
        f"no codec for kind={kind!r} in this environment; "
        "inject a decoder into extract_features()"
    )


def image_resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize targets from typed metadata — pure
    expressions; the decode+resample itself is the stubbed codec stage."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(float(max_side)) / w, F.lit(float(max_side)) / h, F.lit(1.0)
    )
    return media.filter(F.col("kind") == "image").select(
        "media_id", "meta",
        F.round(w * scale).cast("int").alias("target_w"),
        F.round(h * scale).cast("int").alias("target_h"),
        F.round(scale, 6).alias("scale"),
    )


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 5000,
                     overlap_ms: int = 500) -> DataFrame:
    """Overlapping audio chunk boundaries (the ASR-feed shape): one row per
    planned chunk, bounded by duration."""
    stride = max(chunk_ms - overlap_ms, 1)
    return (
        media.filter(F.col("kind") == "audio")
        .select(
            "media_id",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(stride),
                )
            ).alias("chunk_idx", "chunk_start_ms"),
            F.col("meta.duration_ms").alias("duration_ms"),
        )
        .withColumn(
            "chunk_end_ms",
            F.least(
                F.col("chunk_start_ms") + chunk_ms, F.col("duration_ms")
            ),
        )
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Expression-side frame-sampling plan for videos: one row per planned
    frame timestamp (the decode itself is the stubbed stage)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
