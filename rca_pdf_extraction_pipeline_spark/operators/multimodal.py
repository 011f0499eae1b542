"""Multimodal (image/audio/video) column plumbing for the interleaved
corpus: opaque ``binary`` payloads + typed metadata, with decode /
feature-extract / resize / frame-sample stages as Arrow-batched
``mapInPandas`` operators.

The container has no image/audio codecs, so the decode step is STUBBED
(clearly marked): ``decode_media(..., fake=True)`` produces a
deterministic fake decode derived from the payload bytes (md5-seeded),
keeping every Spark-side contract real and testable — schema, batch
shape, partitioning, null handling — while ``fake=False`` raises
``NotImplementedError`` exactly where a real codec (Pillow/ffmpeg)
would plug in.

Data model (mirrors the reference's image handling, which exports
binary payloads to files and keeps only ``media_ref`` strings in the
DB — extractor.py:177-184):

    media(media_ref:string, doc_id:string, kind:string,  -- image|audio|video
          payload:binary, width:int, height:int, duration_ms:int)

Scale notes: payloads never pass through Python row-at-a-time — Arrow
moves them as buffers; feature extraction is batch-vectorized numpy;
a real deployment stores payloads in object storage and keeps only
media_ref here (exactly the reference's design), making this table
narrow at 10^12 rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_ref string, doc_id string, kind string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 8

DECODE_SCHEMA = (
    "media_ref string, doc_id string, kind string, ok boolean, "
    "decoded_width int, decoded_height int, n_frames int, "
    f"features array<float>"
)


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for the codec: 'decodes' each payload into
    its declared geometry and an md5-derived feature vector. Replaced
    wholesale by a real codec; everything around it stays identical."""
    n = len(pdf)
    feats = np.empty((n, FEATURE_DIM), dtype=np.float32)
    ok = np.zeros(n, dtype=bool)
    for i, payload in enumerate(pdf["payload"]):
        if payload is None or len(payload) == 0:
            feats[i] = 0.0
            continue
        digest = hashlib.md5(bytes(payload)).digest()
        feats[i] = np.frombuffer(digest[:FEATURE_DIM * 2], dtype=np.uint16) \
                     .astype(np.float32) / 65535.0
        ok[i] = True
    frames = np.where(
        pdf["kind"].to_numpy() == "video",
        np.maximum(pdf["duration_ms"].fillna(0).to_numpy() // 1000, 1),
        1,
    )
    return pd.DataFrame({
        "media_ref": pdf["media_ref"],
        "doc_id": pdf["doc_id"],
        "kind": pdf["kind"],
        "ok": ok,
        "decoded_width": pdf["width"].fillna(0).astype("int32"),
        "decoded_height": pdf["height"].fillna(0).astype("int32"),
        "n_frames": frames.astype("int32"),
        "features": list(feats),
    })


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """media -> decoded features table, one Arrow-batched stage.

    ``fake=False`` is the real-codec plug point (NotImplementedError
    here — no codecs in this environment)."""
    if not fake:
        raise NotImplementedError(
            "real media decode requires image/audio codecs not present in "
            "this environment; use fake=True (deterministic stub) or plug "
            "a codec into _fake_decode_batch's position"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield _fake_decode_batch(pdf)

    return media.mapInPandas(run, schema=DECODE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000,
                 fake: bool = True) -> DataFrame:
    """Video frame sampling plan: one output row per sampled frame
    (media_ref, frame_idx, ts_ms). The decode of each frame is the same
    stub; the *plan* — explode by timestamp grid, batch by media_ref —
    is the real Spark-side deliverable."""
    if not fake:
        raise NotImplementedError("see decode_media")
    from pyspark.sql import functions as F

    vids = media.filter(F.col("kind") == "video")
    ts = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (vids.select("media_ref", "doc_id",
                        F.posexplode(ts).alias("frame_idx", "ts_ms")))


def media_stats(media: DataFrame) -> DataFrame:
    """Corpus-level media profile: per kind — count, payload bytes,
    mean declared geometry. Pure built-ins (JVM-side)."""
    from pyspark.sql import functions as F

    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.round(F.avg("width"), 2).alias("avg_width"),
        F.round(F.avg("height"), 2).alias("avg_height"),
    )
