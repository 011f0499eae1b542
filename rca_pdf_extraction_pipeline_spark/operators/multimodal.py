"""Multimodal (image/audio/video) column plumbing for the interleaved
corpus: opaque ``binary`` payloads + typed metadata, with decode /
feature-extract / resize / frame-sample stages as Arrow-batched
``mapInPandas`` operators.

Decode has two modes.  ``decode_media(..., fake=True)`` is a
deterministic md5-seeded stand-in (the md5 itself is computed JVM-side,
so the pandas step is fully vectorized) that keeps every Spark-side
contract real and testable — schema, batch shape, partitioning, null
handling.  ``fake=False`` REALLY decodes uncompressed 24-bit BMP
payloads with a pure-numpy header+pixel parser (:func:`decode_bmp`,
round-trip-tested against :func:`encode_bmp`); other formats come back
ok=False because the container ships no codec libraries (PNG/JPEG/ffmpeg
would plug into :func:`_real_decode_batch`).

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
    its declared geometry and an md5-derived feature vector.

    If the batch carries a precomputed ``payload_md5`` hex column (the
    JVM computes it before the Arrow hop — see :func:`decode_media`),
    the whole batch vectorizes: ONE hex-decode + a (n, 8) uint16 view.
    Without it (direct kernel-test calls) hashlib runs per payload."""
    n = len(pdf)
    if "payload_md5" in pdf.columns:
        hexes = pdf["payload_md5"].fillna("0" * 32)
        ok = (hexes != "0" * 32).to_numpy() & \
            (pdf["payload_len"].fillna(0).to_numpy() > 0)
        digest = np.frombuffer(bytes.fromhex("".join(hexes)),
                               dtype=np.uint8).reshape(n, 16)
        feats = digest.view(np.uint16).astype(np.float32) / 65535.0
        feats[~ok] = 0.0
    else:
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


# ---------------------------------------------------------------------------
# real decoders (pure numpy — no codec libraries needed)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """Parse an uncompressed 24-bit BI_RGB Windows BMP: returns
    (width, height, pixels[h, w, 3] as RGB uint8) or None if the payload
    is not such a BMP.  Header layout per the public BMP file format:
    BITMAPFILEHEADER (14 bytes, 'BM' magic, pixel-array offset at 10)
    then BITMAPINFOHEADER (width i32 @18, height i32 @22, bpp u16 @28,
    compression u32 @30 == 0); pixel rows are bottom-up, 4-byte padded,
    BGR order."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    buf = np.frombuffer(payload, dtype=np.uint8)
    off = int(buf[10:14].view(np.uint32)[0])
    width = int(buf[18:22].view(np.int32)[0])
    height = int(buf[22:26].view(np.int32)[0])
    bpp = int(buf[28:30].view(np.uint16)[0])
    compression = int(buf[30:34].view(np.uint32)[0])
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    flipped = height > 0          # positive height => bottom-up rows
    h = abs(height)
    stride = (width * 3 + 3) & ~3
    need = off + stride * h
    if len(payload) < need:
        return None
    rows = buf[off:need].reshape(h, stride)[:, :width * 3].reshape(h, width, 3)
    rgb = rows[:, :, ::-1]        # BGR -> RGB
    if flipped:
        rgb = rgb[::-1]
    return width, h, rgb


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Inverse of :func:`decode_bmp` (fixture/round-trip builder):
    rgb[h, w, 3] uint8 -> uncompressed 24-bit bottom-up BMP bytes."""
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)
    pixels = rows.tobytes()
    off = 14 + 40
    header = (b"BM" + (off + len(pixels)).to_bytes(4, "little") + b"\x00" * 4
              + off.to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + h.to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + len(pixels).to_bytes(4, "little")
              + b"\x00" * 16)
    return header + pixels


def _real_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Real decode pass: BMP payloads are parsed for actual geometry and
    mean-RGB features; undecodable payloads get ok=False (graceful, like
    the reference's per-image try/except — extractor.py:177-195).  The
    loop is per IMAGE (ragged payloads), never per pixel — the pixel math
    is numpy."""
    n = len(pdf)
    feats = np.zeros((n, FEATURE_DIM), dtype=np.float32)
    ok = np.zeros(n, dtype=bool)
    widths = np.zeros(n, dtype=np.int32)
    heights = np.zeros(n, dtype=np.int32)
    for i, payload in enumerate(pdf["payload"]):
        parsed = decode_bmp(bytes(payload)) if payload is not None else None
        if parsed is None:
            continue
        w, h, rgb = parsed
        ok[i] = True
        widths[i], heights[i] = w, h
        mean = rgb.reshape(-1, 3).mean(axis=0) / 255.0
        feats[i, :3] = mean
        feats[i, 3] = rgb.std() / 255.0
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
        "decoded_width": widths,
        "decoded_height": heights,
        "n_frames": frames.astype("int32"),
        "features": list(feats),
    })


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """media -> decoded features table, one Arrow-batched stage.

    ``fake=True`` — deterministic md5-seeded stub, with the md5 computed
    JVM-side so the pandas step is fully vectorized (no per-row hashing).
    ``fake=False`` — REAL decode for uncompressed 24-bit BMP payloads
    (pure-numpy header+pixel parse, :func:`decode_bmp`); payloads in any
    other format decode to ok=False.  Compressed formats (PNG/JPEG/...)
    need codec libraries not present in this environment — that plug
    point is :func:`_real_decode_batch`."""
    from pyspark.sql import functions as F

    if not fake:
        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf):
                    yield _real_decode_batch(pdf)

        return media.mapInPandas(run_real, schema=DECODE_SCHEMA)

    with_hash = media.withColumn("payload_md5", F.md5("payload")) \
                     .withColumn("payload_len",
                                 F.coalesce(F.length("payload"), F.lit(0)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield _fake_decode_batch(pdf)

    return with_hash.mapInPandas(run, schema=DECODE_SCHEMA)


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


def synth_bmp_media(ids: DataFrame) -> DataFrame:
    """Deterministic BMP fixture table from a (doc_id:long) frame: each
    doc becomes a solid-color w x h 24-bit BMP (w = id%16+1, h = id%8+1,
    RGB = (id%256, id*7%256, id*13%256)); ids divisible by 10 get a
    deliberately-undecodable payload to pin the ok=False path.

    Fixture GENERATOR (not a hot path): the per-id encode loop runs once
    to build test media; production payloads arrive already encoded."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for did in pdf["doc_id"].astype(int):
                if did % 10 == 0:
                    payload = b"not a bmp payload"
                else:
                    w, h = did % 16 + 1, did % 8 + 1
                    rgb = np.empty((h, w, 3), dtype=np.uint8)
                    rgb[:, :] = (did % 256, did * 7 % 256, did * 13 % 256)
                    payload = encode_bmp(rgb)
                out.append((f"bmp-{did:05d}", f"doc-{did}", "image", payload,
                            None, None, None))
            yield pd.DataFrame(out, columns=["media_ref", "doc_id", "kind",
                                             "payload", "width", "height",
                                             "duration_ms"])

    return ids.select("doc_id").mapInPandas(gen, schema=MEDIA_SCHEMA)


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
