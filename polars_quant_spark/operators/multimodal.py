"""Multimodal column handling for training-data pipelines.

Images / audio / video ride through Spark as opaque ``binary`` columns with
typed metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

Decode status, per format:

* **PPM (P6) images — REAL decoder** (`decode_ppm`): pure-numpy parse of
  the uncompressed format, per-channel statistics as features.
* **WAV (PCM) audio — REAL decoder** (`decode_wav`): stdlib ``wave`` +
  numpy; duration/RMS/peak/zero-crossing features.
* Compressed formats (JPEG/PNG/MP3/MP4) — STUB (`_decode_stub`): the
  codecs need PIL/libsndfile/pyav, none bundled in this container; a
  deterministic md5-derived feature vector stands in so the pipeline stays
  testable and oracle-checkable. The dispatch (`_decode`) sniffs magic
  bytes, so dropping real codecs in later changes nothing upstream.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),     # opaque encoded bytes
        StructField("width", IntegerType()),      # typed metadata
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def _make_ppm(i: int, w: int, h: int) -> bytes:
    """Deterministic REAL P6 payload: a gradient + id-keyed stripe pattern."""
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(h - 1, 1)).astype(np.uint8)
    b = (((x + y + i) % 16) * 17).astype(np.uint8)
    px = np.stack([r, g, b], axis=-1)
    return b"P6\n# synthetic %d\n%d %d\n255\n" % (i, w, h) + px.tobytes()


def _make_wav(i: int, ms: int, rate: int = 8000) -> bytes:
    """Deterministic REAL 16-bit PCM WAV: a sine at an id-keyed frequency."""
    n = rate * ms // 1000
    t = np.arange(n) / rate
    freq = 220.0 + 55.0 * (i % 8)
    x = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(x.tobytes())
    return buf.getvalue()


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media corpus: REAL P6 images and REAL PCM WAV clips
    (exercising the genuine decoders), md5-stream bytes for video (the
    stub path — no pure-Python video codec). Stands in for a real binary
    ingest (S3 blobs / tar shards)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = 64 + (i % 8) * 16, 64 + (i % 5) * 16
            payload = _make_ppm(i, w, h)
        elif kind == "audio":
            payload = _make_wav(i, (i % 30 + 1) * 100)
        else:
            seed = hashlib.md5(f"media-{i}".encode()).digest()
            payload = (seed * 64)[: 512 + (i % 7) * 64]
        rows.append(
            (
                i,
                kind,
                {"image": "image/x-portable-pixmap", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                64 + (i % 8) * 16 if kind == "image" else None,
                64 + (i % 5) * 16 if kind == "image" else None,
                (i % 30 + 1) * 100 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapt the documents table into the media schema (payload = UTF-8
    bytes of the text). Gives the binary-column pipeline a corpus that
    exists in every test environment — and, because the stub featurizer is
    deterministic md5, an exact DuckDB twin (see queries_pipeline
    media_features)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.concat(kind, F.lit("/x-doc")).alias("mime"),
        F.col(text).cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.when(kind == "video", (F.col(id_col) % 30 + 1) * 1000)
        .cast("int")
        .alias("duration_ms"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_digest", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Tokenizing P6 header parse per the netpbm spec: arbitrary whitespace
    between tokens, ``#`` comments anywhere a token may start, any header
    layout (one-line ``w h maxval``, no comment, many comments). Returns
    (w, h, maxval, pixel_data_offset)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    return w, h, maxval, pos


def decode_ppm(payload: bytes) -> list[float]:
    """REAL decoder for binary PPM (P6): spec-compliant header parse
    (_ppm_header) + numpy pixel statistics. Features: [w, h, mean_r,
    mean_g, mean_b, std, min, max] with pixel values normalized by
    maxval."""
    w, h, maxval, pos = _ppm_header(payload)
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    px = px.reshape(h, w, 3).astype(np.float64) / maxval
    return [
        float(w),
        float(h),
        float(px[:, :, 0].mean()),
        float(px[:, :, 1].mean()),
        float(px[:, :, 2].mean()),
        float(px.std()),
        float(px.min()),
        float(px.max()),
    ]


def decode_wav(payload: bytes) -> list[float]:
    """REAL decoder for PCM WAV via the stdlib ``wave`` module.
    Features: [channels, rate/48000, duration_s, rms, peak, zcr, mean,
    frames/1e6] with samples normalized to [-1, 1]."""
    with wave.open(io.BytesIO(payload)) as wf:
        n, rate, width, ch = (
            wf.getnframes(),
            wf.getframerate(),
            wf.getsampwidth(),
            wf.getnchannels(),
        )
        raw = wf.readframes(n)
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported, got width={width}")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
    return [
        float(ch),
        rate / 48000.0,
        n / rate if rate else 0.0,
        float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
        float(np.abs(x).max()) if len(x) else 0.0,
        zcr,
        float(x.mean()) if len(x) else 0.0,
        n / 1e6,
    ]


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB for compressed formats (JPEG/PNG/MP3/MP4 — codecs not bundled
    in this container; a production deployment drops PIL/libsndfile/pyav
    into `_decode`'s dispatch). Deterministic md5-derived 8-dim feature
    keeps the pipeline testable end-to-end."""
    if not payload:
        raise NotImplementedError("empty payload; real decoder not bundled")
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in struct.unpack("8B", h[:8])]


def _decode(payload: bytes, kind: str) -> list[float]:
    """Magic-byte dispatch: real decoders for uncompressed formats, the
    documented stub otherwise."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    return _decode_stub(payload, kind)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches, streaming per
    partition — constant memory regardless of corpus size)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            digests = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload)
                digests.append(hashlib.md5(raw).hexdigest())
                feats.append(_decode(raw, kind))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "payload_digest": digests,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Explode videos into per-frame work items (media_id, frame_ts_ms) —
    the fan-out stage ahead of a real frame decoder. Pure Spark: sequence +
    explode, no Python."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def _resize_ppm(payload: bytes, tw: int, th: int) -> bytes:
    """REAL nearest-neighbor resize of a P6 image: decode via the
    spec-compliant header parser (_ppm_header — accepts any valid P6
    header layout, not just the synthetic generator's), sample source
    pixel (x·w div tw, y·h div th), re-encode as a canonical comment-free
    P6 preserving maxval. Pure numpy — no image libraries."""
    w, h, maxval, pos = _ppm_header(payload)
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    px = px.reshape(h, w, 3)
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    out = px[np.ix_(ys, xs)]
    return b"P6\n%d %d\n%d\n" % (tw, th, maxval) + out.tobytes()


def resize_images(media: DataFrame, tw: int = 16, th: int = 16) -> DataFrame:
    """Distributed image resize: Arrow-batched mapInPandas over the binary
    payload column — the canonical shape for media preprocessing at scale
    (constant memory per task, no driver round-trip, codec work stays in
    the Python worker). Only P6 images are resized; other kinds pass
    through the filter."""
    import pandas as pd

    src = media.where(F.col("kind") == "image").select("media_id", "payload")

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rp = _resize_ppm(bytes(payload), tw, th)
                out.append((int(mid), tw, th, len(rp), bytearray(rp)))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "n_bytes", "payload"]
            )

    return src.mapInPandas(run, RESIZE_SCHEMA)


DECIMATE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("rate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("sum_sq", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def decimate_audio(media: DataFrame, factor: int = 4) -> DataFrame:
    """Distributed audio downsample: take every ``factor``-th PCM frame and
    re-encode the WAV at rate/factor — the mapInPandas resample stage of a
    speech pipeline (a real pipeline swaps the picker for a polyphase
    filter; the Arrow plumbing is identical). Emits the decimated payload
    plus the exact int16 energy (Σ sample², an integer) so correctness is
    checkable without shipping the bytes."""
    import pandas as pd

    src = media.where(F.col("kind") == "audio").select("media_id", "payload")

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload))) as wf:
                    rate = wf.getframerate()
                    raw = wf.readframes(wf.getnframes())
                x = np.frombuffer(raw, dtype="<i2")[::factor]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as out:
                    out.setnchannels(1)
                    out.setsampwidth(2)
                    out.setframerate(rate // factor)
                    out.writeframes(x.tobytes())
                rows.append(
                    (
                        int(mid),
                        rate // factor,
                        len(x),
                        int((x.astype(np.int64) ** 2).sum()),
                        bytearray(buf.getvalue()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "rate", "n_frames", "sum_sq", "payload"]
            )

    return src.mapInPandas(run, DECIMATE_SCHEMA)
