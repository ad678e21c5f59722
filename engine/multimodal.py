"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode libraries (PIL/librosa/ffmpeg) are NOT in this container, so the
actual media decoding is STUBBED two ways (explicitly marked):
* ``decode_stub='fake'`` (default in tests): a deterministic fake decoder —
  payload bytes -> seeded feature vector — so the Spark-side plumbing
  (schema, batch shapes, partitioning, UDF signature) is fully real and
  testable end-to-end;
* ``decode_stub='raise'``: NotImplementedError naming the library needed —
  the production wiring point.

Everything else — batching, schema, partition sizing — is the real design
a 100 TB media pipeline needs: payloads stay in Arrow buffers (no row
Python), feature extraction streams batch-by-batch, outputs are fixed-size
float arrays ready for the similarity ops.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), False),     # opaque encoded bytes
    T.StructField("meta", T.StructType([                 # typed metadata
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]), False),
])

FEATURE_DIM = 16


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table with the contractual schema."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[np.arange(n) % 3]
    rows = []
    for i in range(n):
        payload = rng.integers(0, 256, size=64 + (i % 5) * 32,
                               dtype=np.uint8).tobytes()
        meta = {"width": 32 + i % 4 * 16 if kinds[i] == "image" else None,
                "height": 32 if kinds[i] == "image" else None,
                "sample_rate": 16000 if kinds[i] == "audio" else None,
                "n_frames": 30 if kinds[i] == "video" else None,
                "format": {"image": "png", "audio": "wav",
                           "video": "mp4"}[kinds[i]]}
        rows.append((i, str(kinds[i]), bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the ``documents`` corpus:
    payload = the document's UTF-8 bytes, kind = doc_id % 3, typed meta.

    Pure expression tree (no Python). Because the payload is reproducible
    from a shared table, an engine-external oracle (DuckDB) can recompute
    the md5-derived fake features — the driver-gate variant of the media
    pipeline. ``synthetic_media`` (opaque random payloads) remains the
    pytest fixture shape."""
    kind = (F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio").otherwise("video"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.when(kind == "image", F.lit(32)).cast("int").alias("width"),
            F.when(kind == "image", F.lit(32)).cast("int").alias("height"),
            F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
            F.when(kind == "video", F.lit(30)).cast("int").alias("n_frames"),
            F.when(kind == "image", F.lit("png"))
             .when(kind == "audio", F.lit("wav"))
             .otherwise(F.lit("mp4")).alias("format"),
        ).alias("meta"))


def _fake_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: the 16 bytes of
    ``md5(payload)``, each divided by 256, as FEATURE_DIM float32s.

    md5 is PORTABLE (any engine reproduces it from the same bytes), and
    byte/256 is exactly representable in float32 — so the feature vector,
    and any float64 sum over it, is bit-identical across engines. That
    puts this op under the driver's DuckDB hash gate (VERDICT r2 #4: the
    prior payload-chunk-mean fake was the one remaining rows-only check).
    Per-row hashing is bounded by the Arrow batch size, exactly like the
    real decoder it stands in for."""
    import hashlib
    out = np.empty((len(payloads), FEATURE_DIM), dtype=np.float32)
    for i, p in enumerate(payloads):  # bounded by batch size, not corpus
        digest = np.frombuffer(hashlib.md5(bytes(p)).digest(), dtype=np.uint8)
        out[i] = digest.astype(np.float32) / 256.0
    return out


FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("features", T.ArrayType(T.FloatType()), False),
])


def extract_features(media: DataFrame, decode_stub: str = "fake") -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Real decode point is marked: with decode_stub='raise' this raises
    NotImplementedError('install pillow/librosa/av ...') exactly where a
    production decoder plugs in.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires pillow (image) / librosa (audio)"
                    " / av (video) — not available in this container; "
                    "plug the real decoder here")
            feats = _fake_features(pdf["payload"])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "features": list(feats),
            })

    return media.mapInPandas(fn, FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  decode_stub: str = "fake") -> DataFrame:
    """Image resize plumbing: filters kind=image, rewrites payload+meta.
    Fake path passes payload through and updates meta (the schema/flow
    under test); real path needs pillow."""

    def fn(batches):
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError("image resize requires pillow")
            meta = pd.DataFrame({
                "width": width, "height": height,
                "sample_rate": pd.array([None] * len(pdf), dtype="Int32"),
                "n_frames": pd.array([None] * len(pdf), dtype="Int32"),
                "format": [m["format"] for m in pdf["meta"]],
            })
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "payload": pdf["payload"],
                "meta": meta.to_dict("records")})

    return media.filter(F.col("kind") == "image").mapInPandas(fn, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10,
                  decode_stub: str = "fake") -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    (media_id, frame_idx, payload-slice). Fake path slices the payload
    deterministically; real path needs av/ffmpeg."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ])

    def fn(batches):
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError("frame sampling requires av/ffmpeg")
            ids, idxs, frames = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                          pdf["meta"]):
                n = (meta["n_frames"] or 0)
                for fi in range(0, n, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    b = bytes(payload)
                    w = max(1, len(b) // max(n, 1))
                    frames.append(b[fi * w:(fi + 1) * w])
            yield pd.DataFrame({"media_id": pd.array(ids, dtype="int64"),
                                "frame_idx": pd.array(idxs, dtype="int32"),
                                "frame": frames})

    return media.filter(F.col("kind") == "video").mapInPandas(fn, schema)
