"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed (a
deterministic fake, clearly marked) — but everything Spark-side is real and
tested: schemas, Arrow batch shapes, mapInPandas plumbing, partitioning.
Swapping the fake decoder for PIL/ffmpeg is a one-function change that does
not touch the distributed plan.

Pattern: media rows are (id, media_type, payload binary, meta struct);
feature extraction is mapInPandas over batches of binary payloads —
the Arrow transfer ships bytes zero-copy, and each batch is processed as one
numpy block.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, byte_entropy double, feature array<float>"
)


def synth_media(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-random bytes
    whose length/meta depend only on media_id)."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            types_ = np.array(["image", "audio", "video"])[ids % 3]
            rows = []
            for i, t in zip(ids, types_):
                rng = np.random.default_rng(42 + int(i))
                size = 256 + int(i) % 1024
                rows.append(
                    {
                        "media_id": int(i),
                        "media_type": str(t),
                        "payload": rng.integers(0, 256, size, dtype=np.uint8).tobytes(),
                        "meta": {
                            "width": 64 + int(i) % 512 if t == "image" else None,
                            "height": 64 + (int(i) * 7) % 512 if t == "image" else None,
                            "duration_ms": 1000 + int(i) % 60000 if t != "image" else None,
                            "codec": {"image": "png", "audio": "opus", "video": "av1"}[str(t)],
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n_rows, numPartitions=partitions).mapInPandas(gen, MEDIA_SCHEMA)


def decode_image(payload: bytes) -> np.ndarray:
    """STUB — real decode needs PIL/libvips, not present in this container.

    Raises NotImplementedError so callers can't silently depend on the fake.
    Use `fake_decode` for plumbing tests.
    """
    raise NotImplementedError("image codecs unavailable in this environment; use fake_decode")


def fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic fake 'decode': fold payload bytes into a dim-length
    float vector (stands in for pixel/spectrogram features)."""
    a = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    pad = (-len(a)) % dim
    if pad:
        a = np.pad(a, (0, pad))
    return (a.reshape(-1, dim).mean(axis=0) / 255.0).astype(np.float32)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: per Arrow batch, compute byte-level
    stats (real) + the fake decode vector (stub).  The batch shape, schema,
    and partition behavior are exactly what a real decoder would use.

    Fully vectorized per batch (no per-row Python): payloads concatenate into
    ONE uint8 buffer with offsets; per-row 256-bin histograms (entropy) come
    from a single fused-key bincount, and the per-row fold features (fake
    decode) from one pad-scatter + ``np.add.reduceat`` pass — the same
    offsets-and-reduce shape simhash_udf uses.  Measured 5.05× faster than
    the previous iterrows loop at 5k rows/batch (steady-state best-of-6,
    values identical; see BENCH.md §4).  Empty/NULL payloads yield entropy 0
    and a zero feature vector."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].to_numpy()
            n = len(pdf)
            lens = np.fromiter(
                (len(p) if p is not None else 0 for p in payloads), dtype=np.int64, count=n
            )
            flat = np.frombuffer(b"".join(p or b"" for p in payloads), dtype=np.uint8)
            row_idx = np.repeat(np.arange(n), lens)

            # entropy: per-row 256-bin histograms via ONE fused-key bincount
            # (row*256 + byte) — much faster than np.add.at scatter
            counts = np.bincount(row_idx * 256 + flat, minlength=n * 256).reshape(n, 256)
            p = counts / np.maximum(lens, 1)[:, None]
            ent = -np.where(p > 0, p * np.log2(p, where=p > 0), 0.0).sum(axis=1)
            ent[lens == 0] = 0.0

            # fake decode ≡ pad-to-dim, reshape(-1, dim), column mean — done as
            # ONE scatter into a zero-padded buffer + np.add.reduceat over the
            # (total_blocks, dim) view; empty rows keep one zero block so the
            # reduceat boundaries stay strictly increasing (→ zero vector)
            blocks = np.maximum((lens + dim - 1) // dim, 1)
            padded = blocks * dim
            pad_before = np.concatenate([[0], np.cumsum(padded - lens)[:-1]])
            dest = np.arange(len(flat), dtype=np.int64) + np.repeat(pad_before, lens)
            # float64 accumulation like fake_decode — float32 sums lose
            # integer exactness past 2^24 (≈1 MB payload columns), which
            # would break value-equality with the per-row reference
            buf = np.zeros(int(padded.sum()), np.float64)
            buf[dest] = flat
            bounds = np.concatenate([[0], np.cumsum(blocks)[:-1]])
            feat = (
                np.add.reduceat(buf.reshape(-1, dim), bounds, axis=0)
                / blocks[:, None]
                / 255.0
            ).astype(np.float32)

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": lens,
                    "byte_entropy": np.round(ent, 6),
                    "feature": list(feat),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expands each video row into frame
    timestamps (real distributed expansion; frame DECODE is the stub)."""
    return (
        df.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_ms",
            F.explode(F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))),
        )
        .select("media_id", "frame_ms", "meta")
    )
