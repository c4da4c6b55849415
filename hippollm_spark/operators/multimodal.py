"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata, with decode / feature-extract / resize / frame-sample stages
as Arrow-batched mapInPandas operators.

The Spark-side plumbing (schemas, batch iteration, partitioning, UDF
signatures) is real and tested; the actual codecs are NOT in this
container, so each decoder resolves in order:
  1. the real library (PIL / soundfile / av) if importable,
  2. a deterministic fake (`fake=True`) that derives pixel/audio
     statistics from a hash of the bytes — stable across engines, good
     enough to exercise every downstream stage,
  3. NotImplementedError naming the missing dependency.

At scale: media payloads dominate partition size — media tables should
be written with small ``spark.sql.files.maxPartitionBytes`` and the
binary column NEVER shuffled: every operator here is a narrow map, and
feature tables (small, numeric) are what joins/aggregations consume.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)


def _have_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_stats(data: bytes, n: int = 8) -> list[float]:
    """Deterministic pseudo-statistics from the byte content."""
    h = hashlib.sha256(data or b"").digest()
    return [b / 255.0 for b in h[:n]]


def decode_image_stats(media: DataFrame, fake: bool | None = None) -> DataFrame:
    """Per-image statistics (mean/std per channel proxy).
    Output: (media_id, width, height, mean ARRAY<DOUBLE>).
    """
    use_fake = fake if fake is not None else not _have_pil()

    def _run(batches):
        for pdf in batches:
            rows = []
            for mid, data, meta in zip(pdf["media_id"], pdf["data"], pdf["meta"]):
                meta = meta or {}
                if use_fake:
                    stats = _fake_stats(bytes(data or b""), 3)
                    rows.append(
                        (mid, meta.get("width"), meta.get("height"), stats)
                    )
                else:  # pragma: no cover - no codec in test container
                    import io

                    import PIL.Image

                    img = PIL.Image.open(io.BytesIO(data))
                    arr = np.asarray(img, dtype=np.float64) / 255.0
                    rows.append(
                        (mid, img.width, img.height, arr.mean(axis=(0, 1)).tolist())
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mean"]
            )

    return media.select("media_id", "data", "meta").mapInPandas(
        _run, "media_id long, width int, height int, mean array<double>"
    )


def media_embedding(media: DataFrame, dim: int = 64, fake: bool = True) -> DataFrame:
    """Feature-extraction stage: (media_id, embedding ARRAY<FLOAT>).
    The fake derives a deterministic unit vector from the bytes; a real
    model drops in as another mapInPandas with the same signature."""
    if not fake:  # pragma: no cover
        raise NotImplementedError("no vision/audio model runtime in this container")

    def _run(batches):
        for pdf in batches:
            vecs = []
            for data in pdf["data"]:
                h = hashlib.sha256(bytes(data or b"")).digest()
                raw = np.frombuffer(
                    (h * (dim * 4 // len(h) + 1))[: dim * 4], dtype=np.uint32
                ).astype(np.float64)
                v = (raw % 2001 - 1000) / 1000.0
                v = v / (np.linalg.norm(v) or 1.0)
                vecs.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": vecs})

    return media.select("media_id", "data").mapInPandas(
        _run, "media_id long, embedding array<float>"
    )


def sample_frames(media: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Frame-sampling stage for video rows: one output row per sampled
    frame index, payload stubbed. Output: (media_id, frame_idx, frame BINARY)."""
    if not fake:  # pragma: no cover
        raise NotImplementedError("no video codec in this container")

    def _run(batches):
        for pdf in batches:
            rows = []
            for mid, data, meta in zip(pdf["media_id"], pdf["data"], pdf["meta"]):
                n = int((meta or {}).get("n_frames") or 0)
                for idx in range(0, n, every_n):
                    marker = hashlib.sha256(
                        bytes(data or b"") + idx.to_bytes(4, "big")
                    ).digest()
                    rows.append((mid, idx, marker))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.filter("kind = 'video'").select("media_id", "data", "meta").mapInPandas(
        _run, "media_id long, frame_idx int, frame binary"
    )
