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


def phash64(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """64-bit perceptual hash per media row → (media_id, phash BIGINT).

    Real path (PIL importable, fake=False): 8×8 grayscale average-hash
    — the standard aHash. Container fallback (fake=True): first 60
    bits of md5 of the HEX encoding of the raw bytes (hex because
    DuckDB's md5 only accepts VARCHAR, and Spark and DuckDB agree on
    hex's uppercase form — verified), which keeps every downstream
    stage — the banding join, the hamming verify, the oracle —
    bit-for-bit reproducible on any engine. The fake is labeled, not
    hidden: it exercises the plumbing, not perceptual quality.

    Pure column expression in the fake path (scan speed, no Python);
    the real path is an Arrow-batched mapInPandas like the other
    decoders.
    """
    from pyspark.sql import functions as F

    if fake:
        return media.select(
            "media_id",
            F.conv(F.substring(F.md5(F.hex("data")), 1, 15), 16, 10)
            .cast("long")
            .alias("phash"),
        )
    if not _have_pil():
        raise NotImplementedError("PIL not available; use fake=True")

    import io

    import PIL.Image

    def _run(batches):
        for pdf in batches:
            hashes = []
            for data in pdf["data"]:
                img = PIL.Image.open(io.BytesIO(bytes(data))).convert("L")
                img = img.resize((8, 8))
                px = np.asarray(img, dtype=np.float64)
                bits = (px > px.mean()).flatten()
                h = 0
                for b in bits:
                    h = (h << 1) | int(b)
                # keep within signed 64-bit
                hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "phash": hashes}
            )

    return media.mapInPandas(_run, "media_id long, phash long")


def phash_dup_pairs(
    media: DataFrame,
    *,
    max_hamming: int = 3,
    n_bands: int = 4,
    bits_per_band: int = 15,
    fake: bool = True,
) -> DataFrame:
    """Near-duplicate media pairs by perceptual-hash hamming distance
    — the multimodal cousin of MinHash-LSH dedup, with the same
    pigeonhole guarantee: a pair within ``max_hamming`` ≤ n_bands − 1
    bit flips must agree on at least one band, so banding loses
    nothing (at the default 3 < 4). Blocking joins carry only
    (band_idx, band_value, media_id) longs; the hamming verify is
    bit_count(xor) — one instruction per candidate, JVM-side.

    Group-then-pair (the winnow_dup_pairs shape, not a self-join): one
    shuffle of the banded hashes, pairs emitted per bucket; a bucket
    with f members emits f(f-1)/2 candidates — buckets are 15-bit
    slices, so only true near-dup clusters grow large, and those ARE
    the output.

    Output: (media_a, media_b, hamming INT), hamming ≤ max_hamming.
    """
    from pyspark.sql import functions as F

    hashes = phash64(media, fake=fake)
    mask = (1 << bits_per_band) - 1
    banded = hashes.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.expr(
                            f"(phash >> {i * bits_per_band}) & {mask}L"
                        ).alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("media_id", "phash", "b.band_idx", "b.band_val")
    buckets = banded.groupBy("band_idx", "band_val").agg(
        F.collect_list(F.struct("media_id", "phash")).alias("__ms__")
    )
    pairs = (
        buckets.select(F.explode("__ms__").alias("x"), "__ms__")
        .select("x", F.explode("__ms__").alias("y"))
        .filter(F.col("x.media_id") < F.col("y.media_id"))
        .select(
            F.col("x.media_id").alias("media_a"),
            F.col("y.media_id").alias("media_b"),
            F.bit_count(
                F.col("x.phash").bitwiseXOR(F.col("y.phash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs
