"""Multimodal plumbing: binary columns, metadata structs, mapInPandas
decode/feature stages (codec stubbed deterministically)."""

from __future__ import annotations

import pytest

from hippollm_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", b"\x89PNGfakebytes0", (32, 24, 3, None, None, "png")),
        (1, "image", b"\x89PNGfakebytes1", (64, 48, 3, None, None, "png")),
        (2, "audio", b"RIFFfakeaudio", (None, None, 1, 16000, None, "wav")),
        (3, "video", b"\x00\x00fakevideo", (320, 240, 3, None, 25, "mp4")),
        (4, "image", None, (None, None, None, None, None, None)),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA).repartition(3).cache()


def test_decode_image_stats_fake(media):
    out = MM.decode_image_stats(media.filter("kind = 'image'"), fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {0, 1, 4}
    assert rows[0]["width"] == 32 and rows[0]["height"] == 24
    assert len(rows[0]["mean"]) == 3
    assert all(0.0 <= x <= 1.0 for x in rows[0]["mean"])
    # deterministic: same bytes → same stats
    again = {r["media_id"]: r["mean"] for r in MM.decode_image_stats(
        media.filter("kind = 'image'"), fake=True
    ).collect()}
    assert again[1] == rows[1]["mean"]


def test_media_embedding_shape_and_determinism(media):
    out = MM.media_embedding(media, dim=64).collect()
    assert len(out) == 5
    for r in out:
        assert len(r["embedding"]) == 64
    by_id = {r["media_id"]: r["embedding"] for r in out}
    again = {
        r["media_id"]: r["embedding"] for r in MM.media_embedding(media, dim=64).collect()
    }
    assert by_id == again
    # distinct content → distinct vectors
    assert by_id[0] != by_id[1]


def test_media_embedding_joins_into_similarity(spark, media):
    """The multimodal feature table plugs into the generic similarity
    operators (the whole point of the opaque-binary design)."""
    from pyspark.sql import functions as F

    from hippollm_spark.operators.similarity import topk_per_query

    emb = MM.media_embedding(media, dim=64)
    queries = emb.filter("media_id = 0").select(
        F.col("media_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = topk_per_query(emb, queries, k=3, id_col="media_id")
    rows = top.orderBy("rank").collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["score"] == 1.0


def test_sample_frames(media):
    out = MM.sample_frames(media, every_n=10)
    rows = out.collect()
    # video has 25 frames → sampled at 0, 10, 20
    assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 10, 20]
    assert all(r["media_id"] == 3 and len(r["frame"]) == 32 for r in rows)


def _wav_bytes(freq=440.0, sr=8000, n=800, channels=1):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(2)
    w.setframerate(sr)
    frames = b"".join(
        struct.pack(
            "<" + "h" * channels,
            *([int(10000 * math.sin(2 * math.pi * freq * i / sr))] * channels),
        )
        for i in range(n)
    )
    w.writeframes(frames)
    w.close()
    return buf.getvalue()


def _ppm_bytes(w, h, rgb):
    header = f"P6\n# test\n{w} {h}\n255\n".encode()
    return header + bytes(rgb) * (w * h)


def test_decode_wav_stats_real(spark):
    from hippollm_spark.operators.multimodal import decode_wav_stats

    good = _wav_bytes(sr=8000, n=800)
    stereo = _wav_bytes(sr=16000, n=1600, channels=2)
    rows = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(stereo)), (3, bytearray(b"not a wav"))],
        "media_id long, data binary",
    )
    out = {r["media_id"]: r for r in decode_wav_stats(rows).collect()}
    assert out[1]["sample_rate"] == 8000 and out[1]["n_channels"] == 1
    assert out[1]["n_frames"] == 800 and abs(out[1]["duration_s"] - 0.1) < 1e-6
    # RMS of a 10000-amplitude sine ~ 10000/sqrt(2)
    assert abs(out[1]["rms"] - 10000 / 2**0.5) < 150
    assert out[2]["sample_rate"] == 16000 and out[2]["n_channels"] == 2
    assert out[3]["sample_rate"] is None  # undecodable -> NULLs


def test_decode_ppm_stats_real(spark):
    from hippollm_spark.operators.multimodal import decode_ppm_stats

    red = _ppm_bytes(4, 2, (255, 0, 0))
    grey = b"P5\n2 2\n255\n" + bytes([10, 20, 30, 40])
    rows = spark.createDataFrame(
        [(1, bytearray(red)), (2, bytearray(grey)), (3, bytearray(b"JPEGJUNK"))],
        "media_id long, data binary",
    )
    out = {r["media_id"]: r for r in decode_ppm_stats(rows).collect()}
    assert (out[1]["width"], out[1]["height"]) == (4, 2)
    assert out[1]["mean"][0] == 1.0 and out[1]["mean"][1] == 0.0
    assert (out[2]["width"], out[2]["height"]) == (2, 2)
    import math
    assert out[2]["mean"][0] == math.floor((10 + 20 + 30 + 40) / (4 * 255) * 1e6) / 1e6
    assert out[3]["width"] is None


def test_jpeg_roundtrip_flat_and_smooth():
    """Baseline JPEG decode is REAL: a flat-gray frame round-trips
    exactly (single DC coefficient, quant 16 -> lossless for flat
    blocks), a smooth gradient within ~2 gray levels (quantization
    loss only). The encoder is the in-repo fixture generator — the
    decoder honors whatever DQT/DHT the stream declares."""
    import numpy as np

    from hippollm_spark.testing import encode_baseline_jpeg

    flat = np.full((16, 24), 130, dtype=np.uint8)
    dec = MM._decode_baseline_jpeg(encode_baseline_jpeg(flat))
    assert dec.shape == (16, 24, 1)
    assert int(np.abs(dec[:, :, 0].astype(int) - 130).max()) == 0

    x = np.linspace(0, 255, 40)
    grad = np.clip(np.add.outer(np.linspace(0, 100, 24), x), 0, 255).astype(np.uint8)
    dec = MM._decode_baseline_jpeg(encode_baseline_jpeg(grad))
    assert np.abs(dec[:, :, 0].astype(float) - grad).mean() < 2.0


def test_jpeg_roundtrip_color_subsampling_and_restart():
    """RGB 4:4:4 and 4:2:0 decode through the MCU-interleaved path
    with chroma upsampling; restart intervals decode bit-identically
    to the same stream without them (DC predictors reset at RSTn)."""
    import numpy as np

    from hippollm_spark.testing import encode_baseline_jpeg

    img = np.zeros((17, 19, 3), np.uint8)
    img[:, :, 0] = 200
    img[:8, :, 1] = 90
    img[:, :9, 2] = 160
    dec = MM._decode_baseline_jpeg(encode_baseline_jpeg(img, subsampling="444"))
    assert dec.shape == (17, 19, 3)
    assert np.abs(dec.astype(float) - img).mean() < 4.0

    x = np.linspace(0, 200, 48)
    sm = np.zeros((40, 48, 3), np.uint8)
    sm[:, :, 0] = np.clip(np.add.outer(np.linspace(0, 55, 40), x), 0, 255)
    sm[:, :, 1] = 120
    sm[:, :, 2] = np.clip(255 - x, 0, 255)[None, :]
    dec420 = MM._decode_baseline_jpeg(encode_baseline_jpeg(sm, subsampling="420"))
    assert dec420.shape == (40, 48, 3)
    assert np.abs(dec420.astype(float) - sm).mean() < 4.0

    noise = (np.random.RandomState(7).rand(32, 32) * 255).astype(np.uint8)
    plain = MM._decode_baseline_jpeg(encode_baseline_jpeg(noise))
    rst = MM._decode_baseline_jpeg(encode_baseline_jpeg(noise, restart_interval=2))
    assert np.array_equal(plain, rst)


def test_jpeg_rejects_non_baseline():
    import numpy as np
    import pytest as _pytest

    from hippollm_spark.testing import encode_baseline_jpeg

    data = bytearray(encode_baseline_jpeg(np.full((8, 8), 99, np.uint8)))
    # flip SOF0 (FFC0) to SOF2 (FFC2): progressive must be rejected
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with _pytest.raises(ValueError, match="non-baseline"):
        MM._decode_baseline_jpeg(bytes(data))
    with _pytest.raises(ValueError, match="SOI"):
        MM._decode_baseline_jpeg(b"not a jpeg")


def test_decode_jpeg_stats_real(spark):
    import math

    import numpy as np

    from hippollm_spark.testing import encode_baseline_jpeg

    flat = np.full((8, 16), 100, dtype=np.uint8)
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[:, :, 0] = 255  # pure red
    rows = spark.createDataFrame(
        [
            (1, bytearray(encode_baseline_jpeg(flat))),
            (2, bytearray(encode_baseline_jpeg(rgb, subsampling="444"))),
            (3, bytearray(b"JPEGJUNK")),
        ],
        "media_id long, data binary",
    )
    out = {r["media_id"]: r for r in MM.decode_jpeg_stats(rows).collect()}
    assert (out[1]["width"], out[1]["height"]) == (16, 8)
    assert out[1]["mean"][0] == math.floor(100 / 255 * 1e6) / 1e6
    assert (out[2]["width"], out[2]["height"]) == (8, 8)
    # quantization keeps pure-red within a few levels
    assert out[2]["mean"][0] > 0.97 and out[2]["mean"][1] < 0.03
    assert out[3]["width"] is None


def test_phash64_real_without_pil(spark):
    """fake=False perceptual hashing runs on REAL pixels in this
    container via the in-repo JPEG/PNM decoders: identical images
    hash identically, a re-encode of the same scene stays within a
    few bits, an unrelated pattern is far, junk yields NULL."""
    import numpy as np

    from hippollm_spark.testing import encode_baseline_jpeg

    rng = np.random.RandomState(3)
    base = np.clip(
        np.add.outer(np.linspace(0, 180, 32), np.linspace(0, 60, 32))
        + rng.rand(32, 32) * 8,
        0, 255,
    ).astype(np.uint8)
    inverted = (255 - base).astype(np.uint8)
    ppm = b"P5\n32 32\n255\n" + base.tobytes()
    rows = spark.createDataFrame(
        [
            (1, bytearray(encode_baseline_jpeg(base))),
            (2, bytearray(encode_baseline_jpeg(base))),       # identical bytes
            (3, bytearray(ppm)),                              # same scene, PNM
            (4, bytearray(encode_baseline_jpeg(inverted))),   # unrelated
            (5, bytearray(b"JPEGJUNK")),
        ],
        "media_id long, data binary",
    )
    out = {r["media_id"]: r["phash"] for r in MM.phash64(rows, fake=False).collect()}
    assert out[1] == out[2]
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(out[1], out[3]) <= 6          # JPEG-vs-lossless same scene
    assert ham(out[1], out[4]) >= 40         # inverted image: most bits flip
    assert out[5] is None


def test_resize_image_real_path(spark):
    """fake=False resizing runs on REAL pixels via the in-repo
    decoders: a 32x32 PGM box-resampled to 8x8 re-encodes as a valid
    P5 the decoders can read back; a color JPEG resizes to P6; junk
    yields a NULL row; upscaling a tiny image is total."""
    import numpy as np

    from hippollm_spark.testing import encode_baseline_jpeg

    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, size=(32, 32), dtype=np.uint8)
    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb[:, :, 0] = 200  # red-ish block
    tiny = rng.randint(0, 256, size=(3, 5), dtype=np.uint8)
    rows = spark.createDataFrame(
        [
            (1, bytearray(b"P5\n32 32\n255\n" + gray.tobytes())),
            (2, bytearray(encode_baseline_jpeg(rgb))),
            (3, bytearray(b"JUNKJUNK")),
            (4, bytearray(b"P5\n5 3\n255\n" + tiny.tobytes())),
        ],
        "media_id long, data binary",
    )
    out = {r["media_id"]: r for r in MM.resize_image(rows, 8, 8, fake=False).collect()}
    # P5 output parses back and matches a direct box resample
    from hippollm_spark.operators.multimodal import _box_resample, _parse_pnm

    arr, w, h = _parse_pnm(bytes(out[1]["data"]))
    assert (w, h) == (8, 8) and out[1]["width"] == 8
    want = np.clip(np.rint(_box_resample(gray.astype(np.float64), 8, 8)), 0, 255)
    assert np.array_equal(arr[:, :, 0], want.astype(np.uint8))
    # color JPEG -> P6, still predominantly red after resample
    arr2, w2, h2 = _parse_pnm(bytes(out[2]["data"]))
    assert (w2, h2) == (8, 8) and arr2.shape[2] == 3
    assert arr2[:, :, 0].mean() > 150 and arr2[:, :, 1].mean() < 60
    assert out[3]["data"] is None and out[3]["width"] is None
    # 5x3 -> 8x8 upscale is total and well-formed
    arr4, w4, h4 = _parse_pnm(bytes(out[4]["data"]))
    assert (w4, h4) == (8, 8)


def test_resize_image_fake_plumbing(spark):
    """fake=True produces deterministic, correctly-shaped PNM payloads
    (plumbing check for codec-less containers): rerun-identical and
    parseable by the in-repo PNM decoder."""
    rows = spark.createDataFrame(
        [(1, bytearray(b"whatever")), (2, bytearray(b"other"))],
        "media_id long, data binary",
    )
    a = {r["media_id"]: bytes(r["data"]) for r in MM.resize_image(rows, 6, 4).collect()}
    b = {r["media_id"]: bytes(r["data"]) for r in MM.resize_image(rows, 6, 4).collect()}
    assert a == b and a[1] != a[2]
    from hippollm_spark.operators.multimodal import _parse_pnm

    arr, w, h = _parse_pnm(a[1])
    assert (w, h) == (6, 4) and arr.shape == (4, 6, 1)


def test_phash64_small_dimensions(spark):
    """Images with a dimension < 8 must still resample to exactly 64
    bits: a 100×4 PGM would otherwise emit 400 hash bits (overflowing
    the long column at Arrow conversion) and a 4×4 only 16 (breaking
    the 64-bit band extraction in phash_dup_pairs)."""
    import numpy as np

    rng = np.random.RandomState(7)
    wide = rng.randint(0, 256, size=(4, 100), dtype=np.uint8)   # h=4, w=100
    tall = rng.randint(0, 256, size=(100, 4), dtype=np.uint8)   # h=100, w=4
    tiny = rng.randint(0, 256, size=(4, 4), dtype=np.uint8)
    rows = spark.createDataFrame(
        [
            (1, bytearray(b"P5\n100 4\n255\n" + wide.tobytes())),
            (2, bytearray(b"P5\n4 100\n255\n" + tall.tobytes())),
            (3, bytearray(b"P5\n4 4\n255\n" + tiny.tobytes())),
        ],
        "media_id long, data binary",
    )
    out = {r["media_id"]: r["phash"] for r in MM.phash64(rows, fake=False).collect()}
    for mid, h in out.items():
        assert h is not None, mid
        assert -(1 << 63) <= h < (1 << 63), mid  # fits signed 64-bit
    # distinct content should not collapse to one hash
    assert len(set(out.values())) == 3
