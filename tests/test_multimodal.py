"""Multimodal binary-column plumbing (operators/multimodal.py).

These tests use the synthetic media table, whose payloads are opaque random
bytes — they exercise the deterministic stub-decode path plus the REAL
plumbing: schemas, Arrow batch iteration, output shapes/cardinality,
determinism across partitionings, and composition with the similarity
operators. Real-container decode (PPM/PNG/BMP/WAV) is covered in
tests/test_codecs.py.
"""

import numpy as np
from pyspark.sql import functions as F

from tdigest_spark.operators.multimodal import (
    audio_frame_energy,
    decode_image_stats,
    image_resize_features,
    make_media_table,
    video_sample_frames,
)


def test_image_stats_shape_and_determinism(spark):
    media = make_media_table(spark, n_rows=96, seed=4)
    n_img = media.where(F.col("kind") == "image").count()
    out = decode_image_stats(media)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == n_img
    for r in rows.values():
        assert 0 <= r["mean_r"] <= 255 and 0 <= r["std_gray"] <= 128

    # repartitioned input -> identical values (stub decode is payload-pure)
    rows2 = {
        r["doc_id"]: r
        for r in decode_image_stats(media.repartition(7)).collect()
    }
    for k, r in rows.items():
        assert abs(rows2[k]["mean_r"] - r["mean_r"]) < 1e-9


def test_image_features_feed_similarity(spark):
    media = make_media_table(spark, n_rows=64, seed=5)
    feats = image_resize_features(media, side=8)
    got = feats.collect()
    assert all(len(r["feature"]) == 64 for r in got)

    # embedding-ready: brute-force cosine against the first image works
    from tdigest_spark.operators.similarity import topk_cosine

    q = got[0]["feature"]
    ids = feats.withColumn("vec_id", F.xxhash64("doc_id")).withColumnRenamed(
        "feature", "embedding"
    )
    top = topk_cosine(ids, [float(x) for x in q], k=3).collect()
    assert len(top) == 3


def test_audio_energy_frames(spark):
    media = make_media_table(spark, n_rows=64, seed=6)
    n_audio = media.where(F.col("kind") == "audio").count()
    out = audio_frame_energy(media, frame=1024).collect()
    assert len(out) == n_audio
    for r in out:
        # 16000 samples -> 15 full 1024-frames
        assert len(r["rms"]) == 15
        assert all(0 < e < 1 for e in r["rms"])


def test_video_frame_sampling_cardinality(spark):
    media = make_media_table(spark, n_rows=64, seed=7)
    vids = {
        r["doc_id"]: r["n_frames"]
        for r in media.where(F.col("kind") == "video").collect()
    }
    out = video_sample_frames(media, every=8)
    counts = {
        r["doc_id"]: r["cnt"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert counts == {
        k: int(np.ceil(n / 8)) for k, n in vids.items()
    }
    one = out.first()
    assert len(bytes(one["frame"])) == 32


def test_video_frame_stats_real_vs_stub(spark):
    """video_frame_stats decodes REAL Y4M containers to their exact
    planes (channel means match the encoded pixels) while a non-Y4M
    payload takes the deterministic stub (8x8 frames seeded from the
    payload hash — different values, same schema)."""
    import numpy as np

    from tdigest_spark.operators import codecs
    from tdigest_spark.operators.multimodal import (
        _fake_decode_video,
        video_frame_stats,
    )

    rng = np.random.default_rng(5)
    fr = rng.integers(0, 256, (5, 4, 6, 3), dtype=np.uint8)
    real = codecs.encode_y4m(fr)
    junk = b"not-a-video-" + bytes(rng.integers(0, 256, 64, dtype=np.uint8))
    df = spark.createDataFrame(
        [
            ("real", "video", bytearray(real), 5),
            ("stub", "video", bytearray(junk), 3),
        ],
        "doc_id string, kind string, payload binary, n_frames int",
    )
    rows = {
        (r.doc_id, r.frame_idx): (r.mean_y, r.mean_u, r.mean_v)
        for r in video_frame_stats(df, every=2).collect()
    }
    # real: frames 0,2,4 decode to the exact encoded planes
    for fi in (0, 2, 4):
        m = fr[fi].reshape(-1, 3).mean(axis=0)
        assert rows[("real", fi)] == (float(m[0]), float(m[1]), float(m[2]))
    # stub: deterministic fake frames (0, 2) seeded from the payload
    fake = _fake_decode_video(junk, 3)
    for fi in (0, 2):
        m = fake[fi].reshape(-1, 3).mean(axis=0)
        assert rows[("stub", fi)] == (float(m[0]), float(m[1]), float(m[2]))
    assert set(rows) == {("real", 0), ("real", 2), ("real", 4),
                         ("stub", 0), ("stub", 2)}


def _py_ahash_bands(payload: bytes, w: int, h: int):
    """Pure-python aHash replay of image_ahash_bands over the STUB decode
    (plain ints + hashlib — no numpy, no Spark: a third code path next to
    the Arrow kernel and the DuckDB oracle)."""
    import hashlib

    M = (1 << 64) - 1
    seed = int.from_bytes(hashlib.md5(payload).digest()[8:16], "little")

    def sm64(x):
        z = (x + 0x9E3779B97F4A7C15) & M
        z ^= z >> 30
        z = (z * 0xBF58476D1CE4E5B9) & M
        z ^= z >> 27
        z = (z * 0x94D049BB133111EB) & M
        return z ^ (z >> 31)

    def px(i):
        return sm64(seed ^ i) & 255

    gsum = []
    for ty in range(8):
        y = ty * h // 8
        for tx in range(8):
            x = tx * w // 8
            base = (y * w + x) * 3
            gsum.append(px(base) + px(base + 1) + px(base + 2))
    total = sum(gsum)
    bits = [1 if 64 * g > total else 0 for g in gsum]
    return [
        sum(bits[16 * k + j] << j for j in range(16)) for k in range(4)
    ]


def test_image_ahash_bands_match_python(spark):
    from tdigest_spark.operators.multimodal import image_ahash_bands

    media = make_media_table(spark, n_rows=48, seed=7)
    src = {
        r["doc_id"]: (bytes(r["payload"]), r["width"], r["height"])
        for r in media.where(F.col("kind") == "image").collect()
    }
    got = {
        r["doc_id"]: [r["b0"], r["b1"], r["b2"], r["b3"]]
        for r in image_ahash_bands(media).collect()
    }
    assert set(got) == set(src)
    for k, (p, w, h) in src.items():
        assert got[k] == _py_ahash_bands(p, w, h), k
        assert all(0 <= b < 65536 for b in got[k])

    # partition-layout invariance (hash is payload-pure)
    got2 = {
        r["doc_id"]: [r["b0"], r["b1"], r["b2"], r["b3"]]
        for r in image_ahash_bands(media.repartition(5)).collect()
    }
    assert got2 == got


def test_phash_dedup_query_invariants(spark):
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    row = entry.media_image_phash_dedup(spark, SF_DIR).collect()[0]
    assert row["n_images"] == 260
    # the 60 planted twins share payload AND dims -> Hamming 0, and
    # band-equality blocking MUST surface every one of them (recall 1.0
    # at distance 0 is pigeonhole-guaranteed, not probabilistic)
    assert row["n_exact"] >= 60
    assert row["n_candidate_pairs"] == (
        row["n_exact"] + row["n_near"] + row["n_far"]
    )
    assert 0 <= row["max_hamming"] <= 64
