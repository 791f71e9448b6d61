"""Multimodal (image / audio / video) columns as opaque binary + metadata.

Pattern for 100 TB training-data pipelines: media payloads travel as
``binary`` columns with typed metadata (codec, dims, duration), and every
transform is an Arrow-batched ``mapInPandas``/``mapInArrow`` stage —
map-only, no shuffle, pipelined with the parquet scan.

Decode is a REAL codec dispatch (operators/codecs.py: PPM/PGM, 24-bit BMP,
8-bit PNG via zlib, 16-bit PCM WAV via the stdlib wave module, and
uncompressed YUV4MPEG2 C444 video — no external libraries needed).
Payloads in containers beyond that set (JPEG, FLAC, H.264) fall back to
the deterministic stub decoder — heavyweight codecs (PIL/ffmpeg/
soundfile) are not in this container; wire them into ``_decode_image``/
``_decode_audio``/``_decode_video`` and nothing else changes. The
fallback is strict-deterministic: a payload either parses fully as a
supported container or takes the stub path, never a half-decode.

Schema conventions (see MEDIA_SCHEMA below — flat typed metadata columns,
not a nested struct, so parquet stats/pruning apply per field):
    media(doc_id, kind, payload binary, width, height, sample_rate, n_frames)
    image features -> array<float> embedding-ready vectors
    audio features -> frame-level array<float>
    video          -> sampled frames as array<binary>
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "MEDIA_SCHEMA",
    "make_media_table",
    "decode_image_stats",
    "image_resize_features",
    "audio_frame_energy",
    "image_ahash_bands",
    "video_sample_frames",
]

MEDIA_SCHEMA = (
    "doc_id string, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

def _seed_from(payload: bytes) -> int:
    """md5 lower 64 bits, little-endian — DuckDB ``md5_number_lower`` of the
    same bytes, so stub-decoded outputs are SQL-reproducible."""
    return int.from_bytes(hashlib.md5(payload).digest()[8:16], "little")


def _fake_decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for codecs outside the supported set: (H, W, 3)
    uint8 derived from the payload hash.

    Pixel i (C-order) = splitmix64(md5_seed XOR i) & 255 — both halves
    (md5_number_lower, splitmix64 via UHUGEINT mod-2^64 arithmetic) are
    expressible in DuckDB SQL, which is what gives media_decode_stats an
    exact VALUES-free oracle at any scale factor."""
    from ..sketch.hashing import hash64

    seed = np.uint64(_seed_from(payload))
    idx = np.arange(int(width) * int(height) * 3, dtype=np.uint64)
    v = hash64(seed ^ idx) & np.uint64(255)
    return v.astype(np.uint8).reshape(int(height), int(width), 3)


def _fake_decode_audio(payload: bytes, n: int) -> np.ndarray:
    rng = np.random.default_rng(_seed_from(payload))
    return rng.normal(0.0, 0.25, n).astype(np.float32)


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """REAL image decode (PPM/PGM/BMP/PNG — operators/codecs.py) with a
    deterministic stub fallback for unsupported containers. Strict parsers
    make the dispatch deterministic: a payload that merely shares a magic
    prefix fails validation and takes the stub path, never a mis-decode."""
    from . import codecs

    b = bytes(payload)
    if codecs.sniff(b) in ("png", "bmp", "ppm"):
        try:
            return codecs.decode_image(b)
        except Exception:  # ValueError, but also struct.error / zlib.error
            # from payloads truncated inside a chunk — any parse failure
            # takes the deterministic stub path, never a task crash
            pass
    return _fake_decode_image(b, width, height)


def _decode_audio(payload: bytes, n: int) -> np.ndarray:
    """REAL audio decode (16-bit PCM WAV) with the deterministic stub
    fallback; ``n`` is only used by the stub (real containers carry their
    own length)."""
    from . import codecs

    b = bytes(payload)
    if codecs.sniff(b) == "wav":
        try:
            return codecs.decode_audio(b)[0]
        except Exception:  # wave.Error / truncated container
            pass
    return _fake_decode_audio(b, n)


def _fake_decode_video(payload: bytes, n_frames: int) -> np.ndarray:
    """Deterministic stub video: ``n_frames`` 8x8x3 frames, pixel i
    (C-order over the whole clip) = splitmix64(md5_seed XOR i) & 255 —
    same SQL-expressible construction as the image stub."""
    from ..sketch.hashing import hash64

    seed = np.uint64(_seed_from(payload))
    n = max(1, int(n_frames))
    idx = np.arange(n * 8 * 8 * 3, dtype=np.uint64)
    v = hash64(seed ^ idx) & np.uint64(255)
    return v.astype(np.uint8).reshape(n, 8, 8, 3)


def _decode_video(payload: bytes, n_frames: int) -> np.ndarray:
    """REAL video decode (uncompressed YUV4MPEG2 C444 —
    codecs.decode_y4m) with the deterministic stub fallback. Strict
    parsing keeps the dispatch deterministic: a truncated frame or a
    subsampled colorspace fails validation and takes the stub path;
    ``n_frames`` is only used by the stub (a real container carries its
    own frame count)."""
    from . import codecs

    b = bytes(payload)
    if codecs.sniff(b) == "y4m":
        try:
            return codecs.decode_y4m(b)[0]
        except Exception:
            pass
    return _fake_decode_video(b, n_frames)


def make_media_table(spark, n_rows: int = 256, seed: int = 0) -> DataFrame:
    """Deterministic synthetic media table (payload = compressed-ish random
    bytes) for tests and benchmarks."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[
        rng.integers(0, 3, n_rows)
    ]
    rows = []
    for i, kind in enumerate(kinds):
        payload = rng.integers(0, 256, int(rng.integers(256, 2048)), dtype=np.uint8).tobytes()
        rows.append(
            (
                f"m-{i:08d}",
                str(kind),
                bytearray(payload),
                int(rng.integers(32, 257)) if kind == "image" else 0,
                int(rng.integers(32, 257)) if kind == "image" else 0,
                16000 if kind == "audio" else 0,
                int(rng.integers(8, 65)) if kind == "video" else 0,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image_stats(df: DataFrame) -> DataFrame:
    """Decode images and emit per-channel mean/std (the canonical
    pre-normalization pass). Arrow-batched; non-image rows are filtered
    out JVM-side before Python sees them."""
    sel = df.where(df.kind == "image").select(
        "doc_id", "payload", "width", "height"
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = {
                "doc_id": [],
                "mean_r": [],
                "mean_g": [],
                "mean_b": [],
                "std_gray": [],
            }
            for r in pdf.itertuples():
                img = _decode_image(bytes(r.payload), r.width, r.height)
                m = img.reshape(-1, 3).mean(axis=0)
                gray = img.mean(axis=2)
                out["doc_id"].append(r.doc_id)
                out["mean_r"].append(float(m[0]))
                out["mean_g"].append(float(m[1]))
                out["mean_b"].append(float(m[2]))
                out["std_gray"].append(float(gray.std()))
            yield pd.DataFrame(out)

    return sel.mapInPandas(
        run,
        "doc_id string, mean_r double, mean_g double, mean_b double, "
        "std_gray double",
    )


def image_resize_features(df: DataFrame, side: int = 16) -> DataFrame:
    """Decode -> grid-subsample resize (nearest, top-left aligned) ->
    flatten to a float feature
    vector of fixed length side*side: the embedding-ready shape. Output is
    array<float> so it plugs straight into the similarity operators."""
    sel = df.where(df.kind == "image").select(
        "doc_id", "payload", "width", "height"
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            ids, feats = [], []
            for r in pdf.itertuples():
                img = _decode_image(bytes(r.payload), r.width, r.height)
                ys = (np.arange(side) * img.shape[0] // side).astype(int)
                xs = (np.arange(side) * img.shape[1] // side).astype(int)
                small = img[np.ix_(ys, xs)].mean(axis=2) / 255.0
                ids.append(r.doc_id)
                feats.append(small.ravel().astype(np.float32).tolist())
            yield pd.DataFrame({"doc_id": ids, "feature": feats})

    return sel.mapInPandas(run, "doc_id string, feature array<float>")


def image_ahash_bands(df: DataFrame, grid: int = 8) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint, emitted directly as
    4 x 16-bit BAND integers — the banded form LSH blocking wants (two
    images within Hamming distance 6 of each other agree exactly on at
    least one band, so band-equality candidate generation never scans
    all pairs). Decode -> nearest-grid 8x8 subsample (same top-left
    convention as image_resize_features) -> per-cell integer channel
    sum gsum = r+g+b (0..765) -> bit_p = (64 * gsum_p > sum of the 64
    gsums) -> pack 16 bits per band. ALL-INTEGER end to end, so for
    stub-decoded payloads the whole hash is exactly SQL-replayable
    (splitmix64 pixels + the same grid index arithmetic)."""
    if grid != 8:
        raise ValueError("image_ahash_bands packs 64 bits: grid must be 8")
    sel = df.where(df.kind == "image").select(
        "doc_id", "payload", "width", "height"
    )
    nbits = grid * grid

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(16, dtype=np.int64)
        for pdf in pdfs:
            ids: list = []
            bands: list = [[], [], [], []]
            for r in pdf.itertuples():
                img = _decode_image(
                    bytes(r.payload), r.width, r.height
                ).astype(np.int64)
                ys = (np.arange(grid) * img.shape[0] // grid).astype(int)
                xs = (np.arange(grid) * img.shape[1] // grid).astype(int)
                gsum = img[np.ix_(ys, xs)].sum(axis=2).ravel()
                total = int(gsum.sum())
                bits = (nbits * gsum > total).astype(np.int64)
                ids.append(r.doc_id)
                for k in range(4):
                    seg = bits[16 * k : 16 * (k + 1)]
                    bands[k].append(int((seg << shifts).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "b0": bands[0],
                    "b1": bands[1],
                    "b2": bands[2],
                    "b3": bands[3],
                }
            )

    return sel.mapInPandas(
        run, "doc_id string, b0 int, b1 int, b2 int, b3 int"
    )


def audio_frame_energy(df: DataFrame, frame: int = 1024) -> DataFrame:
    """Decode audio and emit per-frame RMS energy (VAD/quality primitive).
    One output row per media row; frame energies as array<float>."""
    sel = df.where(df.kind == "audio").select("doc_id", "payload", "sample_rate")

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            ids, en = [], []
            for r in pdf.itertuples():
                wav = _decode_audio(bytes(r.payload), r.sample_rate)
                n = (len(wav) // frame) * frame
                frames = wav[:n].reshape(-1, frame)
                ids.append(r.doc_id)
                en.append(
                    np.sqrt((frames**2).mean(axis=1)).astype(np.float32).tolist()
                )
            yield pd.DataFrame({"doc_id": ids, "rms": en})

    return sel.mapInPandas(run, "doc_id string, rms array<float>")


def audio_frame_features(df: DataFrame, frame: int = 256) -> DataFrame:
    """DECODE audio and emit EXACT per-frame features on the recovered
    int16 PCM lattice: the squared-sample sum (frame energy, exact
    int64 — frame·32768² ≪ 2^63) and the zero-crossing count (sign
    flips between consecutive samples within the frame; the classic
    voiced/unvoiced + noise discriminator). Working on the integer
    lattice instead of normalized floats is what makes the features
    SQL-replayable bit-for-bit. Trailing partial frames are dropped.
    One output row per (doc, frame); map-only, pipelined with the
    scan."""
    sel = df.where(df.kind == "audio").select(
        "doc_id", "payload", "sample_rate"
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = {
                "doc_id": [], "frame_idx": [], "n_samples": [],
                "sum_sq": [], "zcr": [],
            }
            for r in pdf.itertuples():
                wav = _decode_audio(bytes(r.payload), r.sample_rate)
                # decode_wav normalizes int16/32768 into float32 —
                # exactly representable, so this recovery is lossless
                v = np.round(wav.astype(np.float64) * 32768.0).astype(
                    np.int64
                )
                n = (len(v) // frame) * frame
                fr = v[:n].reshape(-1, frame)
                neg = fr < 0
                zc = (neg[:, 1:] != neg[:, :-1]).sum(axis=1)
                sq = (fr * fr).sum(axis=1)
                for i in range(fr.shape[0]):
                    out["doc_id"].append(r.doc_id)
                    out["frame_idx"].append(i)
                    out["n_samples"].append(frame)
                    out["sum_sq"].append(int(sq[i]))
                    out["zcr"].append(int(zc[i]))
            yield pd.DataFrame(out)

    return sel.mapInPandas(
        run,
        "doc_id string, frame_idx int, n_samples int, sum_sq long, "
        "zcr int",
    )


def video_frame_stats(df: DataFrame, every: int = 2) -> DataFrame:
    """DECODE video containers and emit per-sampled-frame plane means —
    the shot-boundary / quality primitive over real frames. Real path =
    uncompressed YUV4MPEG2 (codecs.decode_y4m, byte-exact planes);
    unsupported containers take the deterministic stub. Fan-out: one
    input row -> ceil(n_frames/every) rows; map-only, pipelined with the
    scan (the 100 TB shape — no shuffle until whatever aggregates the
    stats)."""
    sel = df.where(df.kind == "video").select("doc_id", "payload", "n_frames")

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "mean_y": [],
                "mean_u": [],
                "mean_v": [],
            }
            for r in pdf.itertuples():
                frames = _decode_video(bytes(r.payload), int(r.n_frames))
                for fi in range(0, frames.shape[0], every):
                    m = frames[fi].reshape(-1, 3).mean(axis=0)
                    out["doc_id"].append(r.doc_id)
                    out["frame_idx"].append(fi)
                    out["mean_y"].append(float(m[0]))
                    out["mean_u"].append(float(m[1]))
                    out["mean_v"].append(float(m[2]))
            yield pd.DataFrame(out)

    return sel.mapInPandas(
        run,
        "doc_id string, frame_idx int, mean_y double, mean_u double, "
        "mean_v double",
    )


def video_sample_frames(df: DataFrame, every: int = 8) -> DataFrame:
    """Uniform frame sampling: emit one row per sampled frame index with a
    deterministic per-frame payload slice (stub for the ffmpeg seek+decode;
    shows the fan-out shape: input row -> ceil(n_frames/every) rows)."""
    sel = df.where(df.kind == "video").select("doc_id", "payload", "n_frames")

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            ids, idxs, frames = [], [], []
            for r in pdf.itertuples():
                payload = bytes(r.payload)
                for fi in range(0, int(r.n_frames), every):
                    ids.append(r.doc_id)
                    idxs.append(fi)
                    h = hashlib.blake2b(
                        payload + fi.to_bytes(4, "little"), digest_size=32
                    ).digest()
                    frames.append(bytearray(h))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return sel.mapInPandas(
        run, "doc_id string, frame_idx int, frame binary"
    )
