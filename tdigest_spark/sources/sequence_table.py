"""Deterministic synthetic pre-tokenized sequence table.

Schema per BASELINE.json input_hint:
    (doc_id: string, tokens: array<int32>, n_tok: int32, source: string)

Generation recipe per FIXTURES.md §1 (seed=42, numpy PCG64): lognormal token
lengths, deliberately skewed source mix (web 70 / code 15 / books 10 /
wiki 4 / rare 1), per-source token-value distributions (Zipf / uniform /
mixture / constant-heavy — 'rare' exercises the reference's exact-duplicate
collapse path, /root/reference/tdigest.js:174-178). Fully vectorized; written
as multiple parquet files so Spark parallelizes the scan. Idempotent: a
params marker makes regeneration a no-op for the same (n_rows, seed, vocab).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["generate_sequence_table", "read_sequence_table", "ensure_iceberg_metadata", "SOURCES"]

SOURCES = ["web", "code", "books", "wiki", "rare"]
_SOURCE_P = [0.70, 0.15, 0.10, 0.04, 0.01]

_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)


def _draw_tokens(rng: np.random.Generator, source: str, count: int, vocab: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int32)
    if source == "web":
        vals = (rng.zipf(1.2, count) - 1) % vocab
    elif source == "code":
        vals = rng.integers(0, 8192, count)
    elif source == "books":
        vals = (rng.zipf(1.5, count) - 1) % vocab
    elif source == "wiki":
        mix = rng.random(count) < 0.8
        vals = np.where(
            mix, (rng.zipf(1.3, count) - 1) % vocab, rng.integers(0, vocab, count)
        )
    elif source == "rare":
        heavy = rng.random(count) < 0.9
        vals = np.where(heavy, 13, rng.integers(0, vocab, count))
    else:
        raise ValueError(source)
    return vals.astype(np.int32)


def _chunk(rng: np.random.Generator, start: int, n: int, vocab: int) -> pa.Table:
    n_tok = (
        np.clip(np.round(rng.lognormal(5.5, 0.8, n)), 1, 8192).astype(np.int32)
    )
    src_idx = rng.choice(len(SOURCES), size=n, p=_SOURCE_P)
    total = int(n_tok.sum())
    values = np.empty(total, dtype=np.int32)
    tok_src = np.repeat(src_idx, n_tok)
    for s, name in enumerate(SOURCES):
        mask = tok_src == s
        values[mask] = _draw_tokens(rng, name, int(mask.sum()), vocab)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int64()).cast(pa.int32()),
        pa.array(values, pa.int32()),
    )
    doc_ids = pa.array([f"doc-{i:012d}" for i in range(start, start + n)])
    sources = pa.array([SOURCES[i] for i in src_idx], pa.string())
    return pa.Table.from_arrays(
        [doc_ids, tokens, pa.array(n_tok, pa.int32()), sources], schema=_SCHEMA
    )


def generate_sequence_table(
    path: str | Path,
    n_rows: int,
    seed: int = 42,
    vocab: int = 50257,
    rows_per_file: int = 100_000,
) -> Path:
    """Generate (or reuse) the deterministic sequence table at ``path``."""
    path = Path(path)
    params = {"n_rows": n_rows, "seed": seed, "vocab": vocab,
              "rows_per_file": rows_per_file, "version": 1}
    marker = path / "_PARAMS.json"
    if marker.exists():
        try:
            if json.loads(marker.read_text()) == params:
                return path
        except Exception:
            pass
        # a stale marker must die BEFORE the data it vouches for: if this
        # regeneration crashes midway, the next run must NOT find the old
        # marker matching its params and return with wrong files on disk
        marker.unlink()
    if path.exists():
        # crashed earlier runs may leave part files with no marker; a
        # smaller regeneration would otherwise leave stale extra parts
        # that spark.read.parquet happily includes
        for f in path.glob("*.parquet"):
            f.unlink()
    path.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    start = 0
    fidx = 0
    while start < n_rows:
        n = min(rows_per_file, n_rows - start)
        tbl = _chunk(rng, start, n, vocab)
        pq.write_table(tbl, path / f"part-{fidx:05d}.parquet", compression="snappy")
        start += n
        fidx += 1
    marker.write_text(json.dumps(params))
    return path


def read_sequence_table(spark, path: str | Path):
    return spark.read.parquet(str(path))


def ensure_iceberg_metadata(path: str | Path) -> Path:
    """Commit the generated sequence-table files as an Iceberg snapshot
    (sources/iceberg_write.py) so readers resolve them through the real
    metadata walk — the north-rule shape ("Iceberg tables of pre-tokenized
    sequences"). Idempotent: existing metadata is reused when it still
    references exactly the on-disk file set, and rebuilt otherwise (the
    generator regenerates files in place when params change)."""
    import shutil

    from . import iceberg_write as W
    from .iceberg import is_static_iceberg_table, iceberg_scan_paths_static

    path = Path(path)
    files = sorted(str(p) for p in path.glob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    if is_static_iceberg_table(str(path)):
        try:
            if iceberg_scan_paths_static(str(path)) == files:
                return path
        except Exception:
            pass
        shutil.rmtree(path / "metadata")
    W.create_table(path, ts_ms=0)
    W.append_snapshot(path, files, snapshot_id=1, ts_ms=0)
    return path


def default_cache_dir() -> Path:
    root = os.environ.get("TDIGEST_SPARK_CACHE", "/root/repo/.cache")
    return Path(root) / "seqtable"
