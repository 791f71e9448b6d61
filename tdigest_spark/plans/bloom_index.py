"""FILE-LEVEL BLOOM SIDECAR INDEX — point-lookup pruning for UNSORTED
high-cardinality keys, the case parquet zone maps (min/max) cannot help:
when a key column is hash-scattered across files, every file's [min, max]
spans the whole domain and stats-based pruning selects everything. A tiny
Bloom sidecar per data file answers "might this file contain key k?" with
no false negatives, so a point lookup opens only the (few) files whose
bloom matches — the same idea as Iceberg's bloom-filter file metrics and
parquet's column bloom filters, kept engine-side here so the pruning
decision is explicit and testable.

Scale shape: the index is O(files) tiny blobs read driver-side (a 100-TB
table at 512 MB/file is ~200k sidecars of a few KB — a metadata-sized
read, and itself shardable); the data read is only the matched files.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..sketch.bloom import BloomFilter

__all__ = ["build_bloom_index", "prune_files_by_keys"]

_SIDECAR_SUFFIX = ".bloom"


def build_bloom_index(
    files: list[str | Path], key_col: str, fpp: float = 0.01
) -> list[Path]:
    """Write one ``<file>.bloom`` sidecar per parquet data file holding a
    Bloom filter of its integer ``key_col`` values. Returns the sidecar
    paths. Deterministic for fixed inputs (the filter hashing is
    seed-free)."""
    import pyarrow.parquet as pq

    out = []
    for f in files:
        f = Path(str(f))
        keys = np.asarray(
            pq.read_table(f, columns=[key_col], use_threads=False)[
                key_col
            ].to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        bf = BloomFilter(expected_items=max(1, len(keys)), fpp=fpp)
        bf.add_ints(keys)
        side = f.with_suffix(f.suffix + _SIDECAR_SUFFIX)
        side.write_bytes(bf.to_bytes())
        out.append(side)
    return out


def prune_files_by_keys(
    files: list[str | Path], keys: list[int]
) -> list[str]:
    """The lookup-side half: keep only files whose sidecar might contain
    ANY of ``keys`` (no false negatives — a missing sidecar keeps the
    file, fail-safe). Returns kept file paths as strings."""
    ks = np.asarray(sorted(set(int(k) for k in keys)), dtype=np.int64)
    kept = []
    for f in files:
        f = Path(str(f))
        side = f.with_suffix(f.suffix + _SIDECAR_SUFFIX)
        if not side.exists():
            kept.append(str(f))
            continue
        bf = BloomFilter.from_bytes(side.read_bytes())
        if bool(bf.might_contain_ints(ks).any()):
            kept.append(str(f))
    return kept
