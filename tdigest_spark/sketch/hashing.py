"""Vectorized deterministic 64-bit hashing for the companion sketches.

splitmix64 finalizer (Steele et al., public domain constants) applied over
numpy uint64 arrays — fully vectorized, no per-row Python. Strings are first
reduced to uint64 via a vectorized FNV-1a-over-bytes fold."""

from __future__ import annotations

import numpy as np

__all__ = [
    "hash64",
    "hash64_with_seed",
    "hash_strings",
    "md5_lower64",
    "md5_lower64_ints",
]

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def hash64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array (vectorized)."""
    z = np.asarray(x).astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += _GOLDEN
        z ^= z >> np.uint64(30)
        z *= _C1
        z ^= z >> np.uint64(27)
        z *= _C2
        z ^= z >> np.uint64(31)
    return z


def hash64_with_seed(x: np.ndarray, seed: int) -> np.ndarray:
    z = np.asarray(x).astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z ^= np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
    return hash64(z)


def hash_strings(values) -> np.ndarray:
    """Deterministic uint64 hash of an iterable of strings: pandas' cython
    siphash13 (fixed key, deterministic across processes/machines)
    finalized with splitmix64.

    Deliberately ONE hash family with no fallback: a silent per-host
    fallback would let two executors hash the same string differently,
    producing merged sketches that are internally inconsistent (Bloom
    false negatives, wrong CMS/HLL string estimates) with no error ever
    raised. pandas is a hard dependency of this package, so failure here
    should fail loudly."""
    import pandas as pd

    h = pd.util.hash_pandas_object(
        pd.Series(list(values), dtype=object), index=False
    ).to_numpy(dtype=np.uint64)
    return hash64(h)


def md5_lower64(strings) -> np.ndarray:
    """THE canonical md5-lower-64: bytes 8..16 of MD5, little-endian, per
    byte string — exactly DuckDB's ``md5_number_lower``, so every banding /
    blocking / bottom-k decision keyed on it is reproducible in the SQL
    oracles. One definition on purpose: a second copy could drift (digest
    slice, endianness) and silently break oracle parity for its consumers.
    Deliberately per-string C hashing rather than a vectorized numpy
    polynomial hash: the numpy variant allocates ~10x-the-input
    temporaries, and cold first-touch page faults make it ~25x slower here
    (0.18s vs 2.6s on 260k shingles; see CLAUDE.md env notes)."""
    from hashlib import md5

    return np.fromiter(
        (int.from_bytes(md5(s).digest()[8:16], "little") for s in strings),
        dtype=np.uint64,
        count=len(strings),
    )


def md5_lower64_ints(values) -> np.ndarray:
    """md5-lower-64 of each integer's decimal spelling — DuckDB's
    ``md5_number_lower(CAST(x AS VARCHAR))`` (bottom-k Jaccard priorities)."""
    return md5_lower64([b"%d" % int(x) for x in values])
