"""Bloom filter (Bloom 1970) with the standard double-hashing scheme
(Kirsch & Mitzenmacher 2006): h_i = h1 + i*h2 mod m. Companion sketch per
BASELINE.json north_rule; absent in the reference. Merge = bitwise OR.
Spark cross-check oracle: df.stat.bloomFilter / exact membership."""

from __future__ import annotations

import math
import struct

import numpy as np

from .hashing import hash64_with_seed, hash_strings

__all__ = ["BloomFilter"]

_HEADER = struct.Struct("<4sQI q")  # magic, m_bits, k, n_added


class BloomFilter:
    __slots__ = ("m_bits", "k", "bits", "n_added")

    def __init__(self, expected_items: int = 1_000_000, fpp: float = 0.01):
        m = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
        self.m_bits = (m + 63) // 64 * 64
        self.k = max(1, round(self.m_bits / expected_items * math.log(2)))
        self.bits = np.zeros(self.m_bits // 64, dtype=np.uint64)
        self.n_added = 0

    @classmethod
    def _raw(cls, m_bits: int, k: int) -> "BloomFilter":
        bf = cls.__new__(cls)
        bf.m_bits = m_bits
        bf.k = k
        bf.bits = np.zeros(m_bits // 64, dtype=np.uint64)
        bf.n_added = 0
        return bf

    def _positions(self, ukeys: np.ndarray) -> np.ndarray:
        h1 = hash64_with_seed(ukeys, 0x51ED)
        h2 = hash64_with_seed(ukeys, 0xC0FFEE) | np.uint64(1)
        m = np.uint64(self.m_bits)
        pos = np.empty((self.k, ukeys.shape[0]), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                pos[i] = (h1 + np.uint64(i) * h2) % m
        return pos

    def _add_hashed(self, ukeys: np.ndarray) -> "BloomFilter":
        pos = self._positions(ukeys).ravel()
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        np.bitwise_or.at(self.bits, word, bit)
        self.n_added += int(ukeys.shape[0])
        return self

    def add_ints(
        self, values: np.ndarray, assume_unique: bool = False
    ) -> "BloomFilter":
        v = np.asarray(values)
        if v.shape[0] == 0:
            return self
        # set semantics: dedup first (ufunc.at cost scales with inputs);
        # assume_unique lets pre-deduped callers skip the sort
        if not assume_unique:
            v = np.unique(v)
        return self._add_hashed(v.astype(np.int64).astype(np.uint64))

    def add_strings(self, values) -> "BloomFilter":
        if len(values) == 0:
            return self
        return self._add_hashed(hash_strings(values))

    def _contains_hashed(self, ukeys: np.ndarray) -> np.ndarray:
        pos = self._positions(ukeys)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        hits = (self.bits[word] & bit) != 0
        return hits.all(axis=0)

    def might_contain_ints(self, values: np.ndarray) -> np.ndarray:
        v = np.asarray(values)
        return self._contains_hashed(v.astype(np.int64).astype(np.uint64))

    def might_contain_strings(self, values) -> np.ndarray:
        return self._contains_hashed(hash_strings(values))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.m_bits, other.k) != (self.m_bits, self.k):
            raise ValueError("shape mismatch")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_added += other.n_added
        return self

    def to_bytes(self) -> bytes:
        return (
            _HEADER.pack(b"BLM1", self.m_bits, self.k, self.n_added)
            + self.bits.astype("<u8").tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        magic, m_bits, k, n_added = _HEADER.unpack_from(data, 0)
        if magic != b"BLM1":
            raise ValueError("not a Bloom blob")
        bf = cls._raw(m_bits, k)
        bf.bits = np.frombuffer(
            data, dtype="<u8", count=m_bits // 64, offset=_HEADER.size
        ).copy()
        bf.n_added = n_added
        return bf
