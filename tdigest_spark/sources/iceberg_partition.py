"""Iceberg HIDDEN PARTITIONING: partition transforms + tuple pruning.

Iceberg decouples the partition layout from the query: files carry a
partition TUPLE computed by declared transforms (identity, bucket[N],
truncate[W], year/month/day/hour), and the planner derives partition
predicates from ordinary column predicates — the user never writes
``WHERE ts_month = ...``. This module implements the transform functions
and the predicate -> partition-tuple pruning rules the static planner
(sources/iceberg.py) applies; sources/iceberg_write.py records the tuples
at commit time.

Semantics from the Apache Iceberg table spec (public documentation):

* ``bucket[N]``: ``(murmur3_x86_32(encoded) & Integer.MAX_VALUE) % N``
  where ints/longs/dates/timestamps encode as 8-byte little-endian
  two's-complement longs and strings as UTF-8 bytes (the spec's own test
  vectors — hash(34L) = 2017239379, hash("iceberg") = 1210000089 — are
  pinned in tests/test_iceberg_source.py);
* ``truncate[W]``: ``v - (v mod W)`` with floored mod for integers, the
  first W characters for strings;
* ``year/month/day/hour``: signed counts since the epoch.

Pruning soundness: a transform-partitioned file contains ONLY rows whose
transformed value equals the recorded tuple entry, so for ORDER-PRESERVING
transforms (identity, truncate, the time family) a range predicate on the
source column relaxes to the same comparison on transformed values, and
for bucket only equality prunes. Missing tuples or unknown transforms keep
the file — pruning is an optimization, never a correctness filter.
"""

from __future__ import annotations

import datetime as _dt
import re
import struct

__all__ = [
    "murmur3_x86_32",
    "apply_transform",
    "partition_value_matches",
    "parse_transform",
]

_EPOCH = _dt.datetime(1970, 1, 1)


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit (Austin Appleby, public domain), the hash the
    Iceberg spec fixes for bucket transforms."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    nblocks = len(data) // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i: 4 * i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[4 * nblocks:]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _bucket_bytes(v) -> bytes:
    if isinstance(v, bool):
        raise TypeError("boolean values cannot be bucketed")
    if isinstance(v, int):  # int/long/date-ordinal/timestamp-micros: 8B LE
        return struct.pack("<q", v)
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, _dt.datetime):
        micros = int((v - _EPOCH.replace(tzinfo=v.tzinfo)) / _dt.timedelta(
            microseconds=1
        ))
        return struct.pack("<q", micros)
    raise TypeError(f"unsupported bucket source type {type(v).__name__}")


def parse_transform(name: str) -> tuple[str, int | None]:
    """'bucket[8]' -> ('bucket', 8); 'month' -> ('month', None)."""
    m = re.fullmatch(r"(identity|year|month|day|hour)", name)
    if m:
        return m.group(1), None
    m = re.fullmatch(r"(bucket|truncate)\[(\d+)\]", name)
    if m:
        return m.group(1), int(m.group(2))
    raise ValueError(f"unknown partition transform {name!r}")


def apply_transform(transform: str, v):
    """The transformed (partition) value of ``v`` — int or str."""
    kind, arg = parse_transform(transform)
    if v is None:
        return None
    if kind == "identity":
        return v
    if kind == "bucket":
        return (murmur3_x86_32(_bucket_bytes(v)) & 0x7FFFFFFF) % arg
    if kind == "truncate":
        if isinstance(v, str):
            return v[:arg]
        if isinstance(v, int) and not isinstance(v, bool):
            return v - (((v % arg) + arg) % arg)
        raise TypeError(f"truncate of {type(v).__name__}")
    if not isinstance(v, _dt.datetime):
        raise TypeError(f"{kind} transform of {type(v).__name__}")
    if kind == "year":
        return v.year - 1970
    if kind == "month":
        return (v.year - 1970) * 12 + (v.month - 1)
    if kind == "day":
        return (v.date() - _EPOCH.date()).days
    if kind == "hour":
        delta = v.replace(tzinfo=None) - _EPOCH
        return delta.days * 24 + delta.seconds // 3600
    raise AssertionError(kind)


_ORDER_PRESERVING = {"identity", "truncate", "year", "month", "day", "hour"}


def partition_value_matches(transform: str, part_value, op: str, literal) -> bool:
    """Can a file whose partition entry is ``part_value`` contain rows with
    ``col op literal``? Conservative: unknown cases return True."""
    kind, _ = parse_transform(transform)
    try:
        t_lit = apply_transform(transform, literal)
    except (TypeError, ValueError):
        return True
    if isinstance(t_lit, _dt.datetime):
        # identity on a timestamp column: tuples store epoch micros
        epoch = _dt.datetime(1970, 1, 1, tzinfo=t_lit.tzinfo)
        t_lit = int((t_lit - epoch) / _dt.timedelta(microseconds=1))
    if part_value is None or t_lit is None:
        return True
    if type(part_value) is not type(t_lit):
        return True
    if kind == "bucket":
        return op != "==" or part_value == t_lit
    if kind not in _ORDER_PRESERVING:
        return True
    if kind == "identity":
        # the column is file-constant: every comparison is exact
        return {
            "==": part_value == t_lit,
            ">": part_value > t_lit,
            ">=": part_value >= t_lit,
            "<": part_value < t_lit,
            "<=": part_value <= t_lit,
        }[op]
    # order-preserving many-to-one transform: relax to the transformed
    # comparison (strict ops relax to their inclusive forms — rows mapping
    # to the SAME transformed value can still satisfy the strict predicate)
    if op == "==":
        return part_value == t_lit
    if op in (">", ">="):
        return part_value >= t_lit
    return part_value <= t_lit
