"""Scan-in-worker sketch build: the parquet fast path.

Spark's JVM parquet reader decodes ``list<int32>`` token columns row-by-row
and re-serializes them over the Arrow IPC boundary to Python; measured here
that path moves ~4-12M tokens/s/core, while a pyarrow read of the very same
files inside the Python worker moves >100M tokens/s/core. Since a sketch
build is a full-scan aggregation whose partial phase needs only (a) column
pruning and (b) optional row-group predicate pushdown — both of which
pyarrow's parquet reader does natively — we let Spark schedule *splits*
(file + row-group ranges) and have each task read its split directly.

This is the same layout Petastorm/Daft-style Python-native readers use, and
it is exactly how the build scales on a real cluster: splits are generated
from parquet metadata (driver-side, O(#row-groups)), distributed via
``sc.parallelize``, and each executor core streams its row groups through
the vectorized sketch kernels. No JVM row materialization, no shuffle of raw
data — the only traffic is #splits x O(16 KB) serialized sketch states plus
per-split lineage metrics (per BASELINE.json north_rule).

The general DataFrame path (``aggregate.partials_df``) remains the right
choice when the input is already a transformed DataFrame; this module is the
performance path for sketching columns straight off a parquet/Iceberg table.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Iterator

import numpy as np

from .aggregate import (
    SketchSpec,
    _column_values,
    fold_states,
    merge_partials,
    sorted_and_agg,
)

__all__ = [
    "parquet_splits",
    "scan_partials_rdd",
    "build_sketches_scan",
    "build_sketch_grouped_scan",
]


@dataclass(frozen=True)
class _Split:
    path: str
    row_groups: tuple[int, ...]
    rows: int


def _normalize_paths(paths: list[str] | str) -> list[str]:
    import glob
    import os

    if isinstance(paths, str):
        p = paths
        return (
            sorted(glob.glob(os.path.join(p, "*.parquet")))
            if os.path.isdir(p)
            else [p]
        )
    return list(paths)


def parquet_splits(
    paths: list[str], target_rows_per_split: int = 2_000_000
) -> list[_Split]:
    """Split a parquet file set into row-group-aligned scan units.

    Small files become one split each; files with many row groups are split
    so each task gets ~target_rows_per_split rows (keeps tasks balanced even
    when file sizes are skewed — explicit skew handling per the north_rule).
    """
    import pyarrow.parquet as pq

    splits: list[_Split] = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        groups = [(i, md.row_group(i).num_rows) for i in range(md.num_row_groups)]
        cur: list[int] = []
        cur_rows = 0
        for i, nrows in groups:
            cur.append(i)
            cur_rows += nrows
            if cur_rows >= target_rows_per_split:
                splits.append(_Split(p, tuple(cur), cur_rows))
                cur, cur_rows = [], 0
        if cur:
            splits.append(_Split(p, tuple(cur), cur_rows))
    return splits


# one extractor for both build paths: the list-flatten fast-path guard
# must never diverge between them (they are asserted bit-identical)
_column_values_arrow = _column_values


def scan_partials_rdd(
    spark,
    paths: list[str],
    sketches: dict[str, tuple[str, SketchSpec]],
    target_rows_per_split: int = 2_000_000,
    filter_expr: Any | None = None,
    partitions: int | None = None,
):
    """RDD of per-partition partial rows: dicts with serialized states +
    per-split lineage.

    Each Spark partition holds several splits (default 4 x cores waves for
    balance); the task streams every split through the kernels and emits ONE
    merged state set, so collected/shuffled bytes are O(partitions x
    state_size) regardless of split count — the CMS matrix (the largest
    state) would otherwise dominate the fan-in.

    ``filter_expr`` is a ``pyarrow.dataset`` expression pushed down into the
    parquet read (row-group stats pruning + decode-time filtering).
    """
    splits = parquet_splits(paths, target_rows_per_split)
    names = list(sketches.keys())
    specs = {n: spec for n, (_, spec) in sketches.items()}
    col_of = {n: c for n, (c, _) in sketches.items()}
    cols = sorted({c for c, _ in sketches.values()})

    def run_partition(it: Iterator[_Split]) -> Iterator[dict]:
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        sks = {n: specs[n].make() for n in names}
        rows = 0
        values_seen = 0
        lineage: list[dict] = []
        t_part = time.perf_counter()
        for sp in it:
            t0 = time.perf_counter()
            sp_rows = 0
            if filter_expr is not None:
                frag = pads.dataset(sp.path, format="parquet")
                # dataset-level split: take only this split's row groups
                frag = list(frag.get_fragments())[0].subset(
                    row_group_ids=list(sp.row_groups)
                )
                tbl = frag.to_table(
                    columns=cols, filter=filter_expr, use_threads=False
                )
            else:
                # use_threads=False: each of the ~cores concurrent worker
                # processes gets a cores-sized Arrow CPU pool by default —
                # cores^2 runnable threads; measured 4-14x slower than
                # single-threaded decode per task at local[32]
                tbl = pq.ParquetFile(sp.path).read_row_groups(
                    list(sp.row_groups), columns=cols, use_threads=False
                )
            sp_rows += tbl.num_rows
            cache: dict[str, np.ndarray] = {}
            sort_cache: dict[str, np.ndarray] = {}
            agg_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
            for c in cols:
                cache[c] = _column_values_arrow(tbl.column(c))
                values_seen += cache[c].shape[0]
                # token columns are duplicate-heavy: ONE sort per column
                # feeds everything — unique+counts fall out linearly for
                # the agg-capable sketches, and sort-tolerant sketches
                # (KLL) consume the sorted array directly. Without this,
                # every sketch re-sorted the same values independently.
                if cache[c].dtype.kind in "iub" and cache[c].shape[0]:
                    wants_agg = any(
                        specs[n].update_agg is not None
                        for n in names
                        if col_of[n] == c
                    )
                    wants_sorted = any(
                        specs[n].update_sorted is not None
                        for n in names
                        if col_of[n] == c
                    )
                    sv, agg = sorted_and_agg(
                        cache[c], wants_agg, wants_sorted
                    )
                    if sv is not None:
                        sort_cache[c] = sv
                    if agg is not None:
                        agg_cache[c] = agg
            for n in names:
                c = col_of[n]
                vals = cache[c]
                if not vals.shape[0]:
                    continue
                if specs[n].update_agg is not None and c in agg_cache:
                    uv, uc = agg_cache[c]
                    specs[n].update_agg(sks[n], uv, uc)
                elif specs[n].update_sorted is not None and c in sort_cache:
                    specs[n].update_sorted(sks[n], sort_cache[c])
                else:
                    specs[n].update(sks[n], vals)
            rows += sp_rows
            lineage.append(
                {
                    "path": sp.path,
                    "row_groups": list(sp.row_groups),
                    "rows": sp_rows,
                    "wall_ms": (time.perf_counter() - t0) * 1000.0,
                }
            )
        if not lineage:
            return
        out = {
            "rows": rows,
            "values_seen": values_seen,
            "n_splits": len(lineage),
            "wall_ms": (time.perf_counter() - t_part) * 1000.0,
            "lineage": lineage,
        }
        for n in names:
            out[f"state_{n}"] = sks[n].to_bytes()
        yield out

    sc = spark.sparkContext
    if partitions is None:
        partitions = min(len(splits), sc.defaultParallelism * 4)
    return sc.parallelize(splits, max(partitions, 1)).mapPartitions(
        run_partition
    )


def build_sketches_scan(
    spark,
    paths: list[str] | str,
    sketches: dict[str, tuple[str, SketchSpec]],
    target_rows_per_split: int = 2_000_000,
    filter_expr: Any | None = None,
    partitions: int | None = None,
) -> dict[str, Any]:
    """One-pass multi-sketch build reading parquet directly in the workers.

    Returns deserialized final sketch objects keyed by name. Bit-identical
    to ``aggregate.build_sketches`` over the same rows (deterministic
    sort-based merge; verified in tests/test_scan_path.py).
    """
    paths = _normalize_paths(paths)
    names = list(sketches.keys())
    specs = {n: spec for n, (_, spec) in sketches.items()}
    rows = scan_partials_rdd(
        spark, paths, sketches, target_rows_per_split, filter_expr, partitions
    ).collect()
    merged = merge_partials(rows, names, specs)
    return {n: specs[n].from_bytes(merged[n]) for n in names}


def build_sketch_grouped_scan(
    spark,
    paths: list[str] | str,
    group_col: str,
    column: str,
    spec: SketchSpec,
    target_rows_per_split: int = 2_000_000,
    partitions: int | None = None,
) -> dict[str, Any]:
    """Grouped sketch build on the scan-in-worker fast path: each task
    reads its row-group splits with pyarrow, partitions rows by the group
    key with one vectorized argsort per split, and keeps ONE sketch per
    key for the whole partition. Only (key, state) pairs return to the
    driver — #partitions x #keys x O(state) bytes, never rows. Intended
    for low-cardinality keys (source, language, shard); high-cardinality
    grouping belongs to aggregate.build_sketch_grouped's shuffle.

    Returns {key: sketch object} (keys stringified)."""
    paths = _normalize_paths(paths)
    splits = parquet_splits(paths, target_rows_per_split)

    def run_partition(it: Iterator[_Split]) -> Iterator[tuple[str, bytes]]:
        import pyarrow.parquet as pq

        sks: dict[str, Any] = {}
        is_list = None
        for sp in it:
            tbl = pq.ParquetFile(sp.path).read_row_groups(
                list(sp.row_groups), columns=[group_col, column],
                use_threads=False,
            )
            if tbl.num_rows == 0:
                continue  # empty part file -> empty split (valid input)
            keys = np.asarray(
                tbl.column(group_col).combine_chunks().to_pylist(), dtype=object
            )
            col = tbl.column(column).combine_chunks()
            import pyarrow as pa

            if is_list is None:
                is_list = pa.types.is_list(col.type) or pa.types.is_large_list(
                    col.type
                )
            order = np.argsort(keys, kind="stable")
            sorted_keys = keys[order]
            bounds = np.flatnonzero(
                np.r_[True, sorted_keys[1:] != sorted_keys[:-1]]
            )
            bounds = np.r_[bounds, len(sorted_keys)]
            if is_list:
                offs = col.offsets.to_numpy(zero_copy_only=False)
                flat = col.flatten().to_numpy(zero_copy_only=False)
            else:
                vals_all = col.to_numpy(zero_copy_only=False)
            for i in range(len(bounds) - 1):
                rows_idx = order[bounds[i] : bounds[i + 1]]
                key = str(sorted_keys[bounds[i]])
                if is_list:
                    # gather each row's token slice (vectorized concat of
                    # per-row ranges via repeat/cumsum arithmetic)
                    starts = offs[rows_idx]
                    lens = offs[rows_idx + 1] - starts
                    total = int(lens.sum())
                    if total == 0:
                        vals = np.empty(0, dtype=flat.dtype)
                    else:
                        idx = np.repeat(starts + lens - lens.cumsum(), lens) + np.arange(
                            total
                        )
                        vals = flat[idx]
                else:
                    vals = vals_all[rows_idx]
                if key not in sks:
                    sks[key] = spec.make()
                if vals.shape[0]:
                    if spec.update_agg is not None and vals.dtype.kind in "iub":
                        _, agg = sorted_and_agg(vals, True, False)
                        if agg is not None:
                            spec.update_agg(sks[key], *agg)
                        else:
                            spec.update(sks[key], vals)
                    else:
                        spec.update(sks[key], vals)
        for key, sk in sks.items():
            yield (key, sk.to_bytes())

    sc = spark.sparkContext
    if partitions is None:
        partitions = min(len(splits), sc.defaultParallelism * 4)
    pairs = (
        sc.parallelize(splits, max(partitions, 1))
        .mapPartitions(run_partition)
        .groupByKey()  # #keys x #partitions tiny state rows
        .mapValues(
            lambda states: fold_states(sorted(states), spec)
        )
        .collect()
    )
    return {k: spec.from_bytes(v) for k, v in pairs}


