"""Checkpointed, resumable sketch builds with per-partition lineage.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". The unit of work is a *split* (file + row-group range, from
``operators.scan.parquet_splits``); each completed batch of splits writes
one parquet checkpoint file containing its serialized sketch states plus
lineage (paths, row groups, rows, values, wall_ms, attempt timestamps).
A resumed run lists the checkpoint dir, re-derives the full split set from
the (immutable) input, and schedules only the difference — then merges old
and new partial states into the final sketches.

Why parquet files per task-batch (not a transactional table): states are
O(16 KB)-O(1 MB) blobs, writes are append-only and idempotent (file name =
deterministic batch key; a re-run of the same batch overwrites the same
file with identical content), and reads are a single columnar scan. At
1000-executor scale the checkpoint table stays tiny (#batches rows), and
restart cost is O(completed work skipped).

The reference has no persistence at all (its closest notion is
toArray()/push_centroid re-ingest, /root/reference/tdigest.js:46-57,
93-100); checkpointing falls out of sketch mergeability: digest(all) =
merge(digest(done), digest(rest)).
"""

from __future__ import annotations

import hashlib
import json
import posixpath
import time
from pathlib import Path
from typing import Any

import pyarrow as pa

from ..operators.aggregate import SketchSpec, merge_partials
from ..operators.scan import parquet_splits
from . import fsio

__all__ = ["CheckpointedBuild"]


def _batch_key(splits: list) -> str:
    h = hashlib.sha256()
    for sp in splits:
        h.update(sp.path.encode())
        h.update(repr(sp.row_groups).encode())
    return h.hexdigest()[:16]


class CheckpointedBuild:
    """Resumable one-pass multi-sketch build over a parquet file set.

    >>> cb = CheckpointedBuild(ckpt_dir, {"td": ("tokens", TDIGEST(0.01))})
    >>> sketches = cb.run(spark, paths)          # first run: full build
    >>> sketches = cb.run(spark, paths)          # re-run: all cached, no scan
    After a mid-run failure, completed batches are skipped on resume.
    """

    def __init__(
        self,
        checkpoint_dir: str | Path,
        sketches: dict[str, tuple[str, SketchSpec]],
        target_rows_per_split: int = 2_000_000,
        splits_per_batch: int = 8,
    ) -> None:
        # path-or-URI: plain paths use the local filesystem (single node /
        # shared mount); hdfs:// s3:// gs:// URIs resolve via pyarrow.fs so
        # executors on a real cluster write to shared durable storage
        self.dir = str(checkpoint_dir)
        self.sketches = sketches
        self.names = list(sketches.keys())
        self.specs = {n: spec for n, (_, spec) in sketches.items()}
        self.target_rows_per_split = target_rows_per_split
        self.splits_per_batch = splits_per_batch

    # -- checkpoint table ---------------------------------------------------

    def completed(self) -> dict[str, dict]:
        """batch_key -> stored row (states + lineage) for finished batches."""
        out: dict[str, dict] = {}
        fs, root = fsio.fs_and_path(self.dir)
        for f in fsio.list_files(fs, root):
            name = posixpath.basename(f)
            if not (name.startswith("batch-") and name.endswith(".parquet")):
                continue
            try:
                tbl = fsio.read_table(fs, f)
            except Exception:
                continue  # torn write of an in-flight batch: redo it
            for row in tbl.to_pylist():
                out[row["batch_key"]] = row
        return out

    def metrics(self) -> list[dict]:
        """Per-batch merge/lineage metrics for observability."""
        rows = []
        for key, row in sorted(self.completed().items()):
            lineage = json.loads(row["lineage"])
            rows.append(
                {
                    "batch_key": key,
                    "rows": row["rows"],
                    "values_seen": row["values_seen"],
                    "n_splits": len(lineage),
                    "wall_ms": row["wall_ms"],
                    "completed_at": row["completed_at"],
                }
            )
        return rows

    # -- execution ----------------------------------------------------------

    def _plan(self, paths: list[str]) -> list[tuple[str, list]]:
        splits = parquet_splits(paths, self.target_rows_per_split)
        batches = [
            splits[i : i + self.splits_per_batch]
            for i in range(0, len(splits), self.splits_per_batch)
        ]
        return [(_batch_key(b), b) for b in batches]

    def run(self, spark, paths: list[str] | str) -> dict[str, Any]:
        if isinstance(paths, str):
            import glob
            import os

            p = paths
            paths = (
                sorted(glob.glob(os.path.join(p, "*.parquet")))
                if os.path.isdir(p)
                else [p]
            )
        plan = self._plan(paths)
        done = self.completed()
        todo = [(k, b) for k, b in plan if k not in done]

        if todo:
            fs0, root0 = fsio.fs_and_path(self.dir)
            fsio.mkdirs(fs0, root0)
            names, specs, sketch_map = self.names, self.specs, self.sketches
            out_dir = self.dir


            # one Spark partition per batch: the batch is the atomic unit of
            # checkpointing, so task success == batch file durably written
            def run_batch(batch: tuple[str, list]) -> dict:
                key, splits = batch
                t0 = time.perf_counter()
                # reuse the scan kernel loop by inlining its per-split work
                from ..operators.aggregate import sorted_and_agg as _sorted_and_agg
                from ..operators.scan import _column_values_arrow

                import pyarrow.parquet as _pq

                sks = {n: specs[n].make() for n in names}
                cols = sorted({c for c, _ in sketch_map.values()})
                col_of = {n: c for n, (c, _) in sketch_map.items()}
                rows = 0
                values_seen = 0
                lineage = []
                for sp in splits:
                    ts = time.perf_counter()
                    tbl = _pq.ParquetFile(sp.path).read_row_groups(
                        list(sp.row_groups), columns=cols, use_threads=False
                    )
                    rows += tbl.num_rows
                    cache = {c: _column_values_arrow(tbl.column(c)) for c in cols}
                    values_seen += sum(v.shape[0] for v in cache.values())
                    # same shared one-prep-per-column dispatch as the scan
                    # kernel (sorted_and_agg: bincount or sort once, feed
                    # every sketch on the column)
                    prep: dict = {}
                    for c, vals in cache.items():
                        if vals.dtype.kind in "iub" and vals.shape[0]:
                            wa = any(
                                specs[n].update_agg is not None
                                for n in names
                                if col_of[n] == c
                            )
                            ws = any(
                                specs[n].update_sorted is not None
                                for n in names
                                if col_of[n] == c
                            )
                            prep[c] = _sorted_and_agg(vals, wa, ws)
                    for n in names:
                        c = col_of[n]
                        vals = cache[c]
                        if not vals.shape[0]:
                            continue
                        sv, agg = prep.get(c, (None, None))
                        if specs[n].update_agg is not None and agg is not None:
                            specs[n].update_agg(sks[n], *agg)
                        elif specs[n].update_sorted is not None and sv is not None:
                            specs[n].update_sorted(sks[n], sv)
                        else:
                            specs[n].update(sks[n], vals)
                    lineage.append(
                        {
                            "path": sp.path,
                            "row_groups": list(sp.row_groups),
                            "rows": tbl.num_rows,
                            "wall_ms": (time.perf_counter() - ts) * 1000.0,
                        }
                    )
                row = {
                    "batch_key": key,
                    "rows": rows,
                    "values_seen": values_seen,
                    "wall_ms": (time.perf_counter() - t0) * 1000.0,
                    "completed_at": time.time(),
                    "lineage": json.dumps(lineage),
                }
                for n in names:
                    row[f"state_{n}"] = sks[n].to_bytes()
                # idempotent durable write: same batch -> same file name;
                # tmp + move so list-based readers never see torn files
                # (resolved per task: executor-side fs, works for URIs too)
                wfs, wroot = fsio.fs_and_path(out_dir)
                fsio.write_table_atomic(
                    pa.Table.from_pylist([row]), wfs, wroot,
                    f"batch-{key}.parquet",
                )
                # the durable file is the result; don't pickle ~MB of state
                # bytes back to the driver just to be discarded by count()
                return row["batch_key"]

            sc = spark.sparkContext
            sc.parallelize(todo, len(todo)).map(run_batch).count()

        # merge only from what is durably on disk (the checkpoint is the
        # source of truth; a re-read also validates the files round-trip) —
        # and ONLY the current plan's batches: the dir may hold stale files
        # from an earlier run with different paths/split params, and merging
        # everything in the dir would double-count those rows silently
        done = self.completed()
        missing = [k for k, _ in plan if k not in done]
        if missing:
            raise RuntimeError(
                f"checkpoint incomplete: {len(missing)} batches missing"
            )
        all_rows = [done[k] for k, _ in plan]
        merged = merge_partials(all_rows, self.names, self.specs)
        return {n: self.specs[n].from_bytes(merged[n]) for n in self.names}
