"""Hive-style partitioned parquet layout — the standard 100-TB table
organization (partition by low-cardinality ingest keys: event date,
source). Complements plans/bucketing.py (which co-locates by a
high-cardinality JOIN key): partitioning gives DIRECTORY-level data
skipping — a filter on the partition column prunes whole directories at
planning time (``PartitionFilters`` on the scan node, visible in
``.explain``), so a one-source query over a 1000-source corpus opens
0.1% of the files and reads zero bytes of the rest.

Backfill pattern: with ``partitionOverwriteMode=dynamic`` an overwrite
touches ONLY the partitions present in the incoming frame — the
idempotent re-run of one day's pipeline never clobbers its neighbors
(test_partitioned.py proves both properties).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_partitioned",
    "overwrite_partitions",
    "pruned_scan_info",
    "compact_partitions",
    "write_sorted",
]


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Lay the frame out as <path>/<col>=<value>/part-*.parquet."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Dynamic-partition overwrite: replace exactly the partitions present
    in ``df``, leave every other partition untouched (safe idempotent
    backfill of one day / one source). Uses the WRITE-SCOPED
    ``partitionOverwriteMode`` option (takes precedence over the session
    conf), so concurrent writers in the same shared session are never
    flipped to dynamic semantics behind their backs."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict[str, tuple[int, int]]:
    """Small-file compaction — the table-maintenance pass every streaming /
    incremental-backfill pipeline needs: micro-batches and per-partition
    overwrites leave thousands of tiny files per partition, and at 100 TB
    the task-per-file scheduling + open/footer overhead dominates scan
    time. Partition sizes come from one FILESYSTEM METADATA pass (no data
    read); each oversplit partition directory is rewritten alone —
    read-dir -> coalesce(ceil(bytes/target)) -> write to a DOT-prefixed
    sibling tmp dir (hidden from Spark partition discovery and from this
    function's own metadata pass — the fsio convention) -> swap. Swap =
    rename old aside (dot-prefixed), rename tmp into place, delete aside:
    the no-partition window is a single rename on POSIX/HDFS (copy+delete
    on S3-style stores — fsio's documented trade-off). A crash at any
    point leaves a COMPLETE copy of the partition in either its final dir
    or a hidden dir, never a mixed read, and the repair pass at the start
    of the NEXT run restores it automatically: a stale aside with its
    data dir missing is renamed back, a stale aside next to a live data
    dir (crash after the move-in) is deleted, and stale tmp dirs
    (incomplete writes) are always deleted. Untouched partitions are
    never opened, so
    compacting one hot ingest partition of a 1000-partition table costs
    only that partition's bytes. Returns {partition_dir: (files_before,
    files_after)} for the partitions it rewrote, files_after counted from
    the directory (coalesce may pack into fewer files than the target
    when the read yields fewer input partitions)."""
    import math

    from pyarrow import fs as pafs

    from . import fsio

    fs, root = fsio.fs_and_path(str(path))

    # repair pass: recover from a previous run's crash before measuring
    for fi in fs.get_file_info(pafs.FileSelector(root, recursive=True)):
        if fi.type != pafs.FileType.Directory:
            continue
        name = fi.base_name
        if name.startswith(".") and name.endswith("__compacting"):
            fs.delete_dir(fi.path)  # incomplete rewrite: the source is intact
        elif name.startswith(".") and name.endswith("__replaced"):
            final = posixpath.join(
                posixpath.dirname(fi.path), name[1:-len("__replaced")]
            )
            if fs.get_file_info(final).type == pafs.FileType.NotFound:
                fs.move(fi.path, final)  # crashed between the two renames
            else:
                fs.delete_dir(fi.path)  # crashed before the aside delete

    infos = fs.get_file_info(pafs.FileSelector(root, recursive=True))
    parts: dict[str, tuple[int, int]] = {}
    for fi in infos:
        rel_path = fi.path[len(root):]
        # skip hidden/system segments: our tmp/aside dirs, _SUCCESS, etc.
        if any(seg.startswith((".", "_")) for seg in rel_path.split("/") if seg):
            continue
        if fi.type == pafs.FileType.File and fi.base_name.endswith(".parquet"):
            d = posixpath.dirname(fi.path)
            b, n = parts.get(d, (0, 0))
            parts[d] = (b + (fi.size or 0), n + 1)

    base = str(path).rstrip("/")
    rewritten: dict[str, tuple[int, int]] = {}
    for d, (nbytes, nfiles) in sorted(parts.items()):
        n_target = max(1, math.ceil(nbytes / target_bytes))
        if nfiles <= n_target:
            continue
        rel = d[len(root):].strip("/")
        src_url = f"{base}/{rel}" if rel else base
        parent, leaf = posixpath.dirname(d), posixpath.basename(d)
        tmp = posixpath.join(parent, f".{leaf}__compacting")
        tmp_url = posixpath.join(
            posixpath.dirname(src_url), f".{leaf}__compacting"
        )
        aside = posixpath.join(parent, f".{leaf}__replaced")
        spark.read.parquet(src_url).coalesce(n_target).write.mode(
            "overwrite"
        ).parquet(tmp_url)
        fs.move(d, aside)
        fs.move(tmp, d)
        fs.delete_dir(aside)
        n_after = sum(
            1
            for fi in fs.get_file_info(pafs.FileSelector(d))
            if fi.type == pafs.FileType.File
            and fi.base_name.endswith(".parquet")
        )
        rewritten[rel or "."] = (nfiles, n_after)
    return rewritten


def write_sorted(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int | None = None
) -> None:
    """Sorted (clustered) layout — the third data-skipping leg next to
    directory partitioning and bucketing: range-partition then
    sortWithinPartitions on the filter columns before writing, so each
    parquet row group's min/max statistics cover a narrow, disjoint value
    range. A range predicate then prunes row groups from FOOTER METADATA
    alone — both Spark's parquet reader and our scan-in-worker path
    (operators/scan.py pushes dataset filters into row-group selection)
    skip the data without any index structure. On a randomly-laid-out
    table every row group spans the full value range and nothing can be
    skipped; sorting is what makes min/max stats sharp.

    ``n_files`` pins the range-partition count (an explicit count opts the
    shuffle out of AQE partition coalescing, which would otherwise pack a
    small table into one file and leave nothing to skip); None lets Spark
    size the output from its shuffle stats."""
    ranged = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files is not None  # 0 must reach Spark and fail fast, not
        else df.repartitionByRange(*sort_cols)  # silently un-pin the count
    )
    (
        ranged.sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def pruned_scan_info(df: DataFrame) -> str:
    """The executed-plan scan node text — callers assert PartitionFilters /
    PartitionCount to prove directory pruning actually happened."""
    return df._jdf.queryExecution().executedPlan().toString()
