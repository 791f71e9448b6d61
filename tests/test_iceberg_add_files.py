"""add_files import + rewrite_data_files(sort_by=...) sort strategy.

add_files must be METADATA-ONLY (no bytes copied, external files never
collected by orphan maintenance, stats pruning works on imported
footers) and duplicate-safe. The sort rewrite must be byte-lossless,
produce range-DISJOINT output files (that's the whole point — stats
pruning turns back on), and read through MOR so prior deletes are not
resurrected.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tdigest_spark.sources import iceberg_write as W
from tdigest_spark.sources.iceberg import (
    iceberg_scan_paths_pruned,
    iceberg_scan_paths_static,
    read_sequences,
)


def _write(path, ids):
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "v": pa.array([i * 3 for i in ids], pa.int64()),
            }
        ),
        path,
    )


def test_add_files_imports_metadata_only(tmp_path, spark):
    root = tmp_path / "tbl"
    ext = tmp_path / "ext"
    ext.mkdir()
    W.create_table(root, ts_ms=1000)
    f0 = root / "data" / "in0.parquet"
    _write(f0, range(0, 10))
    W.append_snapshot(root, [f0], snapshot_id=1, ts_ms=2000)
    e1, e2 = ext / "e1.parquet", ext / "e2.parquet"
    _write(e1, range(10, 20))
    _write(e2, range(20, 30))
    sid = W.add_files(root, [e1, e2], ts_ms=3000)
    # metadata-only: nothing copied into the table's data dir
    assert sorted(p.name for p in (root / "data").glob("*.parquet")) == [
        "in0.parquet"
    ]
    got = sorted(
        r["id"] for r in read_sequences(spark, str(root)).collect()
    )
    assert got == list(range(30))
    # imported footers prune like written ones
    pruned, total = iceberg_scan_paths_pruned(str(root), [("id", "<", 5)])
    assert total == 3 and len(pruned) == 1
    # time travel: the pre-import snapshot sees only the internal file
    before = read_sequences(spark, str(root), snapshot_id=1).count()
    assert before == 10
    # orphan maintenance never touches files outside the table dir
    W.expire_snapshots(root, keep_last=1, ts_ms=4000)
    removed = W.remove_orphan_files(root, older_than_ms=10**18)
    assert e1.exists() and e2.exists(), removed
    assert sid in W.snapshot_ids(root)


def test_add_files_refusals(tmp_path):
    root = tmp_path / "tbl"
    ext = tmp_path / "ext"
    ext.mkdir()
    W.create_table(root, ts_ms=1000)
    e1 = ext / "e1.parquet"
    _write(e1, range(10))
    W.add_files(root, [e1], ts_ms=2000)
    with pytest.raises(ValueError, match="already referenced"):
        W.add_files(root, [e1], ts_ms=3000)
    with pytest.raises(FileNotFoundError):
        W.add_files(root, [ext / "nope.parquet"], ts_ms=4000)
    # opt-out mirrors the procedure's check_duplicate_files => false
    W.add_files(root, [e1], ts_ms=5000, check_duplicate_files=False)


def test_sort_rewrite_clusters_and_reads_through_mor(tmp_path, spark):
    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    # 4 interleaved files: every file spans the full id range
    for i in range(4):
        f = root / "data" / f"i{i}.parquet"
        _write(f, range(i, 80, 4))
        W.append_snapshot(root, [f], snapshot_id=i + 1, ts_ms=2000 + i)
    # a prior position delete (ids 0 and 4 live at positions 0,1 of i0)
    W.delete_rows_snapshot(
        root, {str(root / "data" / "i0.parquet"): [0, 1]},
        snapshot_id=5, ts_ms=3000,
    )
    pre, total_pre = iceberg_scan_paths_pruned(str(root), [("id", "<", 10)])
    assert len(pre) == total_pre == 4  # interleaving defeats pruning
    size = sum(
        (root / "data" / f"i{i}.parquet").stat().st_size for i in range(4)
    )
    rep = W.rewrite_data_files(
        root, target_bytes=max(1, size // 4), ts_ms=4000, sort_by=["id"]
    )
    assert rep["files_rewritten"] == 4 and rep["files_written"] >= 2
    # byte-lossless AND deletes folded in (not resurrected)
    got = sorted(r["id"] for r in read_sequences(spark, str(root)).collect())
    assert got == [i for i in range(80) if i not in (0, 4)]
    # output files are range-disjoint on the sort key
    bounds = []
    for p in iceberg_scan_paths_static(str(root)):
        t = pq.read_table(p, columns=["id"], use_threads=False)
        ids = t["id"].to_pylist()
        bounds.append((min(ids), max(ids)))
    bounds.sort()
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 < lo2, bounds
    # pruning is back on
    post, total_post = iceberg_scan_paths_pruned(
        str(root), [("id", "<", 10)]
    )
    assert len(post) < total_post
    # time travel still reads the pre-rewrite layout
    old = read_sequences(spark, str(root), snapshot_id=4).count()
    assert old == 80
