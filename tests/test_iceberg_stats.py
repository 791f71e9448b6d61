"""write_table_stats / read_table_stats — Puffin-analog NDV statistics.

Lifecycle pinned: attach to a named snapshot, replace-on-rewrite (at
most one stats file per snapshot), absent stats raise (a cost model must
know, not see zeros), unknown snapshots rejected, and expiration drops
expired snapshots' stats files + metadata entries while retained ones
survive."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tdigest_spark.sources import iceberg_write as W


def _mk(root, n_files=3):
    W.create_table(root, ts_ms=1000)
    for s in range(n_files):
        f = root / "data" / f"s{s}.parquet"
        pq.write_table(
            pa.table({"id": pa.array(range(s * 10, (s + 1) * 10), pa.int64())}),
            f,
        )
        W.append_snapshot(root, [f], snapshot_id=s + 1, ts_ms=2000 + s)


def test_stats_attach_replace_and_absent(tmp_path):
    root = tmp_path / "tbl"
    _mk(root)
    W.write_table_stats(root, {"id": (b"\x01", 10)}, snapshot_id=1)
    W.write_table_stats(root, {"id": (b"\x02", 30)})  # current (3)
    got1 = W.read_table_stats(root, 1)
    assert got1["id"]["ndv"] == 10 and got1["id"]["blob"] == b"\x01"
    assert W.read_table_stats(root)["id"]["ndv"] == 30  # default: current
    # re-write for the same snapshot REPLACES (never two entries)
    W.write_table_stats(root, {"id": (b"\x03", 11)}, snapshot_id=1)
    assert W.read_table_stats(root, 1)["id"]["ndv"] == 11
    _, meta = W._load_current(root)
    assert sum(s["snapshot-id"] == 1 for s in meta["statistics"]) == 1
    # absent stats raise, unknown snapshot rejected
    with pytest.raises(KeyError):
        W.read_table_stats(root, 2)
    with pytest.raises(ValueError):
        W.write_table_stats(root, {"id": (b"x", 1)}, snapshot_id=99)


def test_expiration_drops_expired_stats(tmp_path):
    from pathlib import Path

    root = tmp_path / "tbl"
    _mk(root)
    p1 = W.write_table_stats(root, {"id": (b"\x01", 10)}, snapshot_id=1)
    p3 = W.write_table_stats(root, {"id": (b"\x03", 30)}, snapshot_id=3)
    W.expire_snapshots(root, keep_last=1)
    # snapshot 1 expired: its stats file and entry are gone
    assert not Path(p1).exists()
    with pytest.raises(KeyError):
        W.read_table_stats(root, 1)
    # the retained snapshot's stats survive
    assert Path(p3).exists()
    assert W.read_table_stats(root, 3)["id"]["ndv"] == 30


def test_concurrent_commit_conflict(tmp_path):
    """Two writers based on the same metadata version: the first commit
    wins, the second raises CommitConflict (never a silent lost update),
    and the table still reads as the winner left it."""
    root = tmp_path / "tbl"
    _mk(root, n_files=1)
    version, meta = W._load_current(root)
    W._commit_metadata_only(root, version, dict(meta), None)
    with pytest.raises(W.CommitConflict):
        W._commit_metadata_only(root, version, dict(meta), None)
    # a full snapshot commit based on the stale version loses the same way
    with pytest.raises(W.CommitConflict):
        W._commit(
            root, version, meta, 999,
            W._current_manifests(root, meta), "append", None,
        )
    v2, _ = W._load_current(root)
    assert v2 == version + 1
    assert W.snapshot_ids(root) == [1]


def _mk_partitioned(root):
    W.create_table(
        root, ts_ms=1000,
        schema_fields=[("id", "long"), ("grp", "string")],
    )
    W.set_partition_spec(root, [("grp", "identity")], ts_ms=1500)
    files = []
    for name, grp, ids in (
        ("a1", "a", range(0, 7)),
        ("a2", "a", range(7, 10)),
        ("b1", "b", range(100, 104)),
    ):
        f = root / "data" / f"{name}.parquet"
        pq.write_table(
            pa.table({
                "id": pa.array(list(ids), pa.int64()),
                "grp": pa.array([grp] * len(list(ids)), pa.string()),
            }),
            f,
        )
        files.append(f)
    W.append_snapshot(root, files, snapshot_id=1, ts_ms=2000)


def test_partition_stats_aggregate_per_partition(tmp_path):
    """Two files in partition a must aggregate to ONE stats row; counts
    and sizes come from manifest entries (no data files opened)."""
    root = tmp_path / "tbl"
    _mk_partitioned(root)
    W.write_partition_stats(root, ts_ms=3000)
    got = {
        next(iter(p["partition"].values())): p
        for p in W.read_partition_stats(root)
    }
    assert set(got) == {"a", "b"}
    assert got["a"]["n_files"] == 2 and got["a"]["record_count"] == 10
    assert got["b"]["n_files"] == 1 and got["b"]["record_count"] == 4
    assert got["a"]["total_size_bytes"] > 0
    # replace-on-rewrite: still exactly one entry for the snapshot
    W.write_partition_stats(root, ts_ms=3100)
    _, meta = W._load_current(root)
    assert sum(
        s["snapshot-id"] == 1 for s in meta["partition-statistics"]
    ) == 1


def test_partition_stats_absent_raise_and_expiration_gc(tmp_path):
    from pathlib import Path

    root = tmp_path / "tbl"
    _mk_partitioned(root)
    with pytest.raises(KeyError):
        W.read_partition_stats(root)
    p1 = Path(W.write_partition_stats(root, snapshot_id=1, ts_ms=3000))
    # a second snapshot + its own stats; expiring snapshot 1 GCs ITS file
    f = root / "data" / "c1.parquet"
    pq.write_table(
        pa.table({"id": pa.array([7], pa.int64()),
                  "grp": pa.array(["c"], pa.string())}), f)
    W.append_snapshot(root, [f], snapshot_id=2, ts_ms=4000)
    p2 = Path(W.write_partition_stats(root, snapshot_id=2, ts_ms=5000))
    W.expire_snapshots(root, keep_last=1, ts_ms=6000)
    assert not p1.exists() and p2.exists()
    with pytest.raises(KeyError):
        W.read_partition_stats(root, 1)
    assert W.read_partition_stats(root, 2)


def test_null_count_pruning(tmp_path):
    """null_value_counts manifest pruning: IS NULL drops files recording
    zero nulls; IS NOT NULL drops all-null files; files without stats
    survive both (pruning is never a correctness filter)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_scan_paths_pruned

    root = tmp_path / "nulltbl"
    W.create_table(root, ts_ms=1000)
    cases = {
        "a": pa.table({"v": pa.array([1, 2, 3], pa.int64())}),
        "b": pa.table({"v": pa.array([None, None, None], pa.int64())}),
        "c": pa.table({"v": pa.array([1, None, 3], pa.int64())}),
    }
    files = []
    for name, t in cases.items():
        f = root / "data" / f"{name}.parquet"
        pq.write_table(t, f)
        files.append(f)
    W.append_snapshot(root, files, snapshot_id=1, ts_ms=2000)
    isnull, total = iceberg_scan_paths_pruned(str(root), [("v", "isnull", None)])
    assert total == 3
    assert sorted(p.rsplit("/", 1)[-1] for p in isnull) == [
        "b.parquet",
        "c.parquet",
    ]
    notnull, _ = iceberg_scan_paths_pruned(str(root), [("v", "notnull", None)])
    assert sorted(p.rsplit("/", 1)[-1] for p in notnull) == [
        "a.parquet",
        "c.parquet",
    ]


def test_delete_where_isnull_predicate(tmp_path):
    """DELETE WHERE col IS NULL — the retention op the null-count pruning
    support advertises — must plan (pruned), mask, and commit, not
    KeyError on the residual op table (found by review: the ops dict
    lacked isnull/notnull)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_scan_plan_mor

    root = tmp_path / "nulldel"
    W.create_table(root, ts_ms=1000)
    t = pa.table(
        {
            "id": pa.array(range(6), pa.int64()),
            "v": pa.array([1, None, 3, None, 5, 6], pa.int64()),
        }
    )
    f = root / "data" / "d.parquet"
    pq.write_table(t, f)
    W.append_snapshot(root, [f], snapshot_id=1, ts_ms=2000)
    n_del, scanned, total = W.delete_where(
        root, [("v", "isnull", None)], snapshot_id=2, ts_ms=3000
    )
    assert (n_del, scanned, total) == (2, 1, 1)
    # and the DV flavor, re-deleting nothing new
    n_del, n_dvs, n_sup, _, _ = W.delete_where_dv(
        root, [("v", "isnull", None)], snapshot_id=3, ts_ms=4000
    )
    assert (n_del, n_dvs, n_sup) == (0, 1, 0)
    plan, _ = iceberg_scan_plan_mor(str(root), [])
    assert len(plan[0]["dvs"]) == 1
