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
