"""update_where — the MOR UPDATE leg of the DML triad.

What it must get right (each pinned below): stats-pruned planning, the
single delete+append snapshot, liveness against BOTH prior position
deletes and applicable equality deletes (an update that re-emits a
deleted row resurrects it), the no-match no-commit invariant, the
assignment ops, and the explicit refusals (partitioned table,
unresolvable equality-delete keys)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tdigest_spark.sources import iceberg_write as W
from tdigest_spark.sources.iceberg import read_sequences


def _mk_table(root):
    """4 single-source files, ids 0..39, v = 3*id."""
    W.create_table(root, ts_ms=1000)
    for s in range(4):
        f = root / "data" / f"s{s}.parquet"
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(range(s * 10, (s + 1) * 10), pa.int64()),
                    "v": pa.array(
                        [i * 3 for i in range(s * 10, (s + 1) * 10)],
                        pa.int64(),
                    ),
                }
            ),
            f,
        )
        W.append_snapshot(root, [f], ts_ms=2000 + s)


def test_update_where_plans_commits_and_respects_deletes(tmp_path, spark):
    root = tmp_path / "tbl"
    _mk_table(root)
    # prior DML the update must see through: ids 0..4 position-deleted,
    # ids 20 and 21 equality-deleted
    n_del, _, _ = W.delete_where(root, [("v", "<", 15)])
    assert n_del == 5
    keys = root / "data" / "k.parquet"
    pq.write_table(pa.table({"id": pa.array([20, 21], pa.int64())}), keys)
    W.equality_delete_snapshot(root, keys)
    before = len(W.snapshot_ids(root))
    # v < 75 matches ids 0..24; 0..4 pos-deleted and 20..21 eq-deleted
    # are NOT live -> 18 rows updated, and only files s0/s1/s2 are
    # candidates (stats: min(v) of s3 is 90)
    n_upd, scanned, total = W.update_where(
        root, [("v", "<", 75)], [("v", "mul", 10), ("v", "add", 1)]
    )
    assert (n_upd, scanned, total) == (18, 3, 4)
    # ONE new snapshot carries both legs
    assert len(W.snapshot_ids(root)) == before + 1
    got = {r.id: r.v for r in read_sequences(spark, str(root)).collect()}
    # deleted rows stay deleted (not resurrected by the update)
    assert set(got) == set(range(5, 40)) - {20, 21}
    for i in got:
        assert got[i] == (i * 3 * 10 + 1 if i * 3 < 75 else i * 3)
    # no-match predicate: nothing updated, NO new snapshot
    before = len(W.snapshot_ids(root))
    n2, _, _ = W.update_where(root, [("v", ">", 10**6)], [("v", "add", 1)])
    assert n2 == 0 and len(W.snapshot_ids(root)) == before
    # updated copies live at the NEW sequence: re-running the same
    # predicate matches them again (values already transformed)
    n3, _, _ = W.update_where(root, [("id", "==", 5)], [("v", "set", 0)])
    assert n3 == 1
    got = {r.id: r.v for r in read_sequences(spark, str(root)).collect()}
    assert got[5] == 0 and len(got) == 33


def test_update_where_refusals(tmp_path):
    root = tmp_path / "tbl"
    _mk_table(root)
    # unresolvable equality-delete keys -> raise, never a partial update
    keys = root / "data" / "bad.parquet"
    pq.write_table(pa.table({"ghost": pa.array([1], pa.int64())}), keys)
    W.equality_delete_snapshot(root, keys)
    with pytest.raises(ValueError, match="unresolvable"):
        W.update_where(root, [("v", "<", 30)], [("v", "add", 1)])
    # unknown assignment op
    root2 = tmp_path / "tbl2"
    _mk_table(root2)
    with pytest.raises(ValueError, match="assignment op"):
        W.update_where(root2, [("v", "<", 30)], [("v", "pow", 2)])
    # partitioned table -> explicit refusal
    root3 = tmp_path / "tbl3"
    W.create_table(root3, ts_ms=1000)
    W.set_partition_spec(root3, [("id", "bucket[4]")])
    with pytest.raises(ValueError, match="partitioned"):
        W.update_where(root3, [("v", "<", 30)], [("v", "add", 1)])
