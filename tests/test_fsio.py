"""Durable-state filesystem abstraction (plans/fsio): non-local filesystem
stub coverage + checkpoint/streaming state over a file:// URI.

Round 1 wrote checkpoint/state files through pathlib on executors (shared
POSIX mount assumed); fsio routes everything through pyarrow.fs. The mock
filesystem exercises the non-local code path (create/list/atomic write/
read) without needing an object store in the container; the file:// URI
test drives CheckpointedBuild end-to-end through FileSystem.from_uri with
real executor-side writes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tdigest_spark.plans import fsio


@pytest.fixture()
def mockfs():
    from pyarrow.fs import _MockFileSystem

    return _MockFileSystem()


def test_fsio_roundtrip_on_mock_filesystem(mockfs):
    root = "bucket/ckpt"
    fsio.mkdirs(mockfs, root)
    assert fsio.exists(mockfs, root)
    assert fsio.list_files(mockfs, root) == []
    t = pa.table({"batch_key": ["k1"], "rows": [7]})
    final = fsio.write_table_atomic(t, mockfs, root, "batch-k1.parquet")
    assert final == "bucket/ckpt/batch-k1.parquet"
    # tmp file must be gone: readers list only final names
    names = fsio.list_files(mockfs, root)
    assert names == ["bucket/ckpt/batch-k1.parquet"]
    got = fsio.read_table(mockfs, final).to_pylist()
    assert got == [{"batch_key": "k1", "rows": 7}]


def test_fsio_list_missing_dir_is_empty(mockfs):
    assert fsio.list_files(mockfs, "nowhere/at/all") == []
    assert not fsio.exists(mockfs, "nowhere/at/all")


def test_fs_and_path_resolves_uris(tmp_path):
    fs, p = fsio.fs_and_path(f"file://{tmp_path}")
    from pyarrow.fs import LocalFileSystem

    assert isinstance(fs, LocalFileSystem)
    assert p == str(tmp_path)
    fs2, p2 = fsio.fs_and_path(str(tmp_path))
    assert isinstance(fs2, LocalFileSystem)
    assert p2 == str(tmp_path)


def test_checkpoint_over_file_uri(spark, tmp_path):
    """CheckpointedBuild with a file:// checkpoint URI: executors resolve
    the filesystem from the URI (pyarrow.fs), batches land durably, resume
    skips completed work."""
    from tdigest_spark.operators.aggregate import TDIGEST
    from tdigest_spark.plans.checkpoint import CheckpointedBuild
    from tdigest_spark.sketch.tdigest import TDigest

    src = tmp_path / "data.parquet"
    rng = np.random.default_rng(7)
    vals = rng.normal(50.0, 10.0, 20_000)
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"v": vals}), src, row_group_size=2_000)

    ckpt_uri = f"file://{tmp_path}/ckpt"
    cb = CheckpointedBuild(
        ckpt_uri, {"td": ("v", TDIGEST(0.01))},
        target_rows_per_split=2_000, splits_per_batch=2,
    )
    out = cb.run(spark, [str(src)])
    d: TDigest = out["td"]
    assert d.n == vals.size
    assert abs(d.quantile(0.5) - np.quantile(vals, 0.5)) < 0.5
    n_batches = len(cb.completed())
    assert n_batches >= 2
    # resume: nothing to do, same result
    out2 = cb.run(spark, [str(src)])
    assert out2["td"].to_bytes() == d.to_bytes()


def test_streaming_state_write_read_uri_roundtrip(tmp_path):
    """_write_state/_read_state_rows round-trip through a file:// URI."""
    from tdigest_spark.streaming import _read_state_rows, _write_state

    uri = f"file://{tmp_path}/state"
    assert _read_state_rows(uri) is None
    _write_state(uri, {"batch_id": 3, "rows": 10, "state_td": b"\x01\x02"})
    rows = _read_state_rows(uri)
    assert rows == [{"batch_id": 3, "rows": 10, "state_td": b"\x01\x02"}]
