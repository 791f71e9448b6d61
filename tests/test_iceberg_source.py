"""Iceberg-gated source (sources/iceberg.py): no Iceberg runtime ships in
this sandbox, so the tests pin the capability gate and the parquet
fallback; the catalog path is exercised on clusters that have the jars."""

import pytest

from tdigest_spark.sources.iceberg import (
    has_iceberg,
    iceberg_scan_paths,
    read_sequences,
)
from tdigest_spark.sources.sequence_table import (
    default_cache_dir,
    generate_sequence_table,
)


def test_gate_is_off_without_jars(spark):
    assert has_iceberg(spark) is False


def test_parquet_fallback(spark):
    path = generate_sequence_table(
        default_cache_dir() / "icebergtest_n1000",
        n_rows=1_000,
        seed=2,
        rows_per_file=500,
    )
    df = read_sequences(spark, str(path))
    assert df.count() == 1_000
    assert set(df.columns) == {"doc_id", "tokens", "n_tok", "source"}


def test_scan_paths_requires_catalog(spark):
    with pytest.raises(RuntimeError):
        iceberg_scan_paths(spark, "cat.db.tbl")


# ---------------------------------------------------------------------------
# static snapshot writer (sources/iceberg_write.py)
# ---------------------------------------------------------------------------


def _pq(path, xs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"x": list(xs)}), path)
    return path


@pytest.fixture()
def table_root(tmp_path):
    from tdigest_spark.sources import iceberg_write as W

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    return root


def test_writer_append_accumulates_and_time_travels(table_root, spark):
    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import (
        is_static_iceberg_table,
        read_sequences,
    )

    assert is_static_iceberg_table(str(table_root))
    assert W.live_paths(table_root) == []
    s1 = W.append_snapshot(
        table_root, [_pq(table_root / "data" / "a.parquet", [1, 2])], ts_ms=2000
    )
    s2 = W.append_snapshot(
        table_root, [_pq(table_root / "data" / "b.parquet", [3])], ts_ms=3000
    )
    assert W.snapshot_ids(table_root) == [s1, s2]
    assert [p.rsplit("/", 1)[1] for p in W.live_paths(table_root, s1)] == [
        "a.parquet"
    ]
    got_v1 = sorted(
        r["x"] for r in read_sequences(spark, str(table_root), snapshot_id=s1).collect()
    )
    got_cur = sorted(r["x"] for r in read_sequences(spark, str(table_root)).collect())
    assert got_v1 == [1, 2]
    assert got_cur == [1, 2, 3]


def test_writer_overwrite_tombstones_but_history_survives(table_root, spark):
    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.avro_lite import read_container
    from tdigest_spark.sources.iceberg import read_sequences

    s1 = W.append_snapshot(
        table_root, [_pq(table_root / "data" / "a.parquet", [1, 2])], ts_ms=2000
    )
    s2 = W.overwrite_snapshot(
        table_root, [_pq(table_root / "data" / "c.parquet", [9])], ts_ms=3000
    )
    # current reads only the rewrite; the replaced file is still on disk
    assert sorted(
        r["x"] for r in read_sequences(spark, str(table_root)).collect()
    ) == [9]
    assert (table_root / "data" / "a.parquet").exists()
    # time travel to the pre-overwrite snapshot still works
    assert sorted(
        r["x"]
        for r in read_sequences(spark, str(table_root), snapshot_id=s1).collect()
    ) == [1, 2]
    # the overwrite manifest records the removal as a DELETED (status 2)
    # entry, not a silent drop
    import json

    meta = json.loads(
        (table_root / "metadata" / "v3.metadata.json").read_text()
    )
    snap = [s for s in meta["snapshots"] if s["snapshot-id"] == s2][0]
    assert snap["summary"]["operation"] == "overwrite"
    ml = snap["manifest-list"].replace("file://", "")
    _, manifests = read_container(ml)
    _, entries = read_container(
        manifests[0]["manifest_path"].replace("file://", "")
    )
    statuses = sorted(e["status"] for e in entries)
    assert statuses == [1, 2]
    deleted = [e for e in entries if e["status"] == 2][0]
    assert deleted["data_file"]["file_path"].endswith("a.parquet")


def test_writer_commit_order_is_crash_safe(table_root):
    """The version hint flips last: before it does, a reader still resolves
    the previous complete metadata version."""
    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import current_metadata

    W.append_snapshot(
        table_root, [_pq(table_root / "data" / "a.parquet", [1])], ts_ms=2000
    )
    # simulate a crash AFTER v3.metadata.json is written but BEFORE the
    # hint advances: hand-roll the partial state
    import json

    meta_dir = table_root / "metadata"
    broken = json.loads((meta_dir / "v2.metadata.json").read_text())
    broken["current-snapshot-id"] = 999  # never committed
    (meta_dir / "v3.metadata.json").write_text(json.dumps(broken))
    # hint still says 2 -> readers see the last complete commit
    meta = current_metadata(table_root)
    assert meta["current-snapshot-id"] != 999


def test_writer_missing_snapshot_raises(table_root):
    from tdigest_spark.sources import iceberg_write as W

    W.append_snapshot(
        table_root, [_pq(table_root / "data" / "a.parquet", [1])], ts_ms=2000
    )
    with pytest.raises(KeyError):
        W.live_paths(table_root, 12345)


def test_writer_record_counts_recorded(table_root):
    from tdigest_spark.sources import avro_lite, iceberg_write as W

    W.append_snapshot(
        table_root, [_pq(table_root / "data" / "a.parquet", [1, 2, 3])], ts_ms=2000
    )
    m = sorted((table_root / "metadata").glob("m-*.avro"))[0]
    _, entries = avro_lite.read_container(m)
    assert entries[0]["data_file"]["record_count"] == 3
    assert entries[0]["data_file"]["file_size_in_bytes"] > 0


def test_writer_position_deletes_merge_on_read(table_root, spark):
    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import (
        iceberg_scan_files_static,
        read_sequences,
    )

    f1 = _pq(table_root / "data" / "a.parquet", [10, 20, 30, 40])
    f2 = _pq(table_root / "data" / "b.parquet", [50, 60])
    s1 = W.append_snapshot(table_root, [f1, f2], ts_ms=2000)
    s2 = W.delete_rows_snapshot(
        table_root, {str(f1): [0, 2], str(f2): [1]}, ts_ms=3000
    )
    data, dels = iceberg_scan_files_static(table_root)
    assert len(data) == 2 and len(dels) == 1
    # current = MOR view; the data files are untouched on disk
    assert sorted(
        r["x"] for r in read_sequences(spark, str(table_root)).collect()
    ) == [20, 40, 50]
    # time travel to the pre-delete snapshot
    assert sorted(
        r["x"]
        for r in read_sequences(spark, str(table_root), snapshot_id=s1).collect()
    ) == [10, 20, 30, 40, 50, 60]
    # a later overwrite compacts away BOTH the old data and the delete file
    f3 = _pq(table_root / "data" / "c.parquet", [20, 40, 50])
    s3 = W.overwrite_snapshot(table_root, [f3], ts_ms=4000)
    data3, dels3 = iceberg_scan_files_static(table_root)
    assert [p.rsplit("/", 1)[1] for p in data3] == ["c.parquet"]
    assert dels3 == []
    assert sorted(
        r["x"] for r in read_sequences(spark, str(table_root)).collect()
    ) == [20, 40, 50]
    # and the MOR snapshot itself is still time-travelable
    assert sorted(
        r["x"]
        for r in read_sequences(spark, str(table_root), snapshot_id=s2).collect()
    ) == [20, 40, 50]


def test_writer_append_after_delete_keeps_tombstones(table_root, spark):
    """Position deletes name (file, pos) — appending new files must not
    resurrect tombstoned rows of old files."""
    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_sequences

    f1 = _pq(table_root / "data" / "a.parquet", [10, 20])
    W.append_snapshot(table_root, [f1], ts_ms=2000)
    W.delete_rows_snapshot(table_root, {str(f1): [0]}, ts_ms=3000)
    f2 = _pq(table_root / "data" / "b.parquet", [30])
    W.append_snapshot(table_root, [f2], ts_ms=4000)
    assert sorted(
        r["x"] for r in read_sequences(spark, str(table_root)).collect()
    ) == [20, 30]


def test_incremental_paths_between_snapshots(table_root):
    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_incremental_paths

    f1 = _pq(table_root / "data" / "a.parquet", [1])
    f2 = _pq(table_root / "data" / "b.parquet", [2])
    f3 = _pq(table_root / "data" / "c.parquet", [3])
    s1 = W.append_snapshot(table_root, [f1], ts_ms=2000)
    s2 = W.append_snapshot(table_root, [f2], ts_ms=3000)
    s3 = W.append_snapshot(table_root, [f3], ts_ms=4000)
    names = lambda ps: [p.rsplit("/", 1)[1] for p in ps]  # noqa: E731
    assert names(iceberg_incremental_paths(table_root, s1)) == [
        "b.parquet",
        "c.parquet",
    ]
    assert names(iceberg_incremental_paths(table_root, s1, s2)) == ["b.parquet"]
    assert names(iceberg_incremental_paths(table_root, s2, s3)) == ["c.parquet"]
    assert iceberg_incremental_paths(table_root, s3) == []
    with pytest.raises(KeyError):
        iceberg_incremental_paths(table_root, 999)


def test_sequence_table_iceberg_metadata_roundtrip(tmp_path):
    from tdigest_spark.sources.iceberg import iceberg_scan_paths_static
    from tdigest_spark.sources.sequence_table import (
        ensure_iceberg_metadata,
        generate_sequence_table,
    )

    path = generate_sequence_table(tmp_path / "seq", n_rows=300, seed=3, rows_per_file=100)
    ensure_iceberg_metadata(path)
    files = sorted(str(p) for p in path.glob("*.parquet"))
    assert iceberg_scan_paths_static(str(path)) == files
    # idempotent: second call reuses the committed snapshot
    before = (path / "metadata" / "version-hint.text").read_text()
    ensure_iceberg_metadata(path)
    assert (path / "metadata" / "version-hint.text").read_text() == before
    # regeneration with different params invalidates and recommits
    generate_sequence_table(path, n_rows=200, seed=3, rows_per_file=100)
    ensure_iceberg_metadata(path)
    files2 = sorted(str(p) for p in path.glob("*.parquet"))
    assert iceberg_scan_paths_static(str(path)) == files2
    assert len(files2) == 2


def test_writer_equality_deletes_and_reinsert(table_root, spark):
    """Equality delete tombstones matching keys in EARLIER-sequence files
    only; a later re-insert of the same key survives (spec sequence rule)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_sequences

    f1 = table_root / "data" / "a.parquet"
    pq.write_table(pa.table({"k": [1, 2, 3, 4], "x": [10, 20, 30, 40]}), f1)
    s1 = W.append_snapshot(table_root, [f1], ts_ms=2000)
    keys = table_root / "data" / "ed.parquet"
    pq.write_table(pa.table({"k": [2, 4]}), keys)
    s2 = W.equality_delete_snapshot(table_root, keys, ts_ms=3000)
    f2 = table_root / "data" / "b.parquet"
    pq.write_table(pa.table({"k": [2, 5], "x": [21, 50]}), f2)
    s3 = W.append_snapshot(table_root, [f2], ts_ms=4000)

    def state(sid=None):
        return sorted(
            (r["k"], r["x"])
            for r in read_sequences(spark, str(table_root), snapshot_id=sid).collect()
        )

    assert state(s1) == [(1, 10), (2, 20), (3, 30), (4, 40)]
    assert state(s2) == [(1, 10), (3, 30)]
    # re-inserted k=2 survives; original k=2/k=4 rows stay deleted
    assert state(s3) == [(1, 10), (2, 21), (3, 30), (5, 50)]
    assert state() == state(s3)


def test_equality_and_position_deletes_compose(table_root, spark):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_sequences

    f1 = table_root / "data" / "a.parquet"
    pq.write_table(pa.table({"k": [1, 2, 3, 4], "x": [10, 20, 30, 40]}), f1)
    W.append_snapshot(table_root, [f1], ts_ms=2000)
    W.delete_rows_snapshot(table_root, {str(f1): [0]}, ts_ms=3000)  # k=1
    keys = table_root / "data" / "ed.parquet"
    pq.write_table(pa.table({"k": [3]}), keys)
    W.equality_delete_snapshot(table_root, keys, ts_ms=4000)
    assert sorted(
        (r["k"], r["x"])
        for r in read_sequences(spark, str(table_root)).collect()
    ) == [(2, 20), (4, 40)]


# ---------------------------------------------------------------------------
# manifest column-stats pruning (writer bounds + metadata-only scan plan)
# ---------------------------------------------------------------------------


def test_truncate_upper_increments_and_rolls():
    from tdigest_spark.sources.iceberg_write import _TRUNC, _truncate_upper

    short = b"abc"
    assert _truncate_upper(short) == short  # within limit: unchanged
    long = b"a" * _TRUNC + b"zz"
    up = _truncate_upper(long)
    assert len(up) == _TRUNC and up > long[:_TRUNC] and up > long
    # trailing 0xFF rolls back to the previous byte
    rolls = b"a" * (_TRUNC - 1) + b"\xff" + b"tail"
    up = _truncate_upper(rolls)
    assert up == b"a" * (_TRUNC - 2) + b"b"
    assert up > rolls  # still a valid upper bound
    # un-bound-able: every prefix byte is 0xFF
    assert _truncate_upper(b"\xff" * (_TRUNC + 4)) is None


def test_bounds_recorded_and_pruned_scan(table_root):
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import (
        iceberg_scan_entries_static,
        iceberg_scan_paths_pruned,
    )

    files = []
    for i in range(5):
        f = table_root / "data" / f"f{i}.parquet"
        pq.write_table(
            pa.table(
                {
                    "k": pa.array([i * 10 + j for j in range(10)], pa.int64()),
                    "x": pa.array([float(i * 10 + j) for j in range(10)]),
                    "s": [f"n_{i:02d}_{j}" for j in range(10)],
                    "ts": [datetime.datetime(2001, 1 + i, 1 + j) for j in range(10)],
                }
            ),
            f,
        )
        files.append(f)
    W.append_snapshot(table_root, files, snapshot_id=1, ts_ms=2000)

    entries = iceberg_scan_entries_static(str(table_root))["data"]
    assert all(e["lower_bounds"] and e["upper_bounds"] for e in entries)

    def names(pred):
        paths, total = iceberg_scan_paths_pruned(str(table_root), pred)
        assert total == 5
        return [p.rsplit("/", 1)[1] for p in paths]

    assert names([("k", ">=", 25), ("k", "<", 45)]) == [
        "f2.parquet", "f3.parquet", "f4.parquet",
    ]
    assert names([("k", "==", 10)]) == ["f1.parquet"]
    assert names([("x", ">", 39.0)]) == ["f4.parquet"]
    assert names([("s", "==", "n_03_5")]) == ["f3.parquet"]
    assert names([("ts", ">=", datetime.datetime(2001, 4, 1))]) == [
        "f3.parquet", "f4.parquet",
    ]
    # a column without bounds never prunes (optimization, not a filter)
    assert len(names([("missing", ">=", 0)])) == 5
    # conjunction that excludes everything
    assert names([("k", ">=", 100)]) == []


def test_pruned_scan_matches_full_scan(table_root, spark):
    """Pruning + residual filter must equal filtering the full table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import (
        iceberg_scan_paths_pruned,
        iceberg_scan_paths_static,
    )

    files = []
    for i in range(4):
        f = table_root / "data" / f"g{i}.parquet"
        pq.write_table(
            pa.table({"v": pa.array(range(i * 100, i * 100 + 100), pa.int64())}), f
        )
        files.append(f)
    W.append_snapshot(table_root, files, snapshot_id=1, ts_ms=2000)
    pruned, total = iceberg_scan_paths_pruned(
        str(table_root), [("v", ">=", 150), ("v", "<", 310)]
    )
    assert len(pruned) == 3 < total == 4  # metadata-only skip proven
    got = sorted(
        r.v
        for r in spark.read.parquet(*pruned)
        .where("v >= 150 AND v < 310")
        .collect()
    )
    full = sorted(
        r.v
        for r in spark.read.parquet(*iceberg_scan_paths_static(str(table_root)))
        .where("v >= 150 AND v < 310")
        .collect()
    )
    assert got == full == list(range(150, 310))


def test_old_manifests_without_bounds_still_read(table_root):
    """Entries written before the bounds fields existed must keep reading
    (and never prune) — forward compatibility of the metadata walk."""
    import pyarrow.parquet as pq

    from tdigest_spark.sources import avro_lite
    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_scan_paths_pruned

    f = _pq(table_root / "data" / "old.parquet", range(50))
    W.append_snapshot(table_root, [f], snapshot_id=1, ts_ms=2000)
    # rewrite the manifest with the PRE-bounds schema (simulating an old
    # writer): strip the bounds fields from every entry
    meta_dir = table_root / "metadata"
    old_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                    ],
                },
            },
        ],
    }
    for m in meta_dir.glob("m-*.avro"):
        _, rows = avro_lite.read_container(m)
        for r in rows:
            r["data_file"].pop("lower_bounds", None)
            r["data_file"].pop("upper_bounds", None)
        avro_lite.write_container(m, old_schema, rows)
    paths, total = iceberg_scan_paths_pruned(str(table_root), [("x", ">=", 999)])
    assert total == 1 and len(paths) == 1  # no bounds -> never pruned


# ---------------------------------------------------------------------------
# schema evolution (field-id resolved reads)
# ---------------------------------------------------------------------------


def _evo_table(table_root):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W

    f1 = table_root / "data" / "a.parquet"
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "val": pa.array([10, 20], pa.int32()),  # int -> long promotes
            }
        ),
        f1,
    )
    W.append_snapshot(table_root, [f1], snapshot_id=1, ts_ms=2000)
    W.rename_column(table_root, "val", "amount", ts_ms=3000)
    W.add_column(table_root, "note", "string", ts_ms=4000)
    f2 = table_root / "data" / "b.parquet"
    pq.write_table(
        pa.table(
            {
                "id": pa.array([3], pa.int64()),
                "amount": pa.array([30], pa.int64()),
                "note": ["hi"],
            }
        ),
        f2,
    )
    W.append_snapshot(table_root, [f2], snapshot_id=2, ts_ms=5000)


@pytest.fixture()
def evolved_root(tmp_path):
    from tdigest_spark.sources import iceberg_write as W

    root = tmp_path / "tbl"
    W.create_table(
        root, ts_ms=1000, schema_fields=[("id", "long"), ("val", "long")]
    )
    _evo_table(root)
    return root


def test_evolved_read_resolves_rename_add_promote(evolved_root, spark):
    from tdigest_spark.sources.iceberg import read_table_evolved

    df = read_table_evolved(spark, str(evolved_root))
    assert df.columns == ["id", "amount", "note"]
    assert dict(df.dtypes)["amount"] == "bigint"  # int32 file promoted
    rows = {r.id: (r.amount, r.note) for r in df.collect()}
    # old file: val read as amount by FIELD ID, note NULL (added later)
    assert rows == {1: (10, None), 2: (20, None), 3: (30, "hi")}


def test_evolved_read_time_travel_uses_current_schema(evolved_root, spark):
    from tdigest_spark.sources.iceberg import read_table_evolved

    df = read_table_evolved(spark, str(evolved_root), snapshot_id=1)
    assert df.columns == ["id", "amount", "note"]
    assert {r.id for r in df.collect()} == {1, 2}


def test_evolved_read_after_drop_column(evolved_root, spark):
    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_table_evolved

    W.drop_column(evolved_root, "note", ts_ms=6000)
    df = read_table_evolved(spark, str(evolved_root))
    assert df.columns == ["id", "amount"]  # old files still store note
    assert {r.id for r in df.collect()} == {1, 2, 3}
    # re-adding the same NAME gets a FRESH field id: b.parquet's stored
    # note values must NOT resurrect under the re-added column
    W.add_column(evolved_root, "note", "string", ts_ms=7000)
    df = read_table_evolved(spark, str(evolved_root))
    assert {r.note for r in df.collect()} == {None}


def test_evolution_guards(evolved_root, tmp_path):
    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_table_evolved

    with pytest.raises(KeyError):
        W.rename_column(evolved_root, "nope", "x")
    with pytest.raises(ValueError):
        W.rename_column(evolved_root, "amount", "note")  # collision
    with pytest.raises(ValueError):
        W.add_column(evolved_root, "amount", "long")  # exists
    with pytest.raises(KeyError):
        W.drop_column(evolved_root, "nope")
    # schema-less tables refuse the evolved read with a clear message
    root = tmp_path / "bare"
    W.create_table(root, ts_ms=1000)
    with pytest.raises(ValueError):
        W.rename_column(root, "a", "b")


# ---------------------------------------------------------------------------
# hidden partitioning (partition specs, transforms, tuple pruning)
# ---------------------------------------------------------------------------


def test_partition_transform_spec_vectors():
    """Pinned against the Apache Iceberg table spec's published transform
    test values (bucket hashes, time transforms, truncate semantics)."""
    import datetime
    import struct

    from tdigest_spark.sources.iceberg_partition import (
        apply_transform,
        murmur3_x86_32,
    )

    assert murmur3_x86_32(struct.pack("<q", 34)) == 2017239379
    assert murmur3_x86_32(b"iceberg") == 1210000089
    d = datetime.datetime(2017, 11, 16, 22, 31, 8)
    assert apply_transform("year", d) == 47
    assert apply_transform("month", d) == 574
    assert apply_transform("day", d) == 17486
    assert apply_transform("hour", d) == 17486 * 24 + 22
    assert apply_transform("truncate[10]", 1) == 0
    assert apply_transform("truncate[10]", -1) == -10
    assert apply_transform("truncate[3]", "iceberg") == "ice"
    assert apply_transform("identity", "x") == "x"
    assert apply_transform("bucket[16]", 34) in range(16)
    with pytest.raises(ValueError):
        apply_transform("bogus[3]", 1)


def test_partition_tuple_recorded_and_purity_enforced(table_root):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_scan_entries_static

    W.set_partition_spec(table_root, [("lang", "identity")], ts_ms=1500)
    ok = table_root / "data" / "en.parquet"
    pq.write_table(pa.table({"lang": ["en", "en"], "v": [1, 2]}), ok)
    W.append_snapshot(table_root, [ok], snapshot_id=1, ts_ms=2000)
    e = iceberg_scan_entries_static(str(table_root))["data"][0]
    assert e["partition"] == {"lang_identity": "en"}
    # a file mixing partition values must be REJECTED at commit time
    bad = table_root / "data" / "mixed.parquet"
    pq.write_table(pa.table({"lang": ["en", "fr"], "v": [1, 2]}), bad)
    with pytest.raises(ValueError, match="partition-pure"):
        W.append_snapshot(table_root, [bad], snapshot_id=2, ts_ms=3000)


def test_hidden_partition_pruning_rules(table_root):
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_scan_paths_pruned
    from tdigest_spark.sources.iceberg_partition import apply_transform

    W.set_partition_spec(
        table_root, [("ts", "month"), ("uid", "bucket[4]")], ts_ms=1500
    )
    files = []
    for m in range(1, 5):  # four months x one bucket-pure uid each
        uid = next(
            u for u in range(100) if apply_transform("bucket[4]", u) == m % 4
        )
        f = table_root / "data" / f"m{m}.parquet"
        pq.write_table(
            pa.table(
                {
                    "ts": [datetime.datetime(2020, m, d) for d in (1, 15)],
                    "uid": pa.array([uid, uid], pa.int64()),
                }
            ),
            f,
        )
        files.append((f, uid))
    W.append_snapshot(table_root, [f for f, _ in files], snapshot_id=1, ts_ms=2000)

    def kept(preds):
        paths, total = iceberg_scan_paths_pruned(str(table_root), preds)
        assert total == 4
        return sorted(p.rsplit("/", 1)[1] for p in paths)

    # month transform relaxes the range predicate on the RAW column
    assert kept([("ts", ">=", datetime.datetime(2020, 3, 1))]) == [
        "m3.parquet", "m4.parquet",
    ]
    assert kept([("ts", "<", datetime.datetime(2020, 2, 10))]) == [
        "m1.parquet", "m2.parquet",  # strict < relaxes to <= on months
    ]
    # bucket prunes equality probes only
    uid2 = files[1][1]
    assert kept([("uid", "==", uid2)]) == ["m2.parquet"]
    # bucket is not order-preserving: the PARTITION rule keeps every file
    # under a range predicate (the composed planner may still prune such
    # files through the column-stats bounds — a different, sound layer)
    from tdigest_spark.sources.iceberg_partition import partition_value_matches

    for pv in range(4):
        assert partition_value_matches("bucket[4]", pv, ">=", uid2)
        assert partition_value_matches("bucket[4]", pv, "<", uid2)
    # conjunction composes with the stats bounds too
    assert kept(
        [("uid", "==", uid2), ("ts", ">=", datetime.datetime(2020, 3, 1))]
    ) == []


def test_hidden_partition_cells_occupied_all_sfs():
    """iceberg_hidden_partition_read's oracle spells files_total as
    COUNT(DISTINCT lang) * 8 — valid only while every (lang, bucket[8])
    cell is non-empty at every scale factor the oracle gate runs."""
    import duckdb

    from tdigest_spark.sources.iceberg_partition import apply_transform

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        rows = duckdb.sql(
            f"SELECT doc_id, lang FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet')"
        ).fetchall()
        cells = {(lang, apply_transform("bucket[8]", did)) for did, lang in rows}
        langs = {lang for _, lang in rows}
        assert len(cells) == len(langs) * 8, sf


# ---------------------------------------------------------------------------
# table maintenance: snapshot expiration + orphan detection
# ---------------------------------------------------------------------------


def test_expire_snapshots_deletes_only_unreachable(table_root, spark):
    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_sequences

    f_a = _pq(table_root / "data" / "a.parquet", [1, 2])
    f_b = _pq(table_root / "data" / "b.parquet", [3])
    f_c = _pq(table_root / "data" / "c.parquet", [9])
    s1 = W.append_snapshot(table_root, [f_a], ts_ms=2000)
    s2 = W.append_snapshot(table_root, [f_b], ts_ms=3000)
    s3 = W.overwrite_snapshot(table_root, [f_c], ts_ms=4000)
    # dry run: reports, touches nothing
    rep = W.expire_snapshots(table_root, keep_last=1, dry_run=True)
    assert rep["expired"] == [s1, s2] and f_a.exists() and f_b.exists()
    # real expiration: a+b reachable only from expired snapshots -> gone;
    # c (live in s3) survives
    rep = W.expire_snapshots(table_root, keep_last=1, ts_ms=5000)
    assert sorted(rep["expired"]) == [s1, s2]
    assert [p.rsplit("/", 1)[1] for p in rep["deleted_data_files"]] == [
        "a.parquet", "b.parquet",
    ]
    assert not f_a.exists() and not f_b.exists() and f_c.exists()
    assert W.snapshot_ids(table_root) == [s3]
    assert sorted(
        r["x"] for r in read_sequences(spark, str(table_root)).collect()
    ) == [9]
    with pytest.raises(KeyError):  # expired id no longer time-travelable
        W.live_paths(table_root, s1)


def test_expire_keeps_files_shared_with_retained(table_root):
    """An append chain shares manifests: expiring the older snapshot must
    NOT delete files the newer (retained) one still reads."""
    from tdigest_spark.sources import iceberg_write as W

    f_a = _pq(table_root / "data" / "a.parquet", [1])
    f_b = _pq(table_root / "data" / "b.parquet", [2])
    W.append_snapshot(table_root, [f_a], ts_ms=2000)
    s2 = W.append_snapshot(table_root, [f_b], ts_ms=3000)
    rep = W.expire_snapshots(table_root, keep_last=1, ts_ms=4000)
    assert rep["deleted_data_files"] == []  # a.parquet is live in s2
    assert f_a.exists()
    assert sorted(
        p.rsplit("/", 1)[1] for p in W.live_paths(table_root, s2)
    ) == ["a.parquet", "b.parquet"]


def test_expire_must_retain_current(table_root):
    from tdigest_spark.sources import iceberg_write as W

    W.append_snapshot(table_root, [_pq(table_root / "data" / "a.parquet", [1])])
    assert W.expire_snapshots(table_root, keep_last=1)["expired"] == []
    assert W.expire_snapshots(table_root, keep_last=5)["expired"] == []


def test_orphan_files_detected(table_root):
    from tdigest_spark.sources import iceberg_write as W

    f_a = _pq(table_root / "data" / "a.parquet", [1])
    W.append_snapshot(table_root, [f_a], ts_ms=2000)
    # a crashed writer's file: written, never committed
    _pq(table_root / "data" / "stray.parquet", [7])
    orphans = W.orphan_files(table_root)
    assert [p.rsplit("/", 1)[1] for p in orphans] == ["stray.parquet"]
    # tombstoned-but-referenced files are NOT orphans
    f_c = _pq(table_root / "data" / "c.parquet", [9])
    W.overwrite_snapshot(table_root, [f_c], ts_ms=3000)
    assert [p.rsplit("/", 1)[1] for p in W.orphan_files(table_root)] == [
        "stray.parquet"
    ]


def test_remove_orphan_files_age_guarded(table_root, spark):
    """remove_orphan_files deletes only orphans OLDER than the cutoff:
    a fresh stray (inside the in-flight-commit window) survives, live
    and tombstoned-but-referenced files are never touched, the table
    still reads, and a second call is a no-op."""
    import os
    import time

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_sequences

    f_a = _pq(table_root / "data" / "a.parquet", [1, 2])
    W.append_snapshot(table_root, [f_a], ts_ms=2000)
    old_stray = _pq(table_root / "data" / "old_stray.parquet", [7])
    os.utime(old_stray, (time.time() - 7200, time.time() - 7200))
    fresh_stray = _pq(table_root / "data" / "fresh_stray.parquet", [8])
    deleted = W.remove_orphan_files(table_root, older_than_ms=3_600_000)
    assert [p.rsplit("/", 1)[1] for p in deleted] == ["old_stray.parquet"]
    assert not old_stray.exists() and fresh_stray.exists()
    assert f_a.exists()
    assert sorted(
        r["x"] for r in read_sequences(spark, str(table_root)).collect()
    ) == [1, 2]
    assert W.remove_orphan_files(table_root, older_than_ms=3_600_000) == []
    # the fresh stray ages past the window -> reaped on the next run
    os.utime(fresh_stray, (time.time() - 7200, time.time() - 7200))
    assert [
        p.rsplit("/", 1)[1]
        for p in W.remove_orphan_files(table_root, older_than_ms=3_600_000)
    ] == ["fresh_stray.parquet"]


def test_upsert_single_commit_merge_semantics(table_root, spark):
    """MERGE as one commit: same-sequence equality delete + new rows —
    older copies tombstoned, new versions and plain inserts survive,
    pre-upsert snapshot still time-travelable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_sequences

    f1 = table_root / "data" / "base.parquet"
    pq.write_table(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": [10, 20, 30]}), f1
    )
    s1 = W.append_snapshot(table_root, [f1], ts_ms=2000)
    # upsert: update k=2, insert k=4
    newf = table_root / "data" / "upsert.parquet"
    pq.write_table(
        pa.table({"k": pa.array([2, 4], pa.int64()), "v": [21, 40]}), newf
    )
    keys = table_root / "data" / "upsert-keys.parquet"
    pq.write_table(pa.table({"k": pa.array([2, 4], pa.int64())}), keys)
    s2 = W.upsert_snapshot(table_root, [newf], keys, ts_ms=3000)
    got = {
        r.k: r.v for r in read_sequences(spark, str(table_root)).collect()
    }
    assert got == {1: 10, 2: 21, 3: 30, 4: 40}
    # one snapshot, atomic: history has exactly two entries
    assert W.snapshot_ids(table_root) == [s1, s2]
    old = {
        r.k: r.v
        for r in read_sequences(spark, str(table_root), snapshot_id=s1).collect()
    }
    assert old == {1: 10, 2: 20, 3: 30}
    # a second upsert of the SAME key wins again (sequence ordering)
    newf2 = table_root / "data" / "upsert2.parquet"
    pq.write_table(pa.table({"k": pa.array([2], pa.int64()), "v": [22]}), newf2)
    keys2 = table_root / "data" / "upsert2-keys.parquet"
    pq.write_table(pa.table({"k": pa.array([2], pa.int64())}), keys2)
    W.upsert_snapshot(table_root, [newf2], keys2, ts_ms=4000)
    got = {r.k: r.v for r in read_sequences(spark, str(table_root)).collect()}
    assert got == {1: 10, 2: 22, 3: 30, 4: 40}


def test_pruning_literal_type_coercion(tmp_path):
    """A mistyped predicate literal must never decode bounds in the wrong
    domain: with a tracked schema, integral floats coerce and incompatible
    literals drop out of the pruning conjunction (file kept)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_scan_paths_pruned

    root = tmp_path / "tbl"
    W.create_table(
        root, ts_ms=1000, schema_fields=[("k", "long"), ("x", "double")]
    )
    for i in range(2):
        f = root / "data" / f"f{i}.parquet"
        pq.write_table(
            pa.table(
                {
                    "k": pa.array([i * 10 + j for j in range(10)], pa.int64()),
                    "x": pa.array([float(i * 10 + j) for j in range(10)]),
                }
            ),
            f,
        )
        W.append_snapshot(root, [f], ts_ms=2000 + i)
    # float literal on the long column: integral coerces and PRUNES
    paths, _ = iceberg_scan_paths_pruned(str(root), [("k", ">=", 10.0)])
    assert [p.rsplit("/", 1)[1] for p in paths] == ["f1.parquet"]
    # non-integral float on a long column: dropped from pruning, both kept
    paths, _ = iceberg_scan_paths_pruned(str(root), [("k", ">=", 9.5)])
    assert len(paths) == 2
    # int literal on the double column coerces and prunes
    paths, _ = iceberg_scan_paths_pruned(str(root), [("x", ">", 9)])
    assert [p.rsplit("/", 1)[1] for p in paths] == ["f1.parquet"]
    # string literal on a numeric column: dropped, never mis-decoded
    paths, _ = iceberg_scan_paths_pruned(str(root), [("k", "==", "10")])
    assert len(paths) == 2


def test_identity_partition_on_timestamp(table_root):
    """identity(ts) tuples store epoch micros; literal predicates on the
    raw timestamp column still prune exactly."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_scan_paths_pruned

    W.set_partition_spec(table_root, [("ts", "identity")], ts_ms=1500)
    files = []
    for d in (1, 2):
        f = table_root / "data" / f"d{d}.parquet"
        pq.write_table(
            pa.table({"ts": [datetime.datetime(2021, 1, d)] * 3, "v": [d] * 3}),
            f,
        )
        files.append(f)
    W.append_snapshot(table_root, files, snapshot_id=1, ts_ms=2000)
    paths, total = iceberg_scan_paths_pruned(
        str(table_root), [("ts", "==", datetime.datetime(2021, 1, 2))]
    )
    assert total == 2
    assert [p.rsplit("/", 1)[1] for p in paths] == ["d2.parquet"]


def test_compaction_then_expire_reclaims_small_files(table_root, spark):
    """The standard small-file lifecycle: bin-pack committed files into one
    via a copy-on-write OVERWRITE (same rows), then expiration reclaims the
    originals — reads identical throughout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_sequences

    small = []
    for i in range(4):
        f = _pq(table_root / "data" / f"s{i}.parquet", [i * 10, i * 10 + 1])
        small.append(f)
    W.append_snapshot(table_root, small[:2], ts_ms=2000)
    W.append_snapshot(table_root, small[2:], ts_ms=3000)
    before = sorted(
        r["x"] for r in read_sequences(spark, str(table_root)).collect()
    )
    # compact: one merged file, committed copy-on-write
    merged = table_root / "data" / "compact.parquet"
    pq.write_table(
        pa.concat_tables([pq.read_table(f) for f in small]), merged
    )
    W.overwrite_snapshot(table_root, [merged], ts_ms=4000)
    after = sorted(
        r["x"] for r in read_sequences(spark, str(table_root)).collect()
    )
    assert after == before
    assert all(f.exists() for f in small)  # history still time-travelable
    rep = W.expire_snapshots(table_root, keep_last=1, ts_ms=5000)
    assert len(rep["deleted_data_files"]) == 4
    assert not any(f.exists() for f in small) and merged.exists()
    assert W.orphan_files(table_root) == []
    assert sorted(
        r["x"] for r in read_sequences(spark, str(table_root)).collect()
    ) == before


def test_evolved_read_composes_with_position_deletes(evolved_root, spark):
    """Row-level position deletes (file, pos) are schema-name independent,
    so they apply under evolution: tombstone one pre-rename row and one
    post-rename row, the projected view drops exactly those."""
    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_table_evolved

    W.delete_rows_snapshot(
        evolved_root,
        {
            str(evolved_root / "data" / "a.parquet"): [0],  # id=1
            str(evolved_root / "data" / "b.parquet"): [0],  # id=3
        },
        ts_ms=6000,
    )
    rows = {r.id: (r.amount, r.note) for r in read_table_evolved(
        spark, str(evolved_root)
    ).collect()}
    assert rows == {2: (20, None)}


# ---------------------------------------------------------------------------
# refs: tags, branches, expiration pinning
# ---------------------------------------------------------------------------


def test_refs_tag_branch_and_expire_pinning(table_root, spark):
    """Tags pin history by name; branch appends move only the ref (main
    untouched) and fork implicitly from current; expiration never deletes
    a ref-pinned snapshot; tags are immutable; drop_ref unpins."""
    from pathlib import Path

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import (
        iceberg_ref_snapshot,
        iceberg_scan_paths_static,
    )

    import pytest as _pytest

    f1 = _pq(table_root / "data" / "r1.parquet", [1, 2])
    W.append_snapshot(table_root, [f1], ts_ms=2000)  # main: snap 1
    W.create_ref(table_root, "v1-training", ts_ms=2500)  # tag on snap 1
    f2 = _pq(table_root / "data" / "r2.parquet", [3])
    W.append_snapshot(table_root, [f2], ts_ms=3000)  # main: snap 2

    # branch append forks from CURRENT (snap 2), moves only the ref
    f3 = _pq(table_root / "data" / "r3.parquet", [99])
    W.append_snapshot(table_root, [f3], ts_ms=4000, branch="exp")
    assert iceberg_ref_snapshot(str(table_root), "exp") == 3
    main = set(iceberg_scan_paths_static(str(table_root)))
    branch = set(
        iceberg_scan_paths_static(str(table_root), snapshot_id=3)
    )
    assert str(f3.resolve()) not in {str(Path(p).resolve()) for p in main}
    assert branch - main == {str(f3)}
    # second branch append EXTENDS the branch head
    f4 = _pq(table_root / "data" / "r4.parquet", [100])
    W.append_snapshot(table_root, [f4], ts_ms=4500, branch="exp")
    sid = iceberg_ref_snapshot(str(table_root), "exp")
    b2 = set(iceberg_scan_paths_static(str(table_root), snapshot_id=sid))
    assert {str(f3), str(f4)} <= b2

    # tag is immutable: a branch-style commit to it must refuse
    with _pytest.raises(ValueError):
        W.append_snapshot(
            table_root,
            [_pq(table_root / "data" / "r5.parquet", [7])],
            ts_ms=5000,
            branch="v1-training",
        )
    with _pytest.raises(ValueError):
        W.create_ref(table_root, "exp", ts_ms=5100)  # duplicate name

    # expiration keeps the tag's snapshot 1 AND the branch head alive
    rep = W.expire_snapshots(table_root, keep_last=1, ts_ms=6000)
    assert 1 not in rep["expired"] and sid not in rep["expired"]
    assert sorted(
        r.x
        for r in spark.read.parquet(
            *iceberg_scan_paths_static(
                str(table_root),
                snapshot_id=iceberg_ref_snapshot(str(table_root), "v1-training"),
            )
        ).collect()
    ) == [1, 2]

    # dropping the tag unpins it; the next expiration reclaims snap 1
    W.drop_ref(table_root, "v1-training", ts_ms=7000)
    rep2 = W.expire_snapshots(table_root, keep_last=1, ts_ms=8000)
    assert 1 in rep2["expired"]
    with _pytest.raises(KeyError):
        iceberg_ref_snapshot(str(table_root), "v1-training")


def test_datasource_ref_option_reads_branch(table_root, spark):
    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.datasource import IcebergStaticDataSource

    spark.dataSource.register(IcebergStaticDataSource)
    W.append_snapshot(
        table_root, [_pq(table_root / "data" / "m.parquet", [1, 2])], ts_ms=2000
    )
    W.append_snapshot(
        table_root,
        [_pq(table_root / "data" / "b.parquet", [50])],
        ts_ms=3000,
        branch="exp",
    )
    W.create_ref(table_root, "gold", snapshot_id=1, kind="tag", ts_ms=3500)
    load = lambda **kw: (
        spark.read.format("iceberg_static")
        .option("path", str(table_root))
        .options(**kw)
        .load()
    )
    assert sorted(r.x for r in load().collect()) == [1, 2]  # main
    assert sorted(r.x for r in load(ref="exp").collect()) == [1, 2, 50]
    assert sorted(r.x for r in load(ref="gold").collect()) == [1, 2]
    import pytest as _pytest

    with _pytest.raises(Exception):
        load(ref="exp", snapshot_id="1").collect()


def test_changelog_between_snapshots(table_root, spark):
    """Changelog emits exactly the range's added data rows (insert) and
    equality-delete key tuples (delete_key, non-keys NULL), tagged with
    commit sequence; commits at or before the FROM snapshot are excluded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_changelog

    f1 = table_root / "data" / "c1.parquet"
    pq.write_table(pa.table({"k": [1, 2], "v": ["a", "b"]}), f1)
    W.append_snapshot(table_root, [f1], ts_ms=2000)  # snap 1
    f2 = table_root / "data" / "c2.parquet"
    pq.write_table(pa.table({"k": [3], "v": ["c"]}), f2)
    W.append_snapshot(table_root, [f2], ts_ms=3000)  # snap 2
    f3 = table_root / "data" / "c3.parquet"
    pq.write_table(pa.table({"k": [2], "v": ["B"]}), f3)
    fk = table_root / "data" / "ck.parquet"
    pq.write_table(pa.table({"k": [2]}), fk)
    W.upsert_snapshot(table_root, [f3], fk, ts_ms=4000)  # snap 3: MERGE

    rows = sorted(
        (r._change_type, r._commit_seq, r.k, r.v)
        for r in iceberg_changelog(spark, str(table_root), 1, 3).collect()
    )
    assert rows == [
        ("delete_key", 3, 2, None),  # pre-image not read: v is NULL
        ("insert", 2, 3, "c"),
        ("insert", 3, 2, "B"),
    ]
    # range excluding the upsert sees only the snap-2 append
    only2 = iceberg_changelog(spark, str(table_root), 1, 2).collect()
    assert [(r._change_type, r.k) for r in only2] == [("insert", 3)]


def test_changelog_delete_only_range(table_root, spark):
    """A range whose only commits are key retractions (pure equality
    deletes) is a legitimate CDC case: the changelog derives the full-row
    padding schema from a LIVE data file instead of failing, and emits
    just the delete_key rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_changelog

    f1 = table_root / "data" / "d1.parquet"
    pq.write_table(pa.table({"k": [1, 2], "v": ["a", "b"]}), f1)
    W.append_snapshot(table_root, [f1], ts_ms=2000)  # snap 1
    dk = table_root / "data" / "dk.parquet"
    pq.write_table(pa.table({"k": [2]}), dk)
    W.equality_delete_snapshot(table_root, dk, ts_ms=3000)  # snap 2
    rows = [
        (r._change_type, r._commit_seq, r.k, r.v)
        for r in iceberg_changelog(spark, str(table_root), 1, 2).collect()
    ]
    assert rows == [("delete_key", 2, 2, None)]
    # an empty range still raises (no changes at all is a caller bug)
    dk2 = table_root / "data" / "dk2.parquet"
    pq.write_table(pa.table({"k": [99]}), dk2)
    W.equality_delete_snapshot(table_root, dk2, ts_ms=4000)  # snap 3
    with _pytest.raises(ValueError):
        iceberg_changelog(spark, str(table_root), 2, 2)


def test_evolved_read_with_equality_deletes_across_rename(evolved_root, spark):
    """Equality deletes compose with schema evolution: the delete entry's
    recorded schema id resolves its key columns by FIELD ID, so a delete
    committed BEFORE a rename still tombstones through the rename, a
    delete committed AFTER it (keys under the new name) reaches files
    written under the old name, and the strict-smaller-sequence rule
    keeps later re-inserts alive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_table_evolved

    # evolved_root state: schema now (id, amount, note); files a.parquet
    # (ids 1,2 under old names id/val int32) and b.parquet (id 3)
    dk = evolved_root / "data" / "ek.parquet"
    pq.write_table(pa.table({"id": pa.array([2], pa.int64())}), dk)
    W.equality_delete_snapshot(evolved_root, dk, ts_ms=6000)
    W.rename_column(evolved_root, "id", "key", ts_ms=7000)
    df = read_table_evolved(spark, str(evolved_root))
    assert df.columns == ["key", "amount", "note"]
    rows = {r.key: (r.amount, r.note) for r in df.collect()}
    assert rows == {1: (10, None), 3: (30, "hi")}  # id=2 tombstoned

    # delete AFTER the rename, keyed under the NEW name: must reach
    # a.parquet (written with column 'id' int64) by field id
    dk2 = evolved_root / "data" / "ek2.parquet"
    pq.write_table(pa.table({"key": pa.array([1], pa.int64())}), dk2)
    W.equality_delete_snapshot(evolved_root, dk2, ts_ms=8000)
    rows = {r.key for r in read_table_evolved(spark, str(evolved_root)).collect()}
    assert rows == {3}

    # re-insert key=1 in a later commit: strictly-smaller-sequence rule
    f3 = evolved_root / "data" / "c.parquet"
    pq.write_table(
        pa.table(
            {
                "key": pa.array([1], pa.int64()),
                "amount": pa.array([100], pa.int64()),
                "note": ["back"],
            }
        ),
        f3,
    )
    W.append_snapshot(evolved_root, [f3], ts_ms=9000)
    rows = {r.key: r.amount for r in read_table_evolved(spark, str(evolved_root)).collect()}
    assert rows == {1: 100, 3: 30}


def test_evolved_read_delete_on_dropped_column_raises(evolved_root, spark):
    """A delete keyed on a column the current schema no longer carries
    cannot be resolved — the read must raise, not resurrect rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_table_evolved

    dk = evolved_root / "data" / "nk.parquet"
    pq.write_table(pa.table({"note": ["hi"]}), dk)
    W.equality_delete_snapshot(evolved_root, dk, ts_ms=6000)
    rows = {r.id for r in read_table_evolved(spark, str(evolved_root)).collect()}
    assert rows == {1, 2}  # note='hi' tombstones id 3
    W.drop_column(evolved_root, "note", ts_ms=7000)
    with _pytest.raises(ValueError, match="no longer carries"):
        read_table_evolved(spark, str(evolved_root)).collect()


def test_partition_spec_evolution_per_file_pruning(tmp_path):
    """PARTITION-SPEC EVOLUTION: files written under an older spec keep
    pruning under THEIR OWN spec after the table's default changes (each
    manifest entry records its spec_id; the planner resolves the tuple by
    it). Bucket transforms isolate the mechanism: column bounds of a
    bucket-pure file span the id range, so only the murmur bucket match
    can prune."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_scan_paths_pruned
    from tdigest_spark.sources.iceberg_partition import apply_transform

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    ids = list(range(200))

    def bucket_files(n_buckets, tag, id_subset):
        out = []
        for b in range(n_buckets):
            sub = [
                i for i in id_subset
                if apply_transform(f"bucket[{n_buckets}]", i) == b
            ]
            if not sub:
                continue
            f = root / "data" / f"{tag}-{b}.parquet"
            pq.write_table(
                pa.table({"doc_id": pa.array(sub, pa.int64())}), f
            )
            out.append(f)
        return out

    # generation 1: bucket[4], even ids
    W.set_partition_spec(root, [("doc_id", "bucket[4]")], ts_ms=1500)
    g1 = bucket_files(4, "g1", [i for i in ids if i % 2 == 0])
    W.append_snapshot(root, g1, snapshot_id=1, ts_ms=2000)
    # generation 2 (EVOLVED): bucket[16], odd ids
    W.set_partition_spec(root, [("doc_id", "bucket[16]")], ts_ms=2500)
    g2 = bucket_files(16, "g2", [i for i in ids if i % 2 == 1])
    W.append_snapshot(root, g2, snapshot_id=2, ts_ms=3000)

    for probe in (7, 42, 199, 100):
        want = {
            f"g1-{apply_transform('bucket[4]', probe)}.parquet",
            f"g2-{apply_transform('bucket[16]', probe)}.parquet",
        }
        kept, total = iceberg_scan_paths_pruned(
            str(root), [("doc_id", "==", probe)]
        )
        names = {p.rsplit("/", 1)[1] for p in kept}
        assert total == len(g1) + len(g2)
        # pruning power: nothing outside the two own-spec bucket matches
        assert names <= want, (probe, names)
        # correctness: the file actually holding the probe row survives
        holder = f"g{1 if probe % 2 == 0 else 2}-" + str(
            apply_transform(
                "bucket[4]" if probe % 2 == 0 else "bucket[16]", probe
            )
        ) + ".parquet"
        assert holder in names, (probe, names)


def test_delete_where_plans_prunes_and_commits(tmp_path, spark):
    """delete_where: stats-pruned planning (only candidate files read),
    matching positions committed as ONE MOR position-delete snapshot,
    no-match = no commit, and re-running is idempotent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_sequences

    root = tmp_path / "tbl"
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
    n, scanned, total = W.delete_where(root, [("v", "<", 45)])
    assert (n, scanned, total) == (15, 2, 4)  # ids 0..14 live in s0+s1
    got = sorted(r.id for r in read_sequences(spark, str(root)).collect())
    assert got == list(range(15, 40))
    # no-match predicate: nothing deleted, NO new snapshot committed
    before = len(W.snapshot_ids(root))
    n2, scanned2, _ = W.delete_where(root, [("v", ">", 10_000)])
    assert n2 == 0 and len(W.snapshot_ids(root)) == before
    # re-delete the same predicate: positions are a set — still 25 rows,
    # and n_deleted reports only NEWLY removed rows (0 here: every match
    # was already tombstoned by the first commit)
    n3, _, _ = W.delete_where(root, [("v", "<", 45)])
    assert n3 == 0
    assert read_sequences(spark, str(root)).count() == 25
    # partial overlap: v < 60 matches ids 0..19 but 0..14 are already
    # gone — only the 5 new rows count
    n4, _, _ = W.delete_where(root, [("v", "<", 60)])
    assert n4 == 5
    assert read_sequences(spark, str(root)).count() == 20


def test_rollback_and_wap_fast_forward(tmp_path):
    """rollback_to_snapshot: main points back, nothing deleted, the bad
    snapshot stays readable by id (rollback is reversible until
    expiration). fast_forward publishes a staged branch atomically;
    non-branch refs and unknown names are rejected."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_scan_paths_static

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    f1 = root / "data" / "a.parquet"
    pq.write_table(pa.table({"id": [1, 2]}), f1)
    s1 = W.append_snapshot(root, [f1], ts_ms=2000)
    f2 = root / "data" / "b.parquet"
    pq.write_table(pa.table({"id": [3]}), f2)
    s2 = W.append_snapshot(root, [f2], ts_ms=3000)
    W.rollback_to_snapshot(root, s1, ts_ms=3500)
    assert len(iceberg_scan_paths_static(str(root))) == 1
    assert len(iceberg_scan_paths_static(str(root), snapshot_id=s2)) == 2
    # roll forward again (rollback is itself reversible)
    W.rollback_to_snapshot(root, s2, ts_ms=3600)
    assert len(iceberg_scan_paths_static(str(root))) == 2
    with _pytest.raises(KeyError):
        W.rollback_to_snapshot(root, 999)
    # WAP: stage on a branch; main can't see it until fast_forward
    f3 = root / "data" / "c.parquet"
    pq.write_table(pa.table({"id": [4, 5]}), f3)
    W.append_snapshot(root, [f3], ts_ms=4000, branch="audit")
    assert len(iceberg_scan_paths_static(str(root))) == 2
    head = W.fast_forward(root, "audit", ts_ms=5000)
    assert len(iceberg_scan_paths_static(str(root))) == 3
    from tdigest_spark.sources.iceberg import current_metadata

    assert current_metadata(str(root))["current-snapshot-id"] == head
    W.create_ref(root, "pin", kind="tag", ts_ms=5500)
    with _pytest.raises(ValueError):
        W.fast_forward(root, "pin")
    with _pytest.raises(KeyError):
        W.fast_forward(root, "nope")


def test_fast_forward_refuses_diverged_main(tmp_path):
    """fast_forward must FAIL when main advanced after the branch forked
    (Iceberg's not-fast-forwardable rule): silently repointing would
    unpublish main's post-fork commits. Re-forking from the new head
    makes it publishable again."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_scan_paths_static

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    f1 = root / "data" / "a.parquet"
    pq.write_table(pa.table({"id": [1]}), f1)
    W.append_snapshot(root, [f1], ts_ms=2000)
    # fork a staging branch, then let main advance independently
    f2 = root / "data" / "b.parquet"
    pq.write_table(pa.table({"id": [2]}), f2)
    W.append_snapshot(root, [f2], ts_ms=3000, branch="stage")
    f3 = root / "data" / "c.parquet"
    pq.write_table(pa.table({"id": [3]}), f3)
    W.append_snapshot(root, [f3], ts_ms=4000)  # main moves past the fork
    with _pytest.raises(ValueError, match="not an ancestor"):
        W.fast_forward(root, "stage")
    # main unchanged by the refused publish
    assert len(iceberg_scan_paths_static(str(root))) == 2
    # staging on a fresh branch forked from the NEW main head publishes
    f4 = root / "data" / "d.parquet"
    pq.write_table(pa.table({"id": [4]}), f4)
    W.append_snapshot(root, [f4], ts_ms=5000, branch="stage2")
    W.fast_forward(root, "stage2", ts_ms=6000)
    assert len(iceberg_scan_paths_static(str(root))) == 3


def test_cherry_pick_publishes_onto_moved_main(tmp_path, spark):
    """cherry_pick_snapshot re-applies a staged APPEND onto a main that
    advanced after the fork (where fast_forward refuses): the published
    state is main's head + exactly the staged files, the branch history
    is untouched, and a second pick of the same snapshot refuses via the
    source-snapshot-id provenance stamp."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_sequences

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    f1 = root / "data" / "a.parquet"
    pq.write_table(pa.table({"k": [1, 2]}), f1)
    W.append_snapshot(root, [f1], ts_ms=2000)
    f2 = root / "data" / "staged.parquet"
    pq.write_table(pa.table({"k": [10, 11]}), f2)
    s_staged = W.append_snapshot(root, [f2], ts_ms=3000, branch="audit")
    f3 = root / "data" / "c.parquet"
    pq.write_table(pa.table({"k": [3]}), f3)
    W.append_snapshot(root, [f3], ts_ms=4000)  # main moves past the fork
    with _pytest.raises(ValueError, match="not an ancestor"):
        W.fast_forward(root, "audit")
    s_pub = W.cherry_pick_snapshot(root, s_staged, ts_ms=5000)

    def ks(sid=None):
        df = read_sequences(spark, str(root), snapshot_id=sid)
        return sorted(r["k"] for r in df.collect())

    assert ks() == [1, 2, 3, 10, 11]
    # the pick is a NEW snapshot; the staged one stays branch-only
    assert s_pub != s_staged
    assert ks(s_staged) == [1, 2, 10, 11]
    with _pytest.raises(ValueError, match="already published"):
        W.cherry_pick_snapshot(root, s_staged)


def test_cherry_pick_new_sequence_exempts_from_prior_deletes(
    tmp_path, spark
):
    """The re-applied entries carry a NEW sequence number: an equality
    delete committed on main AFTER the fork (seq strictly below the
    pick's) must NOT tombstone the cherry-picked rows — they are
    logically a fresh append. Carrying the branch-time sequence would
    resurrect the delete onto data it never saw."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_sequences

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    f1 = root / "data" / "a.parquet"
    pq.write_table(pa.table({"k": [1, 2]}), f1)
    W.append_snapshot(root, [f1], ts_ms=2000)
    f2 = root / "data" / "staged.parquet"
    pq.write_table(pa.table({"k": [2, 7]}), f2)
    s_staged = W.append_snapshot(root, [f2], ts_ms=3000, branch="audit")
    # main gains an eq-delete on k=2 AFTER the fork
    keys = root / "data" / "ed.parquet"
    pq.write_table(pa.table({"k": [2]}), keys)
    W.equality_delete_snapshot(root, keys, ts_ms=4000)
    W.cherry_pick_snapshot(root, s_staged, ts_ms=5000)
    rows = sorted(
        r["k"] for r in read_sequences(spark, str(root)).collect()
    )
    # original k=2 deleted; the cherry-picked k=2 (later sequence) lives
    assert rows == [1, 2, 7]


def test_cherry_pick_refusals(tmp_path):
    """Non-append operations and unknown ids refuse."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from tdigest_spark.sources import iceberg_write as W

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    f1 = root / "data" / "a.parquet"
    pq.write_table(pa.table({"k": [1]}), f1)
    W.append_snapshot(root, [f1], ts_ms=2000)
    f2 = root / "data" / "b.parquet"
    pq.write_table(pa.table({"k": [2]}), f2)
    s_ow = W.overwrite_snapshot(root, [f2], ts_ms=3000)
    with _pytest.raises(ValueError, match="only appends"):
        W.cherry_pick_snapshot(root, s_ow)
    with _pytest.raises(KeyError):
        W.cherry_pick_snapshot(root, 999)


def test_rewrite_manifests_consolidates_metadata(tmp_path, spark):
    """rewrite_manifests: a 6-commit table (4 appends + eq-delete +
    pos-delete = 6 manifest files) compacts to 2 manifests (data +
    deletes) in one metadata-only replace commit. Reads, stats pruning,
    incremental scans and time travel are IDENTICAL before/after; a
    following expiration reaps the 6 stale manifests while the table
    still reads the same."""
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import (
        iceberg_incremental_paths,
        iceberg_metadata_df,
        iceberg_scan_paths_pruned,
        read_sequences,
    )

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    for s in range(4):
        f = root / "data" / f"s{s}.parquet"
        pq.write_table(
            pa.table({"k": pa.array(range(s * 10, s * 10 + 10), pa.int64())}),
            f,
        )
        W.append_snapshot(root, [f], snapshot_id=s + 1, ts_ms=2000 + s)
    dk = root / "data" / "delk.parquet"
    pq.write_table(pa.table({"k": pa.array([5, 15], pa.int64())}), dk)
    W.equality_delete_snapshot(root, dk, snapshot_id=5, ts_ms=3000)
    W.delete_rows_snapshot(
        root, {str(root / "data" / "s2.parquet"): [0, 1]},
        snapshot_id=6, ts_ms=4000,
    )  # k=20,21 out

    def state():
        rows = sorted(r.k for r in read_sequences(spark, str(root)).collect())
        pruned = iceberg_scan_paths_pruned(str(root), [("k", "<", 15)])
        tt = sorted(
            r.k
            for r in read_sequences(spark, str(root), snapshot_id=2).collect()
        )
        inc = sorted(
            Path(p).name for p in iceberg_incremental_paths(str(root), 1, 4)
        )
        return rows, pruned, tt, inc

    before = state()
    assert before[0] == sorted(set(range(40)) - {5, 15, 20, 21})
    n_before, n_after = W.rewrite_manifests(root, ts_ms=5000)
    assert (n_before, n_after) == (6, 2)
    assert state() == before
    mdf = iceberg_metadata_df(spark, str(root), "manifests")
    assert mdf.count() == 2
    assert sorted(r.content for r in mdf.collect()) == [0, 1]
    # idempotent: nothing left to consolidate
    assert W.rewrite_manifests(root, ts_ms=6000) == (2, 2)
    # expiration reaps the stale manifests; reads unchanged
    meta_dir = root / "metadata"
    n_avro_before = len(list(meta_dir.glob("m-*.avro")))
    W.expire_snapshots(root, keep_last=1, ts_ms=7000)
    assert len(list(meta_dir.glob("m-*.avro"))) < n_avro_before
    rows = sorted(r.k for r in read_sequences(spark, str(root)).collect())
    assert rows == before[0]


def test_equality_deletes_survive_snapshot_expiration(tmp_path, spark):
    """Regression (found by the rewrite_manifests test): per-entry
    sequence numbers used to be DERIVED from the add-snapshot id, so
    expiring those snapshots collapsed every sequence to 0 and equality
    deletes silently stopped applying — deleted rows resurrected. The
    explicit spec-field sequence_number keeps MOR semantics intact after
    expiration, with no rewrite needed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_sequences

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    f1 = root / "data" / "a.parquet"
    pq.write_table(pa.table({"k": pa.array([1, 2, 3], pa.int64())}), f1)
    W.append_snapshot(root, [f1], ts_ms=2000)
    dk = root / "data" / "delk.parquet"
    pq.write_table(pa.table({"k": pa.array([2], pa.int64())}), dk)
    W.equality_delete_snapshot(root, dk, ts_ms=3000)
    f2 = root / "data" / "b.parquet"
    pq.write_table(pa.table({"k": pa.array([2, 4], pa.int64())}), f2)
    W.append_snapshot(root, [f2], ts_ms=4000)  # re-insert of k=2 survives
    assert sorted(
        r.k for r in read_sequences(spark, str(root)).collect()
    ) == [1, 2, 3, 4]
    W.expire_snapshots(root, keep_last=1, ts_ms=5000)
    assert sorted(
        r.k for r in read_sequences(spark, str(root)).collect()
    ) == [1, 2, 3, 4]


def test_rewrite_data_files_binpacks_and_applies_deletes(tmp_path, spark):
    """rewrite_data_files: small live files bin-pack into consolidated
    parquets committed at the NEW sequence — which is only sound because
    the rewrite reads its inputs through the MOR view (pos deletes
    subtracted, strictly-later eq deletes anti-joined). Reads are
    identical before/after; an eq-delete committed AFTER the compaction
    still applies to the consolidated file; time travel to the
    pre-compaction snapshot still sees the small files."""
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import (
        iceberg_metadata_df,
        read_sequences,
    )

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    for s in range(4):
        f = root / "data" / f"s{s}.parquet"
        pq.write_table(
            pa.table({"k": pa.array(range(s * 10, s * 10 + 10), pa.int64())}),
            f,
        )
        W.append_snapshot(root, [f], snapshot_id=s + 1, ts_ms=2000 + s)
    dk = root / "data" / "delk.parquet"
    pq.write_table(pa.table({"k": pa.array([5, 15], pa.int64())}), dk)
    W.equality_delete_snapshot(root, dk, snapshot_id=5, ts_ms=3000)
    W.delete_rows_snapshot(
        root, {str(root / "data" / "s2.parquet"): [0, 1]},
        snapshot_id=6, ts_ms=4000,
    )  # k=20,21 out
    expect = sorted(set(range(40)) - {5, 15, 20, 21})
    pre_snapshot = 6
    rep = W.rewrite_data_files(root, target_bytes=1 << 20, ts_ms=5000)
    assert rep["files_before"] == 4 and rep["files_written"] == 1
    assert rep["files_rewritten"] == 4 and rep["files_after"] == 1
    assert rep["rows_rewritten"] == len(expect)
    got = sorted(r.k for r in read_sequences(spark, str(root)).collect())
    assert got == expect
    # metadata agrees: one live data file, deletes carried
    fdf = iceberg_metadata_df(spark, str(root), "files")
    assert fdf.count() == 1
    # the compaction APPLIED the deletes, so they cannot resurrect even
    # though the consolidated file's sequence exceeds the delete's
    tt = sorted(
        r.k
        for r in read_sequences(
            spark, str(root), snapshot_id=pre_snapshot
        ).collect()
    )
    assert tt == expect  # time travel to the MOR view unchanged
    # an eq-delete committed AFTER compaction applies to the new file
    dk2 = root / "data" / "delk2.parquet"
    pq.write_table(pa.table({"k": pa.array([30], pa.int64())}), dk2)
    W.equality_delete_snapshot(root, dk2, ts_ms=6000)
    got2 = sorted(r.k for r in read_sequences(spark, str(root)).collect())
    assert got2 == sorted(set(expect) - {30})
    # idempotent: one live file >= nothing to bin-pack
    rep2 = W.rewrite_data_files(root, target_bytes=1 << 20, ts_ms=7000)
    assert rep2["files_rewritten"] == 0


def test_rewrite_data_files_respects_target_and_partitions(tmp_path, spark):
    """Bin capacity and grouping: files above target_bytes are never
    touched; candidates pack to <= target per bin; a lone small file in
    its group stays as-is."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import read_sequences

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    files = []
    for s in range(5):
        f = root / "data" / f"s{s}.parquet"
        n = 100_000 if s == 4 else 10  # s4 is the big file
        pq.write_table(
            pa.table({"k": pa.array(range(s * 1000, s * 1000 + n), pa.int64())}), f
        )
        files.append(f)
    W.append_snapshot(root, files, ts_ms=2000)
    big = (root / "data" / "s4.parquet").stat().st_size
    small = (root / "data" / "s0.parquet").stat().st_size
    # capacity fits the 4 small files but not the big one
    rep = W.rewrite_data_files(root, target_bytes=small * 4 + 64, ts_ms=3000)
    assert rep["files_rewritten"] == 4 and rep["files_written"] == 1
    assert rep["files_after"] == 2  # consolidated + untouched big file
    got = read_sequences(spark, str(root))
    assert got.count() == 40 + 100_000


def test_metadata_only_aggregates_exact_and_guarded(tmp_path, spark):
    """COUNT/MIN/MAX answered from manifest stats alone are exact on an
    append-only table, refuse MOR tables (a tombstoned row can carry the
    extremum), and recover after compaction folds the deletes in."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_metadata_aggregates

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    vals = [[5, 9, 2], [100, 7], [42]]
    for i, ks in enumerate(vals):
        f = root / "data" / f"f{i}.parquet"
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64()),
                      "x": pa.array([v / 2 for v in ks], pa.float64())}), f
        )
        W.append_snapshot(root, [f], ts_ms=2000 + i)
    agg = iceberg_metadata_aggregates(
        str(root), {"k": "long", "x": "double"}
    )
    assert agg == {
        "count": 6,
        "min": {"k": 2, "x": 1.0},
        "max": {"k": 100, "x": 50.0},
    }
    # a delete makes stats-only answers unsound: MIN k would still read 2
    W.delete_rows_snapshot(
        root, {str(root / "data" / "f0.parquet"): [2]}, ts_ms=5000
    )  # k=2 (the min) tombstoned
    with _pytest.raises(ValueError, match="merge-on-read"):
        iceberg_metadata_aggregates(str(root), {"k": "long"})
    # compaction applies the deletes; stats-only answers come back exact
    W.rewrite_data_files(root, target_bytes=1 << 20, ts_ms=6000)
    agg2 = iceberg_metadata_aggregates(str(root), {"k": "long"})
    assert agg2 == {"count": 5, "min": {"k": 5}, "max": {"k": 100}}


def test_rewrite_position_deletes_compacts_and_drops_dangling(tmp_path, spark):
    """rewrite_position_deletes: three small pos-delete files merge into
    ONE spec-shaped file; the merged rows dedupe on (path, pos) and drop
    DANGLING references (a delete row pointing at a data file that
    rewrite_data_files retired). Reads are identical before/after; time
    travel to the pre-compaction snapshot is untouched; a second call is
    a no-op (no empty commit)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import (
        iceberg_scan_entries_static,
        read_sequences,
    )

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000, schema_fields=[("k", "long"), ("g", "long")])
    W.set_partition_spec(root, [("g", "identity")], ts_ms=1500)
    spans = {"f0": (0, 10, 0), "f1": (10, 20, 1), "f2a": (20, 25, 2), "f2b": (25, 30, 2)}
    paths = {}
    for name, (lo, hi, g) in spans.items():
        f = root / "data" / f"{name}.parquet"
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(range(lo, hi), pa.int64()),
                    "g": pa.array([g] * (hi - lo), pa.int64()),
                }
            ),
            f,
        )
        paths[name] = f
    W.append_snapshot(root, list(paths.values()), snapshot_id=1, ts_ms=2000)
    W.delete_rows_snapshot(root, {str(paths["f0"]): [0, 1]}, snapshot_id=2, ts_ms=3000)
    W.delete_rows_snapshot(
        root, {str(paths["f1"]): [0], str(paths["f2a"]): [0]},
        snapshot_id=3, ts_ms=4000,
    )
    # duplicate (f0, 1) plus a new (f0, 2)
    W.delete_rows_snapshot(root, {str(paths["f0"]): [1, 2]}, snapshot_id=4, ts_ms=5000)
    # only the g=2 bin has >= 2 files: f2a+f2b consolidate (k=20 dropped
    # at rewrite via MOR); f0/f1 singleton bins untouched, so their
    # delete rows stay live while the f2a reference dangles
    rep = W.rewrite_data_files(root, ts_ms=6000)
    assert rep["files_rewritten"] == 2 and rep["files_written"] == 1
    pre_snapshot_rows = sorted(r.k for r in read_sequences(spark, str(root)).collect())
    expect = sorted(set(range(30)) - {0, 1, 2, 10, 20})
    assert pre_snapshot_rows == expect
    nb, na, rb, ra = W.rewrite_position_deletes(root, ts_ms=7000)
    assert (nb, na, rb, ra) == (3, 1, 6, 4)
    entries = iceberg_scan_entries_static(str(root))
    assert len(entries["pos_deletes"]) == 1
    merged = pq.read_table(entries["pos_deletes"][0]["path"])
    assert merged.num_rows == 4
    got = sorted(r.k for r in read_sequences(spark, str(root)).collect())
    assert got == expect
    # idempotent: already one compact file with zero dangling rows
    v_before = (root / "metadata" / "version-hint.text").read_text()
    assert W.rewrite_position_deletes(root, ts_ms=8000) == (1, 1, 4, 4)
    assert (root / "metadata" / "version-hint.text").read_text() == v_before
    # time travel: the pre-compaction MOR view is untouched
    tt = sorted(r.k for r in read_sequences(spark, str(root), snapshot_id=4).collect())
    assert tt == expect


def test_rewrite_position_deletes_all_dangling_drops_entry(tmp_path, spark):
    """When every delete row dangles (the referenced path is not in the
    live data set — a retired file or an external writer's mistake), the
    compaction drops the pos-delete entry entirely — no zero-row delete
    file is written. (A fully-dangling file normally dies in
    rewrite_data_files' entry-level GC; this covers the row-level path.)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import (
        iceberg_scan_entries_static,
        read_sequences,
    )

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    f = root / "data" / "a.parquet"
    pq.write_table(pa.table({"k": pa.array([1, 2, 3], pa.int64())}), f)
    W.append_snapshot(root, [f], snapshot_id=1, ts_ms=2000)
    ghost = root / "data" / "never-committed.parquet"
    pq.write_table(pa.table({"k": pa.array([9], pa.int64())}), ghost)
    W.delete_rows_snapshot(root, {str(ghost): [0]}, snapshot_id=2, ts_ms=3000)
    assert W.rewrite_position_deletes(root, ts_ms=4000) == (1, 0, 1, 0)
    entries = iceberg_scan_entries_static(str(root))
    assert entries["pos_deletes"] == []
    assert sorted(r.k for r in read_sequences(spark, str(root)).collect()) == [1, 2, 3]


def test_ref_max_age_retention(table_root):
    """max-ref-age-ms ref retention: a capped ref survives expiration
    inside its age, is REMOVED past it (same commit — metadata version
    advances even when no snapshot expires), un-pinning its snapshot;
    capless refs never age; dry_run removes nothing; age measures from
    the REFERENCED snapshot's timestamp, not the ref's creation time."""
    from tdigest_spark.sources import iceberg_write as W
    from tdigest_spark.sources.iceberg import iceberg_ref_snapshot

    f_a = _pq(table_root / "data" / "a.parquet", [1])
    f_b = _pq(table_root / "data" / "b.parquet", [2])
    s1 = W.append_snapshot(table_root, [f_a], ts_ms=2000)
    s2 = W.append_snapshot(table_root, [f_b], ts_ms=3000)
    # capped ref created LATE (ts 4100) on the OLD snapshot: age anchors
    # to s1's commit (2000), not ref creation
    W.create_ref(table_root, "nightly", snapshot_id=s1, ts_ms=4100,
                 max_ref_age_ms=3000)
    W.create_ref(table_root, "release", snapshot_id=s1, ts_ms=4200)
    # inside the cap (age 2400): nothing removed, nothing expired
    rep = W.expire_snapshots(table_root, keep_last=1, ts_ms=4400)
    assert rep["removed_refs"] == [] and rep["expired"] == []
    # past the cap, dry run: reports the would-be removal, commits nothing
    rep = W.expire_snapshots(table_root, keep_last=1, ts_ms=6000,
                             dry_run=True)
    assert rep["removed_refs"] == ["nightly"]
    assert iceberg_ref_snapshot(str(table_root), "nightly") == s1
    # past the cap for real: ref gone; s1 still PINNED by capless release
    rep = W.expire_snapshots(table_root, keep_last=1, ts_ms=6000)
    assert rep["removed_refs"] == ["nightly"] and rep["expired"] == []
    with pytest.raises(KeyError):
        iceberg_ref_snapshot(str(table_root), "nightly")
    assert iceberg_ref_snapshot(str(table_root), "release") == s1
    # drop the capless ref -> s1 finally expires
    W.drop_ref(table_root, "release", ts_ms=6100)
    rep = W.expire_snapshots(table_root, keep_last=1, ts_ms=6200)
    assert rep["expired"] == [s1]
    assert W.snapshot_ids(table_root) == [s2]


def test_create_ref_rejects_nonpositive_age(table_root):
    from tdigest_spark.sources import iceberg_write as W

    W.append_snapshot(table_root, [_pq(table_root / "data" / "a.parquet", [1])])
    with pytest.raises(ValueError, match="positive"):
        W.create_ref(table_root, "bad", max_ref_age_ms=0)
