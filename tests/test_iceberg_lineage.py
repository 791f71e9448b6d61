"""Iceberg v3 row lineage: first-row-id assignment at append, stable
``_row_id`` identity under deletes, and lineage MATERIALIZATION on
compaction (the spec rule — position arithmetic cannot survive a
rewrite). Semantics reference: Apache Iceberg v3 table spec (public
docs) — row lineage, next-row-id, first-row-id, lineage preservation."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tdigest_spark.sources import iceberg_write as W
from tdigest_spark.sources.iceberg import (
    current_metadata,
    iceberg_scan_entries_static,
    read_with_lineage,
)


def _table(tmp_path, lineage=True):
    root = tmp_path / "lintbl"
    W.create_table(root, ts_ms=1000, row_lineage=lineage)
    files = []
    for i in range(2):
        ids = range(i * 10, (i + 1) * 10)
        t = pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "v": pa.array([x * 10 for x in ids], pa.int64()),
            }
        )
        f = root / "data" / f"f{i}.parquet"
        pq.write_table(t, f)
        files.append(f)
    W.append_snapshot(root, files, snapshot_id=1, ts_ms=2000)
    return root


def test_lineage_assignment_advances(tmp_path):
    root = _table(tmp_path)
    t = pa.table(
        {
            "id": pa.array(range(20, 25), pa.int64()),
            "v": pa.array([x * 10 for x in range(20, 25)], pa.int64()),
        }
    )
    f = root / "data" / "f2.parquet"
    pq.write_table(t, f)
    W.append_snapshot(root, [f], snapshot_id=2, ts_ms=3000)
    e = iceberg_scan_entries_static(str(root))
    firsts = sorted(
        (x["path"].rsplit("/", 1)[-1], x["first_row_id"]) for x in e["data"]
    )
    assert firsts == [
        ("f0.parquet", 0),
        ("f1.parquet", 10),
        ("f2.parquet", 20),
    ]
    assert current_metadata(str(root))["next-row-id"] == 25


def test_lineage_stable_under_delete_and_compaction(tmp_path, spark):
    root = _table(tmp_path)
    W.delete_where_dv(root, [("v", "<", 60)], snapshot_id=2, ts_ms=3000)
    df = read_with_lineage(spark, str(root))
    rows = sorted(
        (r.id, r._row_id, r._last_updated_sequence_number)
        for r in df.collect()
    )
    # ids 0..5 deleted; survivors keep _row_id == id (single ordered
    # append makes them coincide) at the append's sequence 1
    assert rows == [(i, i, 1) for i in range(6, 20)]
    rep = W.rewrite_data_files(root, ts_ms=4000)
    assert rep["files_rewritten"] == 2
    # the compacted file carries MATERIALIZED lineage columns
    e = iceberg_scan_entries_static(str(root))
    assert len(e["data"]) == 1 and e["data"][0]["first_row_id"] is None
    cols = pq.read_schema(e["data"][0]["path"]).names
    assert "_row_id" in cols and "_last_updated_sequence_number" in cols
    rows2 = sorted(
        (r.id, r._row_id, r._last_updated_sequence_number)
        for r in read_with_lineage(spark, str(root)).collect()
    )
    assert rows2 == rows


def test_update_where_refuses_lineage_tables(tmp_path):
    root = _table(tmp_path)
    with pytest.raises(NotImplementedError, match="lineage"):
        W.update_where(root, [("v", "<", 30)], [("v", "set", 0)])


def test_read_with_lineage_requires_assignment(tmp_path, spark):
    root = _table(tmp_path, lineage=False)
    with pytest.raises(ValueError, match="row_lineage"):
        read_with_lineage(spark, str(root)).collect()
