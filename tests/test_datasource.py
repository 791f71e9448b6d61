"""Python Data Source API surface for the static Iceberg reader
(sources/datasource.py): registration, schema inference, filter pushdown
that PRUNES InputPartitions via manifest stats, residual row-level
filtering, and snapshot time travel through the option."""

import datetime

import pytest


def _write(root, name, col, values, **extra):
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = {col: values}
    cols.update(extra)
    f = root / "data" / name
    pq.write_table(pa.table(cols), f)
    return f


@pytest.fixture()
def table_root(tmp_path):
    from tdigest_spark.sources import iceberg_write as W

    root = tmp_path / "tbl"
    W.create_table(root, ts_ms=1000)
    return root


@pytest.fixture()
def registered(spark):
    from tdigest_spark.sources.datasource import IcebergStaticDataSource

    spark.dataSource.register(IcebergStaticDataSource)
    return spark


def test_full_read_matches_parquet_union(table_root, registered):
    from tdigest_spark.sources import iceberg_write as W

    files = [
        _write(table_root, f"f{i}.parquet", "v", list(range(i * 10, i * 10 + 10)))
        for i in range(3)
    ]
    W.append_snapshot(table_root, files, ts_ms=2000)
    df = registered.read.format("iceberg_static").option("path", str(table_root)).load()
    assert df.schema.simpleString() == "struct<v:bigint>"
    assert sorted(r.v for r in df.collect()) == list(range(30))
    # one InputPartition per data file
    assert df.rdd.getNumPartitions() == 3


def test_filter_pushdown_prunes_partitions_and_stays_exact(table_root, registered):
    """The pushed range filter must shrink the PARTITION count (planning-
    level manifest pruning) while the residual row-level filter keeps the
    result exact across a file boundary the range cuts through."""
    from tdigest_spark.sources import iceberg_write as W

    files = [
        _write(table_root, f"g{i}.parquet", "v", list(range(i * 100, i * 100 + 100)))
        for i in range(4)
    ]
    W.append_snapshot(table_root, files, ts_ms=2000)
    load = lambda: (
        registered.read.format("iceberg_static")
        .option("path", str(table_root))
        .load()
    )
    filtered = load().where("v >= 150 AND v < 310")
    # files g0 (0..99) and g3 (300..399 upper part) — g3 survives (300<310)
    assert filtered.rdd.getNumPartitions() == 3 < load().rdd.getNumPartitions() == 4
    # 150 and 310 both cut inside surviving files: residual must trim rows
    assert sorted(r.v for r in filtered.collect()) == list(range(150, 310))
    # equality predicate prunes to exactly one file
    one = load().where("v = 250")
    assert one.rdd.getNumPartitions() == 1
    assert [r.v for r in one.collect()] == [250]


def test_timestamp_pushdown_prunes(table_root, registered):
    from tdigest_spark.sources import iceberg_write as W

    files = [
        _write(
            table_root,
            f"t{i}.parquet",
            "ts",
            [datetime.datetime(2001, 1 + i, 1 + j) for j in range(5)],
        )
        for i in range(5)
    ]
    W.append_snapshot(table_root, files, ts_ms=2000)
    df = (
        registered.read.format("iceberg_static")
        .option("path", str(table_root))
        .load()
        .where("ts >= TIMESTAMP '2001-04-01'")
    )
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 10


def test_snapshot_id_option_time_travels(table_root, registered):
    from tdigest_spark.sources import iceberg_write as W

    W.append_snapshot(
        table_root,
        [_write(table_root, "a.parquet", "v", [1, 2])],
        snapshot_id=11,
        ts_ms=2000,
    )
    W.append_snapshot(
        table_root,
        [_write(table_root, "b.parquet", "v", [3, 4])],
        snapshot_id=22,
        ts_ms=3000,
    )
    load = lambda sid: (
        registered.read.format("iceberg_static")
        .option("path", str(table_root))
        .option("snapshot_id", str(sid))
        .load()
    )
    assert sorted(r.v for r in load(11).collect()) == [1, 2]
    assert sorted(r.v for r in load(22).collect()) == [1, 2, 3, 4]


def test_missing_path_and_non_iceberg_root_raise(registered, tmp_path):
    with pytest.raises(Exception):
        registered.read.format("iceberg_static").load().collect()
    with pytest.raises(Exception):
        (
            registered.read.format("iceberg_static")
            .option("path", str(tmp_path / "nope"))
            .load()
            .collect()
        )


def test_arrow_schema_to_ddl_type_coverage():
    import pyarrow as pa

    from tdigest_spark.sources.datasource import arrow_schema_to_ddl

    schema = pa.schema(
        [
            ("a", pa.int64()),
            ("b", pa.int32()),
            ("c", pa.float64()),
            ("d", pa.string()),
            ("e", pa.bool_()),
            ("f", pa.binary()),
            ("g", pa.timestamp("us")),
            ("h", pa.timestamp("us", tz="UTC")),
            ("i", pa.date32()),
            ("j", pa.list_(pa.int32())),
        ]
    )
    assert arrow_schema_to_ddl(schema) == (
        "a long, b int, c double, d string, e boolean, f binary, "
        "g timestamp_ntz, h timestamp, i date, j array<int>"
    )
    with pytest.raises(TypeError):
        arrow_schema_to_ddl(pa.schema([("k", pa.decimal128(10, 2))]))
