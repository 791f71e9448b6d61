"""`iceberg_static` — a PySpark (4.x) Python Data Source for this repo's
static Iceberg tables.

The static reader (sources/iceberg.py) plans scans from manifest metadata
in pure Python. This module surfaces it through Spark's OWN extension
point — the Python Data Source API — so a static Iceberg table reads as

    spark.dataSource.register(IcebergStaticDataSource)
    spark.read.format("iceberg_static").option("path", root).load()

with the two halves in their proper places:

* **planning** (driver): ``pushFilters`` captures the query's comparison
  predicates, ``partitions()`` turns them into a FILE-PRUNED scan plan via
  ``iceberg_scan_paths_pruned`` (manifest column stats + hidden-partition
  transforms — no parquet footer opened), one InputPartition per surviving
  data file, so Spark's task count is the pruned file count;
* **execution** (workers): ``read()`` streams each file's row groups as
  Arrow RecordBatches via pyarrow (``use_threads=False`` — a per-process
  default thread pool inside ~cores concurrent python workers is cores²
  runnable threads, CLAUDE.md), Spark's Arrow ingestion takes them
  zero-copy.

Every captured filter is ALSO returned as residual (the API's partial-
pushdown contract): pruning is planning-level only, Spark re-evaluates the
predicate row-level — the same split a production engine uses, and the
reason pruning can never change results. Snapshot pinning: ``partitions()``
resolves the snapshot AT PLAN TIME, so a concurrent commit between plan
and execution cannot tear the read (options: ``snapshot_id`` time-travels
explicitly).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

__all__ = ["IcebergStaticDataSource", "arrow_schema_to_ddl"]

_OPS = {
    EqualTo: "==",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}


def arrow_schema_to_ddl(schema) -> str:
    """Spark DDL string for a parquet/Arrow schema (the subset of types
    this repo's tables use; extend as needed)."""
    import pyarrow as pa

    def one(t) -> str:
        if pa.types.is_int64(t):
            return "long"
        if pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
            return "int"
        if pa.types.is_float64(t):
            return "double"
        if pa.types.is_float32(t):
            return "float"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "string"
        if pa.types.is_boolean(t):
            return "boolean"
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return "binary"
        if pa.types.is_timestamp(t):
            return "timestamp_ntz" if t.tz is None else "timestamp"
        if pa.types.is_date(t):
            return "date"
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return f"array<{one(t.value_type)}>"
        raise TypeError(f"unsupported arrow type {t}")

    return ", ".join(f"{f.name} {one(f.type)}" for f in schema)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _StaticIcebergReader(DataSourceReader):
    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("iceberg_static requires .option('path', <table root>)")
        sid = options.get("snapshot_id")
        self.snapshot_id = int(sid) if sid is not None else None
        self.predicates: list[tuple] = []

    def pushFilters(self, filters):
        from .iceberg import current_metadata

        # only prune on types the bounds encode; schema lookup mirrors the
        # planner's own coercion guard (which runs again downstream)
        _ = current_metadata(self.root)  # fail fast on a non-Iceberg path
        for f in filters:
            op = _OPS.get(type(f))
            col = getattr(f, "attribute", None)
            val = getattr(f, "value", None)
            if op is not None and col is not None and len(col) == 1:
                self.predicates.append((col[0], op, val))
            # EVERY filter (captured or not) stays residual: pruning is
            # planning-level, Spark re-evaluates row-level
            yield f

    def partitions(self):
        from .iceberg import iceberg_scan_paths_pruned

        paths, _total = iceberg_scan_paths_pruned(
            self.root, self.predicates, snapshot_id=self.snapshot_id
        )
        return [_FilePartition(p) for p in paths]

    def read(self, partition):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        for batch in pf.iter_batches(use_threads=False):
            yield batch


class IcebergStaticDataSource(DataSource):
    """spark.read.format("iceberg_static").option("path", root).load()"""

    @classmethod
    def name(cls) -> str:
        return "iceberg_static"

    def schema(self) -> str:
        import pyarrow.parquet as pq

        from .iceberg import iceberg_scan_paths_static

        root = self.options.get("path")
        if not root:
            raise ValueError("iceberg_static requires .option('path', <table root>)")
        sid = self.options.get("snapshot_id")
        paths = iceberg_scan_paths_static(
            root, snapshot_id=int(sid) if sid is not None else None
        )
        if not paths:
            raise ValueError(f"Iceberg table {root!r} has no data files")
        return arrow_schema_to_ddl(pq.read_schema(paths[0]))

    def reader(self, schema) -> DataSourceReader:
        return _StaticIcebergReader(self.options)
