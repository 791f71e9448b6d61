"""Iceberg-aware sequence-table source.

north_rule targets Iceberg tables of pre-tokenized sequences. This sandbox
ships no Iceberg runtime jars, so the loader is capability-gated: when the
session has an Iceberg catalog configured it reads through it (getting
snapshot isolation, hidden partitioning, and metadata-pruned scans); else
it falls back to the parquet directory layout used everywhere in this repo.

The scan-in-worker fast path composes with Iceberg too: Iceberg's planned
file-scan tasks expose (file, start, length) splits whose data files are
plain parquet — `iceberg_scan_paths` extracts them so
`operators.scan.build_sketches_scan` can read row groups directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["has_iceberg", "read_sequences", "iceberg_scan_paths"]


def has_iceberg(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog is on the classpath + configured."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        return False
    confs = spark.sparkContext.getConf().getAll()
    # require a catalog whose implementation IS Iceberg: any non-Iceberg
    # spark.sql.catalog.* entry (e.g. Delta's) with Iceberg jars merely on
    # the classpath must not reroute plain table names to the iceberg reader
    return any(
        k.startswith("spark.sql.catalog.") and "iceberg" in v.lower()
        for k, v in confs
    )


def read_sequences(spark: SparkSession, source: str) -> DataFrame:
    """Load the sequence table from an Iceberg identifier (``cat.db.tbl``)
    when available, else from a parquet path."""
    if "/" not in source and has_iceberg(spark):
        return spark.read.format("iceberg").load(source)
    return spark.read.parquet(source)


def iceberg_scan_paths(spark: SparkSession, identifier: str) -> list[str]:
    """Data-file paths of the table's current snapshot (for the
    scan-in-worker fast path). Requires an Iceberg catalog."""
    if not has_iceberg(spark):
        raise RuntimeError("no Iceberg catalog configured in this session")
    files = spark.read.format("iceberg").load(f"{identifier}.files")
    return [r["file_path"] for r in files.select("file_path").collect()]
