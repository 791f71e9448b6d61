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
