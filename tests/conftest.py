import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from tdigest_spark.sources.tables import get_spark

    s = get_spark(master="local[4]", app_name="tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def seq_table(spark):
    """Small deterministic sequence table (FIXTURES.md 'tiny'/'small')."""
    from tdigest_spark.sources.sequence_table import (
        default_cache_dir,
        generate_sequence_table,
    )

    path = generate_sequence_table(
        default_cache_dir() / "test_n20000", n_rows=20_000, seed=42,
        rows_per_file=5_000,
    )
    return spark.read.parquet(str(path))


@pytest.fixture(scope="session")
def sf_tables(spark):
    from tdigest_spark.sources.tables import register_views

    return register_views(spark, SF_DIR)
