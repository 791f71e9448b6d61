"""Z-order clustering (plans/zorder.py): a range filter on EITHER z-ordered
column prunes row groups from parquet footer stats, where a single-column
sorted layout only prunes its own sort column — the multi-dimensional
data-skipping property that motivates the layout."""

import numpy as np
import pyarrow.dataset as pads
from pyspark.sql import functions as F

from tdigest_spark.plans.partitioned import write_sorted
from tdigest_spark.plans.zorder import write_zordered, zorder_key


def _row_groups(path, flt=None):
    ds = pads.dataset(path, format="parquet")
    total = kept = 0
    for frag in ds.get_fragments():
        total += frag.metadata.num_row_groups
        if flt is not None:
            kept += len(list(frag.split_by_row_group(flt)))
    return total, kept


def test_zorder_key_is_morton_interleave(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int"
    )
    bounds = {"x": (0.0, 4.0), "y": (0.0, 4.0)}
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", zorder_key(["x", "y"], bounds, bits=2)
        ).collect()
    }

    def morton(a, b):
        z = 0
        for bit in range(2):
            z |= ((a >> bit) & 1) << (2 * bit)
            z |= ((b >> bit) & 1) << (2 * bit + 1)
        return z

    # width_bucket with bounds (0,4) and 4 buckets maps value v to bucket v
    assert got == {(x, y): morton(x, y) for x in range(4) for y in range(4)}


def test_zorder_prunes_both_filter_columns(spark, tmp_path):
    rng = np.random.default_rng(3)
    n = 60_000
    pdf_rows = list(
        zip(
            rng.uniform(0, 1000, n).tolist(),
            rng.uniform(0, 1000, n).tolist(),
        )
    )
    df = spark.createDataFrame(pdf_rows, "a double, b double")
    zpath = str(tmp_path / "z")
    apath = str(tmp_path / "sorted_a")
    write_zordered(df, zpath, ["a", "b"], bits=8, n_files=16)
    write_sorted(df, apath, ["a"], n_files=16)

    flt_a = pads.field("a") < 50.0
    flt_b = pads.field("b") < 50.0

    tot_z, kept_za = _row_groups(zpath, flt_a)
    _, kept_zb = _row_groups(zpath, flt_b)
    tot_a, kept_aa = _row_groups(apath, flt_a)
    _, kept_ab = _row_groups(apath, flt_b)
    assert tot_z > 4 and tot_a > 4

    # sorted-by-a: prunes a-filters, powerless on b
    assert kept_aa < tot_a
    assert kept_ab == tot_a
    # z-order: prunes BOTH
    assert kept_za < tot_z
    assert kept_zb < tot_z

    # correctness: pruned reads return exactly the matching rows
    n_a = df.where(F.col("a") < 50.0).count()
    n_b = df.where(F.col("b") < 50.0).count()
    ds = pads.dataset(zpath, format="parquet")
    assert ds.to_table(filter=flt_a).num_rows == n_a
    assert ds.to_table(filter=flt_b).num_rows == n_b
    # layout round-trips all rows
    assert spark.read.parquet(zpath).count() == n


def test_zorder_constant_column_and_errors(spark, tmp_path):
    import pytest

    df = spark.createDataFrame(
        [(float(i), 7.0) for i in range(100)], "a double, c double"
    )
    # constant column contributes nothing but must not break the write
    p = str(tmp_path / "zc")
    write_zordered(df, p, ["a", "c"], bits=4, n_files=2)
    assert spark.read.parquet(p).count() == 100

    with pytest.raises(ValueError, match="64-bit"):
        zorder_key(["a", "b"], {"a": (0, 1), "b": (0, 1)}, bits=32)
    with pytest.raises(ValueError, match="empty|null"):
        write_zordered(
            spark.createDataFrame([], "a double, b double"),
            str(tmp_path / "ze"),
            ["a", "b"],
        )
