"""Relational custom-operator unit tests: as-of join null semantics,
Bloom semi-join with same-named keys and nullable keys."""

import pyspark.sql.functions as F

from tdigest_spark.operators.relational import asof_join, bloom_semi_join


def test_asof_join_carries_null_right_values(spark):
    """The most recent right row wins even when its value IS null — an
    older non-null value must not leak forward past it."""
    left = spark.createDataFrame(
        [(1, 3.0), (1, 1.5)], "uid long, ts double"
    )
    right = spark.createDataFrame(
        [(1, 1.0, 5.0), (1, 2.0, None)], "uid long, ts double, v double"
    )
    got = {
        r.ts: r.asof_v
        for r in asof_join(left, right, "ts", "uid", ["v"]).collect()
    }
    assert got[1.5] == 5.0  # only the ts=1 row is visible
    assert got[3.0] is None  # ts=2 row is most recent; its value is null


def test_asof_join_no_right_row_yet(spark):
    left = spark.createDataFrame([(1, 0.5)], "uid long, ts double")
    right = spark.createDataFrame([(1, 1.0, 9.0)], "uid long, ts double, v double")
    [r] = asof_join(left, right, "ts", "uid", ["v"]).collect()
    assert r.asof_v is None


def test_bloom_semi_join_same_key_name(spark):
    """Both sides using the same key column name must not raise
    AMBIGUOUS_REFERENCE; nullable left keys are pruned, not crashed on."""
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "d")], "k long, payload string"
    )
    right = spark.createDataFrame([(1,), (3,)], "k long")
    got = sorted(
        r.payload
        for r in bloom_semi_join(left, "k", right, "k", 1000, 0.01).collect()
    )
    assert got == ["a", "c"]
