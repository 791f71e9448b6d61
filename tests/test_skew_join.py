"""Skew-safe salted shuffle join (plans/skew.salted_join): correctness
(result == the plain join, for inner and left) and the skew property that
motivates it — the hot key's fact rows land in multiple shuffle partitions
under the salted key, where the unsalted key sends them all to one task."""

from pyspark.sql import functions as F

from tdigest_spark.plans.skew import salted_join


def _fact(spark, n=4000):
    # ~75% of rows share key 'hot' — the straggler shape
    return spark.range(n).select(
        F.when(F.col("id") % 4 < 3, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 13).cast("double").alias("v"),
    )


def _dim(spark):
    rows = [("hot", 10.0)] + [(f"k{i}", float(i % 5)) for i in range(97)]
    return spark.createDataFrame(rows, "k string, w double")


def test_salted_join_equals_plain_join(spark):
    fact, dim = _fact(spark), _dim(spark)
    got = salted_join(fact, dim, ["k"], n_salts=8, salt_from=["row_id"])
    want = fact.join(dim, "k")
    cols = ["k", "row_id", "v", "w"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )


def test_salted_left_join_keeps_unmatched_fact_rows(spark):
    fact = _fact(spark)
    dim = _dim(spark).where(F.col("k") != "hot")  # hot is unmatched
    got = salted_join(fact, dim, ["k"], n_salts=4, salt_from=["row_id"], how="left")
    want = fact.join(dim, "k", "left")
    assert got.count() == want.count() == fact.count()
    assert (
        got.where(F.col("k") == "hot").where(F.col("w").isNotNull()).count()
        == 0
    )


def test_salted_key_spreads_hot_rows_across_partitions(spark):
    """Under hash partitioning on the bare key the hot key is ONE task;
    on (key, salt) its rows occupy (close to) n_salts partitions."""
    fact = _fact(spark)
    n_salts = 8
    salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64("row_id"), F.lit(n_salts)).cast("int")
    )

    def hot_partitions(df, *cols):
        parts = (
            df.repartition(32, *[F.col(c) for c in cols])
            .where(F.col("k") == "hot")
            .select(F.spark_partition_id().alias("pid"))
            .distinct()
            .count()
        )
        return parts

    assert hot_partitions(fact, "k") == 1
    spread = hot_partitions(salted, "k", "_salt")
    # 8 (key, salt) pairs hash into 32 partitions — birthday collisions make
    # exactly-8 unlikely; the skew property is spread >> 1, one task never
    # holds the hot key's full payload
    assert spread >= n_salts // 2


def test_salted_join_rejects_unsupported_how(spark):
    import pytest

    with pytest.raises(ValueError, match="inner.*left|how="):
        salted_join(_fact(spark), _dim(spark), ["k"], how="full")
