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


def test_aqe_skew_join_split(spark):
    """The OTHER half of the skew-join story: for plain sort-merge joins
    AQE itself splits oversized shuffle partitions at runtime (no salting
    needed) — visible as skew=true on the executed SMJ node. salted_join
    remains for the shapes AQE cannot see (custom downstream stages,
    shuffled-hash joins)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # thresholds scaled to the test's shuffle: column pruning drops
        # everything but the ~5-byte join key before the exchange, and the
        # shuffle is lz4-compressed, so the hot partition is only tens of
        # KB here (at production scale the defaults, 256MB/5x, play the
        # same role)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0"
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        fact = spark.range(120_000).select(
            F.when(F.col("id") % 10 < 9, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 29).cast("string")))
            .alias("k"),
        )
        dim = spark.createDataFrame(
            [("hot", 1.0)] + [(f"k{i}", float(i) + 100.0) for i in range(29)],
            "k string, w double",
        )
        # aggregate on the DIM attribute, not the join key: a groupBy on k
        # would reuse the join's hash partitioning, and AQE refuses to
        # split skewed partitions whose partitioning a downstream operator
        # still requires
        out = fact.join(dim.hint("merge"), "k").groupBy("w").agg(
            F.count(F.lit(1)).alias("n")
        )
        rows = {r.w: r.n for r in out.collect()}
        assert rows[1.0] == 108_000  # values unaffected by the split
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_rejects_unsupported_how(spark):
    import pytest

    with pytest.raises(ValueError, match="inner.*left|how="):
        salted_join(_fact(spark), _dim(spark), ["k"], how="full")
