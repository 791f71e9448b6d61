"""Bucketed co-located joins: the write-once-shuffle-never layout must
actually eliminate the Exchange (plans/bucketing.py)."""

import pytest
from pyspark.sql import functions as F

from tdigest_spark.plans.bucketing import bucketed_join, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force a shuffle-based join so the test proves bucketing (a
    broadcast join has no exchange to eliminate)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucketed_join_has_no_exchange(spark, no_broadcast, tmp_path):
    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(0, 2000, 2).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("rv")
    )
    try:
        write_bucketed(left, "bkt_left", "k", n_buckets=4)
        write_bucketed(right, "bkt_right", "k", n_buckets=4)

        joined = bucketed_join(spark, "bkt_left", "bkt_right", "k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan

        # the unbucketed control join DOES shuffle — proves the assertion
        # above is meaningful, not an artifact of data size
        control = left.join(right, "k")
        control.count()
        cplan = control._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in cplan, cplan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_bucketed_groupby_has_no_exchange(spark, no_broadcast):
    df = spark.range(0, 5000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    try:
        write_bucketed(df, "bkt_agg", "k", n_buckets=4)
        agg = spark.table("bkt_agg").groupBy("k").agg(F.sum("v").alias("s"))
        assert agg.count() == 100
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_agg")
