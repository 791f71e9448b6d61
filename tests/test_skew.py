"""Skew handling (plans/skew.py + grouped build shuffle shape)."""

import numpy as np
from pyspark.sql import functions as F

from tdigest_spark.operators.aggregate import TDIGEST, build_sketch_grouped
from tdigest_spark.plans.skew import salted_repartition, skew_report
from tdigest_spark.sketch.tdigest import TDigest
from tdigest_spark.sources.sequence_table import (
    default_cache_dir,
    generate_sequence_table,
)


def _seq(spark):
    path = generate_sequence_table(
        default_cache_dir() / "skewtest_n20000",
        n_rows=20_000,
        seed=29,
        rows_per_file=2_500,
    )
    return spark.read.parquet(str(path))


def test_source_mix_is_skewed(spark):
    rep = skew_report(_seq(spark), "source").collect()
    top = rep[0]
    assert top["key"] == "web"
    assert top["share"] > 0.6
    assert top["imbalance"] > 3  # hot key >> uniform share


def test_salted_repartition_balances_hot_key(spark):
    df = _seq(spark).where(F.col("source") == "web")  # the hot key only
    parts = (
        salted_repartition(df, 16)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = np.array([r["count"] for r in parts])
    assert len(counts) == 16
    # uniform within 2x of mean on every partition — no serialized hot task
    assert counts.max() <= 2 * counts.mean()
    assert counts.min() >= 0.3 * counts.mean()


def test_grouped_build_shuffles_states_not_rows(spark):
    """Per-key partial aggregation means the exchange carries one state row
    per (input partition, key) — for a hot key that is #partitions rows of
    O(16 KB), never the raw data."""
    df = _seq(spark)
    parts = df.rdd.getNumPartitions()
    grouped = build_sketch_grouped(df, ["source"], "n_tok", TDIGEST(0.01))
    # correctness under skew: per-source totals match exact counts
    exact = {r["source"]: r["count"] for r in df.groupBy("source").count().collect()}
    got = {
        r["source"]: TDigest.from_bytes(r["state"]).n for r in grouped.collect()
    }
    assert {k: int(v) for k, v in got.items()} == exact
    # shuffle shape: the pre-shuffle stage emits at most parts x n_keys rows
    from tdigest_spark.operators.aggregate import partials_df  # noqa: F401

    assert parts * len(exact) < df.count() / 10  # states << rows
