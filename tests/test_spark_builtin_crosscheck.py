"""Cross-checks vs Spark's own built-in sketches (SURVEY.md §7.3):
independent implementations agreeing within their published error bounds
is strong evidence both are right."""

import numpy as np
from pyspark.sql import functions as F

from tdigest_spark.operators.aggregate import (
    BLOOM_INTS,
    HLL_INTS,
    TDIGEST,
    build_sketch,
)
from tdigest_spark.sources.sequence_table import (
    default_cache_dir,
    generate_sequence_table,
)


def _seq(spark):
    path = generate_sequence_table(
        default_cache_dir() / "xchecktest_n20000",
        n_rows=20_000,
        seed=31,
        rows_per_file=5_000,
    )
    return spark.read.parquet(str(path))


def test_hll_vs_approx_count_distinct(spark):
    df = _seq(spark)
    ours = build_sketch(df, "n_tok", HLL_INTS(14)).estimate()
    spark_est = df.agg(
        F.approx_count_distinct("n_tok", 0.01).alias("d")
    ).first()["d"]
    exact = df.select("n_tok").distinct().count()
    assert abs(ours - exact) / exact < 0.03
    assert abs(spark_est - exact) / exact < 0.05
    assert abs(ours - spark_est) / exact < 0.08


def test_tdigest_vs_percentile_approx(spark):
    df = _seq(spark)
    d = build_sketch(df, "n_tok", TDIGEST(0.01))
    row = df.agg(
        F.percentile_approx("n_tok", [0.1, 0.5, 0.9], 10_000).alias("q")
    ).first()
    vals = np.sort(
        np.array([r[0] for r in df.select("n_tok").collect()])
    )
    n = len(vals)
    for p, ga in zip([0.1, 0.5, 0.9], row["q"]):
        ours = d.quantile(p)
        # both estimators must land within 1% rank of each other
        r_ours = np.searchsorted(vals, ours) / n
        r_spark = np.searchsorted(vals, ga) / n
        assert abs(r_ours - r_spark) < 0.01, p


def test_tdigest_vs_approx_quantile_gk(spark):
    """Our t-digest vs Spark's Greenwald-Khanna (df.stat.approxQuantile) —
    a third independent quantile estimator (PySpark exposes no
    bloomFilter/countMinSketch to Python, so GK is the built-in
    cross-check available)."""
    df = _seq(spark)
    d = build_sketch(df, "n_tok", TDIGEST(0.01))
    gk = df.stat.approxQuantile("n_tok", [0.1, 0.5, 0.9], 0.005)
    vals = np.sort(np.array([r[0] for r in df.select("n_tok").collect()]))
    n = len(vals)
    for p, g in zip([0.1, 0.5, 0.9], gk):
        r_ours = np.searchsorted(vals, d.quantile(p)) / n
        r_gk = np.searchsorted(vals, g) / n
        assert abs(r_ours - r_gk) < 0.015, p


def test_bloom_membership_on_hashed_ids(spark):
    """Distributed Bloom over hashed doc ids: zero false negatives on every
    present key (bit-OR merge preserves the guarantee)."""
    df = _seq(spark).select(F.xxhash64("doc_id").alias("k"))
    ours = build_sketch(df, "k", BLOOM_INTS(50_000, 0.01))
    keys = np.array([r["k"] for r in df.collect()], dtype=np.int64)
    assert ours.might_contain_ints(keys).all()
