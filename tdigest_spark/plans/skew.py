"""Explicit skew handling (north_rule: "partitioning / shuffle / skew
handled explicitly").

Skew shows up twice in sketch pipelines over source-skewed sequence tables
(the fixture mix is web 70% / code 15% / books 10% / wiki 4% / rare 1%):

1. *Partial phase*: a groupBy(source) over raw rows would hash all 'web'
   rows into one task. The engine never does that — partials are built per
   input split (operators/scan.py balances splits by row count), and
   grouped builds (aggregate.build_sketch_grouped) aggregate per
   (partition, key) map-side so only O(16 KB) states shuffle per key.

2. *Placement*: when rows must be redistributed (e.g. a checkpointed build
   wants uniform task sizes from upstream output that is clustered by
   source), ``salted_repartition`` spreads rows by a hash of a unique-ish
   column — a deterministic round-robin that AQE's skew-join splitting
   cannot provide for custom aggregation stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_repartition", "skew_report"]


def salted_repartition(
    df: DataFrame, num_partitions: int, key_col: str = "doc_id"
) -> DataFrame:
    """Repartition by xxhash64(key) % n: breaks value-clustered layouts
    (e.g. all rows of a hot ``source`` in a few files) into uniformly
    loaded partitions. Deterministic (no rand()), so lineage-based
    recomputation reproduces placement. The salt is the xxhash64 value
    itself — Spark hash-partitions the expression, so pre-modding would
    double-hash and collide buckets unevenly."""
    return df.repartition(num_partitions, F.xxhash64(F.col(key_col)))


def skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Per-key share of rows + imbalance factor vs uniform — the
    observability half of skew handling. Returns
    DataFrame[key, n_rows, share, imbalance].

    One scan: total rows and key count come from a one-row aggregate over
    the per-key counts, broadcast-joined back — not separate
    count()/distinct() jobs that would rescan ``df``, and not an empty
    Window.partitionBy(), which would collapse every per-key row into a
    single task at high key cardinality."""
    per_key = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = per_key.agg(
        F.sum("n_rows").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    return (
        per_key.crossJoin(F.broadcast(totals))
        .withColumn("share", F.col("n_rows") / F.col("_total"))
        .withColumn("imbalance", F.col("share") * F.col("_n_keys"))
        .drop("_total", "_n_keys")
        .orderBy(F.desc("n_rows"))
    )
