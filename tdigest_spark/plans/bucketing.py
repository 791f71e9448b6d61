"""Bucketed-table co-location: the shuffle-free-join storage layout.

At 100 TB the dominant cost of a big-big equi-join is shuffling both
sides. Writing each side bucketed (and sorted) by the join key pins a
hash partitioning INTO THE STORAGE LAYOUT: every future join/aggregation
on that key reads co-located buckets and skips the Exchange entirely —
you pay one shuffle at write time, then never again across the table's
read life. This is the standard warehouse trick (Hive/Spark bucketing;
Iceberg calls it a bucket partition transform) and composes with this
engine's sketch builds: a corpus bucketed by doc_id gives shuffle-free
dedup-id joins, bucketed by (source) gives movement-free grouped sketch
builds.

The reference has no storage layer at all (SURVEY.md §0); this module is
the Spark-native answer to "where does the partitioning live between
jobs".

Requirements for the exchange-free plan (asserted in tests/test_bucketing.py):
- both sides bucketed on the join key with the SAME bucket count,
- ``spark.sql.sources.bucketing.enabled`` (default true),
- a shuffle-based join (broadcast joins sidestep the question).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and, by default,
    sorted) by ``key``. Sorting inside buckets additionally removes the
    per-partition Sort from future sort-merge joins on the key."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key; with
    bucketing enabled Catalyst plans this with ZERO Exchange operators —
    both scans already satisfy the required hash clustering."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
