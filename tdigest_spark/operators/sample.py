"""Deterministic hash-based sampling for training-data pipelines.

A 100-TB pipeline cannot use ``df.sample()`` for anything that must be
reproducible or joinable: Spark's sampler is partition-layout-dependent
(same seed, different partitioning => different rows) and two tables
sampled "at the same rate" share no rows. The standard fix is CONTENT
hashing: keep a row iff ``hash(key) < fraction * 2^64``. That makes the
sample (a) independent of partitioning, executor count, and row order,
(b) stable across reruns and engines, (c) consistent across tables — the
same key is in or out everywhere, so joins between sampled tables still
line up — and (d) cheap: a whole-stage-codegen filter, pushed to the
scan, no shuffle.

The hash is md5-lower-64 (bytes 8..16 of MD5, little-endian) computed
with built-in JVM expressions (md5 + substring + conv) — the exact value
of DuckDB's ``md5_number_lower``, so every sampling decision is
reproducible in closed-form SQL (same technique as the MinHash banding
oracle, operators/dedup.py).

Reference tie-in: the reference engine has no sampler; its companion
surface here (sketch/bottomk.py KMV) covers "give me a mergeable uniform
sample of SIZE n"; this module covers "give me a deterministic RATE f
slice", the form training pipelines use for held-out splits and ablation
subsets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "md5_lower64",
    "hash_sample",
    "stratified_hash_sample",
    "leakage_safe_split",
]

_U64 = 1 << 64


def md5_lower64(col: Column) -> Column:
    """md5-lower-64 of a string column as DECIMAL(20,0) in [0, 2^64):
    bytes 8..16 of the MD5 digest read little-endian — DuckDB
    ``md5_number_lower`` exactly. Pure JVM expressions (md5/substring/
    conv), so the filter stays inside whole-stage codegen; DECIMAL(20,0)
    because the value range exceeds signed BIGINT."""
    hx = F.md5(col)
    # digest byte i sits at hex chars (2i+1, 2i+2); little-endian of bytes
    # 8..15 == big-endian parse of the byte-pair-reversed hex string
    rev = F.concat(*[F.substring(hx, 31 - 2 * j, 2) for j in range(8)])
    return F.conv(rev, 16, 10).cast("decimal(20,0)")


def _keyed(col: Column, seed: int) -> Column:
    # seed folds into the hashed content, so different seeds draw
    # independent samples of the same keys (held-out vs train splits)
    return (
        F.concat(F.lit(f"{seed}:"), col.cast("string"))
        if seed
        else col.cast("string")
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic ``fraction`` sample of ``df`` keyed on ``key_col``:
    row kept iff md5_lower64(seed:key) < fraction * 2^64. Same key =>
    same decision in every table, every run, every engine."""
    from decimal import Decimal

    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return df
    # Decimal literal: thresholds at f >= 0.5 exceed signed BIGINT
    thresh = F.lit(Decimal(int(fraction * _U64)))
    return df.where(md5_lower64(_keyed(F.col(key_col), seed)) < thresh)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps
    ``fractions[s]`` of its rows (``default_fraction`` otherwise), each
    decision by content hash as in :func:`hash_sample`. The thresholds
    ride along as a broadcast-joined two-column dim — never a shuffle of
    the fact side; unlisted strata filter at the scan when the default
    is 0 (the common "keep only these sources" case)."""
    from decimal import Decimal

    spark = df.sparkSession
    rows = [(s, Decimal(int(f * _U64))) for s, f in sorted(fractions.items())]
    dim = spark.createDataFrame(rows, f"{strata_col} string, _thresh decimal(20,0)")
    joined = df.join(F.broadcast(dim), strata_col, "left")
    thresh = F.coalesce(
        F.col("_thresh"),
        F.lit(Decimal(int(default_fraction * _U64))).cast("decimal(20,0)"),
    )
    return joined.where(
        md5_lower64(_keyed(F.col(key_col), seed)) < thresh
    ).drop("_thresh")


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 1,
    n_shards: int = 10,
    val_shard: int = 8,
    test_shard: int = 9,
) -> DataFrame:
    """Train/val/test assignment that cannot leak duplicates across
    splits: rows are grouped by CONTENT hash (md5-lower-64 of the text),
    and the split is decided by the hash of the group REPRESENTATIVE
    (min id), never the row — so every copy of a duplicated document
    lands in the same split, the invariant that keeps held-out eval
    uncontaminated. A naive per-row hash split sends ~p*(1-p) of each
    duplicate pair across the train/test boundary.

    Two codegen hash passes + one shuffle on the 64-bit content hash (the
    group agg); the rep->split decision is the same engine-independent
    md5 rule as :func:`hash_sample`, so the whole assignment replays in
    closed-form SQL. Returns DataFrame[id_col, _th, rep, split]."""
    keyed = df.select(
        F.col(id_col), md5_lower64(F.col(text_col)).alias("_th")
    )
    reps = keyed.groupBy("_th").agg(F.min(id_col).alias("rep"))
    shard = F.pmod(
        md5_lower64(_keyed(F.col("rep"), seed)), F.lit(n_shards)
    ).cast("int")
    assigned = reps.select(
        "_th",
        "rep",
        F.when(shard == val_shard, F.lit("val"))
        .when(shard == test_shard, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    return keyed.join(assigned, "_th").select(id_col, "_th", "rep", "split")
