"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, and n-gram Jaccard.

Design for 100 TB:
- exact dedup shuffles only (hash, id) pairs, not documents;
- MinHash signatures are computed map-side with JVM built-ins
  (transform/xxhash64/array_min — whole-stage codegen, no Python), then the
  LSH band join shuffles only (band_hash, id, signature) rows;
- candidate verification is a self-join on the banded buckets, never an
  all-pairs product."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import word_tokens

__all__ = [
    "exact_dup_groups",
    "shingles",
    "minhash_signature",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash64",
]


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate grouping: every row annotated with its group's
    canonical (min) id and group size. Shuffles only (hash, id)."""
    h = F.xxhash64(F.col(text_col)).alias("_h")
    keyed = df.select(F.col(id_col), h)
    groups = keyed.groupBy("_h").agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        keyed.join(groups, "_h")
        .select(
            F.col(id_col),
            "canonical_id",
            "group_size",
            (F.col(id_col) != F.col("canonical_id")).alias("is_duplicate"),
        )
    )


def shingles(col, n: int = 3) -> Column:
    """Distinct word n-gram shingle set as array<string> (JVM-side)."""
    words = word_tokens(col)
    sz = F.size(words)
    grams = F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    return F.array_distinct(grams)


def minhash_signature(shingle_col, k: int = 32) -> Column:
    """k-permutation MinHash signature as array<bigint>. Each shingle
    string is hashed ONCE (xxhash64); the k permutations are derived by
    re-hashing that int64 with the permutation index — 1 string hash +
    k int hashes per shingle instead of k string hashes. Fully codegen'd."""
    base_hashes = F.transform(shingle_col, lambda s: F.xxhash64(s))
    return F.array(
        *[
            F.array_min(
                F.transform(base_hashes, lambda h: F.xxhash64(F.lit(i), h))
            )
            for i in range(k)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float | None = None,
    persist_base: bool = False,
) -> DataFrame:
    """MinHash-LSH near-duplicate candidates: (id_a, id_b, est_jaccard
    [, jaccard]). Pairs sharing >=1 of ``bands`` bands; est_jaccard =
    matching signature fraction; optional exact-verify on the shingle sets.

    Scale: signature build is map-only; the band self-join shuffles only
    narrow (id, band, bhash) rows — signature/shingle payloads rejoin for
    the candidate set alone. ``persist_base`` caches the computed
    signatures (MEMORY_AND_DISK) so the candidate rejoin doesn't recompute
    shingling; leave False when the corpus exceeds cluster storage and
    recompute is cheaper than materialization."""
    rows = bands
    r = k // bands
    base = df.select(
        F.col(id_col).alias("_id"),
        shingles(F.col(text_col), shingle_n).alias("_sh"),
    ).withColumn("_sig", minhash_signature(F.col("_sh"), k))
    if persist_base:
        from pyspark import StorageLevel

        base = base.persist(StorageLevel.MEMORY_AND_DISK)
    # band rows carry ONLY (id, band, bhash): the 8-way explode + self-join
    # shuffles narrow fixed-width rows, never the signature/shingle payloads
    banded = base.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("_sig")[b * r + j].cast("string")
                                    for j in range(r)
                                ],
                            )
                        ).alias("bhash"),
                    )
                    for b in range(rows)
                ]
            )
        ).alias("_band"),
    ).select("_id", "_band.band", "_band.bhash")
    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # payloads rejoin only for the (much smaller) candidate set
    pa_ = base.select(
        F.col("_id").alias("id_a"),
        F.col("_sig").alias("sig_a"),
        F.col("_sh").alias("sh_a"),
    )
    pb_ = base.select(
        F.col("_id").alias("id_b"),
        F.col("_sig").alias("sig_b"),
        F.col("_sh").alias("sh_b"),
    )
    pairs = cand.join(pa_, "id_a").join(pb_, "id_b")
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    ) / F.lit(float(k))
    out = pairs.withColumn("est_jaccard", est)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    out = out.withColumn(
        "jaccard", (inter / union).cast("double")
    ).select("id_a", "id_b", "est_jaccard", "jaccard")
    if jaccard_threshold is not None:
        out = out.where(F.col("jaccard") >= jaccard_threshold)
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via an inverted shingle index:
    explode shingles -> join on shingle -> count common -> Jaccard.
    Avoids the all-pairs product; shuffles (shingle, id) postings."""
    base = df.select(
        F.col(id_col).alias("_id"),
        shingles(F.col(text_col), shingle_n).alias("_sh"),
    ).withColumn("_len", F.size("_sh"))
    posts = base.select("_id", "_len", F.explode("_sh").alias("_g"))
    common = (
        posts.alias("a")
        .join(posts.alias("b"), (F.col("a._g") == F.col("b._g")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._len").alias("len_a"),
            F.col("b._len").alias("len_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("len_a") + F.col("len_b") - F.col("inter"))
    return (
        common.withColumn("jaccard", jac.cast("double"))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(col, ngram: int = 2) -> Column:
    """64-bit SimHash over word n-gram xxhash64 values: per bit, sign of the
    sum of +/-1 votes. The gram hashing stays JVM-side (codegen); the bit
    voting runs as one Arrow-batched numpy kernel (a 64-bit unpack + matmul),
    not per-row Python."""
    from pyspark.sql.functions import pandas_udf

    grams = shingles(col, ngram)
    hashes = F.transform(grams, lambda g: F.xxhash64(g))

    @pandas_udf("long")
    def vote(hash_lists: pd.Series) -> pd.Series:
        # fully vectorized across the batch: concatenate every row's gram
        # hashes, expand to a (total, 64) bit matrix once, then per-row
        # column sums via add.reduceat over the row offsets — no per-row
        # Python loop
        n = len(hash_lists)
        lens = np.array(
            [0 if hl is None else len(hl) for hl in hash_lists],
            dtype=np.int64,
        )
        out = np.zeros(n, dtype=np.int64)
        nz = np.flatnonzero(lens)
        if nz.shape[0] == 0:
            return pd.Series(out)
        flat = np.concatenate(
            [np.asarray(hash_lists.iloc[i], dtype=np.int64) for i in nz]
        ).view(np.uint64)
        bits = (
            (flat[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.int64)
        offsets = np.r_[0, np.cumsum(lens[nz])[:-1]]
        sums = np.add.reduceat(bits, offsets, axis=0)  # (len(nz), 64)
        votes = 2 * sums - lens[nz][:, None]
        words = ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
        out[nz] = words.view(np.int64)
        return pd.Series(out)

    return vote(hashes)
