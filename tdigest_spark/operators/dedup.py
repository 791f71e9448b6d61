"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, and n-gram Jaccard.

Design for 100 TB:
- exact dedup shuffles only (hash, id) pairs, not documents;
- MinHash signatures are computed map-side — default engine is one
  Arrow-batched numpy kernel (Spark higher-order functions are interpreted,
  not codegen; measured ~8x slower), with a pure-JVM expression fallback —
  then the LSH band join shuffles only (band_hash, id, band) rows;
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
    "shingle_minhash_arrow",
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
    k int hashes per shingle instead of k string hashes.

    Spark evaluates higher-order functions interpreted and does NOT
    common-subexpression-eliminate across the k array_min branches, so a
    naive ``transform`` shared k ways re-hashes every shingle string k
    times (measured 25x slower at sf0.1). Binding the base-hash array to
    a lambda variable via a singleton ``transform(array(base), bh -> ...)``
    forces single evaluation purely in the expression tree."""
    base_hashes = F.transform(shingle_col, lambda s: F.xxhash64(s))
    return F.get(
        F.transform(
            F.array(base_hashes),
            lambda bh: F.array(
                *[
                    F.array_min(
                        F.transform(bh, lambda h: F.xxhash64(F.lit(i), h))
                    )
                    for i in range(k)
                ]
            ),
        ),
        0,
    )


def _hash64_batch(strings: list[bytes]) -> np.ndarray:
    """Deterministic 64-bit hash of a batch of byte strings (blake2b-8,
    C speed, no PYTHONHASHSEED dependence). Deliberately per-string rather
    than a vectorized numpy polynomial hash: the numpy variant allocates
    ~10x-the-input temporaries, and on this kernel first-touch page faults
    make a cold 7M-element pass ~25x slower than this loop (0.18s vs 2.6s
    measured on 260k shingles; see CLAUDE.md env notes)."""
    from hashlib import blake2b

    return np.fromiter(
        (
            int.from_bytes(blake2b(s, digest_size=8).digest(), "little")
            for s in strings
        ),
        dtype=np.uint64,
        count=len(strings),
    )


# per-worker scratch for the (n_shingles, k) permuted-hash matrix: grown
# geometrically and reused across Arrow batches so the first-touch fault
# cost is paid once per worker, not once per batch
_PERM_SCRATCH: dict[int, np.ndarray] = {}


def _perm_scratch(total: int, k: int) -> np.ndarray:
    buf = _PERM_SCRATCH.get(k)
    if buf is None or buf.shape[0] < total:
        cap = max(total, 2 * (buf.shape[0] if buf is not None else 1 << 15))
        buf = np.empty((cap, k), dtype=np.uint64)
        _PERM_SCRATCH[k] = buf
    return buf[:total]


def shingle_minhash_arrow(text_col, k: int = 32, shingle_n: int = 3) -> Column:
    """Arrow-batched shingle-set + MinHash signature kernel:
    struct<sh: array<string>, sig: array<bigint>> from raw text in one
    Python stage. The JVM higher-order-function shingle/signature chain is
    interpreted (not codegen) and measured ~8x slower than this numpy
    kernel at sf0.1; use this on the LSH hot path, the JVM variant where
    a pure-expression column is required. Hashing is the deterministic
    `_hash64_batch` (stable across workers/runs); the k permutations are
    multiply-shift transforms of the base hash, min-reduced per row."""
    from pyspark.sql.functions import pandas_udf

    A = (
        np.arange(1, k + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    ) | np.uint64(1)
    B = np.arange(k, dtype=np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)

    import re

    # mirror the JVM path exactly (shingles()/word_tokens()): F.trim strips
    # 0x20 spaces only, and Java \s+ is ASCII whitespace — Python's
    # str.split() (any Unicode whitespace, no empty tokens) would give the
    # two engines different shingle sets on   or leading tabs
    ascii_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @pandas_udf("struct<sh: array<string>, sig: array<long>>")
    def kernel(texts: pd.Series) -> pd.DataFrame:
        sets: list[list[str]] = []
        for t in texts:
            t = (t or "").strip(" ")
            words = ascii_ws.split(t) if t else []
            if len(words) >= shingle_n:
                seen = dict.fromkeys(
                    " ".join(words[i : i + shingle_n])
                    for i in range(len(words) - shingle_n + 1)
                )
                sets.append(list(seen))
            else:
                sets.append([" ".join(words)])
        if not sets:
            return pd.DataFrame({"sh": [], "sig": []})
        counts = np.fromiter((len(s) for s in sets), dtype=np.int64, count=len(sets))
        hv = _hash64_batch([s.encode() for row in sets for s in row])
        # (total, k) permuted hashes, min-reduced per row in one reduceat;
        # the matrix lives in a reused per-worker scratch buffer
        perm = _perm_scratch(hv.shape[0], k)
        np.multiply(hv[:, None], A[None, :], out=perm)
        perm += B[None, :]
        offs = np.r_[0, np.cumsum(counts)[:-1]]
        mins = np.minimum.reduceat(perm, offs, axis=0).view(np.int64)
        return pd.DataFrame({"sh": sets, "sig": list(mins)})

    return kernel(text_col)


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float | None = None,
    persist_base: bool = False,
    engine: str = "arrow",
) -> DataFrame:
    """MinHash-LSH near-duplicate candidates: (id_a, id_b, est_jaccard
    [, jaccard]). Pairs sharing >=1 of ``bands`` bands; est_jaccard =
    matching signature fraction; optional exact-verify on the shingle sets.

    Scale: signature build is map-only; the band self-join shuffles only
    narrow (id, band, bhash) rows — signature/shingle payloads rejoin for
    the candidate set alone. ``persist_base`` caches the computed
    signatures (MEMORY_AND_DISK) so the candidate rejoin doesn't recompute
    shingling; leave False when the corpus exceeds cluster storage and
    recompute is cheaper than materialization.

    ``engine``: 'arrow' (default) builds shingle sets + signatures in one
    Arrow-batched numpy kernel (~8x faster: Spark HOFs are interpreted);
    'jvm' keeps the pure-expression xxhash64 path (no Python stage)."""
    rows = bands
    r = k // bands
    if engine == "arrow":
        base = df.select(
            F.col(id_col).alias("_id"),
            shingle_minhash_arrow(F.col(text_col), k, shingle_n).alias("_ss"),
        ).select("_id", F.col("_ss.sh").alias("_sh"), F.col("_ss.sig").alias("_sig"))
    else:
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
