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

from .text import _md5_lower64_hex, word_tokens

__all__ = [
    "exact_dup_groups",
    "shingles",
    "minhash_signature",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "ngram_contamination",
    "simhash64",
    "shingle_minhash_arrow",
    "shingle_hash_sets_arrow",
    "spread_small_input",
    "duplicate_span_coverage",
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
    """Deterministic 64-bit hash of a batch of byte strings — the canonical
    md5-lower-64 (``sketch.hashing.md5_lower64``; exactly DuckDB's
    ``md5_number_lower``, unlike the round-1 xxhash64/blake2b choices). C
    speed, no PYTHONHASHSEED dependence; see that helper for why it is a
    per-string loop rather than a numpy polynomial hash."""
    from ..sketch.hashing import md5_lower64

    return md5_lower64(strings)


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


MINHASH_A = lambda k: (  # noqa: E731 -- shared with the SQL oracle generator
    np.arange(1, k + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
) | np.uint64(1)
MINHASH_B = lambda k: np.arange(k, dtype=np.uint64) * np.uint64(  # noqa: E731
    0xC2B2AE3D27D4EB4F
)


def _shingle_sets(texts, shingle_n: int) -> list[list[str]]:
    """Distinct word n-gram shingle sets, mirroring the JVM path exactly
    (shingles()/word_tokens()): F.trim strips 0x20 spaces only, and Java
    \\s+ is ASCII whitespace -- Python's str.split() (any Unicode
    whitespace, no empty tokens) would give the two engines different
    shingle sets on NBSP or leading tabs."""
    import re

    ascii_ws = re.compile(r"[ \t\n\x0b\f\r]+")
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
    return sets


def _minhash_mins(sets: list[list[str]], k: int) -> np.ndarray:
    """(n_rows, k) signature matrix: md5-lower-64 base hash per shingle,
    k multiply-add permutations, per-row uint64 min (one reduceat); the
    permuted-hash matrix lives in a reused per-worker scratch buffer."""
    counts = np.fromiter((len(s) for s in sets), dtype=np.int64, count=len(sets))
    hv = _hash64_batch([s.encode() for row in sets for s in row])
    perm = _perm_scratch(hv.shape[0], k)
    np.multiply(hv[:, None], MINHASH_A(k)[None, :], out=perm)
    perm += MINHASH_B(k)[None, :]
    offs = np.r_[0, np.cumsum(counts)[:-1]]
    return np.minimum.reduceat(perm, offs, axis=0).view(np.int64)


def shingle_minhash_arrow(
    text_col, k: int = 32, shingle_n: int = 3, include_shingles: bool = True
) -> Column:
    """Arrow-batched shingle-set + MinHash signature kernel:
    struct<sh: array<string>, sig: array<bigint>> from raw text in one
    Python stage (``include_shingles=False`` emits sig only -- the LSH hot
    path never materializes the shingle strings, which dominate the Arrow
    transfer + persist bytes). The JVM higher-order-function chain is
    interpreted (not codegen) and measured ~8x slower than this numpy
    kernel at sf0.1. Hashing is `_hash64_batch` (md5 lower 64 -- DuckDB
    ``md5_number_lower``-reproducible, so LSH banding has an exact SQL
    oracle); the k permutations are multiply-add transforms of the base
    hash, min-reduced per row."""
    from pyspark.sql.functions import pandas_udf

    if include_shingles:

        @pandas_udf("struct<sh: array<string>, sig: array<long>>")
        def kernel(texts: pd.Series) -> pd.DataFrame:
            sets = _shingle_sets(texts, shingle_n)
            if not sets:
                return pd.DataFrame({"sh": [], "sig": []})
            return pd.DataFrame({"sh": sets, "sig": list(_minhash_mins(sets, k))})

        return kernel(text_col)

    @pandas_udf("array<long>")
    def sig_kernel(texts: pd.Series) -> pd.Series:
        sets = _shingle_sets(texts, shingle_n)
        if not sets:
            return pd.Series([], dtype=object)
        return pd.Series(list(_minhash_mins(sets, k)))

    return sig_kernel(text_col)


def spread_small_input(df: DataFrame, max_parts: int = 32) -> DataFrame:
    """Round-robin a low-partition-count frame up to the session's
    parallelism so a map-side kernel uses every core. A single small
    parquet file is ONE split, which silently serializes the Arrow
    signature kernels onto one core (measured 8.5s -> 0.5s on the sf0.1
    documents table at local[32]). No-op when the input already has
    enough splits — a corpus-scale table never takes this shuffle; only
    the narrow projection of a small input does."""
    par = min(df.sparkSession.sparkContext.defaultParallelism, max_parts)
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def shingle_sets_arrow(text_col, shingle_n: int = 3) -> Column:
    """Arrow-batched distinct word-n-gram shingle sets (array<string>) from
    raw text — `_shingle_sets` (JVM-parity semantics, tested) without the
    minhash signature work. Use instead of the interpreted `shingles()`
    HOF chain on hot paths: Spark higher-order functions are not codegen
    and get re-evaluated per consuming expression (CLAUDE.md)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def kernel(texts: pd.Series) -> pd.Series:
        return pd.Series(_shingle_sets(texts, shingle_n))

    return kernel(text_col)


def shingle_hash_sets_arrow(text_col, shingle_n: int = 3) -> Column:
    """Distinct md5-lower-64 hashes of each row's shingle set
    (array<long>): the postings-index currency for exact-Jaccard joins —
    8-byte longs shuffle and compare far cheaper than the shingle strings
    they stand for, and DuckDB ``md5_number_lower`` reproduces every value
    so the join stays exactly oracled (both engines dedup per-doc on the
    hash, so even a collision — ~2^-64 per pair — is mirrored)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def kernel(texts: pd.Series) -> pd.Series:
        sets = _shingle_sets(texts, shingle_n)
        return pd.Series(
            [
                np.unique(
                    _hash64_batch([g.encode() for g in s])
                ).view(np.int64).tolist()
                for s in sets
            ]
        )

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
    """MinHash-LSH near-duplicate candidates: (id_a, id_b, est_jaccard,
    jaccard). Pairs sharing >=1 of ``bands`` bands (all r=k/bands signature
    slots equal); est_jaccard = matching signature fraction; jaccard =
    exact shingle-set Jaccard, recomputed for the candidate rows only.

    Scale: the signature build is map-only and emits ONLY (id, sig) --
    never the shingle strings, which dominate the corpus bytes. The band
    self-join shuffles narrow (id, band, r-slot key) rows. Both scoring
    inputs (signatures for est_jaccard, shingle sets for exact jaccard)
    come from a SINGLE re-scan of the source table pruned to (id, text) by
    a semi-join on the candidate ids (small by construction, broadcast
    under AQE) -- the kernel is deterministic, so recomputed candidate
    signatures are bit-identical to the banding pass's. Nothing
    corpus-sized beyond the narrow (id, sig) frame is persisted or
    re-shuffled; ``persist_base`` caches that frame plus the two
    candidate-bounded intermediates (pair ids, verification structs).

    ``engine``: 'arrow' (default) builds signatures in one Arrow-batched
    numpy kernel (~8x faster: Spark HOFs are interpreted) with md5-lower-64
    base hashing -- every banding decision is reproducible in DuckDB SQL
    (md5_number_lower + UHUGEINT multiply-add mod 2^64), giving the full
    pipeline an exact oracle. 'jvm' keeps a pure-expression xxhash64 path
    (no Python stage, not SQL-reproducible)."""
    r = k // bands
    base = spread_small_input(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    )
    if engine == "arrow":
        sig_df = base.select(
            "_id",
            shingle_minhash_arrow(
                F.col("_text"), k, shingle_n, include_shingles=False
            ).alias("_sig"),
        )
    else:
        sig_df = base.select(
            "_id",
            minhash_signature(shingles(F.col("_text"), shingle_n), k).alias("_sig"),
        )
    if persist_base:
        from pyspark import StorageLevel

        # the band self-join consumes sig_df twice (left/right), and the
        # candidate subtree is evaluated by multiple downstream consumers
        # whose stages run concurrently (a mid-plan cache does NOT
        # serialize them); caching the narrow (id, k*8-byte sig) frame --
        # the root of all of them -- is what keeps every re-evaluation
        # cheap. ~260 bytes/row fits cluster storage at any corpus size.
        sig_df = sig_df.persist(StorageLevel.MEMORY_AND_DISK)
    # band rows carry (id, band, key=r raw slots): joining on the raw slot
    # values (not a hash of them) keeps the candidate set exactly
    # reproducible by the SQL oracle; at r=4 the key is 32 bytes a row
    banded = sig_df.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.slice("_sig", b * r + 1, r).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band"),
    ).select("_id", "_band.band", "_band.key")
    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    if persist_base:
        # cand is consumed twice (the id-list semi-join, the final scoring
        # join); caching the two-id rows (bounded by the candidate count)
        # keeps each consumer to a cached-signature band join at worst.
        cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
    # one verification frame for the (much smaller) candidate set: the
    # pruned (id, text) re-scan + semi-join (candidates are small, so AQE
    # broadcasts the id list) recomputes struct(shingles, signature) in a
    # single kernel pass -- deterministic, so the signatures match the
    # banding pass bit-for-bit. Persisting it is candidate-bounded.
    cand_ids = (
        cand.select(F.explode(F.array("id_a", "id_b")).alias("_id")).distinct()
    )
    texts_cand = base.join(cand_ids, "_id", "left_semi")
    if engine == "arrow":
        ver = texts_cand.select(
            "_id",
            shingle_minhash_arrow(
                F.col("_text"), k, shingle_n, include_shingles=True
            ).alias("_v"),
        ).select("_id", F.col("_v.sh").alias("_sh"), F.col("_v.sig").alias("_sig"))
    else:
        # two selects so the interpreted shingle HOF evaluates once (no CSE
        # across sibling expressions -- CLAUDE.md)
        ver = texts_cand.select(
            "_id", shingles(F.col("_text"), shingle_n).alias("_sh")
        ).select("_id", "_sh", minhash_signature(F.col("_sh"), k).alias("_sig"))
    if persist_base:
        ver = ver.persist(StorageLevel.MEMORY_AND_DISK)
    va = ver.select(
        F.col("_id").alias("id_a"),
        F.col("_sh").alias("sh_a"),
        F.col("_sig").alias("sig_a"),
    )
    vb = ver.select(
        F.col("_id").alias("id_b"),
        F.col("_sh").alias("sh_b"),
        F.col("_sig").alias("sig_b"),
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    ) / F.lit(float(k))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    out = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("est_jaccard", est)
        .withColumn("jaccard", (inter / union).cast("double"))
        .select("id_a", "id_b", "est_jaccard", "jaccard")
    )
    if jaccard_threshold is not None:
        out = out.where(F.col("jaccard") >= jaccard_threshold)
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | str | None = "auto",
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via an inverted shingle index:
    explode md5-lower-64 shingle hashes -> join on hash -> count common ->
    Jaccard. Avoids the all-pairs product; shuffles (hash, id) postings —
    8-byte longs, not the strings they stand for (DuckDB md5_number_lower
    mirrors every hash, so the join stays exactly oracled).

    ``max_df`` guards the postings self-join against hot shingles: a
    shingle present in d documents contributes d^2 join rows, so one
    stopword-like trigram in 1% of a 10^9-doc corpus is a 10^14-row
    blowup. Shingles with document frequency > max_df are dropped from
    the index (standard IR trick — they carry no near-dup signal);
    intersection counts then exclude them while set sizes keep them, so
    reported jaccard becomes a slight UNDERESTIMATE for pairs sharing
    capped shingles (never an overestimate, and pairs whose every shared
    shingle is capped are missed — that is the documented contract).

    The default is ``"auto"``: cap = max(64, ceil(0.005 * n_docs)),
    derived IN-PLAN from the postings (a broadcast 1-row aggregate — no
    extra driver action), so a hot shingle can cost at most
    ~(0.5% of corpus)^2 join rows no matter the scale. Pass an int to pin
    the cap, or ``None`` to opt into exact-but-unbounded semantics
    (VERDICT r2 item 5: unbounded must be the opt-in, not the default).

    The postings frame is persisted: the self-join consumes it twice
    CONCURRENTLY (sibling consumers don't serialize on a mid-plan cache),
    and without the pin each side re-runs the shingling from the raw text
    (measured 34s -> ~3s at sf0.1). Narrow (id, len, gram) rows spill
    cleanly via MEMORY_AND_DISK at corpus scale."""
    from pyspark import StorageLevel

    base = spread_small_input(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    ).select(
        "_id", shingle_hash_sets_arrow(F.col("_text"), shingle_n).alias("_sh")
    ).withColumn("_len", F.size("_sh"))
    posts = base.select("_id", "_len", F.explode("_sh").alias("_g"))
    if max_df is not None:
        # shingle sets are distinct per doc, so COUNT(*) per gram == DF;
        # left-semi keeps the postings schema and prunes before the join
        dfs = posts.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
        if max_df == "auto":
            # double multiply + ceil are IEEE-exact and spelled identically
            # in the SQL oracle, so the auto cap is engine-independent
            ndocs = posts.agg(F.countDistinct("_id").alias("_n"))
            cap = F.greatest(
                F.lit(64).cast("long"),
                F.ceil(F.col("_n").cast("double") * F.lit(0.005)),
            )
            keep = (
                dfs.crossJoin(F.broadcast(ndocs))
                .where(F.col("_df") <= cap)
                .select("_g")
            )
        else:
            keep = dfs.where(F.col("_df") <= int(max_df)).select("_g")
        posts = posts.join(keep, "_g", "left_semi")
    posts = posts.persist(StorageLevel.MEMORY_AND_DISK)
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


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_df: int | str | None = "auto",
) -> DataFrame:
    """ASYMMETRIC near-dup detection: max-containment
    ``|A ∩ B| / min(|A|, |B|)`` over n-gram shingle sets — the metric
    that catches SUBSET duplication (a document quoted or truncated
    inside another), which symmetric Jaccard misses: a 100-shingle doc
    fully embedded in a 10,000-shingle doc scores Jaccard ≈ 0.01 but
    containment 1.0. Same inverted-index shape as ``ngram_jaccard_pairs``
    (postings self-join on 8-byte hashes, never all pairs; ``max_df``
    hot-shingle cap with the identical underestimate-only contract), so
    the whole pipeline stays exactly SQL-oracled. Emits the pair, both
    set sizes, the intersection, and the UNROUNDED containment (a single
    IEEE division of exact ints — bit-identical across engines)."""
    from pyspark import StorageLevel

    base = spread_small_input(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    ).select(
        "_id", shingle_hash_sets_arrow(F.col("_text"), shingle_n).alias("_sh")
    ).withColumn("_len", F.size("_sh"))
    posts = base.select("_id", "_len", F.explode("_sh").alias("_g"))
    if max_df is not None:
        dfs = posts.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
        if max_df == "auto":
            ndocs = posts.agg(F.countDistinct("_id").alias("_n"))
            cap = F.greatest(
                F.lit(64).cast("long"),
                F.ceil(F.col("_n").cast("double") * F.lit(0.005)),
            )
            keep = (
                dfs.crossJoin(F.broadcast(ndocs))
                .where(F.col("_df") <= cap)
                .select("_g")
            )
        else:
            keep = dfs.where(F.col("_df") <= int(max_df)).select("_g")
        posts = posts.join(keep, "_g", "left_semi")
    posts = posts.persist(StorageLevel.MEMORY_AND_DISK)
    common = (
        posts.alias("a")
        .join(
            posts.alias("b"),
            (F.col("a._g") == F.col("b._g"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._len").alias("len_a"),
            F.col("b._len").alias("len_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    cont = F.col("inter").cast("double") / F.least(
        F.col("len_a"), F.col("len_b")
    ).cast("double")
    return (
        common.withColumn("containment", cont)
        .where(F.col("containment") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.col("len_a").cast("long").alias("len_a"),
            F.col("len_b").cast("long").alias("len_b"),
            "inter",
            "containment",
        )
    )


def ngram_contamination(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
) -> DataFrame:
    """Benchmark decontamination by n-gram OVERLAP (the GPT-3 appendix-C
    recipe, distinct from the whole-document fingerprint anti-join): a
    training document is contaminated if it shares at least one word
    n-gram with any benchmark document. Returns
    DataFrame[id_col, n_shared] — contaminated ids with their count of
    DISTINCT shared shingles (the review currency: how much leaked, not
    just a flag).

    Scale shape: the benchmark shingle set is DISTINCT md5-lower-64
    hashes of the (small) eval suite — low millions of 8-byte longs even
    for a large benchmark battery — and BROADCASTS, so the training
    corpus is a single map-side semi-join pass: no shuffle of corpus
    rows, no join state proportional to the corpus. The per-doc count
    aggregate only shuffles the (rare) contaminated hits.

    Exactly oracled: shingles are `_shingle_sets` word n-grams hashed
    with md5-lower-64, both reproduced verbatim in SQL (DuckDB
    ``md5_number_lower``), so the contaminated id set and counts match
    bit-for-bit. Short docs (< n words) contribute their whole text as
    one shingle, same as ngram_jaccard_pairs.
    """
    bench_h = (
        spread_small_input(bench.select(F.col(text_col).alias("_text")))
        .select(
            F.explode(
                shingle_hash_sets_arrow(F.col("_text"), shingle_n)
            ).alias("_g")
        )
        .distinct()
    )
    posts = spread_small_input(
        train.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    ).select(
        "_id",
        F.explode(shingle_hash_sets_arrow(F.col("_text"), shingle_n)).alias(
            "_g"
        ),
    )
    return (
        posts.join(F.broadcast(bench_h), "_g", "left_semi")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .select(F.col("_id").alias(id_col), "n_shared")
    )


def simhash64(col, ngram: int = 2) -> Column:
    """64-bit SimHash over word n-gram md5-lower-64 values: per bit, sign
    of the sum of +/-1 votes. One Arrow-batched numpy kernel does
    shingling + per-string md5 + a 64-bit unpack + reduceat vote straight
    from raw text — transferring text once beats shipping the (words x n)
    gram arrays out of the interpreted JVM HOF chain (measured ~5x at
    sf0.1). md5-lower-64 is DuckDB ``md5_number_lower``, so the signature
    — and the banding / Hamming blocking built on it — is exactly
    reproducible in SQL."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def vote(texts: pd.Series) -> pd.Series:
        # fully vectorized across the batch: shingle every row (same
        # semantics as the JVM shingles(), tested for parity), concatenate
        # every row's gram strings, md5-hash once each, expand to a
        # (total, 64) bit matrix, then per-row column sums via add.reduceat
        sets = _shingle_sets(texts, ngram)
        n = len(sets)
        lens = np.fromiter((len(s) for s in sets), dtype=np.int64, count=n)
        out = np.zeros(n, dtype=np.int64)
        nz = np.flatnonzero(lens)
        if nz.shape[0] == 0:
            return pd.Series(out)
        flat = _hash64_batch([s.encode() for i in nz for s in sets[i]])
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

    return vote(col)


def duplicate_span_coverage(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Substring-level dedup audit (the ExactSubstr statistic of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", 2022):
    for every document, how many token POSITIONS are covered by at least
    one ``k``-token span that occurs more than once anywhere in the corpus
    — the signal substring dedup trims on, where document-level dedup sees
    nothing (boilerplate headers, quoted paragraphs, license blocks).

    The paper builds a single-node suffix array; that doesn't distribute.
    This is the shuffle formulation that does:

      1. map-side: every row fans out its (pos, md5-lower-64(span)) pairs —
         one 8-byte hash per token position, computed inside ONE bound
         ``transform`` (no cross-branch re-evaluation);
      2. one shuffle on span hash -> corpus frequency; spans with freq > 1
         are the duplicated ones (the analogue of the suffix-array repeated
         substring scan);
      3. join back on span hash (both sides large => shuffle hash join, the
         correct plan) and merge overlapping [pos, pos+k-1] intervals per
         document with a gaps-and-islands window — state per doc is its own
         duplicated spans only.

    Everything is exact and SQL-reproducible: span identity is
    ``md5_number_lower(array_to_string(tokens[i:i+k-1], ','))`` in DuckDB.

    Returns (id, n_tok, dup_covered, dup_fraction) for EVERY input row
    (docs with no duplicated span report 0 / 0.0; blank docs 0-token docs
    report fraction 0.0).
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col),
        F.transform(F.col(tokens_col), lambda x: x.cast("string")).alias("_s"),
        F.size(tokens_col).alias("n_tok"),
    )
    n = F.col("n_tok")
    spans = (
        base.where(n >= k)
        .select(
            id_col,
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), n - F.lit(k - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        _md5_lower64_hex(F.concat_ws(",", F.slice(F.col("_s"), i, k))).alias(
                            "h"
                        ),
                    ),
                )
            ).alias("sp"),
        )
        .select(id_col, F.col("sp.pos").alias("pos"), F.col("sp.h").alias("h"))
    )
    dup_hashes = spans.groupBy("h").agg(F.count(F.lit(1)).alias("_c")).where(
        F.col("_c") > 1
    )
    hits = spans.join(dup_hashes.select("h"), "h").select(
        id_col, "pos", (F.col("pos") + F.lit(k - 1)).alias("end")
    )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        hits.withColumn(
            "_new",
            (
                F.col("pos")
                > F.coalesce(F.max("end").over(w_prev), F.lit(-1)) + F.lit(1)
            ).cast("int"),
        )
        .withColumn("_isl", F.sum("_new").over(w_run))
        .groupBy(id_col, "_isl")
        .agg((F.max("end") - F.min("pos") + F.lit(1)).alias("_cov"))
        .groupBy(id_col)
        .agg(F.sum("_cov").alias("dup_covered"))
    )
    return (
        base.select(id_col, "n_tok")
        .join(islands, id_col, "left")
        .select(
            id_col,
            "n_tok",
            F.coalesce(F.col("dup_covered"), F.lit(0).cast("bigint")).alias(
                "dup_covered"
            ),
            F.when(F.col("n_tok") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.coalesce(F.col("dup_covered"), F.lit(0).cast("bigint"))
                    / F.col("n_tok"),
                    6,
                )
            )
            .alias("dup_fraction"),
        )
    )
