"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline, pure column algebra
  (zip_with + aggregate -> whole-stage codegen, no Python);
- LSH-bucketed ANN (random hyperplanes): the scale path — signatures are a
  vectorized numpy matmul in one Arrow batch pass; candidate generation is a
  bucket join so the shuffle carries (bucket, id, vec) not the cross
  product. At 100 TB the query side is broadcast and only buckets matching
  the query's signature are scanned."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cosine_to_query",
    "topk_cosine",
    "hyperplane_buckets",
    "ann_lsh_topk",
    "ivf_centroids",
    "ivf_assign",
    "ivf_topk",
    "ivf_fixed_centroids",
    "pq_codebooks",
    "pq_encode",
    "pq_adc_lut",
    "pq_adc_scan",
    "lsh_probe_buckets",
    "build_lsh_index",
    "append_lsh_index",
    "lsh_index_topk",
    "build_ivf_index",
    "ivf_index_topk",
    "bucketed_cosine_dup_pairs",
]


def cosine_to_query(vec_col, query: list[float]) -> Column:
    """cosine(vec, query) as a codegen'd column expression (double math)."""
    qn = float(np.linalg.norm(np.asarray(query, dtype=np.float64)))
    qlit = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(
        F.zip_with(vec_col, qlit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (norm * F.lit(qn))


def topk_cosine(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact brute-force top-k by cosine: map-side score + global top-k
    (orderBy + limit compiles to TakeOrderedAndProject — no full sort)."""
    scored = df.select(
        F.col(id_col),
        cosine_to_query(F.col(vec_col), query).alias("cosine"),
    )
    if exclude_id is not None:
        scored = scored.where(F.col(id_col) != exclude_id)
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def _plane_matrix(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes))


def ivf_fixed_centroids(dim: int, n_lists: int, seed: int) -> np.ndarray:
    """Deterministic data-INDEPENDENT spherical codebook: ``n_lists``
    seeded Gaussian directions, L2-normalized. A trained k-means codebook
    (:func:`ivf_centroids`) packs lists tighter, but its centroids depend
    on the data — a fixed codebook makes the list assignment replayable
    from inlined literals by an independent SQL engine (the same property
    the LSH plane matrix has), which is what lets the IVF recall/cost
    curve be exactly oracled rather than asserted."""
    rng = np.random.default_rng(seed)
    C = rng.standard_normal((n_lists, dim))
    return C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Append a 'bucket' int column = sign pattern of ``n_planes`` seeded
    random hyperplanes. One numpy matmul per Arrow batch.

    Pass ``dim`` when known (ann_lsh_topk does): the fallback ``first()``
    probe costs an extra Spark job over the upstream plan and fails on an
    empty input."""
    if dim is None:
        dim_row = df.select(F.size(vec_col).alias("d")).first()
        if dim_row is None or dim_row["d"] is None:
            raise ValueError(
                f"cannot infer {vec_col!r} dimension from an empty input; "
                "pass dim= explicitly"
            )
        dim = int(dim_row["d"])
    planes = _plane_matrix(dim, n_planes, seed)
    cols = df.columns

    def sig(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            emb = tbl.column(vec_col).combine_chunks()
            flat = emb.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim)
            proj = flat.astype(np.float64) @ planes
            bucket = (proj > 0) @ (1 << np.arange(n_planes))
            out = tbl.append_column(
                "bucket", pa.array(bucket.astype(np.int32), pa.int32())
            )
            yield from out.to_batches()

    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField("bucket", IntegerType())]
    )
    return df.mapInArrow(sig, out_schema)


def ann_lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 7,
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN: scan only buckets within ``probe_hamming`` of the query's bucket
    (multi-probe), then exact cosine on the candidates. At scale, bucket is a
    partition-pruning key — build_lsh_index materializes exactly that
    layout, and lsh_index_topk probes it with the scan itself pruning."""
    probes = lsh_probe_buckets(query, n_planes, seed, probe_hamming)
    dim = len(query)
    bucketed = hyperplane_buckets(df, vec_col, n_planes, seed, dim=dim)
    cands = bucketed.where(F.col("bucket").isin(probes))
    return topk_cosine(cands, query, k, vec_col, id_col)


# ---------------------------------------------------------------------------
# pruned-storage ANN: the bucket/list assignment is materialized ONCE as the
# table's partition key; probe queries then prune whole directories at the
# scan (PartitionFilters / numFiles — proven in tests/test_ann_index.py).
# This is the 100-TB read path: a top-k probe opens probes/buckets of the
# corpus and never re-signs it.
# ---------------------------------------------------------------------------


def lsh_probe_buckets(
    query: list[float], n_planes: int = 6, seed: int = 7, probe_hamming: int = 1
) -> list[int]:
    """All bucket ids within ``probe_hamming`` bit flips of the query's
    hyperplane signature (multi-probe LSH). Driver-side: the planes are
    derived from (dim, n_planes, seed) — no index metadata needed."""
    from itertools import combinations

    q = np.asarray(query, dtype=np.float64)
    planes = _plane_matrix(q.shape[0], n_planes, seed)
    qsig = int(((q @ planes) > 0) @ (1 << np.arange(n_planes)))
    probes = [qsig]
    for r in range(1, min(probe_hamming, n_planes) + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for i in bits:
                m |= 1 << i
            probes.append(qsig ^ m)
    return probes


def build_lsh_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 7,
    dim: int | None = None,
) -> None:
    """One-time index build: sign the corpus (one Arrow matmul pass) and lay
    it out hive-partitioned by ``bucket`` — 2^n_planes directories. The
    repartition puts each bucket in exactly one task so every directory gets
    one file (no small-file fan-out from task x partition-value crossing)."""
    from ..plans.partitioned import write_partitioned

    bucketed = hyperplane_buckets(df, vec_col, n_planes, seed, dim=dim)
    write_partitioned(bucketed.repartition(F.col("bucket")), path, ["bucket"])


def append_lsh_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 7,
    dim: int | None = None,
) -> None:
    """Incremental index maintenance: sign ONLY the new vectors (one Arrow
    pass over the delta, never a corpus re-scan) and append them into the
    existing bucket directories. Probes see them immediately — the probe
    path is a partition filter, agnostic to file count. Appends accrete
    one file per (batch, bucket); fold them back with
    plans/partitioned.compact_partitions when the per-directory file count
    matters (tests/test_ann_index.py exercises the composition)."""
    bucketed = hyperplane_buckets(df, vec_col, n_planes, seed, dim=dim)
    (
        bucketed.repartition(F.col("bucket"))
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(path)
    )


def lsh_index_topk(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 7,
    probe_hamming: int = 1,
    exclude_id: int | None = None,
    pre_filter=None,
) -> DataFrame:
    """Probe the prebuilt LSH index: the bucket IN-list hits the partition
    column, so the scan reads only the probed directories (PartitionFilters
    in the plan; numFiles metric counts only matching files) and the exact
    cosine rerank touches ~probes/2^n_planes of the corpus. No signature
    recomputation at query time.

    ``pre_filter`` (optional Column) restricts candidates by metadata
    BEFORE the rerank — filtered ANN ('nearest among label == x'): the
    predicate pushes into the surviving scans, composing with the
    directory pruning."""
    probes = lsh_probe_buckets(query, n_planes, seed, probe_hamming)
    cands = spark.read.parquet(path).where(F.col("bucket").isin(probes))
    if pre_filter is not None:
        cands = cands.where(pre_filter)
    return topk_cosine(cands, query, k, vec_col, id_col, exclude_id=exclude_id)


def build_ivf_index(
    df: DataFrame,
    path: str,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF list assignment as the partition key and persist
    the trained centroids beside the data (underscore-prefixed sidecar —
    invisible to Spark partition discovery), so probe queries need no
    retraining and no full scan."""
    import pyarrow.parquet as pq

    from ..plans.partitioned import write_partitioned

    C = np.asarray(centroids, dtype=np.float64)
    assigned = ivf_assign(df, C, vec_col)
    write_partitioned(assigned.repartition(F.col("list_id")), path, ["list_id"])
    side = pa.table(
        {
            "list_id": pa.array(range(C.shape[0]), pa.int32()),
            "centroid": pa.array(C.tolist(), pa.list_(pa.float64())),
        }
    )
    from ..plans import fsio

    fs, root = fsio.fs_and_path(str(path))
    with fs.open_output_stream(fsio.join(root, "_centroids.parquet")) as f:
        pq.write_table(side, f)


def ivf_index_topk(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_id: int | None = None,
) -> DataFrame:
    """Probe the prebuilt IVF index: centroids come from the sidecar (a few
    KB), the n_probe nearest lists become a partition-pruning IN-list, and
    only those directories are scanned for the exact rerank."""
    import pyarrow.parquet as pq

    from ..plans import fsio

    fs, root = fsio.fs_and_path(str(path))
    with fs.open_input_file(fsio.join(root, "_centroids.parquet")) as f:
        side = pq.read_table(f)
    order = np.argsort(side.column("list_id").to_numpy())
    C = np.stack(
        [np.asarray(v, dtype=np.float64) for v in side.column("centroid").to_pylist()]
    )[order]
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    # stable: equal-similarity lists order by index, matching the SQL
    # oracle's (dot DESC, list_id ASC) probe ranking
    probes = [int(x) for x in np.argsort(-(C @ q), kind="stable")[:n_probe]]
    cands = spark.read.parquet(path).where(F.col("list_id").isin(probes))
    return topk_cosine(cands, query, k, vec_col, id_col, exclude_id=exclude_id)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + probed-list search
# ---------------------------------------------------------------------------


def ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_lists: int = 16,
    sample: int = 8192,
    iters: int = 8,
    seed: int = 0,
) -> np.ndarray:
    """Train the coarse quantizer: driver-side spherical k-means on a
    sample (the standard IVF recipe — training is O(sample), not O(N)).
    Returns an L2-normalized (n_lists, dim) matrix to broadcast."""
    rows = (
        df.select(vec_col).limit(sample).toPandas()[vec_col].to_numpy()
    )
    X = np.stack([np.asarray(v, dtype=np.float64) for v in rows])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(X.shape[0], n_lists, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(n_lists):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def ivf_assign(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Append 'list_id' = nearest centroid by cosine; one numpy matmul per
    Arrow batch (centroids ride in the task closure — broadcast-small). At
    scale this column becomes the table's partition/bucket key, so probed
    queries prune at the scan."""
    C = np.asarray(centroids, dtype=np.float64)
    dim = C.shape[1]

    def assign(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            emb = tbl.column(vec_col).combine_chunks()
            flat = emb.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim)
            V = flat.astype(np.float64)
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            lid = np.argmax(V @ C.T, axis=1)
            out = tbl.append_column(
                "list_id", pa.array(lid.astype(np.int32), pa.int32())
            )
            yield from out.to_batches()

    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields) + [StructField("list_id", IntegerType())]
    )
    return df.mapInArrow(assign, out_schema)


def ivf_topk(
    df: DataFrame,
    query: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: probe the n_probe lists whose centroids are closest to
    the query, exact cosine within them. n_probe = n_lists degrades to
    exact brute force (tested)."""
    C = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(C @ q), kind="stable")
    probes = [int(x) for x in order[:n_probe]]
    assigned = ivf_assign(df, C, vec_col)
    cands = assigned.where(F.col("list_id").isin(probes))
    return topk_cosine(cands, query, k, vec_col, id_col)


def bucketed_cosine_dup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bands: int = 8,
    n_planes: int = 6,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate candidate pairs from BANDED hyperplane
    LSH — the scale-safe pair plan a curation pipeline ships, vs
    :func:`cosine_dup_pairs`'s exact all-pairs baseline.

    ``n_bands`` independent hash tables of ``n_planes`` sign bits each
    (band k's plane matrix is seeded ``seed + k``, so band 0 matches the
    pruned ANN index planes): one Arrow matmul pass signs every vector
    into all bands, each (band, bucket) group computes only its own
    (n_b choose 2) exact-cosine gram, and pairs found by several bands
    collapse with an id-pair groupBy. A pair is a candidate iff SOME
    band agrees on all its bits — recall 1-(1-p^r)^b for per-plane
    agreement p = 1 - theta/pi, the classic LSH amplification — while
    total verify FLOPs stay ~ b*N^2/2^r instead of N^2 and data
    movement is O(N*b) rows through ONE shuffle. At 100x the corpus,
    n_planes rises (and n_bands with the target recall) to hold bucket
    sizes — and so per-task gram memory — constant. The plane matrices
    derive from (dim, n_planes, seed+k) alone, so the bucket columns
    (and therefore the whole candidate set) are exactly reproducible in
    SQL from inlined plane literals (the ann_pruned_topk technique).

    The pair cosine is aggregated with MAX across the bands that found
    it: BLAS blocking may round the same dot product differently in
    different group shapes, and a nondeterministic pick would leak into
    downstream orderings."""
    import pandas as pd

    if dim is None:
        dim_row = df.select(F.size(vec_col).alias("d")).first()
        if dim_row is None or dim_row["d"] is None:
            raise ValueError(
                f"cannot infer {vec_col!r} dimension from an empty input; "
                "pass dim= explicitly"
            )
        dim = int(dim_row["d"])
    P = np.concatenate(
        [_plane_matrix(dim, n_planes, seed + k) for k in range(n_bands)],
        axis=1,
    )
    weights = 1 << np.arange(n_planes)

    def sign_bands(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            emb = tbl.column("_v").combine_chunks()
            flat = emb.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim)
            bits = flat.astype(np.float64) @ P > 0
            for k in range(n_bands):
                bucket = bits[:, k * n_planes : (k + 1) * n_planes] @ weights
                tbl = tbl.append_column(
                    f"bucket_{k}", pa.array(bucket.astype(np.int32), pa.int32())
                )
            yield from tbl.to_batches()

    from pyspark.sql.types import IntegerType, StructField, StructType

    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    sig_schema = StructType(
        list(base.schema.fields)
        + [StructField(f"bucket_{k}", IntegerType()) for k in range(n_bands)]
    )
    sigs = base.mapInArrow(sign_bands, sig_schema)
    rep = sigs.select(
        "_id",
        "_v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.col(f"bucket_{k}").alias("bucket"),
                    )
                    for k in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_v", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    out_schema = "id_a long, id_b long, cosine double"

    def pairs(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf["_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        ii, jj = np.triu_indices(len(ids), 1)
        vals = (V @ V.T)[ii, jj]
        keep = vals >= threshold
        ia, ib = ids[ii[keep]], ids[jj[keep]]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ia, ib),
                "id_b": np.maximum(ia, ib),
                "cosine": vals[keep],
            }
        )

    return (
        rep.groupBy("band", "bucket")
        .applyInPandas(pairs, out_schema)
        .groupBy("id_a", "id_b")
        .agg(F.max("cosine").alias("cosine"))
    )


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int = 4,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b,
    cosine >= threshold) via block-pair replication: each row is
    replicated to the n_blocks block-pairs it participates in, every
    (block_i, block_j) group computes its cross-similarities as ONE numpy
    gram matrix inside applyInPandas.

    Scale shape: replication factor is n_blocks (choose ~sqrt(#executors)),
    so data moves O(N x n_blocks) instead of the O(N^2) crossJoin; each
    task's matmul is (N/n_blocks)^2 x dim — the dense-compute sweet spot.
    LSH/IVF (above) are the recall-tradeoff fast paths; this is the exact
    baseline the round's dedup checklist calls for."""
    import pandas as pd

    b = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("_b"),
    )
    rep = b.withColumn(
        "_p", F.explode(F.array(*[F.lit(j) for j in range(n_blocks)]))
    ).select(
        "_id",
        "_v",
        "_b",
        F.least("_b", "_p").alias("_k1"),
        F.greatest("_b", "_p").alias("_k2"),
        # no dedup needed: for fixed _b the sets {_b, _p} over distinct _p
        # are already distinct — a dropDuplicates here would re-shuffle the
        # replicated vector payloads (the heaviest data in the job) a
        # second time for zero effect
    )

    out_schema = "id_a long, id_b long, cosine double"

    def pairs(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        k1, k2 = int(key[0]), int(key[1])
        ids = pdf["_id"].to_numpy()
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        blk = pdf["_b"].to_numpy()
        if k1 == k2:
            ii, jj = np.triu_indices(len(ids), 1)
            vals = (V @ V.T)[ii, jj]
        else:
            a = np.flatnonzero(blk == k1)
            c = np.flatnonzero(blk == k2)
            S = V[a] @ V[c].T
            ai, ci = np.meshgrid(
                np.arange(len(a)), np.arange(len(c)), indexing="ij"
            )
            ii, jj = a[ai.ravel()], c[ci.ravel()]
            vals = S.ravel()
        keep = vals >= threshold
        ia, ib = ids[ii[keep]], ids[jj[keep]]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ia, ib),
                "id_b": np.maximum(ia, ib),
                "cosine": vals[keep],
            }
        )

    return (
        rep.groupBy("_k1", "_k2")
        .applyInPandas(pairs, out_schema)
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-bound ANN family — vectors compress
# to m subspace codes (here 64 dims -> 8 codes = 32x smaller than float32),
# and search scans CODES with a per-query lookup table instead of floats.
# At 100 TB this is the index you hold in RAM when the vectors themselves
# cannot be: ADC scan cost is m table lookups per candidate, and the
# re-rank touches only the top candidates' full vectors.
# ---------------------------------------------------------------------------


def pq_codebooks(
    dim: int, m: int = 8, k: int = 16, seed: int = 23
) -> np.ndarray:
    """Deterministic data-INDEPENDENT product codebooks: ``m`` subspaces
    of dim/m dims, each with ``k`` seeded Gaussian centroids scaled to
    the unit-normalized-vector regime (per-coordinate std ~ 1/sqrt(dim)).
    Trained (k-means) codebooks quantize tighter; a fixed codebook makes
    every code assignment replayable from inlined literals by the SQL
    oracle — the same property ivf_fixed_centroids has."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, k, dim // m)) / np.sqrt(dim)


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append ``codes`` (array<int>, length m): per subspace the L2-nearest
    centroid of the UNIT-NORMALIZED vector's slice, ties to the lowest
    index (argmin first-min — margin-guarded in tests). One numpy pass
    per Arrow batch; codebooks ride the closure (KBs)."""
    C = np.asarray(codebooks, dtype=np.float64)
    m, k, dsub = C.shape
    dim = m * dsub

    def enc(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            emb = tbl.column(vec_col).combine_chunks()
            flat = emb.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim)
            V = flat.astype(np.float64)
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            codes = np.empty((V.shape[0], m), dtype=np.int32)
            for j in range(m):
                sub = V[:, j * dsub : (j + 1) * dsub]
                # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2; ||v||^2 is
                # constant per row, so argmin over (-2 v.c + ||c||^2)
                d2 = -2.0 * (sub @ C[j].T) + (C[j] * C[j]).sum(axis=1)
                codes[:, j] = np.argmin(d2, axis=1)
            out = tbl.append_column(
                "codes", pa.array(codes.tolist(), pa.list_(pa.int32()))
            )
            yield from out.to_batches()

    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("codes", ArrayType(IntegerType()))]
    )
    return df.mapInArrow(enc, out_schema)


def pq_adc_lut(query: list[float], codebooks: np.ndarray) -> np.ndarray:
    """Asymmetric-distance lookup table for one query: LUT[j][c] =
    ||q_j − C[j][c]||² of the unit-normalized query's j-th slice. ADC
    distance of a coded vector is then sum_j LUT[j][codes[j]] — m array
    lookups, no float vector touched."""
    C = np.asarray(codebooks, dtype=np.float64)
    m, k, dsub = C.shape
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    lut = np.empty((m, k))
    for j in range(m):
        diff = q[j * dsub : (j + 1) * dsub][None, :] - C[j]
        lut[j] = (diff * diff).sum(axis=1)
    return lut


def pq_adc_scan(
    df_codes: DataFrame, lut: np.ndarray, codes_col: str = "codes"
) -> DataFrame:
    """Append ``adc`` = sum_j LUT[j][codes[j]] (asymmetric distance) to a
    coded table: the PQ search scan — m int lookups per row, the float
    vectors are never read. One numpy gather per Arrow batch."""
    L = np.asarray(lut, dtype=np.float64)
    m = L.shape[0]

    def scan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            codes = tbl.column(codes_col).combine_chunks()
            flat = codes.flatten().to_numpy(zero_copy_only=False).reshape(-1, m)
            adc = L[np.arange(m)[None, :], flat].sum(axis=1)
            out = tbl.append_column("adc", pa.array(adc, pa.float64()))
            yield from out.to_batches()

    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(
        list(df_codes.schema.fields) + [StructField("adc", DoubleType())]
    )
    return df_codes.mapInArrow(scan, out_schema)
