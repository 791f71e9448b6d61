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
import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cosine_to_query", "topk_cosine", "hyperplane_buckets", "ann_lsh_topk"]


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


def hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 7,
) -> DataFrame:
    """Append a 'bucket' int column = sign pattern of ``n_planes`` seeded
    random hyperplanes. One numpy matmul per Arrow batch."""
    dim_row = df.select(F.size(vec_col).alias("d")).first()
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
    partition-pruning key (write bucketed parquet / Iceberg hidden
    partition): the scan itself prunes."""
    q = np.asarray(query, dtype=np.float64)
    planes = _plane_matrix(q.shape[0], n_planes, seed)
    qsig = int(((q @ planes) > 0) @ (1 << np.arange(n_planes)))
    probes = [qsig]
    if probe_hamming >= 1:
        probes += [qsig ^ (1 << i) for i in range(n_planes)]
    bucketed = hyperplane_buckets(df, vec_col, n_planes, seed)
    cands = bucketed.where(F.col("bucket").isin(probes))
    return topk_cosine(cands, query, k, vec_col, id_col)
