"""Sequence-packing operators for training-data pipelines.

Before a corpus feeds a trainer it is cut into fixed-capacity token
windows ("context-length chunking") and grouped into contiguous token
shards of roughly equal size. Both are expressed here as pure
DataFrame transformations:

- ``chunk_fixed``: per-document ceil(n/C) chunk fan-out via
  ``sequence`` + ``explode`` — a map-only stage, no shuffle, scales
  linearly at any corpus size.
- ``shard_by_cumsum``: greedy shard assignment by running token count
  within a partition column (e.g. source). A window cumulative sum
  partitioned by that column keeps the sort local per group — no
  global single-partition window, so at 100 TB the parallelism is
  bounded by the number of groups, not 1. Documents are never split:
  a document lands in the shard its *preceding* cumulative mass maps
  to (next-fit with overflow tolerated), the classic deterministic
  rule that needs only a prefix sum.

Both are exactly reproducible in ANSI SQL (generate_series / window
SUM), so every query built on them carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["chunk_fixed", "shard_by_cumsum", "chunk_with_overlap", "pack_token_arrays"]


def chunk_with_overlap(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window text chunking (the RAG / eval-harness shape —
    ``chunk_fixed`` counts windows, this one MATERIALIZES the overlapping
    token windows): each document's whitespace tokens are cut into chunks
    of ``chunk_tokens`` starting every ``stride`` tokens (overlap =
    chunk_tokens - stride), the last chunk may be short, a document
    shorter than one chunk yields exactly one chunk. Output:
    ``id_col, chunk_idx, n_tokens, chunk_text``.

    Pure codegen (split / sequence / explode / slice / array_join) —
    map-only fan-out, no shuffle, and integer-exact chunk-count math
    ((n - chunk + stride - 1) DIV stride + 1, no float ceil), so the
    whole operator has a closed-form SQL twin.

    ``stride`` must not exceed ``chunk_tokens`` (overlap >= 0): with a gap
    the count formula would emit a phantom empty trailing chunk, and gap
    sampling is a different operator anyway."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        raise ValueError(
            "stride must be <= chunk_tokens (this operator overlaps windows;"
            " it does not gap-sample)"
        )
    from .text import word_tokens

    toks = word_tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / F.lit(stride)) + 1
    ).cast("int")
    base = df.select(
        F.col(id_col), toks.alias("_toks"), n.alias("_n"), n_chunks.alias("_k")
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_tokens
    )
    return (
        base.select(
            id_col,
            "_toks",
            F.explode(F.sequence(F.lit(0), F.col("_k") - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size(piece).alias("n_tokens"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
    )


def chunk_fixed(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    capacity: int,
) -> DataFrame:
    """Fan each row out into ``ceil(tokens / capacity)`` fixed-capacity
    chunks. Rows with zero tokens produce no chunks. Output columns:
    ``id_col``, ``chunk_id`` (0-based), ``chunk_tokens`` (== capacity
    except possibly the last chunk). Map-only: sequence+explode inside
    whole-stage codegen, no shuffle."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    n = token_count.cast("bigint")
    n_chunks = F.ceil(n / F.lit(capacity)).cast("bigint")
    return (
        df.select(id_col, n.alias("_n"), n_chunks.alias("_k"))
        .where(F.col("_n") > 0)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("_k") - 1)).alias(
                "chunk_id"
            ),
            F.col("_n"),
        )
        .select(
            id_col,
            "chunk_id",
            F.least(
                F.lit(capacity).cast("bigint"),
                F.col("_n") - F.col("chunk_id") * F.lit(capacity),
            ).alias("chunk_tokens"),
        )
    )


def shard_by_cumsum(
    df: DataFrame,
    part_col: str,
    order_col: str,
    token_count: Column,
    capacity: int,
) -> DataFrame:
    """Assign each row to a token shard within ``part_col`` groups:
    shard = floor(cumulative_tokens_before_this_row / capacity), rows
    ordered by ``order_col``. Deterministic, never splits a row, and
    the window is partitioned so each group sorts independently —
    parallel across groups at scale. Returns the input plus a
    ``shard`` column."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = token_count.cast("bigint")
    cum_incl = F.sum(n).over(w)
    return df.withColumn(
        "shard", F.floor((cum_incl - n) / F.lit(capacity)).cast("bigint")
    )


def pack_token_arrays(
    df: DataFrame,
    part_col: str,
    order_col: str,
    tokens_col: str,
    capacity: int,
) -> DataFrame:
    """MATERIALIZE the packed token streams (``shard_by_cumsum`` assigns;
    this emits the actual trainer input): within ``part_col``, rows in
    ``order_col`` order are concatenated into shards of ~``capacity``
    tokens (never splitting a row). Output: ``part_col, shard, n_docs,
    n_tokens, packed`` (the concatenated token array).

    One shuffle on (part, shard); per-reducer state is one shard's tokens
    (O(capacity + max row)), so the operator streams at any corpus size.
    The in-shard order is made deterministic by sorting the collected
    (order, tokens) structs — collect_list order is otherwise
    partition-arrival nondeterministic."""
    sharded = shard_by_cumsum(
        df.select(part_col, order_col, F.col(tokens_col).alias("_t")),
        part_col,
        order_col,
        F.size("_t"),
        capacity,
    )
    packed = F.flatten(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(order_col).alias("o"), F.col("_t").alias("t"))
                )
            ),
            lambda s: s["t"],
        )
    )
    return (
        sharded.groupBy(part_col, "shard")
        .agg(F.count(F.lit(1)).alias("n_docs"), packed.alias("packed"))
        .select(
            part_col,
            "shard",
            "n_docs",
            F.size("packed").alias("n_tokens"),
            "packed",
        )
    )
