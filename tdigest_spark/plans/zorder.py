"""Z-order (Morton-curve) clustering — MULTI-column data skipping.

plans/partitioned.write_sorted gives one filter column sharp row-group
min/max stats; a filter on any OTHER column skips nothing. Z-ordering
interleaves the bits of several columns' bucket ids into one sort key, so
rows close in the multi-dimensional value space land in the same row
groups — a range filter on ANY of the z-ordered columns prunes row groups
from footer stats alone (the layout trick behind Delta/Iceberg OPTIMIZE
ZORDER, re-expressed as plain Spark expressions; public technique —
Morton 1966, and the data-skipping formulation in the Delta Lake paper,
VLDB 2020).

Everything is whole-stage-codegen column algebra: per-column equal-width
bucket ids (``width_bucket`` against min/max bounds measured in one tiny
aggregate job) -> bit interleave (shift/or cascade) -> repartitionByRange +
sortWithinPartitions on the z key. No UDFs, no driver loops; the write is
one extra narrow column over the normal sorted-write plan. Equal-width
buckets degrade on heavily skewed columns (documented trade-off: swap the
bounds for approxQuantile boundaries per column if needed — the interleave
is bucket-source-agnostic)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_zordered"]


def zorder_key(
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    bits: int = 8,
) -> Column:
    """Morton key column: each column maps to a ``bits``-bit equal-width
    bucket id within its (min, max) bounds, then bit b of column i lands at
    interleaved position b*len(cols)+i. Codegen-only (width_bucket + shift
    cascade); out-of-bounds values clamp to the edge buckets and NULLs map
    to bucket 0 (so one nullable column cannot null the whole key)."""
    n = len(cols)
    if not (1 <= bits * n <= 63):
        raise ValueError("bits * len(cols) must fit a signed 64-bit key")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        lo, hi = (float(x) for x in bounds[c])
        if not hi > lo:
            # constant column: contributes nothing to the ordering
            continue
        # width_bucket returns 1..2^bits in-range, 0 / 2^bits+1 outside
        b = F.width_bucket(
            F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(2**bits)
        )
        b = (
            F.greatest(F.lit(1).cast("long"), F.least(b, F.lit(2**bits)))
            - F.lit(1)
        ).cast("long")
        # NULLs land in the edge bucket instead of nulling the WHOLE key
        # (bitwiseOR with NULL is NULL): the row keeps its clustering on
        # every other column, and nulls of this column co-locate low
        b = F.coalesce(b, F.lit(0).cast("long"))
        for bit in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(b, bit).bitwiseAND(F.lit(1)),
                    bit * n + i,
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int | None = None,
) -> None:
    """Measure per-column bounds (ONE tiny aggregate job over the pruned
    projection), range-partition + sort by the Morton key, write parquet.
    ``n_files`` pins the range-partition count (opts out of AQE coalescing
    that would pack a small table into one file — same contract as
    write_sorted)."""
    bounds_row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    bounds = {c: (bounds_row[f"_lo_{c}"], bounds_row[f"_hi_{c}"]) for c in cols}
    if any(v is None for pair in bounds.values() for v in pair):
        raise ValueError("cannot z-order an empty input or all-null column")
    keyed = df.withColumn("_z", zorder_key(cols, bounds, bits))
    ranged = (
        keyed.repartitionByRange(n_files, "_z")
        if n_files is not None
        else keyed.repartitionByRange("_z")
    )
    (
        ranged.sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
