"""Two-phase mergeable sketch aggregation over Spark DataFrames.

This is the Spark-native re-expression of the reference's entire aggregate
lifecycle (/root/reference/tdigest.js push :82-91 / push_centroid :93-100 /
percentile :272-310): PySpark exposes no Python UDAF with a user merge phase,
so the mergeable-UDAF pattern is built explicitly (SURVEY.md §7.6):

  phase 1 (partial):  df.select(cols).mapInArrow(...)   — one serialized
      sketch state per input partition, built with vectorized numpy kernels
      over whole Arrow batches (no per-row Python, per BASELINE.json
      input_hint). ``array<T>`` columns are flattened JVM-side-cheap via the
      Arrow ListArray buffer — no explode, no row amplification, no shuffle.
  phase 2 (merge):    deterministic binary-tree fold over the partial states,
      either driver-side (states are O(1/delta) bytes — tiny) or as iterative
      grouped Spark rounds for very large partition counts
      (treeAggregate-style, per BASELINE.json north_star).

Scale notes (100 TB / 1000 executors): phase 1 is embarrassingly parallel and
shuffle-free; the only data movement is #partitions × O(16 KB) states. The
fan-in path (``tree_merge_states``) keeps every round's group below
``fanout`` states so no single task ever materializes more than
fanout × state_size bytes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

__all__ = [
    "SketchSpec",
    "TDIGEST",
    "TDIGEST_DISCRETE",
    "AUTODIGEST",
    "HLL_INTS",
    "HLL_STRINGS",
    "CMS_INTS",
    "CMS_STRINGS",
    "BLOOM_INTS",
    "BLOOM_STRINGS",
    "DDSKETCH_SPEC",
    "KLL_SPEC",
    "MG_SPEC",
    "MOMENTS_SPEC",
    "BOTTOMK_INTS",
    "BOTTOMK_MD5",
    "BOTTOMK_STRINGS",
    "AMS_F2",
    "build_sketches",
    "build_sketch",
    "build_sketch_grouped",
    "build_weighted_digest",
    "build_weighted_digest_grouped",
    "weighted_digest_partials",
    "partials_df",
    "merge_partials",
    "fold_states",
    "sorted_and_agg",
    "tree_merge_states",
]


@dataclass(frozen=True)
class SketchSpec:
    """A mergeable sketch kind: zero / vectorized batch update / merge /
    serde. ``update`` receives a numpy array of the column's (possibly
    flattened) values. ``update_agg``, when set, ingests pre-aggregated
    (unique_values, counts) — token columns are duplicate-heavy, and a
    shared np.unique per column replaces one radix sort per sketch."""

    name: str
    make: Callable[[], Any]
    from_bytes: Callable[[bytes], Any]
    update: Callable[[Any, np.ndarray], Any]
    update_agg: Callable[[Any, np.ndarray, np.ndarray], Any] | None = None
    # sketches that need the full multiset but tolerate (benefit from)
    # pre-sorted input — shares the column's single sort (KLL)
    update_sorted: Callable[[Any, np.ndarray], Any] | None = None

    def merge_bytes(self, a: bytes | None, b: bytes | None) -> bytes | None:
        if a is None:
            return b
        if b is None:
            return a
        sk = self.from_bytes(a)
        sk.merge(self.from_bytes(b))
        return sk.to_bytes()


def _mk_tdigest(delta: float = 0.01):
    from ..sketch.tdigest import TDigest

    return SketchSpec(
        name=f"tdigest(delta={delta})",
        make=lambda: TDigest(delta=delta),
        from_bytes=lambda b: TDigest.from_bytes(b),
        update=lambda sk, v: sk.push(v),
        update_agg=lambda sk, uv, uc: sk.push(uv, uc),
    )


def _mk_autodigest(mode: str = "auto", delta: float = 0.01):
    from ..sketch.discrete import AutoDigest

    return SketchSpec(
        name=f"autodigest({mode})",
        make=lambda: AutoDigest(mode=mode, delta=delta),
        from_bytes=lambda b: AutoDigest.from_bytes(b),
        update=lambda sk, v: sk.push(v),
    )


def _mk_discrete():
    from ..sketch.discrete import DiscreteDigest

    return SketchSpec(
        name="discrete",
        make=lambda: DiscreteDigest(),
        from_bytes=lambda b: DiscreteDigest.from_bytes(b),
        update=lambda sk, v: sk.push(v),
        update_agg=lambda sk, uv, uc: sk.push(uv, uc),
    )


def _mk_discrete_str():
    from ..sketch.discrete import DiscreteDigest

    return SketchSpec(
        name="discrete_str",
        make=lambda: DiscreteDigest(is_string=True),
        from_bytes=lambda b: DiscreteDigest.from_bytes(b),
        update=lambda sk, v: sk.push(v),
    )


def _mk_hll(p: int = 14, strings: bool = False):
    from ..sketch.hll import HLL

    return SketchSpec(
        name=f"hll(p={p},{'str' if strings else 'int'})",
        make=lambda: HLL(p=p),
        from_bytes=lambda b: HLL.from_bytes(b),
        update=(
            (lambda sk, v: sk.update_strings(v))
            if strings
            else (lambda sk, v: sk.update_ints(v))
        ),
        update_agg=(
            None
            if strings
            else (lambda sk, uv, uc: sk.update_ints(uv, assume_unique=True))
        ),
    )


def _mk_cms(depth: int = 5, width: int = 8192, k_heavy: int = 64):
    from ..sketch.cms import CMS

    return SketchSpec(
        name=f"cms({depth}x{width})",
        make=lambda: CMS(depth=depth, width=width, k_heavy=k_heavy),
        from_bytes=lambda b: CMS.from_bytes(b),
        update=lambda sk, v: sk.update_ints(v),
        update_agg=lambda sk, uv, uc: sk.update_ints(uv, counts=uc),
    )


def _mk_cms_strings(depth: int = 5, width: int = 8192, k_heavy: int = 0):
    from ..sketch.cms import CMS

    return SketchSpec(
        name=f"cms_str({depth}x{width})",
        make=lambda: CMS(depth=depth, width=width, k_heavy=k_heavy),
        from_bytes=lambda b: CMS.from_bytes(b),
        update=lambda sk, v: sk.update_strings(v),
    )


def _mk_bloom(expected_items: int = 1_000_000, fpp: float = 0.01, strings=False):
    from ..sketch.bloom import BloomFilter

    return SketchSpec(
        name=f"bloom(n={expected_items},fpp={fpp})",
        make=lambda: BloomFilter(expected_items=expected_items, fpp=fpp),
        from_bytes=lambda b: BloomFilter.from_bytes(b),
        update=(
            (lambda sk, v: sk.add_strings(v))
            if strings
            else (lambda sk, v: sk.add_ints(v))
        ),
        update_agg=(
            None
            if strings
            else (lambda sk, uv, uc: sk.add_ints(uv, assume_unique=True))
        ),
    )


def _mk_ddsketch(alpha: float = 0.01):
    from ..sketch.ddsketch import DDSketch

    return SketchSpec(
        name=f"ddsketch(alpha={alpha})",
        make=lambda: DDSketch(alpha=alpha),
        from_bytes=lambda b: DDSketch.from_bytes(b),
        update=lambda sk, v: sk.update(v),
        update_agg=lambda sk, uv, uc: sk.update(uv, counts=uc),
    )


def _mk_mg(k: int = 64):
    from ..sketch.mg import MisraGries

    return SketchSpec(
        name=f"mg(k={k})",
        make=lambda: MisraGries(k=k),
        from_bytes=lambda b: MisraGries.from_bytes(b),
        update=lambda sk, v: sk.update(v),
        update_agg=lambda sk, uv, uc: sk.update_agg(uv, uc),
    )


def _mk_moments(k: int = 4):
    from ..sketch.moments import MomentsSketch

    return SketchSpec(
        name=f"moments(k={k})",
        make=lambda: MomentsSketch(k=k),
        from_bytes=lambda b: MomentsSketch.from_bytes(b),
        update=lambda sk, v: sk.update_ints(v),
        update_agg=lambda sk, uv, uc: sk.update_ints(uv, counts=uc),
    )


def _mk_kll(k: int = 200):
    from ..sketch.kll import KLL

    return SketchSpec(
        name=f"kll(k={k})",
        make=lambda: KLL(k=k),
        from_bytes=lambda b: KLL.from_bytes(b),
        update=lambda sk, v: sk.update(v),
        update_sorted=lambda sk, sv: sk.update(sv, assume_sorted=True),
    )


# default-parameter singletons (factories for custom params)
TDIGEST = _mk_tdigest
TDIGEST_DISCRETE = _mk_discrete
TDIGEST_DISCRETE_STR = _mk_discrete_str
AUTODIGEST = _mk_autodigest
HLL_INTS = lambda p=14: _mk_hll(p, strings=False)  # noqa: E731
HLL_STRINGS = lambda p=14: _mk_hll(p, strings=True)  # noqa: E731
CMS_INTS = _mk_cms
CMS_STRINGS = _mk_cms_strings
BLOOM_INTS = lambda n=1_000_000, fpp=0.01: _mk_bloom(n, fpp, False)  # noqa: E731
BLOOM_STRINGS = lambda n=1_000_000, fpp=0.01: _mk_bloom(n, fpp, True)  # noqa: E731
KLL_SPEC = _mk_kll
DDSKETCH_SPEC = _mk_ddsketch
MG_SPEC = _mk_mg
MOMENTS_SPEC = _mk_moments


def _column_values(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Arrow column -> flat numpy values. List columns are flattened through
    the Arrow offsets buffer (vectorized; null rows contribute nothing);
    full null-free list arrays take the zero-copy .values path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        if (
            col.offset == 0
            and col.null_count == 0
            and int(col.offsets[0].as_py()) == 0
            and len(col.values) == int(col.offsets[-1].as_py())
        ):
            col = col.values
        else:
            col = col.flatten()
    if col.null_count:
        col = col.drop_null()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return np.asarray(col.to_pylist(), dtype=object)
    return col.to_numpy(zero_copy_only=False)


_BINCOUNT_MAX = 1 << 21  # counting-pass bound: 2M counts = 16 MB scratch


def sorted_and_agg(
    vals: np.ndarray, want_agg: bool, want_sorted: bool
) -> tuple[np.ndarray | None, tuple[np.ndarray, np.ndarray] | None]:
    """Shared (sorted, (unique, counts)) for one integer column batch.

    Duplicate-heavy bounded-range int columns (vocab token ids, lengths)
    take an O(n) ``np.bincount`` counting pass instead of the O(n log n)
    sort — measured ~5x on 50k-vocab token columns — and the sorted array,
    when a sketch needs the full multiset (KLL), is rebuilt bit-identically
    as ``np.repeat(unique, counts)``. Values outside the counting bound
    fall back to one shared ``np.sort``. Results are exactly those of the
    sort path, so states stay bit-identical either way."""
    if not (want_agg or want_sorted) or not vals.shape[0]:
        return None, None
    uv = uc = None
    if vals.dtype.kind in "iu":
        lo, hi = int(vals.min()), int(vals.max())
        if 0 <= lo and hi < _BINCOUNT_MAX:
            # bincount refuses the uint64->intp "safe" cast; the range
            # check above makes an explicit int64 view lossless
            cv = vals.astype(np.int64, copy=False) if vals.dtype.kind == "u" else vals
            cnt = np.bincount(cv)
            nz = np.flatnonzero(cnt)
            uv = nz.astype(vals.dtype, copy=False)
            uc = cnt[nz]
    if uv is None:
        sv = np.sort(vals)
        if want_agg:
            flags = np.r_[True, sv[1:] != sv[:-1]]
            idx = np.flatnonzero(flags)
            uv = sv[idx]
            uc = np.diff(np.r_[idx, sv.shape[0]])
        return sv, ((uv, uc) if want_agg else None)
    sv = np.repeat(uv, uc) if want_sorted else None
    return sv, ((uv, uc) if want_agg else None)


def partials_df(df: DataFrame, sketches: dict[str, tuple[str, SketchSpec]]) -> DataFrame:
    """Phase 1: one row per input partition with a binary state per sketch
    plus lineage metrics (rows / values seen). Single pass over the data for
    all sketches (shared scan + shared Arrow transfer); integer columns are
    sorted at most once per batch and shared across sketches (see
    operators/scan.py for the same dispatch on the scan path)."""
    cols = sorted({c for c, _ in sketches.values()})
    names = list(sketches.keys())
    specs = {n: spec for n, (_, spec) in sketches.items()}
    col_of = {n: c for n, (c, _) in sketches.items()}
    sel = df.select(*cols)

    out_fields = [pa.field("rows", pa.int64()), pa.field("values_seen", pa.int64())]
    out_fields += [pa.field(f"state_{n}", pa.binary()) for n in names]
    out_schema = pa.schema(out_fields)

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        sks = {n: specs[n].make() for n in names}
        rows = 0
        values_seen = 0
        for batch in batches:
            rows += batch.num_rows
            cache: dict[str, np.ndarray] = {}
            for n in names:
                c = col_of[n]
                if c not in cache:
                    cache[c] = _column_values(batch.column(batch.schema.get_field_index(c)))
            sort_cache: dict[str, np.ndarray] = {}
            agg_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
            for c, vals in cache.items():
                if vals.dtype.kind not in "iub" or not vals.shape[0]:
                    continue
                wa = any(
                    specs[n].update_agg is not None
                    for n in names
                    if col_of[n] == c
                )
                ws = any(
                    specs[n].update_sorted is not None
                    for n in names
                    if col_of[n] == c
                )
                sv, agg = sorted_and_agg(vals, wa, ws)
                if sv is not None:
                    sort_cache[c] = sv
                if agg is not None:
                    agg_cache[c] = agg
            for n in names:
                c = col_of[n]
                vals = cache[c]
                if not vals.shape[0]:
                    continue
                if specs[n].update_agg is not None and c in agg_cache:
                    uv, uc = agg_cache[c]
                    specs[n].update_agg(sks[n], uv, uc)
                elif specs[n].update_sorted is not None and c in sort_cache:
                    specs[n].update_sorted(sks[n], sort_cache[c])
                else:
                    specs[n].update(sks[n], vals)
            values_seen += sum(v.shape[0] for v in cache.values())
        arrays = [
            pa.array([rows], pa.int64()),
            pa.array([values_seen], pa.int64()),
        ]
        arrays += [pa.array([sks[n].to_bytes()], pa.binary()) for n in names]
        yield pa.RecordBatch.from_arrays(arrays, schema=out_schema)

    schema_str = "rows long, values_seen long, " + ", ".join(
        f"state_{n} binary" for n in names
    )
    return sel.mapInArrow(build, schema_str)


def fold_states(states: list[bytes], spec: SketchSpec) -> bytes:
    """Deterministic balanced binary-tree fold of serialized states: sort
    by bytes first (result independent of collection order), then a fixed
    pairing tree (merge is associative-after-sort). The one fold used by
    every merge path — driver-side, scan-path groupByKey, tree rounds."""
    states = sorted(states)
    while len(states) > 1:
        nxt = []
        for i in range(0, len(states), 2):
            if i + 1 < len(states):
                nxt.append(spec.merge_bytes(states[i], states[i + 1]))
            else:
                nxt.append(states[i])
        states = nxt
    return states[0] if states else spec.make().to_bytes()


def merge_partials(
    pdf_rows: list, names: list[str], specs: dict[str, SketchSpec]
) -> dict[str, bytes]:
    """Deterministic driver-side fold of collected partial rows (see
    ``fold_states``)."""
    return {
        n: fold_states([r[f"state_{n}"] for r in pdf_rows], specs[n])
        for n in names
    }


def build_sketches(
    df: DataFrame, sketches: dict[str, tuple[str, SketchSpec]]
) -> dict[str, Any]:
    """One-pass build of several sketches over a DataFrame; returns
    deserialized final sketch objects keyed by name."""
    names = list(sketches.keys())
    specs = {n: spec for n, (_, spec) in sketches.items()}
    parts = partials_df(df, sketches)
    rows = parts.collect()
    merged = merge_partials(rows, names, specs)
    return {n: specs[n].from_bytes(merged[n]) for n in names}


def build_sketch(df: DataFrame, column: str, spec: SketchSpec) -> Any:
    return build_sketches(df, {"s": (column, spec)})["s"]


def weighted_digest_partials(
    df: DataFrame, value_col: str, weight_col: str, delta: float = 0.01
) -> DataFrame:
    """Phase 1 of the weighted form of the reference's ingest —
    ``push(x, n)`` with n != 1 (tdigest.js:82-91) — distributed: one
    t-digest state per partition built from (value, weight) column pairs
    in a single Arrow pass. Weighted and unweighted builds share the same
    merge, so ``merge_partials`` finalizes both."""
    from ..sketch.tdigest import TDigest

    sel = df.select(value_col, weight_col)
    out_schema = pa.schema(
        [pa.field("rows", pa.int64()), pa.field("state_s", pa.binary())]
    )

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        d = TDigest(delta)
        rows = 0
        for batch in batches:
            vc, wc = batch.column(0), batch.column(1)
            # nulls must be dropped JOINTLY or the value/weight arrays
            # misalign — a row contributes only if both sides are present
            if vc.null_count or wc.null_count:
                keep = pc.and_(vc.is_valid(), wc.is_valid())
                vc, wc = vc.filter(keep), wc.filter(keep)
            v = vc.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            w = wc.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            if v.shape[0]:
                d.push(v, w)
                rows += v.shape[0]
        yield pa.RecordBatch.from_arrays(
            [pa.array([rows], pa.int64()), pa.array([d.to_bytes()], pa.binary())],
            schema=out_schema,
        )

    return sel.mapInArrow(build, "rows long, state_s binary")


def build_weighted_digest(
    df: DataFrame, value_col: str, weight_col: str, delta: float = 0.01
) -> Any:
    """Distributed weighted t-digest: quantiles/CDF of the value column
    where each row carries ``weight_col`` mass."""
    spec = _mk_tdigest(delta)
    rows = weighted_digest_partials(df, value_col, weight_col, delta).collect()
    merged = merge_partials(rows, ["s"], {"s": spec})
    return spec.from_bytes(merged["s"])


def build_weighted_digest_grouped(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    delta: float = 0.01,
) -> DataFrame:
    """Grouped form of the weighted ingest (VERDICT r3 item 6): one
    weighted t-digest per key, two-phase like ``build_sketch_grouped`` —
    per-(partition, key) partials built in a vectorized pandas pass, then
    only O(16 KB) states shuffle to the per-key deterministic fold. Raw
    rows never shuffle, so weighted quantile monitoring composes with the
    grouped shape at 100 TB (exchange = #partitions x #keys x state size).

    Returns DataFrame[group_cols..., state binary, rows long]; states
    deserialize with ``TDigest.from_bytes``."""
    import pandas as pd

    from ..sketch.tdigest import TDigest

    spec = _mk_tdigest(delta)
    sel = df.select(*group_cols, value_col, weight_col)
    part_schema = (
        ", ".join(
            f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
        )
        + ", state binary, rows long"
    )

    def partial(pdfs: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        acc: dict[tuple, Any] = {}
        counts: dict[tuple, int] = {}
        for pdf in pdfs:
            for kr, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                if not isinstance(kr, tuple):
                    kr = (kr,)
                # value/weight nulls must drop JOINTLY (same rule as the
                # global weighted_digest_partials) or the arrays misalign
                v = pd.to_numeric(sub[value_col], errors="coerce").to_numpy(
                    np.float64, copy=False
                )
                w = pd.to_numeric(sub[weight_col], errors="coerce").to_numpy(
                    np.float64, copy=False
                )
                keep = ~(np.isnan(v) | np.isnan(w))
                if not keep.all():
                    v, w = v[keep], w[keep]
                if kr not in acc:
                    acc[kr] = TDigest(delta)
                    counts[kr] = 0
                if v.shape[0]:
                    acc[kr].push(v, w)
                    counts[kr] += v.shape[0]
        if acc:
            ks = list(acc.keys())
            out = {
                c: [
                    None if (k[i] is None or k[i] != k[i]) else k[i]
                    for k in ks
                ]
                for i, c in enumerate(group_cols)
            }
            out["state"] = [acc[k].to_bytes() for k in ks]
            out["rows"] = [counts[k] for k in ks]
            yield pd.DataFrame(out)

    parts = sel.mapInPandas(partial, part_schema)

    def final_merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        merged = fold_states([bytes(b) for b in pdf["state"]], spec)
        out = {c: [pdf[c].iloc[0]] for c in group_cols}
        out["state"] = [merged]
        out["rows"] = [int(pdf["rows"].sum())]
        return pd.DataFrame(out)

    return parts.groupBy(*group_cols).applyInPandas(final_merge, part_schema)


def tree_merge_states(
    states_df: DataFrame,
    spec: SketchSpec,
    state_col: str = "state",
    fanout: int = 16,
) -> bytes:
    """Scale path for very large partial counts: log-depth distributed
    rounds over serialized states (treeAggregate-style, per BASELINE.json
    north_star) — each round groups ~``fanout`` states per task and folds
    them, so the driver only ever receives O(1) states.

    Deterministic by construction, unlike a raw ``treeAggregate`` whose
    combiner order is scheduling-dependent: every round sorts states by
    bytes, assigns contiguous rank groups, and folds each group with the
    shared deterministic ``fold_states`` — t-digest/KLL merges are only
    associative within the error bound, so merge ORDER must be pinned for
    run-to-run reproducibility (states are O(16 KB)-O(1 MB); the extra
    sortBy shuffles touch only state bytes, never data rows)."""
    from pyspark import StorageLevel

    # persist the input states and each round's fold: sortBy (sampling
    # job) + zipWithIndex + count() + the final collect() each re-execute
    # their lineage otherwise, so the upstream partials build — including
    # its data scan — would run ~3x per round
    rdd = states_df.select(state_col).rdd.map(lambda r: bytes(r[0]))
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    n = rdd.count()
    if n == 0:
        rdd.unpersist(blocking=False)
        return spec.make().to_bytes()
    while n > fanout:
        folded = (
            rdd.sortBy(lambda b: b)
            .zipWithIndex()
            .map(lambda bi: (bi[1] // fanout, bi[0]))
            .groupByKey(numPartitions=max(1, n // fanout))
            .map(lambda kv: fold_states(list(kv[1]), spec))
        )
        folded.persist(StorageLevel.MEMORY_AND_DISK)
        n = folded.count()
        rdd.unpersist(blocking=False)
        rdd = folded
    out = fold_states(rdd.collect(), spec)
    rdd.unpersist(blocking=False)
    return out


def build_sketch_grouped(
    df: DataFrame,
    group_cols: list[str],
    column: str,
    spec: SketchSpec,
) -> DataFrame:
    """Grouped two-phase aggregate: per-(partition, key) partial states built
    vectorized, then only the tiny states shuffle to a per-key merge
    (``groupBy(keys).applyInPandas``). Raw rows never shuffle — at 100 TB the
    exchange moves #partitions × #keys × O(16 KB), not the data.

    Returns DataFrame[group_cols..., state binary, rows long] — group keys
    keep their NATIVE Spark types (round 1 stringified them, losing key
    types on output)."""
    import pandas as pd

    sel = df.select(*group_cols, column)
    part_schema = (
        ", ".join(
            f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
        )
        + ", state binary, rows long"
    )
    is_list = df.schema[column].dataType.typeName() == "array"

    def partial(pdfs: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # sketches keyed by group tuple, accumulated across all batches of
        # this partition; grouping itself is pandas-vectorized (hash groupby)
        acc: dict[tuple, Any] = {}
        counts: dict[tuple, int] = {}
        for pdf in pdfs:
            # dropna=False: a NULL group key is a real group (Spark's own
            # groupBy keeps it; pandas' default silently drops the rows)
            for kr, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                if not isinstance(kr, tuple):
                    kr = (kr,)
                if is_list:
                    arrs = [
                        a for a in sub[column].to_numpy() if a is not None
                    ]
                    vals = np.concatenate(arrs) if arrs else np.empty(0)
                else:
                    vals = sub[column].to_numpy()
                    if vals.dtype.kind == "f":
                        # nullable numerics arrive as float64 + NaN; the
                        # batch path drops nulls (_column_values) — the
                        # grouped path must match or results diverge
                        vals = vals[~np.isnan(vals)]
                    elif vals.dtype == object:
                        vals = np.asarray(
                            [v for v in vals if v is not None], dtype=object
                        )
                if kr not in acc:
                    acc[kr] = spec.make()
                    counts[kr] = 0
                if vals.shape[0]:
                    spec.update(acc[kr], vals)
                counts[kr] += len(sub)
        if acc:
            ks = list(acc.keys())
            out = {
                # null group keys (None, or NaN from pandas' null coding)
                # stay NULL in the output — Spark's groupBy keeps the null
                # group in the merge phase, same as its own aggregations;
                # non-null keys pass through with their native values
                c: [
                    None if (k[i] is None or k[i] != k[i]) else k[i]
                    for k in ks
                ]
                for i, c in enumerate(group_cols)
            }
            out["state"] = [acc[k].to_bytes() for k in ks]
            out["rows"] = [counts[k] for k in ks]
            yield pd.DataFrame(out)

    parts = sel.mapInPandas(partial, part_schema)

    def final_merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # shared deterministic balanced fold: O(log P) recompression depth
        # per key (a linear left fold recompresses O(P) times sequentially)
        merged = fold_states([bytes(b) for b in pdf["state"]], spec)
        out = {c: [pdf[c].iloc[0]] for c in group_cols}
        out["state"] = [merged]
        out["rows"] = [int(pdf["rows"].sum())]
        return pd.DataFrame(out)

    return parts.groupBy(*group_cols).applyInPandas(final_merge, part_schema)


def _mk_bottomk(k: int = 1024, strings: bool = False):
    from ..sketch.bottomk import BottomK

    return SketchSpec(
        name=f"bottomk(k={k},{'str' if strings else 'int'})",
        make=lambda: BottomK(k=k),
        from_bytes=lambda b: BottomK.from_bytes(b),
        update=(
            (lambda sk, v: sk.update_strings(v))
            if strings
            else (lambda sk, v: sk.update_ints(v))
        ),
    )


def _mk_bottomk_md5(k: int = 256):
    from ..sketch.bottomk import BottomK

    return SketchSpec(
        name=f"bottomk_md5(k={k})",
        make=lambda: BottomK(k=k),
        from_bytes=lambda b: BottomK.from_bytes(b),
        update=lambda sk, v: sk.update_md5_ints(v),
        update_agg=lambda sk, uv, uc: sk.update_md5_ints(uv, counts=uc),
    )


def _mk_ams(depth: int = 5, width: int = 1024):
    from ..sketch.ams import AMSF2

    return SketchSpec(
        name=f"ams_f2({depth}x{width})",
        make=lambda: AMSF2(depth=depth, width=width),
        from_bytes=lambda b: AMSF2.from_bytes(b),
        update=lambda sk, v: sk.update_ints(v),
        update_agg=lambda sk, uv, uc: sk.update_ints(uv, counts=uc),
    )


BOTTOMK_INTS = lambda k=1024: _mk_bottomk(k, strings=False)  # noqa: E731
BOTTOMK_STRINGS = lambda k=1024: _mk_bottomk(k, strings=True)  # noqa: E731
BOTTOMK_MD5 = _mk_bottomk_md5
AMS_F2 = _mk_ams
