"""Scalar sketch-query functions over state columns.

Arrow-batched pandas UDFs (never row-at-a-time Python UDFs) that evaluate
sketch queries against serialized state BinaryType columns. All follow SQL
NULL-in -> NULL-out semantics (outer joins produce null states) — the Spark
analogue of the reference's query entry points percentile/p_rank
(/root/reference/tdigest.js:272-310, 216-255).

Deserialization is memoized per Arrow batch: probing ONE broadcast state
against millions of rows parses the state bytes once per batch, not once
per row (a fresh dict per batch, so grouped-digest workloads with millions
of distinct states can't accumulate an unbounded cache across batches)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

__all__ = [
    "digest_quantile",
    "digest_cdf",
    "digest_trimmed_mean",
    "digest_count",
    "digest_size",
    "hll_estimate",
    "kll_quantile",
    "bloom_might_contain_int",
    "cms_estimate_int",
    "register_digest_centroids_udtf",
    "register_dynamic_pivot_udtf",
    "register_sql_functions",
    "digest_quantiles",
    "digest_cdfs",
]


def _batch_loader(cls):
    """Per-batch memoized `cls.from_bytes`: one deserialization per
    distinct state value per Arrow batch. Call INSIDE the UDF body so the
    cache dies with the batch."""
    cache: dict[bytes, object] = {}

    def load(b):
        key = bytes(b)
        obj = cache.get(key)
        if obj is None:
            obj = cls.from_bytes(key)
            cache[key] = obj
        return obj

    return load


def register_sql_functions(spark, prefix: str = "") -> list[str]:
    """Register the sketch-query surface as SQL functions (two-arg forms:
    the scalar parameter is a column, so they compose in `spark.sql`
    strings, views, and thriftserver sessions). Returns the registered
    names. All are Arrow-batched pandas UDFs over BinaryType state
    columns; parameters vary per row, matching the reference's vectorized
    percentile([..])/p_rank([..]) arg forms (tdigest.js:216-231,272-290)."""
    from ..sketch.bloom import BloomFilter
    from ..sketch.cms import CMS
    from ..sketch.hll import HLL
    from ..sketch.kll import KLL
    from ..sketch.tdigest import TDigest

    def _null(*args) -> bool:
        # SQL semantics: NULL in -> NULL out (outer joins, nullable params)
        return any(a is None or (isinstance(a, float) and a != a) for a in args)

    @pandas_udf("double")
    def _dq(states: pd.Series, ps: pd.Series) -> pd.Series:
        load = _batch_loader(TDigest)
        return pd.Series(
            [
                None if _null(b, p) else float(load(b).quantile(float(p)))
                for b, p in zip(states, ps)
            ],
            dtype="float64",
        )

    @pandas_udf("double")
    def _dc(states: pd.Series, xs: pd.Series) -> pd.Series:
        load = _batch_loader(TDigest)
        return pd.Series(
            [
                None if _null(b, x) else float(load(b).cdf(float(x)))
                for b, x in zip(states, xs)
            ],
            dtype="float64",
        )

    @pandas_udf("double")
    def _dt(states: pd.Series, los: pd.Series, his: pd.Series) -> pd.Series:
        load = _batch_loader(TDigest)
        return pd.Series(
            [
                None
                if _null(b, lo, hi)
                else float(load(b).trimmed_mean(float(lo), float(hi)))
                for b, lo, hi in zip(states, los, his)
            ],
            dtype="float64",
        )

    @pandas_udf("double")
    def _he(states: pd.Series) -> pd.Series:
        load = _batch_loader(HLL)
        return states.map(lambda b: None if b is None else load(b).estimate())

    @pandas_udf("double")
    def _kq(states: pd.Series, ps: pd.Series) -> pd.Series:
        load = _batch_loader(KLL)
        return pd.Series(
            [
                None if _null(b, p) else float(load(b).quantile(float(p)))
                for b, p in zip(states, ps)
            ],
            dtype="float64",
        )

    @pandas_udf("boolean")
    def _bm(states: pd.Series, vs: pd.Series) -> pd.Series:
        load = _batch_loader(BloomFilter)
        return pd.Series(
            [
                None
                if _null(b, v)
                else bool(load(b).might_contain_ints(np.array([int(v)]))[0])
                for b, v in zip(states, vs)
            ],
            dtype="object",
        )

    @pandas_udf("long")
    def _ce(states: pd.Series, vs: pd.Series) -> pd.Series:
        load = _batch_loader(CMS)
        return pd.Series(
            [
                None
                if _null(b, v)
                else int(load(b).estimate_ints(np.array([int(v)]))[0])
                for b, v in zip(states, vs)
            ],
            dtype="object",
        )

    # SQL numeric literals type as DECIMAL -> decimal.Decimal in pandas;
    # every parameter is coerced (float/int) above so the functions accept
    # plain literals in SQL strings.
    fns = {
        "digest_quantile": _dq,
        "digest_cdf": _dc,
        "digest_trimmed_mean": _dt,
        "hll_estimate": _he,
        "kll_quantile": _kq,
        "bloom_might_contain": _bm,
        "cms_estimate": _ce,
    }
    names = []
    for name, fn in fns.items():
        spark.udf.register(prefix + name, fn)
        names.append(prefix + name)
    return names


def digest_quantile(state_col, p: float):
    from ..sketch.tdigest import TDigest

    @pandas_udf("double")
    def q(states: pd.Series) -> pd.Series:
        load = _batch_loader(TDigest)
        return states.map(
            lambda b: None if b is None else float(load(b).quantile(p))
        )

    return q(state_col)


def digest_cdf(state_col, x: float):
    from ..sketch.tdigest import TDigest

    @pandas_udf("double")
    def c(states: pd.Series) -> pd.Series:
        load = _batch_loader(TDigest)
        return states.map(lambda b: None if b is None else float(load(b).cdf(x)))

    return c(state_col)


def digest_trimmed_mean(state_col, lo: float, hi: float):
    from ..sketch.tdigest import TDigest

    @pandas_udf("double")
    def t(states: pd.Series) -> pd.Series:
        load = _batch_loader(TDigest)
        return states.map(
            lambda b: None if b is None else float(load(b).trimmed_mean(lo, hi))
        )

    return t(state_col)


def digest_count(state_col):
    from ..sketch.tdigest import TDigest

    @pandas_udf("double")
    def n(states: pd.Series) -> pd.Series:
        load = _batch_loader(TDigest)
        return states.map(lambda b: None if b is None else float(load(b).n))

    return n(state_col)


def digest_size(state_col):
    from ..sketch.tdigest import TDigest

    @pandas_udf("long")
    def s(states: pd.Series) -> pd.Series:
        load = _batch_loader(TDigest)
        return states.map(lambda b: None if b is None else load(b).size)

    return s(state_col)


def hll_estimate(state_col):
    from ..sketch.hll import HLL

    @pandas_udf("double")
    def e(states: pd.Series) -> pd.Series:
        load = _batch_loader(HLL)
        return states.map(lambda b: None if b is None else load(b).estimate())

    return e(state_col)


def kll_quantile(state_col, p: float):
    from ..sketch.kll import KLL

    @pandas_udf("double")
    def q(states: pd.Series) -> pd.Series:
        load = _batch_loader(KLL)
        return states.map(
            lambda b: None if b is None else float(load(b).quantile(p))
        )

    return q(state_col)


def bloom_might_contain_int(state_col, value: int):
    from ..sketch.bloom import BloomFilter

    @pandas_udf("boolean")
    def m(states: pd.Series) -> pd.Series:
        load = _batch_loader(BloomFilter)
        return states.map(
            lambda b: None
            if b is None
            else bool(load(b).might_contain_ints(np.array([value]))[0])
        )

    return m(state_col)


def cms_estimate_int(state_col, value: int):
    from ..sketch.cms import CMS

    @pandas_udf("long")
    def e(states: pd.Series) -> pd.Series:
        load = _batch_loader(CMS)
        return states.map(
            lambda b: None
            if b is None
            else int(load(b).estimate_ints(np.array([value]))[0])
        )

    return e(state_col)


def register_digest_centroids_udtf(spark, name: str = "digest_centroids"):
    """Python UDTF (table function) exploding a serialized digest state
    into centroid rows — the Spark analogue of the reference's
    toArray() export (tdigest.js:46-57). Usable from SQL after
    registration:

        SELECT s.l_returnflag, c.mean, c.weight
        FROM states s, LATERAL digest_centroids(s.state) c
    """
    from pyspark.sql.functions import udtf

    from ..sketch.tdigest import TDigest

    @udtf(returnType="mean double, weight double")
    class DigestCentroids:
        def eval(self, state):
            if state is None:
                return
            for m, w in TDigest.from_bytes(bytes(state)).centroids():
                yield float(m), float(w)

    spark.udtf.register(name, DigestCentroids)
    return DigestCentroids


def register_dynamic_pivot_udtf(spark, name: str = "dynamic_pivot"):
    """POLYMORPHIC Python UDTF (``analyze()``-based, Spark 4): a dynamic
    PIVOT whose OUTPUT COLUMNS are derived at plan time from a constant
    argument — the thing SQL's static PIVOT clause cannot express. Call
    shape::

        SELECT * FROM dynamic_pivot(
          TABLE(SELECT user_id, event_type FROM ev) PARTITION BY (user_id),
          'click,view')

    ``analyze`` receives the arguments' types/values before execution and
    returns the schema ``user_id, n_click, n_view`` (StructType built
    directly — ``analyze`` runs in a plain worker process with no Spark
    session, so DDL-string parsing is unavailable there); ``eval`` then
    counts per partition and ``terminate`` emits one pivoted row per key.
    Scale shape: TABLE ... PARTITION BY shuffles once on the key; each
    partition streams through one UDTF instance with O(#types) state."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class DynamicPivot:
        @staticmethod
        def analyze(
            table_arg: AnalyzeArgument, types_csv: AnalyzeArgument
        ) -> AnalyzeResult:
            if types_csv.value is None:
                raise ValueError("dynamic_pivot needs a constant type list")
            types = [t.strip() for t in str(types_csv.value).split(",")]
            fields = [StructField("user_id", LongType())] + [
                StructField(f"n_{t}", LongType()) for t in types
            ]
            return AnalyzeResult(schema=StructType(fields))

        def __init__(self):
            self.key = None
            self.counts: dict = {}
            self.types = None

        def eval(self, row, types_csv: str):
            if self.types is None:
                self.types = [t.strip() for t in types_csv.split(",")]
            self.key = row[0]
            t = row[1]
            self.counts[t] = self.counts.get(t, 0) + 1

        def terminate(self):
            if self.key is not None:
                yield (
                    self.key,
                    *[self.counts.get(t, 0) for t in self.types],
                )

    spark.udtf.register(name, udtf(DynamicPivot))
    return DynamicPivot


def digest_quantiles(state_col, ps: list[float]):
    """Vectorized-argument form (reference percentile([p...]),
    tdigest.js:272-290): array of quantiles per state row."""
    from ..sketch.tdigest import TDigest

    pvec = [float(p) for p in ps]

    @pandas_udf("array<double>")
    def q(states: pd.Series) -> pd.Series:
        load = _batch_loader(TDigest)
        return states.map(
            lambda b: [
                float(x)
                for x in np.atleast_1d(load(b).quantile(np.array(pvec)))
            ]
        )

    return q(state_col)


def digest_cdfs(state_col, xs: list[float]):
    """Vectorized-argument form (reference p_rank([x...]),
    tdigest.js:216-231): array of percentile-ranks per state row."""
    from ..sketch.tdigest import TDigest

    xvec = [float(x) for x in xs]

    @pandas_udf("array<double>")
    def c(states: pd.Series) -> pd.Series:
        load = _batch_loader(TDigest)
        return states.map(
            lambda b: [
                float(x) for x in np.atleast_1d(load(b).cdf(np.array(xvec)))
            ]
        )

    return c(state_col)
