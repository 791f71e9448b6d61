"""Property-based tests (hypothesis) for the sketch cores.

The reference's statistical specs use unseeded randoms and fixed inputs;
here the merge laws and query-semantics invariants are checked over
generated inputs. These are pure-numpy properties (no Spark session), so
hundreds of examples run in seconds.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tdigest_spark.sketch.discrete import DiscreteDigest
from tdigest_spark.sketch.hll import HLL
from tdigest_spark.sketch.tdigest import TDigest

floats = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


def _arr(xs):
    return np.asarray(xs, dtype=np.float64)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(floats, min_size=1, max_size=400),
    st.lists(floats, min_size=1, max_size=400),
)
def test_merge_commutative_bitexact(a, b):
    da, db = TDigest(0.01).push(_arr(a)), TDigest(0.01).push(_arr(b))
    ab = TDigest.from_bytes(da.to_bytes()).merge(db)
    ba = TDigest.from_bytes(db.to_bytes()).merge(da)
    assert ab.to_bytes() == ba.to_bytes()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(floats, min_size=1, max_size=200),
    st.lists(floats, min_size=1, max_size=200),
    st.lists(floats, min_size=1, max_size=200),
)
def test_merge_associative_bitexact(a, b, c):
    def d(x):
        return TDigest(0.01).push(_arr(x))

    left = d(a).merge(d(b)).merge(d(c))
    right = d(a).merge(d(b).merge(d(c)))
    assert left.to_bytes() == right.to_bytes()


@settings(max_examples=50, deadline=None)
@given(st.lists(floats, min_size=1, max_size=500))
def test_quantile_monotone_and_bounded(xs):
    d = TDigest(0.01).push(_arr(xs))
    ps = np.linspace(0, 1, 21)
    qs = d.quantile(ps)
    assert np.all(np.diff(qs) >= -1e-9)  # monotone
    assert qs[0] == min(xs) and qs[-1] == max(xs)  # exact extremes
    cs = d.cdf(np.sort(_arr(xs)))
    assert np.all(np.diff(cs) >= -1e-12)
    assert np.all((cs >= 0) & (cs <= 1))


@settings(max_examples=30, deadline=None)
@given(st.lists(floats, min_size=50, max_size=800))
def test_rank_error_within_shape_bound(xs):
    """At every DATA value x, |cdf(x) - mid_rank(x)| is within the capacity
    rule's q(1-q) envelope (mid-rank = (count_lt + count_eq/2)/n — the
    reference's boundary half-weight convention, tdigest.js:220-224).
    Probing between data values is deliberately excluded: there the true
    CDF is a step while both this engine and the reference interpolate
    linearly, which is unbounded for duplicate-heavy data by design."""
    v = np.sort(_arr(xs))
    n = len(v)
    d = TDigest(0.01).push(v)
    probe = v[:: max(1, n // 20)]
    mid = (
        np.searchsorted(v, probe, "left")
        + 0.5 * (np.searchsorted(v, probe, "right") - np.searchsorted(v, probe, "left"))
    ) / n
    est = np.atleast_1d(d.cdf(probe))
    q = np.clip(mid, 1e-9, 1 - 1e-9)
    bound = np.maximum(3 * 4 * 0.01 * q * (1 - q), 2.0 / n)
    assert np.all(np.abs(est - mid) <= bound)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=500))
def test_discrete_nearest_rank_exact(vals):
    d = DiscreteDigest().push(np.asarray(vals, dtype=np.int64))
    v = np.sort(np.asarray(vals, dtype=np.float64))
    n = len(v)
    for p in [0.01, 0.25, 0.5, 0.75, 1.0]:
        # Nearest Rank: smallest value whose cumulative count >= p*n
        k = max(int(np.ceil(p * n)), 1)
        assert d.quantile(p) == v[k - 1], p


@settings(max_examples=40, deadline=None)
@given(st.lists(floats, min_size=1, max_size=300))
def test_serde_roundtrip_bitexact(xs):
    d = TDigest(0.01).push(_arr(xs))
    r = TDigest.from_bytes(d.to_bytes())
    assert r.to_bytes() == d.to_bytes()
    assert r.n == d.n and r.vmin == d.vmin and r.vmax == d.vmax


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=2000),
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=2000),
)
def test_hll_union_is_register_max(a, b):
    ha = HLL(12).update_ints(np.asarray(a, dtype=np.int64))
    hb = HLL(12).update_ints(np.asarray(b, dtype=np.int64))
    hu = HLL.from_bytes(ha.to_bytes()).merge(hb)
    both = HLL(12).update_ints(np.asarray(a + b, dtype=np.int64))
    np.testing.assert_array_equal(hu.registers, both.registers)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(floats, min_size=0, max_size=300), min_size=1, max_size=6
    )
)
def test_kll_weight_conservation_under_merge(batches):
    """sum over levels of len(level) * 2^level == n after any sequence of
    updates and merges (total weight is exact by construction)."""
    from tdigest_spark.sketch.kll import KLL

    sks = []
    total = 0
    for b in batches:
        sk = KLL(64)
        if b:
            sk.update(_arr(b))
        total += len(b)
        sks.append(sk)
    acc = sks[0]
    for other in sks[1:]:
        acc.merge(other)
    assert acc.n == total
    weight = sum(len(buf) * (1 << lvl) for lvl, buf in enumerate(acc.levels))
    assert weight == total


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=1000)
)
def test_cms_never_underestimates(vals):
    """Count-min's one-sided guarantee: estimate >= true count, always."""
    import collections

    from tdigest_spark.sketch.cms import CMS

    c = CMS(4, 512, 0).update_ints(np.asarray(vals, dtype=np.int64))
    truth = collections.Counter(vals)
    keys = np.array(sorted(truth), dtype=np.int64)
    ests = c.estimate_ints(keys)
    for k, e in zip(keys, ests):
        assert e >= truth[int(k)]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=500)
)
def test_bloom_no_false_negatives(vals):
    from tdigest_spark.sketch.bloom import BloomFilter

    arr = np.asarray(vals, dtype=np.int64)
    bf = BloomFilter(2048, 0.01).add_ints(arr)
    assert bf.might_contain_ints(arr).all()
    # merge preserves it
    half = len(arr) // 2 or 1
    a = BloomFilter(2048, 0.01).add_ints(arr[:half])
    b = BloomFilter(2048, 0.01).add_ints(arr[half:]) if len(arr) > half else a
    a.merge(b)
    assert a.might_contain_ints(arr).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(floats, min_size=1, max_size=400))
def test_trimmed_mean_identity_and_bounds(xs):
    """trimmed_mean(0,1) == exact mean of the ingested points (centroid
    means are weight-preserving); any window stays within [min, max]."""
    d = TDigest(0.01).push(_arr(xs))
    exact_mean = float(np.mean(_arr(xs)))
    tm = d.trimmed_mean(0.0, 1.0)
    # error scale is the magnitude of the summands, not of the mean:
    # cancelling +/-1e9 values leave a tiny mean with ~1e-16*max|x|
    # absolute fp error in BOTH the numpy mean and the digest sum
    scale = max(float(np.max(np.abs(_arr(xs)))), 1.0)
    assert abs(tm - exact_mean) <= 1e-9 * scale + 1e-12
    inner = d.trimmed_mean(0.25, 0.75)
    assert min(xs) - 1e-9 <= inner <= max(xs) + 1e-9


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(floats, st.integers(min_value=1, max_value=9)),
        min_size=1,
        max_size=200,
    )
)
def test_weighted_push_equals_repeats(pairs):
    """push(values, weights) with integer weights is exactly push of the
    value repeated weight times (reference push(x, n) semantics,
    tdigest.js:82-91) — identical centroids, hence identical queries."""
    vals = _arr([v for v, _ in pairs])
    wts = _arr([w for _, w in pairs])
    dw = TDigest(0.01).push(vals, wts)
    dr = TDigest(0.01).push(np.repeat(vals, wts.astype(int)))
    assert dw.n == dr.n
    assert np.array_equal(dw.means, dr.means)
    assert np.array_equal(dw.weights, dr.weights)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(floats, st.floats(min_value=0.25, max_value=16.0)),
        min_size=2,
        max_size=200,
    )
)
def test_weighted_split_merge_consistent(pairs):
    """Splitting a weighted stream and merging the halves conserves total
    mass and keeps quantiles within the digest's interpolation envelope of
    the single-digest build (fractional weights allowed)."""
    vals = _arr([v for v, _ in pairs])
    wts = _arr([w for _, w in pairs])
    h = len(pairs) // 2
    a = TDigest(0.01).push(vals[:h], wts[:h])
    b = TDigest(0.01).push(vals[h:], wts[h:])
    a.merge(b)
    one = TDigest(0.01).push(vals, wts)
    assert abs(a.n - one.n) <= 1e-9 * max(one.n, 1.0)
    lo, hi = float(vals.min()), float(vals.max())
    for p in (0.0, 0.5, 1.0):
        qa, qo = float(a.quantile(p)), float(one.quantile(p))
        assert lo - 1e-9 <= qa <= hi + 1e-9
        # exact at the tracked extremes
        if p in (0.0, 1.0):
            assert qa == qo


# ---------------------------------------------------------------------------
# partition transform laws (hidden partitioning rests on these)
# ---------------------------------------------------------------------------


@given(st.integers(min_value=-(2**62), max_value=2**62), st.integers(1, 1000))
def test_truncate_int_laws(v, w):
    from tdigest_spark.sources.iceberg_partition import apply_transform

    t = apply_transform(f"truncate[{w}]", v)
    assert t <= v < t + w  # a floor: the value sits inside its bucket
    assert t % w == 0  # bucket boundaries are multiples of the width
    # idempotent and order-preserving
    assert apply_transform(f"truncate[{w}]", t) == t


@given(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.integers(1, 1000),
)
def test_truncate_int_order_preserving(a, b, w):
    from tdigest_spark.sources.iceberg_partition import apply_transform

    ta = apply_transform(f"truncate[{w}]", a)
    tb = apply_transform(f"truncate[{w}]", b)
    if a <= b:
        assert ta <= tb


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1), st.integers(1, 512))
def test_bucket_range_and_determinism(v, n):
    from tdigest_spark.sources.iceberg_partition import apply_transform

    b = apply_transform(f"bucket[{n}]", v)
    assert 0 <= b < n
    assert b == apply_transform(f"bucket[{n}]", v)


@given(st.text(max_size=40), st.integers(1, 16))
def test_truncate_str_prefix_law(sv, w):
    from tdigest_spark.sources.iceberg_partition import apply_transform

    t = apply_transform(f"truncate[{w}]", sv)
    assert sv.startswith(t) and len(t) <= w


@given(
    st.datetimes(
        min_value=__import__("datetime").datetime(1901, 1, 1),
        max_value=__import__("datetime").datetime(2200, 1, 1),
    )
)
def test_time_transform_hierarchy(ts):
    """year/month/day/hour transforms must nest consistently (the spec's
    transform-ordering property that lets a spec evolve to finer grains)."""
    from tdigest_spark.sources.iceberg_partition import apply_transform

    y = apply_transform("year", ts)
    m = apply_transform("month", ts)
    d = apply_transform("day", ts)
    h = apply_transform("hour", ts)
    assert m // 12 == y
    assert h // 24 == d
    # month of the day transform's date == month transform
    assert (ts.year - 1970) * 12 + ts.month - 1 == m


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**50), min_size=0, max_size=500
    )
)
def test_deletion_vector_codec_roundtrip(positions):
    """The DV blob is a lossless set codec: decode(encode(S)) is the
    sorted deduplicated positions for ANY input multiset — the property
    merge-on-write and the MOR readers both rely on."""
    from tdigest_spark.sources.iceberg import (
        decode_deletion_vector,
        encode_deletion_vector,
    )

    assert decode_deletion_vector(encode_deletion_vector(positions)) == sorted(
        set(positions)
    )
