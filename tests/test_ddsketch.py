"""DDSketch: relative-error guarantee, exact-integer merge determinism
(bit-identical across any partition layout, like HLL/CMS/Bloom), serde,
negative/zero handling, and the oracle's bucket-boundary margin on the
benchmark column."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tdigest_spark.sketch.ddsketch import DDSketch


def test_relative_error_bound_lognormal():
    rng = np.random.default_rng(11)
    v = rng.lognormal(4, 1.5, 100_000)
    sk = DDSketch(alpha=0.01).update(v)
    ps = np.array([0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999])
    est = sk.quantile(ps)
    exact = np.quantile(v, ps)
    assert (np.abs(est / exact - 1) <= 0.0101).all()


def test_merge_bit_identical_any_layout():
    rng = np.random.default_rng(3)
    v = rng.exponential(50, 50_000)
    whole = DDSketch(0.02).update(v).to_bytes()
    for nparts, order in [(7, 1), (13, -1), (32, 1)]:
        acc = DDSketch(0.02)
        for p in np.array_split(v, nparts)[::order]:
            acc.merge(DDSketch(0.02).update(p))
        assert acc.to_bytes() == whole


def test_counts_weighted_equals_expanded():
    uv = np.array([1.5, 2.0, 700.0, 700.0 + 1e-9, 9.9e5])
    uc = np.array([3, 1, 10, 2, 5])
    a = DDSketch(0.01).update(uv, counts=uc)
    b = DDSketch(0.01).update(np.repeat(uv, uc))
    assert a.to_bytes() == b.to_bytes()
    assert a.n == int(uc.sum())


def test_serde_roundtrip_and_magic():
    sk = DDSketch(0.05).update(np.array([-3.0, 0.0, 0.0, 2.5, 1e9]))
    back = DDSketch.from_bytes(sk.to_bytes())
    assert back.to_bytes() == sk.to_bytes()
    assert back.n == 5 and back.zero_count == 2
    with pytest.raises(ValueError, match="not a DDSketch"):
        DDSketch.from_bytes(b"XXXX" + sk.to_bytes()[4:])


def test_negatives_zeros_ordering():
    v = np.concatenate([-np.arange(1.0, 101.0), [0.0] * 50, np.arange(1.0, 101.0)])
    sk = DDSketch(0.01).update(v)
    assert sk.quantile(0.5) == 0.0
    assert sk.quantile(0.0) < 0
    assert sk.quantile(1.0) > 0
    # cdf monotone
    xs = np.array([-150.0, -1.0, 0.0, 1.0, 150.0])
    c = sk.cdf(xs)
    assert (np.diff(c) >= 0).all()


def test_nonfinite_dropped():
    sk = DDSketch(0.01).update(np.array([1.0, np.nan, np.inf, -np.inf, 2.0]))
    assert sk.n == 2


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.floats(min_value=1e-6, max_value=1e12, allow_nan=False),
        min_size=1,
        max_size=300,
    )
)
def test_hypothesis_relative_error_and_merge(xs):
    v = np.asarray(xs)
    sk = DDSketch(0.01).update(v)
    # every estimate within alpha of SOME sample value's bucket; spot the median
    est = sk.quantile(0.5)
    exact = np.quantile(v, 0.5, method="inverted_cdf")
    assert abs(est / exact - 1) <= 0.0101
    # split-merge identity
    half = len(xs) // 2
    m = DDSketch(0.01).update(v[:half]).merge(DDSketch(0.01).update(v[half:]))
    assert m.to_bytes() == sk.to_bytes()


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_oracle_boundary_margin(sf):
    """The SQL oracle computes ceil(ln(x)/ln(gamma)) in DuckDB's libm while
    the sketch uses numpy's — exactness needs every data point to sit far
    (>=1e-8 quotient-units, ~1e4 ulps) from an integer boundary, at every
    scale factor the oracle gate runs."""
    import pyarrow.parquet as pq

    v = (
        pq.read_table(
            f"/root/testdata/{sf}/lineitem.parquet", columns=["l_extendedprice"]
        )["l_extendedprice"]
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    gamma = 1.01 / 0.99
    q = np.log(v) / math.log(gamma)
    assert np.abs(q - np.round(q)).min() > 1e-8
