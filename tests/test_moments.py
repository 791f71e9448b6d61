"""Moments sketch: exact-integer power sums, bit-identical merge law,
serde, and statistics vs numpy (population moments)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tdigest_spark.sketch.moments import MomentsSketch


def _build(vals: np.ndarray) -> MomentsSketch:
    return MomentsSketch().update_ints(vals)


def test_stats_match_numpy():
    rng = np.random.default_rng(11)
    x = rng.integers(-40, 200, size=50_000)
    sk = _build(x)
    assert sk.n == x.size
    assert sk.mean() == pytest.approx(x.mean(), rel=1e-12)
    assert sk.variance() == pytest.approx(x.var(), rel=1e-12)
    xf = x.astype(np.float64)
    m = xf.mean()
    m3 = ((xf - m) ** 3).mean()
    m4 = ((xf - m) ** 4).mean()
    sd = xf.std()
    assert sk.skewness() == pytest.approx(m3 / sd**3, rel=1e-9)
    assert sk.kurtosis() == pytest.approx(m4 / sd**4, rel=1e-9)


def test_merge_bit_identical_any_split():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 50_257, size=120_000)
    full = _build(x)
    for cuts in ([30_000], [1, 119_999], [40_000, 80_000, 100_000]):
        parts = np.split(x, cuts)
        merged = MomentsSketch()
        for p in parts:
            merged.merge(MomentsSketch.from_bytes(_build(p).to_bytes()))
        assert merged.to_bytes() == full.to_bytes()
    # commutativity: reverse merge order is the same state
    a, b = _build(x[:60_000]), _build(x[60_000:])
    ab = MomentsSketch.from_bytes(a.to_bytes()).merge(b)
    ba = MomentsSketch.from_bytes(b.to_bytes()).merge(a)
    assert ab.to_bytes() == ba.to_bytes()


def test_no_overflow_at_extreme_magnitudes():
    # int64 cents-scale values whose 4th powers are far past int64/int128
    # per-element ranges still accumulate exactly (Python int path)
    v = np.array([2**40, -(2**40), 2**40 - 1], dtype=np.int64)
    sk = _build(v)
    assert sk.sums[3] == 2 * (2**160) + (2**40 - 1) ** 4
    rt = MomentsSketch.from_bytes(sk.to_bytes())
    assert rt.sums == sk.sums and rt.n == sk.n


def test_update_agg_path_matches_raw():
    rng = np.random.default_rng(3)
    x = rng.integers(1, 51, size=10_000)
    uv, uc = np.unique(x, return_counts=True)
    raw = _build(x)
    agg = MomentsSketch().update_ints(uv, counts=uc)
    assert raw.to_bytes() == agg.to_bytes()


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=-(10**6), max_value=10**6), min_size=2, max_size=300),
    st.integers(min_value=1, max_value=299),
)
def test_hypothesis_merge_associativity(vals, cut):
    cut = min(cut, len(vals) - 1)
    x = np.array(vals, dtype=np.int64)
    full = _build(x)
    merged = _build(x[:cut]).merge(_build(x[cut:]))
    assert merged.to_bytes() == full.to_bytes()
    # exactness of the first two moments against Python-int ground truth
    assert merged.sums[0] == sum(int(v) for v in vals)
    assert merged.sums[1] == sum(int(v) * int(v) for v in vals)
