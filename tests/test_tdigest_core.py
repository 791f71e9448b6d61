"""Golden-vector tests ported from the reference spec suite
(/root/reference/specs/tdigest.spec.js) per FIXTURES.md §2 — continuous mode.
"""

import numpy as np
import pytest

from tdigest_spark.sketch.tdigest import TDigest


def td(values, delta=0.01, K=25.0):
    t = TDigest(delta=delta, K=K)
    t.push(values)
    return t


# --- centroid layout (specs/tdigest.spec.js:5-73) ---------------------------


def test_single_point_centroid():
    assert td([0.0]).centroids() == [(0.0, 1.0)]


def test_two_points_two_centroids():
    assert td([0.0, 1.0]).centroids() == [(0.0, 1.0), (1.0, 1.0)]


def test_duplicates_collapse():
    # 100 x push(1000) -> one centroid (specs/tdigest.spec.js:49-57)
    t = td([1000.0] * 100)
    assert t.centroids() == [(1000.0, 100.0)]
    assert t.n == 100


def test_triple_duplicates():
    # 10 x [0, 1, 0.5] -> three centroids n=10 each (:58-72)
    t = td([0.0, 1.0, 0.5] * 10)
    assert t.centroids() == [(0.0, 10.0), (0.5, 10.0), (1.0, 10.0)]


def test_monotone_bounds_preserved_and_compressed():
    # 10k monotone values: exact min/max survive compression, centroid
    # count far below 10k (:75-101)
    xs = np.arange(10000, dtype=np.float64) * 10.0
    t = td(xs)
    t.compress()
    assert t.means[0] == 0.0
    assert t.means[-1] == 99990.0
    assert t.size < 5000
    assert t.quantile(0.0) == 0.0
    assert t.quantile(1.0) == 99990.0


# --- p_rank / cdf (specs/tdigest.spec.js:104-190) ----------------------------


def test_cdf_empty():
    t = TDigest()
    assert np.isnan(t.cdf(1.0))


def test_cdf_single_point():
    t = td([0.0])
    np.testing.assert_allclose(
        t.cdf([-0.5, 0.0, 0.5, 1.0, 1.5]), [0, 0.5, 1, 1, 1]
    )


def test_cdf_two_points():
    t = td([0.0, 1.0])
    np.testing.assert_allclose(
        t.cdf([-0.5, 0.0, 0.5, 1.0, 1.5]), [0, 0.25, 0.5, 0.75, 1]
    )


def test_cdf_three_points():
    t = td([-1.0, 0.0, 1.0])
    np.testing.assert_allclose(
        t.cdf([-1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5]),
        [0, 1 / 6, 2 / 6, 3 / 6, 4 / 6, 5 / 6, 1],
    )


def test_cdf_four_points():
    t = td([10.0, 11.0, 12.0, 13.0])
    np.testing.assert_allclose(
        t.cdf([9.0, 10.0, 11.0, 12.0, 13.0, 14.0]),
        [0, 1 / 8, 3 / 8, 5 / 8, 7 / 8, 1],
    )


def test_cdf_scale_invariance():
    # p_rank unchanged when dataset pushed k more times (:139-148,156-165)
    xs = list(np.linspace(0, 1, 10))
    t1 = td(xs)
    r1 = t1.cdf(xs)
    t3 = td(xs * 3)
    np.testing.assert_allclose(t3.cdf(xs), r1)


# --- percentile / quantile (specs/tdigest.spec.js:192-242) -------------------


def test_quantile_empty():
    t = TDigest()
    assert np.isnan(t.quantile(0.5))


def test_quantile_single_point():
    np.testing.assert_allclose(td([0.0]).quantile([0, 0.5, 1.0]), [0, 0, 0])


def test_quantile_two_points_with_clamping():
    t = td([0.0, 1.0])
    np.testing.assert_allclose(
        t.quantile([-0.25, 0, 0.25, 0.5, 0.625, 0.75, 1.0, 1.25]),
        [0, 0, 0, 0.5, 0.75, 1, 1, 1],
    )


def test_quantile_three_points():
    np.testing.assert_allclose(
        td([0.0, 0.5, 1.0]).quantile([0, 0.25, 0.5, 0.75, 1.0]),
        [0, 0.125, 0.5, 0.875, 1.0],
    )


def test_quantile_four_points():
    np.testing.assert_allclose(
        td([10.0, 11.0, 12.0, 13.0]).quantile([0, 0.25, 0.5, 0.75, 1.0]),
        [10, 10.5, 11.5, 12.5, 13],
    )


# --- statistical accuracy (specs/tdigest.spec.js:166-180,227-242, seeded) ----


def test_uniform_accuracy_100k():
    rng = np.random.default_rng(42)
    xs = rng.random(100_000)
    t = td(xs)
    t.compress()
    ps = np.arange(0.01, 1.0, 0.01)
    exact_q = np.quantile(xs, ps)
    err_q = np.abs(t.quantile(ps) - exact_q)
    assert err_q.max() < 0.01
    grid = np.arange(0.01, 1.0, 0.01)
    exact_cdf = np.searchsorted(np.sort(xs), grid, side="right") / xs.size
    err_c = np.abs(t.cdf(grid) - exact_cdf)
    assert err_c.max() < 0.01
    # q(1-q)/delta shape bound (BASELINE.json north_star); reference measured
    # ~2.1*delta — allow 4*delta headroom
    shape = err_c / (grid * (1 - grid))
    assert shape.max() < 4 * 0.01


def test_centroid_count_bounded():
    rng = np.random.default_rng(7)
    t = td(rng.random(1_000_000))
    t.compress()
    # reference: 757 post-compress at 1M, bound K/delta = 2500
    assert t.size < 2500


# --- trimmed mean -------------------------------------------------------------


def test_trimmed_mean_exact_on_singletons():
    xs = np.arange(1.0, 11.0)  # 1..10
    t = td(xs)
    # 10% trim each side drops 1 and 10 exactly
    assert t.trimmed_mean(0.1, 0.9) == pytest.approx(np.mean(xs[1:-1]))
    assert t.trimmed_mean(0.0, 1.0) == pytest.approx(xs.mean())


def test_trimmed_mean_approx_continuous():
    rng = np.random.default_rng(3)
    xs = rng.normal(0, 1, 200_000)
    t = td(xs)
    t.compress()
    lo, hi = np.quantile(xs, [0.05, 0.95])
    exact = xs[(xs >= lo) & (xs <= hi)].mean()
    assert t.trimmed_mean(0.05, 0.95) == pytest.approx(exact, abs=5e-3)


# --- serialization ------------------------------------------------------------


def test_serde_roundtrip():
    rng = np.random.default_rng(1)
    t = td(rng.random(50_000))
    b = t.to_bytes()
    t2 = TDigest.from_bytes(b)
    assert t2.to_bytes() == b
    np.testing.assert_array_equal(t2.means, t.means)
    np.testing.assert_array_equal(t2.weights, t.weights)
    assert (t2.n, t2.vmin, t2.vmax) == (t.n, t.vmin, t.vmax)


def test_serde_empty():
    t = TDigest()
    t2 = TDigest.from_bytes(t.to_bytes())
    assert t2.size == 0 and t2.n == 0


def test_weighted_push_equals_expanded():
    """push(x, n) parity (reference tdigest.js:82-91 accepts arbitrary
    weights): weighted ingest must equal ingesting each value repeated."""
    import numpy as np

    from tdigest_spark.sketch.tdigest import TDigest

    vals = np.array([3.0, 1.0, 4.0, 1.5, 9.0])
    wts = np.array([5.0, 2.0, 1.0, 7.0, 3.0])
    a = TDigest(0.01).push(vals, wts)
    b = TDigest(0.01).push(np.repeat(vals, wts.astype(int)))
    assert a.n == b.n == wts.sum()
    for p in [0.0, 0.25, 0.5, 0.75, 1.0]:
        assert a.quantile(p) == b.quantile(p), p
    # fractional weights are accepted too (reference allows any n > 0)
    c = TDigest(0.01).push(np.array([1.0, 2.0]), np.array([0.5, 1.5]))
    assert c.n == 2.0 and c.quantile(1.0) == 2.0


def test_serde_roundtrips_K():
    """A custom compression trigger (K) must survive serde — every merge
    round-trips through from_bytes, so dropping K would silently restore
    the default trigger."""
    import numpy as np

    from tdigest_spark.sketch.tdigest import TDigest

    t = TDigest(0.01, K=100.0)
    t.push(np.arange(5000.0))
    r = TDigest.from_bytes(t.to_bytes())
    assert r.K == 100.0
    assert r.to_bytes() == t.to_bytes()
    t0 = TDigest(0.01, K=0)  # K=0 disables lazy compression
    t0.push(np.arange(100.0))
    assert TDigest.from_bytes(t0.to_bytes()).K == 0.0


def test_winsorized_mean_matches_numpy_and_edges():
    """winsorized_mean vs an exact numpy winsorize on duplicate-heavy
    data (singleton-value centroids => exact), plus edge windows."""
    import numpy as np

    from tdigest_spark.sketch.tdigest import TDigest

    rng = np.random.default_rng(3)
    xs = rng.integers(1, 51, 40_000).astype(np.float64)
    d = TDigest(delta=0.01)
    d.push(xs)
    for lo, hi in ((0.0, 1.0), (0.05, 0.95), (0.25, 0.75)):
        q_lo, q_hi = d.quantile(lo), d.quantile(hi)
        srt = np.sort(xs)
        n = len(xs)
        h_lo, h_hi = lo * n, hi * n
        # exact reference: fractional tail masses at the cut values plus
        # the pro-rated body (positions are integers, cuts fractional)
        idx = np.arange(n, dtype=np.float64)
        w = np.clip(np.minimum(idx + 1, h_hi) - np.maximum(idx, h_lo), 0, None)
        expect = (h_lo * q_lo + float(np.dot(srt, w)) + (n - h_hi) * q_hi) / n
        got = d.winsorized_mean(lo, hi)
        assert abs(got - expect) < 1e-9, (lo, hi, got, expect)
    # full window equals the plain mean exactly
    assert abs(d.winsorized_mean(0.0, 1.0) - xs.mean()) < 1e-9
    # degenerate window
    assert np.isnan(TDigest().winsorized_mean(0.1, 0.9))
