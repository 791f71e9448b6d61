"""Seeded statistical accuracy tests over the reference's distribution suite
(/root/reference/distributions.js:65-111, FIXTURES.md §3).

Asserts both the reference's absolute bound (max abs err < 0.01 at
delta=0.01, specs/tdigest.spec.js:179,240) and the q(1-q)/delta shape bound
from BASELINE.json north_star."""

import zlib

import numpy as np
import pytest

from tdigest_spark.sketch.tdigest import TDigest

N = 100_000
DELTA = 0.01
GRID = np.arange(0.01, 1.0, 0.01)


def gen(name, rng):
    if name == "uniform":
        return rng.random(N)
    if name == "gaussian":
        return rng.normal(0.0, 1.0, N)
    if name == "chisq":
        return rng.normal(0, 1, (N, 3)).__pow__(2).sum(axis=1)
    if name == "exponential":
        return np.exp(-rng.random(N))
    if name == "brownian":
        return np.cumsum(rng.normal(0, 1, N))
    raise ValueError(name)


@pytest.mark.parametrize(
    "name", ["uniform", "gaussian", "chisq", "exponential", "brownian"]
)
def test_cdf_rank_accuracy(name):
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    xs = gen(name, rng)
    t = TDigest(delta=DELTA)
    t.push(xs)
    t.compress()
    sorted_xs = np.sort(xs)
    # evaluate at the exact quantile points of the data
    probe = np.quantile(xs, GRID)
    exact = np.searchsorted(sorted_xs, probe, side="right") / N
    approx = t.cdf(probe)
    err = np.abs(approx - exact)
    assert err.max() < 0.01, f"{name}: max cdf err {err.max()}"
    shape = err / (GRID * (1 - GRID))
    assert shape.max() < 4 * DELTA, f"{name}: shape bound {shape.max()}"


@pytest.mark.parametrize(
    "name", ["uniform", "gaussian", "chisq", "exponential", "brownian"]
)
def test_quantile_rank_accuracy(name):
    # measure quantile error in RANK space (value-space error is
    # distribution-dependent): cdf(quantile(p)) should be close to p
    rng = np.random.default_rng(zlib.crc32(name.encode()) + 1)
    xs = gen(name, rng)
    t = TDigest(delta=DELTA)
    t.push(xs)
    t.compress()
    sorted_xs = np.sort(xs)
    qs = t.quantile(GRID)
    achieved = np.searchsorted(sorted_xs, qs, side="right") / N
    err = np.abs(achieved - GRID)
    assert err.max() < 0.01, f"{name}: max quantile rank err {err.max()}"


def test_discrete_ints_exact():
    # example.js:25-30: floor(i/N*10-5) -> 10 distinct values, large n.
    # heavy duplication collapses to exact singleton-value centroids, so all
    # queries are exact
    i = np.arange(N, dtype=np.float64)
    xs = np.floor(i / N * 10 - 5)
    t = TDigest(delta=DELTA)
    t.push(xs)
    assert t.size == 10
    vals, counts = np.unique(xs, return_counts=True)
    np.testing.assert_array_equal(t.means, vals)
    np.testing.assert_array_equal(t.weights, counts.astype(float))
