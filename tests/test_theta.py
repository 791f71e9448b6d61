"""Theta sketch: set-algebra estimates, composition, exactness laws.

The build/merge path is BottomK (partition-invariance proven in
test_companions.py); these tests cover the theta normalization and the
set algebra on top of it."""

import numpy as np
import pytest

from tdigest_spark.sketch.bottomk import BottomK
from tdigest_spark.sketch.theta import ThetaSketch


def _sk(values, k=64):
    return ThetaSketch.from_bottomk(BottomK(k=k).update_md5_ints(np.asarray(values)))


def test_unsaturated_is_exact():
    a = _sk(np.arange(40), k=64)
    b = _sk(np.arange(20, 60), k=64)
    assert a.theta == 2**64 and a.theta_frac == 1.0
    assert a.estimate() == 40.0
    assert a.intersect_estimate(b) == 20.0
    assert a.union_estimate(b) == 60.0
    assert a.a_not_b_estimate(b) == 20.0
    assert b.a_not_b_estimate(a) == 20.0


def test_saturated_estimates_within_kmv_error():
    rng = np.random.default_rng(7)
    uni = rng.choice(200_000, size=60_000, replace=False)
    a_v, b_v = uni[:40_000], uni[20_000:]  # |A∩B| = 20k, |A∪B| = 60k
    k = 1024
    a, b = _sk(a_v, k=k), _sk(b_v, k=k)
    assert a.size == k - 1 and a.theta < 2**64
    # KMV relative error ~ 1/sqrt(k) ≈ 3.1%; allow 5 sigma
    tol = 5.0 / np.sqrt(k)
    assert abs(a.estimate() - 40_000) < 40_000 * tol
    assert abs(a.union_estimate(b) - 60_000) < 60_000 * tol
    assert abs(a.intersect_estimate(b) - 20_000) < 60_000 * tol
    assert abs(a.a_not_b_estimate(b) - 20_000) < 60_000 * tol


def test_inclusion_exclusion_consistency():
    rng = np.random.default_rng(11)
    uni = rng.choice(1_000_000, size=30_000, replace=False)
    a, b = _sk(uni[:20_000], k=512), _sk(uni[10_000:], k=512)
    # at a COMMON theta, |A| ∩-∪ decomposition is exact by construction:
    thr = min(a.theta, b.theta)
    below = float(a._below(thr).shape[0])
    est_a_at_thr = below / (thr / 2.0**64)
    got = a.intersect_estimate(b) + a.a_not_b_estimate(b)
    assert got == pytest.approx(est_a_at_thr, rel=1e-12)


def test_composition_of_derived_sketches():
    a = _sk(np.arange(0, 100), k=256)
    b = _sk(np.arange(50, 150), k=256)
    c = _sk(np.arange(75, 200), k=256)
    got = a.intersect(b).a_not_b(c)  # (A∩B)\C = [50,75)
    assert got.estimate() == 25.0
    got2 = a.intersect(b).intersect(c)  # [75,100)
    assert got2.estimate() == 25.0


def test_union_trims_to_k_and_matches_flat_build():
    rng = np.random.default_rng(3)
    uni = rng.choice(10_000_000, size=8_000, replace=False)
    k = 256
    a, b = _sk(uni[:5_000], k=k), _sk(uni[3_000:], k=k)
    u = a.union(b)
    assert u.size <= k
    flat = _sk(uni, k=k)
    # union of built sketches estimates the flat build's set; both are
    # KMV estimates of the same 8k-distinct set — within 5/sqrt(k)
    assert abs(u.estimate() - flat.estimate()) < 8_000 * 5.0 / np.sqrt(k)


def test_normalization_matches_sql_rule():
    # saturated: theta = k-th smallest md5 priority, retained = k-1 below
    vals = np.arange(1000)
    k = 128
    bk = BottomK(k=k).update_md5_ints(vals)
    th = ThetaSketch.from_bottomk(bk)
    assert th.theta == int(bk.prios[k - 1])
    assert th.size == k - 1
    assert int(th.prios[-1]) < th.theta
    # serde round-trip preserves everything incl. the 2^64 sentinel
    rt = ThetaSketch.from_bytes(th.to_bytes())
    assert rt.theta == th.theta and rt.family == th.family
    assert np.array_equal(rt.prios, th.prios)
    small = _sk(np.arange(5), k=k)
    rt2 = ThetaSketch.from_bytes(small.to_bytes())
    assert rt2.theta == 2**64 and rt2.estimate() == 5.0


def test_family_and_k_mismatch_raise():
    a = _sk(np.arange(10), k=64)
    b = ThetaSketch.from_bottomk(BottomK(k=64).update_ints(np.arange(10)))
    with pytest.raises(TypeError):
        a.intersect_estimate(b)
    c = _sk(np.arange(10), k=32)
    with pytest.raises(ValueError):
        a.union(c)


def test_build_is_partition_invariant():
    # theta form inherits bottom-k's bit-exact merge: any split/order of
    # the same multiset normalizes to the identical sketch
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 50_000, size=20_000)
    whole = BottomK(k=256).update_md5_ints(vals)
    parts = np.array_split(rng.permutation(vals), 7)
    merged = BottomK(k=256)
    for p in parts:
        merged.merge(BottomK(k=256).update_md5_ints(p))
    ta, tb = ThetaSketch.from_bottomk(whole), ThetaSketch.from_bottomk(merged)
    assert ta.theta == tb.theta
    assert np.array_equal(ta.prios, tb.prios)
    assert ta.to_bytes() == tb.to_bytes()
