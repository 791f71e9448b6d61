"""Auto-mode Digest wrapper tests ported from
/root/reference/specs/digest.spec.js and tdigest.js:372-388 (FIXTURES.md §2),
plus the distributed merge-mode-resolution semantics of SURVEY.md §7.6."""

import numpy as np

from tdigest_spark.sketch.discrete import AutoDigest
from tdigest_spark.sketch.tdigest import TDigest


def test_low_cardinality_stays_exact():
    # 1000 reps x values 0..99 stays an exact map (digest.spec.js:63-76)
    vals = np.tile(np.arange(100, dtype=np.float64), 1000)
    d = AutoDigest(mode="auto")
    d.push(vals)
    assert not d.is_continuous
    assert d.inner.items() == [(float(i), 1000.0) for i in range(100)]


def test_continuous_switches():
    # >=2000 distinct uniforms: switches to t-digest, compresses
    rng = np.random.default_rng(42)
    d = AutoDigest(mode="auto")
    d.push(rng.random(2000))
    assert d.is_continuous
    assert d.inner.size < 2000


def test_threshold_constants():
    # switch iff size >= 1000 and uniques/size > 0.9 (tdigest.js:348-349,377-385)
    d = AutoDigest(mode="auto")
    d.push(np.arange(999, dtype=np.float64))
    assert not d.is_continuous  # size 999 < 1000
    d.push(np.array([999.0]))
    assert d.is_continuous  # size 1000, all unique


def test_forced_disc_never_switches():
    rng = np.random.default_rng(1)
    d = AutoDigest(mode="disc")
    d.push(rng.random(5000))
    assert not d.is_continuous
    assert d.inner.size == 5000


def test_forced_cont_is_tdigest():
    d = AutoDigest(mode="cont")
    assert isinstance(d.inner, TDigest)
    d.push(np.array([1.0, 2.0, 3.0]))
    assert d.quantile(0.5) == 2.0


def test_merge_disc_disc_stays_exact_until_threshold():
    a = AutoDigest()
    b = AutoDigest()
    a.push(np.arange(600, dtype=np.float64))
    b.push(np.arange(600, 1200, dtype=np.float64))
    assert not a.is_continuous and not b.is_continuous
    a.merge(b)  # merged map has 1200 uniques -> switches
    assert a.is_continuous
    assert a.n == 1200


def test_merge_disc_disc_low_card_stays_exact():
    a = AutoDigest()
    b = AutoDigest()
    a.push(np.tile(np.arange(50, dtype=np.float64), 100))
    b.push(np.tile(np.arange(50, 100, dtype=np.float64), 100))
    a.merge(b)
    assert not a.is_continuous
    assert a.inner.size == 100


def test_merge_cont_disc():
    rng = np.random.default_rng(9)
    a = AutoDigest()
    a.push(rng.random(3000))
    assert a.is_continuous
    b = AutoDigest()
    b.push(np.array([0.5] * 10))
    a.merge(b)
    assert a.is_continuous
    assert a.n == 3010


def test_auto_serde_roundtrip():
    rng = np.random.default_rng(5)
    for data in (np.tile(np.arange(20.0), 30), rng.random(3000)):
        d = AutoDigest()
        d.push(data)
        d2 = AutoDigest.from_bytes(d.to_bytes())
        assert d2.is_continuous == d.is_continuous
        assert d2.n == d.n
        np.testing.assert_array_equal(
            np.asarray(d2.quantile([0.1, 0.5, 0.9]), dtype=np.float64),
            np.asarray(d.quantile([0.1, 0.5, 0.9]), dtype=np.float64),
        )


def test_autodigest_string_discrete():
    """Reference Digest accepts strings in discrete mode
    (specs/discrete.spec.js:31-51); auto mode never converts a string
    digest (nothing continuous to switch to)."""
    from tdigest_spark.sketch.discrete import AutoDigest

    a = AutoDigest(mode="disc", is_string=True)
    a.push(["b", "a", "c", "a"])
    assert a.quantile(0.5) == "a" and a.quantile(1.0) == "c"
    r = AutoDigest.from_bytes(a.to_bytes())
    assert r.quantile(0.5) == "a"
    s = AutoDigest(mode="auto", is_string=True)
    s.push([f"w{i}" for i in range(2000)])
    assert not s.is_continuous
    import pytest as _pytest

    with _pytest.raises(ValueError):
        AutoDigest(mode="cont", is_string=True)


def test_autodigest_forced_disc_merge_guard():
    """mode='disc' promises exact nearest-rank answers; merging in a
    continuous digest must fail loudly, not silently approximate."""
    import pytest as _pytest

    from tdigest_spark.sketch.discrete import AutoDigest

    cont = AutoDigest(mode="cont")
    cont.push([1.0, 2.0, 3.0])
    disc = AutoDigest(mode="disc")
    disc.push([1.0, 1.0, 2.0])
    with _pytest.raises(ValueError):
        disc.merge(cont)
