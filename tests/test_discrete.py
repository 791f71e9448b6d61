"""Discrete-mode golden vectors ported from
/root/reference/specs/discrete.spec.js per FIXTURES.md §2."""

import numpy as np

from tdigest_spark.sketch.discrete import DiscreteDigest


def dd(values, is_string=False):
    d = DiscreteDigest(is_string=is_string)
    d.push(values)
    return d


def test_two_points_nearest_rank():
    d = dd([0.0, 10.0])
    np.testing.assert_array_equal(
        d.quantile([0, 0.25, 0.5, 0.75, 1.0]), [0, 0, 0, 10, 10]
    )


def test_three_points_nearest_rank():
    d = dd([0.0, 5.0, 10.0])
    np.testing.assert_array_equal(
        d.quantile([0, 0.25, 1 / 2.9, 0.5, 2 / 3, 0.75, 1.0]),
        [0, 0, 5, 5, 5, 10, 10],
    )


def test_four_points_nearest_rank():
    d = dd([10.0, 11.0, 12.0, 13.0])
    np.testing.assert_array_equal(
        d.quantile([0, 0.25, 0.5, 0.75, 1.0]), [10, 10, 11, 12, 13]
    )


def test_three_points_cdf():
    d = dd([-1.0, 0.0, 1.0])
    np.testing.assert_allclose(
        d.cdf([-1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5]),
        [0, 1 / 3, 1 / 3, 2 / 3, 2 / 3, 1, 1],
    )


def test_string_counts():
    # specs/discrete.spec.js:31-51
    data = ["foo", "bar", "baz", "foo", "freen", "bork", "bork", "bork", "books"]
    d = dd(data, is_string=True)
    assert d.items() == [
        ("bar", 1.0),
        ("baz", 1.0),
        ("books", 1.0),
        ("bork", 3.0),
        ("foo", 2.0),
        ("freen", 1.0),
    ]


def test_string_cdf():
    # specs/discrete.spec.js:133-142
    d = dd(["bar", "baz", "foo", "freen"], is_string=True)
    np.testing.assert_allclose(
        [d.cdf(x) for x in ["bar", "baz", "foo", "freen"]],
        [1 / 4, 2 / 4, 3 / 4, 1.0],
    )


def test_duplicate_run_median():
    # specs/discrete.spec.js:61-66 — 28 zeros dominate: median is 0
    data = [0.0] * 28 + [1.0, 1.0, 2.0, 2.0, 3.0, 4.0, 5.0, 5.0, 6.0, 7.0, 8.0, 9.0]
    assert len(data) == 40
    d = dd(data)
    assert d.quantile(0.5) == 0.0


def test_merge_exact():
    a = dd([1.0, 2.0, 2.0])
    b = dd([2.0, 3.0])
    a.merge(b)
    assert a.items() == [(1.0, 1.0), (2.0, 3.0), (3.0, 1.0)]
    assert a.n == 5


def test_serde_numeric_and_string():
    d = dd([1.0, 2.0, 2.0, 5.0])
    d2 = DiscreteDigest.from_bytes(d.to_bytes())
    assert d2.items() == d.items()
    s = dd(["a", "bb", "bb", "ccc"], is_string=True)
    s2 = DiscreteDigest.from_bytes(s.to_bytes())
    assert s2.items() == s.items()
    assert s2.is_string
