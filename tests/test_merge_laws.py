"""Merge-law tests required by BASELINE.json north_rule (FIXTURES.md §4).

The reference's randomized compress makes union only approximately
order-invariant (~0.05 divergence measured, BASELINE.md §B). Our merge is
sort-based + deterministic: exactly associative/commutative below the
compression trigger, and tightly order-invariant above it."""

import numpy as np

from tdigest_spark.sketch.tdigest import TDigest


def build(values, delta=0.01):
    t = TDigest(delta=delta)
    t.push(values)
    return t


def clone(t):
    return TDigest.from_bytes(t.to_bytes())


def test_assoc_exact_small():
    # assoc-3 fixture: small digests never trigger compression -> merges are
    # exact multiset unions -> bit-for-bit associative and commutative
    rng = np.random.default_rng(11)
    a = build(rng.random(300))
    b = build(rng.random(300) + 0.5)
    c = build(rng.random(300) * 2.0)
    ab_c = clone(a).merge(clone(b)).merge(clone(c)).to_bytes()
    a_bc = clone(a).merge(clone(b).merge(clone(c))).to_bytes()
    c_ba = clone(c).merge(clone(b).merge(clone(a))).to_bytes()
    assert ab_c == a_bc == c_ba


def test_commutative_bitwise_any_size():
    # concat+sort+coalesce is symmetric, so a.merge(b) == b.merge(a) even
    # when compression triggers
    rng = np.random.default_rng(12)
    a = build(rng.random(200_000))
    b = build(rng.normal(2, 1, 200_000))
    ab = clone(a).merge(clone(b)).to_bytes()
    ba = clone(b).merge(clone(a)).to_bytes()
    assert ab == ba


def test_assoc_approx_large():
    # above the trigger compression loses information, but order divergence
    # must stay far below the reference's measured ~0.05
    rng = np.random.default_rng(13)
    parts = [build(rng.normal(0, 1, 150_000)) for _ in range(3)]
    a, b, c = parts
    ab_c = clone(a).merge(clone(b)).merge(clone(c))
    a_bc = clone(a).merge(clone(b).merge(clone(c)))
    ps = np.arange(0.01, 1.0, 0.01)
    diff = np.abs(ab_c.quantile(ps) - a_bc.quantile(ps))
    # value-space diff on N(0,1): generous but tight vs 0.05
    assert diff.max() < 0.01


def test_partition_union_matches_whole():
    # partitions-8 fixture: 400k samples split round-robin into 8 digests,
    # merged; cdf within 0.005 of the whole-set digest (reference measured
    # 0.0015, BASELINE.md §B)
    rng = np.random.default_rng(14)
    xs = rng.normal(0, 1, 400_000) + rng.normal(0, 1, 400_000)
    whole = build(xs)
    parts = [build(xs[i::8]) for i in range(8)]
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    merged.compress()
    whole.compress()
    grid = np.quantile(xs, np.arange(0.01, 1.0, 0.01))
    diff = np.abs(merged.cdf(grid) - whole.cdf(grid))
    assert diff.max() < 0.005
    # and both match the exact EDF within the published bound
    exact = np.searchsorted(np.sort(xs), grid, side="right") / xs.size
    assert np.abs(merged.cdf(grid) - exact).max() < 0.01


def test_merge_tree_deterministic():
    # same merge tree -> bit-identical result across repeated runs
    rng = np.random.default_rng(15)
    data = [rng.random(50_000) for _ in range(8)]

    def run():
        ds = [build(d) for d in data]
        while len(ds) > 1:
            ds = [
                ds[i].merge(ds[i + 1]) if i + 1 < len(ds) else ds[i]
                for i in range(0, len(ds), 2)
            ]
        return ds[0].to_bytes()

    assert run() == run()


def test_min_max_exact_through_merges():
    rng = np.random.default_rng(16)
    xs = rng.normal(0, 100, 300_000)
    parts = [build(xs[i::4]) for i in range(4)]
    m = parts[0]
    for p in parts[1:]:
        m.merge(p)
    assert m.quantile(0.0) == xs.min()
    assert m.quantile(1.0) == xs.max()
    assert m.n == xs.size


def test_wide_fanin_fold_deterministic_and_exact():
    """A 500-way fold of single-batch partials equals the serial digest
    built from all rows (exact below the compression trigger), independent
    of input order — the driver-side fan-in at realistic partition counts."""
    import numpy as np

    from tdigest_spark.operators.aggregate import TDIGEST, fold_states
    from tdigest_spark.sketch.tdigest import TDigest

    rng = np.random.default_rng(11)
    batches = [rng.integers(0, 500, 40) for _ in range(500)]
    states = [
        TDigest(0.01).push(b.astype(np.float64)).to_bytes() for b in batches
    ]
    spec = TDIGEST(0.01)
    folded = fold_states(states, spec)
    # order independence: fold of a shuffled copy is bit-identical
    perm = list(states)
    rng.shuffle(perm)
    assert fold_states(perm, spec) == folded
    serial = TDigest(0.01).push(
        np.concatenate(batches).astype(np.float64)
    )
    got = TDigest.from_bytes(folded)
    assert got.n == serial.n
    # exact multiset: 500 distinct values, all singleton centroids
    assert [tuple(c) for c in got.centroids()] == [
        tuple(c) for c in serial.centroids()
    ]
