"""Companion sketch tests (HLL, CMS, Bloom, KLL) against exact oracles at
test scale, per SURVEY.md §2.2 and BASELINE.json north_rule."""

import numpy as np
import pytest

from tdigest_spark.sketch.bloom import BloomFilter
from tdigest_spark.sketch.cms import CMS
from tdigest_spark.sketch.hll import HLL
from tdigest_spark.sketch.kll import KLL

# ------------------------------------------------------------------------ HLL


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(42)
    a_vals = rng.integers(0, 5_000_000, 300_000)
    b_vals = rng.integers(2_000_000, 8_000_000, 300_000)
    a = HLL(p=14).update_ints(a_vals)
    b = HLL(p=14).update_ints(b_vals)
    exact_a = len(np.unique(a_vals))
    # standard error 1.04/sqrt(2^14) ~ 0.81%; allow 3 sigma
    assert abs(a.estimate() - exact_a) / exact_a < 0.025
    a.merge(b)
    exact_union = len(np.unique(np.concatenate([a_vals, b_vals])))
    assert abs(a.estimate() - exact_union) / exact_union < 0.025


def test_hll_small_range_linear_counting():
    h = HLL(p=14).update_ints(np.arange(100))
    assert abs(h.estimate() - 100) < 3


def test_hll_strings_and_serde():
    vals = [f"doc-{i}" for i in range(50_000)]
    h = HLL(p=12).update_strings(vals)
    assert abs(h.estimate() - 50_000) / 50_000 < 0.06
    h2 = HLL.from_bytes(h.to_bytes())
    assert h2.estimate() == h.estimate()
    np.testing.assert_array_equal(h2.registers, h.registers)


def test_hll_merge_commutative_idempotent():
    rng = np.random.default_rng(1)
    xs, ys = rng.integers(0, 10**6, 10_000), rng.integers(0, 10**6, 10_000)
    a1 = HLL().update_ints(xs)
    b1 = HLL().update_ints(ys)
    ab = HLL().update_ints(xs).merge(b1).registers.copy()
    ba = HLL().update_ints(ys).merge(a1).registers.copy()
    np.testing.assert_array_equal(ab, ba)
    aa = HLL().update_ints(xs).merge(HLL().update_ints(xs))
    np.testing.assert_array_equal(aa.registers, a1.registers)


# ------------------------------------------------------------------------ CMS


def test_cms_overestimates_only_and_bound():
    rng = np.random.default_rng(7)
    vals = rng.zipf(1.3, 200_000) % 50_000
    c = CMS(depth=5, width=4096).update_ints(vals)
    keys, counts = np.unique(vals, return_counts=True)
    est = c.estimate_ints(keys)
    assert (est >= counts).all()  # CMS never underestimates
    # eps = e/width; error <= eps * total with prob 1 - e^-depth
    eps = np.e / 4096
    assert (est - counts).max() <= 3 * eps * c.total


def test_cms_heavy_hitters_find_true_top():
    rng = np.random.default_rng(8)
    vals = np.concatenate(
        [np.full(50_000, 13), np.full(20_000, 99), rng.integers(0, 10**6, 100_000)]
    )
    c = CMS(depth=5, width=8192, k_heavy=16).update_ints(vals)
    hh = c.heavy_hitters()
    assert hh[0][0] == 13 and abs(hh[0][1] - 50_000) < 200
    assert hh[1][0] == 99 and abs(hh[1][1] - 20_000) < 200


def test_cms_merge_is_exact_addition():
    rng = np.random.default_rng(9)
    xs, ys = rng.integers(0, 1000, 50_000), rng.integers(0, 1000, 50_000)
    both = CMS().update_ints(np.concatenate([xs, ys]))
    merged = CMS().update_ints(xs).merge(CMS().update_ints(ys))
    np.testing.assert_array_equal(both.table, merged.table)
    assert both.total == merged.total


def test_cms_serde():
    c = CMS(depth=3, width=512).update_ints(np.arange(1000) % 37)
    c2 = CMS.from_bytes(c.to_bytes())
    np.testing.assert_array_equal(c2.table, c.table)
    assert c2.heavy == c.heavy and c2.total == c.total


# ---------------------------------------------------------------------- Bloom


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(10)
    present = rng.integers(0, 10**9, 100_000)
    bf = BloomFilter(expected_items=100_000, fpp=0.01).add_ints(present)
    assert bf.might_contain_ints(present).all()


def test_bloom_fpp_within_spec():
    rng = np.random.default_rng(11)
    present = rng.integers(0, 10**9, 100_000)
    absent = rng.integers(10**10, 10**10 + 10**9, 50_000)
    bf = BloomFilter(expected_items=100_000, fpp=0.01).add_ints(present)
    fp = bf.might_contain_ints(absent).mean()
    assert fp < 0.02


def test_bloom_merge_is_union():
    a_vals = np.arange(0, 5000)
    b_vals = np.arange(5000, 10000)
    a = BloomFilter(expected_items=20_000).add_ints(a_vals)
    b = BloomFilter(expected_items=20_000).add_ints(b_vals)
    a.merge(b)
    assert a.might_contain_ints(np.arange(0, 10000)).all()
    both = BloomFilter(expected_items=20_000).add_ints(np.arange(10000))
    np.testing.assert_array_equal(a.bits, both.bits)


def test_bloom_strings_and_serde():
    bf = BloomFilter(expected_items=1000).add_strings([f"s{i}" for i in range(500)])
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert bf2.might_contain_strings([f"s{i}" for i in range(500)]).all()
    np.testing.assert_array_equal(bf2.bits, bf.bits)


# ------------------------------------------------------------------------ KLL


@pytest.mark.parametrize("dist", ["uniform", "normal", "zipf"])
def test_kll_rank_accuracy(dist):
    rng = np.random.default_rng(12)
    if dist == "uniform":
        xs = rng.random(200_000)
    elif dist == "normal":
        xs = rng.normal(0, 1, 200_000)
    else:
        xs = rng.zipf(1.5, 200_000).astype(float)
    sk = KLL(k=200).update(xs)
    sorted_xs = np.sort(xs)
    ps = np.arange(0.01, 1.0, 0.01)
    qs = sk.quantile(ps)
    # a duplicated value covers a rank plateau [left, right]; error is the
    # distance from p to that interval
    left = np.searchsorted(sorted_xs, qs, side="left") / xs.size
    right = np.searchsorted(sorted_xs, qs, side="right") / xs.size
    err = np.maximum(left - ps, 0) + np.maximum(ps - right, 0)
    assert err.max() < 0.03


def test_kll_weight_exact_and_merge():
    rng = np.random.default_rng(13)
    xs, ys = rng.random(100_000), rng.normal(0.5, 0.2, 100_000)
    a = KLL(k=200).update(xs)
    b = KLL(k=200).update(ys)
    a.merge(b)
    v, w = a._weighted_items()
    assert w.sum() == 200_000  # compaction never loses weight
    both = np.concatenate([xs, ys])
    sorted_both = np.sort(both)
    ps = np.arange(0.05, 1.0, 0.05)
    achieved = np.searchsorted(sorted_both, a.quantile(ps), side="right") / both.size
    assert np.abs(achieved - ps).max() < 0.04


def test_kll_deterministic_and_serde():
    rng = np.random.default_rng(14)
    xs = rng.random(50_000)
    a = KLL(k=128).update(xs)
    b = KLL(k=128).update(xs)
    assert a.to_bytes() == b.to_bytes()
    c = KLL.from_bytes(a.to_bytes())
    assert c.to_bytes() == a.to_bytes()
    np.testing.assert_array_equal(
        c.quantile(np.linspace(0, 1, 11)), a.quantile(np.linspace(0, 1, 11))
    )


# --------------------------------------------------------------------------
# BottomK (KMV priority sampling)
# --------------------------------------------------------------------------


def test_bottomk_merge_is_partition_invariant():
    import numpy as np

    from tdigest_spark.sketch.bottomk import BottomK

    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1_000_000, 100_000)
    whole = BottomK(512).update_ints(vals)
    parts = [BottomK(512).update_ints(c) for c in np.array_split(vals, 7)]
    acc = parts[0]
    for p in parts[1:]:
        acc.merge(p)
    assert acc.to_bytes() == whole.to_bytes()  # bit-identical, no RNG
    # reversed merge order too (commutativity)
    parts = [BottomK(512).update_ints(c) for c in np.array_split(vals, 7)]
    rev = parts[-1]
    for p in parts[-2::-1]:
        rev.merge(p)
    assert rev.prios.tobytes() == whole.prios.tobytes()


def test_bottomk_distinct_estimate_and_sample():
    import numpy as np

    from tdigest_spark.sketch.bottomk import BottomK

    rng = np.random.default_rng(2)
    vals = rng.integers(0, 50_000, 500_000)
    exact = len(np.unique(vals))
    sk = BottomK(1024).update_ints(vals)
    est = sk.distinct_estimate()
    assert abs(est - exact) / exact < 0.12  # ~1/sqrt(k) envelope, 3+ sigma
    s = sk.sample()
    assert len(s) == 1024 and len(np.unique(s)) == 1024
    assert np.isin(s, vals).all()
    # small-cardinality exactness
    small = BottomK(1024).update_ints(np.arange(100))
    assert small.distinct_estimate() == 100


def test_bottomk_jaccard():
    import numpy as np

    from tdigest_spark.sketch.bottomk import BottomK

    a_vals = np.arange(0, 60_000)
    b_vals = np.arange(30_000, 90_000)  # true J = 30000/90000 = 1/3
    a = BottomK(2048).update_ints(a_vals)
    b = BottomK(2048).update_ints(b_vals)
    est = a.jaccard(b)
    assert abs(est - 1 / 3) < 0.05


def test_bottomk_distributed_build(spark, seq_table):
    import numpy as np

    from tdigest_spark.operators.aggregate import BOTTOMK_INTS, build_sketch
    from tdigest_spark.sketch.bottomk import BottomK

    sk = build_sketch(seq_table, "tokens", BOTTOMK_INTS(512))
    # serial oracle over the same rows
    rows = seq_table.select("tokens").collect()
    flat = np.concatenate([np.asarray(r[0]) for r in rows])
    serial = BottomK(512).update_ints(flat)
    assert sk.prios.tobytes() == serial.prios.tobytes()
    assert sk.n_seen == serial.n_seen == len(flat)


def test_bottomk_empty_merge():
    import numpy as np

    from tdigest_spark.sketch.bottomk import BottomK

    a, b = BottomK(64), BottomK(64)
    a.merge(b)
    assert a.size == 0 and a.distinct_estimate() == 0.0
    a.merge(BottomK(64).update_ints(np.arange(10)))
    assert a.size == 10


def test_cms_string_updates_exact_when_wide():
    """String-keyed CMS: width >> distinct keys + fixed seeds => exact
    counts; merge = matrix add preserves them."""
    import numpy as np

    from tdigest_spark.sketch.cms import CMS

    vals = np.array(
        ["en"] * 50 + ["fr"] * 30 + ["zh"] * 20 + ["de"] * 7, dtype=object
    )
    a, b = CMS(5, 65536, 0), CMS(5, 65536, 0)
    a.update_strings(vals[:60])
    b.update_strings(vals[60:])
    a.merge(b)
    probes = np.array(["en", "fr", "zh", "de", "absent"], dtype=object)
    assert a.estimate_strings(probes).tolist() == [50, 30, 20, 7, 0]
    assert a.total == 107


def test_cms_serde_roundtrips_k_heavy():
    """k_heavy is part of the wire format: a heavy-hitter-disabled sketch
    must stay disabled through serde (resumed/checkpointed builds)."""
    import numpy as np

    from tdigest_spark.sketch.cms import CMS

    c = CMS(5, 1024, 0)
    c.update_ints(np.arange(100))
    r = CMS.from_bytes(c.to_bytes())
    assert r.k_heavy == 0
    r.update_ints(np.arange(100))
    assert r._pending == []  # tracking stays off
    c2 = CMS(3, 512, 16)
    c2.update_ints(np.arange(50))
    assert CMS.from_bytes(c2.to_bytes()).k_heavy == 16


def test_cms_inner_product_join_size():
    """Inner-product join-size estimate: >= exact always; within the
    (e/width)*|A|*|B| C&M bound; exact when width leaves no collisions."""
    import math

    import numpy as np

    from tdigest_spark.sketch.cms import CMS

    rng = np.random.default_rng(7)
    a_keys = rng.integers(0, 500, size=20_000)
    b_keys = rng.integers(0, 500, size=3_000)
    a = CMS(5, 8192, 0).update_ints(a_keys)
    b = CMS(5, 8192, 0).update_ints(b_keys)
    ca = np.bincount(a_keys, minlength=500)
    cb = np.bincount(b_keys, minlength=500)
    exact = int((ca * cb).sum())
    est = a.inner_product(b)
    assert est >= exact
    assert est <= exact + math.e / 8192 * a.total * b.total
    # mismatched shapes refuse
    import pytest

    with pytest.raises(ValueError):
        a.inner_product(CMS(5, 4096, 0))


def test_bottomk_md5_priorities_match_duckdb():
    import duckdb

    from tdigest_spark.sketch.bottomk import BottomK

    v = np.array([0, 1, 42, 987654321, 2**61], dtype=np.int64)
    sk = BottomK(k=16).update_md5_ints(v)
    con = duckdb.connect()
    expected = sorted(
        con.execute(
            f"SELECT CAST(md5_number_lower(CAST({int(x)} AS VARCHAR)) AS UBIGINT)"
        ).fetchone()[0]
        for x in v
    )
    assert sk.prios.tolist() == expected


def test_bottomk_md5_jaccard_estimate_and_layout_invariance():
    from tdigest_spark.sketch.bottomk import BottomK

    a_items = np.arange(0, 3000)
    b_items = np.arange(1500, 4500)  # true J = 1500/4500 = 1/3
    k = 256
    a = BottomK(k).update_md5_ints(a_items)
    b = BottomK(k).update_md5_ints(b_items)
    est = a.jaccard(b)
    assert abs(est - 1 / 3) < 4 / np.sqrt(k)  # KMV error envelope
    # content-hash priorities + dedupe => bit-identical over any layout
    whole = a.to_bytes()
    for nparts, order in [(7, 1), (13, -1)]:
        acc = BottomK(k)
        for p in np.array_split(a_items, nparts)[::order]:
            acc.merge(BottomK(k).update_md5_ints(p))
        assert acc.prios.tolist() == BottomK.from_bytes(whole).prios.tolist()
    # pre-aggregated path: counts feed n_seen only
    c = BottomK(k).update_md5_ints(np.array([5, 6]), counts=np.array([3, 4]))
    assert c.n_seen == 7 and c.size == 2


def test_bottomk_family_mismatch_raises():
    from tdigest_spark.sketch.bottomk import BottomK

    a = BottomK(16).update_ints(np.arange(10))
    b = BottomK(16).update_md5_ints(np.arange(10))
    with pytest.raises(TypeError, match="family mismatch"):
        a.merge(b)
    with pytest.raises(TypeError, match="family mismatch"):
        a.jaccard(b)
    # family survives serde; stale untagged format is named explicitly
    back = BottomK.from_bytes(b.to_bytes())
    assert back.family == "m"
    with pytest.raises(ValueError, match="stale BottomK format BTK1"):
        BottomK.from_bytes(b"BTK1" + b.to_bytes()[4:])
