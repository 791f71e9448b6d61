"""AMS F2 (Tug-of-War) sketch: merge laws, accuracy, serde, build paths."""

import numpy as np
import pytest

from tdigest_spark.sketch.ams import AMSF2


def _exact_f2(vals) -> int:
    _, c = np.unique(np.asarray(vals, dtype=np.int64), return_counts=True)
    return int((c.astype(object) ** 2).sum())


def test_estimate_within_variance_bound():
    rng = np.random.default_rng(42)
    # zipf-ish skew: one hot key + a long tail
    vals = np.concatenate(
        [np.zeros(30_000, dtype=np.int64), rng.integers(1, 5_000, size=70_000)]
    )
    sk = AMSF2(depth=5, width=1024).update_ints(vals)
    exact = _exact_f2(vals)
    # per-row std ≈ sqrt(2/width)·F2 ≈ 4.4%; median of 5 rows well within 15%
    assert abs(sk.estimate() - exact) < 0.15 * exact
    assert sk.n_seen == 100_000


def test_merge_is_bit_identical_over_any_layout():
    rng = np.random.default_rng(7)
    vals = rng.integers(-1000, 1000, size=50_000)  # negatives exercise reinterpret
    whole = AMSF2(depth=5, width=256).update_ints(vals)
    parts = np.array_split(rng.permutation(vals), 9)
    merged = AMSF2(depth=5, width=256)
    for p in parts:
        merged.merge(AMSF2(depth=5, width=256).update_ints(p))
    assert np.array_equal(whole.counters, merged.counters)
    assert whole.to_bytes() == merged.to_bytes()
    assert whole.estimate() == merged.estimate()


def test_preaggregated_update_matches_raw():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 100, size=10_000)
    uv, uc = np.unique(vals, return_counts=True)
    a = AMSF2().update_ints(vals)
    b = AMSF2().update_ints(uv, counts=uc)
    assert a.to_bytes() == b.to_bytes()


def test_exact_when_collisionless():
    # 3 distinct values in 1024 buckets: with the fixed seeds no row has a
    # bucket collision (deterministic forever), so every row estimate is
    # EXACTLY F2 = 3² + 2² + 1² = 14 — the estimator algebra, no variance
    sk = AMSF2(depth=5, width=1024).update_ints(np.array([1, 1, 1, 2, 2, 3]))
    assert sk.row_estimates() == [14] * 5
    assert sk.estimate() == 14


def test_serde_roundtrip_and_validation():
    sk = AMSF2(depth=3, width=64).update_ints(np.arange(500))
    rt = AMSF2.from_bytes(sk.to_bytes())
    assert np.array_equal(rt.counters, sk.counters)
    assert rt.n_seen == sk.n_seen and (rt.depth, rt.width) == (3, 64)
    with pytest.raises(ValueError):
        AMSF2(depth=4)  # even depth
    with pytest.raises(ValueError):
        AMSF2(width=1000)  # not a power of two
    with pytest.raises(ValueError):
        AMSF2(depth=3, width=64).merge(AMSF2(depth=5, width=64))
    with pytest.raises(ValueError):
        AMSF2.from_bytes(b"XXXX" + bytes(32))


def test_distributed_build_matches_local(spark):
    import pandas as pd

    from tdigest_spark.operators.aggregate import AMS_F2, build_sketch

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 50, size=20_000)
    df = spark.createDataFrame(pd.DataFrame({"v": vals})).repartition(8)
    dist = build_sketch(df, "v", AMS_F2(5, 256))
    local = AMSF2(depth=5, width=256).update_ints(vals)
    assert dist.to_bytes() == local.to_bytes()
    assert dist.estimate() == local.estimate()
