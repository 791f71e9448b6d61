"""Misra-Gries: the mergeable-summaries bounds (est <= f <= est + err,
err <= n/(k+1)), the heavy-hitter superset guarantee under ANY partition
layout, decrement-path behavior on Zipf data, serde, and key-kind safety."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tdigest_spark.sketch.mg import MisraGries


def _zipf_stream(n=50_000, vocab=5_000, seed=5):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, n) % vocab  # heavy skew, cardinality >> k


def test_bounds_and_superset_zipf():
    v = _zipf_stream()
    k = 32
    sk = MisraGries(k=k).update(v)
    assert sk.err > 0  # decrement path actually exercised
    assert sk.err * (k + 1) <= sk.n
    assert len(sk.counters) <= k
    uv, uc = np.unique(v, return_counts=True)
    true = dict(zip(uv.tolist(), uc.tolist()))
    for item, f in true.items():
        lo, hi = sk.estimate(item)
        assert lo <= f <= hi
    heavy_true = {x for x, f in true.items() if f * (k + 1) > sk.n}
    assert heavy_true <= set(sk.candidates())


def test_merge_guarantee_any_layout():
    v = _zipf_stream(seed=9)
    k = 16
    uv, uc = np.unique(v, return_counts=True)
    true = dict(zip(uv.tolist(), uc.tolist()))
    for nparts, order in [(4, 1), (11, -1), (32, 1)]:
        acc = MisraGries(k)
        for p in np.array_split(v, nparts)[::order]:
            acc.merge(MisraGries(k).update(p))
        assert acc.n == v.shape[0]
        assert acc.err * (k + 1) <= acc.n
        heavy_true = {x for x, f in true.items() if f * (k + 1) > acc.n}
        assert heavy_true <= set(acc.candidates())
        for item, f in true.items():
            lo, hi = acc.estimate(item)
            assert lo <= f <= hi


def test_exact_mode_no_decrement():
    # cardinality below k: counters are exact counts and err stays 0
    v = np.array(["a"] * 7 + ["b"] * 3 + ["c"] * 2, dtype=object)
    sk = MisraGries(8).update(v)
    m = MisraGries(8).update(v[:5]).merge(MisraGries(8).update(v[5:]))
    for s in (sk, m):
        assert s.err == 0
        assert s.counters == {"a": 7, "b": 3, "c": 2}
    assert sk.heavy_hitters(3) == [("a", 7)]  # 7*3 > 12, 3*3 !> 12


def test_update_agg_equals_update():
    v = _zipf_stream(n=5_000, seed=2)
    uv, uc = np.unique(v, return_counts=True)
    a = MisraGries(16).update(np.sort(v))
    b = MisraGries(16).update_agg(uv, uc)
    # one pre-aggregated batch == one sorted batch (same ingest order)
    assert a.counters == b.counters and a.n == b.n and a.err == b.err


def test_serde_roundtrip_both_kinds():
    si = MisraGries(8).update(np.array([1, 1, 2, 9_000_000_000]))
    ss = MisraGries(8).update(np.array(["x", "x", "y"], dtype=object))
    for sk in (si, ss):
        back = MisraGries.from_bytes(sk.to_bytes())
        assert back.counters == sk.counters
        assert (back.k, back.n, back.err, back.kind) == (
            sk.k, sk.n, sk.err, sk.kind
        )
    empty = MisraGries.from_bytes(MisraGries(4).to_bytes())
    assert empty.kind is None and empty.counters == {}
    with pytest.raises(ValueError, match="not a MisraGries"):
        MisraGries.from_bytes(b"XXXX" + si.to_bytes()[4:])


def test_kind_mismatch_raises():
    sk = MisraGries(8).update(np.array([1, 2, 3]))
    with pytest.raises(TypeError, match="holds 'i' keys"):
        sk.update(np.array(["a"], dtype=object))
    with pytest.raises(ValueError, match="k mismatch"):
        sk.merge(MisraGries(9))


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=10),
)
def test_hypothesis_bounds(xs, k):
    v = np.asarray(xs)
    sk = MisraGries(k).update(v)
    uv, uc = np.unique(v, return_counts=True)
    assert sk.err * (k + 1) <= sk.n
    for item, f in zip(uv.tolist(), uc.tolist()):
        lo, hi = sk.estimate(item)
        assert lo <= f <= hi
        if f * (k + 1) > sk.n:
            assert item in sk.counters


def test_float_keys_canonical_across_serde():
    # float columns key by repr; in-memory and serde-round-tripped sketches
    # must agree (pre-fix: float keys in memory, str keys after round trip)
    v = np.array([1.5, 1.5, 2.25, 0.1])
    sk = MisraGries(8).update(v)
    back = MisraGries.from_bytes(sk.to_bytes())
    assert sk.counters == back.counters == {"1.5": 2, "2.25": 1, "0.1": 1}
    back.update(v)  # mixing after a round trip must not split keys
    assert back.counters == {"1.5": 4, "2.25": 2, "0.1": 2}


def test_unsupported_key_types_raise():
    with pytest.raises(TypeError, match="unsupported MisraGries key"):
        MisraGries(8).update(np.array([b"raw", b"bytes"], dtype=object))
