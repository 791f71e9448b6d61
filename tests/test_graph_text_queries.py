"""Third-party cross-checks for the graph and lexical-diversity queries.

The oracle sweep proves Spark == DuckDB, but both twins spell the SAME
pipeline — these recompute from the raw parquet with plain Python
(independent code path: dict/Counter graph walks, no SQL engines).
"""

from collections import Counter, defaultdict
from itertools import combinations

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

import __spark_entry__ as entry


def _copurchase_edges():
    t = pq.read_table(
        SF_DIR + "/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"],
        use_threads=False,
    )
    ok = np.asarray(t.column("l_orderkey"))
    pk = np.asarray(t.column("l_partkey"))
    parts_by_order = defaultdict(set)
    for o, p in zip(ok.tolist(), pk.tolist()):
        parts_by_order[o].add(p)
    support = Counter()
    for parts in parts_by_order.values():
        for a, b in combinations(sorted(parts), 2):
            support[(a, b)] += 1
    return {e for e, s in support.items() if s >= 2}


def test_link_prediction_matches_python(spark):
    edges = _copurchase_edges()
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    deg = {p: len(n) for p, n in nbrs.items()}
    cn = Counter()
    for c, ns in nbrs.items():
        for a, b in combinations(sorted(ns), 2):
            cn[(a, b)] += 1
    cands = [
        (a, b, k)
        for (a, b), k in cn.items()
        if (a, b) not in edges
    ]
    cands.sort(key=lambda t: (-t[2], t[0], t[1]))
    rows = entry.part_link_prediction(spark, SF_DIR).collect()
    assert len(rows) == min(10, len(cands))
    for r, (a, b, k) in zip(rows, cands[:10]):
        assert (r["key_a"], r["key_b"], r["cn"]) == (a, b, k)
        assert r["deg_a"] == deg[a] and r["deg_b"] == deg[b]
        assert r["jaccard"] == pytest.approx(
            k / (deg[a] + deg[b] - k), rel=1e-12
        )
        # a predicted link is NOT an existing edge
        assert (a, b) not in edges


def test_source_word_diversity_matches_python(spark):
    t = pq.read_table(
        SF_DIR + "/documents.parquet",
        columns=["source", "text"],
        use_threads=False,
    )
    src = np.asarray(t.column("source"))
    txt = np.asarray(t.column("text"))
    hists = defaultdict(Counter)
    for s, x in zip(src.tolist(), txt.tolist()):
        if x is None or x.strip() == "":
            continue
        hists[s].update(w for w in x.strip().lower().split() if w)
    rows = {
        r["source"]: r
        for r in entry.doc_source_word_diversity(spark, SF_DIR).collect()
    }
    assert set(rows) == set(hists)
    for s, h in hists.items():
        n = sum(h.values())
        r = rows[s]
        assert r["n_tokens"] == n
        assert r["n_distinct"] == len(h)
        sum_cc = sum(c * (c - 1) for c in h.values())
        assert r["simpson"] == pytest.approx(
            1.0 - sum_cc / (n * (n - 1)), rel=1e-12
        )
        assert 0.0 <= r["simpson"] <= 1.0
        assert r["ttr"] == pytest.approx(len(h) / n, rel=1e-12)
        assert r["top_share"] == pytest.approx(
            max(h.values()) / n, rel=1e-12
        )


def test_hits_matches_python(spark):
    t = pq.read_table(
        SF_DIR + "/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"],
        use_threads=False,
    )
    pdf = t.to_pandas()
    pdf = pdf[pdf.user_id.notna()]
    us = pdf.ts.astype("datetime64[us]").astype("int64")
    order = np.lexsort(
        (np.asarray(pdf.event_id), us.to_numpy(), np.asarray(pdf.user_id))
    )
    u = np.asarray(pdf.user_id)[order]
    et = np.asarray(pdf.event_type)[order]
    wgt = Counter()
    for i in range(1, len(u)):
        if u[i] == u[i - 1]:
            wgt[(et[i - 1], et[i])] += 1
    # replay the pinned-fold HITS iteration (a1 -> h1 -> a2)
    a1 = Counter()
    for (s, d), n in wgt.items():
        a1[d] += n
    a1m = float(max(a1.values()))
    a1n = {d: v / a1m for d, v in a1.items()}
    h1 = {}
    for s in {k[0] for k in wgt}:
        acc = None
        for d in sorted(d2 for (s2, d2) in wgt if s2 == s):
            term = float(wgt[(s, d)]) * a1n[d]
            acc = term if acc is None else acc + term
        h1[s] = acc
    h1m = max(h1.values())
    h1n = {s: v / h1m for s, v in h1.items()}
    a2 = {}
    for d in {k[1] for k in wgt}:
        acc = None
        for s in sorted(s2 for (s2, d2) in wgt if d2 == d):
            term = float(wgt[(s, d)]) * h1n[s]
            acc = term if acc is None else acc + term
        a2[d] = acc
    a2m = max(a2.values())
    a2n = {d: v / a2m for d, v in a2.items()}

    rows = entry.events_type_hits(spark, SF_DIR).collect()
    assert len(rows) == len(set(et))
    for r in rows:
        # same pinned fold order -> bit-identical doubles
        assert r["hub"] == h1n.get(r["event_type"], 0.0)
        assert r["authority"] == a2n.get(r["event_type"], 0.0)
        assert 0.0 <= r["hub"] <= 1.0 and 0.0 <= r["authority"] <= 1.0
    assert max(r["hub"] for r in rows) == 1.0
    assert max(r["authority"] for r in rows) == 1.0


def test_label_propagation_matches_python(spark):
    """Replays exactly three min-label rounds in pure Python over the
    same support>=2 co-purchase edges and compares component stats plus
    the convergence counter — independent of both engine twins."""
    edges = _copurchase_edges()
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lbl = {n: n for n in nbrs}
    prev = dict(lbl)
    for _ in range(3):
        prev = dict(lbl)
        nxt = {}
        for n in lbl:
            m = min(lbl[x] for x in nbrs[n])
            nxt[n] = min(lbl[n], m)
        lbl = nxt
    [r] = entry.part_component_label_propagation(spark, SF_DIR).collect()
    assert r["n_nodes"] == len(lbl)
    assert r["n_components"] == len(set(lbl.values()))
    sizes = Counter(lbl.values())
    assert r["max_component_size"] == max(sizes.values())
    assert r["n_changed_last_round"] == sum(
        1 for n in lbl if lbl[n] != prev[n]
    )


def test_max_concurrent_sessions_matches_python(spark):
    """Pure-Python sweep line over per-user 1800s-gap sessions: peak
    open-session count, earliest attaining start, session count."""
    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["user_id", "ts"],
        use_threads=False,
    )
    uid = np.asarray(t.column("user_id"), dtype="float64")
    us = np.asarray(t.column("ts").cast("int64"))
    keep = ~np.isnan(uid)
    uid, us = uid[keep].astype(np.int64), us[keep]
    by_user = defaultdict(list)
    for u, m in zip(uid.tolist(), us.tolist()):
        by_user[u].append(m)
    sessions = []
    for u, ms in by_user.items():
        ms.sort()
        s = e = ms[0]
        for m in ms[1:]:
            if m - e > 1800 * 1_000_000:
                sessions.append((s, e))
                s = m
            e = m
        sessions.append((s, e))
    bounds = sorted(
        [(2 * s, 1) for s, _ in sessions] + [(2 * e + 1, -1) for _, e in sessions]
    )
    run = best = 0
    best_v = None
    for v, w in bounds:
        run += w
        if run > best:
            best, best_v = run, v
    [r] = entry.events_max_concurrent_sessions(spark, SF_DIR).collect()
    assert r["n_sessions"] == len(sessions)
    assert r["max_concurrent"] == best
    assert r["at_us"] == best_v // 2


def test_kcore_peel_matches_python(spark):
    """Replays exactly three k=3 peel rounds in pure Python over the
    same support>=2 co-purchase edges."""
    edges = _copurchase_edges()
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    alive = set(nbrs)
    sizes = []
    for _ in range(3):
        alive = {
            n for n in alive if len(nbrs[n] & alive) >= 3
        }
        sizes.append(len(alive))
    [r] = entry.part_kcore_peel(spark, SF_DIR).collect()
    assert r["n_nodes"] == len(nbrs)
    assert (r["n_alive_r1"], r["n_alive_r2"], r["n_alive_r3"]) == tuple(sizes)
    assert r["n_removed_last_round"] == sizes[1] - sizes[2]
