"""Third-party cross-checks for the statistical-test queries.

The oracle sweep proves Spark == DuckDB, but both twins spell the SAME
formula — a transcription error in the statistic itself would pass both
engines. These tests recompute the statistics from the raw parquet with
numpy (textbook formulas, independent code path) and compare tightly.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

import __spark_entry__ as entry


def _values_by_arm():
    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["event_type", "value"],
        use_threads=False,
    )
    et = np.asarray(t.column("event_type"))
    val = np.asarray(t.column("value"), dtype="float64")
    keep = np.isin(et, ["purchase", "view"]) & ~np.isnan(val)
    x = np.floor(val[keep] * 100.0).astype(np.int64)
    return x[et[keep] == "purchase"], x[et[keep] == "view"]


def test_welch_ttest_matches_numpy(spark):
    a, b = _values_by_arm()
    row = entry.events_welch_ttest_value(spark, SF_DIR).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    # textbook Welch: ddof=1 variances, Welch-Satterthwaite df
    va, vb = a.var(ddof=1), b.var(ddof=1)
    ta, tb = va / len(a), vb / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(ta + tb)
    df = (ta + tb) ** 2 / (ta**2 / (len(a) - 1) + tb**2 / (len(b) - 1))
    assert row["mean_cents_a"] == pytest.approx(a.mean(), rel=1e-12)
    assert row["mean_cents_b"] == pytest.approx(b.mean(), rel=1e-12)
    assert row["t_stat"] == pytest.approx(t, rel=1e-9)
    assert row["welch_df"] == pytest.approx(df, rel=1e-9)
    assert row["significant"] == (abs(t) > 1.96)


def test_mannwhitney_matches_numpy(spark):
    a, b = _values_by_arm()
    row = entry.events_mannwhitney_value(spark, SF_DIR).collect()[0]
    # textbook U via midranks over the combined sample (scipy-free)
    allv = np.concatenate([a, b])
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv))
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # 1-based midrank
        i = j
    ra = ranks[: len(a)].sum()
    u_a = ra - len(a) * (len(a) + 1) / 2.0
    assert row["two_u_a"] == pytest.approx(2.0 * u_a, abs=0.5)
    _, counts = np.unique(allv, return_counts=True)
    n = len(allv)
    var_u = (len(a) * len(b) / 12.0) * (
        (n + 1) - (counts.astype(float) ** 3 - counts).sum() / (n * (n - 1))
    )
    z = (u_a - len(a) * len(b) / 2.0) / np.sqrt(var_u)
    assert row["z_score"] == pytest.approx(z, rel=1e-9)


def test_hourly_autocorrelation_matches_numpy(spark):
    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["ts"], use_threads=False
    )
    us = np.asarray(t.column("ts").cast("int64"), dtype="int64")
    h = us // 3_600_000_000
    h0, h1 = h.min(), h.max()
    series = np.bincount((h - h0).astype(np.int64), minlength=h1 - h0 + 1)
    x, y = series[:-24].astype(float), series[24:].astype(float)
    r = np.corrcoef(x, y)[0, 1]
    row = entry.events_hourly_autocorrelation(spark, SF_DIR).collect()[0]
    assert row["n_pairs"] == len(x)
    assert row["acf24"] == pytest.approx(r, rel=1e-9)
    assert row["daily_seasonal"] == (row["acf24"] > 0.25)


def test_neyman_allocation_matches_numpy(spark):
    t = pq.read_table(
        SF_DIR + "/documents.parquet", columns=["source", "n_chars"],
        use_threads=False,
    )
    src = np.asarray(t.column("source"))
    nc = np.asarray(t.column("n_chars"), dtype="int64")
    rows = entry.doc_neyman_allocation(spark, SF_DIR).collect()
    wgts = {}
    for r in rows:
        vals = nc[src == r["source"]]
        assert r["n_docs"] == len(vals)
        assert r["mean_chars"] == pytest.approx(vals.mean(), rel=1e-12)
        sd = vals.std(ddof=1)
        assert r["sd_chars"] == pytest.approx(sd, abs=5.1e-7)
        wgts[r["source"]] = len(vals) * sd
    tw = sum(wgts.values())
    for r in rows:
        assert r["neyman_share"] == pytest.approx(
            wgts[r["source"]] / tw, abs=1e-6
        )


def test_ks_matches_numpy(spark):
    a, b = _values_by_arm()
    row = entry.events_ks_test_value(spark, SF_DIR).collect()[0]
    grid = np.unique(np.concatenate([a, b]))
    edf_a = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    edf_b = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    d = np.abs(edf_a - edf_b).max()
    assert row["ks_d"] == pytest.approx(d, rel=1e-9)


def test_spearman_matches_numpy(spark):
    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["user_id", "value"],
        use_threads=False,
    )
    uid = np.asarray(t.column("user_id"), dtype="int64")
    val = np.asarray(t.column("value"), dtype="float64")
    cents = np.floor(val * 100).astype("int64")
    users, inv = np.unique(uid, return_inverse=True)
    x = np.bincount(inv)
    y = np.bincount(inv, weights=cents).astype("int64")

    def avg_rank(a):
        order = np.argsort(a, kind="stable")
        ranks = np.empty(len(a), dtype="float64")
        sa = a[order]
        i = 0
        while i < len(sa):
            j = i
            while j < len(sa) and sa[j] == sa[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return ranks

    rx, ry = avg_rank(x), avg_rank(y)
    rho = np.corrcoef(rx, ry)[0, 1]
    row = entry.events_user_spearman(spark, SF_DIR).collect()[0]
    assert row["n_users"] == len(users)
    assert row["spearman_rho"] == pytest.approx(rho, abs=1e-12)


def test_kruskal_wallis_matches_numpy(spark):
    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["event_type", "value"],
        use_threads=False,
    )
    et = np.asarray(t.column("event_type"))
    val = np.asarray(t.column("value"), dtype="float64")
    keep = ~np.isnan(val)
    et, cents = et[keep], np.floor(val[keep] * 100.0).astype(np.int64)
    # textbook average ranks over the pooled sample
    order = np.argsort(cents, kind="stable")
    sc = cents[order]
    ranks = np.empty(len(sc), dtype="float64")
    i = 0
    while i < len(sc):
        j = i
        while j < len(sc) and sc[j] == sc[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n = len(cents)
    groups = np.unique(et)
    srr = sum(
        ranks[et == g].sum() ** 2 / (et == g).sum() for g in groups
    )
    h0 = 12.0 / (n * (n + 1.0)) * srr - 3.0 * (n + 1.0)
    _, counts = np.unique(cents, return_counts=True)
    c = counts.astype("float64")
    h = h0 / (1.0 - (c**3 - c).sum() / (float(n) ** 3 - n))
    row = entry.events_kruskal_wallis(spark, SF_DIR).collect()[0]
    assert row["n_events"] == n
    assert row["k_groups"] == len(groups)
    assert row["h_stat"] == pytest.approx(h, abs=1e-6)


def test_engagement_ols_matches_numpy(spark):
    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["user_id", "value"],
        use_threads=False,
    )
    uid = np.asarray(t.column("user_id"), dtype="float64")
    val = np.asarray(t.column("value"), dtype="float64")
    keep = ~np.isnan(uid) & ~np.isnan(val)
    uid = uid[keep].astype("int64")
    units = np.floor(val[keep]).astype("int64")
    users, inv = np.unique(uid, return_inverse=True)
    x = np.bincount(inv).astype("float64")
    y = np.bincount(inv, weights=units)
    slope, intercept = np.polyfit(x, y, 1)
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    row = entry.events_user_engagement_ols(spark, SF_DIR).collect()[0]
    assert row["n_users"] == len(users)
    assert row["slope"] == pytest.approx(slope, rel=1e-9)
    assert row["intercept"] == pytest.approx(intercept, rel=1e-9)
    assert row["r_squared"] == pytest.approx(r2, rel=1e-9)


def test_cusum_changepoint_matches_numpy(spark):
    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["ts"], use_threads=False,
    )
    us = np.asarray(t.column("ts"), dtype="datetime64[us]").astype("int64")
    hours = us // 3_600_000_000
    hs, counts = np.unique(hours, return_counts=True)
    s = np.cumsum(counts)
    n, N = len(hs), s[-1]
    d = np.abs(n * s - np.arange(1, n + 1) * N)
    best = np.lexsort((hs, -d))[0]
    row = entry.events_cusum_changepoint(spark, SF_DIR).collect()[0]
    assert row["change_hour"] == hs[best]
    assert row["d_stat"] == d[best]
    assert row["d_norm"] == pytest.approx(d[best] / (n * N), rel=1e-12)


def test_bootstrap_ci_matches_hashlib(spark):
    """Independent replay: hashlib md5 (not Spark's, not DuckDB's) drives
    the same Poisson-threshold weights; replica means and the order-
    statistic CI must match bit-for-bit."""
    import hashlib

    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["user_id", "value"],
        use_threads=False,
    )
    uid = np.asarray(t.column("user_id"), dtype="float64")
    val = np.asarray(t.column("value"), dtype="float64")
    keep = ~np.isnan(uid)
    uid = uid[keep].astype("int64")
    cents = np.floor(val[keep] * 100)
    users, inv = np.unique(uid, return_inverse=True)
    y = np.bincount(inv, weights=np.where(np.isnan(cents), 0, cents)).astype(
        "int64"
    )

    def u64(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")

    B = entry._BOOT_B
    T = entry._BOOT_T
    ms = []
    for r in range(B):
        sw = ww = 0
        for u, yy in zip(users, y):
            h = u64(f"boot:{r}:{u}")
            w = 0 if h < T[0] else 1 if h < T[1] else 2 if h < T[2] else (
                3 if h < T[3] else 4
            )
            sw += w * int(yy)
            ww += w
        ms.append((sw / ww, r))
    ms.sort()
    row = entry.events_bootstrap_mean_ci(spark, SF_DIR).collect()[0]
    assert row["n_users"] == len(users)
    assert row["mean_cents"] == y.sum() / len(users)
    assert row["ci_lo_cents"] == ms[1][0]
    assert row["ci_hi_cents"] == ms[B - 2][0]
    # the interval brackets the point estimate
    assert row["ci_lo_cents"] < row["mean_cents"] < row["ci_hi_cents"]


def test_permutation_test_matches_hashlib(spark):
    import hashlib

    t = pq.read_table(
        SF_DIR + "/events.parquet",
        columns=["event_id", "event_type", "value"],
        use_threads=False,
    )
    et = np.asarray(t.column("event_type"))
    keep = np.isin(et, ["purchase", "view"])
    eid = np.asarray(t.column("event_id"), dtype="int64")[keep]
    cents = np.floor(
        np.asarray(t.column("value"), dtype="float64")[keep] * 100
    ).astype("int64")
    is_p = et[keep] == "purchase"
    diff_obs = cents[is_p].mean() - cents[~is_p].mean()

    def u64(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")

    B = entry._PERM_B
    k = 0
    for r in range(B):
        a = np.array([u64(f"perm:{r}:{e}") < (1 << 63) for e in eid])
        d = cents[a].mean() - cents[~a].mean()
        if abs(d) >= abs(diff_obs):
            k += 1
    row = entry.events_permutation_test(spark, SF_DIR).collect()[0]
    assert row["n_a"] == is_p.sum() and row["n_b"] == (~is_p).sum()
    assert row["diff_obs"] == pytest.approx(diff_obs, rel=1e-12)
    assert row["k_extreme"] == k
    assert row["p_value"] == (1 + k) / (B + 1)


def test_type_dow_independence_matches_numpy(spark):
    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["event_type", "ts"],
        use_threads=False,
    )
    et = np.asarray(t.column("event_type"))
    us = np.asarray(t.column("ts"), dtype="datetime64[us]").astype("int64")
    dow = (us // 86_400_000_000) % 7
    types = np.unique(et)
    dows = np.unique(dow)
    O = np.array(
        [[((et == a) & (dow == b)).sum() for b in dows] for a in types],
        dtype="float64",
    )
    N = O.sum()
    E = O.sum(axis=1, keepdims=True) * O.sum(axis=0, keepdims=True) / N
    chi2 = ((O - E) ** 2 / E).sum()
    v = np.sqrt(chi2 / (N * min(len(types) - 1, len(dows) - 1)))
    row = entry.events_type_dow_independence(spark, SF_DIR).collect()[0]
    assert row["n_events"] == N
    assert row["dof"] == (len(types) - 1) * (len(dows) - 1)
    assert row["chi2"] == pytest.approx(chi2, abs=2e-6)
    assert row["cramers_v"] == pytest.approx(v, abs=2e-6)


def test_survival_hazard_matches_numpy(spark):
    t = pq.read_table(
        SF_DIR + "/events.parquet",
        columns=["user_id", "event_type", "ts"],
        use_threads=False,
    )
    uid = np.asarray(t.column("user_id"), dtype="float64")
    keep = ~np.isnan(uid)
    uid = uid[keep].astype("int64")
    et = np.asarray(t.column("event_type"))[keep]
    day = (
        np.asarray(t.column("ts"), dtype="datetime64[us]").astype("int64")[
            keep
        ]
        // 86_400_000_000
    )
    users = np.unique(uid)
    gmax = day.max()
    durs, events = [], []
    for u in users:
        m = uid == u
        d0 = day[m].min()
        pd_ = day[m & (et == "purchase")]
        if len(pd_):
            durs.append(pd_.min() - d0)
            events.append(1)
        else:
            durs.append(gmax - d0)
            events.append(0)
    durs, events = np.array(durs), np.array(events)
    rows = entry.events_user_survival_hazard(spark, SF_DIR).collect()
    cum = 0.0
    got = {r["t_days"]: r for r in rows}
    for tt in sorted(set(durs[events == 1])):
        n_risk = (durs >= tt).sum()
        d = ((durs == tt) & (events == 1)).sum()
        cum += d / n_risk
        r = got[tt]
        assert r["n_risk"] == n_risk and r["n_deaths"] == d
        assert r["hazard"] == d / n_risk
        assert r["cum_hazard"] == pytest.approx(cum, abs=2e-6)
    assert len(rows) == len(set(durs[events == 1]))


def test_correlation_matrix_matches_numpy(spark):
    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["user_id", "value"],
        use_threads=False,
    )
    uid = np.asarray(t.column("user_id"), dtype="float64")
    val = np.asarray(t.column("value"), dtype="float64")
    keep = ~np.isnan(uid)
    uid = uid[keep].astype("int64")
    cents = np.floor(val[keep] * 100)
    users, inv = np.unique(uid, return_inverse=True)
    a = np.bincount(inv).astype("float64")
    s = np.bincount(inv, weights=np.where(np.isnan(cents), 0, cents))
    p = np.full(len(users), -np.inf)
    np.maximum.at(p, inv[~np.isnan(cents)], cents[~np.isnan(cents)])
    row = entry.events_metric_correlation_matrix(spark, SF_DIR).collect()[0]
    assert row["n_users"] == len(users)
    assert row["r_activity_spend"] == pytest.approx(
        np.corrcoef(a, s)[0, 1], rel=1e-9
    )
    assert row["r_activity_peak"] == pytest.approx(
        np.corrcoef(a, p)[0, 1], rel=1e-9
    )
    assert row["r_spend_peak"] == pytest.approx(
        np.corrcoef(s, p)[0, 1], rel=1e-9
    )


def test_simpson_slopes_match_numpy(spark):
    t = pq.read_table(
        SF_DIR + "/events.parquet",
        columns=["event_type", "ts", "value"],
        use_threads=False,
    )
    val = np.asarray(t.column("value"), dtype="float64")
    keep = ~np.isnan(val)
    et = np.asarray(t.column("event_type"))[keep]
    h = (
        np.asarray(t.column("ts"), dtype="datetime64[us]").astype("int64")[
            keep
        ]
        // 3_600_000_000
    )
    y = np.floor(val[keep] * 100)
    x = (h - h.min()).astype("float64")
    rows = {
        r["g"]: r
        for r in entry.events_simpson_slope_check(spark, SF_DIR).collect()
    }
    pooled = np.polyfit(x, y, 1)[0]
    assert rows["ALL"]["slope"] == pytest.approx(pooled, rel=1e-9)
    assert rows["ALL"]["sign_reversed"] is False
    for g in np.unique(et):
        m = et == g
        sl = np.polyfit(x[m], y[m], 1)[0]
        assert rows[g]["slope"] == pytest.approx(sl, rel=1e-6)
        assert rows[g]["sign_reversed"] == (np.sign(sl) != np.sign(pooled))


def test_cuped_matches_numpy(spark):
    import hashlib

    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["user_id", "ts", "value"],
        use_threads=False,
    )
    uid = np.asarray(t.column("user_id"), dtype="float64")
    val = np.asarray(t.column("value"), dtype="float64")
    keep = ~np.isnan(uid) & ~np.isnan(val)
    uid = uid[keep].astype("int64")
    h = (
        np.asarray(t.column("ts"), dtype="datetime64[us]").astype("int64")[
            keep
        ]
        // 3_600_000_000
    )
    cents = np.floor(val[keep] * 100).astype("int64")
    hmid = (h.min() + h.max()) // 2
    users, inv = np.unique(uid, return_inverse=True)
    x = np.bincount(inv, weights=np.where(h < hmid, cents, 0))
    y = np.bincount(inv, weights=np.where(h >= hmid, cents, 0))
    tmask = np.array(
        [
            int.from_bytes(
                hashlib.md5(f"ab:{u}".encode()).digest()[8:16], "little"
            )
            % 2
            == 0
            for u in users
        ]
    )
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    diff_raw = y[tmask].mean() - y[~tmask].mean()
    diff_cuped = diff_raw - theta * (x[tmask].mean() - x[~tmask].mean())
    adj = y - theta * x
    vr = 1 - np.var(adj) / np.var(y)
    row = entry.events_ab_cuped_adjustment(spark, SF_DIR).collect()[0]
    assert row["n_users"] == len(users)
    assert row["n_treat"] == tmask.sum()
    assert row["theta"] == pytest.approx(theta, rel=1e-9)
    assert row["diff_raw"] == pytest.approx(diff_raw, rel=1e-9)
    assert row["diff_cuped"] == pytest.approx(diff_cuped, rel=1e-6)
    assert row["var_reduction"] == pytest.approx(vr, rel=1e-6)
    assert 0.0 <= row["var_reduction"] <= 1.0


def test_theil_sen_matches_numpy(spark):
    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["ts"], use_threads=False
    )
    d = (
        np.asarray(t.column("ts"), dtype="datetime64[us]").astype("int64")
        // 86_400_000_000
    )
    days, counts = np.unique(d, return_counts=True)
    di, dj = np.triu_indices(len(days), k=1)
    slopes = (counts[dj] - counts[di]).astype("float64") / (
        days[dj] - days[di]
    ).astype("float64")
    med = np.median(slopes)  # numpy averages the two middles, same rule
    icept = np.median(counts.astype("float64") - med * days.astype("float64"))
    row = entry.events_theil_sen_trend(spark, SF_DIR).collect()[0]
    assert row["n_days"] == len(days)
    assert row["n_pairs"] == len(slopes)
    assert row["ts_slope"] == pytest.approx(med, rel=1e-12, abs=1e-12)
    assert row["ts_intercept"] == pytest.approx(icept, rel=1e-9)


def test_dow_seasonal_decomposition_matches_numpy(spark):
    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["ts"], use_threads=False
    )
    d = (
        np.asarray(t.column("ts"), dtype="datetime64[us]").astype("int64")
        // 86_400_000_000
    )
    days, counts = np.unique(d, return_counts=True)
    # textbook: centered 7-day moving average needs all 7 calendar days
    by_day = dict(zip(days.tolist(), counts.tolist()))
    rows = {}
    for day, c in by_day.items():
        window = [by_day.get(day + k) for k in range(-3, 4)]
        if any(v is None for v in window):
            continue
        detr7 = 7 * c - sum(window)
        rows.setdefault(day % 7, []).append(detr7)
    got = {
        r["dow_idx"]: r
        for r in entry.events_dow_seasonal_decomposition(
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(rows)
    for dow, detr in rows.items():
        r = got[dow]
        assert r["n_days"] == len(detr)
        assert r["sum_detr7"] == sum(detr)
        assert r["max_abs_detr7"] == max(abs(v) for v in detr)
        assert r["seasonal"] == pytest.approx(
            np.mean(detr) / 7.0, rel=1e-12
        )


def test_hourly_ema_matches_python(spark):
    """Recomputes the truncated (n<=12) alpha=1/2 EMA per event type with
    Python ints/Fractions over raw parquet — the textbook recursive
    formula, independent of both engine twins' shift spelling."""
    from fractions import Fraction
    from collections import defaultdict
    from math import floor

    t = pq.read_table(
        SF_DIR + "/events.parquet", columns=["event_type", "ts", "value"],
        use_threads=False,
    )
    et = t.column("event_type").to_pylist()
    us = t.column("ts").cast("int64").to_pylist()
    val = t.column("value").to_pylist()
    hourly = defaultdict(int)
    for e, m, v in zip(et, us, val):
        if v is not None:
            hourly[(e, m // 3_600_000_000)] += floor(v * 100)
    series = defaultdict(list)
    for (e, h), c in sorted(hourly.items()):
        series[e].append((h, c))
    rows = {r["event_type"]: r for r in
            entry.events_hourly_ema(spark, SF_DIR).collect()}
    assert set(rows) == set(series)
    for e, pts in series.items():
        last = pts[-12:]  # trailing n<=12 hours, oldest first
        n = len(last)
        # textbook: weights alpha*(1-alpha)^k, k=0 newest, normalized
        num = sum(
            Fraction(1, 2 ** (k + 1)) * c
            for k, (_, c) in enumerate(reversed(last))
        )
        den = 1 - Fraction(1, 2**n)
        exact = num / den
        r = rows[e]
        assert r["n_hours_used"] == n
        assert r["last_hour"] == last[-1][0]
        assert r["last_cents"] == last[-1][1]
        assert r["ema_num"] == num * 2**n  # integer numerator identity
        # the engine's single division is correctly rounded; the exact
        # rational sits within half an ulp
        assert r["ema_cents"] == pytest.approx(float(exact), abs=0, rel=1e-15)


def test_readability_matches_python(spark):
    """Re-derives words/sentences/syllables with Python re over raw
    parquet and the textbook Flesch formula — bit-identical doubles."""
    import re

    t = pq.read_table(
        SF_DIR + "/documents.parquet", columns=["source", "text"],
        use_threads=False,
    )
    from collections import defaultdict

    acc = defaultdict(lambda: [0, 0, 0, 0])  # n, w, s, syl
    for src, txt in zip(
        t.column("source").to_pylist(), t.column("text").to_pylist()
    ):
        a = acc[src]
        a[0] += 1
        a[1] += len(re.split(r"\s+", txt.strip()))
        a[2] += max(1, len(re.findall(r"[.!?]+", txt)))
        a[3] += len(re.findall(r"[aeiou]+", txt))
    rows = {r["source"]: r for r in
            entry.doc_readability_scores(spark, SF_DIR).collect()}
    assert set(rows) == set(acc)
    for src, (n, w, s, syl) in acc.items():
        r = rows[src]
        assert (r["n_docs"], r["words"], r["sentences"], r["syllables"]) == (
            n, w, s, syl,
        )
        assert r["flesch"] == 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)


def test_benford_matches_python(spark):
    """First-digit counts from exact cents strings + the chi-square
    statistic recomputed with math.log10 — shares bit-identical, chi2
    equal after the documented ROUND 6."""
    import math
    from collections import Counter
    from math import floor

    t = pq.read_table(
        SF_DIR + "/orders.parquet", columns=["o_totalprice"],
        use_threads=False,
    )
    cnt = Counter()
    for v in t.column("o_totalprice").to_pylist():
        c = floor(v * 100)
        if c > 0:
            cnt[int(str(c)[0])] += 1
    total = sum(cnt.values())
    rows = {r["digit"]: r for r in
            entry.orders_benford_audit(spark, SF_DIR).collect()}
    assert set(rows) == set(cnt)
    chi2 = 0.0
    for d, n in sorted(cnt.items()):
        p = math.log10(1 + 1 / d)
        r = rows[d]
        assert r["n"] == n
        assert r["share"] == n / total
        assert r["p_benford"] == p
        chi2 += (n - total * p) ** 2 / (total * p)
    # association order differs; ROUND 6 is the documented absorber
    assert abs(rows[1]["chi2"] - chi2) < 2e-6


def test_mann_kendall_matches_python(spark):
    """Textbook S / tie-corrected variance / z recomputed from raw
    parquet with itertools — bit-identical doubles."""
    import math
    from collections import Counter
    from itertools import combinations

    t = pq.read_table(SF_DIR + "/events.parquet", columns=["ts"],
                      use_threads=False)
    us = np.asarray(t.column("ts").cast("int64"))
    daily = Counter((us // 86_400_000_000).tolist())
    cs = [c for _, c in sorted(daily.items())]
    s = sum(
        (0 if a == b else (1 if b > a else -1))
        for a, b in combinations(cs, 2)
    )
    n = len(cs)
    ties = Counter(cs)
    tie_term = sum(t_ * (t_ - 1) * (2 * t_ + 5) for t_ in ties.values())
    var_num = n * (n - 1) * (2 * n + 5) - tie_term
    var_s = var_num / 18.0
    if s > 0:
        z = (s - 1) / math.sqrt(var_s)
    elif s < 0:
        z = (s + 1) / math.sqrt(var_s)
    else:
        z = 0.0
    [r] = entry.events_mann_kendall_trend(spark, SF_DIR).collect()
    assert (r["n_days"], r["s_stat"], r["var_num"]) == (n, s, var_num)
    assert r["var_s"] == var_s and r["z"] == z


def test_l_diversity_matches_python(spark):
    from collections import defaultdict
    from math import floor

    t = pq.read_table(
        SF_DIR + "/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
        use_threads=False,
    )
    groups = defaultdict(lambda: [0, set()])
    for nk, seg, bal in zip(
        t.column("c_nationkey").to_pylist(),
        t.column("c_mktsegment").to_pylist(),
        t.column("c_acctbal").to_pylist(),
    ):
        g = groups[(nk, seg)]
        g[0] += 1
        g[1].add(floor(bal / 100.0))
    [r] = entry.customer_l_diversity_audit(spark, SF_DIR).collect()
    assert r["n_rows"] == sum(g for g, _ in groups.values())
    assert r["n_groups"] == len(groups)
    assert r["min_l"] == min(len(s) for _, s in groups.values())
    exposed = sum(g for g, s in groups.values() if len(s) < 3)
    assert r["n_exposed_rows"] == exposed
    assert r["exposed_share"] == exposed / r["n_rows"]


def test_rolling_weekly_corr_matches_numpy(spark):
    """7-day rolling Pearson recomputed with numpy over raw parquet —
    bit-identical via the same exact-int moment chain."""
    import math
    from collections import defaultdict
    from math import floor

    t = pq.read_table(
        SF_DIR + "/events.parquet",
        columns=["event_type", "ts", "value"],
        use_threads=False,
    )
    us = np.asarray(t.column("ts").cast("int64"))
    acc = defaultdict(lambda: [0, 0])
    for et, m, v in zip(
        t.column("event_type").to_pylist(), us.tolist(),
        t.column("value").to_pylist(),
    ):
        if et in ("purchase", "view") and v is not None:
            acc[m // 86_400_000_000][0 if et == "purchase" else 1] += floor(
                v * 100.0
            )
        elif et in ("purchase", "view"):
            acc[m // 86_400_000_000]  # day exists even if all-null
    days = sorted(acc)
    rows = {r["d"]: r for r in
            entry.events_rolling_weekly_corr(spark, SF_DIR).collect()}
    for d in days:
        win = [acc[dd] for dd in days if d - 6 <= dd <= d]
        if len(win) != 7:
            assert d not in rows
            continue
        xs = [w[0] for w in win]
        ys = [w[1] for w in win]
        n = 7
        num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
        vx = n * sum(x * x for x in xs) - sum(xs) ** 2
        vy = n * sum(y * y for y in ys) - sum(ys) ** 2
        r = rows[d]
        assert (r["sx"], r["sy"]) == (sum(xs), sum(ys))
        denom = math.sqrt(float(vx)) * math.sqrt(float(vy))
        if denom == 0.0:
            assert r["corr7"] is None
        else:
            assert r["corr7"] == float(num) / denom
