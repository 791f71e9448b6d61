"""Relational custom-operator unit tests: as-of join null semantics,
Bloom semi-join with same-named keys and nullable keys, range join
boundary/bucket semantics."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from tdigest_spark.operators.relational import (
    asof_join,
    bloom_semi_join,
    range_join,
)


def test_asof_join_carries_null_right_values(spark):
    """The most recent right row wins even when its value IS null — an
    older non-null value must not leak forward past it."""
    left = spark.createDataFrame(
        [(1, 3.0), (1, 1.5)], "uid long, ts double"
    )
    right = spark.createDataFrame(
        [(1, 1.0, 5.0), (1, 2.0, None)], "uid long, ts double, v double"
    )
    got = {
        r.ts: r.asof_v
        for r in asof_join(left, right, "ts", "uid", ["v"]).collect()
    }
    assert got[1.5] == 5.0  # only the ts=1 row is visible
    assert got[3.0] is None  # ts=2 row is most recent; its value is null


def test_asof_join_no_right_row_yet(spark):
    left = spark.createDataFrame([(1, 0.5)], "uid long, ts double")
    right = spark.createDataFrame([(1, 1.0, 9.0)], "uid long, ts double, v double")
    [r] = asof_join(left, right, "ts", "uid", ["v"]).collect()
    assert r.asof_v is None


def test_bloom_semi_join_same_key_name(spark):
    """Both sides using the same key column name must not raise
    AMBIGUOUS_REFERENCE; nullable left keys are pruned, not crashed on."""
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (None, "d")], "k long, payload string"
    )
    right = spark.createDataFrame([(1,), (3,)], "k long")
    got = sorted(
        r.payload
        for r in bloom_semi_join(left, "k", right, "k", 1000, 0.01).collect()
    )
    assert got == ["a", "c"]


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_range_join_inclusive_bounds_and_keys(spark):
    """Both interval endpoints are inclusive (integer-µs compare); the
    equi-key restricts matches; out-of-window rows are dropped."""
    left = spark.createDataFrame(
        [(1, 100, _ts(1000))], "lid long, uid long, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, 100, _ts(700)),    # exactly lts - 300 -> included
            (11, 100, _ts(1000)),   # exactly lts -> included
            (12, 100, _ts(699)),    # 1s before the window -> out
            (13, 100, _ts(1001)),   # 1s after -> out
            (14, 999, _ts(900)),    # wrong key -> out
        ],
        "rid long, uid long, rts timestamp",
    )
    got = sorted(
        r.rid
        for r in range_join(
            left, right, "lts", "rts", -300.0, 0.0, on=["uid"]
        ).collect()
    )
    assert got == [10, 11]


def test_range_join_multi_bucket_no_duplicate_pairs(spark):
    """With bucket_seconds far smaller than the span the left row explodes
    to many buckets — each qualifying pair must still appear exactly once
    (a right row lives in one bucket)."""
    left = spark.createDataFrame([(1, _ts(500))], "lid long, lts timestamp")
    right = spark.createDataFrame(
        [(i, _ts(400 + i)) for i in range(0, 200, 7)],
        "rid long, rts timestamp",
    )
    out = range_join(
        left, right, "lts", "rts", -100.0, 100.0, bucket_seconds=10.0
    ).collect()
    rids = [r.rid for r in out]
    assert len(rids) == len(set(rids))
    assert sorted(rids) == [i for i in range(0, 200, 7)]  # all within ±100s


def test_range_join_matches_bruteforce_on_random_data(spark):
    """Randomized (fixed-seed) cross-check: bucket-expansion pairs ==
    brute-force O(n^2) inequality pairs, across asymmetric windows that
    don't align with bucket boundaries."""
    import random

    rng = random.Random(42)
    left = [(i, rng.randrange(0, 5), _ts(rng.uniform(0, 2000))) for i in range(40)]
    right = [
        (100 + i, rng.randrange(0, 5), _ts(rng.uniform(0, 2000)))
        for i in range(120)
    ]
    ldf = spark.createDataFrame(left, "lid long, uid long, lts timestamp")
    rdf = spark.createDataFrame(right, "rid long, uid long, rts timestamp")
    for lo, hi, bucket in [(-137.5, 61.25, None), (12.0, 500.0, 33.0), (-50.0, -10.0, None)]:
        got = sorted(
            (r.lid, r.rid)
            for r in range_join(
                ldf, rdf, "lts", "rts", lo, hi, on=["uid"], bucket_seconds=bucket
            ).collect()
        )
        lo_us, hi_us = int(lo * 1e6), int(hi * 1e6)

        def us(t):
            # exact integer µs (float .timestamp() can be off by 1 µs)
            d = t - dt.datetime(1970, 1, 1)
            return (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds

        want = sorted(
            (lid, rid)
            for (lid, luid, lt) in left
            for (rid, ruid, rt) in right
            if luid == ruid and us(lt) + lo_us <= us(rt) <= us(lt) + hi_us
        )
        assert got == want, (lo, hi, bucket)


def test_range_join_rejects_overlapping_payload_names(spark):
    left = spark.createDataFrame([(1, _ts(0))], "v long, lts timestamp")
    right = spark.createDataFrame([(2, _ts(0))], "v long, rts timestamp")
    with pytest.raises(ValueError, match="disjoint"):
        range_join(left, right, "lts", "rts", 0.0, 1.0)


def test_distributed_value_cumsum_matches_bruteforce(spark):
    """Exclusive prefix sums over distinct positive int values, both
    directions, equal a driver-side brute force — including values that
    straddle bit-length bucket boundaries (1,2,3,4,7,8,9,...)."""
    from tdigest_spark.operators.relational import distributed_value_cumsum

    vals = [1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 1023, 1024, 10**12]
    weights = {v: (v % 7) + 1 for v in vals}
    df = spark.createDataFrame(
        [(v, weights[v]) for v in vals], "v long, w long"
    )
    for desc in (False, True):
        got = {
            r.v: r.prefix
            for r in distributed_value_cumsum(
                df, "v", "w", descending=desc
            ).collect()
        }
        order = sorted(vals, reverse=desc)
        run, expect = 0, {}
        for v in order:
            expect[v] = run
            run += weights[v]
        assert got == expect, f"descending={desc}"


def test_distributed_value_cumsum_plan_has_no_global_window(spark):
    """The operator's contract: every Window is partitioned (by the
    bit-length bucket) — no Exchange SinglePartition feeds one."""
    from tdigest_spark.operators.relational import distributed_value_cumsum

    df = spark.createDataFrame(
        [(i, 1) for i in range(1, 200)], "v long, w long"
    )
    out = distributed_value_cumsum(df, "v", "w")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Window " in ln:
            for nxt in lines[i + 1 : i + 4]:
                assert "Exchange SinglePartition" not in nxt, plan


def test_time_bucketed_cumsum_matches_bruteforce(spark):
    """Exclusive prefix sums over an epoch-microsecond-like domain with
    NEGATIVE weights (sweep-line deltas), values straddling several
    calendar buckets, equal a driver-side brute force."""
    from tdigest_spark.operators.relational import time_bucketed_cumsum

    day = 86_400_000_000
    vals = [
        (0, 3), (5, -1), (day - 1, 2),            # bucket 0
        (day, -2), (day + 7, 4),                   # bucket 1
        (3 * day + 11, -3), (3 * day + 12, 1),     # bucket 3 (gap at 2)
        (10 * day, 5),                             # bucket 10
    ]
    df = spark.createDataFrame(vals, "v long, w long")
    got = {
        r.v: r.prefix
        for r in time_bucketed_cumsum(df, "v", "w", bucket_div=day).collect()
    }
    run, expect = 0, {}
    for v, w in sorted(vals):
        expect[v] = run
        run += w
    assert got == expect


def test_time_bucketed_cumsum_plan_has_no_global_window(spark):
    """Contract: the within-bucket running sum windows PARTITIONED BY the
    calendar bucket — no Exchange SinglePartition feeds a Window."""
    from tdigest_spark.operators.relational import time_bucketed_cumsum

    df = spark.createDataFrame(
        [(i * 3_600_000_000, (-1) ** i) for i in range(1, 300)],
        "v long, w long",
    )
    out = time_bucketed_cumsum(df, "v", "w", bucket_div=86_400_000_000)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Window " in ln:
            for nxt in lines[i + 1 : i + 4]:
                assert "Exchange SinglePartition" not in nxt, plan
