"""Time-RANGE window frames and the MAD digest composition."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _trailing(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, us long, value double")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return {
        (r.user_id, r.us): (r.n, r.cents)
        for r in df.select(
            "user_id",
            "us",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum(F.floor(F.col("value") * F.lit(100.0)))
            .over(w)
            .alias("cents"),
        ).collect()
    }


def test_range_frame_includes_boundary_and_peers(spark):
    h = 3_600_000_000
    rows = [
        (1, 0, 1.0),
        (1, h, 2.0),          # exactly one hour later: inside the frame
        (1, h + 1, 4.0),      # 1 µs past: the first row falls out
        (2, 0, 1.0),
        (2, 0, 2.0),          # tie: RANGE peers — both rows see both
    ]
    out = _trailing(spark, rows)
    assert out[(1, h)] == (2, 300)
    assert out[(1, h + 1)] == (2, 600)
    assert out[(2, 0)] == (2, 300)


def test_range_frame_matches_bruteforce(spark):
    rng = np.random.RandomState(7)
    rows = [
        (int(rng.randint(0, 5)), int(rng.randint(0, 10**10)), float(v))
        for v in rng.uniform(-3, 3, size=300)
    ]
    out = _trailing(spark, rows)
    for u, us, _ in rows:
        in_frame = [
            r for r in rows if r[0] == u and us - 3_600_000_000 <= r[1] <= us
        ]
        want_cents = sum(int(np.floor(v * 100.0)) for _, _, v in in_frame)
        assert out[(u, us)] == (len(in_frame), want_cents)


def test_range_frame_plan_single_shuffle_no_join(spark, sf_dir):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    plan = (
        entry.events_user_trailing_hour(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # sliding frame, never a self-join
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_discrete_mad_matches_numpy(spark):
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 40, size=5000).astype(float)
    from tdigest_spark.operators.aggregate import TDIGEST_DISCRETE, build_sketch

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    d1 = build_sketch(df, "x", TDIGEST_DISCRETE())
    med = float(d1.quantile(0.5))
    # Nearest-Rank median: smallest value with cum count >= n/2
    s = np.sort(vals)
    assert med == s[int(np.ceil(0.5 * len(s))) - 1]
    dev = df.select(F.abs(F.col("x") - F.lit(med)).alias("d"))
    d2 = build_sketch(dev, "d", TDIGEST_DISCRETE())
    mad = float(d2.quantile(0.5))
    sd = np.sort(np.abs(vals - med))
    assert mad == sd[int(np.ceil(0.5 * len(sd))) - 1]


@pytest.fixture(scope="module")
def sf_dir():
    import os

    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _dyn_sessions(spark, rows):
    """rows: (key, seconds, gap_seconds) -> [(start_s, end_s, n)] sorted."""
    df = spark.createDataFrame(rows, "k string, sec double, g int").select(
        "k",
        F.expr("timestamp_micros(cast(sec * 1000000 as long))").alias("ts"),
        "g",
    )
    out = (
        df.groupBy(
            "k",
            F.session_window(
                "ts", F.concat(F.col("g").cast("string"), F.lit(" seconds"))
            ),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("session_window.start")).alias("s"),
            F.unix_micros(F.col("session_window.end")).alias("e"),
            "n",
        )
    )
    return sorted((r.s / 1e6, r.e / 1e6, r.n) for r in out.collect())


def test_session_window_boundary_touch_merges(spark):
    """The oracle contract for events_dynamic_gap_sessions: an event AT
    exactly the running session end MERGES (new session iff ts STRICTLY
    exceeds max prior ts+gap); 1 microsecond earlier also merges, and
    1 microsecond later splits."""
    # events at 0s and 10s, gap 10s: touching -> ONE session [0, 20)
    assert _dyn_sessions(spark, [("a", 0.0, 10), ("a", 10.0, 10)]) == [
        (0.0, 20.0, 2)
    ]
    # 10.000001s: strictly past the end -> TWO sessions
    assert _dyn_sessions(spark, [("b", 0.0, 10), ("b", 10.000001, 10)]) == [
        (0.0, 10.0, 1),
        (10.000001, 20.000001, 1),
    ]


def test_session_window_dynamic_gap_uses_each_rows_gap(spark):
    """Dynamic gaps: [0,5) [4,24) [23,28) chain-merge into one session
    whose end is the max member ts+gap — each row extends the session by
    ITS OWN gap, not the group's first."""
    rows = [("u", 0.0, 5), ("u", 4.0, 20), ("u", 23.0, 5)]
    assert _dyn_sessions(spark, rows) == [(0.0, 28.0, 3)]
    # break the chain: the 20s-gap row moved past 0+5 -> first row alone
    rows2 = [("v", 0.0, 5), ("v", 6.0, 20), ("v", 23.0, 5)]
    assert _dyn_sessions(spark, rows2) == [(0.0, 5.0, 1), (6.0, 28.0, 2)]
