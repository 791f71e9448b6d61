"""Corpus-drift (KL divergence) and cohort-retention operators
(tdigest_spark/operators/drift.py) on hand-built frames with closed-form
expected answers."""

import datetime
import math

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


class TestWordDivergence:
    def test_uniform_source_zero_kl(self, spark):
        """A source whose word distribution equals the corpus distribution
        has KL == 0 (and nothing lifted)."""
        from tdigest_spark.operators.drift import word_divergence_by_group

        rows = [("a", "x x y"), ("b", "x x y")]
        out = word_divergence_by_group(_docs(spark, rows)).collect()
        assert [r["source"] for r in out] == ["a", "b"]
        for r in out:
            assert r["kl"] == 0.0
            assert r["n_lifted"] == 0
            assert r["n_words"] == 2

    def test_closed_form_kl_and_lift(self, spark):
        """Two skewed sources: verify KL against the hand-computed sum and
        the integer lift rule (c_gw * n_total > k * c_w * n_g)."""
        from tdigest_spark.operators.drift import word_divergence_by_group

        # source a: 9x "x", 1x "y"; source b: 1x "x", 9x "y"
        rows = [("a", " ".join(["x"] * 9 + ["y"])), ("b", " ".join(["x"] + ["y"] * 9))]
        out = {
            r["source"]: r
            for r in word_divergence_by_group(
                _docs(spark, rows), lift_k=1
            ).collect()
        }
        # corpus: x=10, y=10, n=20 -> q(x)=q(y)=0.5
        expected = round(0.9 * math.log(0.9 / 0.5) + 0.1 * math.log(0.1 / 0.5), 6)
        assert out["a"]["kl"] == pytest.approx(expected, abs=1e-6)
        assert out["b"]["kl"] == pytest.approx(expected, abs=1e-6)
        # lift_k=1: "x" in a has p=0.9 > 1*0.5 -> lifted; "y" is not.
        assert out["a"]["n_lifted"] == 1
        assert out["b"]["n_lifted"] == 1

    def test_case_fold_and_blank_rows(self, spark):
        from tdigest_spark.operators.drift import word_divergence_by_group

        rows = [("a", "X x"), ("a", "   "), ("b", "x x")]
        out = word_divergence_by_group(_docs(spark, rows)).collect()
        assert {(r["source"], r["n_words"]) for r in out} == {("a", 1), ("b", 1)}
        assert all(r["kl"] == 0.0 for r in out)


class TestDriftMathProperties:
    def test_kl_nonnegative_gibbs(self, spark):
        """Gibbs' inequality: KL(source ‖ corpus) >= 0 for every source,
        on a seeded skewed corpus."""
        import random

        from tdigest_spark.operators.drift import word_divergence_by_group

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(30)]
        rows = [
            (f"s{rng.randrange(4)}", " ".join(rng.choices(vocab, k=rng.randrange(1, 40))))
            for _ in range(200)
        ]
        out = word_divergence_by_group(_docs(spark, rows)).collect()
        assert len(out) == 4
        assert all(r["kl"] >= 0.0 for r in out)

    def test_psi_symmetric_under_half_swap(self, spark):
        """PSI is symmetric in the two halves: flipping id parity
        (event_id + 1) leaves psi and the bucket counts mirrored."""
        import random

        from tdigest_spark.operators.drift import psi_fixed_buckets

        rng = random.Random(11)
        rows = [(i, rng.uniform(0.5, 120.0)) for i in range(400)]
        df = spark.createDataFrame(rows, "event_id bigint, value double")
        a = psi_fixed_buckets(df).collect()[0]
        flipped = df.withColumn("event_id", F.col("event_id") + 1)
        b = psi_fixed_buckets(flipped).collect()[0]
        assert a["psi"] == b["psi"]
        assert a["n_buckets_both"] == b["n_buckets_both"]
        assert (a["n_only_a"], a["n_only_b"]) == (b["n_only_b"], b["n_only_a"])


class TestPsiFixedBuckets:
    def test_identical_halves_zero_psi(self, spark):
        from tdigest_spark.operators.drift import psi_fixed_buckets

        # even/odd ids see the same values -> identical histograms
        rows = [(i, float(v)) for v in (5, 15, 25) for i in (2 * v, 2 * v + 1)]
        df = spark.createDataFrame(rows, "event_id bigint, value double")
        out = psi_fixed_buckets(df).collect()[0]
        assert out["psi"] == 0.0
        assert out["n_buckets_both"] == 3
        assert out["n_only_a"] == 0 and out["n_only_b"] == 0

    def test_closed_form_psi_and_one_sided_buckets(self, spark):
        import math

        from tdigest_spark.operators.drift import psi_fixed_buckets

        # half A (even ids): bucket0 x3, bucket1 x1;  half B (odd ids):
        # bucket0 x1, bucket1 x3, bucket9 x1 (one-sided).
        rows = (
            [(0, 1.0), (2, 2.0), (4, 3.0), (6, 15.0)]
            + [(1, 1.0), (3, 15.0), (5, 16.0), (7, 17.0), (9, 95.0)]
        )
        df = spark.createDataFrame(rows, "event_id bigint, value double")
        out = psi_fixed_buckets(df).collect()[0]
        pa0, pb0 = 3 / 4, 1 / 5
        pa1, pb1 = 1 / 4, 3 / 5
        expected = round(
            (pa0 - pb0) * math.log(pa0 / pb0) + (pa1 - pb1) * math.log(pa1 / pb1),
            6,
        )
        assert out["psi"] == pytest.approx(expected, abs=1e-6)
        assert out["n_buckets_both"] == 2
        assert out["n_only_a"] == 0
        assert out["n_only_b"] == 1

    def test_no_shared_buckets_yields_null_psi(self, spark):
        from tdigest_spark.operators.drift import psi_fixed_buckets

        df = spark.createDataFrame(
            [(0, 1.0), (1, 95.0)], "event_id bigint, value double"
        )
        out = psi_fixed_buckets(df).collect()[0]
        assert out["psi"] is None
        assert out["n_buckets_both"] == 0
        assert out["n_only_a"] == 1 and out["n_only_b"] == 1


class TestCohortRetention:
    def test_two_cohorts(self, spark):
        """u1 first seen week of Mon 2026-01-05, active again 2 weeks later;
        u2 first seen the following week only."""
        from tdigest_spark.operators.drift import cohort_retention

        rows = [
            (1, datetime.datetime(2026, 1, 7, 10, 0)),   # wk 2026-01-05
            (1, datetime.datetime(2026, 1, 8, 11, 0)),   # same week (dedup)
            (1, datetime.datetime(2026, 1, 20, 9, 0)),   # wk 2026-01-19 -> +2
            (2, datetime.datetime(2026, 1, 13, 8, 0)),   # wk 2026-01-12
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        out = [
            (str(r["cohort"]), r["week_offset"], r["n_users"])
            for r in cohort_retention(df).collect()
        ]
        assert out == [
            ("2026-01-05", 0, 1),
            ("2026-01-05", 2, 1),
            ("2026-01-12", 0, 1),
        ]

    def test_retention_counts_distinct_users(self, spark):
        from tdigest_spark.operators.drift import cohort_retention

        base = datetime.datetime(2026, 1, 5, 12, 0)
        rows = [(u, base) for u in (1, 2, 3)] + [
            (1, base + datetime.timedelta(days=7)),
            (2, base + datetime.timedelta(days=7)),
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        out = {
            (r["week_offset"], r["n_users"]) for r in cohort_retention(df).collect()
        }
        assert out == {(0, 3), (1, 2)}

    def test_week_offset_type_is_bigint(self, spark):
        from tdigest_spark.operators.drift import cohort_retention

        df = spark.createDataFrame(
            [(1, datetime.datetime(2026, 1, 5))], "user_id bigint, ts timestamp"
        )
        schema = dict(cohort_retention(df).dtypes)
        assert schema == {
            "cohort": "date",
            "week_offset": "bigint",
            "n_users": "bigint",
        }


def test_unigram_logprob_hand_computed(spark):
    """Tiny corpus where mean ln p(w) is hand-checkable: vocab counts
    a=3, b=2, c=1 (n_total=6); doc 1 = 'a a b', doc 2 = 'c'."""
    import math

    from tdigest_spark.operators.drift import unigram_logprob_by_doc

    df = spark.createDataFrame(
        [(1, "s1", "A a  b"), (2, "s2", "c"), (3, "s1", "a B"), (4, "s2", "  ")],
        "doc_id long, source string, text string",
    )
    rows = {r.doc_id: r for r in unigram_logprob_by_doc(df).collect()}
    # blank doc 4 excluded entirely
    assert set(rows) == {1, 2, 3}
    assert rows[1].n_words == 3 and rows[3].n_words == 2
    exp1 = round((2 * math.log(3 / 6) + math.log(2 / 6)) / 3, 6)
    exp2 = round(math.log(1 / 6), 6)
    exp3 = round((math.log(3 / 6) + math.log(2 / 6)) / 2, 6)
    assert rows[1].logp == exp1
    assert rows[2].logp == exp2
    assert rows[3].logp == exp3
    # the improbable single-'c' doc scores lowest
    assert rows[2].logp < rows[3].logp < rows[1].logp
