"""Dedup operator tests: exact groups, shingling, MinHash engines.

Covers the Arrow shingle+minhash kernel (tdigest_spark/operators/dedup.py)
against the pure-JVM expression path: identical shingle sets, deterministic
signatures, and identical verified near-dup pair sets. The reference has no
dedup surface — these are the training-data-pipeline operators required by
the round spec.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.dedup import (
    _hash64_batch,
    exact_dup_groups,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    shingle_minhash_arrow,
    shingles,
)

DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog"),
    ("d2", "the quick brown fox jumps over the lazy cat"),
    ("d3", "the quick brown fox jumps over the lazy dog"),  # exact dup of d1
    ("d4", "completely different text with no overlap at all here"),
    ("d5", "short one"),
    ("d6", ""),
    ("d7", "the quick brown fox jumps over the lazy dog today"),
    # whitespace-semantics parity: NBSP is NOT a separator (Java ASCII \s),
    # leading tab survives F.trim (spaces only) and yields an empty token,
    # multiple mixed ASCII whitespace collapses
    ("d8", "alpha beta gamma delta epsilon"),
    ("d9", "\tfoo bar baz qux quux"),
    ("d10", "  spaced\t\nout   tokens here   "),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_hash64_batch_deterministic_and_spread():
    strs = [f"shingle {i} text".encode() for i in range(1000)]
    a = _hash64_batch(strs)
    b = _hash64_batch(strs)
    assert np.array_equal(a, b)
    assert len(set(a.tolist())) == 1000  # no collisions on 1k distinct
    assert _hash64_batch([]).shape == (0,)


def test_exact_dup_groups(docs):
    rows = {r.doc_id: r for r in exact_dup_groups(docs).collect()}
    assert rows["d1"].canonical_id == "d1" and rows["d3"].canonical_id == "d1"
    assert rows["d3"].is_duplicate and not rows["d1"].is_duplicate
    assert rows["d1"].group_size == 2
    assert rows["d4"].group_size == 1


def test_arrow_kernel_matches_jvm_shingles(docs):
    jvm = {
        r.doc_id: sorted(r.sh)
        for r in docs.select("doc_id", shingles(F.col("text"), 3).alias("sh")).collect()
    }
    arrow = {
        r.doc_id: sorted(r.ss.sh)
        for r in docs.select(
            "doc_id", shingle_minhash_arrow(F.col("text"), 8, 3).alias("ss")
        ).collect()
    }
    assert jvm == arrow


def test_arrow_signature_deterministic(docs):
    get = lambda: {
        r.doc_id: list(r.ss.sig)
        for r in docs.select(
            "doc_id", shingle_minhash_arrow(F.col("text"), 16, 3).alias("ss")
        ).collect()
    }
    s1, s2 = get(), get()
    assert s1 == s2
    assert all(len(v) == 16 for v in s1.values())
    # identical docs get identical signatures; disjoint docs differ
    assert s1["d1"] == s1["d3"]
    assert s1["d1"] != s1["d4"]


def test_lsh_engines_agree_on_verified_pairs(docs):
    def pairs(engine):
        return {
            (r.id_a, r.id_b)
            for r in lsh_candidate_pairs(
                docs, "text", "doc_id", k=16, bands=8, jaccard_threshold=0.5,
                engine=engine,
            ).collect()
        }

    a, j = pairs("arrow"), pairs("jvm")
    # exact-jaccard verification makes the surviving pair set hash-agnostic
    # whenever LSH recall reaches the true pairs — it does on this corpus
    assert ("d1", "d3") in a
    assert a == j


def test_ngram_jaccard_exact(docs):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", 3, 0.3).collect()
    }
    assert got[("d1", "d3")] == 1.0
    # d1 (7 shingles) vs d7 (8 shingles): 7 common -> 7/8
    assert got[("d1", "d7")] == pytest.approx(7 / 8)
    assert ("d1", "d4") not in got


def test_ngram_jaccard_max_df_cap(spark):
    """Hot-shingle DF cap: with the cap above the corpus max DF the output
    is unchanged; with a tight cap the stopword-shared pseudo-pairs drop
    while true near-dups (sharing rare shingles) survive."""
    hot = "the cat sat on the mat"  # shared 3-gram windows across all docs
    docs = [("n%02d" % i, f"{hot} filler{i} words{i} here{i}") for i in range(10)]
    docs += [
        ("dup1", "alpha beta gamma delta epsilon zeta"),
        ("dup2", "alpha beta gamma delta epsilon eta"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")

    def pairs(**kw):
        return {
            (r.id_a, r.id_b): round(r.jaccard, 6)
            for r in ngram_jaccard_pairs(df, "text", "doc_id", 3, 0.3, **kw).collect()
        }

    uncapped = pairs()
    assert pairs(max_df=len(docs)) == uncapped  # cap above max DF: identical
    capped = pairs(max_df=5)
    assert ("dup1", "dup2") in capped  # rare-shingle pair survives
    # hot-shingle-only pairs never reach the threshold either way, and the
    # capped true-pair jaccard matches (its shingles are all rare)
    assert capped[("dup1", "dup2")] == uncapped[("dup1", "dup2")]
    assert all(a.startswith("dup") for a, b in capped)


def test_ngram_jaccard_auto_cap_binds(spark):
    """The default max_df='auto' cap (max(64, ceil(0.005*n_docs))) actually
    binds on a corpus with a stopword shingle in >64 docs: capped shingles
    leave intersections but stay in set sizes (documented underestimate),
    checked against a pure-Python oracle applying the same semantics."""
    hot = "aa bb cc"  # one hot shingle shared by every doc
    docs = []
    for i in range(80):
        pair = i // 2  # docs 2k/2k+1 are near-dups sharing unique content
        docs.append(
            (
                f"x{i:03d}",
                f"{hot} p{pair} q{pair} r{pair} s{pair} t{i} u{i}",
            )
        )
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 6)
        for r in ngram_jaccard_pairs(df, "text", "doc_id", 3, 0.3).collect()
    }

    # python oracle: same shingling, same auto cap
    import math

    def shingles(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sets = {d: shingles(t) for d, t in docs}
    dfreq: dict[str, int] = {}
    for s in sets.values():
        for g in s:
            dfreq[g] = dfreq.get(g, 0) + 1
    cap = max(64, math.ceil(0.005 * len(sets)))
    assert max(dfreq.values()) > cap  # the cap must actually bind
    kept = {g for g, n in dfreq.items() if n <= cap}
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b] & kept)
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= 0.3:
                want[(a, b)] = round(j, 6)
    assert want and got == want
    # capped jaccard never exceeds the uncapped exact value
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", 3, 0.0001, max_df=None
        ).collect()
    }
    assert all(got[k] <= exact[k] + 1e-12 for k in got)


def test_spread_small_input_partitioning(spark):
    """A low-partition frame spreads to session parallelism; an
    already-wide frame is untouched (no shuffle inserted); row content
    is preserved either way."""
    from tdigest_spark.operators.dedup import spread_small_input

    par = min(spark.sparkContext.defaultParallelism, 32)
    narrow = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], "id long, text string"
    ).coalesce(1)
    spread = spread_small_input(narrow)
    assert spread.rdd.getNumPartitions() == par
    assert sorted(r.id for r in spread.collect()) == list(range(100))

    wide = spark.range(1000).repartition(par + 4)
    assert spread_small_input(wide) is wide


def test_ngram_contamination_counts_and_exclusions(spark):
    """Contamination = >=1 shared word n-gram with the bench set;
    n_shared counts DISTINCT shared shingles; clean and short docs
    behave per the _shingle_sets contract."""
    from tdigest_spark.operators.dedup import ngram_contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "tiny")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # shares two distinct 5-grams with bench 100
            (1, "the quick brown fox jumps over a fence"),
            # no 5-gram overlap
            (2, "completely different words in this training document"),
            # short doc whose whole text equals a short bench doc
            (3, "tiny"),
            # repeated shared shingle counts once (distinct per doc)
            (4, "the quick brown fox jumps x the quick brown fox jumps"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_shared
        for r in ngram_contamination(train, bench, "text", "doc_id", 5).collect()
    }
    assert got == {1: 2, 3: 1, 4: 1}


# ---------------------------------------------------------------------------
# substring-level (token-span) dedup coverage
# ---------------------------------------------------------------------------


def _brute_span_coverage(rows, k):
    """Reference implementation: count every k-span, mark docs' positions
    covered by any span with corpus frequency > 1."""
    from collections import Counter

    freq = Counter()
    for _id, toks in rows:
        for i in range(len(toks) - k + 1):
            freq[tuple(toks[i : i + k])] += 1
    out = {}
    for _id, toks in rows:
        covered = set()
        for i in range(len(toks) - k + 1):
            if freq[tuple(toks[i : i + k])] > 1:
                covered.update(range(i, i + k))
        n = len(toks)
        frac = 0.0 if n == 0 else round(len(covered) / n, 6)
        out[_id] = (n, len(covered), frac)
    return out


def test_duplicate_span_coverage_known(spark):
    from tdigest_spark.operators.dedup import duplicate_span_coverage

    rows = [
        (1, [1, 2, 3, 4, 5, 9, 9, 9, 9, 9]),  # spans at pos 1,2 duplicated
        (2, [7, 1, 2, 3, 4, 5, 8, 8, 8]),
        (3, [1, 2, 3, 4, 6]),  # unique span
        (4, []),  # empty doc: fraction 0.0, no NaN
        (5, [1, 2, 3, 4, 5, 2, 3, 4, 5, 9]),  # adjacent islands merge to 10
    ]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<bigint>")
    got = {
        r["doc_id"]: (r["n_tok"], r["dup_covered"], r["dup_fraction"])
        for r in duplicate_span_coverage(df, "tokens", "doc_id", k=5).collect()
    }
    assert got == _brute_span_coverage(rows, 5)
    assert got[1] == (10, 6, 0.6)
    assert got[4] == (0, 0, 0.0)
    assert got[5] == (10, 10, 1.0)


def test_duplicate_span_coverage_random_matches_bruteforce(spark):
    from tdigest_spark.operators.dedup import duplicate_span_coverage

    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        n = int(rng.integers(0, 30))
        # tiny alphabet so repeated spans actually occur
        rows.append((i, [int(x) for x in rng.integers(0, 4, n)]))
    df = spark.createDataFrame(rows, "doc_id int, tokens array<bigint>")
    for k in (3, 5):
        got = {
            r["doc_id"]: (r["n_tok"], r["dup_covered"], r["dup_fraction"])
            for r in duplicate_span_coverage(df, "tokens", "doc_id", k=k).collect()
        }
        assert got == _brute_span_coverage(rows, k)


def test_ngram_containment_planted_subset(spark):
    """A doc that is a strict PREFIX of another must surface at
    containment exactly 1.0 (every trigram of the prefix is a trigram of
    the full doc), while its symmetric Jaccard is far below threshold —
    the asymmetric-metric motivation. Unrelated docs emit no pair."""
    from tdigest_spark.operators.dedup import ngram_containment_pairs

    full = " ".join(f"w{i}" for i in range(40))
    half = " ".join(f"w{i}" for i in range(12))
    other = " ".join(f"z{i}" for i in range(30))
    df = spark.createDataFrame(
        [("full", full), ("half", half), ("other", other)],
        "doc_id string, text string",
    )
    got = {
        (r.id_a, r.id_b): (r.len_a, r.len_b, r.inter, r.containment)
        for r in ngram_containment_pairs(
            df, "text", "doc_id", shingle_n=3, threshold=0.8
        ).collect()
    }
    assert set(got) == {("full", "half")}
    la, lb, inter, cont = got[("full", "half")]
    assert (la, lb) == (38, 10)  # n_words - 2 trigrams each
    assert inter == 10 and cont == 1.0
    # the symmetric metric would have missed it: 10/38 < 0.3
    assert inter / la < 0.3
