"""Sequence-packing operator tests: fixed-capacity chunk fan-out,
prefix-sum shard assignment, and the map-side repetition features
(max word frequency via sorted-run scan, no shuffle)."""

import math

import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.pack import chunk_fixed, shard_by_cumsum
from tdigest_spark.operators.text import repetition_features, token_count


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_fixed_counts_and_sizes(spark):
    rows = [(0, "w " * 70), (1, "w"), (2, ""), (3, "w " * 32)]
    df = _docs(spark, [(i, t.strip()) for i, t in rows])
    out = chunk_fixed(df, "doc_id", token_count(F.col("text")), 32)
    got = {(r.doc_id, r.chunk_id): r.chunk_tokens for r in out.collect()}
    # 70 tokens -> 32, 32, 6; 1 token -> 1; blank -> nothing; 32 -> one full
    assert got == {
        (0, 0): 32,
        (0, 1): 32,
        (0, 2): 6,
        (1, 0): 1,
        (3, 0): 32,
    }


def test_chunk_fixed_mass_conservation(spark):
    rows = [(i, "tok " * (i * 7 % 50)) for i in range(40)]
    df = _docs(spark, [(i, t.strip()) for i, t in rows])
    out = chunk_fixed(df, "doc_id", token_count(F.col("text")), 8)
    per_doc = {
        r.doc_id: (r.n_chunks, r.total)
        for r in out.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("chunk_tokens").alias("total"),
        )
        .collect()
    }
    for i, t in rows:
        n = len(t.split())
        if n == 0:
            assert i not in per_doc
        else:
            assert per_doc[i] == (math.ceil(n / 8), n)


def test_chunk_fixed_rejects_bad_capacity(spark):
    df = _docs(spark, [(0, "a b")])
    with pytest.raises(ValueError):
        chunk_fixed(df, "doc_id", token_count(F.col("text")), 0)


def test_shard_by_cumsum_matches_prefix_rule(spark):
    # group g: token counts 5, 8, 4, 10 with capacity 10:
    # cum-before = 0, 5, 13, 17 -> shards 0, 0, 1, 1
    rows = [
        (0, "g", 5),
        (1, "g", 8),
        (2, "g", 4),
        (3, "g", 10),
        (4, "h", 25),  # lone big row -> shard 0 (overflow tolerated)
        (5, "h", 1),  # cum-before 25 -> shard 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    out = shard_by_cumsum(df, "source", "doc_id", F.col("n"), 10)
    got = {r.doc_id: r.shard for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 0, 5: 2}


def test_shard_by_cumsum_is_partitioned_not_global(spark):
    # identical doc_ids in different groups shard independently
    rows = [(i, s, 6) for s in ("a", "b") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    out = shard_by_cumsum(df, "source", "doc_id", F.col("n"), 12)
    for s in ("a", "b"):
        got = [
            r.shard
            for r in out.where(F.col("source") == s).orderBy("doc_id").collect()
        ]
        assert got == [0, 0, 1, 1, 2]


def test_repetition_features_exact(spark):
    rows = [
        (0, "a a a b"),  # distinct 2/4, top 3/4
        (1, "x y z"),  # distinct 1.0, top 1/3
        (2, ""),  # blank -> zeros
        (3, "w w w w"),  # degenerate loop: distinct 1/4, top 1.0
    ]
    df = _docs(spark, rows)
    out = {r.doc_id: r for r in repetition_features(df).collect()}
    assert out[0].n_words == 4
    assert out[0].distinct_ratio == pytest.approx(0.5)
    assert out[0].top_word_ratio == pytest.approx(0.75)
    assert out[1].distinct_ratio == pytest.approx(1.0)
    assert out[1].top_word_ratio == pytest.approx(1 / 3)
    assert out[2].n_words == 0
    assert out[2].distinct_ratio == 0.0 and out[2].top_word_ratio == 0.0
    assert out[3].top_word_ratio == pytest.approx(1.0)


def test_chunk_with_overlap_windows(spark):
    from pyspark.sql import functions as F

    from tdigest_spark.operators.pack import chunk_with_overlap

    docs = [
        ("d0", ""),                              # blank: 1 empty chunk
        ("d1", "a b c"),                         # short: 1 chunk
        ("d2", " ".join(f"w{i}" for i in range(10))),   # == chunk size
        ("d3", " ".join(f"w{i}" for i in range(11))),   # 1 over -> 2 chunks
        ("d4", " ".join(f"w{i}" for i in range(25))),   # 1+ceil(15/8)=3 chunks
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = chunk_with_overlap(df, "text", "doc_id", chunk_tokens=10, stride=8)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_tokens, r.chunk_text))
    for v in got.values():
        v.sort()
    assert got["d0"] == [(0, 0, "")]
    assert got["d1"] == [(0, 3, "a b c")]
    assert len(got["d2"]) == 1 and got["d2"][0][1] == 10
    assert [c[1] for c in got["d3"]] == [10, 3]
    assert got["d3"][1][2] == "w8 w9 w10"          # overlap of 2 tokens
    assert [c[1] for c in got["d4"]] == [10, 10, 9]
    # sliding-window invariant: chunk i starts at token i*stride
    toks = docs[4][1].split()
    for i, n, text in got["d4"]:
        assert text.split() == toks[i * 8 : i * 8 + 10]

    import pytest

    with pytest.raises(ValueError, match="positive"):
        chunk_with_overlap(df, stride=0)


def test_chunk_with_overlap_rejects_gap_sampling(spark):
    import pytest

    from tdigest_spark.operators.pack import chunk_with_overlap

    df = spark.createDataFrame([("d", "a b c")], "doc_id string, text string")
    with pytest.raises(ValueError, match="gap-sample"):
        chunk_with_overlap(df, chunk_tokens=2, stride=10)


def test_pack_token_arrays_materializes_in_order(spark):
    from tdigest_spark.operators.pack import pack_token_arrays

    rows = [
        ("a", 1, [1, 2, 3]),
        ("a", 2, [4, 5]),
        ("a", 3, [6, 7, 8, 9]),   # cum before = 5 -> shard 1 (cap 5)
        ("a", 4, [10]),
        ("b", 1, [11]),
        ("b", 2, []),             # empty row packs nothing but counts
    ]
    df = spark.createDataFrame(rows, "source string, doc_id int, tokens array<bigint>")
    got = {
        (r["source"], r["shard"]): (r["n_docs"], r["n_tokens"], r["packed"])
        for r in pack_token_arrays(df, "source", "doc_id", "tokens", 5).collect()
    }
    # shard 0 of 'a': docs 1+2 (cum-before 0 and 3 < 5); doc 3 starts at 5
    assert got[("a", 0)] == (2, 5, [1, 2, 3, 4, 5])
    assert got[("a", 1)] == (2, 5, [6, 7, 8, 9, 10])
    assert got[("b", 0)] == (2, 1, [11])
    # deterministic under repartition (collect_list order is not trusted)
    got2 = {
        (r["source"], r["shard"]): r["packed"]
        for r in pack_token_arrays(
            df.repartition(7), "source", "doc_id", "tokens", 5
        ).collect()
    }
    assert got2 == {k: v[2] for k, v in got.items()}
