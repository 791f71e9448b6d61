"""Deterministic hash sampling: layout independence, JVM/Python hash
agreement, stratified thresholds."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.dedup import _hash64_batch
from tdigest_spark.operators.sample import (
    hash_sample,
    md5_lower64,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.createDataFrame(
        [(i, ["web", "books", "code"][i % 3]) for i in range(3000)],
        "id long, src string",
    )


def test_md5_lower64_matches_python_kernel(spark):
    """The JVM expression and the Arrow kernel's per-string hash are the
    same function — the contract every exact oracle rests on."""
    strs = ["", "a", "hello world", "42", "-7", "élève"]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = {
        r["s"]: int(r["h"])
        for r in df.select("s", md5_lower64(F.col("s")).alias("h")).collect()
    }
    want = _hash64_batch([s.encode() for s in strs])
    assert [got[s] for s in strs] == [int(h) for h in want]


def test_partition_layout_independence(keyed):
    a = sorted(r["id"] for r in hash_sample(keyed, "id", 0.2).collect())
    b = sorted(
        r["id"]
        for r in hash_sample(keyed.repartition(17, "src"), "id", 0.2).collect()
    )
    c = sorted(r["id"] for r in hash_sample(keyed.coalesce(1), "id", 0.2).collect())
    assert a == b == c and 0.15 < len(a) / 3000 < 0.25


def test_cross_table_membership_agreement(spark, keyed):
    """The same key samples identically in any table — what makes joins
    between sampled tables line up."""
    other = spark.createDataFrame([(i, i * i) for i in range(3000)], "id long, v long")
    s1 = {r["id"] for r in hash_sample(keyed, "id", 0.3).collect()}
    s2 = {r["id"] for r in hash_sample(other, "id", 0.3).collect()}
    assert s1 == s2


def test_seed_draws_independent_samples(keyed):
    s0 = {r["id"] for r in hash_sample(keyed, "id", 0.3, seed=0).collect()}
    s1 = {r["id"] for r in hash_sample(keyed, "id", 0.3, seed=1).collect()}
    assert s0 != s1
    # independent draws overlap at ~f^2, not ~f
    assert len(s0 & s1) / 3000 < 0.2


def test_fraction_edges(keyed):
    assert hash_sample(keyed, "id", 0.0).count() == 0
    assert hash_sample(keyed, "id", 1.0).count() == 3000
    with pytest.raises(ValueError):
        hash_sample(keyed, "id", 1.5)


def test_stratified_fractions_and_default(keyed):
    out = stratified_hash_sample(
        keyed, "id", "src", {"web": 0.5, "books": 0.1}
    ).toPandas()
    by = out.groupby("src")["id"].count()
    assert "code" not in by.index  # default_fraction=0 drops unlisted strata
    assert 0.4 < by["web"] / 1000 < 0.6
    assert 0.03 < by["books"] / 1000 < 0.2
    # per-row decisions equal the uniform sampler's at the same fraction:
    # one hash family, thresholds only
    uni = {r["id"] for r in hash_sample(keyed.where(F.col("src") == "web"), "id", 0.5).collect()}
    assert set(out[out["src"] == "web"]["id"]) == uni


def test_stratified_schema_unchanged(keyed):
    out = stratified_hash_sample(keyed, "id", "src", {"web": 0.5})
    assert out.columns == ["src", "id"] or set(out.columns) == {"id", "src"}


def test_leakage_safe_split_keeps_duplicates_together(spark):
    """Every copy of a duplicated text shares its group's split; coverage
    is total; and with many duplicate groups a PER-ROW hash split would
    have leaked at least one pair (sanity that the invariant is doing
    work, not vacuous)."""
    from tdigest_spark.operators.sample import leakage_safe_split, md5_lower64
    from pyspark.sql import functions as F

    rows = []
    for g in range(60):
        for copy in range(3):  # 3 copies of each text, ids interleaved
            rows.append((g + 60 * copy, f"duplicated text number {g}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = leakage_safe_split(df, "text", "doc_id", seed=1)
    got = a.collect()
    assert len(got) == len(rows)  # total coverage
    by_group = {}
    for r in got:
        by_group.setdefault(r["rep"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())  # no leakage
    assert {r["split"] for r in got} >= {"train"}  # 8/10 shards are train
    # the naive per-row rule WOULD leak: at least one group's rows hash
    # to different shards when sharded by their own doc_id
    naive = df.select(
        "doc_id",
        "text",
        F.pmod(
            md5_lower64(F.concat(F.lit("1:"), F.col("doc_id").cast("string"))),
            F.lit(10),
        ).alias("shard"),
    ).collect()
    shards_by_text = {}
    for r in naive:
        shards_by_text.setdefault(r["text"], set()).add(int(r["shard"]))
    assert any(len(s) > 1 for s in shards_by_text.values())
