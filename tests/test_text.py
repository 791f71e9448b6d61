"""Text-operator unit tests: the JVM-side md5-lower-64 fingerprint must
agree with the Arrow dedup kernel's hash (one hash family across the
engine => every blocking/banding surface shares the same SQL oracle)."""

import numpy as np
from pyspark.sql import functions as F

from tdigest_spark.operators.dedup import _hash64_batch
from tdigest_spark.operators.text import fingerprint


def _spark_fingerprints(spark, texts, ngram):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    rows = df.select("i", fingerprint(F.col("text"), ngram).alias("fp")).collect()
    return [r.fp for r in sorted(rows, key=lambda r: r.i)]


def _expected_fp(text, ngram):
    words = text.split()
    if len(words) >= ngram:
        grams = [" ".join(words[i : i + ngram]) for i in range(len(words) - ngram + 1)]
    else:
        grams = [" ".join(words)]
    hv = _hash64_batch([g.encode() for g in grams])
    return f"{int(np.min(hv)):016x}"


def test_fingerprint_matches_arrow_kernel_hash(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b c d e f g",
        "short text",  # < ngram words -> whole-string hash path
        "unicode héllo wörld çafé test example tokens",
    ]
    got = _spark_fingerprints(spark, texts, 5)
    want = [_expected_fp(t, 5) for t in texts]
    assert got == want


def test_fingerprint_equal_docs_share_fingerprint(spark):
    t = "one two three four five six seven"
    a, b = _spark_fingerprints(spark, [t, t], 5)
    assert a == b and len(a) == 16


def test_redact_pii_and_match_counts(spark):
    from pyspark.sql import functions as F

    from tdigest_spark.operators.text import (
        PII_PATTERNS,
        pii_match_count,
        redact_pii,
    )

    rows = [
        ("a", "mail me at jo.doe+x@sub.example.org or 212-555-0187 ok"),
        ("b", "server 10.0.255.7 and 192.168.1.10 up"),
        ("c", "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    out = df.select(
        "id",
        redact_pii(F.col("text")).alias("red"),
        *[
            pii_match_count(F.col("text"), p).alias(k)
            for k, p in PII_PATTERNS.items()
        ],
    )
    got = {r.id: r for r in out.collect()}
    assert got["a"].email == 1 and got["a"].phone == 1 and got["a"].ipv4 == 0
    assert got["b"].ipv4 == 2 and got["b"].email == 0
    assert got["c"].red == "nothing sensitive here"
    assert got["a"].red == "mail me at <PII> or <PII> ok"
    assert got["b"].red == "server <PII> and <PII> up"
    # the scrub contract: zero residual matches in redacted text
    resid = out.select(
        sum(
            (pii_match_count(F.col("red"), p) for p in PII_PATTERNS.values()),
            F.lit(0),
        ).alias("r")
    ).agg(F.sum("r").alias("t")).collect()[0].t
    assert resid == 0


def test_hash_tokens_matches_duckdb_md5_number_lower(spark):
    """hash_tokens' conv(md5-lower-hex,16,10) % vocab must equal DuckDB's
    md5_number_lower(w) % vocab for the same lowercased words — the bridge
    every token-axis oracle rests on."""
    import duckdb

    from tdigest_spark.operators.text import hash_tokens

    texts = [
        ("The quick Brown fox",),
        ("  spaced\t\nout   ",),
        ("",),
        ("único ünïcode 字符 123",),
    ]
    df = spark.createDataFrame(texts, "text string")
    got = [r[0] for r in df.select(hash_tokens(F.col("text")).alias("t")).collect()]
    con = duckdb.connect()
    for (text,), ids in zip(texts, got):
        want = con.execute(
            """
            SELECT CASE WHEN TRIM(?) = '' THEN CAST([] AS BIGINT[])
                   ELSE list_transform(
                     regexp_split_to_array(TRIM(LOWER(?)), '\\s+'),
                     w -> CAST(md5_number_lower(w) % 50257 AS BIGINT)) END
            """,
            [text, text],
        ).fetchone()[0]
        assert ids == want, text


def test_pmi_round_boundary_margin():
    """doc_pmi_collocations rounds ln(ratio) to 6 dp in two engines whose
    libm may differ by ULPs — exact oracle parity needs every PMI value to
    sit far from a 0.5e-6 rounding boundary at every scale factor the
    oracle gate runs (the ratio itself is IEEE-exact in both engines, so
    only the ln call differs)."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        vals = duckdb.sql(
            f"""
            WITH toks AS (
              SELECT regexp_split_to_array(TRIM(LOWER(text)), '\\s+') AS t
              FROM read_parquet('/root/testdata/{sf}/documents.parquet')
              WHERE TRIM(text) <> ''
            ), uc AS (
              SELECT word, COUNT(*) AS c FROM (
                SELECT UNNEST(t) AS word FROM toks
              ) WHERE word <> '' GROUP BY word
            ), n1t AS (SELECT CAST(SUM(c) AS BIGINT) AS n1 FROM uc),
            bc AS (
              SELECT bg['a'] AS w1, bg['b'] AS w2, COUNT(*) AS c_ab FROM (
                SELECT UNNEST(
                  [struct_pack(a := t[i], b := t[i+1])
                   FOR i IN range(1, len(t))]
                ) AS bg FROM toks
              ) GROUP BY 1, 2
            ), nbt AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS nb FROM bc)
            SELECT LN((CAST(c_ab AS DOUBLE) / nb)
                      / ((CAST(ua.c AS DOUBLE) / n1)
                         * (CAST(ub.c AS DOUBLE) / n1))) AS lnr
            FROM bc JOIN uc ua ON ua.word = bc.w1
            JOIN uc ub ON ub.word = bc.w2, n1t, nbt
            WHERE c_ab >= 5
            """
        ).fetchnumpy()["lnr"]
        scaled = np.abs(vals) * 1e6
        dist = np.abs(scaled - np.floor(scaled) - 0.5)
        # 1e-6 scaled units = 1e-12 absolute — ~1000x a 1-ulp ln
        # disagreement at |lnr| <= 16, the cross-engine risk being guarded
        assert dist.min() > 1e-6, (sf, dist.min())


# ---------------------------------------------------------------------------
# BPE training loop
# ---------------------------------------------------------------------------


def _reference_bpe(word_counts, n_merges):
    """Textbook BPE trainer (Sennrich et al. 2016) over a histogram:
    symbol lists, overlapping pair counts, greedy left-to-right merge."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (lhs, rhs), n = best
        merges.append((rank, lhs, rhs, lhs + rhs, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference_trainer(spark):
    from tdigest_spark.operators.text import bpe_train

    # 'aaaa' exercises overlap counting (pair (a,a) counted 3x per word)
    # and greedy application ((aa)(aa), NOT (aa)(a)(a)); 'abab'/'ab' give
    # a multi-word merge cascade.
    hist = {"aaaa": 5, "abab": 3, "ab": 4, "banana": 2, "bandana": 1}
    vocab = spark.createDataFrame(list(hist.items()), "w string, c long")
    got = [tuple(r) for r in bpe_train(spark, vocab, n_merges=5).collect()]
    assert got == _reference_bpe(hist, 5)


def test_bpe_train_tie_break_lexicographic(spark):
    from tdigest_spark.operators.text import bpe_train

    # (a,b) and (c,d) both have weighted count 2 -> lhs ASC picks (a,b).
    vocab = spark.createDataFrame([("ab", 2), ("cd", 2)], "w string, c long")
    rows = bpe_train(spark, vocab, n_merges=1).collect()
    assert [(r.lhs, r.rhs, r.n_weighted) for r in rows] == [("a", "b", 2)]


def test_bpe_train_stops_when_no_pairs_remain(spark):
    from tdigest_spark.operators.text import bpe_train

    # 'ab' collapses to a single symbol after merge 1; merge 2 impossible.
    vocab = spark.createDataFrame([("ab", 3)], "w string, c long")
    rows = bpe_train(spark, vocab, n_merges=4).collect()
    assert len(rows) == 1 and rows[0].merged == "ab"


def test_bm25_round_boundary_margin():
    """doc_bm25_topk rounds per-doc score sums to 6 dp in both engines;
    exact hash-match needs every pre-round sum to sit far from a rounding
    boundary relative to ln/summation ULP noise (~1e-15 at score ~5).
    Measured min boundary distance ~4e-10 across SFs; guard 1e-12."""
    import duckdb

    q = r"""
    WITH words AS (SELECT doc_id,
           UNNEST(regexp_split_to_array(TRIM(LOWER(text)), '\s+')) AS w
           FROM documents),
    words2 AS (SELECT * FROM words WHERE w <> ''),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM words2 GROUP BY doc_id),
    stats AS (SELECT CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl FROM dl),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words2
           WHERE w IN ('the','data','model') GROUP BY doc_id, w),
    dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    parts AS (SELECT t.doc_id,
        ln((CAST(n.n_docs AS DOUBLE) - d.df + CAST(0.5 AS DOUBLE))
           / (d.df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
        * (t.tf * CAST(2.2 AS DOUBLE))
        / (t.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
           + CAST(0.75 AS DOUBLE) * (l.dl / s.avgdl))) AS part
      FROM tf t JOIN dfreq d USING (w) JOIN dl l USING (doc_id), n, stats s),
    sums AS (SELECT doc_id, SUM(part) AS s FROM parts GROUP BY doc_id)
    SELECT MIN(ABS(s*1e6 - ROUND(s*1e6))) FROM sums
    """
    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con.execute(
            "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet')"
        )
        margin = con.execute(q).fetchone()[0]
        assert margin * 1e-6 > 1e-12, (sf, margin)


def test_zipf_slope_round_boundary_margin():
    """doc_zipf_slope rounds the regression outputs to 6 dp in both
    engines; the pre-round values must sit far from a rounding boundary
    relative to 1000-term ln-sum noise (~1e-12). Measured min margin
    1.76e-8; guard 1e-10."""
    import duckdb

    q = r"""
    WITH words AS (SELECT UNNEST(regexp_split_to_array(TRIM(LOWER(text)),
                                                       '\s+')) AS w
                   FROM documents WHERE TRIM(text) <> ''),
    freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM words
             WHERE w <> '' GROUP BY w),
    top AS (SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
            FROM (SELECT c, w,
                         ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS r
                  FROM freq) WHERE r <= 1000),
    s AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x*y) AS sxy, SUM(x*x) AS sxx FROM top)
    SELECT (n*sxy - sx*sy)/(n*sxx - sx*sx) AS slope,
           (sy - ((n*sxy - sx*sy)/(n*sxx - sx*sx))*sx)/n AS icept FROM s
    """
    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con.execute(
            "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet')"
        )
        sl, ic = con.execute(q).fetchone()
        for v in (sl, ic):
            assert abs(v * 1e6 - round(v * 1e6)) * 1e-6 > 1e-10, (sf, v)


def test_bpe_train_runs_one_job_per_merge(spark):
    """The merge loop's scheduler footprint is bounded: ONE job per merge
    (plus the initial checkpoint materialization) — AQE would double it
    by materializing every shuffle stage as its own job (VERDICT r4
    item 7; measured 13 -> 7 jobs for 6 merges)."""
    from tdigest_spark.operators.text import bpe_train

    vocab = spark.createDataFrame(
        [("hello", 5), ("help", 3), ("world", 4), ("word", 2), ("hold", 1)],
        "w string, c long",
    )
    sc = spark.sparkContext
    sc.setJobGroup("bpe-warm", "warm")
    vocab.count()
    sc.setJobGroup("bpe-jobcount", "bpe-jobcount")
    try:
        res = bpe_train(spark, vocab, 6)
        rows = res.collect()
        n_jobs = len(sc.statusTracker().getJobIdsForGroup("bpe-jobcount"))
    finally:
        sc.setJobGroup(None, None)
    assert len(rows) == 6
    # merges are real (first merge of this vocab: 'l' pairs dominate)
    assert rows[0].merge_rank == 1 and rows[0].n_weighted >= 5
    assert n_jobs <= 6 + 2, f"merge loop ran {n_jobs} jobs for 6 merges"
