"""Text-analysis operators for training-data pipelines (SURVEY spec: lang-ID,
quality scoring, token counting, fingerprinting).

Everything here is built from JVM-side pyspark.sql.functions (whole-stage
codegen, no Python in the hot path); the only exceptions would be model-based
steps, which don't exist here. At 100 TB these are embarrassingly parallel
map-only stages — no shuffle."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_tokens",
    "hash_tokens",
    "token_count",
    "quality_features",
    "repetition_features",
    "langid_heuristic",
    "fingerprint",
    "PII_PATTERNS",
    "pii_match_count",
    "redact_pii",
    "bpe_encode",
    "bpe_pairs",
    "bpe_train",
]

# PII scrub patterns (the pre-training hygiene pass next to dedup and
# decontamination). Kept to RE2-safe constructs (no backrefs/lookaround) so
# the SAME pattern string runs identically under Java regex (Spark) and RE2
# (DuckDB oracle) — and would port to ripgrep/hyperscan scrubbers unchanged.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_match_count(col, pattern: str) -> Column:
    """Number of matches of ``pattern`` in the column (codegen)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def redact_pii(col, patterns: dict[str, str] | None = None, token: str = "<PII>") -> Column:
    """Replace every PII match with ``token`` — a chain of codegen
    regexp_replace calls, map-only at any scale. Pattern application order
    is the dict's insertion order (matters when patterns overlap)."""
    out = col
    for pat in (patterns or PII_PATTERNS).values():
        out = F.regexp_replace(out, pat, token)
    return out

# tiny per-language stopword lists for the n-gram/stopword lang-ID heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "por", "con"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}


def word_tokens(col) -> Column:
    """Whitespace tokenization as array<string> (empty array for blank)."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col) -> Column:
    """Whitespace token count (BPE-ish regex variant: count word pieces)."""
    return F.size(word_tokens(col))


def bpe_ish_count(col) -> Column:
    """Rough subword count: words + digit runs + punctuation marks, the
    cheap length heuristic pipelines use before real tokenization.
    Blank/empty text counts 0 words (same rule as ``word_tokens``; a bare
    split would yield [''] = 1)."""
    words = F.size(word_tokens(col))
    puncts = F.size(F.split(col, r"[^\w\s]")) - F.lit(1)
    return words + puncts


def quality_features(df: DataFrame, col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features, all codegen'd
    column expressions."""
    c = F.col(col)
    words = word_tokens(c)
    n_words = F.size(words)
    n_chars = F.length(c)
    punct_chars = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    stop_hits = F.size(
        F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w)))
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("n_chars_m", n_chars)
        .withColumn(
            "avg_word_len",
            F.when(n_words > 0, (n_chars - (n_words - 1)) / n_words).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, punct_chars / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0)),
        )
    )


def repetition_features(df: DataFrame, col: str = "text") -> DataFrame:
    """Repetition-based quality signals: distinct-word ratio and the
    fraction of the document taken by its single most frequent word
    (the standard filters for looping/boilerplate text). Computed
    entirely map-side — the word array is sorted per row and the max
    run length found with one aggregate() pass, so there is NO
    explode/groupBy shuffle; at 100 TB this stays a map-only stage.
    The arrays are tiny (per-document words), so the interpreted HOF
    cost is negligible. Blank documents get ratio 0 / 0."""
    words = word_tokens(F.col(col))
    n = F.size(words)
    distinct_ratio = F.when(n > 0, F.size(F.array_distinct(words)) / n).otherwise(
        F.lit(0.0)
    )
    # max run length over the sorted array == max word frequency
    state = F.aggregate(
        F.array_sort(words),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top_word_ratio = F.when(n > 0, state["best"] / n).otherwise(F.lit(0.0))
    return (
        df.withColumn("n_words", n.cast("bigint"))
        .withColumn("distinct_ratio", distinct_ratio)
        .withColumn("top_word_ratio", top_word_ratio)
    )


def langid_heuristic(col) -> Column:
    """Stopword-vote language ID: score = fraction of words in each
    language's stopword list; argmax wins ('und' when nothing matches).
    Pure column expressions -> whole-stage codegen."""
    words = word_tokens(col)
    scores = []
    for lang, stops in _STOPWORDS.items():
        stop_arr = F.array(*[F.lit(w) for w in stops])
        hits = F.size(
            F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w)))
        )
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def _md5_lower64_hex(col) -> Column:
    """Lower 8 bytes of md5 as a 16-char little-endian hex string — the
    hex spelling of DuckDB ``md5_number_lower`` (see dedup._hash64_batch),
    so fingerprints have exact SQL oracles. Fixed-width lowercase hex
    compares lexicographically == numerically, so MIN/array_min over these
    strings is the numeric min of the uint64 hashes. Pure codegen'd
    substring/concat — no Python."""
    h = F.md5(col.cast("binary"))
    return F.concat(*[F.substring(h, 31 - 2 * i, 2) for i in range(8)])


def hash_tokens(col, vocab: int = 50257) -> Column:
    """Deterministic hash tokenizer: lowercase whitespace words -> token ids
    in [0, vocab) as array<bigint>, via md5-lower-64 mod vocab (the
    hashing-trick vocabulary every sketch/embedding pipeline starts from
    when no trained tokenizer ships with the corpus). Exactly reproducible
    in SQL: ``list_transform(words, w -> md5_number_lower(w) % vocab)`` —
    Spark's ``conv(hex, 16, 10)`` interprets the 16 hex chars as the same
    unsigned 64-bit value DuckDB's ``md5_number_lower`` returns, and the
    decimal(20,0) mod keeps the full uint64 range exact.

    Scale note: this is a per-word JVM expression chain inside one
    ``transform`` (interpreted HOF, not codegen) — fine as the exact-oracle
    stand-in and for audits; a production tokenizer would run as an Arrow
    ``mapInArrow`` kernel like operators/scan.py's sketch builders."""
    words = word_tokens(F.lower(col))
    return F.transform(
        words,
        lambda w: F.pmod(
            F.conv(_md5_lower64_hex(w), 16, 10).cast("decimal(20,0)"),
            F.lit(vocab),
        ).cast("bigint"),
    )


def fingerprint(col, ngram: int = 5) -> Column:
    """Deterministic document fingerprint: min over md5-lower-64 of word
    ``ngram``-grams (a 1-permutation minhash / rolling-hash analogue),
    entirely JVM-side. Texts shorter than ``ngram`` words hash the whole
    token string. Returns the 16-hex-char hash (little-endian uint64 ==
    DuckDB ``md5_number_lower`` of the same gram)."""
    words = word_tokens(col)
    n = F.size(words)
    grams = F.when(
        n >= ngram,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(ngram - 1)),
            lambda i: _md5_lower64_hex(F.concat_ws(" ", F.slice(words, i, ngram))),
        ),
    ).otherwise(F.array(_md5_lower64_hex(F.concat_ws(" ", words))))
    return F.array_min(grams)


# ---------------------------------------------------------------------------
# BPE tokenizer training (the full loop, not just merge round 1)
# ---------------------------------------------------------------------------
#
# Classic byte-pair-encoding training (Sennrich et al. 2016): collapse the
# corpus to its (word, count) histogram ONCE, then iterate "count adjacent
# symbol pairs -> merge the argmax pair" over vocab-sized state. At 100 TB
# the corpus pass is the only heavy stage; every merge iteration touches
# only the histogram (millions of rows at web scale), so N merges cost N
# vocab-sized Spark jobs plus a one-row collect each — the corpus is never
# re-read. Symbol sequences are encoded as "(s1)(s2)..." strings so that
# merge application is a single codegen `replace(enc, '(a)(b)', '(ab)')`:
# parens cannot occur inside symbols (words are pre-filtered to [a-z]+),
# so the delimiters anchor both symbol boundaries, and because each symbol
# carries its own full "(sym)" wrapper, left-to-right non-overlapping
# string replacement is EXACTLY BPE's greedy merge application (no shared
# separator is consumed between adjacent matches — "(a)(a)(a)(a)" merges
# to "(aa)(aa)", not "(aa)(a)(a)"). DuckDB's replace() has the same
# semantics, which is what makes the training loop exactly SQL-checkable.


def bpe_encode(word_col) -> Column:
    """Wrap every character as its own "(sym)" symbol (codegen regexp)."""
    return F.regexp_replace(word_col, "(.)", r"($1)")


def bpe_pairs(enc_col) -> Column:
    """Adjacent symbol pairs of an encoded word as array<struct<lhs,rhs>>.

    Counts OVERLAPPING occurrences ("(a)(a)(a)" yields (a,a) twice), matching
    how BPE trainers count pairs from the adjacent-symbol list. The symbol
    array is bound ONCE via the single-element-array trick (Spark HOFs are
    interpreted with no CSE across references — CLAUDE.md)."""
    inner = enc_col.substr(F.lit(2), F.length(enc_col) - 2)
    syms = F.split(inner, r"\)\(")
    empty = F.array().cast("array<struct<lhs:string,rhs:string>>")
    return F.flatten(
        F.transform(
            F.array(syms),
            lambda s: F.when(
                F.size(s) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(s) - 1),
                    lambda i: F.struct(
                        F.element_at(s, i).alias("lhs"),
                        F.element_at(s, i + F.lit(1)).alias("rhs"),
                    ),
                ),
            ).otherwise(empty),
        )
    )


def bpe_train(spark, vocab: DataFrame, n_merges: int, word_col: str = "w",
              count_col: str = "c") -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a (word, count) histogram.

    ``vocab`` must contain lowercase [a-z]{2,} words (the paren encoding
    relies on parens never appearing inside symbols). Each iteration runs
    ONE Spark job: the argmax aggregation (pair by weighted count, ties
    broken lexicographically by lhs then rhs) with the previous
    iteration's codegen replace fused into the same scan; the running
    vocab is localCheckpoint(eager=False)'d per iteration so iteration k
    replays one replace, not k, and blocks stay GC-managed in a shared
    session. AQE is disabled for the loop's queries: adaptive execution
    materializes every shuffle stage as its own job, doubling scheduler
    round-trips on a driver-sequential loop of vocab-sized two-stage
    aggregates where runtime re-planning has nothing to adapt (measured
    13 -> 7 jobs for 6 merges; test_text asserts the ceiling). Batching
    k merges per pass was considered and rejected: a merge can CREATE
    pairs (x, lhs+rhs) whose count beats the pre-merge runner-up, so any
    batch is speculative and would need a verify/rollback pass —
    sequential argmax is the semantics the oracle replays. Returns a
    DataFrame (merge_rank, lhs, rhs, merged, n_weighted) ordered by
    merge_rank — deterministic for any input layout (integer counts,
    total-order tie-break)."""
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
    v = vocab.select(
        F.col(count_col).alias("c"), bpe_encode(F.col(word_col)).alias("enc")
    ).localCheckpoint(eager=False)
    out: list[tuple] = []
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        for rank in range(1, n_merges + 1):
            best = (
                v.select("c", F.explode(bpe_pairs(F.col("enc"))).alias("p"))
                .groupBy(
                    F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs")
                )
                .agg(F.sum("c").alias("n_weighted"))
                .orderBy(F.desc("n_weighted"), F.asc("lhs"), F.asc("rhs"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            b = best[0]
            out.append((rank, b.lhs, b.rhs, b.lhs + b.rhs, int(b.n_weighted)))
            pat = f"({b.lhs})({b.rhs})"
            rep = f"({b.lhs}{b.rhs})"
            v = v.select(
                "c",
                F.replace(F.col("enc"), F.lit(pat), F.lit(rep)).alias("enc"),
            ).localCheckpoint(eager=False)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    return spark.createDataFrame(
        out,
        "merge_rank INT, lhs STRING, rhs STRING, merged STRING, "
        "n_weighted BIGINT",
    )
