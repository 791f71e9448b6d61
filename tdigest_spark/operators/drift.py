"""Corpus-drift and cohort analytics for training-data pipelines.

Two monitoring queries every large-corpus ingest runs continuously:

* :func:`word_divergence_by_group` — per-source KL divergence of the word
  distribution against the whole corpus, plus an integer-exact count of
  heavily over-represented ("lifted") words.  This is the standard
  contamination / template-spam alarm: a source whose unigram
  distribution drifts far from the corpus (boilerplate, machine spam,
  wrong language) lights up long before eyeballing samples would.
* :func:`psi_fixed_buckets` — Population Stability Index of a numeric
  column between two deterministic halves (id parity), the per-feature
  numeric-drift alarm that pairs with the text-side KL monitor.
* :func:`cohort_retention` — classic weekly cohort retention over an
  event stream (users grouped by first-seen week; distinct active users
  per (cohort, week-offset) cell).

Both are pure DataFrame plans (whole-stage codegen, no Python on the hot
path) and both have exact DuckDB oracles in ``__spark_entry__``.

Reference tie-in: the reference library summarises one numeric stream
(/root/reference/tdigest.js:1-30); these operators extend the same
"distribution summary" mandate across *groups* of the corpus, where the
summary is the full unigram histogram rather than a digest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tdigest_spark.operators.text import word_tokens


def word_divergence_by_group(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    lift_k: int = 8,
) -> DataFrame:
    """Per-group KL(group ‖ corpus) over lowercase whitespace words.

    Output columns: ``<group_col>``, ``n_words`` (distinct words seen in
    the group), ``kl`` (nats, rounded to 6 dp), ``n_lifted`` (words whose
    in-group relative frequency exceeds ``lift_k``× the corpus relative
    frequency — decided with *integer* cross-multiplication
    ``c_gw * n_total > lift_k * c_w * n_g``, so the cutoff is exact and
    engine-independent).

    Scale shape (the part that must hold at 100 TB):

    * ONE corpus scan: explode words → two-phase hash aggregate on
      ``(group, word)``, materialized once.  Everything downstream is
      derived from that vocab-×-groups table, never from the raw corpus
      again (without the persist the plan re-scans the corpus 4×).
    * per-word corpus totals = re-aggregate of the (group, word) counts
      (vocab-sized, shuffled on ``word`` — the join back is co-keyed);
      per-group totals and the grand total are O(#groups) and broadcast.
    * KL terms are double arithmetic over exactly-representable integer
      counts (products stay < 2^53 up to ~10^8 × 10^7 count scales;
      beyond that switch the lift test to DECIMAL(38,0) — documented,
      not needed at test SFs).

    Float caveat: the per-term products/divisions are IEEE-exact and
    spelled identically in the SQL oracle, so only libm ``ln`` ULP noise
    and summation order differ between engines — absorbed by the 6 dp
    round (same convention as q1's summed aggregates).
    """
    g = F.col(group_col)
    words = df.select(
        g.alias("g"),
        F.explode(word_tokens(F.lower(F.col(text_col)))).alias("word"),
    ).where(F.col("word") != "")
    # materialize the vocab-×-groups counts ONCE: wt/gt/tot below are all
    # derived from gw, and without this Spark re-runs the corpus scan +
    # explode once per derivation (observed: 4 parquet scans in the plan).
    # localCheckpoint (not persist): blocks are freed by the ContextCleaner
    # when the result DataFrame is garbage collected, so repeated
    # invocations in a long-lived shared session cannot accumulate cache
    # entries the way an un-unpersisted persist() does. The table is
    # O(vocab × groups) — tiny next to the corpus. (Caveat at scale:
    # checkpoint blocks are not recomputable on executor loss; a
    # fault-critical pipeline should write the aggregate to a table
    # instead.)
    gw = words.groupBy("g", "word").agg(
        F.count(F.lit(1)).alias("c_gw")
    ).localCheckpoint(eager=False)
    # vocab-sized corpus histogram, derived from gw (no second corpus scan)
    wt = gw.groupBy("word").agg(F.sum("c_gw").alias("c_w"))
    gt = gw.groupBy("g").agg(F.sum("c_gw").alias("n_g"))
    tot = gt.agg(F.sum("n_g").alias("n_total"))

    j = (
        gw.join(wt, "word")
        .join(F.broadcast(gt), "g")
        .crossJoin(F.broadcast(tot))
    )
    c_gw = F.col("c_gw").cast("double")
    c_w = F.col("c_w").cast("double")
    n_g = F.col("n_g").cast("double")
    n_total = F.col("n_total").cast("double")
    # p = c_gw/n_g, q = c_w/n_total; spelled EXACTLY like the oracle so the
    # double ops are bit-identical (ln arg = (c_gw*n_total)/(c_w*n_g)).
    term = (c_gw / n_g) * F.log((c_gw * n_total) / (c_w * n_g))
    lifted = (
        F.col("c_gw") * F.col("n_total")
        > F.lit(int(lift_k)) * F.col("c_w") * F.col("n_g")
    )
    return (
        j.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.sum(term), 6).alias("kl"),
            F.sum(lifted.cast("bigint")).alias("n_lifted"),
        )
        .select(
            F.col("g").alias(group_col), "n_words", "kl", "n_lifted"
        )
        .orderBy(group_col)
    )


def psi_fixed_buckets(
    df: DataFrame,
    value_col: str = "value",
    split_col: str = "event_id",
    bucket_width: float = 10.0,
) -> DataFrame:
    """Population Stability Index between two deterministic halves of a
    numeric column, over fixed-width buckets.

    The split is id-parity (``split_col % 2``) — a deterministic content
    split in the same spirit as ``operators/sample.py`` (an A/B or
    canary-vs-control comparison).  Buckets are
    ``FLOOR(value / bucket_width)`` — double division + floor are
    IEEE-exact and identical across engines, unlike log-bucket edges
    which inherit libm ULP differences (the DDSketch oracle needs a
    boundary-margin guard for exactly that reason; PSI is usually
    quantile- or fixed-width-bucketed anyway, so fixed width is the
    robust choice here).

    Output (one row): ``psi`` (nats, 6 dp, over buckets populated in
    BOTH halves), ``n_buckets_both`` / ``n_only_a`` / ``n_only_b``
    (integer-exact bucket presence counts — the only-one-side buckets
    are exactly the ones a smoothed PSI would inflate, so they are
    reported, not fudged).

    Scale shape: ONE scan → two-phase hash aggregate on the bucket id
    with conditional partial sums for the two halves (no join between
    halves, no second scan); the O(#buckets) result is materialized once so
    the totals derivation does not re-trigger the corpus scan; totals are
    broadcast back.  PSI terms are IEEE-exact integer-count products
    (< 2^53) spelled identically in the SQL oracle; only libm ``ln``
    ULPs and summation order differ — absorbed by the 6 dp round.
    """
    bucket = F.floor(F.col(value_col) / F.lit(float(bucket_width)))
    is_a = (F.col(split_col) % 2 == 0).cast("bigint")
    # localCheckpoint instead of persist: see word_divergence_by_group —
    # GC-managed blocks, no cache accumulation across invocations.
    per_bucket = (
        df.select(bucket.alias("bucket"), is_a.alias("in_a"))
        .groupBy("bucket")
        .agg(
            F.sum("in_a").alias("c_a"),
            F.sum(F.lit(1) - F.col("in_a")).alias("c_b"),
        )
        .localCheckpoint(eager=False)
    )
    tot = per_bucket.agg(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b")
    )
    j = per_bucket.crossJoin(F.broadcast(tot))
    c_a = F.col("c_a").cast("double")
    c_b = F.col("c_b").cast("double")
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    both = (F.col("c_a") > 0) & (F.col("c_b") > 0)
    term = (c_a / n_a - c_b / n_b) * F.log((c_a * n_b) / (c_b * n_a))
    return j.agg(
        F.round(F.sum(F.when(both, term)), 6).alias("psi"),
        F.sum(both.cast("bigint")).alias("n_buckets_both"),
        F.sum(((F.col("c_a") > 0) & (F.col("c_b") == 0)).cast("bigint")).alias(
            "n_only_a"
        ),
        F.sum(((F.col("c_a") == 0) & (F.col("c_b") > 0)).cast("bigint")).alias(
            "n_only_b"
        ),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen ISO week
    (Monday-truncated), counted in every later week they were active.

    Output: ``cohort`` (date), ``week_offset`` (bigint, 0 = cohort week),
    ``n_users`` (bigint, distinct users — exact, not approximate).

    Scale shape: ONE shuffle on ``user_id`` (groupBy user → min week +
    set of active weeks; the per-user set is bounded by the calendar, not
    the data), explode the tiny per-user week set, then a second
    aggregate on ``(cohort, week_offset)`` whose cardinality is
    O(weeks²) — no countDistinct, no self-join, no window over the full
    event stream.  Parquet timestamps arrive as TIMESTAMP_NTZ, so the
    column is cast to timestamp before ``date_trunc``.
    """
    wk = F.to_date(
        F.date_trunc("week", F.col(ts_col).cast("timestamp"))
    ).alias("wk")
    per_user = (
        df.select(F.col(user_col).alias("u"), wk)
        .groupBy("u")
        .agg(
            F.min("wk").alias("cohort"),
            F.collect_set("wk").alias("wks"),
        )
    )
    exploded = per_user.select("cohort", F.explode("wks").alias("wk"))
    week_offset = (F.datediff(F.col("wk"), F.col("cohort")) / 7).cast(
        "bigint"
    )
    return (
        exploded.groupBy("cohort", week_offset.alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort", "week_offset")
    )


def unigram_logprob_by_doc(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the CCNet-style quality/perplexity filter: documents
    whose words are collectively improbable (low mean ln p(w)) are
    out-of-distribution candidates (boilerplate, foreign text, noise).

    Output: ``id_col``, ``group_col``, ``n_words`` (occurrences),
    ``logp`` (mean nats, rounded to 6 dp). Blank documents and empty
    tokens are excluded on both engines identically.

    Scale shape: one corpus scan builds the VOCAB histogram — that small
    aggregate is what gets materialized (localCheckpoint, same lifecycle
    rationale as word_divergence_by_group; checkpointing the exploded
    words themselves would persist O(corpus) — never do that) — then a
    second scan explodes doc words and hash-joins them against the vocab,
    then one per-doc aggregate. No per-doc UDF, no per-expression rescan.

    Float caveat: p(w) = c_w / n_total is a division of exact-integer
    doubles (IEEE-identical cross-engine); ln ULPs and summation order
    are absorbed by ROUND(..., 6) — the doc_source_word_kl convention.
    """
    words = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col).alias("d"),
            F.col(group_col).alias("g"),
            F.explode(word_tokens(F.lower(F.col(text_col)))).alias("word"),
        )
        .where(F.col("word") != "")
    )
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c_w"))
        .localCheckpoint(eager=False)
    )
    tot = vocab.agg(F.sum("c_w").alias("n_total"))
    term = F.log(
        F.col("c_w").cast("double") / F.col("n_total").cast("double")
    )
    return (
        words.join(vocab, "word")
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("d").alias(id_col), F.col("g").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(
                F.sum(term) / F.count(F.lit(1)), 6
            ).alias("logp"),
        )
    )
