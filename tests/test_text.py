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
