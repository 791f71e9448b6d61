"""Per-row invariant (BASELINE.json input_hint): token-array equality.

The engine must preserve every row's token array exactly as generated —
through the Spark parquet read, through repartition/salting, and through
the Arrow transfer into Python kernels. Verified against an independent
pyarrow read of the same files.
"""

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tdigest_spark.sources.sequence_table import (
    default_cache_dir,
    generate_sequence_table,
)


def _expected(path):
    tbl = pq.read_table(sorted(path.glob("*.parquet")))
    out = {}
    for did, toks, n_tok in zip(
        tbl["doc_id"].to_pylist(),
        tbl["tokens"].to_pylist(),
        tbl["n_tok"].to_pylist(),
    ):
        out[did] = (toks, n_tok)
    return out


def test_token_arrays_roundtrip_spark(spark):
    path = generate_sequence_table(
        default_cache_dir() / "invariant_n4000",
        n_rows=4_000,
        seed=23,
        rows_per_file=1_000,
    )
    expected = _expected(path)

    df = spark.read.parquet(str(path))
    # through an explicit salted repartition (the skew-handling path)
    salted = df.repartition(16, F.pmod(F.xxhash64("doc_id"), F.lit(16)))
    got = salted.select("doc_id", "tokens", "n_tok").collect()
    assert len(got) == len(expected)
    for r in got:
        toks, n_tok = expected[r["doc_id"]]
        assert r["n_tok"] == n_tok == len(r["tokens"])
        assert list(r["tokens"]) == toks, r["doc_id"]


def test_token_arrays_exact_through_arrow_kernels(spark):
    """The values the kernels see are exactly the multiset of generated
    tokens: a distributed exact histogram (discrete digest) over all token
    values equals the numpy histogram of the raw arrays."""
    from tdigest_spark.operators.aggregate import TDIGEST_DISCRETE, build_sketch

    path = generate_sequence_table(
        default_cache_dir() / "invariant_n4000",
        n_rows=4_000,
        seed=23,
        rows_per_file=1_000,
    )
    d = build_sketch(
        spark.read.parquet(str(path)), "tokens", TDIGEST_DISCRETE()
    )
    tbl = pq.read_table(sorted(path.glob("*.parquet")), columns=["tokens"])
    flat = tbl["tokens"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False
    )
    vals, counts = np.unique(flat, return_counts=True)
    got = dict(d.items())
    assert int(d.n) == flat.shape[0]
    assert len(got) == len(vals)
    for v, c in zip(vals, counts):
        assert got[float(v)] == float(c)
