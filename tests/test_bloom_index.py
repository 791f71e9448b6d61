"""File-level Bloom sidecar index: no false negatives, real pruning on
hash-scattered keys, missing-sidecar fail-safe."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tdigest_spark.plans.bloom_index import (
    build_bloom_index,
    prune_files_by_keys,
)


def _shards(tmp_path, n_files=6, n=600):
    rng = np.random.default_rng(3)
    keys = rng.permutation(np.arange(n)).astype(np.int64)
    files = []
    per = n // n_files
    for s in range(n_files):
        f = tmp_path / f"s{s}.parquet"
        pq.write_table(
            pa.table({"k": pa.array(keys[s * per:(s + 1) * per])}), f
        )
        files.append(f)
    return files, keys, per


def test_no_false_negatives_and_pruning(tmp_path):
    files, keys, per = _shards(tmp_path)
    build_bloom_index(files, "k", fpp=0.01)
    # every key's TRUE file must be kept (no false negatives)
    for probe in (int(keys[0]), int(keys[per]), int(keys[-1])):
        true_file = str(files[np.where(keys == probe)[0][0] // per])
        kept = prune_files_by_keys(files, [probe])
        assert true_file in kept
        assert len(kept) < len(files)  # and real pruning happened


def test_missing_sidecar_is_fail_safe(tmp_path):
    files, _, _ = _shards(tmp_path)
    build_bloom_index(files, "k")
    files[0].with_suffix(".parquet.bloom").unlink()
    kept = prune_files_by_keys(files, [10**9])  # matches nothing
    assert str(files[0]) in kept  # sidecarless file always kept


def test_absent_key_prunes_everything_with_sidecars(tmp_path):
    files, _, _ = _shards(tmp_path)
    build_bloom_index(files, "k", fpp=0.001)
    kept = prune_files_by_keys(files, [10**12])
    assert kept == []  # (deterministic: fixed data, seed-free hashing)
