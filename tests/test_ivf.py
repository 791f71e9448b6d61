"""IVF ANN (operators/similarity.py): coarse quantizer + probed search."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.similarity import (
    ivf_assign,
    ivf_centroids,
    ivf_topk,
    topk_cosine,
)


@pytest.fixture(scope="module")
def clustered(spark):
    """Synthetic clustered embeddings: 8 well-separated directions + noise
    (the regime IVF exists for)."""
    rng = np.random.default_rng(17)
    dim, n_clusters, per = 32, 8, 100
    centers = rng.standard_normal((n_clusters, dim)) * 4
    rows = []
    vid = 0
    for c in range(n_clusters):
        pts = centers[c] + rng.standard_normal((per, dim))
        for p in pts:
            rows.append((vid, [float(x) for x in p], c))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()


def test_full_probe_equals_brute_force(clustered):
    q = clustered.where(F.col("vec_id") == 0).first()["embedding"]
    q = [float(x) for x in q]
    C = ivf_centroids(clustered, n_lists=8, sample=800, seed=1)
    exact = [r["vec_id"] for r in topk_cosine(clustered, q, k=10).collect()]
    full = [
        r["vec_id"]
        for r in ivf_topk(clustered, q, C, k=10, n_probe=8).collect()
    ]
    assert full == exact


def test_probed_recall_on_clustered_data(clustered):
    C = ivf_centroids(clustered, n_lists=8, sample=800, seed=1)
    rng = np.random.default_rng(3)
    qids = rng.choice(800, 5, replace=False)
    recalls = []
    for qid in qids:
        q = clustered.where(F.col("vec_id") == int(qid)).first()["embedding"]
        q = [float(x) for x in q]
        exact = {
            r["vec_id"] for r in topk_cosine(clustered, q, k=10).collect()
        }
        got = {
            r["vec_id"]
            for r in ivf_topk(clustered, q, C, k=10, n_probe=2).collect()
        }
        recalls.append(len(exact & got) / 10)
    # 2/8 lists probed on well-separated clusters: high recall expected
    assert np.mean(recalls) >= 0.9, recalls


def test_assignment_covers_all_and_prunes(clustered):
    C = ivf_centroids(clustered, n_lists=8, sample=800, seed=1)
    assigned = ivf_assign(clustered, C)
    assert assigned.count() == 800
    sizes = assigned.groupBy("list_id").count().collect()
    assert len(sizes) == 8
    # separated clusters -> lists roughly match cluster sizes (no empties,
    # no megalist)
    counts = sorted(r["count"] for r in sizes)
    assert counts[0] > 0 and counts[-1] <= 3 * 100
