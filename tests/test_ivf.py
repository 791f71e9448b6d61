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


def test_ivf_fixed_codebook_margins_all_sfs():
    """ivf_recall_at_probe's DuckDB oracle replays list assignments from
    inlined centroid literals; exactness needs (a) every vector's top-2
    centroid-dot gap and (b) the query's probe-order gaps far above
    float64 summation-order noise (~1e-12 for 64-term dots). Guards the
    margins at every SF (measured: assign gap 1.7e-6 at sf0.1)."""
    import pyarrow.parquet as pq

    from tdigest_spark.operators.similarity import ivf_fixed_centroids

    C = ivf_fixed_centroids(64, 16, 11)
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        tbl = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet")
        V = np.stack(
            [np.asarray(v, np.float64) for v in tbl["embedding"].to_pylist()]
        )
        D = V @ C.T
        S = np.sort(D, axis=1)
        assert (S[:, -1] - S[:, -2]).min() > 1e-9, sf
        qv = V[tbl["vec_id"].to_numpy() == 0][0]
        dq = np.sort(C @ (qv / np.linalg.norm(qv)))
        assert np.diff(dq).min() > 1e-9, sf


def test_ivf_fixed_assignment_matches_numpy(spark):
    """Spark's ivf_assign (normalized argmax) equals the raw-dot argmax the
    SQL oracle computes — normalization by a positive scalar cannot move
    the argmax, and the margins above keep float rounding out of it."""
    import pyarrow.parquet as pq

    from tdigest_spark.operators.similarity import (
        ivf_assign,
        ivf_fixed_centroids,
    )

    C = ivf_fixed_centroids(64, 16, 11)
    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    got = {
        r["vec_id"]: r["list_id"]
        for r in ivf_assign(df, C).select("vec_id", "list_id").collect()
    }
    tbl = pq.read_table("/root/testdata/sf0.01/embeddings.parquet")
    V = np.stack(
        [np.asarray(v, np.float64) for v in tbl["embedding"].to_pylist()]
    )
    want = np.argmax(V @ C.T, axis=1)
    ids = tbl["vec_id"].to_numpy()
    assert got == {int(i): int(l) for i, l in zip(ids, want)}


def test_pq_margins_all_sfs():
    """pq_adc_topk's oracle replays code assignments and the rounded-ADC
    ranking from inlined codebook literals; exactness needs (a) every
    (vector, subspace) top-2 distance gap and (b) every candidate's ADC
    distance-to-rounding-boundary far above float noise (~1e-15).
    Measured: code gap 1.2e-6, ADC margin 1.1e-10 at sf0.1."""
    import pyarrow.parquet as pq

    from tdigest_spark.operators.similarity import pq_adc_lut, pq_codebooks

    C = pq_codebooks(64, 8, 16, 23)
    m, k, dsub = C.shape
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        tbl = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet")
        V = np.stack(
            [np.asarray(v, np.float64) for v in tbl["embedding"].to_pylist()]
        )
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        codes = np.empty((V.shape[0], m), np.int32)
        for j in range(m):
            sub = V[:, j * dsub : (j + 1) * dsub]
            d2 = -2.0 * (sub @ C[j].T) + (C[j] * C[j]).sum(axis=1)
            s = np.sort(d2, axis=1)
            assert (s[:, 1] - s[:, 0]).min() > 1e-9, (sf, j)
            codes[:, j] = np.argmin(d2, axis=1)
        qv = V[tbl["vec_id"].to_numpy() == 0][0]
        lut = pq_adc_lut([float(x) for x in qv], C)
        adc = lut[np.arange(m)[None, :], codes].sum(axis=1)
        margin = np.abs(adc * 1e6 - np.round(adc * 1e6)).min()
        assert margin * 1e-6 > 1e-12, (sf, margin)


def test_pq_encode_matches_numpy(spark):
    """Spark's pq_encode equals the plain numpy argmin the SQL oracle
    replays (first-min tie-break), and codes round-trip through the
    Arrow array column."""
    import pyarrow.parquet as pq

    from tdigest_spark.operators.similarity import pq_codebooks, pq_encode

    C = pq_codebooks(64, 8, 16, 23)
    m, k, dsub = C.shape
    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(df, C).select("vec_id", "codes").collect()
    }
    tbl = pq.read_table("/root/testdata/sf0.01/embeddings.parquet")
    V = np.stack(
        [np.asarray(v, np.float64) for v in tbl["embedding"].to_pylist()]
    )
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    ids = tbl["vec_id"].to_numpy()
    for j in range(m):
        sub = V[:, j * dsub : (j + 1) * dsub]
        d2 = -2.0 * (sub @ C[j].T) + (C[j] * C[j]).sum(axis=1)
        want = np.argmin(d2, axis=1)
        assert all(got[int(i)][j] == int(w) for i, w in zip(ids, want)), j


# ---------------------------------------------------------------------------
# k-means Lloyd (embedding_kmeans_lloyd in __spark_entry__)
# ---------------------------------------------------------------------------


def _np_kmeans_two_rounds(sf_dir):
    """Independent numpy replay of the quantized two-round Lloyd rules:
    exact-int round-1 distances, drop-empty update, round-2 argmin on
    f_k = (B_k - 2*A_vk*c_k)/c_k^2 with first-min tie-break."""
    import pyarrow.parquet as pq

    import __spark_entry__ as entry

    t = pq.read_table(sf_dir + "/embeddings.parquet", use_threads=False)
    E = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )
    Q = np.floor(E * entry._KM_SCALE).astype(np.int64)
    C0 = entry._km_centroids0()
    d1 = ((Q[:, None, :] - C0[None, :, :]) ** 2).sum(axis=2)
    a1 = d1.argmin(axis=1)  # first-min tie-break
    ks = np.unique(a1)
    S = np.stack([Q[a1 == k].sum(axis=0) for k in ks])
    ck = np.array([(a1 == k).sum() for k in ks], dtype=np.int64)
    B = (S * S).sum(axis=1)
    A = Q @ S.T
    f = (B[None, :] - 2 * A * ck[None, :]).astype(np.float64) / (
        ck * ck
    ).astype(np.float64)[None, :]
    a2 = ks[f.argmin(axis=1)]
    return a1, a2, f, ks


def test_kmeans_lloyd_matches_numpy(spark):
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    a1, a2, _, _ = _np_kmeans_two_rounds(SF_DIR)
    rows = {
        r["cluster_id"]: r
        for r in entry.embedding_kmeans_lloyd(spark, SF_DIR).collect()
    }
    for k in sorted(set(a1) | set(a2)):
        r = rows[int(k)]
        assert r["n_iter1"] == (a1 == k).sum()
        assert r["n_iter2"] == (a2 == k).sum()
        assert r["n_moved_in"] == ((a2 == k) & (a1 != k)).sum()


def test_kmeans_round2_score_margins(spark):
    """The round-2 argmin compares exactly-representable rationals after
    ONE correctly-rounded division — both engines see bit-identical
    doubles, so agreement needs no margin. Still, assert the top-2 score
    gap is orders above double ULP at every SF, so even an engine with a
    differently-rounded division would agree (same defense the IVF/PQ
    oracles carry)."""
    import os

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = os.path.join("/root/testdata", sf)
        if not os.path.isdir(sf_dir):
            continue
        _, _, f, _ = _np_kmeans_two_rounds(sf_dir)
        fs = np.sort(f, axis=1)
        gap = (fs[:, 1] - fs[:, 0]) / np.maximum(np.abs(fs[:, 0]), 1.0)
        assert gap.min() > 1e-9, (sf, gap.min())


def test_matryoshka_and_filtered_rank_margins_all_sfs():
    """embedding_matryoshka_recall and ann_filtered_topk compare cosine
    RANKINGS across engines (numpy pairwise summation vs DuckDB
    sequential): exactness needs the score gaps around every decision
    boundary — the top-10 cut of each truncated ranking, and the
    filtered top-10 / global-rank neighborhoods — far above float64
    summation-order noise (~1e-12 for <=64-term dots)."""
    import pyarrow.parquet as pq

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        tbl = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet")
        V = np.stack(
            [np.asarray(v, np.float64) for v in tbl["embedding"].to_pylist()]
        )
        ids = tbl["vec_id"].to_numpy()
        labels = tbl["label"].to_numpy()
        q = V[ids == 0][0]
        mask = ids != 0
        for d in (16, 32, 64):
            num = V[mask, :d] @ q[:d]
            den = np.linalg.norm(V[mask, :d], axis=1) * np.linalg.norm(q[:d])
            cos = np.sort(num / np.maximum(den, 1e-30))[::-1]
            # adjacent-score gaps through rank 12: ties would make the
            # cross-engine rank compare depend on rounding
            assert np.abs(np.diff(cos[:12])).min() > 1e-9, (sf, d)
        full = V[mask] @ q / (
            np.linalg.norm(V[mask], axis=1) * np.linalg.norm(q)
        )
        lab3 = np.sort(full[labels[mask] == 3])[::-1]
        assert np.abs(np.diff(lab3[:12])).min() > 1e-9, sf
        # global ranks of the filtered hits: every adjacent gap in the
        # whole corpus ordering (any could sit at a hit's boundary)
        assert np.abs(np.diff(np.sort(full))).min() > 1e-10, sf
