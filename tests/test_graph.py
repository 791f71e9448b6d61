"""Connected-components dedup group resolution (operators/graph.py).

Every correctness test runs BOTH execution paths — the driver union-find
fast path (small edge sets, the default) and the distributed min-label
propagation loop (forced with driver_threshold=0) — and they must agree:
same unique min-label fixpoint.
"""

import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.graph import connected_components, dup_groups

BOTH_PATHS = pytest.mark.parametrize(
    "thresh", [2_000_000, 0], ids=["driver-unionfind", "distributed"]
)


@pytest.fixture(scope="module")
def pairs(spark):
    # two components: a 4-chain (forces >1 propagation round: 1-2, 2-3,
    # 3-4) and a triangle-ish pair set; ids deliberately unordered
    rows = [(2, 1), (2, 3), (4, 3), (10, 12), (12, 11)]
    return spark.createDataFrame(rows, "id_a long, id_b long")


@BOTH_PATHS
def test_connected_components_chain(spark, pairs, thresh):
    got = {
        r.node: r.component
        for r in connected_components(pairs, driver_threshold=thresh).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


@BOTH_PATHS
def test_connected_components_deterministic(spark, pairs, thresh):
    a = sorted(
        map(
            tuple,
            connected_components(pairs, driver_threshold=thresh).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            connected_components(
                pairs.orderBy(F.desc("id_b")).repartition(7),
                driver_threshold=thresh,
            ).collect(),
        )
    )
    assert a == b


def test_paths_agree(spark, pairs):
    a = sorted(map(tuple, connected_components(pairs).collect()))
    b = sorted(
        map(tuple, connected_components(pairs, driver_threshold=0).collect())
    )
    assert a == b


def test_dup_groups_sizes(spark, pairs):
    got = {
        r.doc_id: (r.canonical_id, r.group_size)
        for r in dup_groups(pairs).collect()
    }
    assert got[4] == (1, 4)
    assert got[11] == (10, 3)
    assert len(got) == 7


@BOTH_PATHS
def test_connected_components_empty(spark, thresh):
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty, driver_threshold=thresh).count() == 0


def test_connected_components_raises_on_no_convergence(spark):
    # a 5-chain cannot finish in 1 distributed iteration; the driver path
    # must be forced off or it would just resolve it
    rows = [(i, i + 1) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "id_a long, id_b long")
    with pytest.raises(RuntimeError):
        connected_components(df, max_iters=1, driver_threshold=0)
