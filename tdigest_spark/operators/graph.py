"""Distributed connected components for dedup group resolution.

Candidate near-dup pairs (MinHash-LSH / SimHash / embedding cosine) are
EDGES; the unit a pipeline actually deletes or canonicalizes is the
connected COMPONENT (A~B, B~C => {A,B,C} is one duplicate group even when
A~C was never emitted). This operator closes that gap: min-label
propagation over the undirected pair graph until fixpoint.

Scale design: each iteration is one shuffle join of (edge, label) plus a
min-aggregate — both keyed on node id, so Spark reuses the hash
partitioning across iterations. The edge set is pairs (already filtered,
orders of magnitude smaller than the corpus), labels are (node, int64/str)
rows. Convergence takes O(component diameter) rounds; near-dup groups are
shallow (dup clusters, not social graphs), so 3-6 rounds is typical.
Each round persists its labels and localCheckpoints lineage so round k
doesn't re-execute rounds 0..k-1 (the classic iterative-algorithm trap).

The reference has no graph surface; this is the standard large-scale
dedup recipe (Kolb et al. Dedoop; GraphFrames' label propagation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dup_groups"]


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 25,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """DataFrame[node, component] for every node appearing in ``pairs``;
    ``component`` is the minimum node id reachable through the pair graph.

    Deterministic: min-label propagation has a unique fixpoint, and every
    aggregate is a min — no ordering sensitivity. Raises if ``max_iters``
    rounds don't converge (pathological chain longer than max_iters).

    ``pairs`` is materialized ONCE before the symmetric union: the two
    union branches otherwise evaluate the (possibly expensive) upstream
    pair pipeline twice, concurrently — a mid-plan cache does not
    serialize sibling consumers (measured 18s -> 3s on the sf0.1 LSH
    pairs). Edge sets at or below ``driver_threshold`` rows then run
    union-find on the driver (O(alpha) per edge, same unique min-label
    fixpoint) — candidate-pair graphs are orders of magnitude smaller
    than the corpus, so this is the common case even at web scale; bigger
    graphs take the distributed label-propagation loop below."""
    from pyspark import StorageLevel

    pairs = pairs.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = pairs.count()
    if n_pairs <= driver_threshold:
        rows = pairs.collect()
        pairs.unpersist(blocking=False)
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for r_ in rows:
            a, b = r_.a, r_.b
            if a is None or b is None:
                continue
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra if rb < ra else rb] = min(ra, rb)  # min id wins
        out = [(n, find(n)) for n in parent]
        spark = pairs.sparkSession
        schema = pairs.schema
        from pyspark.sql.types import StructField, StructType

        return spark.createDataFrame(
            out,
            StructType(
                [
                    StructField("node", schema["a"].dataType),
                    StructField("component", schema["a"].dataType),
                ]
            ),
        )

    edges = (
        pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .union(pairs.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # size the iteration's shuffles to the EDGE count, not the session
    # default: candidate-pair graphs are orders of magnitude smaller than
    # the corpus, and each round otherwise pays default-parallelism task
    # overhead on near-empty partitions (measured 24s -> ~8s at sf0.1 on
    # local[32]); at web scale the count raises p back to full fan-out
    n_edges = edges.count()
    pairs.unpersist(blocking=False)
    p = max(1, min(int(n_edges // 500_000) + 1, 2048))
    edges = edges.repartition(p, "u")
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .repartition(p, "node")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels.count()  # materialize before iterating
    for _ in range(max_iters):
        # candidate label for v = min over neighbors u of label(u);
        # next label = min(current, candidates)
        neighbor = (
            edges.join(labels, edges.u == labels.node)
            .select(F.col("v").alias("node"), "component")
        )
        nxt = (
            labels.select("node", "component")
            .union(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # localCheckpoint truncates lineage; persist feeds the next round
        nxt = nxt.persist(StorageLevel.MEMORY_AND_DISK).localCheckpoint()
        changed = (
            nxt.alias("n")
            .join(labels.alias("p"), "node")
            .where(F.col("n.component") != F.col("p.component"))
            .count()
        )
        labels.unpersist(blocking=False)
        labels = nxt
        if changed == 0:
            edges.unpersist(blocking=False)
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} iterations"
    )


def dup_groups(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Canonical dedup assignment from candidate pairs:
    DataFrame[doc_id, canonical_id, group_size] — one row per document in
    any duplicate group; canonical_id = min id of its component (the
    keep-one-copy policy); group_size = component cardinality."""
    cc = connected_components(pairs, src, dst)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("group_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("canonical_id"),
            "group_size",
        )
    )
