"""Hive-style partitioned layout (plans/partitioned.py): directory-level
partition pruning visible in the physical plan, and dynamic-partition
overwrite replacing only the partitions present in the incoming frame."""

from pyspark.sql import functions as F

from tdigest_spark.plans.partitioned import (
    overwrite_partitions,
    pruned_scan_info,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def test_partition_pruning_in_plan(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "docs_by_source")
    write_partitioned(docs, path, ["source"])

    src = docs.select("source").orderBy("source").first().source
    pruned = spark.read.parquet(path).where(F.col("source") == src)
    plan = pruned_scan_info(pruned)
    assert "PartitionFilters" in plan and f"= {src})" in plan

    # directory-level pruning: the scan metric counts files actually
    # selected after partition pruning (inputFiles() lists the unpruned
    # index, so it cannot prove this)
    n_sources = docs.select("source").distinct().count()

    def files_read(df):
        # collect() executes THIS df's QueryExecution; count() runs a
        # derived plan and leaves these metrics at zero
        df.collect()
        leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
        scan = leaves.apply(0)
        return int(scan.metrics().apply("numFiles").value())

    n_part_files = sum(
        1
        for f in (tmp_path / "docs_by_source" / f"source={src}").iterdir()
        if f.name.endswith(".parquet")
    )
    assert files_read(pruned) == n_part_files
    assert files_read(pruned) < files_read(spark.read.parquet(path))
    assert n_sources > 1  # the control actually covers multiple partitions

    # values survive the layout round-trip
    exact = docs.where(F.col("source") == src).count()
    assert pruned.count() == exact


def test_dynamic_partition_overwrite_touches_only_incoming(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "n_chars", "source"
    )
    path = str(tmp_path / "docs_dyn")
    write_partitioned(docs, path, ["source"])
    before = {
        r.source: r.n
        for r in spark.read.parquet(path)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # backfill ONE source with halved rows; every other partition intact
    src = docs.select("source").orderBy("source").first().source
    ids = [
        r.doc_id
        for r in docs.where(F.col("source") == src)
        .select("doc_id").orderBy("doc_id").limit(12).collect()
    ]
    web_half = docs.where((F.col("source") == src) & F.col("doc_id").isin(ids))
    n_web_half = web_half.count()
    assert 0 < n_web_half < before[src]
    overwrite_partitions(web_half, path, ["source"])

    after = {
        r.source: r.n
        for r in spark.read.parquet(path)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert after[src] == n_web_half != before[src]
    for other in before:
        if other != src:
            assert after[other] == before[other], other
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic"
    )


def test_compact_partitions(spark, tmp_path):
    from tdigest_spark.plans.partitioned import compact_partitions

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "n_chars", "source"
    )
    path = str(tmp_path / "docs_frag")
    # simulate micro-batch fragmentation: many tiny files per partition
    docs.repartition(8).write.partitionBy("source").parquet(path)
    before = spark.read.parquet(path)
    rows_before = sorted(
        (r.doc_id, r.n_chars, r.source) for r in before.collect()
    )
    src = docs.select("source").orderBy("source").first().source
    files_before = [
        f for f in (tmp_path / "docs_frag" / f"source={src}").iterdir()
        if f.name.endswith(".parquet")
    ]
    assert len(files_before) > 1

    rewritten = compact_partitions(spark, path, target_bytes=1 << 30)
    assert f"source={src}" in rewritten
    nb, na = rewritten[f"source={src}"]
    assert nb == len(files_before) and na == 1

    files_after = [
        f for f in (tmp_path / "docs_frag" / f"source={src}").iterdir()
        if f.name.endswith(".parquet")
    ]
    assert len(files_after) == 1
    # data identical after the rewrite (partition col rides the dir name)
    after = spark.read.parquet(path)
    rows_after = sorted(
        (r.doc_id, r.n_chars, r.source) for r in after.collect()
    )
    assert rows_after == rows_before

    # idempotent: already-compact partitions are not rewritten (no reads)
    assert compact_partitions(spark, path, target_bytes=1 << 30) == {}


def test_write_sorted_enables_row_group_skipping(spark, tmp_path):
    """Sorted layout -> tight disjoint row-group min/max -> a range filter
    prunes row groups from footer stats alone; the same filter on a
    random layout can skip nothing."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from tdigest_spark.plans.partitioned import write_sorted

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    sorted_path = str(tmp_path / "li_sorted")
    random_path = str(tmp_path / "li_random")
    write_sorted(li, sorted_path, ["l_extendedprice"], n_files=8)
    li.repartition(4).write.parquet(random_path)

    def row_groups(path, flt=None):
        ds = pads.dataset(path, format="parquet")
        total = kept = 0
        for frag in ds.get_fragments():
            total += frag.metadata.num_row_groups
            if flt is not None:
                kept += len(list(frag.split_by_row_group(flt)))
        return total, kept

    flt = pads.field("l_extendedprice") < 2000.0
    n_match = li.where(F.col("l_extendedprice") < 2000.0).count()
    assert n_match > 0

    tot_s, kept_s = row_groups(sorted_path, flt)
    tot_r, kept_r = row_groups(random_path, flt)
    assert tot_s > 1 and tot_r > 1
    # random layout: every row group spans the range -> nothing skipped
    assert kept_r == tot_r
    # sorted layout: only the low-value row group(s) survive footer pruning
    assert kept_s < tot_s

    # min/max stats are monotone and disjoint across the sorted output
    # (equal endpoints allowed where a duplicate value straddles a split)
    spans = []
    for f in sorted((tmp_path / "li_sorted").glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        idx = md.schema.to_arrow_schema().get_field_index("l_extendedprice")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append((st.min, st.max))
    assert all(a_max <= b_min for (_, a_max), (b_min, _) in zip(spans, spans[1:]))
    # correctness: pruned read returns the same rows
    pruned_rows = (
        pads.dataset(sorted_path, format="parquet")
        .to_table(filter=flt)
        .num_rows
    )
    assert pruned_rows == n_match


def test_compaction_crash_recovery(spark, tmp_path):
    """The repair pass restores a partition stranded mid-swap and removes
    stale tmp/aside dirs, so a crashed compaction self-heals on re-run."""
    import shutil

    from tdigest_spark.plans.partitioned import compact_partitions

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source"
    )
    path = tmp_path / "docs_crash"
    docs.repartition(4).write.partitionBy("source").parquet(str(path))
    total = spark.read.parquet(str(path)).count()
    src = docs.select("source").orderBy("source").first().source
    d = path / f"source={src}"

    # simulate a crash between the two renames: data dir moved aside
    d.rename(path / f".source={src}__replaced")
    # plus a stale half-written tmp dir from the same crash
    (path / f".source={src}__compacting").mkdir()
    assert spark.read.parquet(str(path)).count() < total  # partition gone

    compact_partitions(spark, str(path), target_bytes=1 << 30)
    assert spark.read.parquet(str(path)).count() == total  # restored
    assert not (path / f".source={src}__compacting").exists()
    assert not (path / f".source={src}__replaced").exists()

    # crash AFTER move-in (aside left behind next to live data): deleted
    shutil.copytree(d, path / f".source={src}__replaced")
    compact_partitions(spark, str(path), target_bytes=1 << 30)
    assert not (path / f".source={src}__replaced").exists()
    assert spark.read.parquet(str(path)).count() == total
