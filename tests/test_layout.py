"""Layout utilities must change the PLAN, not just the files:
partition pruning must reach the scan, and bucketed joins must drop
the shuffle exchange."""

from __future__ import annotations

import contextlib
import io
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.operators import layout
from udacity_data_wrangling_osm_case_study_spark.plans.registry import table
from tests.conftest import SF_DIR


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning_reaches_scan(spark):
    d = tempfile.mkdtemp(prefix="layout_part_")
    try:
        orders = table(spark, SF_DIR, "orders").withColumn(
            "yr", F.year("o_orderdate")
        )
        layout.write_partitioned(orders, d, ["yr"])
        scan = spark.read.parquet(d).filter(F.col("yr") == 1997)
        plan = _explain(scan)
        assert "PartitionFilters" in plan and "yr" in plan.split("PartitionFilters")[1].splitlines()[0]
        # pruned read returns exactly the 1997 orders
        expect = orders.filter(F.col("yr") == 1997).count()
        assert scan.count() == expect
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_avoids_shuffle(spark):
    warehouse = tempfile.mkdtemp(prefix="layout_wh_")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = table(spark, SF_DIR, "orders")
        li = table(spark, SF_DIR, "lineitem")
        layout.write_bucketed(
            orders.select("o_orderkey", "o_totalprice"),
            "orders_b", "o_orderkey", n_buckets=8,
        )
        layout.write_bucketed(
            li.select("l_orderkey", "l_extendedprice"),
            "lineitem_b", "l_orderkey", n_buckets=8,
        )
        a = layout.read_table(spark, "orders_b")
        b = layout.read_table(spark, "lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey)
        plan = _explain(joined)
        # both sides read bucketed → no Exchange feeding the join
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        shutil.rmtree(warehouse, ignore_errors=True)


def test_compact_dataset_reduces_files(spark):
    """A 64-tiny-file dataset must compact to the byte-sized file
    count with identical content."""
    import glob
    import os

    src = tempfile.mkdtemp(prefix="compact_src_")
    dst = tempfile.mkdtemp(prefix="compact_dst_")
    try:
        ev = table(spark, SF_DIR, "events")
        ev.repartition(64).write.mode("overwrite").parquet(src)
        n_src = len(glob.glob(os.path.join(src, "*.parquet")))
        assert n_src == 64
        total = layout.dataset_bytes(spark, src)
        # pick a target that should yield exactly 2 files
        n = layout.compact_dataset(spark, src, dst, target_file_bytes=(total + 1) // 2)
        assert n == 2
        assert len(glob.glob(os.path.join(dst, "*.parquet"))) == 2
        a = sorted(r.event_id for r in spark.read.parquet(src).collect())
        b = sorted(r.event_id for r in spark.read.parquet(dst).collect())
        assert a == b
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)


def test_dynamic_partition_pruning_fires_on_dim_join(spark):
    """Join-driven pruning: filtering a dimension must prune the
    partitioned fact's directories at RUNTIME (Catalyst injects a
    dynamicpruning subquery into the scan's partition filters) — the
    mechanism that keeps a 100 TB date-partitioned fact scan bounded
    by the dimension predicate, not the calendar."""
    d = tempfile.mkdtemp(prefix="layout_dpp_")
    try:
        orders = table(spark, SF_DIR, "orders").withColumn(
            "yr", F.year("o_orderdate")
        )
        layout.write_partitioned(orders, d, ["yr"])
        fact = spark.read.parquet(d)
        dim = spark.createDataFrame(
            [(y, y % 3) for y in range(1992, 2000)], ["yr", "flag"]
        )
        # The dim predicate must be a comparison (a bare boolean column
        # is not "likely selective" to the PartitionPruning rule, which
        # then skips DPP insertion entirely).
        joined = fact.join(dim.filter(F.col("flag") == 0), "yr")
        plan = _explain(joined)
        assert "dynamicpruning" in plan.lower(), plan
        keep_years = [y for y in range(1992, 2000) if y % 3 == 0]
        expect = orders.filter(F.col("yr").isin(keep_years)).count()
        assert joined.count() == expect
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ivf_compact_folds_batches_probe_invariant(spark, tmp_path):
    """build → append → append → COMPACT: batch partitions fold into
    'base', files per cell drop to one, and the probe returns exactly
    the same top-k before and after."""
    import glob

    from udacity_data_wrangling_osm_case_study_spark.operators import similarity

    base = [(i, [float(i % 4), float(1 - i % 4), 0.5], i % 4) for i in range(24)]
    df = spark.createDataFrame(base, ["vec_id", "embedding", "label"])
    index_dir = str(tmp_path / "ivf")
    similarity.build_ivf_index(df, index_dir)
    for b in ("b1", "b2"):
        extra = spark.createDataFrame(
            [(100 + ord(b[-1]) * 10 + i, [1.0, 0.1 * i, 0.5]) for i in range(3)],
            ["vec_id", "embedding"],
        )
        similarity.ivf_append(spark, extra, index_dir, batch_id=b)
    before = similarity.ivf_topk_indexed(
        spark, index_dir, [1.0, 0.0, 0.5], k=8
    ).collect()
    assert len(glob.glob(f"{index_dir}/vectors/cell=*/batch_id=b1")) > 0
    similarity.ivf_compact(spark, index_dir)
    batches = {
        p.rsplit("batch_id=", 1)[-1]
        for p in glob.glob(f"{index_dir}/vectors/cell=*/batch_id=*")
    }
    assert batches == {"base"}
    for cell_dir in glob.glob(f"{index_dir}/vectors/cell=*/batch_id=base"):
        assert len(glob.glob(f"{cell_dir}/*.parquet")) == 1
    after = similarity.ivf_topk_indexed(
        spark, index_dir, [1.0, 0.0, 0.5], k=8
    ).collect()
    assert [(r.id, r.cosine) for r in before] == [(r.id, r.cosine) for r in after]


def test_dedup_index_compact_probe_invariant(spark, tmp_path):
    """LSH dedup index compaction folds streamed batches into 'base'
    without changing probe results."""
    import glob

    from udacity_data_wrangling_osm_case_study_spark.operators import dedup

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely different words appear here today"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    index_dir = str(tmp_path / "dedup_index")
    dedup.build_dedup_index(df, index_dir)
    appended = spark.createDataFrame(
        [(3, "the quick brown fox jumps over the lazy cat")],
        ["doc_id", "text"],
    )
    dedup.dedup_index_append(appended, index_dir, batch_id="b1")
    probe = spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    before = {
        (r.new_id, r.index_id, r.jaccard)
        for r in dedup.incremental_near_dupes(probe, index_dir, min_jaccard=0.5).collect()
    }
    assert (9, 1, 1.0) in before and any(t[1] == 3 for t in before)
    dedup.dedup_index_compact(spark, index_dir)
    for rel in ("bands", "postings", "sizes"):
        batches = {
            p.rsplit("batch_id=", 1)[-1]
            for p in glob.glob(f"{index_dir}/{rel}/batch_id=*")
        }
        assert batches == {"base"}, rel
    after = {
        (r.new_id, r.index_id, r.jaccard)
        for r in dedup.incremental_near_dupes(probe, index_dir, min_jaccard=0.5).collect()
    }
    assert before == after


def test_bucketed_gram_index_probe_is_shuffle_free_on_index_side(spark):
    """build_gram_index's docstring promises the cluster layout: the
    persisted gram census bucketed by g so probe joins are shuffle-free
    on the index side. Assert it two ways: (1) the probe's index-side
    work — the per-gram count sum — plans with ZERO exchanges over the
    bucketed table; (2) the full incremental-coverage probe plans with
    strictly fewer exchanges against the bucketed layout than against a
    path-partitioned parquet index of identical content."""
    import re

    from udacity_data_wrangling_osm_case_study_spark.operators import (
        substrings,
    )

    d = tempfile.mkdtemp(prefix="gram_idx_path_")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = table(spark, SF_DIR, "documents")
        corpus = docs.filter((docs.doc_id % 7) != 0)
        batch = docs.filter((docs.doc_id % 7) == 0)
        spark.sql("DROP TABLE IF EXISTS gram_idx_b_test")
        substrings.build_gram_index_bucketed(
            corpus, "gram_idx_b_test", l=8, n_buckets=8
        )
        substrings.build_gram_index(corpus, d, l=8)

        # (1) index-side aggregation: no exchange over the bucket files
        agg = spark.table("gram_idx_b_test").groupBy("g").agg(
            F.sum("n").alias("ni")
        )
        p = _explain(agg)
        assert "Bucketed: true" in p
        assert "Exchange" not in p

        # (2) full probe: bucketed layout needs strictly fewer shuffles
        pb = _explain(
            substrings.incremental_span_coverage_bucketed(
                batch, "gram_idx_b_test"
            )
        )
        pp = _explain(substrings.incremental_span_coverage(batch, d))
        nb = len(re.findall(r"\bExchange\b", pb))
        np_ = len(re.findall(r"\bExchange\b", pp))
        assert nb < np_, (nb, np_)

        # and the layouts agree on the answer
        a = sorted(
            map(
                tuple,
                substrings.incremental_span_coverage_bucketed(
                    batch, "gram_idx_b_test"
                ).collect(),
            )
        )
        b = sorted(
            map(tuple, substrings.incremental_span_coverage(batch, d).collect())
        )
        assert a == b and a
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS gram_idx_b_test")
        shutil.rmtree(d, ignore_errors=True)
