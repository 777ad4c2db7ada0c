"""Sequence packing and per-key capping invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_wrangling_osm_case_study_spark.operators import packing, sampling


def _docs(spark, counts):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(counts)], "doc_id long, n_tokens long"
    )


def test_offsets_match_sequential_prefix_sum(spark):
    counts = [5, 0, 12, 3, 7, 1, 0, 9, 2, 4] * 30
    offs = (
        packing.global_token_offsets(_docs(spark, counts), num_range_partitions=7)
        .orderBy("doc_id")
        .collect()
    )
    expect, acc = [], 0
    for n in counts:
        expect.append(acc)
        acc += n
    assert [r.start for r in offs] == expect


def test_pack_covers_every_token_exactly_once(spark):
    counts = [17, 3, 250, 1, 64, 129, 5, 40, 700, 2]
    seq_len = 128
    placed = packing.pack_sequences(_docs(spark, counts), seq_len).collect()
    total = sum(counts)
    # Per-doc contributions reassemble the doc.
    by_doc = {}
    for r in placed:
        by_doc.setdefault(r.doc_id, 0)
        by_doc[r.doc_id] += r.n_tokens
    assert by_doc == {i: n for i, n in enumerate(counts) if n > 0}
    # Per-sequence contributions tile [0, seq_len) with no overlap;
    # every sequence but the last is exactly full.
    by_seq = {}
    for r in placed:
        by_seq.setdefault(r.seq_id, []).append((r.seq_offset, r.n_tokens))
    n_seqs = -(-total // seq_len)
    assert set(by_seq) == set(range(n_seqs))
    for seq_id, spans in by_seq.items():
        spans.sort()
        pos = 0
        for off, n in spans:
            assert off == pos and n > 0
            pos += n
        assert pos == (seq_len if seq_id < n_seqs - 1 else total - seq_len * (n_seqs - 1))


def test_pack_is_partitioning_invariant(spark):
    counts = [9, 30, 2, 55, 11, 6, 120, 1]
    df = _docs(spark, counts)
    a = packing.pack_sequences(df, 64).orderBy("seq_id", "doc_id").collect()
    b = (
        packing.pack_sequences(df.repartition(13), 64)
        .orderBy("seq_id", "doc_id")
        .collect()
    )
    assert a == b


def test_weighted_key_quota(spark):
    # 400 docs in src0, 100 in src1, 4 in src2: sqrt weights 20/10/2,
    # target 64 -> quotas 64*20//32=40, 64*10//32=20, 64*2//32=4.
    rows = (
        [(i, "src0") for i in range(400)]
        + [(1000 + i, "src1") for i in range(100)]
        + [(2000 + i, "src2") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = sampling.weighted_key_quota(df, "source", "doc_id", total_target=64)
    sizes = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # src2's quota covers its whole population (no replacement).
    assert sizes == {"src0": 40, "src1": 20, "src2": 4}
    # Head/tail rebalance: src0 has 4x src1's docs but only 2x quota.
    ids = lambda d: sorted(r.doc_id for r in d.collect())
    assert ids(kept) == ids(
        sampling.weighted_key_quota(df.repartition(11), "source", "doc_id", 64)
    )


def test_zorder_key_interleaves_bits(spark):
    from udacity_data_wrangling_osm_case_study_spark.operators import layout

    def morton(x, y, bits=16):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b + 1)
            z |= ((y >> b) & 1) << (2 * b)
        return z

    rows = [(0b101, 0b011), (0, 0), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", layout.zorder_key(["x", "y"]).alias("z")).collect()
    for r in got:
        assert r.z == morton(r.x, r.y), (r.x, r.y)


def test_zordered_write_tightens_file_envelopes(spark, tmp_path):
    """Z-ordered files must have far smaller per-file (x, y) stat
    envelopes than an insertion-ordered write — that envelope IS the
    row-group-skipping guarantee for filters on either column."""
    import pyarrow.parquet as pq
    import os

    from udacity_data_wrangling_osm_case_study_spark.operators import layout

    # A grid walked in row-major order: insertion order is the worst
    # case for y locality.
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    df.repartition(8).write.mode("overwrite").parquet(plain)
    layout.write_zordered(df, zed, ["x", "y"], bits=6, n_files=8)

    def area(path):
        total = 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            cols = {
                md.row_group(0).column(i).path_in_schema: i
                for i in range(md.row_group(0).num_columns)
            }
            for rg in range(md.num_row_groups):
                sx = md.row_group(rg).column(cols["x"]).statistics
                sy = md.row_group(rg).column(cols["y"]).statistics
                total += (sx.max - sx.min + 1) * (sy.max - sy.min + 1)
        return total

    assert area(zed) * 4 < area(plain)


def test_per_key_cap(spark):
    rows = [(i, f"src{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = sampling.per_key_cap(df, "source", "doc_id", cap=10)
    sizes = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"src0": 10, "src1": 10, "src2": 10}
    # Deterministic: same draw after repartitioning; different salt
    # draws a different subset.
    ids = lambda d: sorted(r.doc_id for r in d.collect())
    assert ids(kept) == ids(sampling.per_key_cap(df.repartition(17), "source", "doc_id", cap=10))
    assert ids(kept) != ids(sampling.per_key_cap(df, "source", "doc_id", cap=10, salt="other"))
    # A key under the cap keeps everything.
    assert sampling.per_key_cap(df, "source", "doc_id", cap=50).count() == 100


def test_pack_sequences_order_col(spark):
    """Packing by a separate order column must lay the stream in that
    order while reporting the id: repacking with a reversing order key
    reverses placement, and per-doc token sums are unchanged."""
    from pyspark.sql import functions as F

    rows = [(i, 10 + i) for i in range(1, 6)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"]).withColumn(
        "rev", 100 - F.col("doc_id")
    )
    fwd = packing.pack_sequences(df, seq_len=16, id_col="doc_id")
    rev = packing.pack_sequences(
        df, seq_len=16, id_col="doc_id", order_col="rev"
    )
    fwd_first = [r.doc_id for r in fwd.filter("seq_id = 0").orderBy("seq_offset").collect()]
    rev_first = [r.doc_id for r in rev.filter("seq_id = 0").orderBy("seq_offset").collect()]
    assert fwd_first[0] == 1 and rev_first[0] == 5
    per_doc = {r.doc_id: r.total for r in rev.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("total")).collect()}
    assert per_doc == {i: 10 + i for i in range(1, 6)}
