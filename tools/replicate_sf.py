"""Tile a driver testdata sf dir N-fold with key remapping — the
parquet twin of tools/replicate_osm.py.

Motivation (VERDICT r7, next-round item 1): correctness runs at sf0.01
and bench at sf0.1; the one class of bug that ever reached a driver
gate was "correct at sf0.01, dead at 10x" (the round-6 gini int64
overflow), caught only by accident of the bench scale. This tool
manufactures the next decade of scale so the sweep in
tools/scale_sweep.py can exercise it deliberately.

Key discipline: every copy k shifts each key domain by k * stride
(strides are fixed per domain, far above the sf0.1 maxima), so
referential integrity holds within each copy and no keys collide
across copies. Shared dimensions (region, nation) are NOT replicated —
they are the same 5/25 rows a 100 TB deployment would broadcast.
Non-key attributes (names, text, timestamps, vectors) are tiled
verbatim: cross-copy duplicate text/vectors are exactly the adversarial
input the dedup/ANN families must survive at scale.

Usage:
    python3 tools/replicate_sf.py [src_sf_dir] [out_dir] [n_copies] [mode]
    # defaults: /root/testdata/sf0.1 /tmp/spark_graft_sf1x10 10
    # mode "perturb": token-suffix document text per copy (linear-work
    # dedup ladder instead of the adversarial verbatim-clone one)
    # mode "perturb-graph-ann" (round-9, VERDICT item 5): additionally
    # jitters embedding vectors per copy (deterministic per
    # (vec_id, dim, copy) — clone cliques would distort ANN recall
    # structure: every vector would have n-1 exact twins) and rewires
    # ~1/7 of each copy's lineitem part keys within the copy's part
    # range (so the co-purchase graph per copy is a genuine variant,
    # not n disjoint clones of one graph). FK validity holds: rewired
    # keys stay inside the same copy's part key set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

# Per-domain key strides. Each is >= 10x the sf0.1 maximum of its
# domain, so they stay valid through a 100x tiling of sf0.1.
STRIDES = {
    "custkey": 10_000_000,
    "orderkey": 100_000_000,
    "partkey": 10_000_000,
    "suppkey": 1_000_000,
    "event_id": 100_000_000,
    "user_id": 1_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,
}

# table -> {column: key domain}; unlisted tables tile verbatim,
# unlisted columns pass through.
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

SHARED_DIMS = ("region", "nation")

TABLES = tuple(KEYED) + SHARED_DIMS


def _tile(
    df: DataFrame,
    keymap: dict[str, str],
    n: int,
    perturb_text: bool = False,
    perturb_vecs: bool = False,
    rewire_partkey_mod: int | None = None,
) -> DataFrame:
    """Union n key-shifted copies of df (copy 0 keeps original keys, so
    literal-key predicates in existing queries still match).

    ``perturb_text`` rewrites the ``text`` column per copy k>0 by
    suffixing every token with ``_k``: verbatim tiling makes every
    document a clone of its 9 twins — adversarial for pair-forming
    dedup (cluster sizes scale with the copy count, pairs
    quadratically), which is the right COMPLETION stress but the wrong
    THROUGHPUT ladder. Token-suffixed copies share no shingles/grams
    across copies while keeping each copy's internal dup structure and
    token-frequency shape, so the dedup/text family scales linearly in
    work — like real corpus growth."""
    copies = []
    for k in range(n):
        cols = []
        for c in df.columns:
            if c == "l_partkey" and rewire_partkey_mod and k > 0:
                # Rewire ~1/7 of copy k's co-purchase edges: rows
                # selected by a deterministic key condition get their
                # part rotated WITHIN the copy's own part key range
                # (base stride + rotated original key < mod).
                base = F.lit(k * STRIDES["partkey"])
                rotated = (F.col(c) + F.lit(997 * k)) % F.lit(
                    rewire_partkey_mod
                )
                rewire = (
                    (F.col("l_orderkey") + F.col("l_linenumber")) % 7 == k % 7
                )
                cols.append(
                    F.when(rewire, base + rotated)
                    .otherwise(F.col(c) + base)
                    .alias(c)
                )
            elif c in keymap:
                cols.append(
                    (F.col(c) + F.lit(k * STRIDES[keymap[c]])).alias(c)
                )
            elif c == "embedding" and perturb_vecs and k > 0:
                # Deterministic per-(vec_id, dim, copy) jitter in
                # [-0.03, +0.03]: breaks exact-twin cliques while
                # keeping the cell/label geometry roughly intact.
                cols.append(
                    F.transform(
                        F.col(c),
                        lambda x, i: (
                            x.cast("double")
                            + (
                                (F.col("vec_id") * 31 + i * 17 + F.lit(k * 13))
                                % 7
                                - 3
                            )
                            * 0.01
                        ).cast("float"),
                    ).alias(c)
                )
            elif c == "text" and perturb_text and k > 0:
                cols.append(
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda t: F.concat(t, F.lit(f"_{k}")),
                        ),
                        " ",
                    ).alias("text")
                )
            else:
                cols.append(F.col(c))
        copies.append(df.select(*cols))
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    return out


def replicate(
    spark,
    src: str,
    out: str,
    n: int,
    perturb_docs: bool = False,
    perturb_graph_ann: bool = False,
) -> None:
    os.makedirs(out, exist_ok=True)
    part_mod = None
    if perturb_graph_ann:
        part_mod = (
            spark.read.parquet(os.path.join(src, "part.parquet"))
            .agg(F.max("p_partkey"))
            .collect()[0][0]
            + 1
        )
    for t in TABLES:
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        if t in KEYED and n > 1:
            df = _tile(
                df, KEYED[t], n,
                perturb_text=(
                    (perturb_docs or perturb_graph_ann) and t == "documents"
                ),
                perturb_vecs=(perturb_graph_ann and t == "embeddings"),
                rewire_partkey_mod=(
                    part_mod if perturb_graph_ann and t == "lineitem" else None
                ),
            )
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
        print(f"{t}: written")


def main() -> None:
    from udacity_data_wrangling_osm_case_study_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1x10"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    mode = sys.argv[4] if len(sys.argv) > 4 else ""
    spark = get_spark(app_name="replicate_sf")
    spark.sparkContext.setLogLevel("ERROR")
    replicate(
        spark, src, out, n,
        perturb_docs=(mode == "perturb"),
        perturb_graph_ann=(mode == "perturb-graph-ann"),
    )
    print(f"tiled {src} x{n} -> {out} (mode={mode or 'verbatim'})")


if __name__ == "__main__":
    main()
