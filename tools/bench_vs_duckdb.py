"""Side-by-side throughput: every oracle-backed registered query timed
in BOTH engines at the same scale factor.

DuckDB is the single-node columnar baseline (the strongest available
stand-in for "the reference's throughput" on declarative queries — the
reference itself has no query engine). For each query: best-of-N wall
time in Spark (collect) and DuckDB (fetch), same parquet inputs.

Usage: python3 tools/bench_vs_duckdb.py [sf_dir] [runs]

Prints one JSON line and, with REPORT=1, writes BENCH_VS_DUCKDB.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from udacity_data_wrangling_osm_case_study_spark.plans import registry
from udacity_data_wrangling_osm_case_study_spark.session import get_spark

from check_oracle import duck_connection  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    queries, oracles = registry.load_all()
    spark = get_spark(app_name="bench-vs-duckdb")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)

    # Warm both engines (JVM JIT / buffer pools).
    queries["table_counts"](spark, sf_dir).collect()
    con.execute("SELECT COUNT(*) FROM lineitem").fetchall()

    rows = []
    for name in queries:
        if name not in oracles:
            continue
        best_s = min(
            _clock(lambda: queries[name](spark, sf_dir).collect())
            for _ in range(runs)
        )
        best_d = min(
            _clock(lambda: con.execute(oracles[name]).fetchall())
            for _ in range(runs)
        )
        rows.append((name, round(best_s, 3), round(best_d, 3)))

    total_s = round(sum(r[1] for r in rows), 3)
    total_d = round(sum(r[2] for r in rows), 3)
    out = {
        "metric": "spark_vs_duckdb_wall_sec",
        "sf_dir": sf_dir,
        "runs": runs,
        "spark_total_sec": total_s,
        "duckdb_total_sec": total_d,
        "queries": {n: {"spark": s, "duckdb": d} for n, s, d in rows},
    }
    print(json.dumps(out))

    if os.environ.get("REPORT"):
        faster = sum(1 for _, s, d in rows if s <= d)
        lines = [
            "# Spark engine vs DuckDB — per-query wall time",
            "",
            f"Same parquet inputs (`{sf_dir}`), best of {runs} runs each, warm "
            "engines. DuckDB runs the registered oracle SQL; Spark runs the "
            "engine's DataFrame plan. DuckDB is a strong single-node columnar "
            "baseline — parity here plus multi-node scale-out is the goal, "
            "not beating it on 100 MB inputs.",
            "",
            f"**Totals: Spark {total_s} s, DuckDB {total_d} s over {len(rows)} "
            f"queries; Spark faster on {faster}.**",
            "",
            "| Query | Spark (s) | DuckDB (s) | Spark/DuckDB |",
            "|---|---|---|---|",
        ]
        for n, s, d in sorted(rows, key=lambda r: r[1] / max(r[2], 1e-9), reverse=True):
            lines.append(f"| {n} | {s} | {d} | {s / max(d, 1e-9):.1f}× |")
        with open("BENCH_VS_DUCKDB.md", "w") as f:
            f.write("\n".join(lines) + "\n")


def _clock(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    main()
