"""Optimization-round profiler: per-query isolated timing + plan capture.

For each named query (or the top-N from BENCH_QUERIES.json): run it
against the noop sink (guide §1.4 — times the computation, not result
collection), best-of-R with catalog-cache clearing between runs, and
optionally dump `.explain("formatted")` to plans/<tag>/<name>.txt.

Usage:
    python3 tools/profile_queries.py [--sf DIR] [--runs N] [--plans TAG]
                                     [--top N | query ...]

Prints one JSON line per query: {"name", "runs", "best", "plan_file"}.
This is a measurement tool only — bench.py remains the contract bench.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from udacity_data_wrangling_osm_case_study_spark.plans import registry
from udacity_data_wrangling_osm_case_study_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]

    def opt(flag: str, default: str | None = None) -> str | None:
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    sf_dir = opt("--sf", os.environ.get("SPARK_GRAFT_SF_DIR",
                                        "/root/testdata/sf0.1"))
    runs = int(opt("--runs", "3"))
    plans_tag = opt("--plans")
    top = opt("--top")

    queries, _ = registry.load_all()
    if top is not None:
        snap = json.load(
            open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_QUERIES.json"))
        )["queries"]
        names = [n for n, _ in sorted(snap.items(), key=lambda kv: -kv[1])][
            : int(top)
        ]
    else:
        names = args
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="profile")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-up outside any measurement (bench.py convention).
    queries["table_counts"](spark, sf_dir).collect()

    plan_dir = None
    if plans_tag:
        plan_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", plans_tag,
        )
        os.makedirs(plan_dir, exist_ok=True)

    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile: {name}")
        times = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        plan_file = None
        if plan_dir:
            spark.catalog.clearCache()
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan_file = os.path.join(plan_dir, f"{name}.txt")
            with open(plan_file, "w") as f:
                f.write(buf.getvalue())
        spark.catalog.clearCache()
        rec = {"name": name, "runs": times, "best": min(times),
               "plan_file": plan_file}
        results[name] = rec
        print(json.dumps(rec), flush=True)
    print(json.dumps(
        {"total_best": round(sum(r["best"] for r in results.values()), 3),
         "n": len(results), "sf_dir": sf_dir}
    ))


if __name__ == "__main__":
    main()
