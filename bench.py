"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from udacity_data_wrangling_osm_case_study_spark.plans import registry
from udacity_data_wrangling_osm_case_study_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "shipping_priority",
    "supplier_nation_volume",
    "revenue_rollup",
    "order_lineitem_balance",
    "region_rollup",
    "top_parts_by_revenue",
    "top_contributors",
    "user_sessions",
    "event_type_tumbling_5min",
    "phone_canonicalization",
    "exact_dedup_prefix_groups",
    "ngram_jaccard_pairs",
    "minhash_lsh_dupes",
    "simhash_clusters",
    "embedding_near_dupes",
    "knn_bruteforce",
    "knn_ivf",
    "doc_profiles",
    "top_words",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    queries, _ = registry.load_all()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/session so per-query numbers measure the queries.
    queries["table_counts"](spark, sf_dir).collect()

    # Best of 2 runs per query: the first run includes plan compilation
    # and JIT, the second is steady-state; reporting the min cuts GC
    # noise without hiding real cost.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            queries[name](spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
