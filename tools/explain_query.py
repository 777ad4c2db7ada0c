"""Print the physical plan of any registered query.

Usage: python3 tools/explain_query.py <query_name> [sf_dir] [--codegen]

Examples:
    python3 tools/explain_query.py pricing_summary
    python3 tools/explain_query.py kmv_distinct_sketch /root/testdata/sf0.01
    python3 tools/explain_query.py phone_canonicalization --codegen

The formatted explain is the tool the plan tests are built on — use it
to check a new query's shape (PushedFilters reach the scan, dimension
joins broadcast, top-k plans as TakeOrderedAndProject, no
CartesianProduct) before registering it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from udacity_data_wrangling_osm_case_study_spark.plans import registry
from udacity_data_wrangling_osm_case_study_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    codegen = "--codegen" in sys.argv
    if not args:
        queries, _ = registry.load_all()
        print(__doc__)
        print("Registered queries:")
        for name in sorted(queries):
            print(f"  {name}")
        return
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"
    queries, _ = registry.load_all()
    if name not in queries:
        sys.exit(f"unknown query {name!r} — run with no args for the list")
    spark = get_spark(app_name="explain")
    spark.sparkContext.setLogLevel("ERROR")
    df = queries[name](spark, sf_dir)
    df.explain("formatted")
    if codegen:
        df.explain("codegen")


if __name__ == "__main__":
    main()
