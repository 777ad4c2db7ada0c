"""Physical-plan census over the whole registry → EXPLAIN_AUDIT.md.

For every registered query, count the plan features that decide scale
behavior: parquet scans, shuffle exchanges, broadcast exchanges,
pushed-filter scans, and the anti-patterns (Python eval nodes,
cartesian products). The per-query rows make plan regressions visible
as a diff; the summary line is the registry-wide posture.

With ``--write-budgets`` the (scans, shuffles, cartesian) triple per
query is also snapshotted to PLAN_BUDGETS.json — the committed budget
file tests/test_plan_budgets.py gates against (run it at sf0.001, the
gate's sf, not the audit's default sf0.01: AQE's initial broadcast
decisions depend on size estimates, so counts are only comparable at
the same SF).

Usage: python3 tools/explain_audit.py [sf_dir] [--write-budgets]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from plan_census import census_one, write_budgets  # noqa: E402

from udacity_data_wrangling_osm_case_study_spark.plans import registry  # noqa: E402
from udacity_data_wrangling_osm_case_study_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    queries, _ = registry.load_all()
    spark = get_spark(app_name="explain-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    rows = {}
    for name, fn in queries.items():
        rows[name] = census_one(spark, name, fn, sf_dir)

    n_python = sum(1 for r in rows.values() if r["python"])
    n_cart = sum(1 for r in rows.values() if r["cartesian"])
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EXPLAIN_AUDIT.md")
    with open(out, "w") as f:
        f.write("# Physical-plan census — every registered query\n\n")
        f.write(
            f"Formatted explain at `{sf_dir}` (initial AQE plan — at "
            "runtime AQE may further convert shuffle joins to "
            "broadcasts and coalesce partitions, so shuffle counts are "
            "upper bounds). Iterative operators (the SCAN_BUDGETS "
            "family) are explained AFTER one materializing action, so "
            "their rows show the true bounded post-checkpoint plan "
            "every re-execution uses — the same frame the scan-budget "
            "plan tests gate (tests/test_plans.py). "
            f"**{len(rows)} queries: "
            f"{n_cart} with CartesianProduct (target 0), "
            f"{n_python} with Python/Arrow eval nodes (every one a "
            "deliberate Arrow-batch operator — the multimodal/cogroup/"
            "stateful family; the relational surface is 100% JVM).**\n\n"
        )
        f.write(
            "| Query | scans | shuffles | broadcasts |"
            " scans w/ pushed filters | python/arrow | cartesian |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for name, r in sorted(
            rows.items(), key=lambda kv: (-kv[1]["shuffles"], kv[0])
        ):
            f.write(
                f"| {name} | {r['scans']} | {r['shuffles']} |"
                f" {r['broadcasts']} | {r['pushed']} |"
                f" {'yes' if r['python'] else ''} |"
                f" {'YES' if r['cartesian'] else ''} |\n"
            )
    print(
        f"{len(rows)} queries -> {out}; cartesian={n_cart}"
        f" python={n_python}"
    )
    if "--write-budgets" in sys.argv:
        write_budgets(rows, sf_dir)
        print(f"budgets -> PLAN_BUDGETS.json ({len(rows)} queries)")


if __name__ == "__main__":
    main()
