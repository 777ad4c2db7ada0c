"""Shared physical-plan census: one row of scale-deciding plan
features per registered query.

Importable by the audit report (tools/explain_audit.py), the budget
snapshot (``--write-budgets``), and the regression gate
(tests/test_plan_budgets.py) — all three must count the same things
or the gate drifts from the report.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUDGET_PATH = os.path.join(REPO_ROOT, "PLAN_BUDGETS.json")


def _explain(df, mode: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def census_one(spark, name: str, fn, sf_dir: str) -> dict:
    """Plan-feature counts for one registered query.

    Iterative operators (the SCAN_BUDGETS family) are counted AFTER one
    materializing action: their lazy localCheckpoints make the
    pre-execution plan LOOK scan/shuffle-heavy (the uncut k-deep join
    DAG), while the post-checkpoint plan is the true bounded one every
    re-execution uses.
    """
    from udacity_data_wrangling_osm_case_study_spark.plans import registry

    spark.catalog.clearCache()
    df = fn(spark, sf_dir)
    if name in registry.SCAN_BUDGETS:
        df.count()
    p = _explain(df, "formatted")
    return {
        "scans": len(re.findall(r"\(\d+\) Scan parquet", p)),
        "shuffles": p.count("Arguments: hashpartitioning")
        + p.count("Arguments: rangepartitioning"),
        "broadcasts": len(re.findall(r"\(\d+\) BroadcastExchange", p)),
        "pushed": p.count("PushedFilters: [") - p.count("PushedFilters: []"),
        "python": ("EvalPython" in p)
        or ("MapInPandas" in p)
        or ("FlatMapGroupsInPandas" in p)
        or ("FlatMapCoGroupsInPandas" in p)
        or ("MapGroupsWithState" in p)
        or ("InPandasWithState" in p),
        "cartesian": "CartesianProduct" in p,
    }


def load_budgets() -> dict:
    with open(BUDGET_PATH) as f:
        return json.load(f)


def write_budgets(rows: dict, sf_dir: str) -> None:
    payload = {
        "_comment": (
            "Per-query physical-plan budgets (scans / shuffles / "
            "cartesian) captured by tools/explain_audit.py "
            f"--write-budgets at {sf_dir} with shuffle_partitions=8. "
            "tests/test_plan_budgets.py asserts no registered query "
            "EXCEEDS its budget — a silent extra scan or shuffle is a "
            "plan regression. Regenerate (ratchet) only after "
            "reviewing why a plan changed."
        ),
        "sf_dir": sf_dir,
        "budgets": {
            name: {
                "scans": r["scans"],
                "shuffles": r["shuffles"],
                "cartesian": r["cartesian"],
            }
            for name, r in sorted(rows.items())
        },
    }
    with open(BUDGET_PATH, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
