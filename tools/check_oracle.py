"""Self-check harness mirroring the driver's DuckDB-oracle comparison.

For every registered query: run the Spark callable and the oracle SQL
at the same sf dir, then compare row count, column names, and values
order-insensitively (exact for ints/strings, 1e-9 relative for floats).

Usage: python3 tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from udacity_data_wrangling_osm_case_study_spark.plans import registry
from udacity_data_wrangling_osm_case_study_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(mine: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    if len(mine) != len(oracle):
        problems.append(f"row count {len(mine)} vs {len(oracle)}")
    a, b = normalize(mine), normalize(oracle)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns {list(a.columns)} vs {list(b.columns)}")
        return problems
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        # Driver hashes RENDERED values, so an int column on one side and a
        # float on the other (e.g. DuckDB HUGEINT -> float64) hash-differs
        # even when numerically identical. Flag dtype-kind drift hard.
        kinds = {av.dtype.kind, bv.dtype.kind}
        if "f" in kinds and kinds & {"i", "u"}:
            problems.append(
                f"col {c}: DTYPE-MISMATCH spark={av.dtype}"
                f" oracle={bv.dtype} (driver hash would differ"
                f" — cast the oracle, e.g. HUGEINT -> BIGINT)"
            )
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            both_nan = av.isna() & bv.isna()
            close = np.isclose(av, bv, rtol=1e-9, atol=1e-12) | both_nan
            exact = (av == bv) | both_nan
            if not close.all():
                i = int(np.argmin(close.values))
                problems.append(f"col {c}: value diff at sorted row {i}: {av[i]!r} vs {bv[i]!r}")
            elif not exact.all():
                i = int(np.argmin(exact.values))
                problems.append(
                    f"col {c}: FLOAT-INEXACT (hash would differ) row {i}: {av[i]!r} vs {bv[i]!r}"
                )
        else:
            if not (av.astype(str) == bv.astype(str)).all():
                mism = (av.astype(str) != bv.astype(str))
                i = int(np.argmax(mism.values))
                problems.append(f"col {c}: value diff at sorted row {i}: {av[i]!r} vs {bv[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    queries, oracles = registry.load_all()
    names = sys.argv[2:] or list(queries)
    spark = get_spark(app_name="check-oracle")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            mine = queries[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK*   {name}: rows-only check ({len(mine)} rows, no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ora = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0]}")
            failures += 1
            continue
        problems = compare(mine, ora)
        # Type-strict sweep: any HUGEINT/INT128 oracle output column renders
        # as float driver-side and hash-fails even on identical values.
        try:
            desc = con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
            huge = [r[0] for r in desc if "HUGEINT" in str(r[1]).upper()
                    or "INT128" in str(r[1]).upper()]
            if huge:
                problems.append(
                    f"oracle HUGEINT column(s) {huge} — CAST(... AS BIGINT) required"
                )
        except Exception:
            pass  # DESCRIBE can't wrap every statement shape; value compare stands
        if problems:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            print(f"OK    {name}: {len(mine)} rows match [{time.time()-t0:.1f}s]")
    print(f"\n{len(names) - failures}/{len(names)} queries green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
