"""Command-line entry points — the engine's equivalents of running the
reference's three scripts (parse_clean_and_csv.py, the two audits).

    python -m udacity_data_wrangling_osm_case_study_spark etl --osm shatin.osm \
        --psi "PSI_Street Name_062017.xml" --out out/ [--format csv|parquet]
    python -m udacity_data_wrangling_osm_case_study_spark audit-names --osm ... --psi ...
    python -m udacity_data_wrangling_osm_case_study_spark audit-phones --osm ...
    python -m udacity_data_wrangling_osm_case_study_spark explore --osm ... --psi ...
    python -m udacity_data_wrangling_osm_case_study_spark corpus [--sf-dir DIR] [--query name ...]
"""

from __future__ import annotations

import argparse
import sys

from udacity_data_wrangling_osm_case_study_spark.session import get_spark


def _etl(args) -> None:
    from udacity_data_wrangling_osm_case_study_spark.operators import pipeline

    spark = get_spark(app_name="osmspark-etl")
    tables = pipeline.build_tables(
        spark,
        args.osm,
        args.psi,
        include_relations=args.relations,
        stage_dir=args.stage_dir,
        shard_dir=args.shard_dir,
    )
    if args.format == "parquet":
        pipeline.write_parquet(tables, args.out)
    else:
        pipeline.write_csv(tables, args.out)
    for name, df in tables.items():
        print(f"{name}: {df.count()} rows -> {args.out}/{name}")


def _audit_names(args) -> None:
    from udacity_data_wrangling_osm_case_study_spark.plans import audits

    spark = get_spark(app_name="osmspark-audit-names")
    df = audits.audit_bilingual_street_names(spark, args.osm, args.psi)
    df.show(args.limit, truncate=False)


def _audit_phones(args) -> None:
    from udacity_data_wrangling_osm_case_study_spark.plans import audits

    spark = get_spark(app_name="osmspark-audit-phones")
    tags = audits.audit_phone_numbers(spark, args.osm).cache()
    print("Possible phone numbers:")
    tags.show(args.limit, truncate=False)
    print("Counts of keys:")
    audits.phone_key_counts(tags).show(truncate=False)
    print("Characters present in values:")
    audits.phone_char_census(tags).show(args.limit, truncate=False)


def _explore(args) -> None:
    from udacity_data_wrangling_osm_case_study_spark.operators import pipeline
    from udacity_data_wrangling_osm_case_study_spark.plans import osm_exploration

    spark = get_spark(app_name="osmspark-explore")
    tables = pipeline.build_tables(spark, args.osm, args.psi)
    pipeline.register_views(tables)
    for name, sql in osm_exploration.EXPLORATION_SQL.items():
        print(f"\n-- {name}")
        spark.sql(sql).show(20, truncate=False)


def _corpus(args) -> None:
    """Training-data side: run the curation funnel and, optionally, any
    registered query by name against a testdata directory."""
    from udacity_data_wrangling_osm_case_study_spark.plans import registry

    spark = get_spark(app_name="osmspark-corpus")
    queries, _ = registry.load_all()
    names = args.query or ["corpus_curation_funnel", "training_batch_manifest"]
    for name in names:
        if name not in queries:
            print(f"unknown query: {name} (see COVERAGE.md for the registry)")
            continue
        print(f"\n-- {name}")
        queries[name](spark, args.sf_dir).show(args.limit, truncate=False)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="osmspark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("etl", help="full ETL: OSM XML -> 6 tables")
    p.add_argument("--osm", required=True)
    p.add_argument("--psi", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--format", choices=["csv", "parquet"], default="csv")
    p.add_argument(
        "--relations",
        action="store_true",
        help="also emit relations/relations_members/relations_tags "
        "(extension; the reference drops <relation> elements)",
    )
    p.add_argument(
        "--stage-dir",
        default=None,
        help="share the raw parses through parquet staging under this "
        "directory instead of executor-memory caching — the bounded-"
        "memory posture for city-scale-and-up inputs",
    )
    p.add_argument(
        "--shard-dir",
        default=None,
        help="split the input XML into element-aligned shards here "
        "first, so the parse scales with cores",
    )
    p.set_defaults(fn=_etl)

    p = sub.add_parser("audit-names", help="bilingual street-name audit")
    p.add_argument("--osm", required=True)
    p.add_argument("--psi", required=True)
    p.add_argument("--limit", type=int, default=5000)
    p.set_defaults(fn=_audit_names)

    p = sub.add_parser("audit-phones", help="phone-number audit")
    p.add_argument("--osm", required=True)
    p.add_argument("--limit", type=int, default=5000)
    p.set_defaults(fn=_audit_phones)

    p = sub.add_parser("explore", help="run the SQL exploration surface")
    p.add_argument("--osm", required=True)
    p.add_argument("--psi", required=True)
    p.set_defaults(fn=_explore)

    p = sub.add_parser(
        "corpus", help="run training-data queries (default: curation funnel)"
    )
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--query", nargs="*", help="registered query names")
    p.add_argument("--limit", type=int, default=25)
    p.set_defaults(fn=_corpus)

    args = parser.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
