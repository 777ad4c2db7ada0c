#!/bin/sh
# Pre-commit guard: the no-Spark registry/manifest consistency checks.
#
# Runs in ~1-2 s (no SparkSession). Run this before ANY commit that
# touches plans/registry.py, a plans/* query module, or bench.py —
# it catches exactly the class of omission that made round 5's suite
# red (a query registered without a bench-manifest entry).
#
# Usage: tools/guard.sh  (from anywhere; extra pytest args pass through)
set -e
cd "$(dirname "$0")/.."
exec python -m pytest -q -m guard tests/ "$@"
