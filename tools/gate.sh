#!/usr/bin/env bash
# One-command replica of the driver's correctness gate:
#   tools/gate.sh [sfDir] [outDir]
# Runs graft.Verify (parquet dump + oracle_sql.json) then the DuckDB
# comparator. Exits non-zero on any mismatch.
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/verify_out}"
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR" >/dev/null
python3 tools/compare_oracle.py "$OUT_DIR" "$SF_DIR"
