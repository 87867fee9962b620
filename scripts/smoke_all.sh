#!/usr/bin/env bash
# One-shot validation of everything the judge/driver checks:
#   tests → oracle harness (both sfs) → entry smoke → words suite → bench
# Run from the repo root. Exits non-zero on the first failure.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -x -q

echo "== oracle harness sf0.01 =="
python scripts/check_correctness.py /root/testdata/sf0.01

echo "== oracle harness sf0.1 =="
python scripts/check_correctness.py /root/testdata/sf0.1

echo "== entry smoke (driver-style) =="
python - <<'EOF'
import ray, sys
ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, ".")
import __ray_entry__ as e
n = e.entry().count()
assert n > 0, "entry produced no rows"
print(f"entry: {n} rows")
ray.shutdown()
EOF

echo "== reference words suite =="
python -m dabloomray words-test

echo "== bench (single line) =="
RAY_GRAFT_CPUS=${RAY_GRAFT_CPUS:-8} python bench.py

echo "ALL SMOKE CHECKS PASSED"
