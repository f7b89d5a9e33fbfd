#!/usr/bin/env bash
# Full local replica of the driver's gates: oracle parity at sf0.01,
# the pytest suite, and the bench line.
set -uo pipefail
cd "$(dirname "$0")/.."
echo "=== oracle parity (sf0.01) ==="
python3 scripts/check_oracle.py /root/testdata/sf0.01 2>&1 \
  | grep -vE "WARN|^\[Stage|incubator|log4j|adjust|warn\(msg\)"
echo "=== pytest ==="
python -m pytest tests/ -q 2>&1 | tail -2
echo "=== bench (sf0.01 quick) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_BENCH_TURNS=20000 \
  python3 bench.py 2>&1 | grep -E '^\{'
