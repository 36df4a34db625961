#!/usr/bin/env bash
# Pre-snapshot gate: the exact mechanical checks whose absence let a
# SyntaxError empty an entire round's correctness record (round 3).
# Run before every snapshot / handoff:
#
#   bash scripts/preflight.sh          # full gate (compile + pytest + sweep)
#   bash scripts/preflight.sh quick    # compile + registry import only
#
# Exit code 0 == safe to snapshot.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 byte-compile every source file =="
python -m py_compile $(find dynamodb_streaming_datalake_spark -name '*.py') \
    __spark_entry__.py bench.py

echo "== 2/4 registry imports + driver contract shape =="
python - <<'EOF'
from dynamodb_streaming_datalake_spark.registry import all_queries, all_oracle_sql, PRIORITY
q, o = all_queries(), all_oracle_sql()
missing = [n for n in PRIORITY if n not in q]
assert not missing, f"PRIORITY names not registered: {missing}"
assert set(q) == set(o), f"queries without oracle SQL: {set(q) ^ set(o)}"
import __spark_entry__ as e
assert set(e.queries()) == set(q)
print(f"registry OK: {len(q)} queries, {len(o)} oracles; window head: {list(q)[:3]}")
EOF
python scripts/rotate_window.py --check
python scripts/refresh_budgets.py --check

if [ "${1:-}" = "quick" ]; then
    echo "preflight (quick) PASSED"
    exit 0
fi

echo "== 3/4 pytest (default suite) =="
python -m pytest tests/ -q

echo "== 4/4 full oracle-parity sweep at sf0.01 (the driver's gate scale) =="
python -m pytest tests/test_oracle_parity.py -q -m oracle_full

echo "preflight PASSED"
