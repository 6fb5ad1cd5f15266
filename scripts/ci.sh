#!/usr/bin/env bash
# CI gate: fast tests on the virtual CPU mesh + driver artifact checks.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== unit + integration tests (CPU mesh) =="
python -m pytest tests/ -q -m "not slow"

echo "== slow / scale tests =="
python -m pytest tests/ -q -m "slow"

echo "== driver artifacts =="
python __graft_entry__.py

echo "== quickstart example =="
python examples/quickstart.py

echo "CI green"
