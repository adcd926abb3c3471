#!/usr/bin/env bash
# CI-shaped local gate: lint (if ruff is available) + the full suite on the
# virtual 8-device CPU mesh (tests/conftest.py pins jax_platforms=cpu).
# Mirrors the reference's unit_tests.yml + code_quality.yml intent
# (/root/reference/.github/workflows/) without GPU runners.
set -euo pipefail
cd "$(dirname "$0")/.."

if command -v ruff >/dev/null 2>&1; then
    ruff check ganq_tpu tests
else
    echo "[ci] ruff not installed; skipping lint"
fi

python -m pytest tests/ -x -q
