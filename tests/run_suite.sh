#!/bin/bash
# Run the test suite in three process groups.
#
# Why not one `pytest tests/`: this platform's XLA CPU backend has
# repeatedly SEGFAULTED inside `backend_compile_and_load` after a few
# hundred compiles in one long-lived process (observed three times, each
# at a DIFFERENT test, always in the compiler — an accumulating-state
# LLVM crash, not a test bug; every file passes in a fresh process).
# Three groups keep per-process compile counts under the observed crash
# horizon while still amortizing fixtures within each group.
#
# Usage: tests/run_suite.sh  [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
fail=0

run_group() {
  echo "=== pytest group: $* ==="
  python -m pytest -q "$@" || fail=1
}

run_group tests/test_adapters_gating.py tests/test_bandpower.py \
          tests/test_calibration.py tests/test_certify.py \
          tests/test_distributions.py tests/test_docs_execute.py

run_group tests/test_fft_check.py tests/test_grf.py tests/test_lbfgs.py \
          tests/test_lensing.py tests/test_mesh.py

run_group tests/test_muse_funnel.py tests/test_newton_varpro.py \
          tests/test_numpyro_adapter.py tests/test_pallas_grf.py \
          tests/test_ppl.py tests/test_theta_transforms.py

exit $fail
