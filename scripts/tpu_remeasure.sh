#!/bin/bash
# One-shot round-3 TPU re-measurement (run when the axon tunnel is up).
#
# Collects every pending TPU number in one pass so a short tunnel window
# suffices:
#   1. headline bench (spectral GRF, the shipped flagship path)
#   2. pixel-representation GRF bench (the round-2 headline, for the
#      stage table)
#   3. noise="direct" vs "fft" sampler timing (decides the
#      grf_spectral_problem default on this backend)
#   4. north-star full pipeline, --repeat (all-compiled wall)
#
# Usage: bash scripts/tpu_remeasure.sh [outdir]   (default .tpu_remeasure)

set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
# examples/ scripts put their own dir (not cwd) on sys.path — make the
# package importable regardless of which script runs
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
OUT=${1:-.tpu_remeasure}
mkdir -p "$OUT"

probe=$(timeout 60 python -c "import jax; print(jax.default_backend())" 2>/dev/null | tail -1)
if [ "$probe" != "axon" ] && [ "$probe" != "tpu" ]; then
    echo "tunnel down or non-TPU backend ($probe) — aborting" >&2
    exit 1
fi

echo "== 1/4 bench.py (spectral GRF)"
timeout 3000 python bench.py > "$OUT/bench_grf_spectral.json" \
    2> "$OUT/bench_grf_spectral.log"
cat "$OUT/bench_grf_spectral.json"

echo "== 2/4 bench.py --model grf-pixel"
timeout 3000 python bench.py --model grf-pixel \
    > "$OUT/bench_grf_pixel.json" 2> "$OUT/bench_grf_pixel.log"
cat "$OUT/bench_grf_pixel.json"

echo "== 3/4 noise modes"
timeout 3000 python scripts/bench_noise_modes.py \
    > "$OUT/noise_modes.json" 2> "$OUT/noise_modes.log"
cat "$OUT/noise_modes.json"

echo "== 4/4 north-star --repeat"
timeout 4500 python examples/northstar_grf.py --repeat \
    > "$OUT/northstar.log" 2>&1
tail -15 "$OUT/northstar.log"

echo "done — results in $OUT/"
