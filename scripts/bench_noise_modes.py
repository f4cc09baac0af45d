"""Time the spectral-GRF MUSE step with noise="direct" vs noise="fft".

Decides grf_spectral_problem's default noise mode on the real chip
(round-3 pending item): "direct" (indexed hermitian sampler, zero FFT
ops per iteration) was measured SLOWER than "fft" (2 rfft2 passes) on
the CPU backend — the roll/flip gather is cache-hostile there — but the
TPU cost model is different (the flip is a cheap VPU permute; the FFT
passes are the platform floor).  Prints one JSON line with both
timings; flip the default in muse_tpu/models/grf.py if direct loses on
TPU too.

Usage: python scripts/bench_noise_modes.py [--grid 1024] [--nsims 100]
"""

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp


def time_mode(noise, n_grid, nsims, reps=5):
    from muse_tpu.models.grf import grf_spectral_problem
    from muse_tpu.solver.compiled import CompiledProblem
    from muse_tpu.theta import ThetaSpec
    from muse_tpu.utils.keys import as_key, sim_keys

    prob = grf_spectral_problem(n=n_grid, solver="cg", noise=noise,
                                data_key=jax.random.PRNGKey(42))
    spec = ThetaSpec.from_example(0.0)
    comp = CompiledProblem(prob, spec, spec.flatten(0.0))
    key = as_key(0)
    keys_all = jnp.concatenate(
        [jax.random.fold_in(key, 2 ** 31 - 1)[None], sim_keys(key, nsims)])
    Z = jnp.zeros((nsims + 1, comp.nz), jnp.float32)
    lane_ids = jnp.arange(nsims + 1)
    th = jnp.asarray(spec.flatten(0.0), jnp.float32)
    atol = jnp.asarray(1e-2, jnp.float32)

    out = comp.muse_step(th, th, keys_all, Z, lane_ids, atol)  # compile
    jax.block_until_ready(out)
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = comp.muse_step(th, th, keys_all, Z, lane_ids, atol)
        jax.block_until_ready(out)
        walls.append(time.perf_counter() - t0)
    walls.sort()
    return walls[len(walls) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=1024)
    ap.add_argument("--nsims", type=int, default=100)
    args = ap.parse_args()
    t_direct = time_mode("direct", args.grid, args.nsims)
    t_fft = time_mode("fft", args.grid, args.nsims)
    print(json.dumps({
        "metric": f"spectral_grf_noise_mode_s_{args.nsims}sims_"
                  f"{args.grid}sq",
        "direct_s": round(t_direct, 4),
        "fft_s": round(t_fft, 4),
        "winner": "direct" if t_direct <= t_fft else "fft",
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
