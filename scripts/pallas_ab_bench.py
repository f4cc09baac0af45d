"""End-to-end Pallas-vs-XLA A/B on the field-latent GRF muse step.

grf_field_problem is the one model family whose score path evaluates a
fused spectral quadform (value via the kernel, z/θ-gradients via its
custom VJP) — the pattern ops/pallas_grf.py exists for.  The flagship
families never hit this op: the packed-spectral representation removed
the quadform entirely (a representation win that beats any kernel win).
This script times the FULL compiled muse_step both ways on-chip, giving
the shipped-hot-path number BENCHMARKS.md's microbench table lacks.

Run:  python scripts/pallas_ab_bench.py --n 1024 --nsims 16
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from muse_tpu.models.grf import grf_field_problem
from muse_tpu.solver.compiled import CompiledProblem
from muse_tpu.theta import ThetaSpec
from muse_tpu.utils.keys import as_key, sim_keys


def time_step(prob, nsims, reps=5):
    spec = ThetaSpec.from_example(0.0)
    comp = CompiledProblem(prob, spec, spec.flatten(0.0))
    key = as_key(0)
    keys_all = jnp.concatenate(
        [jax.random.fold_in(key, 2 ** 31 - 1)[None], sim_keys(key, nsims)])
    th = jnp.zeros(1, jnp.float32)
    Z = jnp.zeros((nsims + 1, comp.nz), jnp.float32)
    lanes = jnp.arange(nsims + 1)
    atol = jnp.asarray(1e-2, jnp.float32)
    jax.block_until_ready(comp.muse_step(th, th, keys_all, Z, lanes, atol))
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(
            comp.muse_step(th, th, keys_all, Z, lanes, atol))
        walls.append(time.perf_counter() - t0)
    walls.sort()
    return walls[len(walls) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--nsims", type=int, default=16)
    args = ap.parse_args()

    t = {}
    for name, flag in (("pallas", True), ("xla", False)):
        prob = grf_field_problem(n=args.n, use_pallas=flag,
                                 data_key=jax.random.PRNGKey(42))
        t[name] = time_step(prob, args.nsims)
        print(f"{name:7s}: {t[name]:.4f} s/muse_step "
              f"({args.nsims} sims x {args.n}^2)", flush=True)
    print(f"pallas/xla = {t['pallas'] / t['xla']:.3f}")


if __name__ == "__main__":
    main()
