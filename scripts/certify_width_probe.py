"""On-chip certified-width survey for the flagship lensing MAP program.

For each candidate batch width, runs one compiled ``muse_step`` of the
1024² (or --n) lensing problem and certifies it against the
independently compiled B=1 program (muse_tpu/solver/certify.py) —
exactly the probe the solvers run.  Prints a per-width table of
(certified?, s/iter, per-lane s) so BENCHMARKS.md's certified-width
table and the demo/bench ``max_batch`` defaults are measured, not
guessed.

Usage:  python scripts/certify_width_probe.py --n 1024 --widths 5 9 13 17 33
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from muse_tpu.models.lensing import lensing_problem
from muse_tpu.solver.compiled import CompiledProblem
from muse_tpu.theta import ThetaSpec
from muse_tpu.utils.keys import as_key, sim_keys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--widths", type=int, nargs="+",
                    default=[5, 9, 13, 17, 33])
    ap.add_argument("--solver", default="varpro")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    prob = lensing_problem(n=args.n, solver=args.solver,
                           data_key=jax.random.PRNGKey(42))
    spec = ThetaSpec.from_example(0.0)
    comp = CompiledProblem(prob, spec, spec.flatten(0.0))
    cert = comp.certifier

    key = as_key(0)
    kmax = max(args.widths)
    keys_all = jnp.concatenate(
        [jax.random.fold_in(key, 2 ** 31 - 1)[None], sim_keys(key, kmax)])
    th = jnp.asarray(spec.flatten(0.0), jnp.float32)
    atol = jnp.asarray(1e-2, jnp.float32)

    rows = []
    for w in args.widths:
        kc = keys_all[1:w + 1]                 # sim lanes only
        Z0 = jnp.zeros((w, comp.nz), jnp.float32)
        lanes = jnp.arange(1, w + 1)
        t0 = time.perf_counter()
        out = comp.muse_step(th, th, kc, Z0, lanes, atol)
        jax.block_until_ready(out["g"])
        t_compile = time.perf_counter() - t0
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = comp.muse_step(th, th, kc, Z0, lanes, atol)
            jax.block_until_ready(out)
            walls.append(time.perf_counter() - t0)
        walls.sort()
        t = walls[len(walls) // 2]

        # the solvers' probe, verbatim: lanes 0 and w-1 vs B=1 re-solves
        import warnings
        ok = True
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            for i in sorted({0, w - 1}):
                x, _ = cert._sample1(kc[i], th)
                if not cert.probe(f"probe_w{w}", w, [i],
                                  lambda j: x, lambda j: Z0[j],
                                  out["Z"], th, atol):
                    ok = False
                    break
        ev = cert.events[-1] if (not ok and cert.events) else {}
        rows.append((w, ok, t, t / w, t_compile, ev))
        print(f"width {w:4d}: certified={ok}  {t:7.3f} s/step  "
              f"{t / w:7.4f} s/lane  (compile {t_compile:.0f}s)"
              + ("" if ok else f"  FAILED: f_batch={ev.get('f_batch'):.4g} "
                 f"f_ref={ev.get('f_ref'):.4g}"), flush=True)

    best = [r for r in rows if r[1]]
    if best:
        b = min(best, key=lambda r: r[3])
        print(f"\nbest certified width: {b[0]} at {b[3]:.4f} s/lane")


if __name__ == "__main__":
    main()
