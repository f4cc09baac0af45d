"""On-chip certified-width survey for the flagship lensing MAP program.

For each candidate batch width, runs one compiled ``muse_step`` of the
1024² (or --n) lensing problem and certifies it against the
independently compiled B=1 program (muse_tpu/solver/certify.py) —
exactly the probe the solvers run.  Prints a per-width table of
(certified?, s/iter, per-lane s) so BENCHMARKS.md's certified-width
table and the demo/bench ``max_batch`` defaults are measured, not
guessed.

Each width runs in its OWN subprocess: the round-5 upward extension
found widths ≥ 21 at 1024² crash the TPU worker outright (UNAVAILABLE
device error — the platform's device-program wall, not a value
corruption), which kills the whole client.  Isolating widths turns a
crash into a recorded ``CRASH`` row and lets the survey continue.

Usage:  python scripts/certify_width_probe.py --n 1024 --widths 5 9 13 17 33
"""

import argparse
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one_width(args):
    """Probe a single width in this process; print one parseable row."""
    import jax

    if args.platform:
        # this image's sitecustomize pins JAX_PLATFORMS=axon at
        # interpreter startup, so the env var alone cannot select CPU
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from muse_tpu.models.lensing import lensing_problem
    from muse_tpu.solver.compiled import CompiledProblem
    from muse_tpu.theta import ThetaSpec
    from muse_tpu.utils.keys import as_key, sim_keys

    w = args.one_width
    prob = lensing_problem(n=args.n, solver=args.solver,
                           data_key=jax.random.PRNGKey(42))
    spec = ThetaSpec.from_example(0.0)
    comp = CompiledProblem(prob, spec, spec.flatten(0.0))
    cert = comp.certifier

    key = as_key(0)
    keys_all = jnp.concatenate(
        [jax.random.fold_in(key, 2 ** 31 - 1)[None], sim_keys(key, w)])
    th = jnp.asarray(spec.flatten(0.0), jnp.float32)
    atol = jnp.asarray(1e-2, jnp.float32)

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
    print(f"width {w:4d}: certified={ok}  {t:7.3f} s/step  "
          f"{t / w:7.4f} s/lane  (compile {t_compile:.0f}s)"
          + ("" if ok else f"  FAILED: f_batch={ev.get('f_batch'):.4g} "
             f"f_ref={ev.get('f_ref'):.4g}"), flush=True)
    print(f"#ROW {w} {int(ok)} {t:.4f} {t / w:.5f}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--widths", type=int, nargs="+",
                    default=[5, 9, 13, 17, 33])
    ap.add_argument("--solver", default="varpro")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--one-width", type=int, default=None,
                    help="internal: probe exactly this width in-process")
    ap.add_argument("--per-width-timeout", type=int, default=1800)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) — the image's "
                         "sitecustomize pins the TPU tunnel by default")
    args = ap.parse_args()

    if args.one_width is not None:
        run_one_width(args)
        return

    rows = []
    for w in args.widths:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--n", str(args.n), "--solver", args.solver,
               "--reps", str(args.reps), "--one-width", str(w)]
        if args.platform:
            cmd += ["--platform", args.platform]
        try:
            cp = subprocess.run(cmd, capture_output=True, text=True,
                                timeout=args.per_width_timeout)
        except subprocess.TimeoutExpired:
            print(f"width {w:4d}: TIMEOUT after {args.per_width_timeout}s "
                  f"(device-program wall?)", flush=True)
            rows.append((w, "timeout", None, None))
            continue
        row = None
        for line in cp.stdout.splitlines():
            if line.startswith("width "):
                print(line, flush=True)
            if line.startswith("#ROW "):
                _, ws, oks, ts, tls = line.split()
                row = (int(ws), bool(int(oks)), float(ts), float(tls))
        if row is None:
            tail = (cp.stderr or cp.stdout).strip().splitlines()[-1:]
            print(f"width {w:4d}: CRASH (exit {cp.returncode}) "
                  f"{tail[0] if tail else ''}", flush=True)
            rows.append((w, "crash", None, None))
        else:
            rows.append(row)

    best = [r for r in rows if r[1] is True]
    if best:
        b = min(best, key=lambda r: r[3])
        print(f"\nbest certified width: {b[0]} at {b[3]:.4f} s/lane")


if __name__ == "__main__":
    main()
