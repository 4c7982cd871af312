#!/usr/bin/env python
"""Perf probe #16: solver A/B in one process (same tunnel conditions).

Builds the full resident region tail with all four combinations of
{blocked, XLA} cholesky x trsm and slope-times each on the bench batch.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

CACHE = os.environ.get("GAUSS_BENCH_CACHE",
                       os.path.expanduser("~/.cache/gauss_tpu_bench"))
N_SNPS = int(os.environ.get("GAUSS_BENCH_SNPS", 64000))
BP_SPAN = N_SNPS * 2000 // 3
REPS = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import gauss_tpu  # noqa: F401
    from gauss_tpu.models.genome import GenomeEngine
    from gauss_tpu.ops import window_kernel as wk
    from gauss_tpu.utils.benchdata import cached_panel, make_bench_input

    store = cached_panel(CACHE, N_SNPS, bp_span=BP_SPAN)
    inp = make_bench_input(store, 0.4)
    pop_wgt = {p: 1.0 / store.desc.num_pops for p in store.desc.pops}
    lo = int(store.index["bp"].min())
    hi = int(store.index["bp"].max())
    engine = GenomeEngine(store, snp_bucket=256, device_linalg=True)
    run = engine.prepare_mix(inp, pop_wgt, af1_cutoff=0.01)
    plans, inputs, arrays, _ = run._region_batch(lo, hi, 1_000_000,
                                                 500_000)
    key = next(k for k in engine._fused_fns if k[0] == "resident")
    _, Mp, Up, _, _ = key
    spec = engine._spec(run.pop_sizes, run.wgts)
    inputs12 = inputs[:5]
    sync = jax.jit(
        lambda t: sum(jnp.sum(a.astype(jnp.float32))
                      for a in jax.tree_util.tree_leaves(t)))
    n_panel = len(arrays)

    def build(chol, trsm):
        os.environ["GAUSS_BLOCKED_CHOL"] = chol
        os.environ["GAUSS_BLOCKED_TRSM"] = trsm
        fn = wk.build_resident_region_kernel(spec, Mp, Up)
        return fn

    def slope(f, label):
        @jax.jit
        def f_rep(*args):
            def step(c, _):
                eps = jnp.minimum(c, 0.0)
                a = list(args)
                ieps = eps.astype(a[n_panel].dtype)
                a[n_panel] = a[n_panel] + ieps
                a[n_panel + 1] = a[n_panel + 1] + ieps
                a[n_panel + 2] = a[n_panel + 2] + eps
                out = f(*a)
                return c + sum(jnp.sum(x.astype(jnp.float32))
                               for x in jax.tree_util.tree_leaves(out)), None
            out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  None, length=REPS)
            return out

        def timed(g):
            g(*arrays, *inputs12)
            ts = []
            for _ in range(3):
                t0 = time.time()
                out = g(*arrays, *inputs12)
                float(sync(out))
                ts.append(time.time() - t0)
            return sorted(ts)[1]

        t1 = timed(f)
        tn = timed(f_rep)
        dev = (tn - t1) / (REPS - 1)
        log(f"  {label}: one-dispatch {t1*1e3:.1f} ms, device-only "
            f"{dev*1e3:.1f} ms")
        return dev

    for chol in ("0", "1"):
        for trsm in ("0", "1"):
            slope(build(chol, trsm), f"chol={chol} trsm={trsm}")


if __name__ == "__main__":
    main()
