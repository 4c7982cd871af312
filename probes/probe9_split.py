#!/usr/bin/env python
"""Perf probe #9: Gram-vs-solve split of the resident region kernel.

Times the full resident kernel vs a variant whose tail skips the
Cholesky/solves (sums the correlation blocks instead), on the same
64k-SNP bench batch.  The difference is the solve cost.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np

CACHE = os.environ.get("GAUSS_BENCH_CACHE",
                       os.path.expanduser("~/.cache/gauss_tpu_bench"))
N_SNPS = int(os.environ.get("GAUSS_BENCH_SNPS", 64000))
BP_SPAN = N_SNPS * 2000 // 3


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
    batch = run._region_batch(lo, hi, 1_000_000, 500_000)
    plans, inputs, arrays, fn = batch
    Ws = 8
    sub = tuple(a[:Ws] for a in inputs)

    # reconstruct (Mp, Up) from the cached resident fn key
    key = next(k for k in engine._fused_fns if k[0] == "resident")
    _, Mp, Up, _, _ = key
    spec = engine._spec(run.pop_sizes, run.wgts)
    log(f"Mp={Mp} Up={Up} windows={len(plans)}")

    def gram_tail(B11f, B21f, z1, mmk, umk):
        return (jnp.sum(B11f, axis=(1, 2))[:, None]
                + jnp.sum(B21f, axis=(1, 2))[:, None]
                + 0.0 * z1[:, :1],) * 2

    fn_gram = wk._resident_scan(spec, Mp, Up, gram_tail)

    sync = jax.jit(lambda a, b: jnp.sum(a.astype(jnp.float32))
                   + jnp.sum(b.astype(jnp.float32)))

    def timed(f, inp, label):
        t0 = time.time()
        f(*arrays, *inp)
        log(f"  {label}: compile+first {time.time()-t0:.1f}s")
        reps = 4

        def once():
            t0 = time.time()
            z, i = f(*arrays, *inp)
            float(sync(z, i))
            return time.time() - t0
        ts = sorted(once() for _ in range(reps))
        return ts[len(ts) // 2]

    t_full = timed(fn, sub, "full")
    t_gram = timed(fn_gram, sub, "gram-only")
    log(f"8-window sub-batch: full {t_full*1e3:.1f} ms, gram-only "
        f"{t_gram*1e3:.1f} ms -> solves ~{(t_full-t_gram)*1e3:.1f} ms "
        f"({100*(t_full-t_gram)/t_full:.0f}%)")


if __name__ == "__main__":
    main()
