#!/usr/bin/env python
"""Perf probe #11: where did the one-dispatch overhead go?

The batched-window kernel (r5) measures ~30 ms device-only but ~130 ms
one-dispatch.  Hypothesis: the per-dispatch int8->int4 conversion of
the resident panels (2.75 GB) is loop-invariant in the slope probe's
repeat scan, so it is hoisted out of "device-only" but paid on every
real dispatch.  Measures:

  1. full-batch slope (one-dispatch vs device-only), int4 vs int8
  2. the int4 conversion alone (jitted astype + tiny reduce)
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
    from gauss_tpu.ops import pallas_gram as pg
    from gauss_tpu.utils.benchdata import cached_panel, make_bench_input

    store = cached_panel(CACHE, N_SNPS, bp_span=BP_SPAN)
    inp = make_bench_input(store, 0.4)
    pop_wgt = {p: 1.0 / store.desc.num_pops for p in store.desc.pops}
    lo = int(store.index["bp"].min())
    hi = int(store.index["bp"].max())
    engine = GenomeEngine(store, snp_bucket=256, device_linalg=True)
    run = engine.prepare_mix(inp, pop_wgt, af1_cutoff=0.01)

    t0 = time.time()
    (k1, kdev), plans = run.region_kernel_seconds(lo, hi, repeats=3,
                                                  inner_repeats=4)
    log(f"dtype={pg.gram_dtype().__name__}: one-dispatch {k1*1e3:.1f} ms,"
        f" device-only {kdev*1e3:.1f} ms (incl compile {time.time()-t0:.0f}s)")

    if pg.gram_dtype() == jnp.int4:
        arrays = run._resident_arrays(1536, 1536)
        Xm, Xu = arrays[0], arrays[1]

        @jax.jit
        def conv(a, b):
            x = a.astype(jnp.int4)
            y = b.astype(jnp.int4)
            return (x[::997, ::997].astype(jnp.int32).sum()
                    + y[::997, ::997].astype(jnp.int32).sum())

        conv(Xm, Xu)
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(conv(Xm, Xu))
            ts.append(time.time() - t0)
        log(f"int4 conversion of Xm{tuple(Xm.shape)}+Xu{tuple(Xu.shape)}"
            f": {sorted(ts)[1]*1e3:.1f} ms (incl ~33 ms round trip)")


if __name__ == "__main__":
    main()
