#!/usr/bin/env python
"""Perf probe #15: region-kernel COLD compile time vs K-unroll depth.

Run with a fresh compilation cache to measure the true cold compile of
the batched-window region kernel (the only compile a first-time user
pays per shape):

    GAUSS_TPU_CC_DIR=/tmp/cc_u12 python probes/probe15_compile.py
    GAUSS_TPU_CC_DIR=/tmp/cc_u6 GAUSS_K_UNROLL=6 python probes/probe15_compile.py

Prints compile+first time and 3 one-dispatch timings.
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
    batch = run._region_batch(lo, hi, 1_000_000, 500_000)
    plans, inputs, arrays, fn = batch
    t_prep = time.time() - t0
    sync = jax.jit(lambda t: jnp.sum(t.astype(jnp.float32)))
    t0 = time.time()
    out = fn(*arrays, *inputs)
    float(sync(out))
    t_compile = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*arrays, *inputs)
        float(sync(out))
        ts.append(time.time() - t0)
    log(f"U={pg._K_UNROLL} prep(arrays)={t_prep:.1f}s "
        f"compile+first={t_compile:.1f}s "
        f"one-dispatch={[f'{x*1e3:.0f}' for x in ts]} ms")


if __name__ == "__main__":
    main()
