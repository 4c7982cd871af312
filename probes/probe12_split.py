#!/usr/bin/env python
"""Perf probe #12: device-time split of the batched-window region
kernel (r5): raw Pallas Grams vs block tail (t2/cov/normalize) vs
solves.  All variants timed with the non-hoistable in-dispatch repeat
scan (offsets AND Z1 perturbed by the carry).

Variants:
  pallas : int4 convert + t1_mm + t1_um only
  blocks : + t2 corrections, cov, corr normalize (B11/B21)
  full   : + Cholesky/trsm solves (the shipped kernel)
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
REPS = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import gauss_tpu  # noqa: F401
    from gauss_tpu.models.genome import GenomeEngine
    from gauss_tpu.ops import window_kernel as wk
    from gauss_tpu.ops import pallas_gram as pg
    from gauss_tpu.utils.benchdata import cached_panel, make_bench_input

    store = cached_panel(CACHE, N_SNPS, bp_span=BP_SPAN)
    inp = make_bench_input(store, 0.4)
    pop_wgt = {p: 1.0 / store.desc.num_pops for p in store.desc.pops}
    lo = int(store.index["bp"].min())
    hi = int(store.index["bp"].max())
    engine = GenomeEngine(store, snp_bucket=256, device_linalg=True)
    run = engine.prepare_mix(inp, pop_wgt, af1_cutoff=0.01)
    batch = run._region_batch(lo, hi, 1_000_000, 500_000)
    plans, inputs, arrays, fn_full = batch
    inputs12 = inputs[:5]   # variants take the 12-arg (uncompacted) form
    key = next(k for k in engine._fused_fns if k[0] == "resident")
    _, Mp, Up, _, _ = key
    spec = engine._spec(run.pop_sizes, run.wgts)
    log(f"Mp={Mp} Up={Up} W={int(inputs[0].shape[0])} "
        f"dtype={pg.gram_dtype().__name__}")

    def blocks_tail(B11f, B21f, z1, mmk, umk):
        return (jnp.sum(B11f, axis=(1, 2)) + jnp.sum(B21f, axis=(1, 2))
                + 0.0 * z1[:, 0],)

    fn_blocks = wk._resident_scan(spec, Mp, Up, blocks_tail)

    def chol_tail(B11f, B21f, z1, mmk, umk):
        L = jnp.linalg.cholesky(B11f)
        return (jnp.sum(L, axis=(1, 2)) + jnp.sum(B21f, axis=(1, 2))
                + 0.0 * z1[:, 0],)

    fn_chol = wk._resident_scan(spec, Mp, Up, chol_tail)

    seg = ((spec.pop_sizes, spec.pop_sizes_padded, spec.wgts))

    @jax.jit
    def fn_pallas(Xm, Xu, Spm, Spu, Mum, Muu, Vu, m_t0, u_t0, Z1,
                  m_mask, u_mask):
        gdt = pg.gram_dtype()
        Xm = Xm.astype(gdt)
        Xu = Xu.astype(gdt)
        xb = pg.x_block_tiles(Xm.dtype)
        R = pg.ROW_TILE
        t1_mm = pg.weighted_gram_t1(Xm, Xm, *seg, n_sym=Mp // R,
                                    nx=Mp, ny=Mp, x_tile0=m_t0,
                                    y_tile0=m_t0, x_block=xb)
        t1_um = pg.weighted_gram_t1(Xu, Xm, *seg, n_sym=0,
                                    nx=Up, ny=Mp, x_tile0=u_t0,
                                    y_tile0=m_t0, x_block=xb)
        return (jnp.sum(t1_mm, axis=(1, 2)) + jnp.sum(t1_um, axis=(1, 2))
                + 0.0 * Z1[:, 0],)

    sync = jax.jit(
        lambda t: sum(jnp.sum(a.astype(jnp.float32))
                      for a in jax.tree_util.tree_leaves(t)))

    def slope(f, label, inp=None):
        inp = inputs if inp is None else inp
        n_panel = len(arrays)

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
                s = sum(jnp.sum(x.astype(jnp.float32))
                        for x in jax.tree_util.tree_leaves(out))
                return c + s, None
            out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  None, length=REPS)
            return out

        def timed(g):
            t0 = time.time()
            g(*arrays, *inp)
            log(f"  {label}: compile+first {time.time()-t0:.0f}s")
            ts = []
            for _ in range(3):
                t0 = time.time()
                out = g(*arrays, *inp)
                float(sync(out))
                ts.append(time.time() - t0)
            return sorted(ts)[1]

        t1 = timed(f)
        tn = timed(f_rep)
        dev = (tn - t1) / (REPS - 1)
        log(f"  {label}: one-dispatch {t1*1e3:.1f} ms, device-only "
            f"{dev*1e3:.1f} ms")
        return dev

    d_pallas = slope(fn_pallas, "pallas", inputs12)
    d_blocks = slope(fn_blocks, "blocks", inputs12)
    d_chol = slope(fn_chol, "chol", inputs12)
    d_full = slope(fn_full, "full")
    log(f"SPLIT: grams {d_pallas*1e3:.1f} ms, block tail "
        f"{(d_blocks-d_pallas)*1e3:.1f} ms, cholesky "
        f"{(d_chol-d_blocks)*1e3:.1f} ms, trsm+z "
        f"{(d_full-d_chol)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
