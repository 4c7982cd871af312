#!/usr/bin/env python
"""One-off perf probe: split the region kernel's time between gather,
weighted-stats Grams, and the Cholesky/solve stage on the real TPU.
Uses the bench panel cache (run bench.py once first)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time
from functools import partial

import numpy as np

CACHE = os.environ.get("GAUSS_BENCH_CACHE",
                       os.path.expanduser("~/.cache/gauss_tpu_bench"))
N_SNPS = int(os.environ.get("GAUSS_BENCH_SNPS", 24000))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import gauss_tpu  # noqa: F401
    from gauss_tpu.models.genome import GenomeEngine
    from gauss_tpu.ops import window_kernel as wk
    from gauss_tpu.utils.benchdata import cached_panel, make_bench_input

    store = cached_panel(CACHE, N_SNPS, verbose=False)
    inp = make_bench_input(store, 0.4)
    pop_wgt = {p: 1.0 / store.desc.num_pops for p in store.desc.pops}
    lo = int(store.index["bp"].min())
    hi = int(store.index["bp"].max())
    engine = GenomeEngine(store, snp_bucket=256, device_linalg=True)
    run = engine.prepare_mix(inp, pop_wgt, af1_cutoff=0.01)
    batch = run._region_batch(lo, hi, 1_000_000, 500_000)
    plans, (m_idx, u_idx, Z1b, m_maskb, u_maskb), panel, fn = batch
    spec = engine._spec(run.pop_sizes, run.wgts)
    W, Mp = m_idx.shape
    Up = u_idx.shape[1]
    S = panel.shape[1]
    log(f"shapes: W={W} Mp={Mp} Up={Up} S={S} stats={spec.stats} "
        f"solver={spec.solver}")

    sync = jax.jit(lambda *xs: sum(jnp.sum(x.astype(jnp.float32))
                                   for x in xs))

    def timeit(name, f, *args, reps=3):
        f(*args)  # compile
        float(sync(*[x for x in jax.tree_util.tree_leaves(f(*args))]))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = f(*args)
            float(sync(*[x for x in jax.tree_util.tree_leaves(out)]))
            ts.append(time.time() - t0)
        t = sorted(ts)[len(ts) // 2]
        log(f"{name}: {t*1e3:8.1f} ms")
        return t

    B = 4

    def scan_over(body):
        @jax.jit
        def f(G_dev, mi_, ui_, z1_, mm_, um_):
            xs = tuple(a.reshape((W // B, B) + a.shape[1:])
                       for a in (mi_, ui_, z1_, mm_, um_))
            _, outs = jax.lax.scan(
                lambda _, x: (None, body(G_dev, *x)), None, xs)
            return outs
        return f

    args = (panel, m_idx, u_idx, Z1b, m_maskb, u_maskb)

    # 1. full region kernel (the production path)
    timeit("full region kernel ", fn, *args)

    # 2. gather only
    gather = scan_over(lambda G, mi, ui, z1, mm, um:
                       (jnp.sum(jnp.take(G, mi, axis=0).astype(jnp.int32)),
                        jnp.sum(jnp.take(G, ui, axis=0).astype(jnp.int32))))
    timeit("gather only        ", gather, *args)

    # 3. gather + corr blocks (stats, no solve)
    def corr_body(G, mi, ui, z1, mm, um):
        Gm = jnp.take(G, mi, axis=0)
        Gu = jnp.take(G, ui, axis=0)
        B11, B21 = wk.window_corr_blocks(Gm, Gu, mm, um, spec)
        return jnp.sum(B11), jnp.sum(B21)
    timeit("gather+stats       ", scan_over(corr_body), *args)

    # 4. full impute via scan (same as 1, sanity)
    def imp_body(G, mi, ui, z1, mm, um):
        Gm = jnp.take(G, mi, axis=0)
        Gu = jnp.take(G, ui, axis=0)
        return wk.window_impute(Gm, Gu, z1, mm, um, spec)
    timeit("gather+stats+solve ", scan_over(imp_body), *args)

    # 5. solve only: random well-conditioned B11/B21 of the same shape
    key = jax.random.PRNGKey(0)
    R = jax.random.normal(key, (W, Mp, 64), dtype=jnp.float32)
    B11 = (jnp.einsum("wmk,wnk->wmn", R, R) / 64.0
           + 1.1 * jnp.eye(Mp)[None])
    B21 = jax.random.normal(key, (W, Up, Mp), dtype=jnp.float32) * 0.1
    Z1 = jnp.asarray(Z1b, jnp.float32)

    @jax.jit
    def solve_scan(B11_, B21_, Z1_):
        xs = tuple(a.reshape((W // B, B) + a.shape[1:])
                   for a in (B11_, B21_, Z1_))

        def body(_, x):
            b11, b21, z1 = x
            L = jnp.linalg.cholesky(b11)
            X = jax.scipy.linalg.cho_solve((L, True),
                                           b21.transpose(0, 2, 1))
            A = X.transpose(0, 2, 1)
            z2 = jnp.einsum("wum,wm->wu", A, z1)
            info = jnp.einsum("wum,wum->wu", A, b21)
            return None, (z2, info)
        _, outs = jax.lax.scan(body, None, xs)
        return outs
    timeit("solve only (chol)  ", solve_scan, B11, B21, Z1)

    # 6. cholesky only
    @jax.jit
    def chol_scan(B11_):
        xs = (B11_.reshape((W // B, B, Mp, Mp)),)
        _, outs = jax.lax.scan(
            lambda _, x: (None, jnp.linalg.cholesky(x[0])), None, xs)
        return outs
    timeit("cholesky only      ", chol_scan, B11)


if __name__ == "__main__":
    main()
