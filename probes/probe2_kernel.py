#!/usr/bin/env python
"""Perf probe #2: gather strategies + Pallas Gram tile variants."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np

CACHE = os.environ.get("GAUSS_BENCH_CACHE",
                       os.path.expanduser("~/.cache/gauss_tpu_bench"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import gauss_tpu  # noqa: F401
    from gauss_tpu.ops import pallas_gram as pg
    from gauss_tpu.ops.window_kernel import pad_pop_segments

    rng = np.random.default_rng(0)
    R, S = 24000, 43008
    G = rng.integers(0, 3, size=(R, S), dtype=np.int8)
    G_dev = jnp.asarray(G)

    sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def timeit(name, f, *args, reps=3):
        out = f(*args)
        float(sync(jax.tree_util.tree_leaves(out)[0]))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = f(*args)
            float(sync(jax.tree_util.tree_leaves(out)[0]))
            ts.append(time.time() - t0)
        t = sorted(ts)[len(ts) // 2]
        log(f"{name}: {t*1e3:8.1f} ms")
        return t

    W, Mp, Up = 16, 1280, 1024
    B = 4
    m_idx = rng.integers(0, R, size=(W, Mp)).astype(np.int32)
    u_idx = rng.integers(0, R, size=(W, Up)).astype(np.int32)
    starts = rng.integers(0, R - 3000, size=(W,)).astype(np.int32)

    # a) current: two row gathers inside a scan
    @jax.jit
    def take_gather(G, mi, ui):
        def body(_, x):
            mi1, ui1 = x
            Gm = jnp.take(G, mi1, axis=0)
            Gu = jnp.take(G, ui1, axis=0)
            return None, (jnp.sum(Gm.astype(jnp.int32), axis=(1, 2)),
                          jnp.sum(Gu.astype(jnp.int32), axis=(1, 2)))
        xs = (mi.reshape(W // B, B, Mp), ui.reshape(W // B, B, Up))
        return jax.lax.scan(body, None, xs)[1]
    timeit("take gather Gm+Gu   ", take_gather, G_dev, m_idx, u_idx)

    # b) one fused gather of the union
    x_idx = np.concatenate([m_idx, u_idx], axis=1)

    @jax.jit
    def take_gather_union(G, xi):
        def body(_, x):
            X = jnp.take(G, x[0], axis=0)
            return None, jnp.sum(X.astype(jnp.int32), axis=(1, 2))
        xs = (xi.reshape(W // B, B, Mp + Up),)
        return jax.lax.scan(body, None, xs)[1]
    timeit("take gather union   ", take_gather_union, G_dev, x_idx)

    # c) contiguous dynamic_slice of the same byte volume
    Np = Mp + Up

    @jax.jit
    def dyn_slice(G, st):
        def body(_, xs1):
            (s,) = xs1
            blocks = [jax.lax.dynamic_slice(G, (s[i], jnp.int32(0)), (Np, S))
                      for i in range(B)]
            X = jnp.stack(blocks)
            return None, jnp.sum(X.astype(jnp.int32), axis=(1, 2))
        xs = (st.reshape(W // B, B),)
        return jax.lax.scan(body, None, xs)[1]
    timeit("contiguous slice    ", dyn_slice, G_dev, starts)

    # d) gather within a pre-sliced contiguous block (2-stage)
    loc_idx = rng.integers(0, Np, size=(W, Np)).astype(np.int32)

    @jax.jit
    def slice_then_gather(G, st, li):
        def body(_, x):
            s, li1 = x
            blocks = [jax.lax.dynamic_slice(G, (s[i], jnp.int32(0)), (Np, S))
                      for i in range(B)]
            X = jnp.stack(blocks)
            Xg = jnp.take_along_axis(X, li1[:, :, None], axis=1)
            return None, jnp.sum(Xg.astype(jnp.int32), axis=(1, 2))
        xs = (st.reshape(W // B, B), li.reshape(W // B, B, Np))
        return jax.lax.scan(body, None, xs)[1]
    timeit("slice+local gather  ", slice_then_gather, G_dev, starts, loc_idx)

    # --- Pallas Gram tile variants on one window-sized input ----------
    pop_sizes = tuple([1137] * 29)     # ~33k subjects
    for k_tile in (512, 128):
        pg.K_TILE = k_tile
        padded = tuple(-(-p // k_tile) * k_tile for p in pop_sizes)
        Sp = sum(padded)
        Xh = rng.integers(-2, 3, size=(Mp + Up, Sp)).astype(np.int8)
        Yh = Xh[:Mp]
        X_dev = jnp.asarray(Xh)
        Y_dev = jnp.asarray(Yh)
        wgts = tuple([1.0 / 29] * 29)
        for row_tile in (256, 512):
            pg.ROW_TILE = row_tile
            if Mp % row_tile or Up % row_tile:
                continue
            n_sym = Mp // row_tile

            def gram(X, Y):
                return pg.weighted_gram_t1(X, Y, pop_sizes, padded, wgts,
                                           n_sym=n_sym)
            gj = jax.jit(gram)
            t = timeit(f"pallas gram K={k_tile:4d} R={row_tile:4d} "
                       f"S={Sp:6d}", gj, X_dev, Y_dev)
            tput = 2 * ((Mp + Up) * Mp) * Sp / t / 1e12
            log(f"    -> {tput:.1f} TOPS (1 window)")


if __name__ == "__main__":
    main()
