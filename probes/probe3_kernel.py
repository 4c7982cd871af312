#!/usr/bin/env python
"""Perf probe #3: row-gather strategies for the region kernel.

a) XLA jnp.take int8 row gather (baseline)
b) XLA gather after bitcast to int32 (4x fewer elements)
c) Pallas per-row-DMA gather (ops/dma_gather.py)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import gauss_tpu  # noqa: F401
    from gauss_tpu.ops.dma_gather import gather_rows

    rng = np.random.default_rng(0)
    R, S = 24000, 43008
    G = rng.integers(0, 3, size=(R, S), dtype=np.int8)
    G_dev = jnp.asarray(G)
    G32_dev = jnp.asarray(G.view(np.int32))

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

    N = 16 * (1280 + 1024)          # all rows of 16 windows
    idx = rng.integers(0, R, size=(N,)).astype(np.int32)
    gbytes = N * S / 1e9

    t = timeit("take int8  [N,S]    ",
               jax.jit(lambda g, i: jnp.take(g, i, axis=0)), G_dev, idx)
    log(f"    -> {2 * gbytes / t:.0f} GB/s (rd+wr)")

    t = timeit("take int32 bitcast  ",
               jax.jit(lambda g, i: jnp.take(g, i, axis=0)), G32_dev, idx)
    log(f"    -> {2 * gbytes / t:.0f} GB/s (rd+wr)")

    t = timeit("pallas DMA gather   ", lambda g, i: gather_rows(g, i),
               G_dev, idx)
    log(f"    -> {2 * gbytes / t:.0f} GB/s (rd+wr)")

    out = np.asarray(gather_rows(G_dev, jnp.asarray(idx[:256])))
    ok = (out == G[idx[:256]]).all()
    log(f"pallas DMA gather correct: {ok}")
    assert ok


if __name__ == "__main__":
    main()
