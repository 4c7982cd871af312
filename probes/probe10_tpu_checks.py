#!/usr/bin/env python
"""Probe #10: on-TPU correctness spot-checks that the CPU test suite
cannot cover (conftest pins tests to the CPU backend):

  1. chunked DMA row gather (dma_gather, C=2 flat views) vs jnp.take
     on a >2^31-byte panel;
  2. weighted_gram_t1 int4/x-block variants vs the f64 T1 oracle at
     bench-like shapes (43008-subject axis).

Run alone (one TPU process at a time).  Exits nonzero on mismatch.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import gauss_tpu  # noqa: F401
    from gauss_tpu.ops import pallas_gram as pg
    from gauss_tpu.ops.dma_gather import take_rows

    rng = np.random.default_rng(11)
    ok = True

    # --- 1. chunked DMA gather on a 51200 x 43008 panel (2.2e9 bytes,
    # C=2 chunks; threshold is (2^31-1)//43008 = 49941 rows/chunk)
    R, S = 51_200, 43_008
    G = rng.integers(0, 3, size=(R, S), dtype=np.int8)
    idx = rng.integers(0, R, size=1500).astype(np.int32)
    idx[:10] = [0, R - 1, 49_940, 49_941, 49_942, 1, R - 2, 25_000,
                49_000, 50_999]          # chunk-boundary rows
    got = np.asarray(take_rows(jnp.asarray(G), jnp.asarray(idx)))
    want = G[idx]
    match = np.array_equal(got, want)
    log(f"chunked DMA gather [{R}x{S}] (C=2): exact={match}")
    ok &= match
    del G, got, want

    # --- 2. int4 Gram vs f64 oracle at bench-like subject axis
    pop_sizes = (700, 1500, 300, 6360)
    padded = tuple(-(-s // pg.K_TILE) * pg.K_TILE for s in pop_sizes)
    Sg = sum(padded)
    wgts = (0.2, 0.4, 0.1, 0.3)
    RN = 1536
    X8 = np.zeros((RN, Sg), dtype=np.int8)
    off = 0
    for s, sp in zip(pop_sizes, padded):
        X8[:, off:off + s] = rng.integers(-2, 3, size=(RN, s),
                                          dtype=np.int8)
        off += sp
    m = np.asarray(pop_sizes, float)
    w = np.asarray(wgts, float)
    beta = w * m * m / (m - 1.0)
    bounds = np.concatenate([[0], np.cumsum(padded)])

    def oracle(xs, ys):
        out = np.zeros((len(xs), len(ys)))
        for k in range(len(pop_sizes)):
            a = xs[:, bounds[k]:bounds[k + 1]].astype(np.float64)
            b = ys[:, bounds[k]:bounds[k + 1]].astype(np.float64)
            out += beta[k] * (a @ b.T)
        return out

    for dt, xb in ((jnp.int8, 1), (jnp.int4, 1), (jnp.int4, 2)):
        nx, ny, xt0, yt0 = 1024, 512, 2, 4

        @jax.jit
        def run(X, dt=dt, xb=xb):
            return pg.weighted_gram_t1(
                X.astype(dt), X.astype(dt), pop_sizes, padded, wgts,
                n_sym=0, nx=nx, ny=ny, x_tile0=jnp.int32(xt0),
                y_tile0=jnp.int32(yt0), x_block=xb)
        out = np.asarray(run(X8))
        want = oracle(X8[xt0 * pg.ROW_TILE:xt0 * pg.ROW_TILE + nx],
                      X8[yt0 * pg.ROW_TILE:yt0 * pg.ROW_TILE + ny])
        rel = np.abs(out - want).max() / max(1.0, np.abs(want).max())
        good = rel < 1e-6
        log(f"gram dtype={jnp.dtype(dt).name} xb={xb}: max rel err "
            f"{rel:.2e} ok={good}")
        ok &= good

    log("ALL OK" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
