"""Pallas fused weighted-Gram kernel vs float64 oracle.

Runs the kernel in interpreter mode on the CPU test mesh; the same code
path compiles through Mosaic on TPU (exercised by bench.py and the
verify workflow's device-vs-host parity check).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gauss_tpu.ops.pallas_gram import (K_TILE, ROW_TILE, mirror_lower,
                                       weighted_gram_reference,
                                       weighted_gram_t1)
from gauss_tpu.ops.window_kernel import (WindowKernelSpec,
                                         _int8_weighted_stats,
                                         _pallas_weighted_stats)


def _panel(rng, n_rows, sizes, padded):
    S = sum(padded)
    G = np.zeros((n_rows, S), np.int8)
    bounds = np.concatenate([[0], np.cumsum(padded)])
    for k, s in enumerate(sizes):
        lo = int(bounds[k])
        G[:, lo:lo + s] = rng.integers(0, 3, (n_rows, s))
    return G


def test_weighted_gram_t1_matches_oracle():
    rng = np.random.default_rng(3)
    sizes = [100, 300, 55, 220]
    padded = [-(-s // K_TILE) * K_TILE for s in sizes]
    w = rng.dirichlet(np.ones(len(sizes)))
    X = _panel(rng, 2 * ROW_TILE, sizes, padded)
    Y = X[:ROW_TILE]
    t1 = np.asarray(weighted_gram_t1(
        jnp.asarray(X), jnp.asarray(Y), sizes, padded, w, interpret=True))
    # oracle: the pure beta_k * C_k part (no mean correction)
    m = np.asarray(sizes, float)
    beta = w * m * m / (m - 1.0)
    bounds = np.concatenate([[0], np.cumsum(padded)])
    ref = np.zeros((X.shape[0], Y.shape[0]))
    for k in range(len(sizes)):
        a = X[:, int(bounds[k]):int(bounds[k + 1])].astype(np.float64)
        b = Y[:, int(bounds[k]):int(bounds[k + 1])].astype(np.float64)
        ref += beta[k] * (a @ b.T)
    rel = np.abs(t1 - ref).max() / np.abs(ref).max()
    assert rel < 1e-6


def test_weighted_gram_t1_triangle_mirror():
    rng = np.random.default_rng(4)
    sizes = [90, 150]
    padded = [-(-s // K_TILE) * K_TILE for s in sizes]
    w = [0.4, 0.6]
    X = _panel(rng, 2 * ROW_TILE, sizes, padded)
    full = np.asarray(weighted_gram_t1(
        jnp.asarray(X), jnp.asarray(X), sizes, padded, w, interpret=True))
    tri = np.asarray(mirror_lower(jnp.asarray(weighted_gram_t1(
        jnp.asarray(X), jnp.asarray(X), sizes, padded, w,
        n_sym=X.shape[0] // ROW_TILE, interpret=True))))
    np.testing.assert_allclose(tri, full, rtol=1e-6, atol=1e-3)


def test_pallas_stats_matches_int8_stats(monkeypatch):
    """The full shifted-stat pipeline agrees with the exact int8 path."""
    # force the interpret path regardless of backend
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    rng = np.random.default_rng(5)
    sizes = (100, 700, 55, 220)
    padded = tuple(-(-s // K_TILE) * K_TILE for s in sizes)
    S = sum(padded)
    Mp = Up = ROW_TILE
    bounds = np.concatenate([[0], np.cumsum(padded)])

    def mk(n):
        G = np.zeros((1, n, S), np.int8)
        for k, s in enumerate(sizes):
            lo = int(bounds[k])
            G[0, :, lo:lo + s] = rng.integers(0, 3, (n, s))
        return jnp.asarray(G)

    Gm, Gu = mk(Mp), mk(Up)
    w = tuple(rng.dirichlet(np.ones(len(sizes))).tolist())
    spec = WindowKernelSpec(pop_sizes=sizes, pop_sizes_padded=padded, wgts=w)
    a = _int8_weighted_stats(Gm, Gu, spec)
    b = _pallas_weighted_stats(Gm, Gu, spec)
    for name, x, y in zip(["big_mm", "big_um", "vu", "S_m", "S_u"], a, b):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        scale = max(np.abs(x).max(), 1.0)
        assert np.abs(x - y).max() / scale < 1e-6, name
