"""Gene-batched correlation kernels for JEPEG/JEPEGMIX.

Genes are independent small problems (reference loops genes serially,
src/jepeg.cpp:114-131).  Here genes are padded into buckets and their
SNP x SNP correlation matrices are computed as one batched MXU matmul
per bucket: [B, n, S] x [B, S, n] -> [B, n, n], with the same exact-f32
sufficient statistics + f64 combines as the windowed kernels.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import stats


@partial(jax.jit, static_argnames=("pop_sizes",))
def _batched_pooled_corr(Gb, pop_sizes):
    """Gb: [B, n, S] -> pooled correlation [B, n, n] float64."""
    g = Gb.astype(jnp.float32)
    C = jnp.einsum("bns,bms->bnm", g, g,
                   preferred_element_type=jnp.float32)
    S = jnp.sum(g, axis=2)
    Q = jnp.sum(g * g, axis=2)
    n = float(sum(pop_sizes))
    s64 = S.astype(jnp.float64)
    q64 = Q.astype(jnp.float64)
    numer = n * C.astype(jnp.float64) - s64[:, :, None] * s64[:, None, :]
    d = jnp.sqrt(n * q64 - s64 * s64)
    return numer / (d[:, :, None] * d[:, None, :])


@partial(jax.jit, static_argnames=("pop_sizes", "wgts"))
def _batched_weighted_corr(Gb, pop_sizes, wgts):
    """Gb: [B, n, S] -> CalWgtCov-based correlation [B, n, n] float64
    (diagonal = 1 up to rounding; caller overwrites it)."""
    bounds = stats.segment_bounds(pop_sizes)
    m = np.asarray(pop_sizes, dtype=np.float64)
    w = np.asarray(wgts, dtype=np.float64)
    factor = m / (m - 1.0)
    B, n, _ = Gb.shape
    cov = jnp.zeros((B, n, n), dtype=jnp.float64)
    mimj = jnp.zeros((B, n, n), dtype=jnp.float64)
    mi = jnp.zeros((B, n), dtype=jnp.float64)
    var = jnp.zeros((B, n), dtype=jnp.float64)
    vmimj = jnp.zeros((B, n), dtype=jnp.float64)
    vmi = jnp.zeros((B, n), dtype=jnp.float64)
    for k in range(len(m)):
        g = Gb[:, :, int(bounds[k]):int(bounds[k + 1])].astype(jnp.float32)
        Ck = jnp.einsum("bns,bms->bnm", g, g,
                        preferred_element_type=jnp.float32).astype(jnp.float64)
        s = jnp.sum(g, axis=2).astype(jnp.float64)
        q = jnp.sum(g * g, axis=2).astype(jnp.float64)
        cov = cov + (w[k] * factor[k]) * (m[k] * Ck - s[:, :, None] * s[:, None, :])
        mimj = mimj + (w[k] * (s / m[k]))[:, :, None] * (s / m[k])[:, None, :]
        mi = mi + w[k] * (s / m[k])
        var = var + (w[k] * factor[k]) * (m[k] * q - s * s)
        vmimj = vmimj + (w[k] * (s / m[k])) * (s / m[k])
        vmi = vmi + w[k] * (s / m[k])
    cov = (cov + mimj) - mi[:, :, None] * mi[:, None, :]
    v = (var + vmimj) - vmi * vmi
    std = jnp.sqrt(v)
    return cov / (std[:, :, None] * std[:, None, :])


@partial(jax.jit, static_argnames=("pop_sizes",))
def _gather_pooled_corr(G_dev, idx, pop_sizes):
    """Gather gene rows from the HBM-resident panel, then pooled corr.
    Padded idx entries gather row 0; their correlations are sliced off
    by the caller (pairwise statistics of real rows are unaffected)."""
    return _batched_pooled_corr(jnp.take(G_dev, idx, axis=0), pop_sizes)


@partial(jax.jit, static_argnames=("pop_sizes", "wgts"))
def _gather_weighted_corr(G_dev, idx, pop_sizes, wgts):
    return _batched_weighted_corr(jnp.take(G_dev, idx, axis=0),
                                  pop_sizes, wgts)


def _bucket(n: int, minimum: int = 8) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def gene_corr_matrices(
    gene_G: List[np.ndarray],
    pop_sizes: Sequence[int],
    wgts: Optional[Sequence[float]] = None,
    max_batch_elems: int = 1 << 26,
) -> List[np.ndarray]:
    """Correlation matrix per gene, batched by padded size bucket.

    gene_G: list of [n_g, S] int8 blocks.  Returns float64 [n_g, n_g]
    matrices in the same order.  wgts=None -> pooled CalCor (jepeg);
    otherwise CalWgtCov-based (jepegmix).
    """
    S = gene_G[0].shape[1] if gene_G else 0
    sizes_key = tuple(int(x) for x in pop_sizes)
    wgts_key = tuple(float(x) for x in wgts) if wgts is not None else None
    order = np.argsort([g.shape[0] for g in gene_G], kind="stable")
    out: List[Optional[np.ndarray]] = [None] * len(gene_G)

    i = 0
    while i < len(order):
        npad = _bucket(gene_G[order[i]].shape[0])
        batch_idx = []
        while (i < len(order)
               and _bucket(gene_G[order[i]].shape[0]) == npad
               and (len(batch_idx) + 1) * npad * S <= max_batch_elems):
            batch_idx.append(order[i])
            i += 1
        Gb = np.zeros((len(batch_idx), npad, S), dtype=np.int8)
        for bi, gi in enumerate(batch_idx):
            Gb[bi, :gene_G[gi].shape[0]] = gene_G[gi]
        if wgts_key is None:
            R = np.asarray(_batched_pooled_corr(jnp.asarray(Gb), sizes_key))
        else:
            R = np.asarray(_batched_weighted_corr(jnp.asarray(Gb),
                                                  sizes_key, wgts_key))
        for bi, gi in enumerate(batch_idx):
            n = gene_G[gi].shape[0]
            out[gi] = R[bi, :n, :n]
    return out


def gene_corr_resident(
    G_dev,
    gene_idx: List[np.ndarray],
    pop_sizes: Sequence[int],
    wgts: Optional[Sequence[float]] = None,
    max_batch_elems: int = 1 << 26,
) -> List[np.ndarray]:
    """Correlation matrix per gene, gathered on-device from the
    HBM-resident panel (the decode-once design of SURVEY.md section 7;
    replaces the reference's per-call panel reload,
    src/jepegmix.cpp:65-91).

    G_dev: [R, S] int8 device array (selected-population subject
    columns).  gene_idx: one int row-id vector per gene.  Genes are
    padded into power-of-two buckets and each bucket runs as ONE
    dispatch: gather + batched MXU Gram + f64 combine.  Returns float64
    [n_g, n_g] matrices in input order.
    """
    sizes_key = tuple(int(x) for x in pop_sizes)
    wgts_key = tuple(float(x) for x in wgts) if wgts is not None else None
    S = int(G_dev.shape[1])
    order = np.argsort([len(g) for g in gene_idx], kind="stable")
    out: List[Optional[np.ndarray]] = [None] * len(gene_idx)

    i = 0
    while i < len(order):
        npad = _bucket(len(gene_idx[order[i]]))
        batch = []
        while (i < len(order)
               and _bucket(len(gene_idx[order[i]])) == npad
               and (len(batch) + 1) * npad * S <= max_batch_elems):
            batch.append(order[i])
            i += 1
        idx = np.zeros((len(batch), npad), dtype=np.int32)
        for bi, gi in enumerate(batch):
            idx[bi, :len(gene_idx[gi])] = gene_idx[gi]
        if wgts_key is None:
            R = np.asarray(_gather_pooled_corr(G_dev, jnp.asarray(idx),
                                               sizes_key))
        else:
            R = np.asarray(_gather_weighted_corr(G_dev, jnp.asarray(idx),
                                                 sizes_key, wgts_key))
        for bi, gi in enumerate(batch):
            n = len(gene_idx[gi])
            out[gi] = R[bi, :n, :n]
    return out
