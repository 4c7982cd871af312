"""Fully-fused batched window kernels for dist/distmix imputation.

This is the device fast path: a batch of fixed-shape (padded + masked)
windows runs stats -> combine -> posdef-inverse -> imputation entirely
on the accelerator in one jit.  The host-orchestrated API in
models/dist.py is the float64 parity path; this kernel trades the last
~1e-5 of agreement (float32 eigh/inverse) for zero host round-trips,
and is what the genome-scale engine, the multi-chip shard_map wrapper
(gauss_tpu/parallel) and the benchmark drive.

Masking contract (all padding is EXACT, not approximate):
* subject padding: zero dosage columns contribute exactly 0 to every
  sufficient statistic (S = sum g, Q = sum g^2, C = sum g_i g_j), and
  population sizes m_k always use the TRUE subject counts -> padded
  subjects change nothing.
* SNP padding: masked measured rows get identity rows/cols in B11 and
  zero Z1 entries; masked unmeasured rows emit garbage that callers
  drop via the mask.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import stats


@dataclasses.dataclass(frozen=True)
class WindowKernelSpec:
    """Static configuration of a compiled window kernel."""

    pop_sizes: Tuple[int, ...]        # TRUE per-pop subject counts
    pop_sizes_padded: Tuple[int, ...]  # per-pop padded segment widths
    wgts: Optional[Tuple[float, ...]]  # None -> unweighted (dist)
    lam: float = 0.1
    min_abs_eig: float = 1e-5
    exact: bool = True                # f64 combines (TPU: emulated ew ops)

    @property
    def bounds(self) -> np.ndarray:
        return stats.segment_bounds(self.pop_sizes_padded)


def pad_pop_segments(G: np.ndarray, pop_sizes: Sequence[int],
                     multiple: int = 1) -> Tuple[np.ndarray, Tuple[int, ...]]:
    """Zero-pad each population segment of the subject axis to a multiple
    (for subject-shard divisibility).  Returns (padded G, padded sizes)."""
    bounds = stats.segment_bounds(pop_sizes)
    segs, padded = [], []
    for k in range(len(pop_sizes)):
        seg = G[..., int(bounds[k]):int(bounds[k + 1])]
        m = seg.shape[-1]
        mp = -(-m // multiple) * multiple
        if mp != m:
            pad = [(0, 0)] * (seg.ndim - 1) + [(0, mp - m)]
            seg = np.pad(seg, pad)
        segs.append(seg)
        padded.append(mp)
    return np.concatenate(segs, axis=-1), tuple(padded)


# ---------------------------------------------------------------------------
# batched statistics
# ---------------------------------------------------------------------------

def _batched_pop_stats(Ga, Gb, spec: WindowKernelSpec, axis_name=None):
    """Per-pop batched cross products and row stats.

    Ga: [W, Na, S], Gb: [W, Nb, S] (S possibly a local shard).
    Returns (C [P, W, Na, Nb], Sa [P, W, Na], Sb, Qa, Qb) f32 exact,
    psum-reduced over ``axis_name`` when set.
    """
    bounds = spec.bounds
    P = len(spec.pop_sizes)
    Cs, Sas, Sbs, Qas, Qbs = [], [], [], [], []
    for k in range(P):
        ga = Ga[..., int(bounds[k]):int(bounds[k + 1])].astype(jnp.float32)
        gb = Gb[..., int(bounds[k]):int(bounds[k + 1])].astype(jnp.float32)
        Cs.append(jnp.einsum("wns,wms->wnm", ga, gb,
                             preferred_element_type=jnp.float32))
        Sas.append(jnp.sum(ga, axis=2))
        Sbs.append(jnp.sum(gb, axis=2))
        Qas.append(jnp.sum(ga * ga, axis=2))
        Qbs.append(jnp.sum(gb * gb, axis=2))
    out = (jnp.stack(Cs), jnp.stack(Sas), jnp.stack(Sbs),
           jnp.stack(Qas), jnp.stack(Qbs))
    if axis_name is not None:
        out = tuple(jax.lax.psum(o, axis_name) for o in out)
    return out


def _combine_weighted(C, Sa, Sb, Qa, Qb, spec: WindowKernelSpec):
    """CalWgtCov-based correlation blocks from per-pop stats.

    Returns (corr [W, Na, Nb], var_a [W, Na], var_b [W, Nb]) in the
    combine dtype (f64 exact / f32 fast-centered).
    """
    m = np.asarray(spec.pop_sizes, dtype=np.float64)
    w = np.asarray(spec.wgts, dtype=np.float64)
    factor = m / (m - 1.0)
    dt = jnp.float64 if spec.exact else jnp.float32
    P = len(m)
    W_, Na, Nb = C.shape[1], C.shape[2], C.shape[3]
    cov = jnp.zeros((W_, Na, Nb), dtype=dt)
    mimj = jnp.zeros((W_, Na, Nb), dtype=dt)
    mi = jnp.zeros((W_, Na), dtype=dt)
    mj = jnp.zeros((W_, Nb), dtype=dt)
    va = jnp.zeros((W_, Na), dtype=dt)
    vai = jnp.zeros((W_, Na), dtype=dt)
    vb = jnp.zeros((W_, Nb), dtype=dt)
    vbi = jnp.zeros((W_, Nb), dtype=dt)
    for k in range(P):
        sa = Sa[k].astype(dt)
        sb = Sb[k].astype(dt)
        qa = Qa[k].astype(dt)
        qb = Qb[k].astype(dt)
        Ck = C[k].astype(dt)
        wf = w[k] * factor[k]
        cov = cov + wf * (m[k] * Ck - sa[:, :, None] * sb[:, None, :])
        mimj = mimj + (w[k] * (sa / m[k]))[:, :, None] * (sb / m[k])[:, None, :]
        mi = mi + w[k] * (sa / m[k])
        mj = mj + w[k] * (sb / m[k])
        va = va + wf * (m[k] * qa - sa * sa)
        vai = vai + (w[k] * (sa / m[k])) * (sa / m[k])
        vb = vb + wf * (m[k] * qb - sb * sb)
        vbi = vbi + (w[k] * (sb / m[k])) * (sb / m[k])
    cov = (cov + mimj) - mi[:, :, None] * mj[:, None, :]
    var_a = (va + vai) - (mi * mi)
    var_b = (vb + vbi) - (mj * mj)
    return cov, var_a, var_b


def _combine_pooled(C, Sa, Sb, Qa, Qb, spec: WindowKernelSpec):
    """Unweighted pooled CalCor blocks (dist)."""
    dt = jnp.float64 if spec.exact else jnp.float32
    n = float(sum(spec.pop_sizes))
    sa = jnp.sum(Sa, axis=0).astype(dt)
    sb = jnp.sum(Sb, axis=0).astype(dt)
    qa = jnp.sum(Qa, axis=0).astype(dt)
    qb = jnp.sum(Qb, axis=0).astype(dt)
    Cp = jnp.sum(C, axis=0).astype(dt)
    numer = n * Cp - sa[:, :, None] * sb[:, None, :]
    var_a = n * qa - sa * sa
    var_b = n * qb - sb * sb
    return numer, var_a, var_b  # note: scaled cov; corr divides the stds out


def window_impute(Gm, Gu, Z1, m_mask, u_mask, spec: WindowKernelSpec,
                  axis_name: Optional[str] = None):
    """Batched dist/distmix imputation.

    Gm: [W, Mp, S] int8, Gu: [W, Up, S] int8, Z1: [W, Mp] f64/f32,
    masks: [W, Mp]/[W, Up] (1 = real SNP).  Returns (z [W, Up],
    info [W, Up]) in f32, garbage where u_mask == 0.
    """
    C_mm, S_m, S_m2, Q_m, _ = _batched_pop_stats(Gm, Gm, spec, axis_name)
    C_um, S_u, _, Q_u, _ = _batched_pop_stats(Gu, Gm, spec, axis_name)

    if spec.wgts is not None:
        cov_mm, var_m, _ = _combine_weighted(C_mm, S_m, S_m, Q_m, Q_m, spec)
        cov_um, var_u, _ = _combine_weighted(C_um, S_u, S_m, Q_u, Q_m, spec)
    else:
        cov_mm, var_m, _ = _combine_pooled(C_mm, S_m, S_m, Q_m, Q_m, spec)
        cov_um, var_u, _ = _combine_pooled(C_um, S_u, S_m, Q_u, Q_m, spec)

    dt = cov_mm.dtype
    # stds; padded rows have zero variance -> force 1 to stay finite
    std_m = jnp.sqrt(jnp.where(m_mask > 0, var_m.astype(dt), 1.0))
    std_u = jnp.sqrt(jnp.where(u_mask > 0, var_u.astype(dt), 1.0))
    B11 = cov_mm / (std_m[:, :, None] * std_m[:, None, :])
    B21 = cov_um / (std_u[:, :, None] * std_m[:, None, :])

    # mask: identity rows/cols for padded measured SNPs, ridge diagonal
    mm = (m_mask[:, :, None] * m_mask[:, None, :]).astype(dt)
    B11 = B11 * mm
    eye = jnp.eye(B11.shape[1], dtype=dt)
    B11 = B11 * (1.0 - eye) + (1.0 + spec.lam) * eye
    B21 = B21 * (u_mask[:, :, None] * m_mask[:, None, :]).astype(dt)

    # linear algebra in f32 on device (parity path does f64 on host)
    B11f = B11.astype(jnp.float32)
    B21f = B21.astype(jnp.float32)
    w_eig, v = jnp.linalg.eigh(B11f)
    w_clip = jnp.maximum(w_eig, spec.min_abs_eig)
    # MakePosDef + inverse fused through the same eigendecomposition
    B11inv = jnp.einsum("wik,wk,wjk->wij", v, 1.0 / w_clip, v,
                        preferred_element_type=jnp.float32)
    A = jnp.einsum("wum,wmn->wun", B21f, B11inv,
                   preferred_element_type=jnp.float32)
    z2 = jnp.einsum("wum,wm->wu", A, Z1.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    info = jnp.abs(jnp.einsum("wum,wum->wu", A, B21f,
                              preferred_element_type=jnp.float32))
    z = z2 / jnp.sqrt(info)
    return z, info


def build_window_kernel(spec: WindowKernelSpec, axis_name=None):
    """Return a jitted (Gm, Gu, Z1, m_mask, u_mask) -> (z, info) kernel."""
    fn = partial(window_impute, spec=spec, axis_name=axis_name)
    return jax.jit(fn) if axis_name is None else fn
