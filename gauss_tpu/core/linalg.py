"""Dense linear-algebra layer.

Replaces the reference's Eigen wrappers (reference: src/util.cpp:243-388)
with numpy (float64 host path, LAPACK -- numerically equivalent to
Eigen's SelfAdjointEigenSolver / LLT / fullPivLu to rounding) and jnp
(device path for the jitted fast kernels).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host (numpy, float64) -- parity path
# ---------------------------------------------------------------------------

def make_pos_def(a: np.ndarray, min_abs_eig: float) -> np.ndarray:
    """Clip eigenvalues below ``min_abs_eig`` and reconstruct
    (reference: MakePosDef, src/util.cpp:302-318).  Reconstruction only
    happens when the smallest eigenvalue is below the threshold."""
    w, v = np.linalg.eigh(a)
    if w.min() >= min_abs_eig:
        return a
    w = np.maximum(w, min_abs_eig)
    return (v * w) @ v.T


def inv_mat(a: np.ndarray) -> np.ndarray:
    """Matrix inverse (reference uses Eigen fullPivLu: src/util.cpp:298-300)."""
    return np.linalg.inv(a)


def cholesky_lower(a: np.ndarray) -> np.ndarray:
    """Lower-triangular Cholesky factor (reference: CholeskyMat,
    src/util.cpp:271-274)."""
    return np.linalg.cholesky(a)


def count_pc(a: np.ndarray, eig_cutoff: float) -> int:
    """Count eigenvalues >= cutoff (reference: CountPC,
    src/util.cpp:355-388 -- returns size minus #(< cutoff))."""
    w = np.linalg.eigvalsh(a)
    return int(np.sum(~(w < eig_cutoff)))


def rmv_pc(a: np.ndarray, eig_cutoff: float) -> Tuple[np.ndarray, int]:
    """Zero out principal components with eigenvalue <= cutoff
    (reference: RmvPC, src/util.cpp:320-353; keeps components strictly
    above the cutoff).  Returns (matrix, num_kept)."""
    w, v = np.linalg.eigh(a)
    size = a.shape[0]
    if w[0] >= eig_cutoff:
        return a, size
    keep = w > eig_cutoff
    res = (v[:, keep] * w[keep]) @ v[:, keep].T
    return res, int(keep.sum())


def cov_to_cor(cov: np.ndarray) -> np.ndarray:
    """Covariance -> correlation (reference: CnvrtCovToCor,
    src/util.cpp:284-296)."""
    std = np.sqrt(np.diag(cov))
    return cov / np.outer(std, std)


def cal_cov_mat(m: np.ndarray) -> np.ndarray:
    """Column-pairwise covariance with n-1 denominator (reference:
    CalCovMat/CalCov, src/util.cpp:205-253)."""
    n = m.shape[0]
    d = m - m.mean(axis=0, keepdims=True)
    return (d.T @ d) / (n - 1)


def cal_cor_mat(m: np.ndarray) -> np.ndarray:
    """Column-pairwise Pearson correlation (reference: CalCorMat/CalCor,
    src/util.cpp:194-241)."""
    d = m - m.mean(axis=0, keepdims=True)
    ss = np.sqrt((d * d).sum(axis=0))
    return (d.T @ d) / np.outer(ss, ss)


def cal_cor_vec(x: np.ndarray, y: np.ndarray) -> float:
    """Pearson correlation of two vectors (reference: CalCor(Eigen
    vectors), src/util.cpp:194-203)."""
    dx = x - x.mean()
    dy = y - y.mean()
    return float((dx * dy).sum() / np.sqrt((dx * dx).sum() * (dy * dy).sum()))


# ---------------------------------------------------------------------------
# Device (jnp) -- jitted fast path; dtype follows the input.
# ---------------------------------------------------------------------------

def jx_make_pos_def(a: jnp.ndarray, min_abs_eig: float) -> jnp.ndarray:
    w, v = jnp.linalg.eigh(a)
    clipped = jnp.maximum(w, min_abs_eig)
    recon = (v * clipped) @ v.T
    return jnp.where(w.min() >= min_abs_eig, a, recon)


def jx_make_pos_def_inv(a: jnp.ndarray, min_abs_eig: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device fused MakePosDef + inverse via the same eigendecomposition.

    Returns (clipped matrix, inverse of clipped matrix).  Using the eigen
    factorization for the inverse avoids a second factorization; the
    difference vs LU inversion of the reconstructed matrix is pure
    rounding (validated in tests against the host path).
    """
    w, v = jnp.linalg.eigh(a)
    clipped = jnp.maximum(w, min_abs_eig)
    recon = (v * clipped) @ v.T
    out = jnp.where(w.min() >= min_abs_eig, a, recon)
    inv = (v * (1.0 / clipped)) @ v.T
    return out, inv


def jx_count_pc(a: jnp.ndarray, eig_cutoff: float) -> jnp.ndarray:
    w = jnp.linalg.eigvalsh(a)
    return jnp.sum(~(w < eig_cutoff)).astype(jnp.int32)
