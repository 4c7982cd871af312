"""Pallas TPU kernel: fused per-population weighted Gram matrix.

The hot operation of every *mix analysis (distmix/computeLD/qcatmix/
jepegmix) is the dominant term of the reference's weighted covariance
(CalWgtCov, reference src/util.cpp:103-124) over a window's dosage rows:

    BIG[i, j] = sum_k alpha_k * (m_k * (X_k Y_k^T)[i,j] - Sx_k[i] Sy_k[j])
    alpha_k   = w_k * m_k / (m_k - 1)

where X_k/Y_k are the population-k subject columns and Sx/Sy per-pop
row sums.  This kernel evaluates the heavy first term

    T1[i, j] = sum_k beta_k * (X_k Y_k^T)[i, j],   beta_k = alpha_k m_k

fused over populations:

* the grid walks a caller-chosen list of (row-tile, col-tile) PAIRS --
  B11 is symmetric, so its upper-triangle tiles are simply absent from
  the pair list (~25% of the window's flops skipped) and mirrored by
  the caller;
* K tiles of ``K_TILE`` subject columns are aligned to population
  boundaries (panel segments zero-padded -- padded columns contribute
  exactly 0);
* per-pop cross products accumulate in an int32 VMEM scratch via the
  int8 MXU -- EXACT (|dosage - shift| <= 2 and m_k <= 2^13 keep
  m_k*C < 2^31); at each population's last K tile the int32 block
  folds into an f32 VMEM accumulator scaled by beta_k;
* only the final f32 tile is written to HBM: zero int32 HBM traffic.

The rank-P correction sum_k alpha_k Sx_k Sy_k^T is a tiny [N, P] x
[P, N] f32 matmul the caller evaluates in XLA.  To keep the T1 - T2
subtraction result-scale (no catastrophic cancellation on
low-variance SNPs), callers FIRST shift each dosage row by the
per-(row, population) integer c = round(mean dosage) in {0, 1, 2}:
covariance is invariant under per-row shifts, the shifted identity
m*C' - S'S'^T = m*C - SS^T holds exactly in integers, and both T1'
and T2' shrink to O(result), so f32 rounding stays ~1e-7 of the
result everywhere (ops/window_kernel._pallas_weighted_stats).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# Subject-axis tile; population segments pad to this.  Measured on the
# region kernel (16 windows, 33k subjects, probe4): K=512/R=256 91.9 ms
# beats K=128/R=256 133 ms (smaller DMAs cost more than the ~20% less
# zero padding saves) and K=512/R=512 96.8 ms.  GAUSS_K_TILE /
# GAUSS_ROW_TILE override for tuning experiments.
K_TILE = int(os.environ.get("GAUSS_K_TILE", 512))
ROW_TILE = int(os.environ.get("GAUSS_ROW_TILE", 256))


#: K tiles folded per grid step.  One small (256 x 512 x 256) dot per
#: step leaves the MXU idle behind per-step sequencing overhead
#: (measured 0.77 us/step wall vs 0.15 us of int8 compute); unrolling U
#: k-tiles per step amortizes it and makes the y DMA U-fold larger.
#: With int4 streams the y DMA halves, so deeper unrolls pay: the 43
#: window / 64k-SNP region bench measured U=4 89.7 ms, U=12 80.5 ms,
#: U=21 82.5 ms device-only -> 12.
_K_UNROLL = int(os.environ.get("GAUSS_K_UNROLL", 12))

#: ROW_TILE-tiles per x band block in int4 mode: every output row
#: resident in the x band divides the y re-stream count, and a 2-tile
#: (512-row) int4 band fits the ~16 MiB VMEM (probe7).  MEASURED
#: OUTCOME on the 43-window region bench: xb=2 LOSES (160.7 ms vs
#: 89.7 ms device-only) -- band offsets must align to ROW_TILE*xb, so
#: xb=2 inflates the padded window shapes (Mp 1536 -> 2048) and the
#: O(Mp^2 Up) solves outgrow the Gram's bandwidth saving.  Default 1;
#: the blocked path stays for A/B via GAUSS_X_BLOCK=2.
X_BLOCK = int(os.environ.get("GAUSS_X_BLOCK", 1))


def gram_dtype():
    """Element type for Gram kernel inputs: int4 on real TPUs (exact
    for shifted dosages in [-2, 2]; probe7 verified MXU support),
    int8 on CPU (interpret-mode Pallas and the XLA CPU backend
    reject sub-byte custom element sizes).  GAUSS_GRAM_INT4=0 forces
    int8 everywhere (A/B knob)."""
    if (jax.default_backend() != "cpu"
            and os.environ.get("GAUSS_GRAM_INT4", "1") != "0"):
        return jnp.int4
    return jnp.int8


def x_block_tiles(dtype=None) -> int:
    """ROW_TILE-tiles per x band block for resident-mode callers (the
    band must fit VMEM: int4 affords X_BLOCK tiles, int8 only 1)."""
    if dtype is None:
        dtype = gram_dtype()
    return X_BLOCK if dtype == jnp.int4 else 1


def _make_kernel(U: int, xrows: bool, batched: bool = False):
    """Grid-step body folding ``U`` consecutive K tiles.

    ``xrows``: x_ref holds the full [IB*ROW_TILE, S] band in VMEM, so
    consecutive grid steps with the same x block (pair_tables is
    i-major) never re-fetch it -- the dominant HBM stream drops from
    2 tiles/step to ~1.  Otherwise x_ref is a [IB*ROW_TILE, U*K_TILE]
    block like y_ref.

    ``batched``: a leading window grid dimension is present (the K-step
    axis is the LAST grid dim either way) and the output block carries
    a unit window axis."""

    def kernel(first_ref, last_ref, beta_ref, pi_ref, pj_ref,
               xt_ref, yt_ref, x_ref, y_ref, o_ref, cacc, facc):
        t_dim = 2 if batched else 1
        t = pl.program_id(t_dim)
        nt = pl.num_programs(t_dim)

        @pl.when(t == 0)
        def _():
            facc[:] = jnp.zeros_like(facc)

        for u in range(U):
            k = t * U + u

            @pl.when(first_ref[k] == 1)
            def _():
                cacc[:] = jnp.zeros_like(cacc)

            xk = x_ref[:, pl.ds(k * K_TILE if xrows else u * K_TILE,
                                K_TILE)]
            yk = y_ref[:, pl.ds(u * K_TILE, K_TILE)]
            cacc[:] += jax.lax.dot_general(
                xk, yk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

            @pl.when(last_ref[k] == 1)
            def _():
                facc[:] += beta_ref[k] * cacc[:].astype(jnp.float32)

        @pl.when(t == nt - 1)
        def _():
            if batched:
                o_ref[0] = facc[:]
            else:
                o_ref[:] = facc[:]

    return kernel


#: VMEM budget for the whole-row x band (leave room for y double
#: buffering + accumulators + the output tile)
_XROWS_VMEM_CAP = int(os.environ.get("GAUSS_XROWS_CAP", 12 * 2**20))


def tile_tables(pop_sizes_padded: Sequence[int], pop_sizes: Sequence[int],
                wgts: Sequence[float]
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static per-K-tile lookup tables (first_flag, last_flag, beta)."""
    firsts, lasts, betas = [], [], []
    m = np.asarray(pop_sizes, dtype=np.float64)
    w = np.asarray(wgts, dtype=np.float64)
    beta = (w * m * m / (m - 1.0)).astype(np.float32)   # alpha_k * m_k
    for k, sp in enumerate(pop_sizes_padded):
        if sp % K_TILE:
            raise ValueError(
                f"population segment {k} width {sp} not a multiple of "
                f"{K_TILE}; pad the panel with pad_pop_segments")
        nt = sp // K_TILE
        firsts += [1] + [0] * (nt - 1)
        lasts += [0] * (nt - 1) + [1]
        betas += [float(beta[k])] * nt
    return (np.asarray(firsts, np.int32), np.asarray(lasts, np.int32),
            np.asarray(betas, np.float32))


def pair_tables(n_sym: int, n_rows: int, n_cols: int, ib: int = 1
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Row-block/col tile-pair lists: the first ``n_sym`` row tiles form
    a symmetric block with the cols (skip tiles strictly above the
    diagonal); the remaining row tiles pair with every col tile.
    ``ib`` = ROW_TILE-tiles per x block: ``pi`` entries are x-BLOCK
    indices (block b covers row tiles [ib*b, ib*b + ib)), ``pj`` col
    TILE indices.  A block whose top tile is still inside the
    symmetric region keeps only j <= top tile (its few within-block
    upper-triangle tiles are computed wastefully and fixed by
    mirror_lower); blocks straddling or beyond n_sym pair with every
    col."""
    pi, pj = [], []
    assert n_rows % ib == 0, (n_rows, ib)
    for b in range(n_rows // ib):
        top = ib * b + ib - 1
        for j in range(n_cols):
            if top < n_sym and j > top:
                continue
            pi.append(b)
            pj.append(j)
    return np.asarray(pi, np.int32), np.asarray(pj, np.int32)


def weighted_gram_t1(X: jnp.ndarray, Y: jnp.ndarray,
                     pop_sizes: Sequence[int],
                     pop_sizes_padded: Sequence[int],
                     wgts: Sequence[float],
                     n_sym: int = 0,
                     interpret: bool = False,
                     nx: int = 0, ny: int = 0,
                     x_tile0=None, y_tile0=None,
                     x_block: int = 1) -> jnp.ndarray:
    """T1[NX, NY] f32 = sum_k (alpha_k m_k) * X_k Y_k^T  (fused Pallas).

    X: [NX, S] int8 or int4, Y: [NY, S] same dtype, with
    S = sum(pop_sizes_padded), every population segment zero-padded to
    a K_TILE multiple, NX/NY ROW_TILE multiples.  If ``n_sym`` > 0, the
    leading n_sym*ROW_TILE rows of X are assumed identical to Y's
    leading rows and only the lower-triangle tiles of that block are
    computed (mirror with ``mirror_lower``); the tiles above stay
    uninitialized.

    Region-resident mode: pass ``x_tile0``/``y_tile0`` (traced i32
    scalars, in ROW_TILE units) and output sizes ``nx``/``ny`` to
    compute the Gram of WINDOWS of much larger resident arrays -- the
    kernel streams the [nx, S] x [ny, S] row bands starting at those
    tile offsets straight from HBM.  This is how the windowed engine
    avoids row gathers entirely: windows are contiguous row ranges of
    the bp-sorted measured/unmeasured panels, and gathering rows from a
    (32, 128)-tiled int8 HBM array costs ~10x its bytes (measured), so
    block-offset streaming replaces materialization.

    ``x_block``: ROW_TILE-tiles per resident x band (int4 affords 2 --
    see X_BLOCK); every band row divides the y re-stream traffic, the
    binding roofline.  Requires nx and x_tile0 to be multiples of
    x_block (tiles); callers align with x_block_tiles().

    Batched-window mode: pass ``x_tile0``/``y_tile0`` as [W] int32
    VECTORS -- the grid grows a leading window dimension
    (W, n_pairs, T/U) and the output becomes [W, nx, ny].  One
    pallas_call then computes EVERY window's Gram of a region: this is
    what keeps region compiles linear (no unrolled per-window Python
    loops in the XLA graph, VERDICT r4 item 5) and drops the per-call
    dispatch/sequencing overhead of the scan formulation.
    """
    NX, S = X.shape
    NY = Y.shape[0]
    ib = x_block
    offset_mode = x_tile0 is not None
    batched = offset_mode and np.ndim(x_tile0) == 1
    if offset_mode:
        if not nx or not ny:
            raise ValueError("offset mode needs explicit nx/ny")
        # x offset pre-divided to x-BLOCK units here in XLA: a floor
        # div inside a Mosaic index map hits an infinite _convert_helper
        # recursion in lowering (observed on v5e)
        x_t0 = jnp.asarray(x_tile0, jnp.int32).reshape(-1) // ib
        y_t0 = jnp.asarray(y_tile0, jnp.int32).reshape(-1)
    else:
        nx, ny = NX, NY
        x_t0 = jnp.zeros(1, jnp.int32)
        y_t0 = jnp.zeros(1, jnp.int32)
    if nx % (ROW_TILE * ib) or ny % ROW_TILE:
        raise ValueError(f"row counts ({nx}, {ny}) must be multiples of "
                         f"({ROW_TILE}*{ib}, {ROW_TILE})")
    first, last, beta = tile_tables(pop_sizes_padded, pop_sizes, wgts)
    T = S // K_TILE
    if len(first) != T:
        raise ValueError("pop_sizes_padded does not match subject axis")
    pi, pj = pair_tables(n_sym, nx // ROW_TILE, ny // ROW_TILE, ib=ib)

    elem_bits = 4 if X.dtype == jnp.int4 else 8
    XR = ROW_TILE * ib
    U = max(u for u in range(1, _K_UNROLL + 1) if T % u == 0)
    xrows = XR * S * elem_bits // 8 <= _XROWS_VMEM_CAP
    W = int(x_t0.shape[0]) if batched else 1

    if batched:
        def xmap_rows(w, g, t, f, l, b, pi, pj, xt, yt):
            return (xt[w] + pi[g], t * 0)

        def xmap_blk(w, g, t, f, l, b, pi, pj, xt, yt):
            return (xt[w] + pi[g], t)

        def ymap(w, g, t, f, l, b, pi, pj, xt, yt):
            return (yt[w] + pj[g], t)

        def omap(w, g, t, f, l, b, pi, pj, xt, yt):
            return (w, pi[g], pj[g])
        grid = (W, len(pi), T // U)
        out_shape = (W, nx, ny)
        out_block = (1, XR, ROW_TILE)
    else:
        def xmap_rows(g, t, f, l, b, pi, pj, xt, yt):
            return (xt[0] + pi[g], t * 0)

        def xmap_blk(g, t, f, l, b, pi, pj, xt, yt):
            return (xt[0] + pi[g], t)

        def ymap(g, t, f, l, b, pi, pj, xt, yt):
            return (yt[0] + pj[g], t)

        def omap(g, t, f, l, b, pi, pj, xt, yt):
            return (pi[g], pj[g])
        grid = (len(pi), T // U)
        out_shape = (nx, ny)
        out_block = (XR, ROW_TILE)

    if xrows:
        # second block index must stay i32 (a literal 0 traces as i64
        # under x64 and Mosaic rejects the mixed-type index map).
        # buffer_count=1: the band changes only once per ~T/U steps, so
        # double-buffering it would double the dominant VMEM cost for
        # an overlap that almost never fires.
        x_spec = pl.BlockSpec((XR, S), xmap_rows,
                              pipeline_mode=pl.Buffered(buffer_count=1),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((XR, U * K_TILE), xmap_blk,
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=grid,
        in_specs=[
            x_spec,
            pl.BlockSpec((ROW_TILE, U * K_TILE), ymap,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(out_block, omap,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((XR, ROW_TILE), jnp.int32),
            pltpu.VMEM((XR, ROW_TILE), jnp.float32),
        ],
    )
    kwargs = {}
    try:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid))
    except Exception:  # hint only; param surface varies across versions
        pass
    return pl.pallas_call(
        _make_kernel(U, xrows, batched=batched),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * W * len(pi) * XR * ROW_TILE * S,
            bytes_accessed=W * ((nx * S + ny * S) * elem_bits // 8
                                + 4 * nx * ny),
            transcendentals=0),
        interpret=interpret,
        **kwargs,
    )(first, last, beta, pi, pj, x_t0, y_t0, X, Y)


def mirror_lower(A: jnp.ndarray) -> jnp.ndarray:
    """Symmetrize a matrix whose strict upper triangle is garbage
    (batched over any leading dims)."""
    lo = jnp.tril(A)
    return lo + jnp.swapaxes(jnp.tril(A, -1), -1, -2)


def weighted_gram_reference(X, Y, pop_sizes, pop_sizes_padded, wgts):
    """Numpy float64 oracle of the full BIG term (tests)."""
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    m = np.asarray(pop_sizes, dtype=np.float64)
    w = np.asarray(wgts, dtype=np.float64)
    bounds = np.concatenate([[0], np.cumsum(pop_sizes_padded)])
    out = np.zeros((X.shape[0], Y.shape[0]))
    for k in range(len(pop_sizes)):
        a = X[:, int(bounds[k]):int(bounds[k + 1])]
        b = Y[:, int(bounds[k]):int(bounds[k + 1])]
        d = m[k] * (a @ b.T) - np.outer(a.sum(1), b.sum(1))
        out += (w[k] * m[k] / (m[k] - 1.0)) * d
    return out
