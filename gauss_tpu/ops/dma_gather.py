"""Pallas TPU kernel: row gather via explicit per-row DMA.

The windowed engine materializes each window's dosage rows by gathering
them from the HBM-resident panel (reference analog: the per-SNP
bgzf_seek row loads of ReadGenotype, /root/reference/src/gauss.cpp:720-785,
replaced here by HBM row copies).  XLA lowers `jnp.take` of panel rows
to a generic gather that runs far below HBM bandwidth for wide int8
rows (measured ~25 GB/s for [*, 43008] int8 rows on v5e, ~8% of peak).

This kernel instead issues one async DMA per row -- each row is a
contiguous 10-100 KB HBM->HBM copy, which the DMA engines run at
near-bandwidth -- with `ROWS_IN_FLIGHT` copies outstanding.  Both the
panel and the output stay in HBM (`memory_space=ANY`); no VMEM is
touched, so it composes with any downstream consumer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_STEP = 128      # rows gathered per grid step (DMAs in flight)


def _gather_kernel(S, Rc, C, idx_ref, *refs):
    # Operates on FLAT [Rc*S] views: HBM int8 memrefs carry an (8, 128)
    # tiling, so 2-D row slices g[row] are rejected by Mosaic ("slice
    # shape along dimension 0 must be aligned to tiling"); 1-D slices
    # only need 128-lane alignment, which S % 128 == 0 guarantees.
    # Indices must stay i32 for Mosaic's memref slicing (x64 mode would
    # otherwise promote the Python loop constants to i64) -- which caps
    # one flat view at 2^31 elements, so panels larger than that are
    # passed as C row-chunk views and each row's DMA picks its chunk
    # under pl.when (exactly one fires; offsets within a chunk fit i32).
    g_refs, o_ref, sems = refs[:C], refs[C], refs[C + 1]
    i = pl.program_id(0)
    base = jnp.int32(i) * jnp.int32(ROWS_PER_STEP)
    S = jnp.int32(S)
    Rc = jnp.int32(Rc)

    def issue(r, start):
        r = jnp.int32(r)
        row = idx_ref[base + r]
        for c in range(C):
            local = row - jnp.int32(c) * Rc

            def go(local=local, c=c):
                cp = pltpu.make_async_copy(
                    g_refs[c].at[pl.ds(local * S, S)],
                    o_ref.at[pl.ds((base + r) * S, S)],
                    sems.at[r])
                cp.start() if start else cp.wait()

            if C == 1:
                go()
            else:
                pl.when((local >= 0) & (local < Rc))(go)

    for r in range(ROWS_PER_STEP):
        issue(r, True)
    for r in range(ROWS_PER_STEP):
        issue(r, False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(G, idx, interpret: bool = False):
    """out[i] = G[idx[i]] for int8 G [R, S], idx [N] int32.  N pads up
    to a ROWS_PER_STEP multiple internally (row 0 re-gathered).

    Mosaic memref slicing is i32, capping one flat view at 2^31
    elements: larger panels (e.g. the 64k x 43008 bench region,
    2.75e9 bytes) are passed as C row-chunk slices and each row DMA
    selects its chunk in-kernel (see _gather_kernel).  The chunk
    slices are materialized per call -- one extra panel-sized HBM copy
    -- which only matters on the one-time prepare path; gathers whose
    OUTPUT would itself exceed a 2^31-element flat view fall back to
    jnp.take.
    """
    R, S = G.shape
    # flat int8 HBM memrefs carry a (1024) tile: both the slice offset
    # (row * S) and length (S) must be 1024-aligned for the row DMAs
    if interpret or jax.default_backend() == "cpu" or S % 1024:
        return jnp.take(G, idx, axis=0)
    N = idx.shape[0]
    Np = -(-N // ROWS_PER_STEP) * ROWS_PER_STEP
    if Np * S >= 2**31:
        return jnp.take(G, idx, axis=0)
    idx_p = (idx if Np == N else
             jnp.concatenate([idx, jnp.zeros(Np - N, idx.dtype)]))
    # row chunks: each flat view < 2^31 elements, 1024-aligned rows
    Rc = min(R, (2**31 - 1) // S)
    C = -(-R // Rc)
    chunks = tuple(G[c * Rc:(c + 1) * Rc].reshape(-1) for c in range(C))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Np // ROWS_PER_STEP,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * C,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((ROWS_PER_STEP,))],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, S, Rc, C),
        out_shape=jax.ShapeDtypeStruct((Np * S,), G.dtype),
        grid_spec=grid_spec,
    )(idx_p.astype(jnp.int32), *chunks)
    out = out.reshape(Np, S)
    return out if Np == N else out[:N]


def take_rows(G, idx):
    """jnp.take(G, idx, axis=0) for any idx shape, routed through the
    DMA gather on TPU backends (XLA's generic row gather runs ~8% of
    HBM bandwidth on wide int8 rows; per-row DMAs run near peak)."""
    flat = idx.reshape(-1)
    out = gather_rows(G, flat)
    return out.reshape(idx.shape + (G.shape[1],))
