"""Probe #7: (a) does int4 dot_general work on this TPU (XLA + Pallas)?
(b) how big can a VMEM-resident Pallas block really be (v5e VMEM size)?

Measured 2026-08-20 (v5e over axon tunnel):
  * XLA int4 dot: OK (exact)       * Pallas int4 dot: OK (exact)
  * VMEM int8 block [384, 43008] = 15.8 MiB: OK; [512, 43008] = 21 MiB
    FAILS -> usable VMEM for a resident band is ~16 MiB.
  => int4 X-band [512+, S] fits; this enables the multi-row-tile
     x-blocking in ops/pallas_gram.py.

NOTE: .astype(jnp.int4) must happen INSIDE jit -- eager int4 conversion
over the axon transport hits a RecursionError in jit dispatch.

Run alone (never concurrently with another TPU process)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    a8 = rng.integers(-2, 3, size=(256, 2048), dtype=np.int8)
    b8 = rng.integers(-2, 3, size=(256, 2048), dtype=np.int8)
    want = a8.astype(np.int64) @ b8.astype(np.int64).T

    f = jax.jit(lambda x, y: jax.lax.dot_general(
        x.astype(jnp.int4), y.astype(jnp.int4), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32))
    log("XLA int4 dot ok =",
        np.array_equal(np.asarray(f(a8, b8)).astype(np.int64), want))

    def pk(x_ref, y_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], y_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    @jax.jit
    def g(x, y):
        return pl.pallas_call(
            pk, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x.astype(jnp.int4), y.astype(jnp.int4))
    log("Pallas int4 dot ok =",
        np.array_equal(np.asarray(g(a8, b8)).astype(np.int64), want))

    S = 43008
    for dt, Rs in (("int8", (256, 384, 512)), ("int4", (512, 768, 1024))):
        for R in Rs:
            x = rng.integers(0, 3, size=(R, S), dtype=np.int8)
            mib = R * S / 2**20 / (2 if dt == "int4" else 1)

            def ck(x_ref, o_ref):
                s = jnp.sum(x_ref[:].astype(jnp.int32), axis=1,
                            keepdims=True)
                o_ref[:] = jnp.broadcast_to(s, (s.shape[0], 128))

            try:
                @jax.jit
                def h(x):
                    xx = x.astype(jnp.int4) if dt == "int4" else x
                    return pl.pallas_call(
                        ck,
                        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                    )(xx)
                np.asarray(jnp.sum(h(x)))
                log(f"VMEM {dt} block [{R},{S}] = {mib:.1f} MiB: OK")
            except Exception as e:
                log(f"VMEM {dt} block [{R},{S}] = {mib:.1f} MiB: FAILED",
                    type(e).__name__, str(e)[:120])
                break


if __name__ == "__main__":
    main()
