#!/usr/bin/env python
"""Perf probe #5: raw achievable HBM bandwidth on this chip (is the
~140 GB/s the Gram achieves the practical ceiling or is there
headroom?)."""
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

    rng = np.random.default_rng(0)
    sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def timeit(name, f, *args, gb=0.0, reps=3):
        out = f(*args)
        float(sync(out)) if not isinstance(out, tuple) else None
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = f(*args)
            float(sync(out))
            ts.append(time.time() - t0)
        t = sorted(ts)[len(ts) // 2]
        log(f"{name}: {t*1e3:8.1f} ms -> {gb/t:6.0f} GB/s")

    # 1 GB int8 elementwise: read 1 GB + write 1 GB
    X8 = jnp.asarray(rng.integers(0, 3, size=(25000, 43008), dtype=np.int8))
    timeit("int8 x+1 (2 GB)   ", jax.jit(lambda x: x + 1), X8, gb=2.15)

    # f32 elementwise: 1 GB read + 1 GB write
    Xf = jnp.asarray(rng.standard_normal((8192, 32768)).astype(np.float32))
    timeit("f32 x*2 (2.1 GB)  ", jax.jit(lambda x: x * 2.0), Xf, gb=2.15)

    # f32 reduce: 1 GB read only
    timeit("f32 sum (1.1 GB)  ", jax.jit(lambda x: jnp.sum(x, axis=1)),
           Xf, gb=1.07)

    # int8 reduce: 1 GB read only
    timeit("int8 sum (1.1 GB) ",
           jax.jit(lambda x: jnp.sum(x.astype(jnp.int32), axis=1)),
           X8, gb=1.07)

    # big bf16 matmul: MXU peak check (197 TFLOP/s bf16 on v5e)
    A = jnp.asarray(rng.standard_normal((8192, 8192)).astype(jnp.bfloat16))
    mm = jax.jit(lambda a: a @ a)
    out = mm(A)
    float(sync(out))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(sync(mm(A)))
        ts.append(time.time() - t0)
    t = sorted(ts)[1]
    log(f"bf16 8k^3 matmul  : {t*1e3:8.1f} ms -> "
        f"{2*8192**3/t/1e12:6.1f} TFLOP/s")

    # int8 big matmul via dot_general
    B8 = jnp.asarray(rng.integers(-2, 3, size=(8192, 8192), dtype=np.int8))
    dg = jax.jit(lambda a: jax.lax.dot_general(
        a, a, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32))
    out = dg(B8)
    float(sync(out))
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(sync(dg(B8)))
        ts.append(time.time() - t0)
    t = sorted(ts)[1]
    log(f"int8 8k^3 matmul  : {t*1e3:8.1f} ms -> "
        f"{2*8192**3/t/1e12:6.1f} TOPS")


if __name__ == "__main__":
    main()
