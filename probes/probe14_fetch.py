#!/usr/bin/env python
"""Perf probe #14: tunnel fetch-rate shapes.

The LD metric is device->host transfer bound (~30 MB of packed
triangles per 43-window region).  Measures effective fetch rate for:
  a) one [W, L] int16 array in a single np.asarray
  b) per-row slices fetched sequentially
  c) per-row slices fetched by a 4-thread pool
  d) per-row slices fetched by an 8-thread pool
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import gauss_tpu  # noqa: F401

    W, L = 43, 688128          # ~29.6 MB int16, the 64k-region LD shape
    mk = jax.jit(lambda k: (jax.random.randint(k, (W, L), -100, 100)
                            .astype(jnp.int16)))
    nbytes = W * L * 2
    np.asarray(mk(jax.random.PRNGKey(9))[0])  # warm transfer path
    seed = [0]

    def fresh():
        # new array per reptition: jax.Array caches its host copy
        # (_npy_value) after a full fetch, so reusing one array makes
        # repeat fetches free and the median a lie
        seed[0] += 1
        x = mk(jax.random.PRNGKey(seed[0]))
        x.block_until_ready()
        return x

    def timed(label, fn):
        ts = []
        for _ in range(3):
            x = fresh()
            t0 = time.time()
            fn(x)
            ts.append(time.time() - t0)
        dt = sorted(ts)[1]
        log(f"  {label}: {dt:.2f}s -> {nbytes/dt/1e6:.1f} MB/s")

    timed("whole array", lambda x: np.asarray(x))
    timed("rows sequential",
          lambda x: [np.asarray(x[i]) for i in range(W)])
    for nt in (2, 4, 8):
        ex = ThreadPoolExecutor(nt)
        timed(f"rows {nt} threads",
              lambda x: list(ex.map(lambda i: np.asarray(x[i]), range(W))))
        ex.shutdown()


if __name__ == "__main__":
    main()
