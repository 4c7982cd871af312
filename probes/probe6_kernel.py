#!/usr/bin/env python
"""Perf probe #6: latency-corrected device times via in-dispatch
repetition (lax.scan) -- separates the ~25 ms tunnel round-trip from
true device time.  Reports real chip peaks + real region-kernel time."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np

CACHE = os.environ.get("GAUSS_BENCH_CACHE",
                       os.path.expanduser("~/.cache/gauss_tpu_bench"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import gauss_tpu  # noqa: F401
    from gauss_tpu.models.genome import GenomeEngine
    from gauss_tpu.utils.benchdata import cached_panel, make_bench_input

    rng = np.random.default_rng(0)
    sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def timed(f, *args, reps=3):
        float(sync(f(*args)))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(sync(f(*args)))
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    def repeat_jit(body, n):
        # thread the carry into each iteration's INPUT via a runtime
        # zero XLA cannot fold (min(c, 0) with c >= 0), so the scan
        # body cannot be hoisted/CSE'd out of the loop
        @jax.jit
        def f(*args):
            def step(c, _):
                eps = jnp.minimum(c, 0.0)
                return c + body(eps, *args), None
            out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                  None, length=n)
            return out
        return f

    def slope(name, body, *args, n=5, unit_work=0.0, unit=""):
        t1 = timed(repeat_jit(body, 1), *args)
        tn = timed(repeat_jit(body, n), *args)
        per = (tn - t1) / (n - 1)
        log(f"{name}: 1x {t1*1e3:7.1f} ms, {n}x {tn*1e3:7.1f} ms -> "
            f"{per*1e3:7.2f} ms/iter"
            + (f" = {unit_work/per:6.1f} {unit}" if unit_work else ""))
        return per

    # real chip peaks
    A = jnp.asarray(rng.standard_normal((8192, 8192)).astype(jnp.bfloat16))
    slope("bf16 8k^3 matmul ",
          lambda e, a: jnp.sum(((a + e.astype(a.dtype)) @ a
                                ).astype(jnp.float32)),
          A, unit_work=2 * 8192**3 / 1e12, unit="TFLOP/s")
    B8 = jnp.asarray(rng.integers(-2, 3, size=(8192, 8192), dtype=np.int8))
    slope("int8 8k^3 matmul ", lambda e, a: jnp.sum(jax.lax.dot_general(
        a + e.astype(jnp.int8), a, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)),
        B8, unit_work=2 * 8192**3 / 1e12, unit="TOPS")
    Xf = jnp.asarray(rng.standard_normal((8192, 32768)).astype(np.float32))
    slope("f32 2.1GB rw     ", lambda e, x: jnp.sum(x * (2.0 + e)), Xf,
          unit_work=2.15e12 / 1e12, unit="TB/s")

    # real region kernel time (resident path)
    store = cached_panel(CACHE, int(os.environ.get("GAUSS_BENCH_SNPS",
                                                   24000)), verbose=False)
    inp = make_bench_input(store, 0.4)
    pop_wgt = {p: 1.0 / store.desc.num_pops for p in store.desc.pops}
    lo = int(store.index["bp"].min())
    hi = int(store.index["bp"].max())
    engine = GenomeEngine(store, snp_bucket=256, device_linalg=True)
    run = engine.prepare_mix(inp, pop_wgt, af1_cutoff=0.01)
    batch = run._region_batch(lo, hi, 1_000_000, 500_000)
    plans, inputs, panel, fn = batch

    def region_body(e, *all_args):
        pn = len(panel)
        args = list(all_args)
        args[pn + 2] = args[pn + 2] + e        # Z1 depends on carry
        z, info = fn(*args)
        return jnp.sum(z) + jnp.sum(info)
    per = slope("region kernel    ", region_body, *panel, *inputs, n=4)
    n_imp = sum(p[2][3] for p in plans)
    log(f"true device region time: {per*1e3:.1f} ms for {len(plans)} "
        f"windows / {n_imp} imputed SNPs -> {n_imp/per:.0f} SNPs/s "
        f"device-only")


if __name__ == "__main__":
    main()
