#!/usr/bin/env python
"""Perf probe #13: does the device->host fetch overlap the next
region's device compute over the tunnel?

A: plain pipelined loop (dispatch N+1, then blocking result(N))
B: fetches run in a worker thread (dispatch stays on main thread)
C: depth-3 pipelining with threaded fetches
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

CACHE = os.environ.get("GAUSS_BENCH_CACHE",
                       os.path.expanduser("~/.cache/gauss_tpu_bench"))
N_SNPS = int(os.environ.get("GAUSS_BENCH_SNPS", 64000))
BP_SPAN = N_SNPS * 2000 // 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import gauss_tpu  # noqa: F401
    from gauss_tpu.models.genome import GenomeEngine
    from gauss_tpu.utils.benchdata import cached_panel, make_bench_input

    store = cached_panel(CACHE, N_SNPS, bp_span=BP_SPAN)
    inp = make_bench_input(store, 0.4)
    pop_wgt = {p: 1.0 / store.desc.num_pops for p in store.desc.pops}
    lo = int(store.index["bp"].min())
    hi = int(store.index["bp"].max())
    engine = GenomeEngine(store, snp_bucket=256, device_linalg=True)
    run = engine.prepare_mix(inp, pop_wgt, af1_cutoff=0.01)
    disp = lambda: run.impute_region_async(lo, hi, 1_000_000, 500_000)
    disp().result()   # compile + warm

    N = 6

    def timed(label, fn):
        t0 = time.time()
        fn()
        dt = (time.time() - t0) / N
        log(f"  {label}: {dt*1e3:.1f} ms/pass")

    def plain():
        prev = None
        for _ in range(N):
            h = disp()
            if prev is not None:
                prev.result()
            prev = h
        prev.result()

    def threaded(depth):
        ex = ThreadPoolExecutor(2)
        futs = deque()
        for _ in range(N):
            h = disp()
            futs.append(ex.submit(h.result))
            while len(futs) > depth:
                futs.popleft().result()
        while futs:
            futs.popleft().result()
        ex.shutdown()

    for rep in range(2):
        timed("plain depth1", plain)
        timed("thread depth2", lambda: threaded(2))
        timed("thread depth3", lambda: threaded(3))


if __name__ == "__main__":
    main()
