#!/usr/bin/env python
"""Perf probe #8: region kernel timing on the 64k-SNP bench panel
(42.67 Mb span, ~43 windows).  A/B the int4 x-blocked Gram:

    GAUSS_GRAM_INT4=0 python probes/probe8_region64k.py   # int8 xb=1
    python probes/probe8_region64k.py                     # int4 xb=2
    GAUSS_X_BLOCK=1 python probes/probe8_region64k.py     # int4 xb=1
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np

CACHE = os.environ.get("GAUSS_BENCH_CACHE",
                       os.path.expanduser("~/.cache/gauss_tpu_bench"))
N_SNPS = int(os.environ.get("GAUSS_BENCH_SNPS", 64000))
BP_SPAN = N_SNPS * 2000 // 3          # keep 1500 SNPs/Mb density


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import gauss_tpu  # noqa: F401
    from gauss_tpu.models.genome import GenomeEngine
    from gauss_tpu.ops import pallas_gram as pg
    from gauss_tpu.utils.benchdata import cached_panel, make_bench_input

    t0 = time.time()
    store = cached_panel(CACHE, N_SNPS, verbose=True, bp_span=BP_SPAN)
    inp = make_bench_input(store, 0.4)
    pop_wgt = {p: 1.0 / store.desc.num_pops for p in store.desc.pops}
    lo = int(store.index["bp"].min())
    hi = int(store.index["bp"].max())
    engine = GenomeEngine(store, snp_bucket=256, device_linalg=True)
    run = engine.prepare_mix(inp, pop_wgt, af1_cutoff=0.01)
    log(f"prepared {len(run.table)} SNPs ({time.time()-t0:.1f}s)")
    t0 = time.time()
    (k_1, k_dev), plans = run.region_kernel_seconds(lo, hi, repeats=3,
                                                    inner_repeats=4)
    n_imp = sum(p[2][3] for p in plans)
    log(f"dtype={pg.gram_dtype().__name__} xb={pg.x_block_tiles()} "
        f"K={pg.K_TILE} R={pg.ROW_TILE} windows={len(plans)}: "
        f"{k_1*1e3:.1f} ms one-dispatch, {k_dev*1e3:.1f} ms device-only "
        f"(measure incl. compile {time.time()-t0:.1f}s); "
        f"kernel-only rate {n_imp/k_dev:.0f} SNPs/s")


if __name__ == "__main__":
    main()
