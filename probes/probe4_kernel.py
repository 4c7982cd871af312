#!/usr/bin/env python
"""Perf probe #4: the REAL region kernel A/B (uses the bench panel
cache).  Reports kernel-only ms via region_kernel_seconds.  Control
knobs via env: GAUSS_K_TILE, GAUSS_ROW_TILE."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys

import numpy as np

CACHE = os.environ.get("GAUSS_BENCH_CACHE",
                       os.path.expanduser("~/.cache/gauss_tpu_bench"))
N_SNPS = int(os.environ.get("GAUSS_BENCH_SNPS", 24000))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import gauss_tpu  # noqa: F401
    from gauss_tpu.models.genome import GenomeEngine
    from gauss_tpu.ops import pallas_gram as pg
    from gauss_tpu.utils.benchdata import cached_panel, make_bench_input

    store = cached_panel(CACHE, N_SNPS, verbose=False)
    inp = make_bench_input(store, 0.4)
    pop_wgt = {p: 1.0 / store.desc.num_pops for p in store.desc.pops}
    lo = int(store.index["bp"].min())
    hi = int(store.index["bp"].max())
    engine = GenomeEngine(store, snp_bucket=256, device_linalg=True)
    run = engine.prepare_mix(inp, pop_wgt, af1_cutoff=0.01)
    (k_1, k_dev), plans = run.region_kernel_seconds(lo, hi, repeats=5,
                                                    inner_repeats=4)
    spec = engine._spec(run.pop_sizes, run.wgts)
    S = int(np.sum(spec.pop_sizes_padded))
    log(f"K_TILE={pg.K_TILE} ROW_TILE={pg.ROW_TILE} S_padded={S} "
        f"windows={len(plans)}: region kernel {k_1*1e3:.1f} ms "
        f"one-dispatch, {k_dev*1e3:.1f} ms device-only")
    # accuracy spot check vs host path on the first window
    w = run.impute_window(lo, lo + 999_999, 500_000)
    eng_h = GenomeEngine(store, snp_bucket=256, device_linalg=False)
    run_h = eng_h.prepare_mix(inp, pop_wgt, af1_cutoff=0.01)
    a = run_h.impute_window(lo, lo + 999_999, 500_000).table
    b = w.table
    imp = a["type"].to_numpy() == 0
    dz = float(np.abs(a["z"].to_numpy()[imp] - b["z"].to_numpy()[imp]).max())
    log(f"fused-vs-host max|dZ| = {dz:.2e}")


if __name__ == "__main__":
    main()
