#!/usr/bin/env python
"""Probe #17: production-scale smoke of the NON-impute analyses on the
real TPU at the 64k-SNP bench panel -- qcat_region (resident),
jepeg_region (gene batches), afmix and zmix over the engine store.
Guards against OOM/compile blowups in paths the bench does not time.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np
import pandas as pd

CACHE = os.environ.get("GAUSS_BENCH_CACHE",
                       os.path.expanduser("~/.cache/gauss_tpu_bench"))
N_SNPS = int(os.environ.get("GAUSS_BENCH_SNPS", 64000))
BP_SPAN = N_SNPS * 2000 // 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import gauss_tpu  # noqa: F401
    from gauss_tpu.io import readers
    from gauss_tpu.models.genome import GenomeEngine
    from gauss_tpu.utils.benchdata import cached_panel, make_bench_input

    store = cached_panel(CACHE, N_SNPS, bp_span=BP_SPAN)
    inp = make_bench_input(store, 0.4)
    pop_wgt = {p: 1.0 / store.desc.num_pops for p in store.desc.pops}
    lo = int(store.index["bp"].min())
    hi = int(store.index["bp"].max())
    engine = GenomeEngine(store, snp_bucket=256, device_linalg=True)
    run = engine.prepare_mix(inp, pop_wgt, af1_cutoff=0.01)

    # qcat over a 10-window slice of the region (resident kernel)
    t0 = time.time()
    q = run.qcat_region(lo, lo + 10_000_000 - 1, window_bp=1_000_000,
                        wing_size=500_000)
    assert len(q) > 5000 and np.isfinite(q["qcat_chisq"]).all(), len(q)
    log(f"qcat_region: {len(q)} rows in {time.time()-t0:.1f}s "
        f"(incl. compile)")
    t0 = time.time()
    q2 = run.qcat_region(lo, lo + 10_000_000 - 1, window_bp=1_000_000,
                         wing_size=500_000)
    log(f"qcat_region warm: {time.time()-t0:.2f}s")
    assert q.equals(q2)

    # jepeg over synthetic annotation covering the region
    from gauss_tpu.utils.testing import make_annotation

    class _P:
        index_df = store.index
    apath = "/tmp/probe17_annot.txt"
    make_annotation(_P, apath, n_genes=200, snps_per_gene=25, seed=5)
    annot = readers.read_annotation(apath)
    t0 = time.time()
    genes = engine.prepare_genes(inp, annot, pop_wgt=pop_wgt)
    gj = genes.jepeg_region()
    assert len(gj) > 100 and np.isfinite(gj["chisq"]).all(), len(gj)
    log(f"jepeg_region: {len(gj)} genes in {time.time()-t0:.1f}s "
        f"(incl. compile)")

    # ancestry over the engine store
    from gauss_tpu.utils.testing import make_af_input

    class _P2:
        index_df = store.index
        desc = store.desc
        afs = store.af
    af_path = "/tmp/probe17_af.txt"
    truth = make_af_input(_P2, af_path, seed=3)
    t0 = time.time()
    af = engine.afmix(readers.read_input_af(af_path))
    w_true = dict(zip(truth["pop"], truth["wgt"]))
    est = dict(zip(af["pop"], af["wgt"]))
    err = max(abs(w - est.get(p, 0.0)) for p, w in w_true.items())
    log(f"afmix: {len(af)} pops in {time.time()-t0:.1f}s, "
        f"max|w-true| = {err:.3f}")
    assert err < 0.1

    t0 = time.time()
    zw = engine.zmix(inp, percentile=0.9, interval=10)
    assert np.isfinite(zw["Weight"]).all()
    log(f"zmix: {len(zw)} pops in {time.time()-t0:.1f}s")
    log("probe17 OK")


if __name__ == "__main__":
    main()
