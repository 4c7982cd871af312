"""Reference-execution parity: run the GAUSS reference C++ itself
(compiled in place from /root/reference/src through the Rcpp facade in
csrc/refharness/) on synthetic bgzf panels and diff its output against
gauss_tpu.  This is the one parity signal whose oracle is NOT authored
in this repo (VERDICT r3 item 1): the binary executes the literal
reference code paths -- BGZF seeks, allele-flip joins, CalCor /
CalWgtCov (src/util.cpp:49-124), MakePosDef + InvMat imputation
(src/dist.cpp:129-227, src/distmix.cpp:138-253), computeLD
(src/computeLD.cpp:26-166).

Skipped when /root/reference or a C++ toolchain is unavailable.
"""

import io
import os
import subprocess

import numpy as np
import pandas as pd
import pytest

from gauss_tpu.models import dist as dist_mod
from gauss_tpu.models import ld as ld_mod
from gauss_tpu.utils.testing import make_gwas_input, make_synthetic_panel

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
REF_SRC = os.environ.get("GAUSS_REF_SRC", "/root/reference/src")
BUILD = os.path.join(REPO, "csrc", "refharness", "build_refharness.sh")

CHROM = 22
START, END, WING = 1_050_000, 1_250_000, 50_000
POP_SPEC = "AAA=0.3,CCC=0.45,EEE=0.25"
POP_WGT_DF = pd.DataFrame({"pop": ["AAA", "CCC", "EEE"],
                           "wgt": [0.3, 0.45, 0.25]})

SEEDS = [7, 21, 99]


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    if not os.path.isdir(REF_SRC):
        pytest.skip("reference sources not available")
    out = str(tmp_path_factory.mktemp("refharness") / "refharness")
    r = subprocess.run(["sh", BUILD, out], capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"refharness build failed:\n{r.stderr[-2000:]}")
    return out


@pytest.fixture(scope="module", params=SEEDS)
def panel_files(request, tmp_path_factory):
    seed = request.param
    d = tmp_path_factory.mktemp(f"panel{seed}")
    panel = make_synthetic_panel(str(d), n_snps=300, seed=seed)
    zf = str(d / "input.z.txt")
    make_gwas_input(panel, zf, measured_frac=0.6, swap_frac=0.2,
                    seed=seed + 1)
    return panel, zf


def run_harness(harness, cmd, pop_spec, zf, files, af1=None):
    args = [harness, cmd, str(CHROM), str(START), str(END),
            "0" if cmd == "computeld" else str(WING), pop_spec, zf,
            files.index_file, files.data_file, files.pop_desc_file]
    if af1 is not None:
        args.append(str(af1))
    r = subprocess.run(args, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def parse_df(text):
    return pd.read_csv(io.StringIO(text), sep="\t")


def merge_on_bp(ref, got):
    assert len(ref) == len(got), (len(ref), len(got))
    m = ref.merge(got, on="bp", suffixes=("_ref", "_tpu"))
    assert len(m) == len(ref)
    return m


def test_dist_matches_reference(harness, panel_files):
    panel, zf = panel_files
    f = panel.files
    out = run_harness(harness, "dist", "EUR", zf, f)
    ref = parse_df(out)
    got = dist_mod.dist(CHROM, START, END, WING, "EUR", zf, f.index_file,
                        f.data_file, f.pop_desc_file)
    m = merge_on_bp(ref, got)
    for col, tol in [("z", 1e-6), ("info", 1e-6), ("af1ref", 1e-9),
                     ("pval", 1e-8)]:
        np.testing.assert_allclose(m[f"{col}_ref"], m[f"{col}_tpu"],
                                   atol=tol, rtol=1e-6, err_msg=col)
    assert (m["type_ref"] == m["type_tpu"]).all()
    assert (m["a1_ref"] == m["a1_tpu"]).all()


def test_distmix_matches_reference(harness, panel_files):
    panel, zf = panel_files
    f = panel.files
    out = run_harness(harness, "distmix", POP_SPEC, zf, f)
    ref = parse_df(out)
    got = dist_mod.distmix(CHROM, START, END, WING, POP_WGT_DF, zf,
                           f.index_file, f.data_file, f.pop_desc_file)
    m = merge_on_bp(ref, got)
    for col, tol in [("z", 1e-6), ("info", 1e-6), ("af1mix", 1e-9),
                     ("pval", 1e-8)]:
        np.testing.assert_allclose(m[f"{col}_ref"], m[f"{col}_tpu"],
                                   atol=tol, rtol=1e-6, err_msg=col)
    assert (m["type_ref"] == m["type_tpu"]).all()


def test_computeld_matches_reference(harness, panel_files):
    panel, zf = panel_files
    f = panel.files
    out = run_harness(harness, "computeld", POP_SPEC, zf, f)
    head, mat = out.split("##cormat\n")
    ref_snps = parse_df(head)
    ref_cor = np.loadtxt(io.StringIO(mat))
    got = ld_mod.compute_ld(CHROM, START, END, POP_WGT_DF, zf,
                            f.index_file, f.data_file, f.pop_desc_file)
    snps = got["snplist"]
    assert len(snps) == len(ref_snps)
    assert (snps["bp"].to_numpy() == ref_snps["bp"].to_numpy()).all()
    np.testing.assert_allclose(ref_snps["af1mix"], snps["af1mix"],
                               atol=1e-9)
    np.testing.assert_allclose(ref_cor, got["cormat"], atol=1e-9)


def test_dist_af1_cutoff_override(harness, panel_files):
    """The nullable af1_cutoff plumbs through both sides identically
    (reference default 0.01, src/dist.cpp:52-56)."""
    panel, zf = panel_files
    f = panel.files
    ref = parse_df(run_harness(harness, "dist", "EUR", zf, f, af1=0.2))
    got = dist_mod.dist(CHROM, START, END, WING, "EUR", zf, f.index_file,
                        f.data_file, f.pop_desc_file, af1_cutoff=0.2)
    m = merge_on_bp(ref, got)
    np.testing.assert_allclose(m["z_ref"], m["z_tpu"], atol=1e-6)
