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


# ---------------------------------------------------------------------------
# r5 extension: the remaining exports diffed against the compiled
# reference (VERDICT r4 item 4) -- qcat/qcatmix, prep_qcat,
# prep_recessive_impute, afmix/cpw2, jepeg/jepegmix, prep_zmix family.
# ---------------------------------------------------------------------------

from gauss_tpu.models import ancestry as anc_mod
from gauss_tpu.models import jepeg as jepeg_mod
from gauss_tpu.models import qcat as qcat_mod
from gauss_tpu.utils.testing import make_af_input, make_annotation


def run_harness2(harness, cmd, pop_spec, zf, files, x1="-", x2="-"):
    """Generic runner for the extended command set (x1/x2 extras)."""
    args = [harness, cmd, str(CHROM), str(START), str(END), str(WING),
            pop_spec, zf, files.index_file, files.data_file,
            files.pop_desc_file, str(x1), str(x2)]
    r = subprocess.run(args, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def parse_list(text):
    """Split '##name' sections: first section is a df, rest parsed as
    float arrays."""
    parts = text.split("##")
    out = {"snplist": parse_df(parts[0])}
    for p in parts[1:]:
        name, _, body = p.partition("\n")
        out[name.strip()] = np.loadtxt(io.StringIO(body))
    return out


@pytest.fixture(scope="module")
def aux_files(panel_files, tmp_path_factory):
    panel, zf = panel_files
    d = tmp_path_factory.mktemp("aux")
    annot = str(d / "annot.txt")
    make_annotation(panel, annot, n_genes=6, snps_per_gene=8, seed=31)
    aff = str(d / "af.txt")
    make_af_input(panel, aff, seed=17)
    return annot, aff


QCAT_COLS = [("qcat_t", 1e-6), ("qcat_chisq", 1e-6), ("qcat_pval", 1e-8)]


def test_qcat_matches_reference(harness, panel_files):
    panel, zf = panel_files
    f = panel.files
    ref = parse_df(run_harness2(harness, "qcat", "EUR", zf, f))
    got = qcat_mod.qcat(CHROM, START, END, WING, "EUR", zf, f.index_file,
                        f.data_file, f.pop_desc_file)
    m = merge_on_bp(ref, got)
    assert (m["qcat_m_ref"] == m["qcat_m_tpu"]).all()
    assert (m["type_ref"] == m["type_tpu"]).all()
    for col, tol in QCAT_COLS + [("af1ref", 1e-9)]:
        np.testing.assert_allclose(m[f"{col}_ref"], m[f"{col}_tpu"],
                                   atol=tol, rtol=1e-6, err_msg=col)


def test_qcatmix_matches_reference(harness, panel_files):
    panel, zf = panel_files
    f = panel.files
    ref = parse_df(run_harness2(harness, "qcatmix", POP_SPEC, zf, f))
    got = qcat_mod.qcatmix(CHROM, START, END, WING, POP_WGT_DF, zf,
                           f.index_file, f.data_file, f.pop_desc_file)
    m = merge_on_bp(ref, got)
    assert (m["qcat_m_ref"] == m["qcat_m_tpu"]).all()
    for col, tol in QCAT_COLS + [("af1mix", 1e-9)]:
        np.testing.assert_allclose(m[f"{col}_ref"], m[f"{col}_tpu"],
                                   atol=tol, rtol=1e-6, err_msg=col)


def test_prep_qcat_matches_reference(harness, panel_files):
    panel, zf = panel_files
    f = panel.files
    ref = parse_list(run_harness2(harness, "prep_qcat", "EUR", zf, f))
    got = qcat_mod.prep_qcat(CHROM, START, END, WING, "EUR", zf,
                             f.index_file, f.data_file, f.pop_desc_file)
    assert (ref["snplist"]["bp"].to_numpy()
            == got["snplist"]["bp"].to_numpy()).all()
    assert (ref["snplist"]["type"].to_numpy()
            == got["snplist"]["type"].to_numpy()).all()
    np.testing.assert_allclose(ref["z_vec"], got["z_vec"], atol=1e-9)
    np.testing.assert_allclose(ref["cor_mat1"], got["cor_mat1"], atol=1e-8)
    np.testing.assert_allclose(ref["cor_mat2"], got["cor_mat2"], atol=1e-8)


def test_prep_recessive_impute_matches_reference(harness, panel_files):
    panel, zf = panel_files
    f = panel.files
    ref = parse_list(run_harness2(harness, "prep_recessive_impute",
                                  POP_SPEC, zf, f))
    got = qcat_mod.prep_recessive_impute(
        CHROM, START, END, WING, POP_WGT_DF, zf, f.index_file,
        f.data_file, f.pop_desc_file)
    # minor-allele normalization flips a1/a2 rows -- compare them too
    assert (ref["snplist"]["bp"].to_numpy()
            == got["snplist"]["bp"].to_numpy()).all()
    assert (ref["snplist"]["a1"].to_numpy()
            == got["snplist"]["a1"].to_numpy()).all()
    np.testing.assert_allclose(ref["snplist"]["z"], got["snplist"]["z"],
                               atol=1e-9)
    np.testing.assert_allclose(ref["zvec"], got["zvec"], atol=1e-9)
    for k in ("cormat", "cormat_add", "cormat_dom", "cormat_rec"):
        np.testing.assert_allclose(ref[k], got[k], atol=1e-8, err_msg=k)


def test_afmix_matches_reference(harness, panel_files, aux_files):
    panel, zf = panel_files
    _, aff = aux_files
    f = panel.files
    ref = parse_df(run_harness2(harness, "afmix", "-", aff, f, x1=7))
    got = anc_mod.afmix(aff, f.index_file, f.data_file, f.pop_desc_file,
                        interval=7)
    m = ref.merge(got, on="pop", suffixes=("_ref", "_tpu"))
    assert len(m) == len(ref) == len(got)
    assert (m["sup.pop_ref"] == m["sup.pop_tpu"]).all()
    np.testing.assert_allclose(m["wgt_ref"], m["wgt_tpu"], atol=1e-9)


def test_cpw2_matches_reference(harness, panel_files, aux_files):
    panel, zf = panel_files
    _, aff = aux_files
    f = panel.files
    ref = parse_df(run_harness2(harness, "cpw2", "-", aff, f, x1=7))
    got = anc_mod.cpw2(aff, f.index_file, f.data_file, f.pop_desc_file,
                       interval=7)
    m = ref.merge(got, on="pop", suffixes=("_ref", "_tpu"))
    assert len(m) == len(ref) == len(got)
    np.testing.assert_allclose(m["wgt_ref"], m["wgt_tpu"], atol=1e-9)


GENE_NUM_COLS = [("chisq", 1e-6), ("jepeg_pval", 1e-8),
                 ("top_categ_pval", 1e-8), ("top_snp_pval", 1e-8)]


def _diff_genes(ref, got):
    m = ref.merge(got, on="geneid", suffixes=("_ref", "_tpu"))
    assert len(m) == len(ref) == len(got)
    assert (m["df_ref"] == m["df_tpu"]).all()
    assert (m["num_snp_ref"] == m["num_snp_tpu"]).all()
    assert (m["top_categ_ref"] == m["top_categ_tpu"]).all()
    assert (m["top_snp_ref"] == m["top_snp_tpu"]).all()
    for col, tol in GENE_NUM_COLS:
        np.testing.assert_allclose(m[f"{col}_ref"], m[f"{col}_tpu"],
                                   atol=tol, rtol=1e-5, err_msg=col)


def test_jepeg_matches_reference(harness, panel_files, aux_files):
    panel, zf = panel_files
    annot, _ = aux_files
    f = panel.files
    ref = parse_df(run_harness2(harness, "jepeg", "EUR", zf, f, x2=annot))
    got = jepeg_mod.jepeg("EUR", zf, annot, f.index_file, f.data_file,
                          f.pop_desc_file)
    _diff_genes(ref, got)


def test_jepegmix_matches_reference(harness, panel_files, aux_files):
    panel, zf = panel_files
    annot, _ = aux_files
    f = panel.files
    ref = parse_df(run_harness2(harness, "jepegmix", POP_SPEC, zf, f,
                                x2=annot))
    got = jepeg_mod.jepegmix(POP_WGT_DF, zf, annot, f.index_file,
                             f.data_file, f.pop_desc_file)
    _diff_genes(ref, got)


def _zmix_files(panel, zf):
    f = panel.files
    return (zf, f.index_file, f.data_file, f.pop_desc_file)


def test_prep_zmix5_matches_reference(harness, panel_files):
    panel, zf = panel_files
    ref = np.atleast_2d(np.loadtxt(io.StringIO(run_harness2(
        harness, "prep_zmix5", "-", zf, panel.files, x1=0.5, x2=2))))
    got = anc_mod.prep_zmix5(*_zmix_files(panel, zf), percentile=0.5,
                             interval=2)
    assert ref.shape == got.shape
    np.testing.assert_allclose(ref, got, atol=1e-8)


def test_prep_zmix5_sup_matches_reference(harness, panel_files):
    panel, zf = panel_files
    ref = np.atleast_2d(np.loadtxt(io.StringIO(run_harness2(
        harness, "prep_zmix5_sup", "-", zf, panel.files, x1=0.5, x2=2))))
    got = anc_mod.prep_zmix5_sup(*_zmix_files(panel, zf), percentile=0.5,
                                 interval=2)
    assert ref.shape == got.shape
    np.testing.assert_allclose(ref, got, atol=1e-8)


@pytest.mark.parametrize("cmd,fn,x1,x2,kwargs", [
    ("prep_zmix", anc_mod.prep_zmix, 3, "-", {"interval": 3}),
    ("prep_zmix2", anc_mod.prep_zmix2, 2, 3,
     {"interval": 2, "offset": 3}),
    ("prep_zmix3", anc_mod.prep_zmix3, 2, 3, {"interval": 2, "steps": 3}),
    ("prep_zmix4", anc_mod.prep_zmix4, 2, 3,
     {"interval": 2, "offset": 3}),
])
def test_prep_zmix_family_matches_reference(harness, panel_files, cmd,
                                            fn, x1, x2, kwargs):
    panel, zf = panel_files
    ref = np.atleast_2d(np.loadtxt(io.StringIO(run_harness2(
        harness, cmd, "-", zf, panel.files, x1=x1, x2=x2))))
    got = fn(*_zmix_files(panel, zf), **kwargs)
    assert ref.shape == got.shape
    np.testing.assert_allclose(ref, got, atol=1e-8)
