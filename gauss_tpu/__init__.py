"""gauss_tpu: TPU-native GWAS summary-statistics engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
statsleelab/gauss (GAUSS, "Genome Analysis Using Summary Statistics"):
Z-score imputation (dist/distmix), ancestry-weighted LD
(compute_ld/simulate_ld), ancestry-proportion estimation
(afmix/cpw2/zmix + prep_zmix family), per-SNP causality tests
(qcat/qcatmix + preps), gene-level TWAS (jepeg/jepegmix) and winner's-
curse correction (fiqt).

Design: the reference panel is decoded once into HBM-resident int8
dosage matrices; every correlation kernel is an MXU matmul (centered
cancellation-free f32 on the fused device path, integer-exact f32
sufficient statistics + f64 combines on the host parity path); windows
and genes run data-parallel over a jax.sharding.Mesh with the subject
axis sharded via psum.
"""

# float64 combines require x64; set before any JAX computation.
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# GAUSS_TPU_PLATFORM overrides the backend choice (e.g. "cpu" for
# multi-process CPU tests in containers whose sitecustomize pins a
# platform list that shadows JAX_PLATFORMS).
if _os.environ.get("GAUSS_TPU_PLATFORM"):
    _jax.config.update("jax_platforms", _os.environ["GAUSS_TPU_PLATFORM"])

# Persistent compilation cache: windowed analyses reuse a handful of
# bucketed kernel shapes across processes; caching them makes every run
# after the first start in seconds.  Opt out with GAUSS_TPU_NO_CC=1.
if not _os.environ.get("GAUSS_TPU_NO_CC"):
    _cc = _os.environ.get(
        "GAUSS_TPU_CC_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "gauss_tpu_xla"))
    try:
        _os.makedirs(_cc, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cc)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never fatal
        pass

from .config import Settings, ComputeOptions, PanelFiles  # noqa: E402
from .models.dist import dist, distmix  # noqa: E402
from .models.ld import compute_ld, simulate_ld  # noqa: E402

# reference-style aliases
computeLD = compute_ld
simulateLD = simulate_ld

__version__ = "0.1.0"

__all__ = [
    "Settings", "ComputeOptions", "PanelFiles",
    "dist", "distmix",
    "compute_ld", "simulate_ld", "computeLD", "simulateLD",
]


def __getattr__(name):
    """Lazy exports for the wider API surface (keeps import light)."""
    lazy = {
        "afmix": ("gauss_tpu.models.ancestry", "afmix"),
        "cpw2": ("gauss_tpu.models.ancestry", "cpw2"),
        "zmix": ("gauss_tpu.models.ancestry", "zmix"),
        "prep_zmix": ("gauss_tpu.models.ancestry", "prep_zmix"),
        "prep_zmix2": ("gauss_tpu.models.ancestry", "prep_zmix2"),
        "prep_zmix3": ("gauss_tpu.models.ancestry", "prep_zmix3"),
        "prep_zmix4": ("gauss_tpu.models.ancestry", "prep_zmix4"),
        "prep_zmix5": ("gauss_tpu.models.ancestry", "prep_zmix5"),
        "prep_zmix5_sup": ("gauss_tpu.models.ancestry", "prep_zmix5_sup"),
        "qcat": ("gauss_tpu.models.qcat", "qcat"),
        "qcatmix": ("gauss_tpu.models.qcat", "qcatmix"),
        "prep_qcat": ("gauss_tpu.models.qcat", "prep_qcat"),
        "prep_recessive_impute": ("gauss_tpu.models.qcat", "prep_recessive_impute"),
        "jepeg": ("gauss_tpu.models.jepeg", "jepeg"),
        "jepegmix": ("gauss_tpu.models.jepeg", "jepegmix"),
        "fiqt": ("gauss_tpu.models.fiqt", "fiqt"),
        "PGC2_SCZ_ANC_Prop": ("gauss_tpu.data", "PGC2_SCZ_ANC_Prop"),
        "pgc2_scz_anc_prop": ("gauss_tpu.data", "pgc2_scz_anc_prop"),
    }
    if name in lazy:
        import importlib
        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'gauss_tpu' has no attribute '{name}'")
