"""Native C++ decoder vs pure-Python decoder equivalence."""

import numpy as np
import pytest

from gauss_tpu.io import native
from gauss_tpu.io.panel import PanelReader, read_panel_index

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="libgauss_panel.so not built")


@needs_native
def test_native_matches_python(synpanel):
    idx = read_panel_index(synpanel.files.index_file)
    rng = np.random.default_rng(9)
    rows = rng.permutation(len(idx))[:80]
    fpos = idx["fpos"].to_numpy()[rows]
    flags = np.array([1, 0, 1, 1, 0], dtype=np.int8)

    py = PanelReader(synpanel.files.data_file, synpanel.desc,
                     use_native=False).decode_rows(fpos, pop_flags=flags)
    nat = PanelReader(synpanel.files.data_file, synpanel.desc,
                      use_native=True).decode_rows(fpos, pop_flags=flags)
    np.testing.assert_array_equal(py.G, nat.G)
    np.testing.assert_allclose(py.af, nat.af, rtol=1e-12)
    np.testing.assert_array_equal(py.pop_index, nat.pop_index)


@needs_native
def test_native_read_all(synpanel):
    from gauss_tpu.io.bgzf import BgzfReader
    h = native.NativeBgzf(synpanel.files.index_file)
    text = h.read_all()
    h.close()
    chunks = []
    with BgzfReader(synpanel.files.index_file, cache_blocks=0) as r:
        while True:
            ln = r.readline()
            if ln is None:
                break
            chunks.append(ln)
    assert text == b"\n".join(chunks) + b"\n"


@needs_native
def test_native_af_only(synpanel):
    idx = read_panel_index(synpanel.files.index_file)
    nat = PanelReader(synpanel.files.data_file, synpanel.desc,
                      use_native=True).decode_rows(
        idx["fpos"].to_numpy(), want_genotypes=False)
    assert nat.G is None
    np.testing.assert_allclose(nat.af, synpanel.afs, atol=5e-7)
