"""Panel write/read roundtrip and index parsing."""

import numpy as np

from gauss_tpu.io.panel import PanelReader, read_panel_index


def test_index_roundtrip(synpanel):
    idx = read_panel_index(synpanel.files.index_file)
    assert len(idx) == len(synpanel.index_df)
    assert (idx["rsid"] == synpanel.index_df["rsid"]).all()
    assert (idx["bp"] == synpanel.index_df["bp"]).all()


def test_index_window_filter(synpanel):
    full = read_panel_index(synpanel.files.index_file)
    lo, hi = int(full["bp"].iloc[50]), int(full["bp"].iloc[100])
    idx = read_panel_index(synpanel.files.index_file, chrom=22,
                           start_bp=lo, end_bp=hi, wing_size=0)
    assert idx["bp"].min() >= lo and idx["bp"].max() <= hi
    assert len(idx) == 51


def test_decode_all_pops(synpanel):
    idx = read_panel_index(synpanel.files.index_file)
    reader = PanelReader(synpanel.files.data_file, synpanel.desc)
    dec = reader.decode_rows(idx["fpos"].to_numpy())
    assert dec.G.shape == synpanel.genotypes.shape
    np.testing.assert_array_equal(dec.G, synpanel.genotypes)
    np.testing.assert_allclose(dec.af, synpanel.afs, atol=5e-7)


def test_decode_selected_pops_and_order(synpanel):
    idx = read_panel_index(synpanel.files.index_file)
    reader = PanelReader(synpanel.files.data_file, synpanel.desc)
    flags = np.array([0, 1, 0, 1, 0], dtype=np.int8)
    # shuffled row order must be preserved in the output
    rng = np.random.default_rng(3)
    rows = rng.permutation(len(idx))[:40]
    dec = reader.decode_rows(idx["fpos"].to_numpy()[rows], pop_flags=flags)
    b = np.concatenate([[0], np.cumsum(synpanel.desc.sizes)])
    expected = np.concatenate(
        [synpanel.genotypes[rows][:, b[1]:b[2]],
         synpanel.genotypes[rows][:, b[3]:b[4]]], axis=1)
    np.testing.assert_array_equal(dec.G, expected)
    assert list(dec.pop_index) == [1, 3]
