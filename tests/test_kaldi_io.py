"""Kaldi ark/scp I/O roundtrip tests."""

import numpy as np

from tdnnf_nas_tpu.data.kaldi_io import (
    read_ark, write_ark, read_scp, load_scp_matrix,
    read_int_vector, write_int_vector, read_matrix, write_matrix,
)


def test_float_matrix_ark_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    mats = {f"utt{i}": rng.randn(rng.randint(5, 20), 13).astype(np.float32)
            for i in range(5)}
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    write_ark(ark, mats.items(), scp_path=scp)
    got = dict(read_ark(ark))
    assert set(got) == set(mats)
    for k in mats:
        np.testing.assert_allclose(got[k], mats[k], atol=1e-6)
    # scp random access
    entries = read_scp(scp)
    assert len(entries) == 5
    for key, _, _ in entries:
        m = load_scp_matrix([e for e in entries if e[0] == key][0])
        np.testing.assert_allclose(m, mats[key], atol=1e-6)


def test_compressed_matrix_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    mat = (rng.randn(50, 40) * 3 + 1).astype(np.float32)
    ark = str(tmp_path / "c.ark")
    write_ark(ark, [("u1", mat)], compress=True)
    ((key, got),) = list(read_ark(ark))
    assert key == "u1" and got.shape == mat.shape
    # uint8 quantization: tolerance relative to per-column range
    err = np.abs(got - mat)
    col_rng = mat.max(0) - mat.min(0)
    assert (err / col_rng[None, :]).max() < 0.02, (err.max())


def test_int_vector_roundtrip(tmp_path):
    ali = {"a": np.asarray([1, 5, 5, 5, 2, 2], np.int32),
           "b": np.asarray([0, 3], np.int32)}
    ark = str(tmp_path / "ali.ark")
    write_ark(ark, ali.items(), writer=write_int_vector)
    got = dict(read_ark(ark, reader=read_int_vector))
    for k in ali:
        np.testing.assert_array_equal(got[k], ali[k])
