"""MODWT: round-trips (incl. non-power-of-two), truncated-level consistency,
shape contract.  Mirrors /root/reference/test/transforms.jl MODWT testset."""

import numpy as np
import pytest

import wavelets_tpu as w


def test_modwt_roundtrip_pow2():
    rng = np.random.default_rng(31)
    x = rng.standard_normal(128)
    wf = w.wt.wavelet(w.wt.db4)
    W = w.modwt(x, wf)
    assert W.shape == (128, w.maxmodwttransformlevels(128) + 1)
    assert np.allclose(np.asarray(w.imodwt(W, wf)), x, atol=1e-10)


def test_modwt_roundtrip_nonpow2():
    rng = np.random.default_rng(32)
    x = np.cumsum(rng.standard_normal(129))
    wf = w.wt.wavelet(w.wt.db4)
    W = w.modwt(x, wf)
    assert W.shape == (129, w.maxmodwttransformlevels(129) + 1)
    assert np.allclose(np.asarray(w.imodwt(W, wf)), x, atol=1e-10)

    # truncated levels agree with the full transform's leading columns
    L = 4
    Wl = np.asarray(w.modwt(x, wf, L))
    assert np.allclose(np.asarray(W)[:, : L - 1], Wl[:, : L - 1], atol=1e-12)


def test_modwt_haar_level1_closed_form():
    """Level-1 Haar MODWT: w[t] = (v[t] - v[t-1])/2, v1[t] = (v[t]+v[t-1])/2."""
    rng = np.random.default_rng(33)
    x = rng.standard_normal(16)
    W = np.asarray(w.modwt(x, w.wt.wavelet(w.wt.haar), 1))
    expect_w = (x - np.roll(x, 1)) / 2
    expect_v = (x + np.roll(x, 1)) / 2
    assert np.allclose(W[:, 0], expect_w, atol=1e-12)
    assert np.allclose(W[:, 1], expect_v, atol=1e-12)


def test_modwt_energy_preserved():
    """The MODWT is an energy-preserving (tight-frame) transform."""
    rng = np.random.default_rng(34)
    x = rng.standard_normal(64)
    W = np.asarray(w.modwt(x, w.wt.wavelet(w.wt.db2), 4))
    assert np.linalg.norm(W) == pytest.approx(np.linalg.norm(x), rel=1e-10)


def test_modwt_batched():
    rng = np.random.default_rng(35)
    xb = rng.standard_normal((3, 64))
    wf = w.wt.wavelet(w.wt.db2)
    Wb = np.asarray(w.modwt(xb, wf, 3))
    assert Wb.shape == (3, 64, 4)
    for i in range(3):
        assert np.allclose(Wb[i], np.asarray(w.modwt(xb[i], wf, 3)), atol=1e-12)


def test_modwt_errors():
    wf = w.wt.wavelet(w.wt.db2)
    with pytest.raises(ValueError):
        w.modwt(np.zeros(8), wf, 0)
    with pytest.raises(ValueError):
        w.modwt(np.zeros(8), wf, 4)  # 2^4 > 8
