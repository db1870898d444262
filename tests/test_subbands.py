"""Subband pytree API: layout conversions and round-trips."""

import numpy as np

import wavelets_tpu as w


def test_subbands_1d():
    rng = np.random.default_rng(81)
    x = rng.standard_normal(64)
    wt = w.wt.wavelet(w.wt.db2)
    L = 3
    bands = w.dwt_subbands(x, wt, L)
    assert bands["s"].shape == (8,)
    assert [d.shape[-1] for d in bands["d"]] == [32, 16, 8]
    packed = np.asarray(w.to_packed(bands))
    assert np.allclose(packed, np.asarray(w.dwt(x, wt, L)), atol=1e-12)
    xr = np.asarray(w.idwt_subbands(bands, wt))
    assert np.allclose(xr, x, atol=1e-12)
    # threshold a band functionally
    bands["d"][0] = w.threshold(bands["d"][0], w.HardTH(), 10.0)
    assert np.isfinite(np.asarray(w.idwt_subbands(bands, wt))).all()


def test_subbands_2d():
    rng = np.random.default_rng(82)
    x = rng.standard_normal((32, 16))
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    L = 2
    bands = w.dwt_subbands(x, wt, L)
    assert bands["ll"].shape == (8, 4)
    lh, hl, hh = bands["levels"][0]
    assert lh.shape == (16, 8) and hl.shape == (16, 8) and hh.shape == (16, 8)
    packed = np.asarray(w.to_packed(bands))
    assert np.allclose(packed, np.asarray(w.dwt(x, wt, L)), atol=1e-12)
    assert np.allclose(np.asarray(w.idwt_subbands(bands, wt)), x, atol=1e-12)


def test_from_packed_roundtrip():
    rng = np.random.default_rng(83)
    y = rng.standard_normal((16, 16))
    bands = w.from_packed(y, 2)
    back = np.asarray(w.to_packed(bands))
    assert np.array_equal(back, y)
