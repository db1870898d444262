"""Lifting engine: cross-engine consistency with the filter bank, and
round-trips.  Mirrors /root/reference/test/transforms.jl:57-128."""

import numpy as np
import pytest

import wavelets_tpu as w


@pytest.mark.parametrize("wclass", ["db1", "db2"])
def test_lifting_vs_filter_1d(wclass):
    n = 32
    tol = 1e-10 * np.sqrt(n)
    rng = np.random.default_rng(11)
    x = rng.standard_normal(n)
    wf = w.wt.wavelet(w.wt.ALL_CLASSES[wclass])
    wl = w.wt.wavelet(w.wt.ALL_CLASSES[wclass], "lifting")
    for L in (w.ndyadicscales(n), 0, 1, 2):
        yf = np.asarray(w.dwt(x, wf, L))
        yl = np.asarray(w.dwt(x, wl, L))
        assert np.linalg.norm(yf - yl) < tol
        assert np.linalg.norm(np.asarray(w.idwt(yf, wf, L)) - x) < tol
        assert np.linalg.norm(np.asarray(w.idwt(yl, wl, L)) - x) < tol
        # cross inverse: filter-inverse of lifting coefficients
        assert np.linalg.norm(np.asarray(w.idwt(yl, wf, L)) - x) < tol


@pytest.mark.parametrize("wclass", ["db1", "db2"])
def test_lifting_vs_filter_2d(wclass):
    n = 16
    tol = 1e-10 * n
    rng = np.random.default_rng(12)
    x = rng.standard_normal((n, n))
    wf = w.wt.wavelet(w.wt.ALL_CLASSES[wclass])
    wl = w.wt.wavelet(w.wt.ALL_CLASSES[wclass], "lifting")
    for L in (w.ndyadicscales(n), 0, 1, 2):
        yf = np.asarray(w.dwt(x, wf, L))
        yl = np.asarray(w.dwt(x, wl, L))
        assert np.linalg.norm(yf - yl) < tol
        assert np.linalg.norm(np.asarray(w.idwt(yl, wl, L)) - x) < tol


@pytest.mark.parametrize("wclass", ["db1", "db2"])
def test_lifting_vs_filter_3d(wclass):
    n = 8
    tol = 1e-10 * n ** 1.5
    rng = np.random.default_rng(13)
    x = rng.standard_normal((n, n, n))
    wf = w.wt.wavelet(w.wt.ALL_CLASSES[wclass])
    wl = w.wt.wavelet(w.wt.ALL_CLASSES[wclass], "lifting")
    for L in (w.ndyadicscales(n), 0, 1, 2):
        yf = np.asarray(w.dwt(x, wf, L))
        yl = np.asarray(w.dwt(x, wl, L))
        assert np.linalg.norm(yf - yl) < tol
        assert np.linalg.norm(np.asarray(w.idwt(yl, wl, L)) - x) < tol


def test_cdf97_roundtrip():
    rng = np.random.default_rng(14)
    wl = w.wt.wavelet(w.wt.cdf97, "lifting")
    for shape in [(64,), (32, 32), (16, 16, 16)]:
        x = rng.standard_normal(shape)
        L = w.maxtransformlevels(x)
        y = w.dwt(x, wl, L)
        assert np.max(np.abs(np.asarray(w.idwt(y, wl, L)) - x)) <= 1e-12


def test_cdf97_energy_near_preserved():
    # cdf97 is biorthogonal: energy approximately preserved on smooth data
    x = w.testfunction(256, "Doppler")
    wl = w.wt.wavelet(w.wt.cdf97, "lifting")
    y = np.asarray(w.dwt(x, wl, 4))
    ratio = np.linalg.norm(y) / np.linalg.norm(x)
    assert 0.8 < ratio < 1.2


def test_lifting_nonsquare_extension():
    """The reference requires square arrays for lifting
    (transforms_lifting.jl:132); we support non-square — verify against the
    filter engine which the reference does allow non-square."""
    rng = np.random.default_rng(15)
    x = rng.standard_normal((8, 16))
    wf = w.wt.wavelet(w.wt.db2)
    wl = w.wt.wavelet(w.wt.db2, "lifting")
    yf = np.asarray(w.dwt(x, wf, 2))
    yl = np.asarray(w.dwt(x, wl, 2))
    assert np.linalg.norm(yf - yl) < 1e-10 * np.sqrt(x.size)
    assert np.allclose(np.asarray(w.idwt(yl, wl, 2)), x, atol=1e-12)


def test_tiny_signal():
    rng = np.random.default_rng(16)
    x = rng.standard_normal(2)
    for wt in (w.wt.wavelet(w.wt.db1, "lifting"),
               w.wt.wavelet(w.wt.cdf97, "lifting")):
        y = w.dwt(x, wt, 1)
        assert np.allclose(np.asarray(w.idwt(y, wt, 1)), x, atol=1e-12)
