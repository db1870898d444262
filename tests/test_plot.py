"""Plot utilities.  Mirrors /root/reference/test/plot.jl (smoke) with some
value checks."""

import numpy as np

import wavelets_tpu as w


def test_wplotdots():
    n = 256
    x = w.testfunction(n, "Bumps")
    y = np.asarray(w.dwt(x, w.wt.wavelet(w.wt.cdf97, "lifting")))
    d, l = w.wplotdots(y, 0.1, n)
    assert len(d) == len(l) == w.wcount(y, 0.1, level=0)
    assert np.all((0 <= d) & (d < n))
    assert np.all((0 <= l) & (l < w.ndyadicscales(n)))


def test_wplotim_1d():
    n = 256
    x = w.testfunction(n, "Bumps")
    y = np.asarray(w.dwt(x, w.wt.wavelet(w.wt.cdf97, "lifting")))
    A = w.wplotim(y)
    assert A.shape == (w.ndyadicscales(n), n)
    # row j is piecewise constant with 2^j distinct blocks
    for j in range(3):
        blocks = A[j].reshape(2 ** j, -1)
        assert np.allclose(blocks, blocks[:, :1])


def test_wplotim_2d():
    rng = np.random.default_rng(51)
    x = rng.standard_normal((64, 64))
    xts = w.wplotim(x, 2, w.wt.wavelet(w.wt.db3))
    assert xts.shape == (64, 64)
    assert 0 <= xts.min() and xts.max() <= 1


def test_wplotim_3d_color():
    rng = np.random.default_rng(52)
    x = rng.standard_normal((32, 32, 3))
    xts = w.wplotim(x, 2, w.wt.wavelet(w.wt.db2))
    assert xts.shape == (32, 32, 3)
    assert 0 <= xts.min() and xts.max() <= 1


def test_wplotim_default_levels():
    """2-D/3-D wplotim works without an explicit L (regression: the
    documented default crashed on J - None)."""
    img = np.random.default_rng(5).standard_normal((16, 16))
    out = np.asarray(w.wplotim(img))
    assert out.shape == (16, 16) and np.isfinite(out).all()


def test_wplotim_grayscale_3d_channel():
    """(n, n, 1) input is documented as supported and must route through
    the per-channel 2-D transform (code-review r5: the ndt=3 default
    rejected the size-1 axis)."""
    rng = np.random.default_rng(5)
    img = rng.standard_normal((64, 64, 1))
    wt = w.wt.wavelet(w.wt.db2)
    out = w.wplotim(img, 2, wt)
    assert out.shape[0] == 64 and np.isfinite(out).all()
