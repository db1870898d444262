"""Additional coverage: complex dtypes through every transform, GLS
denoising, profiling utils, carrier edge cases."""

import numpy as np
import jax.numpy as jnp
import pytest

import wavelets_tpu as w


def test_complex_wpt_modwt():
    rng = np.random.default_rng(91)
    xc = rng.standard_normal(64) + 1j * rng.standard_normal(64)
    wt = w.wt.wavelet(w.wt.db2)
    y = w.wpt(xc, wt, L=3)
    assert y.dtype == jnp.complex128
    assert np.allclose(np.asarray(w.iwpt(y, wt, L=3)), xc, atol=1e-11)
    W = w.modwt(xc, wt, 4)
    assert np.allclose(np.asarray(w.imodwt(W, wt)), xc, atol=1e-11)


def test_denoise_with_lifting_wavelet():
    rng = np.random.default_rng(92)
    x0 = w.testfunction(256, "HeaviSine")
    x = x0 + 0.2 * rng.standard_normal(256)
    wl = w.wt.wavelet(w.wt.cdf97, "lifting")
    y = np.asarray(w.denoise(x, wl, TI=False))
    assert np.mean((y - x0) ** 2) < np.mean((x - x0) ** 2)
    y2 = np.asarray(w.denoise(x, wl, TI=True, nspin=4))
    assert np.mean((y2 - x0) ** 2) < np.mean((x - x0) ** 2)


def test_noisest_matches_sigma_2d():
    rng = np.random.default_rng(93)
    img = 0.5 * rng.standard_normal((128, 128))
    est = float(w.noisest(img))
    assert 0.25 < est < 1.0


def test_profiling_utils():
    import jax
    from wavelets_tpu.profiling import time_fn, barrier

    f = jax.jit(lambda v: v * 2.0)
    x = jnp.ones((64, 64))
    dt = time_fn(f, x, iters=3)
    assert dt > 0
    assert barrier(f(x)) == pytest.approx(2.0)


def test_scale_and_len():
    f = w.wt.wavelet(w.wt.db3)
    assert len(f) == 6
    g = f.scale(2.0)
    assert np.allclose(g.qmf_array(), 2 * f.qmf_array())
    assert g.name == f.name


def test_wavelet_default_levels_cap():
    # dwt with default L uses maxtransformlevels; denoise caps at 6
    x = np.random.default_rng(94).standard_normal(2 ** 10)
    wt = w.wt.wavelet(w.wt.haar)
    y = np.asarray(w.dwt(x, wt))
    assert np.allclose(np.asarray(w.idwt(y, wt)), x, atol=1e-11)


def test_threshold_complex():
    xc = np.array([3 + 4j, 0.1 + 0.1j, -2 + 0j])
    y = np.asarray(w.threshold(xc, w.HardTH(), 1.0))
    assert y[0] == xc[0] and y[1] == 0 and y[2] == xc[2]
    ys = np.asarray(w.threshold(xc, w.SoftTH(), 1.0))
    # soft shrinks magnitude by t, preserving phase (sign() for complex)
    assert abs(abs(ys[0]) - 4.0) < 1e-12


def test_donate_variants_match():
    """donate=True (the reference's in-place surface) returns identical
    results; the donated buffer is consumed."""
    import jax
    import wavelets_tpu as w
    rng = np.random.default_rng(55)
    x = rng.standard_normal(256)
    wt = w.wt.wavelet(w.wt.db2)
    y0 = np.asarray(w.dwt(jnp.asarray(x), wt, 3))
    xd = jnp.asarray(x)
    y1 = np.asarray(w.dwt(xd, wt, 3, donate=True))
    assert np.array_equal(y0, y1)
    tree = w.maketree(256, 3, "full")
    z0 = np.asarray(w.wpt(jnp.asarray(x), wt, tree))
    z1 = np.asarray(w.wpt(jnp.asarray(x), wt, tree, donate=True))
    assert np.array_equal(z0, z1)
    m0 = np.asarray(w.modwt(jnp.asarray(x), wt, 4))
    m1 = np.asarray(w.modwt(jnp.asarray(x), wt, 4, donate=True))
    assert np.array_equal(m0, m1)


def test_ti_spin_chunk_equivalence():
    import wavelets_tpu as w
    rng = np.random.default_rng(56)
    x = w.testfunction(128, "Bumps") + 0.1 * rng.standard_normal(128)
    a = np.asarray(w.denoise(jnp.asarray(x), TI=True, spin_chunk=2))
    b = np.asarray(w.denoise(jnp.asarray(x), TI=True, spin_chunk=8))
    c = np.asarray(w.denoise(jnp.asarray(x), TI=True, spin_chunk=1000))
    assert np.abs(a - b).max() < 1e-10
    assert np.abs(a - c).max() < 1e-10


def test_split_merge_exports():
    import wavelets_tpu as w
    rng = np.random.default_rng(57)
    x = rng.standard_normal(64)
    s, d = w.split_last(jnp.asarray(x))
    assert np.array_equal(np.asarray(s), x[0::2])
    assert np.array_equal(np.asarray(d), x[1::2])
    assert np.array_equal(np.asarray(w.merge_last(s, d)), x)
