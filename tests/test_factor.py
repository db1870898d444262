"""Lifting factorization of arbitrary orthogonal filters (wt/factor.py).

The reference ships lifting schemes for cdf9/7, haar, db1, db2 only
(src/WT/wt_main.jl:451-480); here wavelet(c, "lifting") must work for
every exactly-orthonormal family via the Daubechies-Sweldens polyphase
factorization, agree with the filter engine, round-trip exactly, and
support the non-periodic boundary modes."""

import numpy as np
import jax.numpy as jnp
import pytest

import wavelets_tpu as w
from wavelets_tpu.wt.carriers import wavelet, GLS
from wavelets_tpu.wt.factor import lifting_factorization, polyphase, _LP

# every exactly-orthonormal table; batt* are truncated IIR (det != 1)
FACTORABLE = (["haar"] + [f"db{n}" for n in range(1, 11)]
              + [f"coif{n}" for n in (2, 4, 6)]
              + [f"sym{n}" for n in range(4, 11)] + ["beyl"])
# tables published to fewer digits: larger (documented) engine mismatch
LOOSE = {"coif8": 1e-7, "vaid": 1e-5, "sym9": 1e-7, "sym10": 1e-7}


@pytest.mark.parametrize("name", FACTORABLE + list(LOOSE))
def test_factored_lifting_matches_filter_engine(name):
    c = w.wt.ALL_CLASSES[name]
    wf = wavelet(c)                      # OrthoFilter
    wl = wavelet(c, "lifting")           # factored GLS
    assert isinstance(wl, GLS)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(256)
    L = 3
    yf = np.asarray(w.dwt(x, wf, L))
    yl = np.asarray(w.dwt(x, wl, L))
    tol = LOOSE.get(name, 1e-9)
    assert np.abs(yf - yl).max() < tol, name


@pytest.mark.parametrize("name", FACTORABLE + list(LOOSE))
def test_factored_lifting_roundtrip_exact(name):
    """Lifting is structurally invertible: round-trip stays at f64
    rounding even where the table's orthonormality defect makes the
    FILTER bank's adjoint 'inverse' inexact."""
    wl = wavelet(w.wt.ALL_CLASSES[name], "lifting")
    rng = np.random.default_rng(4)
    x = rng.standard_normal(512)
    y = w.dwt(x, wl, 4)
    xr = np.asarray(w.idwt(y, wl, 4))
    # cancellation scales with the squared step-coefficient magnitude
    from wavelets_tpu.wt.carriers import wavelet as _wv
    cm = max(max(abs(v) for v in st.coef) for st in wl.steps)
    assert np.abs(xr - x).max() < max(1e-10, 1e-13 * cm * cm), name


@pytest.mark.parametrize("name", ["db4", "db5", "coif4"])
@pytest.mark.parametrize("boundary", ["zeropad", "symmetric"])
def test_factored_lifting_nonperiodic_boundaries(name, boundary):
    """The factorization unlocks the exact non-periodic boundary modes
    for stable orthogonal families (reference: none)."""
    wl = wavelet(w.wt.ALL_CLASSES[name], "lifting", boundary)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((64, 64))
    y = w.dwt(x, wl, 2)
    xr = np.asarray(w.idwt(y, wl, 2))
    assert np.abs(xr - x).max() < 1e-9, (name, boundary)


def test_unstable_boundary_gated_by_precision():
    """db6+symmetric: the factored cascade's edge cancellation survives
    f64 (probe ~3e-11) but collapses in f32 (probe ~2.5e-2, measured
    ~1e2 error in a 2-D transform) — the engine must refuse the f32
    combination at trace time and allow the f64 one."""
    wl = wavelet(w.wt.ALL_CLASSES["db6"], "lifting", "symmetric")
    rng = np.random.default_rng(7)
    x = rng.standard_normal(256)
    y = w.dwt(x, wl, 2)                      # f64: allowed
    assert np.abs(np.asarray(w.idwt(y, wl, 2)) - x).max() < 1e-9
    with pytest.raises(ValueError, match="unstable"):
        w.dwt(x.astype(np.float32), wl, 2)   # f32: refused
    # zeropad perturbs the cancellation far less: f32 allowed
    wz = wavelet(w.wt.ALL_CLASSES["db6"], "lifting", "zeropad")
    y32 = w.dwt(x.astype(np.float32), wz, 2)
    xr = np.asarray(w.idwt(y32, wz, 2))
    assert np.abs(xr - x.astype(np.float32)).max() < 1e-3


def test_battle_refused_with_clear_error():
    with pytest.raises(ValueError, match="not orthonormal"):
        wavelet(w.wt.ALL_CLASSES["batt4"], "lifting")


def test_published_schemes_still_win():
    """db2/haar keep the published (pinned) schemes, not factored ones."""
    from wavelets_tpu.wt.schemes import SCHEMES
    for nm in ("haar", "db1", "db2"):
        gls = wavelet(w.wt.ALL_CLASSES[nm], "lifting")
        assert gls.steps == SCHEMES[nm][0]


def test_polyphase_determinant_is_one_for_daubechies():
    wf = wavelet(w.wt.ALL_CLASSES["db6"])
    he, ho, go, ge = polyphase(np.asarray(wf.qmf))
    det = he * ge - ho * go
    one = _LP(0, [1.0])
    assert (det - one).norm() < 1e-12


def test_factorization_is_cached():
    wf = wavelet(w.wt.ALL_CLASSES["db7"])
    a = lifting_factorization(wf.qmf, "db7")
    b = lifting_factorization(wf.qmf, "db7")
    assert a is b


def test_vaid_f32_periodic_refused():
    """Vaidyanathan's factored cascade amplifies f32 rounding ~14x on the
    stability probe (every other stock scheme <= 7e-6) — silently ~0.4
    round-trip error before the gate (found by fuzzing).  f32 must be
    refused with the stability error; f64 stays usable."""
    wl = wavelet(w.wt.ALL_CLASSES["vaid"], "lifting")
    x = np.random.default_rng(0).standard_normal(128)
    y = w.dwt(x, wl, 3)                        # f64: fine
    assert np.abs(np.asarray(w.idwt(y, wl, 3)) - x).max() < 1e-5
    with pytest.raises(ValueError, match="numerically unstable"):
        w.dwt(x.astype(np.float32), wl, 3)
