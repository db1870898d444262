"""Boundary modes beyond periodic (zeropad / symmetric, lifting engine).

The reference declares ZPBoundary/SymBoundary but implements neither
(src/WT/wt_main.jl:33-49); wavelets_tpu implements both for the lifting
engine with exact reconstruction (every lifting step is invertible under
any deterministic extension — ops/lifting.py).  These tests pin the
semantics against a naive NumPy lifting implementation that materializes
the extension explicitly, and check round-trips, interior agreement with
periodic, and the declared periodic-only surfaces.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import wavelets_tpu as w
from wavelets_tpu.wt import (wavelet, cdf97, db2, haar, PERIODIC, ZEROPAD,
                             SYMMETRIC)
from wavelets_tpu.wt.schemes import PREDICT

BOUNDARIES = (ZEROPAD, SYMMETRIC)
CLASSES = (cdf97, db2, haar)


def _ext_read(x, idx, boundary):
    """x extended at index idx (may be out of range)."""
    n = len(x)
    if 0 <= idx < n:
        return x[idx]
    if boundary == ZEROPAD:
        return 0.0
    # half-sample symmetric: ext[-j] = x[j-1], ext[n-1+j] = x[n-j]
    if idx < 0:
        j = -idx
        return _ext_read(x, j - 1, boundary) if j - 1 < n else \
            _ext_read(x, 2 * n - j, boundary)
    j = idx - (n - 1)
    return _ext_read(x, n - j, boundary)


def _naive_lifting_fw(x, scheme, boundary):
    """Reference forward lifting level with explicit extension reads."""
    s = np.array(x[0::2], dtype=np.float64)
    d = np.array(x[1::2], dtype=np.float64)
    half = len(s)
    for step in scheme.steps:
        src = d if step.kind == PREDICT else s
        acc = np.zeros(half)
        for i in range(half):
            for k, c in enumerate(step.coef):
                acc[i] += c * _ext_read(src, i + k - step.shift, boundary)
        if step.kind == PREDICT:
            s = s - acc
        else:
            d = d - acc
    return s * scheme.norm1, d * scheme.norm2


@pytest.mark.parametrize("boundary", BOUNDARIES)
@pytest.mark.parametrize("cls", CLASSES, ids=lambda c: c.name())
def test_level_matches_naive_reference(cls, boundary):
    wt = wavelet(cls, "lifting", boundary)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(32)
    got = np.asarray(w.dwt(x, wt, 1))
    s, d = _naive_lifting_fw(x, wt, boundary)
    want = np.concatenate([s, d])
    assert np.max(np.abs(got - want)) < 1e-12


@pytest.mark.parametrize("boundary", BOUNDARIES)
@pytest.mark.parametrize("cls", CLASSES, ids=lambda c: c.name())
def test_roundtrip_1d(cls, boundary):
    wt = wavelet(cls, "lifting", boundary)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(64)
    for L in (1, 3, 6):
        y = w.dwt(x, wt, L)
        r = np.asarray(w.idwt(y, wt, L))
        assert np.max(np.abs(r - x)) < 1e-11, (L, boundary)


@pytest.mark.parametrize("boundary", BOUNDARIES)
def test_roundtrip_nd(boundary):
    wt = wavelet(cdf97, "lifting", boundary)
    rng = np.random.default_rng(1)
    img = rng.standard_normal((32, 16))
    r2 = np.asarray(w.idwt(w.dwt(img, wt, 3), wt, 3))
    assert np.max(np.abs(r2 - img)) < 1e-11
    vol = rng.standard_normal((16, 8, 8))
    r3 = np.asarray(w.idwt(w.dwt(vol, wt, 2), wt, 2))
    assert np.max(np.abs(r3 - vol)) < 1e-11


@pytest.mark.parametrize("boundary", BOUNDARIES)
def test_wpt_roundtrip(boundary):
    from wavelets_tpu.utils.trees import maketree
    wt = wavelet(db2, "lifting", boundary)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(64)
    tree = maketree(64, 4, "full")
    tree[10] = False  # prune a subtree: arbitrary-tree path
    tree[2 * 10 + 1: 2 * 10 + 3] = False
    tree[4 * 10 + 3: 4 * 10 + 7] = False
    y = w.wpt(x, wt, tree)
    r = np.asarray(w.iwpt(y, wt, tree))
    assert np.max(np.abs(r - x)) < 1e-11


def test_interior_matches_periodic():
    """Away from the edges the boundary rule is invisible: a signal that is
    zero near both ends produces identical level-1 coefficients under all
    three boundary modes."""
    rng = np.random.default_rng(4)
    x = np.zeros(128)
    x[16:112] = rng.standard_normal(96)
    outs = {}
    for b in (PERIODIC, ZEROPAD, SYMMETRIC):
        outs[b] = np.asarray(w.dwt(x, wavelet(cdf97, "lifting", b), 1))
    # not bit-identical: the edge fix-up changes XLA's fusion/reassociation
    for b in BOUNDARIES:
        assert np.max(np.abs(outs[b][10:50] - outs[PERIODIC][10:50])) < 1e-14
        assert np.max(np.abs(outs[b][74:114] - outs[PERIODIC][74:114])) < 1e-14


def test_boundaries_differ_at_edges():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(64)
    ys = [np.asarray(w.dwt(x, wavelet(cdf97, "lifting", b), 1))
          for b in (PERIODIC, ZEROPAD, SYMMETRIC)]
    assert np.max(np.abs(ys[0] - ys[1])) > 1e-3
    assert np.max(np.abs(ys[0] - ys[2])) > 1e-3
    assert np.max(np.abs(ys[1] - ys[2])) > 1e-3


def test_filter_engine_rejects_nonperiodic():
    with pytest.raises(NotImplementedError):
        wavelet(db2, "filter", SYMMETRIC)
    with pytest.raises(ValueError):
        wavelet(db2, "lifting", "reflect")


def test_sharded_boundary_support_matrix():
    """The 1-axis AND 2-axis sharded DWT drivers accept lifting
    zeropad/symmetric (tests/test_sharded.py and test_mesh2d.py check
    the values), and since round 3 sharded WPT does too
    (test_parallel_apps.py checks its values); the filter engine stays
    periodic-only everywhere (constructor-level, like the reference)."""
    from wavelets_tpu import parallel
    wt = wavelet(cdf97, "lifting", ZEROPAD)
    x = jnp.zeros((32, 32))
    y = parallel.dwt2(x, wt, 2)            # supported since late round 2
    assert y.shape == x.shape
    yw = parallel.wpt(jnp.zeros(64), wt, np.ones(63, bool))
    assert yw.shape == (64,)               # supported since round 3
    import jax
    if len(jax.devices()) >= 4:
        from wavelets_tpu.parallel import mesh2d
        yg = mesh2d.dwt2(x, wt, 2)         # 2-axis mesh too
        assert yg.shape == x.shape


def test_pallas_gate_routes_xla(monkeypatch):
    """With the Pallas override forced on, non-periodic carriers must still
    take the XLA path (and round-trip)."""
    monkeypatch.setenv("WAVELETS_TPU_PALLAS", "1")
    wt = wavelet(cdf97, "lifting", SYMMETRIC)
    rng = np.random.default_rng(6)
    img = rng.standard_normal((64, 64)).astype(np.float32)
    y = w.dwt(img, wt, 2)
    r = np.asarray(w.idwt(y, wt, 2))
    assert np.max(np.abs(r - img)) < 1e-5


@pytest.mark.parametrize("boundary", [ZEROPAD, SYMMETRIC])
def test_wpt_nonperiodic(boundary):
    """WPT over boundary wavelets: each segment extends independently
    (the XLA lifting path is boundary-aware per segment); exact
    reconstruction over a random valid tree."""
    import wavelets_tpu as ww
    rng = np.random.default_rng(67)
    x = rng.standard_normal(256)
    wt = wavelet(cdf97, "lifting", boundary)
    tree = ww.maketree(256, 4, "full")
    y = ww.wpt(x, wt, tree)
    xr = ww.iwpt(y, wt, tree)
    assert np.allclose(np.asarray(xr), x, atol=1e-11), boundary
    # differs from the periodic tree at the segment edges
    yp = ww.wpt(x, wavelet(cdf97, "lifting"), tree)
    assert not np.allclose(np.asarray(y), np.asarray(yp))
