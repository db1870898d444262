"""Wavelet definition layer: filters, classes, QMF pairs, daubechies."""

import numpy as np
import pytest

import wavelets_tpu as w
from wavelets_tpu.wt import daubechies, makeqmfpair, makereverseqmfpair


def test_daubechies_known_values():
    # db1 == haar
    h1 = daubechies(1)
    assert np.allclose(h1, [1 / np.sqrt(2)] * 2, atol=1e-14)
    # db2: the classic D4 coefficients (Daubechies 1988)
    h2 = daubechies(2)
    s = np.sqrt(3)
    expect = np.array([1 + s, 3 + s, 3 - s, 1 - s]) / (4 * np.sqrt(2))
    assert np.allclose(h2, expect, atol=1e-12)


@pytest.mark.parametrize("N", range(1, 11))
def test_daubechies_qmf_conditions(N):
    h = daubechies(N)
    assert len(h) == 2 * N
    assert np.linalg.norm(h) == pytest.approx(1.0, abs=1e-12)
    assert np.sum(h) == pytest.approx(np.sqrt(2), abs=1e-9)
    # orthogonality of even shifts
    for k in range(1, N):
        assert np.dot(h[2 * k:], h[: len(h) - 2 * k]) == pytest.approx(0, abs=1e-9)


def test_all_filters_normalized():
    for name, cls in w.wt.ALL_CLASSES.items():
        if name == "cdf97":
            continue
        f = w.wt.wavelet(cls)
        assert np.linalg.norm(f.qmf_array()) == pytest.approx(1.0, abs=1e-9), name
        assert f.name == name


def test_classes():
    for c in (w.wt.haar, w.wt.db2, w.wt.cdf97):
        c.class_name()
        c.name()
        c.vanishingmoments()
    assert w.wt.db2.vanishingmoments() == 2
    assert w.wt.cdf97.vanishingmoments() == (9, 7)
    assert w.wt.cdf97.name() == "cdf9/7"


def test_carrier_ops():
    f = w.wt.wavelet(w.wt.db1)
    assert len(f) == 2
    assert np.allclose(f.scale(0.7).qmf_array(), f.qmf_array() * 0.7)


def test_qmf_pairs():
    f = w.wt.wavelet(w.wt.db2)
    h = f.qmf_array()
    sc, dc = makereverseqmfpair(f, True)
    assert np.allclose(sc, h[::-1])
    assert np.allclose(dc, w.mirror(h))
    sc_i, dc_i = makereverseqmfpair(f, False)
    assert np.allclose(sc_i, h)
    assert np.allclose(dc_i, w.mirror(h)[::-1])
    sc2, dc2 = makeqmfpair(f, True)
    assert np.allclose(sc2, sc[::-1])


def test_lifting_construction():
    g = w.wt.wavelet(w.wt.cdf97, "lifting")
    assert isinstance(g, w.GLS)
    assert len(g.steps) == 4
    g2 = w.wt.wavelet(w.wt.db2, "lifting")
    assert len(g2.steps) == 3


def test_wavelet_errors():
    with pytest.raises(ValueError):
        w.wt.wavelet(w.wt.Coiflet(33))
    with pytest.raises(ValueError):
        w.wt.wavelet(w.wt.cdf97, "filter")  # biortho has no ortho filter
    # sym5 "lifting" now WORKS (wt/factor.py factorization); the
    # truncated Battle-Lemarie tables are the ones with no valid scheme
    assert w.wt.wavelet(w.wt.sym5, "lifting").name == "sym5"
    with pytest.raises(ValueError):
        w.wt.wavelet(w.wt.ALL_CLASSES["batt4"], "lifting")
    with pytest.raises(ValueError):
        w.wt.wavelet(w.wt.db2, "nope")
    with pytest.raises(ValueError):
        w.wt.wavelet(w.wt.db2, "filter", "zero")  # unsupported boundary
    with pytest.raises(ValueError):
        w.wt.Daubechies(0)


def test_hashable_static_args():
    # carriers must be hashable (used as static jit args)
    a = w.wt.wavelet(w.wt.db2)
    b = w.wt.wavelet(w.wt.db2)
    assert hash(a) == hash(b) and a == b
    ga = w.wt.wavelet(w.wt.cdf97, "lifting")
    gb = w.wt.wavelet(w.wt.cdf97, "lifting")
    assert hash(ga) == hash(gb) and ga == gb
