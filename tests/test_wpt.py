"""Wavelet packet transform.  Mirrors /root/reference/test/transforms.jl
WPT testset (manual per-segment composition, dwt-tree equivalence,
round-trips, non-dyadic lengths)."""

import numpy as np
import pytest

import wavelets_tpu as w


def test_wpt_manual_composition():
    rng = np.random.default_rng(21)
    wf = w.wt.wavelet(w.wt.db2)
    x = rng.standard_normal(16)

    wp = np.asarray(w.wpt(x, wf, L=1))
    dw = np.asarray(w.dwt(x, wf, 1))
    assert np.allclose(wp, dw, atol=1e-12)
    assert np.allclose(np.asarray(w.iwpt(wp, wf, L=1)), x, atol=1e-12)

    wp = np.asarray(w.wpt(x, wf, L=2))
    dw = np.asarray(w.dwt(x, wf, 2))
    dw2 = dw.copy()
    dw2[8:] = np.asarray(w.dwt(dw[8:], wf, 1))
    assert np.allclose(dw[:8], wp[:8], atol=1e-12)
    assert np.allclose(dw2, wp, atol=1e-12)
    assert np.allclose(np.asarray(w.iwpt(wp, wf, L=2)), x, atol=1e-12)

    wp = np.asarray(w.wpt(x, wf, L=3))
    dw = np.asarray(w.dwt(x, wf, 3))
    assert np.allclose(dw[:4], wp[:4], atol=1e-12)
    for seg in range(1, 4):
        lo, hi = 4 * seg, 4 * seg + 4
        assert np.allclose(np.asarray(w.dwt(dw2[lo:hi], wf, 1)), wp[lo:hi],
                           atol=1e-12)
    assert np.allclose(np.asarray(w.iwpt(wp, wf, L=3)), x, atol=1e-12)


def test_wpt_lifting_vs_filter():
    rng = np.random.default_rng(22)
    x = rng.standard_normal(128)
    wf = w.wt.wavelet(w.wt.db2)
    wl = w.wt.wavelet(w.wt.db2, "lifting")
    assert np.allclose(np.asarray(w.iwpt(w.wpt(x, wf), wf)), x, atol=1e-11)
    assert np.allclose(np.asarray(w.iwpt(w.wpt(x, wl), wl)), x, atol=1e-11)
    for L in (1, 2, 4, None):
        a = np.asarray(w.wpt(x, wl, L=L))
        b = np.asarray(w.wpt(x, wf, L=L))
        assert np.linalg.norm(a - b) < 1e-10 * np.sqrt(x.size)


@pytest.mark.parametrize("n", [128, 40])
def test_wpt_dwt_tree_equivalence(n):
    rng = np.random.default_rng(23)
    x = rng.standard_normal(n)
    for wt in (w.wt.wavelet(w.wt.db2), w.wt.wavelet(w.wt.db2, "lifting")):
        for L in range(w.maxtransformlevels(n) + 1):
            tree = w.maketree(n, L, "dwt")
            assert np.allclose(np.asarray(w.wpt(x, wt, tree)),
                               np.asarray(w.dwt(x, wt, L)), atol=1e-11)
            assert np.allclose(np.asarray(w.iwpt(x, wt, tree)),
                               np.asarray(w.idwt(x, wt, L)), atol=1e-11)


def test_wpt_arbitrary_tree_roundtrip():
    rng = np.random.default_rng(24)
    n = 64
    x = rng.standard_normal(n)
    # random valid tree: start full, randomly prune subtrees
    tree = w.maketree(n, 4, "full")
    for i in range(len(tree)):
        if tree[i] and rng.random() < 0.4:
            # prune node i's subtree
            stack = [i]
            while stack:
                j = stack.pop()
                if j < len(tree) and tree[j]:
                    tree[j] = False
                    stack.extend([2 * j + 1, 2 * j + 2])
    assert w.isvalidtree(n, tree)
    for wt in (w.wt.wavelet(w.wt.db3), w.wt.wavelet(w.wt.cdf97, "lifting")):
        y = w.wpt(x, wt, tree)
        assert np.allclose(np.asarray(w.iwpt(y, wt, tree)), x, atol=1e-11)


def test_wpt_invalid_tree():
    n = 16
    tree = w.maketree(n, 2, "full")
    tree[0] = False  # orphan children
    with pytest.raises(ValueError):
        w.wpt(np.zeros(n), w.wt.wavelet(w.wt.db2), tree)


def test_wpt_batched():
    rng = np.random.default_rng(25)
    xb = rng.standard_normal((3, 32))
    wf = w.wt.wavelet(w.wt.db2)
    yb = np.asarray(w.wpt(xb, wf, L=3))
    for i in range(3):
        assert np.allclose(yb[i], np.asarray(w.wpt(xb[i], wf, L=3)), atol=1e-12)


def test_wpt_int_third_positional_is_levels():
    """Reference L-or-tree overload: wpt(x, wt, 3) == wpt(x, wt, L=3)."""
    import numpy as np
    import wavelets_tpu as w
    x = np.random.default_rng(5).standard_normal(256)
    wt = w.wt.wavelet(w.wt.db2)
    a = np.asarray(w.wpt(x, wt, 3))
    b = np.asarray(w.wpt(x, wt, L=3))
    assert np.array_equal(a, b)
    assert np.abs(np.asarray(w.iwpt(a, wt, 3)) - x).max() < 1e-10
    import pytest
    with pytest.raises(ValueError):
        w.wpt(x, wt, 3, L=4)
