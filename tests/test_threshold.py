"""Threshold layer: operator semantics, denoising variants, best basis,
entropy, matching pursuit.  Mirrors /root/reference/test/threshold.jl with
stronger (value-level) assertions."""

import numpy as np
import jax.numpy as jnp
import pytest

import wavelets_tpu as w


def test_threshold_operators_values():
    x = np.array([-3.0, -1.5, -0.5, 0.0, 0.5, 1.5, 3.0])
    t = 1.0
    hard = np.asarray(w.threshold(x, w.HardTH(), t))
    assert np.allclose(hard, [-3, -1.5, 0, 0, 0, 1.5, 3])
    soft = np.asarray(w.threshold(x, w.SoftTH(), t))
    assert np.allclose(soft, [-2, -0.5, 0, 0, 0, 0.5, 2])
    semi = np.asarray(w.threshold(x, w.SemiSoftTH(), t))
    # |x|<=t -> 0; t<|x|<2t -> 2(|x|-t)sign; |x|>2t -> x
    assert np.allclose(semi, [-3, -1, 0, 0, 0, 1, 3])
    stein = np.asarray(w.threshold(x, w.SteinTH(), t))
    with np.errstate(divide="ignore"):
        sh = 1 - t ** 2 / np.where(x == 0, np.inf, x) ** 2
    expect = np.where(sh < 0, 0, x * sh)
    assert np.allclose(stein, expect)
    pos = np.asarray(w.threshold(x, w.PosTH()))
    assert np.allclose(pos, [-3, -1.5, -0.5, 0, 0, 0, 0])
    neg = np.asarray(w.threshold(x, w.NegTH()))
    assert np.allclose(neg, [0, 0, 0, 0, 0.5, 1.5, 3])


def test_biggest_mterm():
    rng = np.random.default_rng(41)
    x = rng.standard_normal(100)
    y = np.asarray(w.threshold(x, w.BiggestTH(), 10))
    assert np.sum(y != 0) == 10
    kept = np.argsort(np.abs(x))[-10:]
    assert set(np.nonzero(y)[0]) == set(kept)
    # matrix input works (reference's out-of-place version errors on this)
    xm = rng.standard_normal((10, 10))
    ym = np.asarray(w.threshold(xm, w.BiggestTH(), 5))
    assert ym.shape == xm.shape and np.sum(ym != 0) == 5
    assert np.sum(np.asarray(w.threshold(x, w.BiggestTH(), 0)) != 0) == 0
    assert np.sum(np.asarray(w.threshold(x, w.BiggestTH(), 1000)) != 0) == 100


def test_threshold_smoke_all():
    rng = np.random.default_rng(42)
    x = rng.standard_normal(200) * 2
    for th in (w.BiggestTH(), w.HardTH(), w.SoftTH(), w.SemiSoftTH(),
               w.SteinTH()):
        w.threshold(x, th, 2)
    for th in (w.PosTH(), w.NegTH()):
        w.threshold(x, th)


def test_visushrink():
    vs = w.VisuShrink.for_length(10)
    assert vs.t == pytest.approx(np.sqrt(2 * np.log(10)))
    assert isinstance(vs.th, w.HardTH)


def test_denoise_variants():
    rng = np.random.default_rng(43)
    n = 256
    x0 = w.testfunction(n, "Doppler")
    x = x0 + 0.05 * rng.standard_normal(n)
    y = np.asarray(w.denoise(x, TI=True))
    assert np.mean((y - x0) ** 2) < np.mean((x - x0) ** 2)
    y = np.asarray(w.denoise(x, TI=True, nspin=8))
    assert np.isfinite(y).all()
    y = np.asarray(w.denoise(x, TI=False))
    assert np.mean((y - x0) ** 2) < np.mean((x - x0) ** 2)
    y = np.asarray(w.denoise(x, None))
    assert np.isfinite(y).all()
    y2 = np.asarray(w.denoise(rng.standard_normal((32, 32)), TI=True,
                              nspin=(2, 2)))
    assert y2.shape == (32, 32)
    with pytest.raises(ValueError):
        w.denoise(x, None, TI=True)
    with pytest.raises(ValueError):
        w.denoise(rng.standard_normal((8, 16)))  # must be square


def test_noisest():
    rng = np.random.default_rng(44)
    sigma = 0.25
    x = w.testfunction(2048, "HeaviSine") + sigma * rng.standard_normal(2048)
    est = float(w.noisest(x))
    assert 0.5 * sigma < est < 2.0 * sigma


def test_entropy_values():
    x = jnp.asarray(np.array([1.0, 0.0, 0.0, 0.0]))
    # concentrated energy -> zero Shannon entropy with nrm = |x|
    assert float(w.coefentropy(x, w.ShannonEntropy())) == pytest.approx(0.0)
    y = jnp.asarray(np.full(4, 0.5))
    # uniform: s = 1/4 each, sum(-s log s) = log 4
    assert float(w.coefentropy(y, w.ShannonEntropy())) == pytest.approx(
        np.log(4.0))
    # concentration ordering
    rng = np.random.default_rng(45)
    spread = rng.standard_normal(64)
    conc = np.zeros(64); conc[0] = np.linalg.norm(spread)
    assert float(w.coefentropy(jnp.asarray(conc), w.ShannonEntropy())) <= \
        float(w.coefentropy(jnp.asarray(spread), w.ShannonEntropy()))
    assert np.isfinite(float(w.coefentropy(y, w.LogEnergyEntropy())))


@pytest.mark.parametrize("n", [1024, 5 * 64])
def test_bestbasis_roundtrip(n):
    wt = w.wt.wavelet(w.wt.db4)
    x = np.sin(4 * np.linspace(0, 2 * np.pi, n, endpoint=False))
    tree = w.bestbasistree(x, wt)
    assert w.isvalidtree(n, tree)
    xtb = w.wpt(x, wt, tree)
    assert np.allclose(np.asarray(w.iwpt(xtb, wt, tree)), x, atol=1e-10)


def test_bestbasis_beats_dwt_entropy():
    """The best-basis coefficients should be at least as concentrated as the
    full-depth packet tree's leaves."""
    n = 512
    wt = w.wt.wavelet(w.wt.db4)
    x = np.sin(32 * np.linspace(0, 2 * np.pi, n, endpoint=False))
    tree = w.bestbasistree(x, wt)
    y_best = np.asarray(w.wpt(x, wt, tree))
    y_full = np.asarray(w.wpt(x, wt))
    nrm = np.linalg.norm(x)
    e_best = float(w.coefentropy(jnp.asarray(y_best), w.ShannonEntropy(), nrm))
    e_full = float(w.coefentropy(jnp.asarray(y_full), w.ShannonEntropy(), nrm))
    assert e_best <= e_full + 1e-9


def test_matchingpursuit():
    rng = np.random.default_rng(46)
    # orthonormal dictionary: exact recovery drives residual below tol
    wt = w.wt.wavelet(w.wt.db2)
    x = np.asarray(w.testfunction(64, "Bumps"))
    f = lambda v: w.idwt(v, wt)
    ft = lambda v: w.dwt(v, wt)
    y = w.matchingpursuit(jnp.asarray(x), f, ft, tol=1e-6)
    assert np.linalg.norm(np.asarray(f(y)) - x) < 1e-5
    # overcomplete random dictionary, loose tol, capped atoms
    N, M = 128, 64
    A = rng.standard_normal((M, N)) / np.sqrt(M)
    Aj = jnp.asarray(A)
    xr = A @ rng.standard_normal(N)
    y = w.matchingpursuit(jnp.asarray(xr), lambda a: Aj @ a,
                          lambda a: Aj.T @ a, tol=0.1 * np.linalg.norm(xr),
                          nmax=200)
    assert np.linalg.norm(A @ np.asarray(y) - xr) <= \
        0.5 * np.linalg.norm(xr)


def test_visushrink_constructors():
    # reference overloads (denoising.jl:36-44): VisuShrink(n) == universal
    # threshold with the default hard operator; VisuShrink(th, t) explicit
    v1 = w.VisuShrink(1024)
    assert v1 == w.VisuShrink.for_length(1024)
    assert isinstance(v1.th, w.HardTH)
    assert abs(v1.t - np.sqrt(2 * np.log(1024))) < 1e-12
    v2 = w.VisuShrink(w.SoftTH(), 2.5)
    assert isinstance(v2.th, w.SoftTH) and v2.t == 2.5
    assert issubclass(w.VisuShrink, w.DNFT)
    assert issubclass(w.ShannonEntropy, w.Entropy)


def test_prune_device_matches_host_reference():
    """prune_tree_device (production: on-device min-prune, packed-bit
    fetch) must agree with the host reference prune_tree on random
    entropy heaps and random admissible trees, including the heap-depth
    edge cases."""
    from wavelets_tpu.threshold.entropy import prune_tree, prune_tree_device
    rng = np.random.default_rng(5)
    for trial in range(120):
        D = int(rng.integers(1, 7))
        ntree = 2 ** D - 1
        n_af = (ntree + 1) // 2
        # random valid (orphan-free) tree: random active prefix depth,
        # then random pruning from the bottom up
        tree = np.zeros(ntree, dtype=bool)
        tree[: 2 ** int(rng.integers(1, D + 1)) - 1] = True
        drop = rng.random(ntree) < 0.3
        for i in range(ntree):
            if drop[i] or (i > 0 and not tree[(i - 1) // 2]):
                tree[i] = False
        bf = rng.random(ntree)
        af = rng.random(n_af)
        host = prune_tree(tree, bf, af, 1 << D)
        levels = [jnp.asarray(bf[2 ** d - 1: 2 ** (d + 1) - 1])
                  for d in range(D)]
        dev = prune_tree_device(tree, levels, jnp.asarray(af))
        assert np.array_equal(host, dev), (trial, D)


def test_ti_spin_host_loop_matches_vmap_path():
    """The TPU kernel-route TI path (host loop over _ti_spin_add with
    dynamic_slice rolls of pre-padded buffers) must reproduce the
    vmapped jnp.roll formulation exactly — both orderings sum the same
    spins (VERDICT r4 item 5 rewrite; the traced-shift jnp.roll gather
    was ~70 ms/spin of the round-4 capture)."""
    import jax
    import jax.numpy as jnp
    from wavelets_tpu.threshold.denoise import (_ti_spin_add, noisest,
                                                VisuShrink, _spin_shifts)
    rng = np.random.default_rng(99)
    x = rng.standard_normal((64, 64)).astype(np.float64)
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    L, nspin = 3, (4, 4)
    ref = np.asarray(w.denoise(x, wt, L=L, TI=True, nspin=nspin))

    dnt = VisuShrink.for_length(x.shape[0])
    t = noisest(jnp.asarray(x), wt) * dnt.t
    shifts = _spin_shifts(nspin, 2)
    smax = tuple(s - 1 for s in nspin)
    xp = jnp.asarray(x)
    for ax, s in enumerate(smax):
        head = jax.lax.slice_in_dim(xp, xp.shape[ax] - s, xp.shape[ax],
                                    axis=ax)
        xp = jnp.concatenate([head, xp], axis=ax)
    acc = jnp.zeros_like(jnp.asarray(x))
    for sh in shifts:
        acc = _ti_spin_add(acc, xp, jnp.asarray(sh, jnp.int32), t, wt,
                           L, dnt.th, smax, x.shape)
    got = np.asarray(acc) / len(shifts)
    assert np.allclose(got, ref, atol=1e-12)


def test_bestbasis_nonperiodic_stays_on_flat_path(monkeypatch):
    """The transposed deep-depth packet path is periodic-only; zeropad/
    symmetric lifting wavelets must produce the SAME tree as the
    boundary-aware flat formulation (code-review r5: the ungated
    transposed path silently computed periodic deep levels, 0.37
    max-abs coefficient error at seg=64)."""
    from wavelets_tpu.threshold import entropy as E
    rng = np.random.default_rng(7)
    x = rng.standard_normal(512)
    for boundary in ("zeropad", "symmetric", "periodic"):
        wt = w.wt.wavelet(w.wt.cdf97, "lifting", boundary)
        got = w.bestbasistree(x, wt)
        # force the flat path everywhere as the reference
        monkeypatch.setattr(E, "_T_SEG", 0)
        E._bbt_jit._clear_cache()
        ref = w.bestbasistree(x, wt)
        monkeypatch.setattr(E, "_T_SEG", 128)
        E._bbt_jit._clear_cache()
        assert np.array_equal(got, ref), boundary
