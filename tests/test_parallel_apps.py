"""Distributed application layer vs single-device results on the virtual
8-device CPU mesh (SURVEY §2.3/§3.5: psum entropy reductions, distributed
noisest, sharded denoise)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import wavelets_tpu as w
from wavelets_tpu import parallel


def _mesh():
    # 4-device ring: same cross-shard logic as 8 at roughly half the
    # CPU shard_map compile cost (the dryrun covers the 8-device mesh)
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return parallel.make_mesh(4)


@pytest.mark.parametrize("wname,kind", [
    ("db2", "filter"),
    pytest.param("cdf97", "lifting", marks=pytest.mark.slow),
])
def test_bestbasistree_matches_single_device(wname, kind):
    mesh = _mesh()
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    rng = np.random.default_rng(91)
    x = rng.standard_normal(256)

    ref = w.bestbasistree(jnp.asarray(x), wt)
    xs = parallel.shard_rows(jnp.asarray(x).reshape(256, 1), mesh)[:, 0]
    got = parallel.bestbasistree(xs, wt, mesh=mesh)
    assert np.array_equal(ref, got)


def test_bestbasistree_limited_depth_tree():
    mesh = _mesh()
    wt = w.wt.wavelet(w.wt.db2)
    rng = np.random.default_rng(92)
    x = rng.standard_normal(64)
    ref = w.bestbasistree(jnp.asarray(x), wt, L=3)
    got = parallel.bestbasistree(jnp.asarray(x), wt, L=3, mesh=mesh)
    assert np.array_equal(ref, got)


def test_noisest_matches_single_device():
    mesh = _mesh()
    wt = w.wt.wavelet(w.wt.db2)
    rng = np.random.default_rng(93)
    x = rng.standard_normal((128, 128))
    ref = float(w.noisest(jnp.asarray(x), wt))
    xs = parallel.shard_rows(jnp.asarray(x), mesh)
    got = float(parallel.noisest(xs, wt, mesh=mesh))
    assert abs(ref - got) < 1e-6 * max(1.0, abs(ref))


def test_denoise_matches_single_device():
    mesh = _mesh()
    wt = w.wt.wavelet(w.wt.db2)
    rng = np.random.default_rng(94)
    x = w.testfunction(128, "HeaviSine")
    img = np.add.outer(x, x) + 0.1 * rng.standard_normal((128, 128))

    ref = np.asarray(w.denoise(jnp.asarray(img), wt, L=3))
    xs = parallel.shard_rows(jnp.asarray(img), mesh)
    got = np.asarray(parallel.denoise(xs, wt, L=3, mesh=mesh))
    assert np.abs(ref - got).max() < 1e-5


def test_denoise_TI_sharded_runs():
    mesh = _mesh()
    wt = w.wt.wavelet(w.wt.db2)
    rng = np.random.default_rng(95)
    img = rng.standard_normal((64, 64))
    xs = parallel.shard_rows(jnp.asarray(img), mesh)
    out = np.asarray(parallel.denoise(xs, wt, L=2, TI=True, nspin=2,
                                      mesh=mesh))
    assert out.shape == img.shape and np.isfinite(out).all()


@pytest.mark.slow   # ~2 min of shard_map compiles; the driver dryrun
def test_sharded_modwt_roundtrip_and_match():   # re-runs this per round
    """Sharded MODWT: ppermute halos while they fit one neighbor, all-
    gather for the deep levels whose dilated halo spans devices.

    256 samples over the 4-device ring = 64/shard; db4's dilated halo
    2^(j-1)*7 exceeds 64 from level 5, so L=5 covers BOTH the ppermute
    and the all-gather paths (levels 1-4 vs 5)."""
    mesh = _mesh()
    wt = w.wt.wavelet(w.wt.db4)
    rng = np.random.default_rng(96)
    x = rng.standard_normal(256)
    ref = np.asarray(w.modwt(jnp.asarray(x), wt, 5))
    got = np.asarray(parallel.modwt(jnp.asarray(x), wt, 5, mesh=mesh))
    assert np.abs(ref - got).max() < 1e-10
    xr = np.asarray(parallel.imodwt(jnp.asarray(got), wt, mesh=mesh))
    assert np.abs(xr - x).max() < 1e-10


def test_sharded_wpt_matches_and_inverts():
    mesh = _mesh()
    wt = w.wt.wavelet(w.wt.db2)
    rng = np.random.default_rng(97)
    x = rng.standard_normal(512)
    tree = w.maketree(512, 6, "full")
    ref = np.asarray(w.wpt(jnp.asarray(x), wt, tree))
    got = np.asarray(parallel.wpt(jnp.asarray(x), wt, tree, mesh=mesh))
    assert np.abs(ref - got).max() < 1e-10
    xr = np.asarray(parallel.iwpt(jnp.asarray(got), wt, tree, mesh=mesh))
    assert np.abs(xr - x).max() < 1e-10


def test_sharded_wpt_partial_tree():
    mesh = _mesh()
    wt = w.wt.wavelet(w.wt.db2)
    rng = np.random.default_rng(98)
    x = rng.standard_normal(256)
    tree = w.maketree(256, 3, "dwt")
    ref = np.asarray(w.wpt(jnp.asarray(x), wt, tree))
    got = np.asarray(parallel.wpt(jnp.asarray(x), wt, tree, mesh=mesh))
    assert np.abs(ref - got).max() < 1e-10


@pytest.mark.parametrize("boundary", ["zeropad", "symmetric"])
def test_sharded_wpt_nonperiodic(boundary):
    """Sharded WPT with non-periodic lifting boundaries: the per-segment
    extension applies along the segment axis, which GSPMD shards like any
    other op — must match the single-device wpt exactly."""
    mesh = _mesh()
    wt = w.wt.wavelet(w.wt.cdf97, "lifting", boundary)
    rng = np.random.default_rng(99)
    x = rng.standard_normal(256)
    tree = w.maketree(256, 4, "full")
    ref = np.asarray(w.wpt(jnp.asarray(x), wt, tree))
    got = np.asarray(parallel.wpt(jnp.asarray(x), wt, tree, mesh=mesh))
    assert np.abs(ref - got).max() < 1e-10, boundary
    xr = np.asarray(parallel.iwpt(jnp.asarray(got), wt, tree, mesh=mesh))
    assert np.abs(xr - x).max() < 1e-10, boundary


def test_bestbasistree_non_pow2_mesh():
    """Non-power-of-two device counts can't nest shard chunks with
    segment boundaries at every depth; the driver must fall back to the
    replicated search and still match exactly (regression: reshape
    crash / silently wrong segment sums)."""
    if len(jax.devices()) < 6:
        pytest.skip("needs 6 virtual devices")
    mesh = parallel.make_mesh(6)
    wt = w.wt.wavelet(w.wt.db2)
    x = np.random.default_rng(44).standard_normal(96)
    ref = w.bestbasistree(jnp.asarray(x), wt)
    got = parallel.bestbasistree(jnp.asarray(x), wt, mesh=mesh)
    assert np.array_equal(ref, got)


@pytest.mark.slow
def test_sharded_modwt_gather_frac_override(monkeypatch):
    """The measured halo->all_gather switch point is env-overridable
    (WAVELETS_TPU_MODWT_GATHER_FRAC, benchmarks/ab/modwt_gather.py):
    forcing an early gather (frac=0.1 -> levels 2+ gather) must match
    the single-device engine exactly."""
    monkeypatch.setenv("WAVELETS_TPU_MODWT_GATHER_FRAC", "0.1")
    mesh = _mesh()
    wt = w.wt.wavelet(w.wt.db4)
    rng = np.random.default_rng(97)
    x = rng.standard_normal(256)
    ref = np.asarray(w.modwt(jnp.asarray(x), wt, 4))
    got = np.asarray(parallel.modwt(jnp.asarray(x), wt, 4, mesh=mesh))
    assert np.abs(ref - got).max() < 1e-10


def test_parallel_entries_promote_and_validate():
    """Code-review r5 regressions: integer input promotes (the level
    bodies cast taps to the array dtype — int input used to silently
    zero them), over-large L raises a clean ValueError on every mesh
    size, parallel.modwt validates L regardless of device count, and
    TI + wt=None raises like the single-device API."""
    import jax.numpy as jnp
    mesh = _mesh()
    wt = w.wt.wavelet(w.wt.db2)
    rng = np.random.default_rng(11)
    xi = (rng.standard_normal((64, 32)) * 100).astype(np.int32)
    ref = np.asarray(w.dwt(xi, wt, 3))
    got = np.asarray(parallel.dwt2(parallel.shard_rows(
        jnp.asarray(xi), mesh), wt, 3, mesh))
    assert np.allclose(got, ref, atol=1e-9)
    with pytest.raises(ValueError):
        parallel.dwt2(jnp.zeros((96, 96)), wt, 6, mesh)
    with pytest.raises(ValueError):
        parallel.modwt(jnp.zeros(256), wt, 9, mesh=mesh)
    with pytest.raises(ValueError):
        parallel.denoise(jnp.zeros((64, 64)), None, TI=True, mesh=mesh)
    with pytest.raises(ValueError):
        w.matchingpursuit(jnp.zeros(16), lambda v: v.reshape(-1),
                          lambda v: v.reshape(4, 4), 1e-3, 2)


def test_denoise_nspin_int_kernel_route(monkeypatch):
    """nspin as a bare int must work on the kernel-route TI path (it
    crashed iterating the int while the vmap path accepted it)."""
    from wavelets_tpu.threshold import denoise as D
    rng = np.random.default_rng(12)
    x = rng.standard_normal(512).astype(np.float64)
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    ref = np.asarray(w.denoise(x, wt, L=3, TI=True, nspin=(4,)))
    # force the kernel-route branch (its internals are XLA-safe on CPU)
    monkeypatch.setattr(
        "wavelets_tpu.transforms._kernel_route_exists",
        lambda *a, **k: True)
    got = np.asarray(w.denoise(x, wt, L=3, TI=True, nspin=4))
    assert np.allclose(got, ref, atol=1e-12)
