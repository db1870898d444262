"""2-axis mesh sharding: grid-sharded == single-device."""

import numpy as np
import jax
import pytest

import wavelets_tpu as w
from wavelets_tpu.parallel import mesh2d


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return mesh2d.make_mesh2d((4, 2))


@pytest.mark.parametrize("wname,kind", [
    ("haar", "filter"), ("db2", "filter"),
    ("db2", "lifting"), ("cdf97", "lifting"),
])
def test_grid_matches_single(mesh, wname, kind):
    rng = np.random.default_rng(66)
    x = rng.standard_normal((64, 32))
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    L = 3
    ref = np.asarray(w.dwt(x, wt, L))
    xs = mesh2d.shard_grid(x, mesh)
    ys = mesh2d.dwt2(xs, wt, L, mesh)
    assert np.allclose(np.asarray(ys), ref, atol=1e-11), wname
    xr = mesh2d.idwt2(ys, wt, L, mesh)
    assert np.allclose(np.asarray(xr), x, atol=1e-11), wname


def test_grid_deep_fallback(mesh):
    rng = np.random.default_rng(67)
    x = rng.standard_normal((64, 64))
    wt = w.wt.wavelet(w.wt.db2)
    L = 6
    ref = np.asarray(w.dwt(x, wt, L))
    ys = mesh2d.dwt2(mesh2d.shard_grid(x, mesh), wt, L, mesh)
    assert np.allclose(np.asarray(ys), ref, atol=1e-11)
    assert np.allclose(np.asarray(mesh2d.idwt2(ys, wt, L, mesh)), x,
                       atol=1e-11)


@pytest.mark.parametrize("boundary", ["zeropad", "symmetric"])
def test_mesh2d_nonperiodic_boundaries(mesh, boundary):
    """Both sharded axes apply the extension at their mesh edges: values
    must match the single-device lifting path exactly."""
    rng = np.random.default_rng(66)
    x = rng.standard_normal((64, 64))
    wt = w.wt.wavelet(w.wt.cdf97, "lifting", boundary)
    ref = np.asarray(w.dwt(x, wt, 2))
    ys = mesh2d.dwt2(mesh2d.shard_grid(x, mesh), wt, 2, mesh)
    assert np.allclose(np.asarray(ys), ref, atol=1e-11), boundary
    xr = mesh2d.idwt2(ys, wt, 2, mesh)
    assert np.allclose(np.asarray(xr), x, atol=1e-11), boundary

@pytest.mark.parametrize("wname,kind", [
    ("db2", "filter"), ("cdf97", "lifting"),
])
def test_grid_3d_matches_single(mesh, wname, kind):
    """3-D volumes sharded P(x, y, None): planes/rows/cols order must
    match the single-device packed layout exactly."""
    rng = np.random.default_rng(68)
    x = rng.standard_normal((32, 16, 16))
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    L = 2
    ref = np.asarray(w.dwt(x, wt, L))
    xs = mesh2d.shard_grid3(x, mesh)
    ys = mesh2d.dwt3(xs, wt, L, mesh)
    assert np.allclose(np.asarray(ys), ref, atol=1e-11), wname
    xr = mesh2d.idwt3(ys, wt, L, mesh)
    assert np.allclose(np.asarray(xr), x, atol=1e-11), wname


def test_grid_3d_deep_fallback_and_boundary(mesh):
    rng = np.random.default_rng(69)
    x = rng.standard_normal((32, 32, 8))
    wt = w.wt.wavelet(w.wt.cdf97, "lifting", "zeropad")
    ref = np.asarray(w.dwt(x, wt, 3))   # level 3 falls below _can_shard
    ys = mesh2d.dwt3(mesh2d.shard_grid3(x, mesh), wt, 3, mesh)
    assert np.allclose(np.asarray(ys), ref, atol=1e-11)
    assert np.allclose(
        np.asarray(mesh2d.idwt3(ys, wt, 3, mesh)), x, atol=1e-11)


def test_grid_apps_denoise_noisest(mesh):
    """The app layer runs on the 2-axis mesh: distributed noisest and
    denoise must match the single-device results."""
    from wavelets_tpu import parallel
    rng = np.random.default_rng(70)
    wt = w.wt.wavelet(w.wt.db2)
    base = w.testfunction(64, "HeaviSine")
    img = np.add.outer(base, base) + 0.1 * rng.standard_normal((64, 64))

    sref = float(w.noisest(img, wt))
    xs = mesh2d.shard_grid(img, mesh)
    sgot = float(parallel.noisest(xs, wt, mesh=mesh))
    assert abs(sref - sgot) < 1e-9 * max(1.0, abs(sref))

    dref = np.asarray(w.denoise(img, wt, L=3))
    dgot = np.asarray(parallel.denoise(xs, wt, L=3, mesh=mesh))
    assert np.abs(dref - dgot).max() < 1e-9


def test_grid_apps_accept_1d_signals(mesh):
    """Rank-1 inputs on a 2-axis mesh fall back to the ring driver over
    the first mesh axis (regression: the grid dispatch raised on them)."""
    import jax.numpy as jnp
    from wavelets_tpu import parallel
    rng = np.random.default_rng(71)
    x = rng.standard_normal(256)
    wt = w.wt.wavelet(w.wt.db2)
    got = np.asarray(parallel.apps._mesh_dwt(
        jnp.asarray(x), wt, 3, mesh, "x", True))
    ref = np.asarray(w.dwt(x, wt, 3))
    assert np.abs(got - ref).max() < 1e-11
