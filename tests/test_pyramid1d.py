"""Multi-level 1-D pyramid kernels (ops/pallas/pyramid1d.py) vs the f64
engine, in TPU interpret mode on CPU — stage splits, packed-buffer
streaming, alias chaining, and the mixed pyramid+tail routing.

Reference semantics under test: the level loop of
src/Transforms/transforms_filter.jl:13-83 / transforms_lifting.jl:30-122
(packed coefficient layout, src/Util/non_dyadic.jl:5-12)."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

import wavelets_tpu as w
from wavelets_tpu.ops.pallas import pyramid1d as PY


def _wt(wname, kind):
    return w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)


@pytest.mark.parametrize("wname,kind,n,L", [
    # shape sweep with the two flagship wavelets ...
    ("cdf97", "lifting", 1 << 16, 4),   # two full stages
    ("db2", "filter", 1 << 16, 4),
    ("cdf97", "lifting", 1 << 15, 6),   # stage + per-level/jnp tail
    ("db2", "filter", 1 << 15, 6),
    ("cdf97", "lifting", 1 << 14, 8),   # deep: stage down to the jnp tail
    ("db2", "filter", 1 << 14, 8),
    # ... and the wavelet sweep on the cheapest shape (incl. non-pow2 n)
    ("haar", "lifting", 3 * (1 << 13), 3),
    ("sym6", "filter", 3 * (1 << 13), 3),
    ("cdf97", "lifting", 3 * (1 << 13), 3),
    ("db2", "filter", 3 * (1 << 13), 3),
])
def test_pyramid_fw_inv_vs_f64(wname, kind, n, L):
    wt = _wt(wname, kind)
    stages = PY.plan_stages(n, wt, L, np.float32)
    assert stages, "plan must accept these shapes"
    rng = np.random.default_rng(5)
    x = rng.standard_normal(n).astype(np.float32)
    ref = np.asarray(w.dwt(x.astype(np.float64), _wt(wname, kind), L))
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(PY.dwt1d_pyramid(jnp.asarray(x), wt, L))
        xr = np.asarray(PY.idwt1d_pyramid(jnp.asarray(y), wt, L))
    # split3cat MXU emulation: ~2^-17 relative per dot, a few levels deep
    assert np.abs(y - ref).max() < 2e-4
    assert np.abs(xr - x).max() < 2e-4


def test_pyramid_stage_split_is_shared():
    """Forward and inverse must split stages identically (the inverse
    reads the bands the forward wrote)."""
    wt = _wt("cdf97", "lifting")
    s1 = PY.plan_stages(1 << 18, wt, 9, np.float32)
    assert sum(p[3] for _n, p in s1) <= 9
    ns = [nk for nk, _p in s1]
    assert ns == sorted(ns, reverse=True)
    for (nk, p), (nk2, _p2) in zip(s1, s1[1:]):
        assert nk2 == nk >> p[3]


def test_pyramid_matches_perlevel_wide():
    """The pyramid and the per-level folded path are independent kernels
    over the same semantics — cross-check them directly."""
    from wavelets_tpu.ops.pallas import wide1d as W1
    wt = _wt("db4", "filter")
    n, L = 1 << 15, 5
    rng = np.random.default_rng(9)
    x = rng.standard_normal(n).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(PY.dwt1d_pyramid(jnp.asarray(x), wt, L))
        b = np.asarray(W1.dwt1d_wide_nopyr(jnp.asarray(x), wt, L))
    assert np.abs(a - b).max() < 2e-4


@pytest.mark.parametrize("wname,kind", [
    ("cdf97", "lifting"), ("db2", "filter"),
])
@pytest.mark.parametrize("B,n,L", [(2, 1 << 14, 4), (3, 1 << 14, 8)])
def test_pyramid_batched_vs_f64(wname, kind, B, n, L):
    """(B, n) batches: segment-local rings + per-signal packed regions."""
    wt = _wt(wname, kind)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((B, n)).astype(np.float32)
    ref = np.stack([np.asarray(w.dwt(x[i].astype(np.float64),
                                     _wt(wname, kind), L))
                    for i in range(B)])
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(PY.dwt1d_pyramid_b(jnp.asarray(x), wt, L))
        xr = np.asarray(PY.idwt1d_pyramid_b(jnp.asarray(y), wt, L))
    assert np.abs(y - ref).max() < 2e-4
    assert np.abs(xr - x).max() < 2e-4


def test_pyramid_batched_matches_perlevel(monkeypatch):
    """The opt-in batched pyramid (WAVELETS_TPU_PYR1DB=1) routes through
    dwt1d_pallas and agrees with the default per-level route."""
    from wavelets_tpu.ops.pallas import dwt1d as D1
    wt = _wt("db4", "filter")
    x = np.random.default_rng(12).standard_normal((2, 1 << 15)).astype(
        np.float32)
    assert PY.plan_stages(1 << 15, wt, 4, np.float32)
    assert not PY.plan_stages(4096, wt, 4, np.float32)
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(D1.dwt1d_pallas(jnp.asarray(x), wt, 4))
        monkeypatch.setenv("WAVELETS_TPU_PYR1DB", "1")
        b = np.asarray(D1.dwt1d_pallas(jnp.asarray(x), wt, 4))
        c = np.asarray(PY.dwt1d_pyramid_b(jnp.asarray(x), wt, 4))
    assert np.abs(b - c).max() == 0.0   # env routing reaches the pyramid
    assert np.abs(a - b).max() < 2e-4   # ... which agrees with per-level


def test_user_vmap_routes_alias_free(monkeypatch):
    """jax.vmap(w.dwt) must not reach the alias-chained pyramid/packed
    kernels (the Pallas TPU lowering cannot batch pl.ANY aliases —
    crashed on device).  The custom_vmap guard in transforms._guard_vmap
    reroutes the batch to the alias-free variants; results must match
    the unbatched route and the reroute must actually fire (so a JAX
    upgrade cannot silently reintroduce the crash fixed in 0d090d0)."""
    import jax
    import wavelets_tpu.transforms as T
    monkeypatch.setenv("WAVELETS_TPU_PALLAS", "1")
    wt = _wt("cdf97", "lifting")
    rng = np.random.default_rng(13)
    n, L = 1 << 15, 4
    assert PY.plan_stages(n, wt, L, np.float32)   # the guarded route
    x = rng.standard_normal((2, n)).astype(np.float32)

    before = T.VMAP_REROUTES
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(jax.vmap(lambda v: w.dwt(v, wt, L))(jnp.asarray(x)))
        ref = np.asarray(w.dwt(jnp.asarray(x[0]), wt, L))
    assert T.VMAP_REROUTES > before   # the custom_vmap rule fired
    assert np.abs(y[0] - ref).max() < 2e-4


def test_pyramid_bf16(monkeypatch):
    """bfloat16 single wide signals ride the pyramid stages (native MXU
    dots, no lane rotates); the per-level wide fold rides the same
    MXU-dot formulation (round 4 — the VPU lane-roll body, which crashes
    this toolchain at bf16, is never selected for 16-bit dtypes)."""
    from wavelets_tpu.ops.pallas import wide1d as W1
    wt = _wt("cdf97", "lifting")
    n, L = 1 << 14, 4
    assert W1._fold(n, wt, jnp.bfloat16) is not None      # MXU-dot fold
    assert PY.plan_stages(n, wt, L, jnp.bfloat16)         # pyramid: ok
    assert W1.wide_ok(n, wt, L, jnp.bfloat16)             # routed via pyr
    rng = np.random.default_rng(21)
    x = rng.standard_normal(n).astype(jnp.bfloat16)
    ref = np.asarray(w.dwt(np.asarray(x, np.float64), wt, L))
    scale = np.abs(ref).max()
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(PY.dwt1d_pyramid(jnp.asarray(x), wt, L), np.float64)
        xr = np.asarray(PY.idwt1d_pyramid(jnp.asarray(y, jnp.bfloat16),
                                          wt, L), np.float64)
    assert np.abs(y - ref).max() < 0.08 * scale
    assert np.abs(xr - np.asarray(x, np.float64)).max() < 0.08 * scale
