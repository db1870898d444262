"""Pallas kernels vs the jnp engines, in TPU interpret mode on CPU —
the hardware-free accelerator testing strategy (analogue of the
reference's JLArrays-backed GPU tests, test/gpu.jl)."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

import wavelets_tpu as w
from wavelets_tpu.ops.pallas import lifting2d as P


@pytest.mark.parametrize("wname", ["cdf97", "db2", "haar"])
@pytest.mark.parametrize("shape", [(64, 512), (256, 256)])
def test_pallas_lifting_level_matches_jnp(wname, shape):
    scheme = w.wt.wavelet(w.wt.ALL_CLASSES[wname], "lifting")
    rng = np.random.default_rng(71)
    x = rng.standard_normal(shape).astype(np.float32)
    assert P.pallas_ok(shape, scheme, 1, np.float32)

    ref = np.asarray(w.dwt(x.astype(np.float64),
                           w.wt.wavelet(w.wt.ALL_CLASSES[wname], "lifting"), 1))
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(P.dwt2_lifting(jnp.asarray(x), scheme, 1))
    assert np.abs(y - ref).max() < 1e-4

    with pltpu.force_tpu_interpret_mode():
        xr = np.asarray(P.idwt2_lifting(jnp.asarray(y), scheme, 1))
    assert np.abs(xr - x).max() < 1e-4


def test_pallas_multilevel_with_tail_fallback():
    """Deep levels drop below the tile plan and use the jnp fallback."""
    scheme = w.wt.wavelet(w.wt.cdf97, "lifting")
    rng = np.random.default_rng(72)
    x = rng.standard_normal((256, 256)).astype(np.float32)
    L = 3  # levels 2,3 run at 128,64 wide -> fallback path
    ref = np.asarray(w.dwt(x.astype(np.float64),
                           w.wt.wavelet(w.wt.cdf97, "lifting"), L))
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(P.dwt2_lifting(jnp.asarray(x), scheme, L))
    assert np.abs(y - ref).max() < 1e-3
    with pltpu.force_tpu_interpret_mode():
        xr = np.asarray(P.idwt2_lifting(jnp.asarray(y), scheme, L))
    assert np.abs(xr - x).max() < 1e-4


def test_butterfly_lanes_roundtrip():
    import jax
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(73)
    v = rng.standard_normal((8, 512)).astype(np.float32)

    def run(fn, inp):
        def kern(i_ref, o_ref):
            o_ref[:] = fn(i_ref[:])
        with pltpu.force_tpu_interpret_mode():
            return np.asarray(pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(inp.shape, inp.dtype),
            )(jnp.asarray(inp)))

    de = run(P._deint_lanes, v)
    expect = np.concatenate([v[:, 0::2], v[:, 1::2]], axis=1)
    assert np.array_equal(de, expect)
    back = run(P._int_lanes, de)
    assert np.array_equal(back, v)


@pytest.mark.parametrize("wname", ["haar", "db2", "db4", "coif4"])
def test_pallas_filter_matches_jnp(wname):
    from wavelets_tpu.ops.pallas import filter2d as F
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname])
    rng = np.random.default_rng(74)
    x = rng.standard_normal((256, 256)).astype(np.float32)
    assert F.pallas_ok(x.shape, wt, 1, np.float32)
    ref = np.asarray(w.dwt(x.astype(np.float64), wt, 2))
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(F.dwt2_filter(jnp.asarray(x), wt, 2))
        xr = np.asarray(F.idwt2_filter(jnp.asarray(y), wt, 2))
    assert np.abs(y - ref).max() < 1e-4
    assert np.abs(xr - x).max() < 1e-4


@pytest.mark.parametrize("wname,kind", [
    ("db4", "filter"), ("cdf97", "lifting"),
])
def test_pallas_1d_batched(wname, kind):
    from wavelets_tpu.ops.pallas import dwt1d as D1
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    rng = np.random.default_rng(75)
    x = rng.standard_normal((16, 512)).astype(np.float32)
    assert D1.pallas_ok(x.shape, wt, 1, np.float32)
    ref = np.asarray(w.dwt(x.astype(np.float64), wt, 4, ndt=1))
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(D1.dwt1d_pallas(jnp.asarray(x), wt, 4))
        xr = np.asarray(D1.idwt1d_pallas(jnp.asarray(y), wt, 4))
    assert np.abs(y - ref).max() < 1e-4
    assert np.abs(xr - x).max() < 1e-4


@pytest.mark.parametrize("wname,kind", [("db2", "filter"),
                                        ("cdf97", "lifting")])
def test_pallas_3d(wname, kind):
    from wavelets_tpu.ops.pallas import dwt3d as D3
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    rng = np.random.default_rng(76)
    x = rng.standard_normal((32, 32, 256)).astype(np.float32)
    assert D3.pallas_ok(x.shape, wt, 1, np.float32)
    ref = np.asarray(w.dwt(x.astype(np.float64), wt, 2))
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(D3.dwt3_pallas(jnp.asarray(x), wt, 2))
        xr = np.asarray(D3.idwt3_pallas(jnp.asarray(y), wt, 2))
    assert np.abs(y - ref).max() < 1e-4
    # 3 axes x 2 levels, forward + inverse: ~12 split3 dot passes of
    # ~2^-17 relative each accumulate slightly past the 1e-4 contract
    assert np.abs(xr - x).max() < 2e-4


def test_pallas_modwt():
    from wavelets_tpu.ops.pallas import modwt1d as M
    wt = w.wt.wavelet(w.wt.db4)
    rng = np.random.default_rng(77)
    x = rng.standard_normal((16, 512)).astype(np.float32)
    assert M.pallas_ok(x.shape, wt, np.float32)
    ref = np.asarray(w.modwt(x.astype(np.float64), wt, 6))
    with pltpu.force_tpu_interpret_mode():
        W = np.asarray(M.modwt_pallas(jnp.asarray(x), wt, 6))
        xr = np.asarray(M.imodwt_pallas(jnp.asarray(W), wt))
    assert np.abs(W - ref).max() < 1e-4
    assert np.abs(xr - x).max() < 1e-4


def test_pallas_ok_gating():
    scheme = w.wt.wavelet(w.wt.cdf97, "lifting")
    assert not P.pallas_ok((100, 512), scheme, 1, np.float32)  # m % 16
    assert not P.pallas_ok((512, 100), scheme, 1, np.float32)  # n % 256
    assert not P.pallas_ok((512, 512), scheme, 1, np.float64)  # dtype
    assert not P.pallas_ok((512,), scheme, 1, np.float32)      # rank
    assert P.pallas_ok((512, 512), scheme, 8, np.float32)


@pytest.mark.parametrize("wname,kind", [
    ("db4", "filter"), ("cdf97", "lifting"),
])
def test_pallas_wide_1d(wname, kind):
    """Folded (n,) -> (R, C) wide single-signal kernels vs f64 engine."""
    from wavelets_tpu.ops.pallas import wide1d as W1
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    rng = np.random.default_rng(77)
    n = 1 << 14
    x = rng.standard_normal(n).astype(np.float32)
    assert W1.wide_ok(n, wt, 4, np.float32)
    ref = np.asarray(w.dwt(x.astype(np.float64),
                           w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind), 4))
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(W1.dwt1d_wide(jnp.asarray(x), wt, 4))
        xr = np.asarray(W1.idwt1d_wide(jnp.asarray(y), wt, 4))
    assert np.abs(y - ref).max() < 1e-4
    assert np.abs(xr - x).max() < 1e-4


@pytest.mark.parametrize("wname,kind", [
    ("db4", "filter"), ("cdf97", "lifting"),
])
def test_pallas_wide_1d_batched(wname, kind):
    """Batched (B, n) wide fold — WPT's shallow-depth route — must match
    per-row transforms exactly (the sublane halo ring wraps within each
    segment, not across segments)."""
    from wavelets_tpu.ops.pallas import wide1d as W1
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    wt64 = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    rng = np.random.default_rng(79)
    n = 1 << 14
    for B in (1, 2, 4):
        x = rng.standard_normal((B, n)).astype(np.float32)
        ref = np.stack([np.asarray(w.dwt(x[i].astype(np.float64), wt64, 1))
                        for i in range(B)])
        with pltpu.force_tpu_interpret_mode():
            s, d = W1._level_wide_b(jnp.asarray(x), wt, True)
            y = np.concatenate([np.asarray(s), np.asarray(d)], axis=-1)
            xr = np.asarray(W1._level_wide_b(
                (jnp.asarray(s), jnp.asarray(d)), wt, False))
        assert np.abs(y - ref).max() < 1e-4, (wname, B)
        assert np.abs(xr - x).max() < 1e-4, (wname, B)


def test_pallas_bf16_lifting(monkeypatch):
    """bf16 kernels (int32-bitcast lane rolls) match the bf16 jnp engine
    bit-for-bit in interpret mode.  MXU off: bf16 otherwise routes through
    the banded-matmul kernels (test_mxu2d.test_mxu_bf16_2d covers those)."""
    monkeypatch.setenv("WAVELETS_TPU_BF16", "1")
    monkeypatch.setenv("WAVELETS_TPU_MXU2D", "0")
    from wavelets_tpu.ops import lifting as L
    scheme = w.wt.wavelet(w.wt.cdf97, "lifting")
    rng = np.random.default_rng(78)
    x = rng.standard_normal((256, 512)).astype(jnp.bfloat16)
    assert P.pallas_ok(x.shape, scheme, 2, x.dtype)
    jref = np.asarray(L.dwt_nd_lifting(jnp.asarray(x), scheme, 2, 2),
                      np.float64)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(P.dwt2_lifting(jnp.asarray(x), scheme, 2), np.float64)
    assert np.array_equal(y, jref)


def test_pallas_bf16_filter(monkeypatch):
    monkeypatch.setenv("WAVELETS_TPU_BF16", "1")
    monkeypatch.setenv("WAVELETS_TPU_MXU2D", "0")
    from wavelets_tpu.ops.pallas import filter2d as F
    from wavelets_tpu.ops import filter_fb as FB
    wt = w.wt.wavelet(w.wt.db2)
    rng = np.random.default_rng(79)
    x = rng.standard_normal((256, 512)).astype(jnp.bfloat16)
    assert F.pallas_ok(x.shape, wt, 2, x.dtype)
    h, g = FB.filter_pair(wt)
    jref = np.asarray(FB.dwt_nd(jnp.asarray(x), h, g, 2, 2), np.float64)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(F.dwt2_filter(jnp.asarray(x), wt, 2), np.float64)
    assert np.abs(y - jref).max() < 0.05  # taps cast differs; bf16-scale


@pytest.mark.parametrize("wname,kind", [
    ("db2", "filter"),
    pytest.param("cdf97", "lifting", marks=pytest.mark.slow),
])   # the fused VPU inverse is opt-in (gated off by default on device)
def test_pallas_fused_inverse_1024(wname, kind):
    """Single-pass fused inverse (36-ref packed-read windows) round-trips
    at a size its tile plan accepts (needs >= 3 lane-halo granules)."""
    from wavelets_tpu.ops.pallas import fused2d as F2
    from wavelets_tpu.ops.pallas import filter2d as F, lifting2d as P
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    assert F2.fused_inv_ok(1024, 1024, wt, np.float32)
    rng = np.random.default_rng(80)
    x = rng.standard_normal((1024, 1024)).astype(np.float32)
    mod = F if kind == "filter" else P
    fw = mod.dwt2_filter if kind == "filter" else mod.dwt2_lifting
    inv = mod.idwt2_filter if kind == "filter" else mod.idwt2_lifting
    with pltpu.force_tpu_interpret_mode():
        y = fw(jnp.asarray(x), wt, 2)
        xr = np.asarray(inv(y, wt, 2))
    assert np.abs(xr - x).max() < 1e-4


@pytest.mark.parametrize("wname,kind", [("db2", "filter"),
                                        ("cdf97", "lifting")])
def test_axis0_ext_halo_kernels(wname, kind):
    """Explicit-halo axis-0 kernels (the sharded path's per-device level)
    equal the ring-wrapped kernels when fed the periodic wrap rows."""
    from wavelets_tpu.ops.pallas import axis0 as A0
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    halo = A0._halo_of(wt)
    rng = np.random.default_rng(81)
    x = rng.standard_normal((128, 512)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        ref = np.asarray(A0.axis0_level_fw(jnp.asarray(x), wt))
        got = np.asarray(A0.axis0_level_fw_ext(
            jnp.asarray(x[-halo:]), jnp.asarray(x), jnp.asarray(x[:halo]), wt))
    assert np.array_equal(ref, got)
    a, d = ref[:64], ref[64:]
    with pltpu.force_tpu_interpret_mode():
        refi = np.asarray(A0.axis0_level_inv(jnp.asarray(ref), wt))
        goti = np.asarray(A0.axis0_level_inv_ext(
            (jnp.asarray(a[-halo:]), jnp.asarray(a[:halo])), jnp.asarray(a),
            (jnp.asarray(d[-halo:]), jnp.asarray(d[:halo])), jnp.asarray(d),
            wt))
    assert np.array_equal(refi, goti)


def test_batched_2d_vmap_uses_quadrant_mode():
    """Batched images vmap the 2-D drivers; forward must force quadrant
    mode (packed mode alias-chains a pl.ANY buffer the Pallas TPU
    lowering cannot batch — crashed on device before the packed=False
    route).  packed=False must agree with packed=True."""
    import jax
    scheme = w.wt.wavelet(w.wt.cdf97, "lifting")
    rng = np.random.default_rng(91)
    x = rng.standard_normal((2, 256, 512)).astype(np.float32)
    ref = np.stack([np.asarray(w.dwt(x[i].astype(np.float64),
                                     w.wt.wavelet(w.wt.cdf97, "lifting"), 2))
                    for i in range(2)])
    with pltpu.force_tpu_interpret_mode():
        a = np.stack([np.asarray(P.dwt2_lifting(jnp.asarray(x[i]), scheme, 2,
                                                packed=False))
                      for i in range(2)])
        b = np.asarray(jax.vmap(
            lambda v: P.dwt2_lifting(v, scheme, 2, packed=False))(
                jnp.asarray(x)))
    assert np.abs(a - ref).max() < 1e-4
    assert np.abs(b - ref).max() < 1e-4


@pytest.mark.parametrize("wname,kind", [
    ("db4", "filter"), ("cdf97", "lifting"),
])
def test_pallas_wide_mxu_body_f32(wname, kind, monkeypatch):
    """The MXU-dot per-level wide body (WAVELETS_TPU_WIDE_MXU=1) must
    match the f64 engine and the default VPU-chain body at f32 — the
    formulation that unlocks bf16 (no lane rotates)."""
    monkeypatch.setenv("WAVELETS_TPU_WIDE_MXU", "1")
    from wavelets_tpu.ops.pallas import wide1d as W1
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    rng = np.random.default_rng(83)
    n = 1 << 14
    x = rng.standard_normal(n).astype(np.float32)
    assert W1._fold(n, wt, np.float32) is not None
    ref = np.asarray(w.dwt(x.astype(np.float64),
                           w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind), 3))
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(W1.dwt1d_wide_nopyr(jnp.asarray(x), wt, 3))
        xr = np.asarray(W1.idwt1d_wide_nopyr(jnp.asarray(y), wt, 3))
    assert np.abs(y - ref).max() < 1e-4
    assert np.abs(xr - x).max() < 1e-4


@pytest.mark.parametrize("wname,kind", [
    ("db4", "filter"), ("cdf97", "lifting"),
])
def test_pallas_wide_mxu_body_bf16(wname, kind):
    """bf16 per-level wide fold rides the MXU-dot kernels (the last
    bf16 XLA fallback, VERDICT r3 item 3); tolerance is the dtype's own
    epsilon class vs the f64 engine.  Also covers the batched (B, n)
    WPT shallow-depth route at bf16."""
    from wavelets_tpu.ops.pallas import wide1d as W1
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    rng = np.random.default_rng(84)
    n = 1 << 14
    assert W1._fold(n, wt, jnp.bfloat16) is not None
    assert W1.wide_ok(n, wt, 2, jnp.bfloat16)
    x = rng.standard_normal(n).astype(jnp.bfloat16)
    ref = np.asarray(w.dwt(np.asarray(x, np.float64),
                           w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind), 2))
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(W1.dwt1d_wide_nopyr(jnp.asarray(x), wt, 2),
                       np.float32)
        xr = np.asarray(W1.idwt1d_wide_nopyr(jnp.asarray(y, jnp.bfloat16),
                                             wt, 2), np.float32)
    scale = np.abs(ref).max()
    assert np.abs(y - ref).max() < 0.04 * scale
    assert np.abs(xr - np.asarray(x, np.float32)).max() < 0.06 * scale
    # batched segments: the ring must wrap within each segment
    for B in (2, 4):
        xb = rng.standard_normal((B, n)).astype(jnp.bfloat16)
        refb = np.stack([np.asarray(w.dwt(np.asarray(xb[i], np.float64),
                                          w.wt.wavelet(
                                              w.wt.ALL_CLASSES[wname], kind),
                                          1)) for i in range(B)])
        with pltpu.force_tpu_interpret_mode():
            s, d = W1._level_wide_b(jnp.asarray(xb), wt, True)
            yb = np.concatenate([np.asarray(s, np.float32),
                                 np.asarray(d, np.float32)], axis=-1)
            xrb = np.asarray(W1._level_wide_b((s, d), wt, False), np.float32)
        assert np.abs(yb - refb).max() < 0.04 * np.abs(refb).max(), (wname, B)
        assert np.abs(xrb - np.asarray(xb, np.float32)).max() \
            < 0.06 * np.abs(refb).max(), (wname, B)
