"""MXU banded-matmul level kernel (ops/pallas/mxu2d.py) vs the f64 jnp
engines, in TPU interpret mode on CPU — same hardware-free strategy as
test_pallas.py (reference analogue: test/gpu.jl on JLArrays)."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

import wavelets_tpu as w
from wavelets_tpu.ops.pallas import mxu2d as M
from wavelets_tpu.ops.pallas import lifting2d as P


def _ref_level(x64, wt):
    """One 2-D level in float64 through the jnp engines."""
    from wavelets_tpu.ops import lifting as LF, filter_fb as FF
    from wavelets_tpu.wt.carriers import GLS
    if isinstance(wt, GLS):
        return np.asarray(LF.dwt_nd_lifting(jnp.asarray(x64), wt, 1, 2))
    h, g = FF.filter_pair(wt)
    a, d = FF.dwt_level(jnp.asarray(x64), h, g)
    rowt = jnp.concatenate([a, d], -1)
    mvd = jnp.moveaxis(rowt, 0, -1)
    a2, d2 = FF.dwt_level(mvd, h, g)
    return np.asarray(jnp.moveaxis(jnp.concatenate([a2, d2], -1), -1, 0))


@pytest.mark.parametrize("wname,kind", [
    ("cdf97", "lifting"), ("haar", "lifting"), ("db2", "lifting"),
    ("db2", "filter"), ("db4", "filter"), ("sym6", "filter"),
])
def test_mxu_level_matches_f64_reference(wname, kind):
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    rng = np.random.default_rng(81)
    x = rng.standard_normal((512, 768)).astype(np.float32)
    assert M.mxu_ok(*x.shape, wt, np.float32)

    ref = _ref_level(x.astype(np.float64), wt)
    with pltpu.force_tpu_interpret_mode():
        ll, lh, hl, hh = M.mxu_level_fw_quads(jnp.asarray(x), wt)
    got = np.block([[np.asarray(ll), np.asarray(lh)],
                    [np.asarray(hl), np.asarray(hh)]])
    assert np.abs(got - ref).max() < 1e-4


def test_mxu_bands_match_engines_exactly():
    """Band extraction is f64-exact against the engines' own output on a
    random signal (1-D, one level)."""
    from wavelets_tpu.ops import lifting as LF, filter_fb as FF
    rng = np.random.default_rng(82)
    n = 256
    x = rng.standard_normal(n)
    for wname, kind in (("cdf97", "lifting"), ("db4", "filter")):
        wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
        ds, cs, dd, cd = M.level_bands(wt)
        a_band = np.array([sum(c * x[(2 * k + dlt) % n]
                               for dlt, c in zip(ds, cs))
                           for k in range(n // 2)])
        d_band = np.array([sum(c * x[(2 * k + dlt) % n]
                               for dlt, c in zip(dd, cd))
                           for k in range(n // 2)])
        if kind == "lifting":
            s_ref, d_ref = LF.lifting_level_fw(jnp.asarray(x), wt)
        else:
            h, g = FF.filter_pair(wt)
            s_ref, d_ref = FF.dwt_level(jnp.asarray(x), h, g)
        assert np.abs(a_band - np.asarray(s_ref)).max() < 1e-12
        assert np.abs(d_band - np.asarray(d_ref)).max() < 1e-12


@pytest.mark.parametrize("mode", ["split3", "highest", "bf16"])
def test_mxu_precision_modes(mode, monkeypatch):
    monkeypatch.setenv("WAVELETS_TPU_MXU_PREC", mode)
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    rng = np.random.default_rng(83)
    x = rng.standard_normal((384, 512)).astype(np.float32)
    ref = _ref_level(x.astype(np.float64), wt)
    with pltpu.force_tpu_interpret_mode():
        ll, lh, hl, hh = M.mxu_level_fw_quads(jnp.asarray(x), wt)
    got = np.block([[np.asarray(ll), np.asarray(lh)],
                    [np.asarray(hl), np.asarray(hh)]])
    tol = {"split3": 1e-4, "highest": 1e-5, "bf16": 0.1}[mode]
    assert np.abs(got - ref).max() < tol


def test_mxu_multilevel_integration(monkeypatch):
    """dwt2_lifting with the MXU route forced on: deep tail levels fall
    back below the tile plan; whole pyramid matches f64 + round-trips."""
    monkeypatch.setenv("WAVELETS_TPU_MXU2D", "1")
    scheme = w.wt.wavelet(w.wt.cdf97, "lifting")
    rng = np.random.default_rng(84)
    x = rng.standard_normal((256, 256)).astype(np.float32)
    L = 3
    ref = np.asarray(w.dwt(x.astype(np.float64),
                           w.wt.wavelet(w.wt.cdf97, "lifting"), L))
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(P.dwt2_lifting(jnp.asarray(x), scheme, L))
    assert np.abs(y - ref).max() < 1e-3
    with pltpu.force_tpu_interpret_mode():
        xr = np.asarray(P.idwt2_lifting(jnp.asarray(y), scheme, L))
    assert np.abs(xr - x).max() < 1e-3


def test_mxu_plan_gating():
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    assert not M.mxu_ok(512, 512, wt, np.float64)     # f32 only
    assert not M.mxu_ok(512, 200, wt, np.float32)     # width not 256-tileable
    assert not M.mxu_ok(12, 512, wt, np.float32)      # rows below tile plan
    assert M.mxu_ok(256, 512, wt, np.float32)


@pytest.mark.parametrize("wname,kind", [
    ("cdf97", "lifting"), ("haar", "lifting"),
    ("db4", "filter"), ("sym6", "filter"),
])
def test_mxu_inverse_roundtrip(wname, kind):
    """MXU forward -> MXU inverse (quads AND packed-read variants)
    reconstructs the input within the f32 kernel contract."""
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    rng = np.random.default_rng(85)
    x = rng.standard_normal((512, 768)).astype(np.float32)
    assert M.mxu_inv_ok(*x.shape, wt, np.float32)
    with pltpu.force_tpu_interpret_mode():
        ll, lh, hl, hh = M.mxu_level_fw_quads(jnp.asarray(x), wt)
        xr = np.asarray(M.mxu_inv_quads(ll, lh, hl, hh, wt))
    assert np.abs(xr - x).max() < 2e-4
    y = np.block([[np.asarray(ll), np.asarray(lh)],
                  [np.asarray(hl), np.asarray(hh)]])
    with pltpu.force_tpu_interpret_mode():
        xr2 = np.asarray(M.mxu_inv_packed(jnp.asarray(y), ll, x.shape, wt))
    assert np.abs(xr2 - x).max() < 2e-4


def test_mxu_synthesis_bands_invert_analysis():
    """synthesis_bands is the exact inverse of level_bands on a random
    periodic signal (f64)."""
    rng = np.random.default_rng(86)
    n = 128
    x = rng.standard_normal(n)
    for wname, kind in (("cdf97", "lifting"), ("sym6", "filter")):
        wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
        ds, cs, dd, cd = M.level_bands(wt)
        s = np.array([sum(c * x[(2 * k + d_) % n] for d_, c in zip(ds, cs))
                      for k in range(n // 2)])
        d = np.array([sum(c * x[(2 * k + d_) % n] for d_, c in zip(dd, cd))
                      for k in range(n // 2)])
        bands = M.synthesis_bands(wt)
        (dS0, cS0), (dD0, cD0), (dS1, cS1), (dD1, cD1) = bands
        xr = np.zeros(n)
        for k in range(n // 2):
            xr[2 * k] = sum(c * s[(k + d_) % (n // 2)]
                            for d_, c in zip(dS0, cS0)) \
                + sum(c * d[(k + d_) % (n // 2)] for d_, c in zip(dD0, cD0))
            xr[2 * k + 1] = sum(c * s[(k + d_) % (n // 2)]
                                for d_, c in zip(dS1, cS1)) \
                + sum(c * d[(k + d_) % (n // 2)] for d_, c in zip(dD1, cD1))
        assert np.abs(xr - x).max() < 1e-10


def test_mxu_full_idwt2_integration(monkeypatch):
    """idwt2 drivers route through mxu_inv_packed; multi-level round-trip
    against the forward pyramid."""
    monkeypatch.setenv("WAVELETS_TPU_MXU2D", "1")
    for wname, kind in (("cdf97", "lifting"), ("db4", "filter")):
        wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
        rng = np.random.default_rng(87)
        x = rng.standard_normal((512, 512)).astype(np.float32)
        L = 3
        if kind == "lifting":
            fw, inv = P.dwt2_lifting, P.idwt2_lifting
        else:
            from wavelets_tpu.ops.pallas import filter2d as F
            fw, inv = F.dwt2_filter, F.idwt2_filter
        with pltpu.force_tpu_interpret_mode():
            y = fw(jnp.asarray(x), wt, L)
            xr = np.asarray(inv(y, wt, L))
        assert np.abs(xr - x).max() < 1e-3, (wname, kind)


def test_mxu_packed_pyramid_matches_quads(monkeypatch):
    """Packed mode (default) == quadrant mode, both engines, and matches
    the f64 reference; round-trips through the packed-read inverse."""
    rng = np.random.default_rng(88)
    x = rng.standard_normal((256, 256)).astype(np.float32)
    L = 2
    from wavelets_tpu.ops.pallas import filter2d as F
    for wname, kind in (("cdf97", "lifting"), ("db4", "filter")):
        wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
        fw = P.dwt2_lifting if kind == "lifting" else F.dwt2_filter
        inv = P.idwt2_lifting if kind == "lifting" else F.idwt2_filter
        ref = np.asarray(w.dwt(x.astype(np.float64), wt, L))
        monkeypatch.setenv("WAVELETS_TPU_PACKED2D", "")
        with pltpu.force_tpu_interpret_mode():
            yp = np.asarray(fw(jnp.asarray(x), wt, L))
            xr = np.asarray(inv(jnp.asarray(yp), wt, L))
        monkeypatch.setenv("WAVELETS_TPU_PACKED2D", "0")
        with pltpu.force_tpu_interpret_mode():
            yq = np.asarray(fw(jnp.asarray(x), wt, L))
        assert np.abs(yp - ref).max() < 1e-3, (wname, "vs f64")
        assert np.abs(yp - yq).max() < 2e-4, (wname, "packed vs quads")
        assert np.abs(xr - x).max() < 1e-3, (wname, "roundtrip")


def test_mxu_axis0_variants_match_vpu(monkeypatch):
    """MXU axis-0 kernels (local + explicit-halo ext) agree with the VPU
    roll-chain kernels and round-trip."""
    from wavelets_tpu.ops.pallas import axis0 as A
    rng = np.random.default_rng(90)
    x = rng.standard_normal((256, 256)).astype(np.float32)
    for wname, kind in (("cdf97", "lifting"), ("db4", "filter")):
        wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
        halo = A._halo_of(wt)
        monkeypatch.setenv("WAVELETS_TPU_MXU2D", "1")
        with pltpu.force_tpu_interpret_mode():
            y = np.asarray(A.axis0_level_fw(jnp.asarray(x), wt))
            xr = np.asarray(A.axis0_level_inv(jnp.asarray(y), wt))
        monkeypatch.setenv("WAVELETS_TPU_MXU2D", "0")
        with pltpu.force_tpu_interpret_mode():
            y0 = np.asarray(A.axis0_level_fw(jnp.asarray(x), wt))
        monkeypatch.setenv("WAVELETS_TPU_MXU2D", "1")
        assert np.abs(y - y0).max() < 1e-4, (wname, "fw vs vpu")
        assert np.abs(xr - x).max() < 1e-4, (wname, "roundtrip")
        above, below = jnp.asarray(x[-halo:]), jnp.asarray(x[:halo])
        with pltpu.force_tpu_interpret_mode():
            ye = np.asarray(A.axis0_level_fw_ext(above, jnp.asarray(x),
                                                 below, wt))
        assert np.abs(ye - y0).max() < 1e-4, (wname, "ext fw")
        a_, d_ = y0[:128], y0[128:]
        ah = (jnp.asarray(a_[-halo:]), jnp.asarray(a_[:halo]))
        dh = (jnp.asarray(d_[-halo:]), jnp.asarray(d_[:halo]))
        with pltpu.force_tpu_interpret_mode():
            xe = np.asarray(A.axis0_level_inv_ext(
                ah, jnp.asarray(a_), dh, jnp.asarray(d_), wt))
        assert np.abs(xe - x).max() < 1e-4, (wname, "ext inv")


def test_mxu_dwt1d_batched_matches_reference():
    """Batched 1-D MXU levels match the per-row f64 reference and
    round-trip (multi-level, tail fallback below the plan)."""
    import jax
    from wavelets_tpu.ops.pallas import dwt1d as D
    rng = np.random.default_rng(91)
    x = rng.standard_normal((16, 512)).astype(np.float32)
    L = 3
    for wname, kind in (("cdf97", "lifting"), ("sym6", "filter")):
        wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
        ref = np.asarray(jax.vmap(lambda r: w.dwt(r, wt, L))(
            jnp.asarray(x.astype(np.float64))))
        with pltpu.force_tpu_interpret_mode():
            y = np.asarray(D.dwt1d_pallas(jnp.asarray(x), wt, L))
            xr = np.asarray(D.idwt1d_pallas(jnp.asarray(y), wt, L))
        assert np.abs(y - ref).max() < 2e-4, wname
        assert np.abs(xr - x).max() < 2e-4, wname


def test_mxu_bf16_2d():
    """bfloat16 2-D arrays route through the MXU kernels (native 1-pass
    dots, no lane rolls — the bitcast-roll VPU kernels stay untouched):
    forward matches the f64 reference to bf16 accuracy and the full
    packed pyramid round-trips."""
    from wavelets_tpu.ops.pallas import mxu2d as M
    from wavelets_tpu.ops.pallas import lifting2d as L2, filter2d as F2
    rng = np.random.default_rng(92)
    x = rng.standard_normal((256, 512)).astype(jnp.bfloat16)
    for wname, kind, P2 in (("cdf97", "lifting", L2), ("db4", "filter", F2)):
        wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
        assert M.mxu_ok(256, 512, wt, jnp.bfloat16)
        assert P2.pallas_ok((256, 512), wt, 2, jnp.bfloat16)
        # the crash-prone VPU plans must keep rejecting bf16
        if P2 is L2:
            assert L2._plan_level(256, 512, wt, jnp.bfloat16) is None
        ref = np.asarray(w.dwt(np.asarray(x, np.float64), wt, 2))
        scale = np.abs(ref).max()
        fw = (L2.dwt2_lifting if P2 is L2 else F2.dwt2_filter)
        inv = (L2.idwt2_lifting if P2 is L2 else F2.idwt2_filter)
        with pltpu.force_tpu_interpret_mode():
            y = np.asarray(fw(jnp.asarray(x), wt, 2), np.float64)
            xr = np.asarray(inv(jnp.asarray(y, jnp.bfloat16), wt, 2),
                            np.float64)
        assert np.abs(y - ref).max() < 0.08 * scale, wname
        assert np.abs(xr - np.asarray(x, np.float64)).max() < 0.08 * scale, \
            wname


def test_complex64_rides_kernels(monkeypatch):
    """complex64 transforms split into two real f32 kernel transforms
    (linear over C, real coefficients) — results must match the native
    complex XLA path."""
    import jax
    monkeypatch.setenv("WAVELETS_TPU_PALLAS", "1")
    from wavelets_tpu.transforms import _kernel_route_exists
    rng = np.random.default_rng(93)
    x = (rng.standard_normal((128, 512))
         + 1j * rng.standard_normal((128, 512))).astype(np.complex64)
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    assert _kernel_route_exists(jnp.asarray(x).real, wt, 2, 2)
    ref = np.asarray(w.dwt(x.astype(np.complex128), wt, 2))
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(jax.jit(
            lambda v: w.transforms._dwt_impl(v, wt, 2, 2, True))(
                jnp.asarray(x)))
        xr = np.asarray(jax.jit(
            lambda v: w.transforms._dwt_impl(v, wt, 2, 2, False))(
                jnp.asarray(y, np.complex64)))
    assert y.dtype == np.complex64
    assert np.abs(y - ref).max() < 1e-3
    assert np.abs(xr - x).max() < 1e-3


def test_non_pow2_lane_shapes_route_correctly(monkeypatch):
    """Shapes the MXU plan accepts but whose deeper levels hit
    non-power-of-two lane counts (e.g. 768 -> 384): the whole-tail
    kernel's lane butterfly requires power-of-two widths, so tail_ok
    must reject them and the levels must fall to jnp — full pyramids
    must match the f64 reference."""
    import jax
    monkeypatch.setenv("WAVELETS_TPU_PALLAS", "1")
    from wavelets_tpu.ops.pallas import tail2d as T
    from wavelets_tpu.ops.pallas.lifting2d import dwt2_lifting, idwt2_lifting
    from wavelets_tpu.ops.pallas.filter2d import dwt2_filter, idwt2_filter
    assert not T.tail_ok(96, 384, 1, w.wt.wavelet(w.wt.cdf97, "lifting"),
                         np.float32)
    rng = np.random.default_rng(94)
    x = rng.standard_normal((128, 768)).astype(np.float32)
    for wname, kind, fw, inv in (
            ("cdf97", "lifting", dwt2_lifting, idwt2_lifting),
            ("db4", "filter", dwt2_filter, idwt2_filter)):
        wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
        ref = np.asarray(w.dwt(x.astype(np.float64), wt, 3))
        with pltpu.force_tpu_interpret_mode():
            y = np.asarray(jax.jit(lambda v, f=fw: f(v, wt, 3))(
                jnp.asarray(x)))
            xr = np.asarray(jax.jit(lambda v, f=inv: f(v, wt, 3))(
                jnp.asarray(y)))
        assert np.abs(y - ref).max() < 1e-3, wname
        assert np.abs(xr - x).max() < 1e-3, wname


def test_mxu_bf16_batched_1d():
    """bf16 batched 1-D levels ride the MXU kernels (VPU steps+split is
    never eligible for bf16): multi-level forward at bf16 tolerance +
    round-trip."""
    from wavelets_tpu.ops.pallas import dwt1d as D
    rng = np.random.default_rng(95)
    x = rng.standard_normal((32, 1024)).astype(jnp.bfloat16)
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    assert D.pallas_ok(x.shape, wt, 3, jnp.bfloat16)
    assert D._mxu_level_plan(32, 1024, wt, jnp.bfloat16) is not None
    ref = np.asarray(w.dwt(np.asarray(x, np.float64), wt, 3, ndt=1))
    scale = np.abs(ref).max()
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(D.dwt1d_pallas(jnp.asarray(x), wt, 3), np.float64)
        xr = np.asarray(D.idwt1d_pallas(
            jnp.asarray(y, jnp.bfloat16), wt, 3), np.float64)
    assert np.abs(y - ref).max() < 0.08 * scale
    assert np.abs(xr - np.asarray(x, np.float64)).max() < 0.08 * scale


def test_mxu_bf16_3d():
    """bf16 3-D: slab MXU levels + bf16 axis-0 MXU kernels (the VPU
    axis-0 rolls hit Mosaic's non-32-bit-rotate limit, so axis0_ok only
    accepts bf16 when the MXU variant covers both directions)."""
    from wavelets_tpu.ops.pallas import dwt3d as D3, axis0 as A0
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    assert A0.axis0_ok(64, 256, wt, jnp.bfloat16)
    assert D3.pallas_ok((64, 64, 256), wt, 1, jnp.bfloat16)
    rng = np.random.default_rng(96)
    x = rng.standard_normal((64, 64, 256)).astype(jnp.bfloat16)
    ref = np.asarray(w.dwt(np.asarray(x, np.float64), wt, 1))
    scale = np.abs(ref).max()
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(D3.dwt3_pallas(jnp.asarray(x), wt, 1), np.float64)
        xr = np.asarray(D3.idwt3_pallas(jnp.asarray(y, jnp.bfloat16), wt, 1),
                        np.float64)
    assert np.abs(y - ref).max() < 0.08 * scale
    assert np.abs(xr - np.asarray(x, np.float64)).max() < 0.08 * scale


@pytest.mark.parametrize("body", ["v2", "v3", "v4", "v5", "v7", "v7q"])
def test_mxu_alt_bodies_match_v1(monkeypatch, body):
    """The alternative forward compute bodies (kept as measured negative
    results behind WAVELETS_TPU_MXU_BODY) must stay numerically
    equivalent to v1 so future edits to the shared plan/weight code
    cannot silently corrupt the env-reachable paths."""
    rng = np.random.default_rng(77)
    x = rng.standard_normal((256, 512)).astype(np.float32)
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    outs = {}
    for b in ("v1", body):
        monkeypatch.setenv("WAVELETS_TPU_MXU_BODY", b)
        with pltpu.force_tpu_interpret_mode():
            q = [np.asarray(a) for a in
                 M.mxu_level_fw_quads(jnp.asarray(x), wt)]
            ll, y = M.mxu_level_fw_packed_first(jnp.asarray(x), wt)
        outs[b] = (q, np.asarray(ll), np.asarray(y))
    qd = max(np.abs(a - b_).max()
             for a, b_ in zip(outs["v1"][0], outs[body][0]))
    ld = np.abs(outs["v1"][1] - outs[body][1]).max()
    # compare only the written detail regions of the packed buffer (the
    # LL quadrant of a fresh packed-first buffer is never written)
    ya, yb = outs["v1"][2], outs[body][2]
    mh, nh = 128, 256
    dd = max(np.abs(ya[:mh, nh:] - yb[:mh, nh:]).max(),
             np.abs(ya[mh:, :] - yb[mh:, :]).max())
    # v4's batched row dot runs split3 (3 separate dots) where v1 runs
    # split3cat (one K-concat dot) — a different f32 reassociation of
    # the same terms (3e-5 class, as the blocked-col tests); v5 only
    # reorders the V assembly copies and v7 segments them (bit-exact
    # per-segment v1 math)
    tol = 3e-5 if body == "v4" else 1e-5
    assert max(qd, ld, dd) < tol, (body, qd, ld, dd)


def test_plan_inv_envelope_pins(monkeypatch):
    """Hardware-free pin of the device-probed tile envelope (ADVICE r3):
    the 19<<20 VMEM gate admits tn=4096 inverse tiles for every stock
    wavelet up to hm2=32 (batt6) in both dtypes — behavior only reachable
    on device (CPU interpret tests top out at width 768 -> tn=256), so
    future edits to the gate constant or ladder must trip this test."""
    monkeypatch.delenv("WAVELETS_TPU_MXU_INV_TN", raising=False)
    monkeypatch.delenv("WAVELETS_TPU_MXU_TN", raising=False)
    monkeypatch.delenv("WAVELETS_TPU_MXU_TM", raising=False)
    cdf = w.wt.wavelet(w.wt.cdf97, "lifting")
    db4 = w.wt.wavelet(w.wt.db4)
    batt = w.wt.wavelet(w.wt.batt6)
    for n in (16384, 8192, 4096):
        # round-5 retunes: bf16 rides tn=8192 where divisibility allows
        # (itemsize-aware VMEM formula; device-measured -8% on the full
        # idwt2, compile-verified to hm2=32); f32 rides SHORT-WIDE
        # tm=64 tiles where hm2 <= 16 (another -10%; tall tiles lose)
        tn_b = 8192 if n % 8192 == 0 else 4096
        tn_f = 8192 if n % 8192 == 0 else 4096
        assert M._plan_inv(n, n, cdf, np.float32) == (64, tn_f, 8, 128)
        assert M._plan_inv(n, n, cdf, jnp.bfloat16) == (128, tn_b, 16, 128)
        assert M._plan_inv(n, n, db4, np.float32) == (64, tn_f, 8, 128)
        assert M._plan_inv(n, n, batt, np.float32) == (128, 4096, 32, 128)
        assert M._plan_inv(n, n, batt, jnp.bfloat16) == (128, tn_b, 32, 128)
        # forward plans at the same shapes (the VMEM gate's other user):
        # batt6 f32's extended tile exceeds the 2.55 MB line at tn=4096;
        # bf16 (no-split bodies, 2.9 MB gate) rides tn=8192 up to hm=16
        assert M._plan(n, n, cdf, np.float32) == (128, 4096, 8)
        assert M._plan(n, n, cdf, jnp.bfloat16) == (
            (128, 8192, 16) if n % 8192 == 0 else (128, 4096, 16))
        assert M._plan(n, n, batt, np.float32) == (128, 2048, 64)
        assert M._plan(n, n, batt, jnp.bfloat16) == (128, 4096, 64)
    # the small-shape end of the ladder (the one CPU tests exercise)
    assert M._plan_inv(768, 768, cdf, np.float32) == (64, 256, 8, 128)


def test_plan_inv_tn_override_sanity_ceiling(monkeypatch):
    """WAVELETS_TPU_MXU_INV_TN is trusted past the VMEM gate for A/Bs,
    but an estimate beyond ~2x the gate is rejected (falls back to the
    ladder) instead of risking an over-VMEM remote compile, which can
    wedge the tunneled device (ADVICE r3).  Pinned at tm=128, where the
    VMEM boundary was measured (the round-5 tm=64 default shrinks the
    estimate enough that tn=16384 falls inside the 2x trust ceiling —
    override-trust semantics, not a regression)."""
    monkeypatch.setenv("WAVELETS_TPU_MXU_INV_TM", "128")
    cdf = w.wt.wavelet(w.wt.cdf97, "lifting")
    base = M._plan_inv(16384, 16384, cdf, np.float32)
    monkeypatch.setenv("WAVELETS_TPU_MXU_INV_TN", "16384")
    with pytest.warns(UserWarning, match="rejected"):
        assert M._plan_inv(16384, 16384, cdf, np.float32) == base
    # a modest override within 2x of the gate is still honored
    monkeypatch.setenv("WAVELETS_TPU_MXU_INV_TN", "8192")
    assert M._plan_inv(16384, 16384, cdf, np.float32)[1] == 8192


@pytest.mark.parametrize("blk", ["0", "16", "32", "64"])
def test_mxu_col_blocked_matches_full(monkeypatch, blk):
    """The block-shared column dot (WAVELETS_TPU_MXU_COLBLK) must be
    numerically identical in structure to the full-width col dot up to
    f32 reassociation of the same split dots, for every block size and
    in both packed and quadrant modes."""
    rng = np.random.default_rng(123)
    x = rng.standard_normal((256, 512)).astype(np.float32)
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    outs = {}
    for b in ("0", blk):
        monkeypatch.setenv("WAVELETS_TPU_MXU_COLBLK", b)
        with pltpu.force_tpu_interpret_mode():
            q = [np.asarray(a) for a in
                 M.mxu_level_fw_quads(jnp.asarray(x), wt)]
            ll, y = M.mxu_level_fw_packed_first(jnp.asarray(x), wt)
        outs[b] = (q, np.asarray(ll), np.asarray(y))
    qd = max(np.abs(a - b_).max()
             for a, b_ in zip(outs["0"][0], outs[blk][0]))
    ld = np.abs(outs["0"][1] - outs[blk][1]).max()
    ya, yb = outs["0"][2], outs[blk][2]
    mh, nh = 128, 256
    dd = max(np.abs(ya[:mh, nh:] - yb[:mh, nh:]).max(),
             np.abs(ya[mh:, :] - yb[mh:, :]).max())
    assert max(qd, ld, dd) < 1e-5, (blk, qd, ld, dd)


def test_mxu_col_blocked_bf16(monkeypatch):
    """bf16 rides the blocked col dot with native 1-pass dots."""
    rng = np.random.default_rng(124)
    x64 = rng.standard_normal((256, 512))
    x = x64.astype(jnp.bfloat16)
    wt = w.wt.wavelet(w.wt.db2)
    monkeypatch.setenv("WAVELETS_TPU_MXU_COLBLK", "32")
    ref = _ref_level(x64, wt)
    with pltpu.force_tpu_interpret_mode():
        ll, lh, hl, hh = M.mxu_level_fw_quads(jnp.asarray(x), wt)
    got = np.block([[np.asarray(ll, np.float64), np.asarray(lh, np.float64)],
                    [np.asarray(hl, np.float64), np.asarray(hh, np.float64)]])
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.05 * scale


@pytest.mark.parametrize("blk", ["0", "16", "32"])
def test_mxu_inv_col_blocked_matches_full(monkeypatch, blk):
    """Blocked synthesis col dots must reproduce the full-width inverse
    (quadrant and packed reads) to f32 reassociation."""
    rng = np.random.default_rng(321)
    x = rng.standard_normal((256, 512)).astype(np.float32)
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    outs = {}
    with pltpu.force_tpu_interpret_mode():
        qts = [jnp.asarray(np.asarray(a)) for a in
               M.mxu_level_fw_quads(jnp.asarray(x), wt)]
    for b in ("0", blk):
        monkeypatch.setenv("WAVELETS_TPU_MXU_COLBLK", b)
        with pltpu.force_tpu_interpret_mode():
            outs[b] = np.asarray(M.mxu_inv_quads(*qts, wt))
    # 3e-5: the blocked dots run plain split3 (not split3cat — see
    # _blk_mode), a different f32 reassociation of the same terms
    assert np.abs(outs["0"] - outs[blk]).max() < 3e-5
    # and the full round trip reconstructs x
    assert np.abs(outs[blk] - x).max() < 2e-4


@pytest.mark.parametrize("dtype,blk", [
    (np.float32, "0"), (np.float32, "32"), (jnp.bfloat16, "0"),
    (jnp.bfloat16, "32")])
def test_mxu_inv_body_v2_matches_v1(monkeypatch, dtype, blk):
    """The v2/v2c/v2r inverse bodies (K-split col dots and/or batched
    row windows, WAVELETS_TPU_MXU_INV_BODY) must reproduce v1 up to f32
    reassociation, in both quadrant and packed reads, both dtypes, and
    with/without the blocked column dot."""
    rng = np.random.default_rng(555)
    x = rng.standard_normal((256, 512)).astype(np.float32)
    if np.dtype(dtype) == np.dtype(jnp.bfloat16):
        x = x.astype(jnp.bfloat16)
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    monkeypatch.setenv("WAVELETS_TPU_MXU_COLBLK", blk)
    with pltpu.force_tpu_interpret_mode():
        qts = [jnp.asarray(np.asarray(a)) for a in
               M.mxu_level_fw_quads(jnp.asarray(x), wt)]
    outs = {}
    for body in ("v1", "v2", "v2c", "v2r", "v6"):
        monkeypatch.setenv("WAVELETS_TPU_MXU_INV_BODY", body)
        with pltpu.force_tpu_interpret_mode():
            outs[body] = np.asarray(M.mxu_inv_quads(*qts, wt), np.float32)
    tol = 3e-5 if np.dtype(dtype) == np.dtype(np.float32) else 3e-2
    rt_tol = 2e-4 if np.dtype(dtype) == np.dtype(np.float32) else 0.1
    for body in ("v2", "v2c", "v2r", "v6"):
        assert np.abs(outs["v1"] - outs[body]).max() < tol, body
        # and the round trip reconstructs x
        assert np.abs(outs[body] - np.asarray(x, np.float32)).max() < rt_tol, \
            body


def test_mxu_inv_body_v2_packed(monkeypatch):
    """v2 must also be exact on the packed-read inverse (offset halo
    windows through the same group specs)."""
    rng = np.random.default_rng(556)
    x = rng.standard_normal((256, 512)).astype(np.float32)
    wt = w.wt.wavelet(w.wt.db4)
    with pltpu.force_tpu_interpret_mode():
        ll, lh, hl, hh = M.mxu_level_fw_quads(jnp.asarray(x), wt)
        y = np.block([[np.asarray(ll), np.asarray(lh)],
                      [np.asarray(hl), np.asarray(hh)]])
    outs = {}
    for body in ("v1", "v2"):
        monkeypatch.setenv("WAVELETS_TPU_MXU_INV_BODY", body)
        with pltpu.force_tpu_interpret_mode():
            outs[body] = np.asarray(M.mxu_inv_packed(
                jnp.asarray(y), jnp.asarray(np.asarray(ll)), (256, 512), wt))
    assert np.abs(outs["v1"] - outs["v2"]).max() < 3e-5
    assert np.abs(outs["v2"] - x).max() < 2e-4


def test_mxu_packed_last_level_streams_ll():
    """The final packed level streams ll into the buffer in-kernel
    (mxu_level_fw_packed_last) — no closing dynamic_update_slice.  L=1
    (the y=None path) and L=3 (alias-chained path) must match quadrant
    mode at the established inter-mode tolerance and round-trip — a
    misplaced or unwritten ll block fails both loudly."""
    rng = np.random.default_rng(93)
    x = rng.standard_normal((256, 512)).astype(np.float32)
    from wavelets_tpu.ops.pallas import filter2d as F
    for dt_, tol in ((np.float32, 2e-4), (jnp.bfloat16, 0.15)):
        xx = jnp.asarray(x, dt_)
        for wname, kind in (("cdf97", "lifting"), ("db4", "filter")):
            wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
            fw = P.dwt2_lifting if kind == "lifting" else F.dwt2_filter
            inv = P.idwt2_lifting if kind == "lifting" else F.idwt2_filter
            for L in (1, 3):
                with pltpu.force_tpu_interpret_mode():
                    yp = np.asarray(fw(xx, wt, L), np.float32)
                    yq = np.asarray(fw(xx, wt, L, packed=False),
                                    np.float32)
                    xr = np.asarray(inv(
                        jnp.asarray(yp, dt_), wt, L), np.float32)
                sc = np.abs(yq).max()
                assert np.abs(yp - yq).max() < tol * sc, (wname, dt_, L)
                assert np.abs(xr - x).max() < tol * sc, (wname, dt_, L)


def test_stage2_fused_two_levels(monkeypatch):
    """Fused 2-level forward stage (stage2d.py) vs the per-level quads
    path: bf16 must be BIT-EXACT (same 1-pass dots, same order), f32
    within the split-reassociation class; L=2 exercises the last=True
    ll-streaming variant, L=3 the (ll, y) continuation."""
    monkeypatch.setenv("WAVELETS_TPU_MXU_LS2", "1")
    from wavelets_tpu.ops.pallas import filter2d as F, stage2d
    rng = np.random.default_rng(95)
    x = rng.standard_normal((256, 512)).astype(np.float32)
    for dt_, tol in ((np.float32, 4e-5), (jnp.bfloat16, 0.0)):
        xx = jnp.asarray(x, dt_)
        for wname, kind in (("cdf97", "lifting"), ("db4", "filter")):
            wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
            assert stage2d.stage2_ok(256, 512, wt, dt_)
            fw = P.dwt2_lifting if kind == "lifting" else F.dwt2_filter
            for L in (2, 3):
                with pltpu.force_tpu_interpret_mode():
                    yp = np.asarray(fw(xx, wt, L), np.float32)
                    yq = np.asarray(fw(xx, wt, L, packed=False),
                                    np.float32)
                e = np.abs(yp - yq).max() / np.abs(yq).max()
                assert e <= tol, (wname, str(dt_), L, e)


def test_axis0_col_blocked_matches_full(monkeypatch):
    """Axis-0 block-shared col dots (fw and inv) must reproduce the
    full-width dots to reassociation (f32) / exactly (bf16)."""
    from wavelets_tpu.ops.pallas import axis0 as A
    rng = np.random.default_rng(97)
    x = rng.standard_normal((512, 256)).astype(np.float32)
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    for dt_, tol in ((np.float32, 3e-5), (jnp.bfloat16, 0.0)):
        xx = jnp.asarray(x, dt_)
        outs = {}
        for q in ("0", "32"):
            monkeypatch.setenv("WAVELETS_TPU_MXU_COLBLK", q)
            with pltpu.force_tpu_interpret_mode():
                y = A.axis0_level_fw(xx, wt)
                outs[("fw", q)] = np.asarray(y, np.float32)
                outs[("iv", q)] = np.asarray(
                    A.axis0_level_inv(y, wt), np.float32)
        for d in ("fw", "iv"):
            e = np.abs(outs[(d, "0")] - outs[(d, "32")]).max()
            assert e <= tol, (d, str(dt_), e)
        # and the round trip reconstructs
        rt = np.abs(outs[("iv", "32")] - np.asarray(xx, np.float32)).max()
        assert rt < (2e-4 if dt_ == np.float32 else 0.2)
