"""Wide single-signal 1-D transforms: the (n,) -> (R, C) row-major fold.

A single 1-D signal of length n >= ~2^17 cannot run through the batched
row kernels (dwt1d.py): one full row of n lanes blows the VMEM live-set
budget.  Fold it row-major into an (R, C) matrix instead — sample i lives
at (i // C, i % C) — and the 1-D neighbour relation becomes "lane shift
with row carry": the left context of row r is the tail of row r-1, i.e. a
SUBLANE roll by one, and the periodic boundary is the usual ring of row
blocks.  Each tile therefore reads (8, C) ring halos above and below,
builds the lane-extended working tile in VMEM

    [ roll(+1 row)[:, C-h:]  |  rows  |  roll(-1 row)[:, :h] ]

and runs the same interleaved lane chain + block butterfly as the batched
kernels.  C is even, so every row starts at an even global index and the
lane parity masks align with global sample parity.  The outputs are the
scaling and detail bands as (R, C/2) arrays whose row-major ravel IS the
contiguous band — no assembly gathers.

Levels recurse on the scaling band with a per-level fold width; tiny tail
levels fall back to the jnp path.  Reference semantics:
src/Transforms/transforms_filter.jl:13-83 /
transforms_lifting.jl:30-122; the fold is this framework's own device
mapping (ROADMAP r1 item 2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...wt.carriers import OrthoFilter, GLS
from ...wt.schemes import PREDICT
from ..filter_fb import filter_pair
from .mxu2d import _sem
from .common import roll, deint_lanes, int_lanes, roundup
from .dwt1d import _lift_interleaved, _level_jnp

__all__ = ["dwt1d_wide", "idwt1d_wide", "wide_ok"]

_HALO = 8  # sublane halo granule (min f32 tile height)


def _lane_reach(wt) -> int:
    """Lane contamination of the interleaved chain (both directions);
    floor 2 keeps the margin parity even (see common.lane_reach)."""
    from .common import lane_reach
    return lane_reach(wt, 2)


def _filter_interleaved(v, wt: OrthoFilter, fw: bool):
    """Interleaved-lane filter chain (math of dwt1d's step kernels)."""
    h, g = filter_pair(wt)
    dt = v.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    even = (lane % 2) == 0
    if fw:
        za = None
        zd = None
        for m_ in range(len(h)):
            ta = jnp.asarray(h[m_], dt) * roll(v, -m_, v.ndim - 1)
            td = jnp.asarray(g[m_], dt) * roll(v, m_, v.ndim - 1)
            za = ta if za is None else za + ta
            zd = td if zd is None else zd + td
        return jnp.where(even, za, zd)
    u = jnp.where(even, v, 0)
    w_ = jnp.where(even, roll(v, -1, v.ndim - 1), 0)
    x = None
    for m_ in range(len(h)):
        ts = jnp.asarray(h[m_], dt) * roll(u, m_, v.ndim - 1)
        td = jnp.asarray(g[m_], dt) * roll(w_, 1 - m_, v.ndim - 1)
        t = ts + td
        x = t if x is None else x + t
    return x


def _chain(v, wt, fw: bool):
    if isinstance(wt, GLS):
        if fw:
            v, even = _lift_interleaved(v, wt, fw=True)
            return v * jnp.where(even, jnp.asarray(wt.norm1, v.dtype),
                                 jnp.asarray(wt.norm2, v.dtype))
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
        even = (lane % 2) == 0
        v = v * jnp.where(even, jnp.asarray(1.0 / wt.norm1, v.dtype),
                          jnp.asarray(1.0 / wt.norm2, v.dtype))
        v, _ = _lift_interleaved(v, wt, fw=False)
        return v
    return _filter_interleaved(v, wt, fw)


def _lane_extend(ext_rows, h: int):
    """Lane-extend every row with its 1-D neighbours: the left margin is
    the tail of the row above (sublane roll +1), the right margin the head
    of the row below."""
    up = jnp.roll(ext_rows, 1, axis=0)
    down = jnp.roll(ext_rows, -1, axis=0)
    C = ext_rows.shape[1]
    return jnp.concatenate([up[:, C - h:], ext_rows, down[:, :h]], axis=1)


def _fw_kernel(top, mid, bot, s_ref, d_ref, *, wt, h):
    ext = jnp.concatenate([top[:], mid[:], bot[:]], axis=0)
    v = _lane_extend(ext, h)
    # parity: h is even, so the margin preserves the even/odd lane masks
    v = _chain(v, wt, fw=True)
    C = ext.shape[1]
    v = v[:, h: h + C]
    tm = mid.shape[0]
    u = deint_lanes(v[_HALO: _HALO + tm])
    half = C // 2
    s_ref[:] = u[:, :half]
    d_ref[:] = u[:, half:]


def _inv_kernel(st_, sc_, sb_, dt_, dc_, db_, o_ref, *, wt, h):
    s = jnp.concatenate([st_[:], sc_[:], sb_[:]], axis=0)
    d = jnp.concatenate([dt_[:], dc_[:], db_[:]], axis=0)
    z = int_lanes(jnp.concatenate([s, d], axis=-1))  # interleaved rows
    v = _lane_extend(z, h)
    v = _chain(v, wt, fw=False)
    C = z.shape[1]
    v = v[:, h: h + C]
    tm = o_ref.shape[0]
    o_ref[:] = v[_HALO: _HALO + tm]


def _use_mxu_wide(dtype) -> bool:
    """Body choice for the per-level wide fold.

    bf16 MUST use the MXU-dot body: the VPU chain's lane rotates crash
    this toolchain's TPU runtime at 16-bit dtypes (the standing negative
    result, BENCHMARKS.md), while the dot body is sublane-rolls + MXU
    dots only — the same formulation the pyramid stages device-validated
    at bf16 in round 3.  f32 keeps the measured VPU chain by default;
    WAVELETS_TPU_WIDE_MXU=1 switches it for the device A/B."""
    import os
    if np.dtype(dtype) == np.dtype(jnp.bfloat16):
        return True
    return os.environ.get("WAVELETS_TPU_WIDE_MXU") == "1"


def _fold_mxu(n: int, wt, dtype):
    """(R, C, tm, m) fold plan for the MXU-dot per-level body, or None.

    Mirrors pyramid1d._stage_plan's constraints (same halo ring, same
    shared fw/inv margin) at stage depth 1."""
    from .mxu2d import _band_reach, _syn_reach, _mxu_dtype_ok, _row_margin
    if not _mxu_dtype_ok(dtype):
        return None
    lo, hi = _band_reach(wt)
    lo2, hi2 = _syn_reach(wt)
    if max(lo, hi, lo2, hi2) > 120:
        return None
    # one margin serves analysis and synthesis (fw/inv folds must match)
    m = _row_margin(wt, fw=False)
    for C in (2048, 1024, 512):
        # the inverse lane-extends the (R, C/2) band folds by m each side
        if n % C or 2 * m > C // 2:
            continue
        R = n // C
        if R < 32 or R % 16:
            continue
        # VMEM: ~6 live (2*_HALO + tm, C + 2m) temps (pyramid's budget)
        budget = ((11 << 20) // np.dtype(dtype).itemsize // 6
                  // (C + 2 * m) - 2 * _HALO)
        tm = 128
        while tm > 16 and (R % tm or tm > budget):
            tm //= 2
        if R % tm or tm % 16 or tm > budget:
            continue
        return R, C, tm, m
    return None


def _fold(n: int, wt, dtype) -> tuple | None:
    """Fold plan for a length-n signal, or None.  Routes to the MXU-dot
    body's plan (bf16 always; f32 on WAVELETS_TPU_WIDE_MXU=1) or the VPU
    chain's (R, C, tm) plan (f32 default)."""
    if _use_mxu_wide(dtype):
        return _fold_mxu(n, wt, dtype)
    if np.dtype(dtype) != np.dtype(np.float32):
        return None
    h = roundup(_lane_reach(wt), 2)
    for C in (2048, 1024, 512):
        if n % C or h > C // 2:
            continue
        R = n // C
        if R % (2 * _HALO):
            continue
        live = (2 * (len(wt.qmf) if isinstance(wt, OrthoFilter) else 8)
                + 12)
        budget_rows = max(_HALO, ((12 << 20) // 4 // live) // (C + 2 * h))
        tm = _HALO
        while tm * 2 <= min(256, budget_rows) and R % (tm * 2) == 0:
            tm *= 2
        if R // _HALO >= 3 and R % tm == 0:
            return R, C, tm
    return None


def wide_ok(n: int, wt, L: int, dtype) -> bool:
    if L < 1:
        return False
    if _fold(n, wt, dtype) is not None:
        return True
    from .pyramid1d import pyr_ok
    return pyr_ok(n, wt, L, dtype)


def _halo_specs_b(C: int, tm: int, nbs: int):
    """(up, center, down) sublane-ring specs over a (B·R, C) fold where
    the ring wraps WITHIN each segment's R-row range (WPT segments are
    independent periodic signals).  nbs = R // _HALO halo blocks per
    segment; the center block is tm rows and R % tm == 0, so a grid step
    never straddles segments."""
    step = tm // _HALO

    def up(i):
        seg, lo = (i * step) // nbs, (i * step) % nbs
        return (seg * nbs + (lo - 1) % nbs, 0)

    def down(i):
        seg, lo = (i * step) // nbs, (i * step) % nbs
        return (seg * nbs + (lo + step) % nbs, 0)

    return [
        pl.BlockSpec((_HALO, C), up, memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_HALO, C), down, memory_space=pltpu.VMEM),
    ]


def _mxu_fw_kernel_w(up, cc, dn, wr_ref, s_ref, d_ref, *, m, tm, mode):
    """One analysis level on the fold via the pyramid's banded window
    dots (no lane rotates — the bf16-safe body)."""
    from .pyramid1d import _dots_fw
    from .mxu2d import _pair
    act = jnp.concatenate([up[:], cc[:], dn[:]], axis=0)
    s, d = _dots_fw(act, _pair(wr_ref[:], mode), m, mode)
    s_ref[:] = s[_HALO: _HALO + tm]
    d_ref[:] = d[_HALO: _HALO + tm]


def _mxu_inv_kernel_w(st_, sc_, sb_, dt_, dc_, db_, wi_ref, o_ref, *,
                      m, tm, mode):
    from .pyramid1d import _dots_inv
    from .mxu2d import _pair
    s = jnp.concatenate([st_[:], sc_[:], sb_[:]], axis=0)
    d = jnp.concatenate([dt_[:], dc_[:], db_[:]], axis=0)
    v = _dots_inv(s, d, _pair(wi_ref[:], mode), m, mode)
    o_ref[:] = v[_HALO: _HALO + tm]


def _level_wide_b_mxu(x, wt, fw: bool):
    """MXU-dot body of :func:`_level_wide_b` (same contract)."""
    from .mxu2d import _w_row, _w_row_inv, _mode_for
    from .pyramid1d import _GL
    if fw:
        B, n = x.shape
        dtype = x.dtype
    else:
        B, nh = x[0].shape
        n = 2 * nh
        dtype = x[0].dtype
    R, C, tm, m = _fold_mxu(n, wt, dtype)
    nbs = R // _HALO
    mode = _mode_for(dtype)
    if fw:
        wr = _w_row(wt, dtype, _GL, m)
        half_spec = pl.BlockSpec((tm, C // 2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        folded = x.reshape(B * R, C)
        s, d = pl.pallas_call(
            partial(_mxu_fw_kernel_w, m=m, tm=tm, mode=mode),
            grid=(B * R // tm,),
            in_specs=_halo_specs_b(C, tm, nbs) + [
                pl.BlockSpec(wr.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=(half_spec, half_spec),
            out_shape=(jax.ShapeDtypeStruct((B * R, C // 2), dtype),
                       jax.ShapeDtypeStruct((B * R, C // 2), dtype)),
            compiler_params=_sem(1),
        )(folded, folded, folded, wr)
        return s.reshape(B, n // 2), d.reshape(B, n // 2)
    s, d = x
    wi = _w_row_inv(wt, dtype, _GL, m)
    sh = s.reshape(B * R, C // 2)
    dh = d.reshape(B * R, C // 2)
    hs = _halo_specs_b(C // 2, tm, nbs)
    out = pl.pallas_call(
        partial(_mxu_inv_kernel_w, m=m, tm=tm, mode=mode),
        grid=(B * R // tm,),
        in_specs=hs + hs + [
            pl.BlockSpec(wi.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tm, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * R, C), dtype),
        compiler_params=_sem(1),
    )(sh, sh, sh, dh, dh, dh, wi)
    return out.reshape(B, n)


def _level_wide_b(x, wt, fw: bool):
    """One level on a (B, n) batch of independent periodic signals via
    the folded kernels (B == 1 is the plain wide path; WPT's shallow
    depths are B in {1, 2, 4, ...} with huge n).  ``x`` is the (B, n)
    batch (forward) or the ((B, n/2), (B, n/2)) band pair (inverse).
    Forward returns ((B, n/2) s, (B, n/2) d); inverse returns (B, n)."""
    if fw:
        B, n = x.shape
        dtype = x.dtype
    else:
        B, nh = x[0].shape
        n = 2 * nh
        dtype = x[0].dtype
    if _use_mxu_wide(dtype):
        return _level_wide_b_mxu(x, wt, fw)
    R, C, tm = _fold(n, wt, dtype)
    h = roundup(_lane_reach(wt), 2)
    nbs = R // _HALO
    if fw:
        hs = _halo_specs_b(C, tm, nbs)
        half_spec = pl.BlockSpec((tm, C // 2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        folded = x.reshape(B * R, C)
        s, d = pl.pallas_call(
            partial(_fw_kernel, wt=wt, h=h),
            grid=(B * R // tm,),
            in_specs=hs,
            out_specs=(half_spec, half_spec),
            out_shape=(jax.ShapeDtypeStruct((B * R, C // 2), dtype),
                       jax.ShapeDtypeStruct((B * R, C // 2), dtype)),
            compiler_params=_sem(1),
        )(folded, folded, folded)
        return s.reshape(B, n // 2), d.reshape(B, n // 2)
    s, d = x
    sh = s.reshape(B * R, C // 2)
    dh = d.reshape(B * R, C // 2)
    hs = _halo_specs_b(C // 2, tm, nbs)
    out = pl.pallas_call(
        partial(_inv_kernel, wt=wt, h=h),
        grid=(B * R // tm,),
        in_specs=hs + hs,
        out_specs=pl.BlockSpec((tm, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * R, C), dtype),
        compiler_params=_sem(1),
    )(sh, sh, sh, dh, dh, dh)
    return out.reshape(B, n)


def _level_wide(x, wt, fw: bool):
    """One level on a flat (n,) signal via the folded kernels.  ``x`` is
    the flat signal (forward) or the (s, d) band pair (inverse)."""
    if fw:
        s, d = _level_wide_b(x.reshape(1, -1), wt, True)
        return s.reshape(-1), d.reshape(-1)
    s, d = x
    return _level_wide_b((s.reshape(1, -1), d.reshape(1, -1)), wt,
                         False).reshape(-1)


def dwt1d_wide(x, wt, L: int):
    """Multi-level 1-D DWT of a single flat signal, packed layout.

    Routes through the staged pyramid kernels (pyramid1d.py — several
    levels per launch, details streamed into the packed buffer) when the
    plan accepts, else one folded kernel per level."""
    from .pyramid1d import pyr_ok, dwt1d_pyramid
    if pyr_ok(x.shape[0], wt, L, x.dtype):
        return dwt1d_pyramid(x, wt, L)
    return dwt1d_wide_nopyr(x, wt, L)


def dwt1d_wide_nopyr(x, wt, L: int):
    """Per-level wide path (also the pyramid's sub-stage tail)."""
    if L == 0:
        return x
    n = x.shape[0]
    s = x
    details = []
    for l in range(L):
        ns = n >> l
        if _fold(ns, wt, x.dtype) is not None:
            s, d = _level_wide(s, wt, fw=True)
        else:
            z = _level_jnp(s.reshape(1, ns), wt, fw=True).reshape(ns)
            s, d = z[: ns // 2], z[ns // 2:]
        details.append(d)
    return jnp.concatenate([s] + details[::-1])


def idwt1d_wide(y, wt, L: int):
    """Inverse of :func:`dwt1d_wide` (same pyramid/per-level routing)."""
    from .pyramid1d import pyr_ok, idwt1d_pyramid
    if pyr_ok(y.shape[0], wt, L, y.dtype):
        return idwt1d_pyramid(y, wt, L)
    return idwt1d_wide_nopyr(y, wt, L)


def idwt1d_wide_nopyr(y, wt, L: int):
    if L == 0:
        return y
    n = y.shape[0]
    s = y[: n >> L]
    for l in range(L, 0, -1):
        ns = n >> (l - 1)
        d = y[ns // 2: ns]
        if _fold(ns, wt, y.dtype) is not None:
            s = _level_wide((s, d), wt, fw=False)
        else:
            z = jnp.concatenate([s, d]).reshape(1, ns)
            s = _level_jnp(z, wt, fw=False).reshape(ns)
    return s
