"""Fused Pallas TPU kernels for the 2-D lifting DWT.

TPU-native replacement for the XLA roll/concat formulation on the hot path
(the reference's accelerator analogue is the KernelAbstractions lifting
extension, ext/WaveletsGPUExt/lifting_transforms_gpu.jl — there each lift
step is its own batched launch; here ALL steps of a level fuse into two
kernels, ~4 HBM passes per level, with the packed-layout assembly amortized
to a single pass after the level pyramid).

Mosaic (this jaxlib) rejects stride-2 slices and minor-dim transposes, so
the kernels avoid materialized deinterleaves:

* row kernel — operates directly on the naturally *interleaved* lane layout
  [s0 d0 s1 d1 ...]: a lifting step that writes half-space index i reading
  the other half at i+k-shift becomes a lane roll by the odd amount
  -(2(k-shift)±1) plus an even/odd iota mask.  Full rows live in VMEM, so
  the periodic wrap is exact.
* column kernel — 2-D grid with (H, TN) ring-halo blocks whose index maps
  wrap modulo the row-block count (periodic boundary == block-index mod).
  Sublane deinterleave uses the supported (R,2,C)-reshape; steps are
  sublane rolls whose wrap garbage stays inside the halo.  The lane
  un/shuffle between the interleaved working layout and the packed quadrant
  layout runs in-kernel as a log2(TN)-stage roll+mask butterfly (the only
  lane permutation Mosaic accepts), so quadrants are written directly.
* levels exchange a quadrant pytree; the reference's packed array layout is
  produced by one concatenation cascade at the end (forward) or consumed by
  one slice pass at the start (inverse).

Verified against the float64 jnp engine (ops/lifting.py) in interpret mode
on CPU and on device in float32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...wt.carriers import GLS
from ...wt.schemes import PREDICT

__all__ = [
    "lifting_level2", "dwt2_lifting", "idwt2_lifting",
    "scheme_reach", "pallas_ok",
]


def scheme_reach(scheme: GLS) -> int:
    """Total stencil reach of the step chain in half-index space."""
    reach = 0
    for st in scheme.steps:
        offs = [k - st.shift for k in range(len(st.coef))]
        reach += max(abs(o) for o in offs) if offs else 0
    return max(reach, 1)


from .common import roll as _roll, deint_lanes as _deint_lanes, \
    int_lanes as _int_lanes, roundup as _roundup


# --- step chains ------------------------------------------------------------

def _steps_interleaved_lanes(v, scheme: GLS, fw: bool):
    """Lifting chain on the interleaved lane layout (full periodic rows)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    even = (lane % 2) == 0
    steps = scheme.steps if fw else scheme.steps[::-1]
    sign = -1.0 if fw else 1.0
    for st in steps:
        pred = st.kind == PREDICT
        acc = None
        for k, c in enumerate(st.coef):
            off = 2 * (k - st.shift) + (1 if pred else -1)
            t = _roll(v, -off, v.ndim - 1)
            t = jnp.asarray(sign * c, v.dtype) * t
            acc = t if acc is None else acc + t
        mask = even if pred else jnp.logical_not(even)
        v = jnp.where(mask, v + acc, v)
    return v, even


def _steps_halves_axis0(s, d, scheme: GLS, fw: bool):
    """Lifting chain on (s, d) halves via sublane rolls (halo-extended)."""
    steps = scheme.steps if fw else scheme.steps[::-1]
    sign = -1.0 if fw else 1.0
    for st in steps:
        src = d if st.kind == PREDICT else s
        acc = None
        for k, c in enumerate(st.coef):
            t = _roll(src, st.shift - k, 0)
            t = jnp.asarray(sign * c, src.dtype) * t
            acc = t if acc is None else acc + t
        if st.kind == PREDICT:
            s = s + acc
        else:
            d = d + acc
    return s, d


# --- tile planning ----------------------------------------------------------

def _col_tm(rows: int, halo: int, cap: int = 1024):
    tm = cap
    while tm >= 2 * halo:
        if rows % tm == 0 and tm % halo == 0:
            return tm
        tm //= 2
    return None


def _plan_level(m: int, n: int, scheme: GLS, dtype):
    """Tile plan (tm_row, tm_col, tm_col_inv, halo, tn) or None."""
    if n % 256 or m % 16:
        return None
    reach = scheme_reach(scheme)
    halo = _roundup(2 * reach, 8)
    tn = 512 if n % 512 == 0 else 256

    bpr = 2 * n * np.dtype(dtype).itemsize
    tm_row = max(8, min(512, (2 << 20) // max(bpr, 1)))
    tm_row = max(8, (tm_row // 8) * 8)
    while tm_row > 8 and m % tm_row:
        tm_row //= 2
    if m % tm_row:
        return None

    tm_col = _col_tm(m, halo, cap=1024)
    tm_col_inv = _col_tm(m // 2, halo, cap=512)  # 12-ref kernel: keep VMEM low
    if tm_col is None or tm_col_inv is None:
        return None
    return tm_row, tm_col, tm_col_inv, halo, tn


def pallas_ok(shape, scheme: GLS, L: int, dtype) -> bool:
    """Static eligibility of the Pallas path (first level must tile; small
    tail levels fall back to the jnp path per level)."""
    if len(shape) != 2 or L < 1:
        return False
    # this Mosaic lacks non-32-bit lane rotates ('Rotate with non-32-bit
    # data'), so bfloat16 is excluded until the rolls get a 32-bit cast path
    if np.dtype(dtype) != np.dtype(np.float32):
        return False
    m, n = shape
    return _plan_level(m, n, scheme, dtype) is not None


# --- row (lane-direction) kernels -------------------------------------------

def _row_fw_kernel(x_ref, o_ref, *, scheme):
    v, even = _steps_interleaved_lanes(x_ref[:], scheme, fw=True)
    dt = v.dtype
    o_ref[:] = v * jnp.where(even, jnp.asarray(scheme.norm1, dt),
                             jnp.asarray(scheme.norm2, dt))


def _row_inv_kernel(x_ref, o_ref, *, scheme):
    v = x_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    even = (lane % 2) == 0
    dt = v.dtype
    v = v * jnp.where(even, jnp.asarray(1.0 / scheme.norm1, dt),
                      jnp.asarray(1.0 / scheme.norm2, dt))
    v, _ = _steps_interleaved_lanes(v, scheme, fw=False)
    o_ref[:] = v


def _rows(x, scheme: GLS, tm: int, fw: bool):
    m, n = x.shape
    kern = _row_fw_kernel if fw else _row_inv_kernel
    return pl.pallas_call(
        partial(kern, scheme=scheme),
        grid=(m // tm,),
        in_specs=[pl.BlockSpec((tm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x)


# --- column (sublane-direction) kernels -------------------------------------

def _halo_specs(tm: int, halo: int, nblocks_h: int, tn: int):
    """(top-halo, center, bottom-halo) specs with ring-wrapped index maps."""
    step = tm // halo
    return [
        pl.BlockSpec((halo, tn), lambda i, j: ((i * step - 1) % nblocks_h, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((halo, tn), lambda i, j: (((i + 1) * step) % nblocks_h, j),
                     memory_space=pltpu.VMEM),
    ]


def _col_fw_kernel(top_ref, mid_ref, bot_ref,
                   ll_ref, lh_ref, hl_ref, hh_ref, *, scheme, halo):
    ext = jnp.concatenate([top_ref[:], mid_ref[:], bot_ref[:]], axis=0)
    rows, tn = ext.shape
    r = ext.reshape(rows // 2, 2, tn)
    s, d = r[:, 0, :], r[:, 1, :]
    s, d = _steps_halves_axis0(s, d, scheme, fw=True)
    hh_ = halo // 2
    tm2 = s.shape[0] - halo
    dt = ext.dtype
    s = s[hh_: hh_ + tm2] * jnp.asarray(scheme.norm1, dt)
    d = d[hh_: hh_ + tm2] * jnp.asarray(scheme.norm2, dt)
    s = _deint_lanes(s)
    d = _deint_lanes(d)
    half = tn // 2
    ll_ref[:] = s[:, :half]
    lh_ref[:] = s[:, half:]
    hl_ref[:] = d[:, :half]
    hh_ref[:] = d[:, half:]


def _cols_fw_quads(x, scheme: GLS, tm: int, halo: int, tn: int):
    """Row-transformed (lane-interleaved) array -> four quadrant arrays."""
    m, n = x.shape
    qshape = jax.ShapeDtypeStruct((m // 2, n // 2), x.dtype)
    qspec = pl.BlockSpec((tm // 2, tn // 2), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_col_fw_kernel, scheme=scheme, halo=halo),
        grid=(m // tm, n // tn),
        in_specs=_halo_specs(tm, halo, m // halo, tn),
        out_specs=(qspec, qspec, qspec, qspec),
        out_shape=(qshape, qshape, qshape, qshape),
    )(x, x, x)


def _col_inv_kernel(llt, llc, llb, lht, lhc, lhb,
                    hlt, hlc, hlb, hht, hhc, hhb, x_ref,
                    *, scheme, halo, tm):
    s = jnp.concatenate([
        jnp.concatenate([llt[:], llc[:], llb[:]], axis=0),
        jnp.concatenate([lht[:], lhc[:], lhb[:]], axis=0)], axis=1)
    d = jnp.concatenate([
        jnp.concatenate([hlt[:], hlc[:], hlb[:]], axis=0),
        jnp.concatenate([hht[:], hhc[:], hhb[:]], axis=0)], axis=1)
    s = _int_lanes(s)  # -> lane-interleaved row coefficients
    d = _int_lanes(d)
    dt = s.dtype
    s = s * jnp.asarray(1.0 / scheme.norm1, dt)
    d = d * jnp.asarray(1.0 / scheme.norm2, dt)
    s, d = _steps_halves_axis0(s, d, scheme, fw=False)
    s = s[halo: halo + tm]
    d = d[halo: halo + tm]
    x_ref[:] = jnp.stack([s, d], axis=1).reshape(2 * tm, s.shape[-1])


def _cols_inv_quads(ll, lh, hl, hh, scheme: GLS, tm: int, halo: int, tn: int):
    """Four quadrants -> column-inverted, lane-interleaved (m, n) array."""
    mh, nh = ll.shape
    m, n = 2 * mh, 2 * nh
    hspec = _halo_specs(tm, halo, mh // halo, tn // 2)
    return pl.pallas_call(
        partial(_col_inv_kernel, scheme=scheme, halo=halo, tm=tm),
        grid=(mh // tm, n // tn),
        in_specs=hspec + hspec + hspec + hspec,
        out_specs=pl.BlockSpec((2 * tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), ll.dtype),
    )(ll, ll, ll, lh, lh, lh, hl, hl, hl, hh, hh, hh)


# --- level + multi-level drivers --------------------------------------------

def _level2_jnp(active, scheme: GLS, fw: bool):
    """jnp fallback for small tail levels (no tile plan)."""
    from .. import lifting as L
    if fw:
        s, d = L.lifting_level_fw(active, scheme)
        rowt = jnp.concatenate([s, d], axis=-1)
        moved = jnp.moveaxis(rowt, 0, -1)
        s, d = L.lifting_level_fw(moved, scheme)
        return jnp.moveaxis(jnp.concatenate([s, d], axis=-1), -1, 0)
    m = active.shape[0]
    moved = jnp.moveaxis(active, 0, -1)
    col = jnp.moveaxis(
        L.lifting_level_inv(moved[..., : m // 2], moved[..., m // 2:], scheme),
        -1, 0)
    half = col.shape[-1] // 2
    return L.lifting_level_inv(col[..., :half], col[..., half:], scheme)


def _level_fw_quads(active, scheme: GLS):
    """One forward level: active -> (ll, lh, hl, hh)."""
    m, n = active.shape
    # A single-pass fused kernel exists (fused2d.py) but measures ~30%
    # SLOWER on v5e despite halving HBM traffic: the two-kernel pipeline is
    # bandwidth-bound with its VPU work hidden under DMA, while the fused
    # kernel is roll/select-bound.  Opt in to experiment:
    import os
    if os.environ.get("WAVELETS_TPU_FUSED2D") == "1":
        from .fused2d import fused_ok, fused_level_fw_quads
        if fused_ok(m, n, scheme, active.dtype):
            return fused_level_fw_quads(active, scheme)
    plan = _plan_level(m, n, scheme, active.dtype)
    if plan is None:
        out = _level2_jnp(active, scheme, fw=True)
        mh, nh = m // 2, n // 2
        return (out[:mh, :nh], out[:mh, nh:], out[mh:, :nh], out[mh:, nh:])
    tm_row, tm_col, _, halo, tn = plan
    rowt = _rows(active, scheme, tm_row, fw=True)
    return _cols_fw_quads(rowt, scheme, tm_col, halo, tn)


def _level_inv_quads(ll, lh, hl, hh, scheme: GLS):
    """One inverse level: quadrants -> merged active array."""
    mh, nh = ll.shape
    m, n = 2 * mh, 2 * nh
    plan = _plan_level(m, n, scheme, ll.dtype)
    if plan is None:
        packed = jnp.concatenate([
            jnp.concatenate([ll, lh], axis=1),
            jnp.concatenate([hl, hh], axis=1)], axis=0)
        return _level2_jnp(packed, scheme, fw=False)
    tm_row, _, tm_ci, halo, tn = plan
    col = _cols_inv_quads(ll, lh, hl, hh, scheme, tm_ci, halo, tn)
    return _rows(col, scheme, tm_row, fw=False)


def lifting_level2(active, scheme: GLS, fw: bool):
    """One full 2-D lifting level, packed-quadrant in/out (reference
    layout) — convenience wrapper used by tests and the sharded fallback."""
    if fw:
        ll, lh, hl, hh = _level_fw_quads(active, scheme)
        return jnp.concatenate([
            jnp.concatenate([ll, lh], axis=1),
            jnp.concatenate([hl, hh], axis=1)], axis=0)
    m, n = active.shape
    mh, nh = m // 2, n // 2
    return _level_inv_quads(active[:mh, :nh], active[:mh, nh:],
                            active[mh:, :nh], active[mh:, nh:], scheme)


def dwt2_lifting(x, scheme: GLS, L: int):
    """Multi-level forward 2-D lifting DWT, packed layout (Pallas path).

    Levels exchange quadrants; the packed array is assembled once by a
    concatenation cascade (one effective pass)."""
    if L == 0:
        return x
    ll = x
    details = []
    for _ in range(L):
        ll, lh, hl, hh = _level_fw_quads(ll, scheme)
        details.append((lh, hl, hh))
    y = ll
    for lh, hl, hh in reversed(details):
        y = jnp.concatenate([
            jnp.concatenate([y, lh], axis=1),
            jnp.concatenate([hl, hh], axis=1)], axis=0)
    return y


def idwt2_lifting(y, scheme: GLS, L: int):
    """Inverse of dwt2_lifting (slice pass up front, then fused levels)."""
    if L == 0:
        return y
    m, n = y.shape
    ll = y[: m >> L, : n >> L]
    for l in range(L, 0, -1):
        mh, nh = m >> l, n >> l
        lh = y[:mh, nh: 2 * nh]
        hl = y[mh: 2 * mh, :nh]
        hh = y[mh: 2 * mh, nh: 2 * nh]
        ll = _level_inv_quads(ll, lh, hl, hh, scheme)
    return ll
