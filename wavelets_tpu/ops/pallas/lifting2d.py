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
  sublane rolls whose wrap garbage stays inside the halo.  The kernel
  emits two LANE-INTERLEAVED arrays — S = [ll lh ll lh ...] (scaling
  rows) and D = [hl hh ...] (detail rows) — and never permutes lanes:
  round 1 measured the in-kernel log2(TN)-stage roll+mask lane butterfly
  as the single largest VPU cost (column kernel at ~170 GB/s vs the 400
  GB/s copy roofline).  The even/odd lane split into quadrants is instead
  an XLA pair-reshape gather (``v.reshape(m, n/2, 2)[..., k]`` — the fast
  lowering on XLA:TPU): the ``ll`` feed for the next level is one small
  gather, and the detail gathers fuse into the final packed-layout
  assembly concatenation, costing no extra pass.
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
from .common import pick_col_tm as _col_tm

__all__ = [
    "lifting_level2", "dwt2_lifting", "idwt2_lifting",
    "scheme_reach", "pallas_ok",
]


def scheme_reach(scheme: GLS) -> int:
    """Total stencil reach of the step chain in half-index space."""
    from .common import half_reach
    return half_reach(scheme, 1)


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

# (_col_tm import moved to the module header — code-review r5 dedup)


def _plan_level(m: int, n: int, scheme: GLS, dtype):
    """Tile plan (tm_row, tm_col, tm_col_inv, halo, tn) or None."""
    if n % 256 or m % 16:
        return None
    from .common import dtype_ok, halo_granule
    if not dtype_ok(dtype):   # bf16 VPU kernels are opt-in (bitcast rolls)
        return None
    reach = scheme_reach(scheme)
    halo = _roundup(2 * reach, halo_granule(dtype))
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
    tail levels fall back to the jnp path per level).

    The MXU plan is checked FIRST: it is the default compute body, it
    accepts shapes the VPU row-tile plan cannot (e.g. m with odd
    factors), and it is the safe bf16 route (banded matmuls need no
    lane rolls, so the bitcast-roll kernels that crash this toolchain
    are never touched).  Per-level dispatch in _level_fw_quads /
    _dwt2_packed falls back to jnp wherever a level's plan rejects."""
    if len(shape) != 2 or L < 1:
        return False
    m, n = shape
    import os
    if os.environ.get("WAVELETS_TPU_MXU2D") != "0":
        from .mxu2d import mxu_ok
        if mxu_ok(m, n, scheme, dtype):
            return True
    from .common import dtype_ok
    if not dtype_ok(dtype):
        return False
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

from .common import halo_specs as _halo_specs  # one ring-spec builder


def _col_fw_kernel(top_ref, mid_ref, bot_ref, s_ref, d_ref, *, scheme, halo):
    ext = jnp.concatenate([top_ref[:], mid_ref[:], bot_ref[:]], axis=0)
    rows, tn = ext.shape
    r = ext.reshape(rows // 2, 2, tn)
    s, d = r[:, 0, :], r[:, 1, :]
    s, d = _steps_halves_axis0(s, d, scheme, fw=True)
    hh_ = halo // 2
    tm2 = s.shape[0] - halo
    dt = ext.dtype
    s_ref[:] = s[hh_: hh_ + tm2] * jnp.asarray(scheme.norm1, dt)
    d_ref[:] = d[hh_: hh_ + tm2] * jnp.asarray(scheme.norm2, dt)


def _cols_fw_sd(x, scheme: GLS, tm: int, halo: int, tn: int):
    """Row-transformed (lane-interleaved) array -> (S, D) half-height
    arrays, still lane-interleaved (S = [ll lh ...], D = [hl hh ...])."""
    m, n = x.shape
    oshape = jax.ShapeDtypeStruct((m // 2, n), x.dtype)
    ospec = pl.BlockSpec((tm // 2, tn), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_col_fw_kernel, scheme=scheme, halo=halo),
        grid=(m // tm, n // tn),
        in_specs=_halo_specs(tm, halo, m // halo, tn),
        out_specs=(ospec, ospec),
        out_shape=(oshape, oshape),
    )(x, x, x)


def even_lanes(v):
    """v[..., 0::2] as the fast pair-reshape gather (no stride-2 slice)."""
    return v.reshape(*v.shape[:-1], v.shape[-1] // 2, 2)[..., 0]


def odd_lanes(v):
    return v.reshape(*v.shape[:-1], v.shape[-1] // 2, 2)[..., 1]


def int_lanes_xla(a, b):
    """Interleave two (m, n/2) arrays into (m, n): [a0 b0 a1 b1 ...]."""
    return jnp.stack([a, b], axis=-1).reshape(*a.shape[:-1],
                                              2 * a.shape[-1])


def _col_inv_kernel(st_, sc_, sb_, dt_, dc_, db_, x_ref, *, scheme, halo, tm):
    s = jnp.concatenate([st_[:], sc_[:], sb_[:]], axis=0)
    d = jnp.concatenate([dt_[:], dc_[:], db_[:]], axis=0)
    dt = s.dtype
    s = s * jnp.asarray(1.0 / scheme.norm1, dt)
    d = d * jnp.asarray(1.0 / scheme.norm2, dt)
    s, d = _steps_halves_axis0(s, d, scheme, fw=False)
    s = s[halo: halo + tm]
    d = d[halo: halo + tm]
    x_ref[:] = jnp.stack([s, d], axis=1).reshape(2 * tm, s.shape[-1])


def _cols_inv_sd(S, D, scheme: GLS, tm: int, halo: int, tn: int):
    """(S, D) lane-interleaved half-height arrays -> column-inverted,
    lane-interleaved (m, n) array (ready for the row-inverse kernel)."""
    mh, n = S.shape
    m = 2 * mh
    hspec = _halo_specs(tm, halo, mh // halo, tn)
    return pl.pallas_call(
        partial(_col_inv_kernel, scheme=scheme, halo=halo, tm=tm),
        grid=(mh // tm, n // tn),
        in_specs=hspec + hspec,
        out_specs=pl.BlockSpec((2 * tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), S.dtype),
    )(S, S, S, D, D, D)


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
    # Single-pass fused level kernel (fused2d.py): reads the active array
    # once (plus halo overlap) and writes the quadrants once — ~2.3 HBM
    # passes per level vs this pipeline's ~4.  Opt out with
    # WAVELETS_TPU_FUSED2D=0.
    import os
    # MXU formulation (mxu2d.py): the whole level as two banded matmuls
    # with the lane deinterleave baked into the weights — measured 1.5x
    # the VPU fused kernel at 8192^2 (BENCHMARKS.md).  Opt out with
    # WAVELETS_TPU_MXU2D=0.
    if os.environ.get("WAVELETS_TPU_MXU2D") != "0":
        from .mxu2d import mxu_ok, mxu_level_fw_quads
        if mxu_ok(m, n, scheme, active.dtype):
            return mxu_level_fw_quads(active, scheme)
    if os.environ.get("WAVELETS_TPU_FUSED2D") != "0":
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
    S, D = _cols_fw_sd(rowt, scheme, tm_col, halo, tn)
    # Even/odd lane split happens in XLA: the ll gather feeds the next
    # level; the three detail gathers fuse into the packed-layout assembly
    # concatenation downstream (no dedicated pass).
    return even_lanes(S), odd_lanes(S), even_lanes(D), odd_lanes(D)


def _level_inv_quads(ll, lh, hl, hh, scheme: GLS):
    """One inverse level: quadrants -> merged active array."""
    mh, nh = ll.shape
    m, n = 2 * mh, 2 * nh
    import os
    # MXU synthesis kernel (mxu2d.py): single pass, no butterfly, 4
    # quadrant halo reads.  Opt out with WAVELETS_TPU_MXU2D=0.
    if os.environ.get("WAVELETS_TPU_MXU2D") != "0":
        from .mxu2d import mxu_inv_ok, mxu_inv_quads
        if mxu_inv_ok(m, n, scheme, ll.dtype):
            return mxu_inv_quads(ll, lh, hl, hh, scheme)
    # measured on v5e: the 36-ref fused inverse is corner-DMA-bound
    # (~2.6x slower than the two-kernel inverse at 8192^2) — opt-in
    # until the halo windows are batched
    if os.environ.get("WAVELETS_TPU_FUSED_INV") == "1":
        from .fused2d import fused_inv_ok, fused_level_inv_quads
        if fused_inv_ok(m, n, scheme, ll.dtype):
            return fused_level_inv_quads(ll, lh, hl, hh, scheme)
    plan = _plan_level(m, n, scheme, ll.dtype)
    if plan is None:
        packed = jnp.concatenate([
            jnp.concatenate([ll, lh], axis=1),
            jnp.concatenate([hl, hh], axis=1)], axis=0)
        return _level2_jnp(packed, scheme, fw=False)
    tm_row, _, tm_ci, halo, tn = plan
    S = int_lanes_xla(ll, lh)
    D = int_lanes_xla(hl, hh)
    col = _cols_inv_sd(S, D, scheme, tm_ci, halo, tn)
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


def _dwt2_quads(x, scheme: GLS, L: int):
    """Quadrant-mode multi-level driver: levels exchange quadrant arrays;
    the packed array is assembled by one concatenation cascade (XLA fuses
    the concat tree into a single materialization pass).  Small deep
    levels collapse into ONE whole-tail kernel launch (tail2d.py)."""
    from . import tail2d
    ll = x
    details = []
    for l in range(L):
        rem = L - l
        m, n = ll.shape
        Lt = tail2d.tail_fit(m, n, rem, scheme, ll.dtype)
        if Lt >= min(rem, 2):
            packed = tail2d.tail_fw(ll, scheme, Lt)
            if Lt < rem:
                sub = _dwt2_quads(packed[: m >> Lt, : n >> Lt], scheme,
                                  rem - Lt)
                packed = jax.lax.dynamic_update_slice(packed, sub, (0, 0))
            ll = packed
            break
        ll, lh, hl, hh = _level_fw_quads(ll, scheme)
        details.append((lh, hl, hh))
    y = ll
    for lh, hl, hh in reversed(details):
        y = jnp.concatenate([
            jnp.concatenate([y, lh], axis=1),
            jnp.concatenate([hl, hh], axis=1)], axis=0)
    return y


def _dwt2_packed(x, scheme: GLS, L: int):
    """Packed-mode multi-level driver: each fused level writes its detail
    quadrants straight into their final positions of one full-size buffer
    (alias-chained through the levels), so the packed layout costs no
    assembly pass.  Returns None when the first level is not eligible."""
    import os
    from .fused2d import packed_ok, level_fw_packed, level_fw_packed_first
    from .mxu2d import (mxu_packed_ok, mxu_level_fw_packed,
                        mxu_level_fw_packed_first, mxu_level_fw_packed_last,
                        _packed_dma)
    mxu = os.environ.get("WAVELETS_TPU_MXU2D") != "0"
    # the VPU packed body is only used on explicit opt-in (=1): it is
    # interpret-validated but not device-measured
    vpu = os.environ.get("WAVELETS_TPU_PACKED2D") == "1"
    m, n = x.shape
    ll, y, done = x, None, 0
    # fused 2-level first stage (stage2d.py): levels 1+2 in one launch,
    # removing level 2's HBM round-trip (bf16 default; see stage2_on)
    from .stage2d import stage2_ok, stage2_fw
    if (mxu and L >= 2 and _packed_dma()
            and stage2_ok(m, n, scheme, x.dtype)
            and mxu_packed_ok(m, n, scheme, x.dtype)):
        if L == 2:
            return stage2_fw(x, None, (m, n), scheme, last=True)
        ll, y = stage2_fw(x, None, (m, n), scheme)
        done = 2
    for l in range(done, L):
        if mxu and mxu_packed_ok(m >> l, n >> l, scheme, x.dtype):
            if l == L - 1 and _packed_dma():
                # final level: ll streams into y in-kernel — no closing
                # dynamic_update_slice (a whole-ll-quadrant read+write)
                return mxu_level_fw_packed_last(ll, y, (m, n), scheme)
            ll, y = (mxu_level_fw_packed_first(ll, scheme) if y is None
                     else mxu_level_fw_packed(ll, y, scheme))
        elif vpu and packed_ok(m >> l, n >> l, scheme, x.dtype):
            ll, y = (level_fw_packed_first(ll, scheme) if y is None
                     else level_fw_packed(ll, y, scheme))
        else:
            break
        done += 1
    if y is None:
        return None
    if done < L:
        ll = _dwt2_quads(ll, scheme, L - done)   # small tail levels
    return jax.lax.dynamic_update_slice(y, ll, (0, 0))


def dwt2_lifting(x, scheme: GLS, L: int, packed: bool = True):
    """Multi-level forward 2-D lifting DWT, packed layout (Pallas path).

    ``packed=False`` forces quadrant mode: the packed-mode kernels
    alias-chain the full-size buffer through a pl.ANY input, which the
    Pallas TPU lowering cannot batch — callers that vmap this driver
    (batched images, TI cycle-spinning) must use quadrant mode."""
    if L == 0:
        return x
    import os
    # Packed mode (device-validated bit-exact vs quadrant mode): detail
    # quadrants stream straight into the final packed buffer, no XLA
    # assembly pass.  Opt out with WAVELETS_TPU_PACKED2D=0.
    if packed and os.environ.get("WAVELETS_TPU_PACKED2D") != "0":
        y = _dwt2_packed(x, scheme, L)
        if y is not None:
            return y
    return _dwt2_quads(x, scheme, L)


def idwt2_lifting(y, scheme: GLS, L: int):
    """Inverse of dwt2_lifting.

    Eligible levels read their detail quadrants DIRECTLY from the packed
    array through offset halo windows (fused2d.level_inv_packed) — no
    quadrant slice materialization; others slice + go through the
    two-kernel/jnp inverse."""
    if L == 0:
        return y
    import os
    fused = os.environ.get("WAVELETS_TPU_FUSED_INV") == "1"
    mxu = os.environ.get("WAVELETS_TPU_MXU2D") != "0"
    from .fused2d import fused_inv_ok, level_inv_packed
    from .mxu2d import mxu_inv_ok, mxu_inv_packed
    m, n = y.shape
    # collapse the deepest small levels into one inverse tail launch
    from . import tail2d
    Lt = 0
    for cand in range(L, 0, -1):
        if tail2d.tail_ok(m >> (L - cand), n >> (L - cand), cand,
                          scheme, y.dtype):
            Lt = cand
            break
    if Lt >= min(L, 2):
        cm, cn = m >> (L - Lt), n >> (L - Lt)
        ll = tail2d.tail_inv(y[:cm, :cn], scheme, Lt)
        start = L - Lt
    else:
        ll = y[: m >> L, : n >> L]
        start = L
    for l in range(start, 0, -1):
        mh, nh = m >> l, n >> l
        if mxu and mxu_inv_ok(2 * mh, 2 * nh, scheme, y.dtype):
            ll = mxu_inv_packed(y, ll, (2 * mh, 2 * nh), scheme)
            continue
        if fused and fused_inv_ok(2 * mh, 2 * nh, scheme, y.dtype):
            ll = level_inv_packed(y, ll, (2 * mh, 2 * nh), scheme)
            continue
        lh = y[:mh, nh: 2 * nh]
        hl = y[mh: 2 * mh, :nh]
        hh = y[mh: 2 * mh, nh: 2 * nh]
        ll = _level_inv_quads(ll, lh, hl, hh, scheme)
    return ll
