"""Generic axis-0 (sublane-direction) one-level kernels, engine-agnostic.

Transform the leading axis of an (R, C) array one DWT level, periodic
boundary, producing the packed result WITHOUT an assembly pass: the output
is shaped (2, R/2, C) — component 0 the scaling band, component 1 the
detail band — which reshapes to the packed (R, C) layout for free
(row-major).  The inverse consumes the packed halves through halo'd block
specs and re-interleaves rows in-kernel (sublane stack-reshape).

Used by the 3-D driver (axis 0 directly, middle axis via vmap) and by the
batched column transforms generally.  Ring-wrapped halo index maps give the
periodic boundary at block granularity.
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
from .common import roll, roundup, pick_col_tm

__all__ = ["axis0_level_fw", "axis0_level_inv", "axis0_ok",
           "axis0_level_fw_ext", "axis0_level_inv_ext", "axis0_ext_ok"]


def _reach(wt) -> int:
    from .common import half_reach
    return half_reach(wt, 1)


def _halo_of(wt, dtype=np.float32) -> int:
    from .common import halo_granule
    return roundup(max(2 * _reach(wt), 2), halo_granule(dtype))


def _steps_halves(s, d, scheme: GLS, fw: bool):
    steps = scheme.steps if fw else scheme.steps[::-1]
    sign = -1.0 if fw else 1.0
    for st in steps:
        src = d if st.kind == PREDICT else s
        acc = None
        for k, c in enumerate(st.coef):
            t = roll(src, st.shift - k, 0)
            t = jnp.asarray(sign * c, src.dtype) * t
            acc = t if acc is None else acc + t
        if st.kind == PREDICT:
            s = s + acc
        else:
            d = d + acc
    return s, d


def _fw_kernel(top_ref, mid_ref, bot_ref, o_ref, *, wt, halo):
    _fw_kernel_body(top_ref[:], mid_ref[:], bot_ref[:], o_ref,
                    wt=wt, halo=halo)


def _inv_kernel(at_ref, ac_ref, ab_ref, dt_ref, dc_ref, db_ref, o_ref,
                *, wt, halo, tm):
    a = jnp.concatenate([at_ref[0], ac_ref[0], ab_ref[0]], axis=0)
    d = jnp.concatenate([dt_ref[0], dc_ref[0], db_ref[0]], axis=0)
    dt = a.dtype
    if isinstance(wt, GLS):
        a = a * jnp.asarray(1.0 / wt.norm1, dt)
        d = d * jnp.asarray(1.0 / wt.norm2, dt)
        a, d = _steps_halves(a, d, wt, fw=False)
        x0, x1 = a, d
    else:
        h, g = filter_pair(wt)
        x0 = None
        x1 = None
        for m_ in range(len(h)):
            if m_ % 2 == 0:
                t0 = jnp.asarray(h[m_], dt) * roll(a, m_ // 2, 0)
                t1 = jnp.asarray(g[m_], dt) * roll(d, -(m_ // 2), 0)
            else:
                t1 = jnp.asarray(h[m_], dt) * roll(a, (m_ - 1) // 2, 0)
                t0 = jnp.asarray(g[m_], dt) * roll(d, -((m_ - 1) // 2), 0)
            x0 = t0 if x0 is None else x0 + t0
            x1 = t1 if x1 is None else x1 + t1
    x0 = x0[halo: halo + tm]
    x1 = x1[halo: halo + tm]
    o_ref[:] = jnp.stack([x0, x1], axis=1).reshape(2 * tm, x0.shape[-1])


def _pick_tn(C: int) -> int | None:
    for tn in (512, 256, 128):
        if C % tn == 0:
            return tn
    return C if C in (512, 256, 128) else None


def _budget_cap(wt, tn: int, itemsize: int) -> int:
    taps = len(wt.qmf) if isinstance(wt, OrthoFilter) else 8
    budget_elems = (14 << 20) // itemsize // (taps + 8)
    cap = 8
    while cap * 2 * tn <= budget_elems and cap < 1024:
        cap *= 2
    return cap


def axis0_ok(R: int, C: int, wt, dtype) -> bool:
    """f32 always (MXU or VPU variants); bf16 ONLY when the MXU variant
    covers both directions — the VPU kernels' rolls hit Mosaic's
    'Rotate with non-32-bit data' limit, and the banded matmuls don't."""
    from .mxu2d import _mxu_dtype_ok
    if not _mxu_dtype_ok(dtype):
        return False
    halo = _halo_of(wt, dtype)
    tn = _pick_tn(C)
    if tn is None or R % 16 or 2 * halo >= R:
        return False
    cap = _budget_cap(wt, tn, np.dtype(dtype).itemsize)
    tm_fw = pick_col_tm(R, halo, cap=max(cap, 2 * halo))
    tm_inv = pick_col_tm(R // 2, halo, cap=max(min(cap, 512), 2 * halo))
    if tm_fw is None or tm_inv is None:
        return False
    if np.dtype(dtype) == np.dtype(np.float32):
        return True
    return (_mxu_on() and _syn_fits(wt, halo)
            and _mxu_axis0_ok(dtype, tm_fw, halo)
            and _mxu_axis0_ok(dtype, tm_inv, halo))


def _halo_specs3(tm: int, halo: int, nblocks_h: int, tn: int, comp: int):
    """Specs over a (2, R/2, C) packed array, component ``comp``."""
    step = tm // halo
    return [
        pl.BlockSpec((1, halo, tn),
                     lambda i, j: (comp, (i * step - 1) % nblocks_h, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tm, tn), lambda i, j: (comp, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, halo, tn),
                     lambda i, j: (comp, ((i + 1) * step) % nblocks_h, j),
                     memory_space=pltpu.VMEM),
    ]


def axis0_level_fw(x, wt):
    """(R, C) -> (R, C) packed along axis 0 ([a | d])."""
    R, C = x.shape
    halo = _halo_of(wt, x.dtype)
    tn = _pick_tn(C)
    cap = _budget_cap(wt, tn, np.dtype(x.dtype).itemsize)
    tm = pick_col_tm(R, halo, cap=max(cap, 2 * halo))
    step = tm // halo
    nb = R // halo
    in_specs = [
        pl.BlockSpec((halo, tn), lambda i, j: ((i * step - 1) % nb, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((halo, tn), lambda i, j: (((i + 1) * step) % nb, j),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((2, tm // 2, tn), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((2, R // 2, C), x.dtype)
    if _mxu_on() and _mxu_axis0_ok(x.dtype, tm, halo):
        from .mxu2d import _mode_for
        blk = _axis0_blk(tm, halo, x.dtype, fw=True)
        wc = _fw_weight(wt, tm, halo, blk, x.dtype)
        out = pl.pallas_call(
            partial(_fw_mxu_kernel, mode=_mode_for(x.dtype), blk=blk,
                    halo=halo),
            grid=(R // tm, C // tn),
            in_specs=in_specs + [pl.BlockSpec(wc.shape, lambda i, j: (0, 0),
                                              memory_space=pltpu.VMEM)],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=_sem(2),
        )(x, x, x, wc)
        return out.reshape(R, C)
    out = pl.pallas_call(
        partial(_fw_kernel, wt=wt, halo=halo),
        grid=(R // tm, C // tn),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_sem(2),
    )(x, x, x)
    return out.reshape(R, C)


def axis0_level_inv(y, wt):
    """Inverse of axis0_level_fw on the packed (R, C) array."""
    R, C = y.shape
    halo = _halo_of(wt, y.dtype)
    tn = _pick_tn(C)
    cap = _budget_cap(wt, tn, np.dtype(y.dtype).itemsize)
    tm = pick_col_tm(R // 2, halo, cap=max(min(cap, 512), 2 * halo))
    packed = y.reshape(2, R // 2, C)
    nb = (R // 2) // halo
    in_specs = _halo_specs3(tm, halo, nb, tn, 0) \
        + _halo_specs3(tm, halo, nb, tn, 1)
    out_spec = pl.BlockSpec((2 * tm, tn), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((R, C), y.dtype)
    if _mxu_on() and _mxu_axis0_ok(y.dtype, tm, halo) \
            and _syn_fits(wt, halo):
        from .mxu2d import _mode_for
        blk = _axis0_blk(tm, halo, y.dtype, fw=False)
        ws = _inv_weights(wt, tm, halo, blk, y.dtype)
        return pl.pallas_call(
            partial(_inv_mxu_kernel, mode=_mode_for(y.dtype), blk=blk,
                    halo=halo),
            grid=((R // 2) // tm, C // tn),
            in_specs=in_specs + [
                pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM) for w in ws],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=_sem(2),
        )(packed, packed, packed, packed, packed, packed, *ws)
    return pl.pallas_call(
        partial(_inv_kernel, wt=wt, halo=halo, tm=tm),
        grid=((R // 2) // tm, C // tn),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_sem(2),
    )(packed, packed, packed, packed, packed, packed)


# --- explicit-halo (non-wrapping) variants for the sharded path --------------
#
# The sharded transforms exchange periodic halos ACROSS DEVICES via
# lax.ppermute (parallel/sharded.py); the kernel then must NOT wrap at the
# local block's edges.  These variants take the exchanged halo rows as
# separate inputs: interior tiles read their halo from the local array via
# the usual ring index maps, and the first/last tiles substitute the
# exchanged rows in-kernel (a select on the grid index — index maps stay
# static).

def _fw_ext_kernel(above_ref, top_ref, mid_ref, bot_ref, below_ref, o_ref,
                   *, wt, halo):
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1
    top = jnp.where(i == 0, above_ref[:], top_ref[:])
    bot = jnp.where(i == last, below_ref[:], bot_ref[:])
    _fw_kernel_body(top, mid_ref[:], bot, o_ref, wt=wt, halo=halo)


def _fw_kernel_body(top, mid, bot, o_ref, *, wt, halo):
    ext = jnp.concatenate([top, mid, bot], axis=0)
    rows, tn = ext.shape
    r = ext.reshape(rows // 2, 2, tn)
    e0, e1 = r[:, 0, :], r[:, 1, :]
    dt = ext.dtype
    if isinstance(wt, GLS):
        a, d = _steps_halves(e0, e1, wt, fw=True)
        a = a * jnp.asarray(wt.norm1, dt)
        d = d * jnp.asarray(wt.norm2, dt)
    else:
        h, g = filter_pair(wt)
        a = None
        d = None
        for m_ in range(len(h)):
            src_a = e0 if m_ % 2 == 0 else e1
            ta = jnp.asarray(h[m_], dt) * roll(src_a, -(m_ // 2), 0)
            if m_ % 2 == 0:
                td = jnp.asarray(g[m_], dt) * roll(e1, m_ // 2, 0)
            else:
                td = jnp.asarray(g[m_], dt) * roll(e0, (m_ - 1) // 2, 0)
            a = ta if a is None else a + ta
            d = td if d is None else d + td
    hh = halo // 2
    q = a.shape[0] - halo
    o_ref[0] = a[hh: hh + q]
    o_ref[1] = d[hh: hh + q]


def axis0_ext_ok(R: int, C: int, wt, dtype) -> bool:
    return axis0_ok(R, C, wt, dtype)


def axis0_level_fw_ext(above, x, below, wt):
    """One forward level along axis 0 of [above; x; below] for the x
    region only -> (R, C) packed [a | d].  ``above``/``below`` are the
    ring-exchanged halo rows (each exactly ``_halo_of(wt)`` tall)."""
    R, C = x.shape
    halo = _halo_of(wt, x.dtype)
    assert above.shape == (halo, C) and below.shape == (halo, C)
    tn = _pick_tn(C)
    cap = _budget_cap(wt, tn, np.dtype(x.dtype).itemsize)
    tm = pick_col_tm(R, halo, cap=max(cap, 2 * halo))
    step = tm // halo
    nb = R // halo
    in_specs = [
        pl.BlockSpec((halo, tn), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((halo, tn), lambda i, j: ((i * step - 1) % nb, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((halo, tn), lambda i, j: (((i + 1) * step) % nb, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((halo, tn), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((2, tm // 2, tn), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((2, R // 2, C), x.dtype)
    if _mxu_on() and _mxu_axis0_ok(x.dtype, tm, halo):
        from .mxu2d import _mode_for
        blk = _axis0_blk(tm, halo, x.dtype, fw=True)
        wc = _fw_weight(wt, tm, halo, blk, x.dtype)
        out = pl.pallas_call(
            partial(_fw_mxu_ext_kernel, mode=_mode_for(x.dtype), blk=blk,
                    halo=halo),
            grid=(R // tm, C // tn),
            in_specs=in_specs + [pl.BlockSpec(wc.shape, lambda i, j: (0, 0),
                                              memory_space=pltpu.VMEM)],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=_sem(2),
        )(above, x, x, x, below, wc)
        return out.reshape(R, C)
    out = pl.pallas_call(
        partial(_fw_ext_kernel, wt=wt, halo=halo),
        grid=(R // tm, C // tn),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_sem(2),
    )(above, x, x, x, below)
    return out.reshape(R, C)


def _inv_ext_kernel(aa_ref, at_ref, ac_ref, ab_ref, ba_ref,
                    da_ref, dt_ref, dc_ref, db_ref, bd_ref, o_ref,
                    *, wt, halo, tm):
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1
    at = jnp.where(i == 0, aa_ref[:], at_ref[:])
    ab = jnp.where(i == last, ba_ref[:], ab_ref[:])
    dtp = jnp.where(i == 0, da_ref[:], dt_ref[:])
    dbt = jnp.where(i == last, bd_ref[:], db_ref[:])
    a = jnp.concatenate([at, ac_ref[:], ab], axis=0)
    d = jnp.concatenate([dtp, dc_ref[:], dbt], axis=0)
    dt = a.dtype
    if isinstance(wt, GLS):
        a = a * jnp.asarray(1.0 / wt.norm1, dt)
        d = d * jnp.asarray(1.0 / wt.norm2, dt)
        a, d = _steps_halves(a, d, wt, fw=False)
        x0, x1 = a, d
    else:
        h, g = filter_pair(wt)
        x0 = None
        x1 = None
        for m_ in range(len(h)):
            if m_ % 2 == 0:
                t0 = jnp.asarray(h[m_], dt) * roll(a, m_ // 2, 0)
                t1 = jnp.asarray(g[m_], dt) * roll(d, -(m_ // 2), 0)
            else:
                t1 = jnp.asarray(h[m_], dt) * roll(a, (m_ - 1) // 2, 0)
                t0 = jnp.asarray(g[m_], dt) * roll(d, -((m_ - 1) // 2), 0)
            x0 = t0 if x0 is None else x0 + t0
            x1 = t1 if x1 is None else x1 + t1
    x0 = x0[halo: halo + tm]
    x1 = x1[halo: halo + tm]
    o_ref[:] = jnp.stack([x0, x1], axis=1).reshape(2 * tm, x0.shape[-1])


def axis0_level_inv_ext(a_halos, a, b_halos, d, wt):
    """Inverse level along axis 0 with exchanged halos.

    ``a``/``d`` — the local (R/2, C) scaling/detail chunks.  ``a_halos``
    = (above, below) halo rows of ``a`` from the ring neighbours (each
    ``_halo_of(wt)`` tall); ``b_halos`` likewise for ``d``.  Returns the
    merged (R, C) rows."""
    Rh, C = a.shape
    halo = _halo_of(wt, a.dtype)
    a_above, a_below = a_halos
    d_above, d_below = b_halos
    tn = _pick_tn(C)
    cap = _budget_cap(wt, tn, np.dtype(a.dtype).itemsize)
    tm = pick_col_tm(Rh, halo, cap=max(min(cap, 512), 2 * halo))
    step = tm // halo
    nb = Rh // halo

    def hs(off_kind):
        if off_kind == "pad":
            return pl.BlockSpec((halo, tn), lambda i, j: (0, j),
                                memory_space=pltpu.VMEM)
        if off_kind == "top":
            return pl.BlockSpec((halo, tn),
                                lambda i, j: ((i * step - 1) % nb, j),
                                memory_space=pltpu.VMEM)
        if off_kind == "mid":
            return pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((halo, tn),
                            lambda i, j: (((i + 1) * step) % nb, j),
                            memory_space=pltpu.VMEM)

    in_specs = [hs("pad"), hs("top"), hs("mid"), hs("bot"), hs("pad"),
                hs("pad"), hs("top"), hs("mid"), hs("bot"), hs("pad")]
    out_spec = pl.BlockSpec((2 * tm, tn), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((2 * Rh, C), a.dtype)
    if _mxu_on() and _mxu_axis0_ok(a.dtype, tm, halo) \
            and _syn_fits(wt, halo):
        from .mxu2d import _mode_for
        blk = _axis0_blk(tm, halo, a.dtype, fw=False)
        ws = _inv_weights(wt, tm, halo, blk, a.dtype)
        return pl.pallas_call(
            partial(_inv_mxu_ext_kernel, mode=_mode_for(a.dtype), blk=blk,
                    halo=halo),
            grid=(Rh // tm, C // tn),
            in_specs=in_specs + [
                pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM) for w in ws],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=_sem(2),
        )(a_above, a, a, a, a_below, d_above, d, d, d, d_below, *ws)
    return pl.pallas_call(
        partial(_inv_ext_kernel, wt=wt, halo=halo, tm=tm),
        grid=(Rh // tm, C // tn),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_sem(2),
    )(a_above, a, a, a, a_below, d_above, d, d, d, d_below)


# --- MXU variants ------------------------------------------------------------
#
# The column chains above are VPU sublane-roll chains; the same level is
# one banded matmul Y = W_c @ ext on the systolic array (see mxu2d.py's
# column stage — the weights are reused from there, including the 3-pass
# bf16-split f32 accumulation).  Measured on the 2-D level kernel the
# matmul replaces the chain cost entirely; these variants bring that to
# the axis-0 primitives used by the 3-D driver and the sharded path.

def _mxu_on() -> bool:
    import os
    return os.environ.get("WAVELETS_TPU_MXU2D") != "0"


def _mxu_axis0_ok(dtype, tm: int, halo: int) -> bool:
    d = np.dtype(dtype)
    if d == np.dtype(np.float32):
        return tm % 2 == 0
    # bf16 tiles: second-minor block dims (tm/2 fw out, halo inputs)
    # need the 16-row granule
    return d == np.dtype(jnp.bfloat16) and tm % 32 == 0 and halo % 16 == 0


def _syn_fits(wt, halo: int) -> bool:
    """Synthesis band reach must fit the exchanged/ring halo rows."""
    from .mxu2d import _syn_reach
    lo, hi = _syn_reach(wt)
    return max(lo, hi) <= halo


def _axis0_blk(tm: int, halo: int, dtype, fw: bool) -> int:
    """Block size for the axis-0 block-shared col dots.

    Tall axis-0 tiles make the dense col-dot K = tm + 2h much larger
    than the 2-D level's (tm up to 1024 vs 128), so the FLOP cut
    overwhelms the narrow-M cost for BOTH directions and dtypes —
    unlike the 2-D policy, where the f32 inverse loses.  Device A/B
    (65536x2048 level, 670 GB/s session, BENCHMARKS.md round 4): f32
    fw 2.03 -> 1.60 ms / inv 2.52 -> 1.56; bf16 fw 1.07 -> 0.79 / inv
    1.54 -> 0.81 — all four AT the same-session DMA floor; dwt3 256^3
    pipeline 1.29 -> 1.15 ms.  Defaults 16 fw / 32 inv; the same
    WAVELETS_TPU_MXU_COLBLK env overrides both layers (per-direction
    WAVELETS_TPU_MXU_COLBLK_FW / _INV take precedence, as in
    mxu2d._col_blk — ADVICE r4)."""
    import os
    from .common import halo_granule
    ov = os.environ.get("WAVELETS_TPU_MXU_COLBLK_FW" if fw
                        else "WAVELETS_TPU_MXU_COLBLK_INV")
    if ov is None:
        ov = os.environ.get("WAVELETS_TPU_MXU_COLBLK")
    q = int(ov) if ov is not None else (16 if fw else 32)
    g = halo_granule(dtype)
    if fw:
        q = min(q, tm // 2)
        while q >= 8 and (tm % (2 * q) or (2 * q) % g):
            q //= 2
    else:
        q = min(q, tm)
        while q >= 8 and (tm % q or q % g):
            q //= 2
    return q if q >= 8 else 0


def _fw_weight(wt, tm, halo, blk, dtype):
    from .mxu2d import _w_col
    return _w_col(wt, 2 * blk if blk else tm, halo, dtype)


def _inv_weights(wt, tm, halo, blk, dtype):
    """Weight ref list for the inverse col dot: the stacked full weight,
    or (wcs, wcd) halves of the shared block weight (host-side split —
    no in-kernel non-128-aligned lane slicing)."""
    from .mxu2d import _w_col_inv
    if not blk:
        return [_w_col_inv(wt, 2 * tm, halo, dtype)]
    wc = _w_col_inv(wt, 2 * blk, halo, dtype)
    E = wc.shape[1] // 2
    return [wc[:, :E], wc[:, E:]]


def _fw_col(ext, wc_ref, mode, blk, halo, dt):
    from .mxu2d import _dot_f32, _pair, _col_dot_blocked
    if blk:
        return _col_dot_blocked(_pair(wc_ref[:], mode), _pair(ext, mode),
                                mode=mode, q=blk, hm=halo,
                                tm=ext.shape[0] - 2 * halo, dt=dt)
    return _dot_f32(_pair(wc_ref[:], mode), _pair(ext, mode),
                    mode).astype(dt)


def _inv_col(a, d, wrefs, mode, blk, halo, dt):
    from .mxu2d import _dot_f32, _pair, _inv_col_dot_blocked
    if blk:
        wcs_ref, wcd_ref = wrefs
        pa = _inv_col_dot_blocked(_pair(wcs_ref[:], mode), _pair(a, mode),
                                  mode=mode, blk=blk, hm2=halo)
        pb = _inv_col_dot_blocked(_pair(wcd_ref[:], mode), _pair(d, mode),
                                  mode=mode, blk=blk, hm2=halo)
        return jnp.concatenate([x + y for x, y in zip(pa, pb)],
                               axis=0).astype(dt)
    (wc_ref,) = wrefs
    stacked = jnp.concatenate([a, d], axis=0)
    return _dot_f32(_pair(wc_ref[:], mode), _pair(stacked, mode),
                    mode).astype(dt)


def _fw_mxu_kernel(top_ref, mid_ref, bot_ref, wc_ref, o_ref, *, mode,
                   blk=0, halo=0):
    ext = jnp.concatenate([top_ref[:], mid_ref[:], bot_ref[:]], axis=0)
    Y = _fw_col(ext, wc_ref, mode, blk, halo, o_ref.dtype)
    tm2 = Y.shape[0] // 2
    o_ref[0] = Y[:tm2]
    o_ref[1] = Y[tm2:]


def _fw_mxu_ext_kernel(above_ref, top_ref, mid_ref, bot_ref, below_ref,
                       wc_ref, o_ref, *, mode, blk=0, halo=0):
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1
    top = jnp.where(i == 0, above_ref[:], top_ref[:])
    bot = jnp.where(i == last, below_ref[:], bot_ref[:])
    ext = jnp.concatenate([top, mid_ref[:], bot], axis=0)
    Y = _fw_col(ext, wc_ref, mode, blk, halo, o_ref.dtype)
    tm2 = Y.shape[0] // 2
    o_ref[0] = Y[:tm2]
    o_ref[1] = Y[tm2:]


def _inv_mxu_kernel(at_ref, ac_ref, ab_ref, dt_ref, dc_ref, db_ref,
                    *rest, mode, blk=0, halo=0):
    o_ref = rest[-1]
    a = jnp.concatenate([at_ref[0], ac_ref[0], ab_ref[0]], axis=0)
    d = jnp.concatenate([dt_ref[0], dc_ref[0], db_ref[0]], axis=0)
    o_ref[:] = _inv_col(a, d, rest[:-1], mode, blk, halo, o_ref.dtype)


def _inv_mxu_ext_kernel(aa_ref, at_ref, ac_ref, ab_ref, ba_ref,
                        da_ref, dt_ref, dc_ref, db_ref, bd_ref,
                        *rest, mode, blk=0, halo=0):
    o_ref = rest[-1]
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1
    at = jnp.where(i == 0, aa_ref[:], at_ref[:])
    ab = jnp.where(i == last, ba_ref[:], ab_ref[:])
    dtp = jnp.where(i == 0, da_ref[:], dt_ref[:])
    dbt = jnp.where(i == last, bd_ref[:], db_ref[:])
    a = jnp.concatenate([at, ac_ref[:], ab], axis=0)
    d = jnp.concatenate([dtp, dc_ref[:], dbt], axis=0)
    o_ref[:] = _inv_col(a, d, rest[:-1], mode, blk, halo, o_ref.dtype)
