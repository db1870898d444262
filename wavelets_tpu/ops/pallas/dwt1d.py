"""Pallas kernels for batched 1-D transforms.

A level of a batched 1-D DWT over (B, n) signals is two fused kernels:

1. step kernel — the interleaved lifting/correlation chain along lanes
   (full periodic rows in VMEM, identical math to the 2-D row kernels);
2. split kernel — a block-local lane butterfly that writes the scaling and
   detail bands as two separate arrays (block-local unshuffles compose to
   the global deinterleave because blocks tile the row in order).

Levels recurse on the scaling band; the packed layout is one concatenation
at the end.  A full-width butterfly inside the step kernel is avoided on
purpose: log2(n) stages over 2^20 lanes explode Mosaic's compile/VMEM
budget, while the block-local version is bounded by log2(TN).

Reference analogue: the batched line kernels of the GPU extension
(ext/WaveletsGPUExt, LineBases batching) — the batch dim is the sublane
grid here.
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
from .common import roll, deint_lanes, int_lanes

__all__ = ["dwt1d_pallas", "idwt1d_pallas", "pallas_ok"]


def _taps_count(wt) -> int:
    return len(wt.qmf) if isinstance(wt, OrthoFilter) else \
        sum(len(st.coef) for st in wt.steps)


def _pick_tm(b: int, n: int, wt, itemsize: int) -> int | None:
    """Row tile budgeted by the kernel's live-temp footprint."""
    live = 2 * _taps_count(wt) + 10
    budget_elems = (12 << 20) // itemsize // live
    tm = 512
    while tm > 8 and (tm * n > budget_elems or b % tm):
        tm //= 2
    return tm if (b % tm == 0 and tm * n <= budget_elems) else None


def _lift_interleaved(v, scheme: GLS, fw: bool):
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    even = (lane % 2) == 0
    steps = scheme.steps if fw else scheme.steps[::-1]
    sign = -1.0 if fw else 1.0
    for st in steps:
        pred = st.kind == PREDICT
        acc = None
        for k, c in enumerate(st.coef):
            off = 2 * (k - st.shift) + (1 if pred else -1)
            t = roll(v, -off, v.ndim - 1)
            t = jnp.asarray(sign * c, v.dtype) * t
            acc = t if acc is None else acc + t
        mask = even if pred else jnp.logical_not(even)
        v = jnp.where(mask, v + acc, v)
    return v, even


def _step_fw_kernel(x_ref, o_ref, *, wt):
    v = x_ref[:]
    dt = v.dtype
    if isinstance(wt, GLS):
        v, even = _lift_interleaved(v, wt, fw=True)
        o_ref[:] = v * jnp.where(even, jnp.asarray(wt.norm1, dt),
                                 jnp.asarray(wt.norm2, dt))
        return
    h, g = filter_pair(wt)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    even = (lane % 2) == 0
    za = None
    zd = None
    for m_ in range(len(h)):
        ta = jnp.asarray(h[m_], dt) * roll(v, -m_, v.ndim - 1)
        td = jnp.asarray(g[m_], dt) * roll(v, m_, v.ndim - 1)
        za = ta if za is None else za + ta
        zd = td if zd is None else zd + td
    o_ref[:] = jnp.where(even, za, zd)


def _step_inv_kernel(z_ref, o_ref, *, wt):
    z = z_ref[:]
    dt = z.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, z.ndim - 1)
    even = (lane % 2) == 0
    if isinstance(wt, GLS):
        z = z * jnp.where(even, jnp.asarray(1.0 / wt.norm1, dt),
                          jnp.asarray(1.0 / wt.norm2, dt))
        z, _ = _lift_interleaved(z, wt, fw=False)
        o_ref[:] = z
        return
    h, g = filter_pair(wt)
    u = jnp.where(even, z, 0)
    w_ = jnp.where(even, roll(z, -1, z.ndim - 1), 0)
    x = None
    for m_ in range(len(h)):
        ts = jnp.asarray(h[m_], dt) * roll(u, m_, z.ndim - 1)
        td = jnp.asarray(g[m_], dt) * roll(w_, 1 - m_, z.ndim - 1)
        t = ts + td
        x = t if x is None else x + t
    o_ref[:] = x


def _steps(x, wt, fw: bool):
    b, n = x.shape
    tm = _pick_tm(b, n, wt, np.dtype(x.dtype).itemsize)
    kern = partial(_step_fw_kernel if fw else _step_inv_kernel, wt=wt)
    return pl.pallas_call(
        kern,
        grid=(b // tm,),
        in_specs=[pl.BlockSpec((tm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), x.dtype),
        compiler_params=_sem(1),
    )(x)


# --- block-local lane split/merge kernels -----------------------------------

def _split_kernel(z_ref, s_ref, d_ref):
    u = deint_lanes(z_ref[:])
    half = u.shape[-1] // 2
    s_ref[:] = u[:, :half]
    d_ref[:] = u[:, half:]


def _merge_kernel(s_ref, d_ref, z_ref):
    z_ref[:] = int_lanes(jnp.concatenate([s_ref[:], d_ref[:]], axis=-1))


def _split_tiles(b: int, n: int):
    tn = 512 if n % 512 == 0 else 256
    tm = 256
    while tm > 8 and b % tm:
        tm //= 2
    return tm, tn


def _split(z):
    b, n = z.shape
    tm, tn = _split_tiles(b, n)
    half_spec = pl.BlockSpec((tm, tn // 2), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _split_kernel,
        grid=(b // tm, n // tn),
        in_specs=[pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=(half_spec, half_spec),
        out_shape=(jax.ShapeDtypeStruct((b, n // 2), z.dtype),
                   jax.ShapeDtypeStruct((b, n // 2), z.dtype)),
        compiler_params=_sem(2),
    )(z)


def _merge(s, d):
    b, half = s.shape
    n = 2 * half
    tm, tn = _split_tiles(b, n)
    half_spec = pl.BlockSpec((tm, tn // 2), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _merge_kernel,
        grid=(b // tm, n // tn),
        in_specs=[half_spec, half_spec],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), s.dtype),
        compiler_params=_sem(2),
    )(s, d)


def _level_ok(b: int, n: int, wt, dtype) -> bool:
    from .common import dtype_ok, halo_granule
    if n % 512 or b % (2 * halo_granule(dtype)):
        return False
    if not dtype_ok(dtype):
        # bf16's safe route is the MXU level kernel (no lane rolls);
        # _level prefers it under the same predicate, so the VPU
        # steps+split pair is never reached for bf16
        return _mxu_on() and _mxu_level_plan(b, n, wt, dtype) is not None
    if _pick_tm(b, n, wt, np.dtype(dtype).itemsize) is None:
        return False
    if isinstance(wt, OrthoFilter) and 2 * len(wt.qmf) > n:
        return False
    return True


def pallas_ok(shape, wt, L: int, dtype) -> bool:
    """Batched-1-D eligibility: (B, n) with the first level's width OK."""
    if len(shape) != 2 or L < 1:
        return False
    b, n = shape
    return _level_ok(b, n, wt, dtype)


def _level(x, wt, fw: bool):
    """One packed level: the MXU banded-matmul kernel when the plan
    accepts (also the WPT batched-segment route), else steps + split
    (fw) / merge + steps (inv)."""
    mxu = _mxu_on() and _mxu_level_plan(*x.shape, wt, x.dtype) is not None
    if fw:
        if mxu:
            s, d = _mxu_level_fw(x, wt)
        else:
            s, d = _split(_steps(x, wt, True))
        return jnp.concatenate([s, d], axis=-1)
    half = x.shape[-1] // 2
    if mxu:
        return _mxu_level_inv(x[:, :half], x[:, half:], wt)
    return _steps(_merge(x[:, :half], x[:, half:]), wt, False)


def _pyr_b_on() -> bool:
    """Batched pyramid routing is OPT-IN (WAVELETS_TPU_PYR1DB=1):
    measured on-device, the per-level MXU route wins for batched shapes
    (3.65 vs 4.40 ms at (64, 2^18) L8 in an interleaved same-session
    A/B) — the batch dimension already gives each per-level launch big
    well-shaped tiles, while the staged pyramid pays ~1.5-2 us per
    packed-output grid step and small-tile dot inefficiency.  The
    SINGLE-signal pyramid stays default (wide1d.py): there the
    per-level alternative has no batch to tile over and loses 1.6x."""
    import os
    return os.environ.get("WAVELETS_TPU_PYR1DB") == "1"


def dwt1d_pallas(x, wt, L: int, allow_pyr: bool = True):
    """(B, n) batched multi-level 1-D DWT, packed layout per row.

    ``allow_pyr=False`` skips the (opt-in) batched pyramid route — its
    stages alias-chain a pl.ANY buffer that cannot be vmap-batched, so
    the transforms-layer vmap guard batches this per-level route."""
    if L == 0:
        return x
    from .pyramid1d import plan_stages, dwt1d_pyramid_b
    if allow_pyr and _pyr_b_on() and plan_stages(x.shape[1], wt, L, x.dtype):
        return dwt1d_pyramid_b(x, wt, L)
    b, n = x.shape
    s = x
    details = []
    for l in range(L):
        ns = n >> l
        if _mxu_on() and _mxu_level_plan(b, ns, wt, x.dtype) is not None:
            sd, d = _mxu_level_fw(s, wt)
        elif _level_ok(b, ns, wt, x.dtype):
            sd, d = _split(_steps(s, wt, True))
        else:  # tiny tail level: jnp fallback
            z = _level_jnp(s, wt, fw=True)
            sd, d = z[:, : ns // 2], z[:, ns // 2:]
        s = sd
        details.append(d)
    return jnp.concatenate([s] + details[::-1], axis=-1)


def idwt1d_pallas(y, wt, L: int, allow_pyr: bool = True):
    if L == 0:
        return y
    from .pyramid1d import plan_stages, idwt1d_pyramid_b
    if allow_pyr and _pyr_b_on() and plan_stages(y.shape[1], wt, L, y.dtype):
        return idwt1d_pyramid_b(y, wt, L)
    b, n = y.shape
    s = y[:, : n >> L]
    for l in range(L, 0, -1):
        ns = n >> (l - 1)
        d = y[:, ns // 2: ns]
        if _mxu_on() and _mxu_level_plan(b, ns, wt, y.dtype) is not None:
            s = _mxu_level_inv(s, d, wt)
        elif _level_ok(b, ns, wt, y.dtype):
            s = _steps(_merge(s, d), wt, False)
        else:
            z = jnp.concatenate([s, d], axis=-1)
            s = _level_jnp(z, wt, fw=False)
    return s


def _level_jnp(z, wt, fw: bool):
    from .. import filter_fb as F, lifting as Lf
    half = z.shape[-1] // 2
    if isinstance(wt, GLS):
        if fw:
            s, d = Lf.lifting_level_fw(z, wt)
            return jnp.concatenate([s, d], axis=-1)
        return Lf.lifting_level_inv(z[..., :half], z[..., half:], wt)
    h, g = filter_pair(wt)
    if fw:
        a, d = F.dwt_level(z, h, g)
        return jnp.concatenate([a, d], axis=-1)
    return F.idwt_level(z[..., :half], z[..., half:], h, g)


# --- MXU level ---------------------------------------------------------------
#
# One banded matmul replaces the steps+split (and merge+steps) kernel
# pair: lane-halo'd tiles hit the _w_row / _w_row_inv weights of
# mxu2d.py (deinterleave baked in, 3-pass bf16-split f32 accumulation),
# so a level costs 1 read + 1 write instead of 4 passes, with no
# butterfly.  The scaling/detail bands come out as separate arrays —
# exactly what the multi-level driver wants (one final concat).

def _mxu_on() -> bool:
    import os
    return os.environ.get("WAVELETS_TPU_MXU2D") != "0"


def _mxu_level_plan(b: int, n: int, wt, dtype):
    from .common import halo_granule
    from .mxu2d import _band_reach, _syn_reach, _mxu_dtype_ok
    if not _mxu_dtype_ok(dtype):   # f32 or bf16 (native 1-pass dots)
        return None
    lo, hi = _band_reach(wt)
    lo2, hi2 = _syn_reach(wt)
    if max(lo, hi, lo2, hi2) > 120:
        return None
    tn = next((c for c in (2048, 1024, 512, 256) if n % c == 0), None)
    if tn is None or n % 128 or n // 128 < 2:
        return None
    gran = halo_granule(dtype)     # min sublane tile: 8 f32 / 16 bf16
    budget = (12 << 20) // np.dtype(dtype).itemsize // 10
    tm = 512
    while tm > gran and (tm * (tn + 256) > budget or b % tm):
        tm //= 2
    if b % tm or tm % gran or tm * (tn + 256) > budget:
        return None
    return tm, tn


def _lane_halo_specs(n: int, tm: int, tn: int):
    """(left, center, right) lane-ring specs over a (B, n) array."""
    nbn = n // 128
    sn = tn // 128
    return [
        pl.BlockSpec((tm, 128), lambda i, j: (i, (j * sn - 1) % nbn),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, 128), lambda i, j: (i, ((j + 1) * sn) % nbn),
                     memory_space=pltpu.VMEM),
    ]


def _mxu_fw_kernel(l_ref, c_ref, r_ref, wr_ref, s_ref, d_ref, *, gl, m,
                   mode):
    from .mxu2d import _dot_f32, _pair
    ext = jnp.concatenate([l_ref[:], c_ref[:], r_ref[:]], axis=1)
    tn = ext.shape[1] - 256
    wr = _pair(wr_ref[:], mode)
    ext_p = _pair(ext, mode)
    w_ = gl + 2 * m
    off = 128 - m

    def win(p, j):
        a, (hi, lo) = p
        sl = (slice(None), slice(gl * j + off, gl * j + off + w_))
        return a[sl], ((hi[sl], lo[sl]) if hi is not None else (None, None))

    pieces = [_dot_f32(win(ext_p, j), wr, mode)
              for j in range(tn // gl)]
    s_ref[:] = jnp.concatenate([p[:, : gl // 2] for p in pieces],
                               axis=1).astype(s_ref.dtype)
    d_ref[:] = jnp.concatenate([p[:, gl // 2:] for p in pieces],
                               axis=1).astype(d_ref.dtype)


def _mxu_inv_kernel(sl_ref, sc_ref, sr_ref, dl_ref, dc_ref, dr_ref,
                    wr_ref, o_ref, *, gl, m, mode):
    from .mxu2d import _dot_f32, _pair
    s_ext = jnp.concatenate([sl_ref[:], sc_ref[:], sr_ref[:]], axis=1)
    d_ext = jnp.concatenate([dl_ref[:], dc_ref[:], dr_ref[:]], axis=1)
    wr = _pair(wr_ref[:], mode)
    s_p = _pair(s_ext, mode)
    d_p = _pair(d_ext, mode)
    g2 = gl // 2
    wv = g2 + 2 * m
    off = 128 - m

    def win(p, j):
        a, (hi, lo) = p
        sl = (slice(None), slice(g2 * j + off, g2 * j + off + wv))
        return a[sl], ((hi[sl], lo[sl]) if hi is not None else (None, None))

    nj = (s_ext.shape[1] - 256) // g2
    pieces = []
    for j in range(nj):
        sa, (sh, sl_) = win(s_p, j)
        da, (dh, dl) = win(d_p, j)
        a = jnp.concatenate([sa, da], axis=1)
        pair = (a, ((jnp.concatenate([sh, dh], axis=1),
                     jnp.concatenate([sl_, dl], axis=1))
                    if sh is not None else (None, None)))
        pieces.append(_dot_f32(pair, wr, mode))
    o_ref[:] = jnp.concatenate(pieces, axis=1).astype(o_ref.dtype)


def _mxu_level_fw(x, wt):
    """(B, n) -> ((B, n/2) scaling, (B, n/2) detail), one kernel."""
    from .mxu2d import _w_row, _row_gl, _row_margin, _mode_for
    b, n = x.shape
    tm, tn = _mxu_level_plan(b, n, wt, x.dtype)
    gl = _row_gl(tn)
    mr = _row_margin(wt)
    wr = _w_row(wt, x.dtype, gl, mr)
    half_spec = pl.BlockSpec((tm, tn // 2), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_mxu_fw_kernel, gl=gl, m=mr, mode=_mode_for(x.dtype)),
        grid=(b // tm, n // tn),
        in_specs=_lane_halo_specs(n, tm, tn) + [
            pl.BlockSpec(wr.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=(half_spec, half_spec),
        out_shape=(jax.ShapeDtypeStruct((b, n // 2), x.dtype),
                   jax.ShapeDtypeStruct((b, n // 2), x.dtype)),
        compiler_params=_sem(2),
    )(x, x, x, wr)


def _mxu_level_inv(s, d, wt):
    """((B, n/2) scaling, (B, n/2) detail) -> (B, n), one kernel."""
    from .mxu2d import _w_row_inv, _row_gl, _row_margin, _mode_for
    b, nh = s.shape
    n = 2 * nh
    tm, tn = _mxu_level_plan(b, n, wt, s.dtype)
    tn2 = tn // 2
    gl = _row_gl(tn)
    mr = _row_margin(wt, fw=False)   # synthesis windows prefer 32-granule
    wr = _w_row_inv(wt, s.dtype, gl, mr)
    hs = _lane_halo_specs(nh, tm, tn2)
    return pl.pallas_call(
        partial(_mxu_inv_kernel, gl=gl, m=mr, mode=_mode_for(s.dtype)),
        grid=(b // tm, n // tn),
        in_specs=hs + hs + [
            pl.BlockSpec(wr.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), s.dtype),
        compiler_params=_sem(2),
    )(s, s, s, d, d, d, wr)
