"""Fused Pallas TPU kernels for the 2-D filter-bank DWT.

Same architecture as the lifting kernels (lifting2d.py): per level a row
kernel over full VMEM-resident rows and a ring-halo column kernel, with
levels exchanging a quadrant pytree and a single packed-layout assembly at
the end.  The per-sample math is the closed-form periodic correlation pair
(see ops/filter_fb.py):

    a[k] = sum_m h[m] x[(2k+m)   mod n]
    d[k] = sum_m g[m] x[(2k+1-m) mod n]

Row kernel emits the *interleaved* pair z[2k]=a[k], z[2k+1]=d[k]:

    z[t] = even(t) ? sum_m h[m] x[t+m] : sum_m g[m] x[t-m]

i.e. flen lane-rolls per filter + a parity select — circular rolls give the
periodic wrap exactly.  The column kernel computes the same along sublanes
on the halved (even/odd row) representation and butterflies lanes into the
four quadrants.  Inverse kernels implement the exact adjoint.

Reference analogue: the fused filtdown/filtup pair kernels of the GPU
extension (ext/WaveletsGPUExt/filter_transforms_gpu.jl:4-113), which handle
one axis per launch; here a whole separable level is two launches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...wt.carriers import OrthoFilter
from ..filter_fb import filter_pair
from .common import roll, deint_lanes, int_lanes, halo_specs, roundup, \
    pick_col_tm, pick_row_tm

__all__ = ["dwt2_filter", "idwt2_filter", "pallas_ok"]


def _taps(wt: OrthoFilter, dtype):
    h, g = filter_pair(wt)
    return h.astype(np.float32), g.astype(np.float32)


# --- tile planning ----------------------------------------------------------

def _plan_level(m: int, n: int, flen: int, dtype):
    if n % 256 or m % 16:
        return None
    from .common import dtype_ok, halo_granule
    if not dtype_ok(dtype):   # bf16 VPU kernels are opt-in (bitcast rolls)
        return None
    halo = roundup(max(flen, 2), halo_granule(dtype))  # both directions' reach
    tn = 256 if n % 512 else 512
    # The inverse row kernel keeps ~2*flen+4 live block temps on Mosaic's
    # VMEM stack (u/w plus a roll per tap per filter; db4 at 1 MB blocks
    # needed 17.1 MB) — size its tile separately; the forward kernel's
    # rolls retire into the two accumulators and fit the flat budget
    tm_row = pick_row_tm(m, n, np.dtype(dtype).itemsize)
    tm_row_inv = pick_row_tm(m, n, np.dtype(dtype).itemsize,
                             live=2 * flen + 4)
    if tm_row is None or tm_row_inv is None:
        return None
    # Mosaic stack-allocates the kernel's live temporaries in VMEM; measured
    # live set is ~(flen + 8) tiles, so budget the column tile accordingly
    # (db4 @ tm=1024,tn=512 needed 31.5 MB -> ~15 live 2 MB tiles)
    budget_elems = (14 << 20) // np.dtype(dtype).itemsize // (flen + 8)
    cap = 8
    while cap * 2 * tn <= budget_elems and cap < 1024:
        cap *= 2
    cap = max(cap, 2 * halo)
    tm_col = pick_col_tm(m, halo, cap=cap)
    tm_col_inv = pick_col_tm(m // 2, halo, cap=min(cap, 512))
    if tm_col is None or tm_col_inv is None:
        return None
    if 2 * halo >= m:
        return None
    return tm_row, tm_row_inv, tm_col, tm_col_inv, halo, tn


def pallas_ok(shape, wt: OrthoFilter, L: int, dtype) -> bool:
    """MXU plan first (default body; wider shape acceptance; the safe
    bf16 route) — see lifting2d.pallas_ok."""
    if len(shape) != 2 or L < 1:
        return False
    m, n = shape
    import os
    if os.environ.get("WAVELETS_TPU_MXU2D") != "0":
        from .mxu2d import mxu_ok
        if mxu_ok(m, n, wt, dtype):
            return True
    from .common import dtype_ok
    if not dtype_ok(dtype):
        return False
    return _plan_level(m, n, len(wt.qmf), dtype) is not None


# --- row kernels ------------------------------------------------------------

def _row_fw_kernel(x_ref, o_ref, *, h, g):
    v = x_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    even = (lane % 2) == 0
    dt = v.dtype
    za = None
    zd = None
    for m_ in range(len(h)):
        ta = jnp.asarray(h[m_], dt) * roll(v, -m_, v.ndim - 1)
        td = jnp.asarray(g[m_], dt) * roll(v, m_, v.ndim - 1)
        za = ta if za is None else za + ta
        zd = td if zd is None else zd + td
    o_ref[:] = jnp.where(even, za, zd)


def _row_inv_kernel(z_ref, o_ref, *, h, g):
    z = z_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, z.shape, z.ndim - 1)
    even = (lane % 2) == 0
    dt = z.dtype
    u = jnp.where(even, z, 0)                    # upsampled a
    w = jnp.where(even, roll(z, -1, z.ndim - 1), 0)  # upsampled d (shifted)
    x = None
    for m_ in range(len(h)):
        ts = jnp.asarray(h[m_], dt) * roll(u, m_, z.ndim - 1)
        td = jnp.asarray(g[m_], dt) * roll(w, 1 - m_, z.ndim - 1)
        t = ts + td
        x = t if x is None else x + t
    o_ref[:] = x


def _rows(x, wt: OrthoFilter, tm: int, fw: bool):
    m, n = x.shape
    h, g = _taps(wt, x.dtype)
    kern = partial(_row_fw_kernel if fw else _row_inv_kernel, h=h, g=g)
    return pl.pallas_call(
        kern,
        grid=(m // tm,),
        in_specs=[pl.BlockSpec((tm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x)


# --- column kernels ---------------------------------------------------------

def _col_fw_kernel(top_ref, mid_ref, bot_ref,
                   ll_ref, lh_ref, hl_ref, hh_ref, *, h, g, halo):
    ext = jnp.concatenate([top_ref[:], mid_ref[:], bot_ref[:]], axis=0)
    rows, tn = ext.shape
    r = ext.reshape(rows // 2, 2, tn)
    e0, e1 = r[:, 0, :], r[:, 1, :]              # even / odd source rows
    dt = ext.dtype
    # a[q] = sum_m h[m] ext[2q+m]; d[q] = sum_m g[m] ext[2q+1-m]
    a = None
    d = None
    for m_ in range(len(h)):
        src_a = e0 if m_ % 2 == 0 else e1
        ta = jnp.asarray(h[m_], dt) * roll(src_a, -(m_ // 2), 0)
        # 2q+1-m: odd row (e1) shifted by -((-m)//2) when m even ...
        if m_ % 2 == 0:
            td = jnp.asarray(g[m_], dt) * roll(e1, m_ // 2, 0)
        else:
            td = jnp.asarray(g[m_], dt) * roll(e0, (m_ - 1) // 2, 0)
        a = ta if a is None else a + ta
        d = td if d is None else d + td
    hh_ = halo // 2
    q = a.shape[0] - halo
    a = deint_lanes(a[hh_: hh_ + q])
    d = deint_lanes(d[hh_: hh_ + q])
    half = tn // 2
    ll_ref[:] = a[:, :half]
    lh_ref[:] = a[:, half:]
    hl_ref[:] = d[:, :half]
    hh_ref[:] = d[:, half:]


def _cols_fw_quads(x, wt: OrthoFilter, tm: int, halo: int, tn: int):
    m, n = x.shape
    h, g = _taps(wt, x.dtype)
    qshape = jax.ShapeDtypeStruct((m // 2, n // 2), x.dtype)
    qspec = pl.BlockSpec((tm // 2, tn // 2), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_col_fw_kernel, h=h, g=g, halo=halo),
        grid=(m // tm, n // tn),
        in_specs=halo_specs(tm, halo, m // halo, tn),
        out_specs=(qspec, qspec, qspec, qspec),
        out_shape=(qshape, qshape, qshape, qshape),
    )(x, x, x)


def _col_inv_kernel(llt, llc, llb, lht, lhc, lhb,
                    hlt, hlc, hlb, hht, hhc, hhb, x_ref,
                    *, h, g, halo, tm):
    a = jnp.concatenate([
        jnp.concatenate([llt[:], llc[:], llb[:]], axis=0),
        jnp.concatenate([lht[:], lhc[:], lhb[:]], axis=0)], axis=1)
    d = jnp.concatenate([
        jnp.concatenate([hlt[:], hlc[:], hlb[:]], axis=0),
        jnp.concatenate([hht[:], hhc[:], hhb[:]], axis=0)], axis=1)
    a = int_lanes(a)
    d = int_lanes(d)
    dt = a.dtype
    # x[2q]   = sum_{m even} h[m] a[q - m/2]     + sum_{m odd}  g[m] d[q + (m-1)/2]
    # x[2q+1] = sum_{m odd}  h[m] a[q - (m-1)/2] + sum_{m even} g[m] d[q + m/2]
    x0 = None
    x1 = None
    for m_ in range(len(h)):
        if m_ % 2 == 0:
            t0 = jnp.asarray(h[m_], dt) * roll(a, m_ // 2, 0)
            t1 = jnp.asarray(g[m_], dt) * roll(d, -(m_ // 2), 0)
            x0 = t0 if x0 is None else x0 + t0
            x1 = t1 if x1 is None else x1 + t1
        else:
            t1 = jnp.asarray(h[m_], dt) * roll(a, (m_ - 1) // 2, 0)
            t0 = jnp.asarray(g[m_], dt) * roll(d, -((m_ - 1) // 2), 0)
            x1 = t1 if x1 is None else x1 + t1
            x0 = t0 if x0 is None else x0 + t0
    x0 = x0[halo: halo + tm]
    x1 = x1[halo: halo + tm]
    x_ref[:] = jnp.stack([x0, x1], axis=1).reshape(2 * tm, x0.shape[-1])


def _cols_inv_quads(ll, lh, hl, hh, wt: OrthoFilter, tm: int, halo: int,
                    tn: int):
    mh, nh = ll.shape
    h, g = _taps(wt, ll.dtype)
    hspec = halo_specs(tm, halo, mh // halo, tn // 2)
    return pl.pallas_call(
        partial(_col_inv_kernel, h=h, g=g, halo=halo, tm=tm),
        grid=(mh // tm, 2 * nh // tn),
        in_specs=hspec + hspec + hspec + hspec,
        out_specs=pl.BlockSpec((2 * tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * mh, 2 * nh), ll.dtype),
    )(ll, ll, ll, lh, lh, lh, hl, hl, hl, hh, hh, hh)


# --- level + multi-level drivers --------------------------------------------

def _level2_jnp(active, wt: OrthoFilter, fw: bool):
    from .. import filter_fb as F
    h, g = filter_pair(wt)
    if fw:
        a, d = F.dwt_level(active, h, g)
        rowt = jnp.concatenate([a, d], axis=-1)
        moved = jnp.moveaxis(rowt, 0, -1)
        a, d = F.dwt_level(moved, h, g)
        return jnp.moveaxis(jnp.concatenate([a, d], axis=-1), -1, 0)
    m = active.shape[0]
    moved = jnp.moveaxis(active, 0, -1)
    col = jnp.moveaxis(
        F.idwt_level(moved[..., : m // 2], moved[..., m // 2:], h, g), -1, 0)
    half = col.shape[-1] // 2
    return F.idwt_level(col[..., :half], col[..., half:], h, g)


def _level_fw_quads(active, wt: OrthoFilter):
    m, n = active.shape
    # Single-pass fused level kernel (fused2d.py): ~2.3 HBM passes per
    # level vs this pipeline's ~4.  Opt out with WAVELETS_TPU_FUSED2D=0.
    import os
    # MXU banded-matmul level (mxu2d.py) — measured 1.5x the VPU fused
    # kernel at 8192^2; opt out with WAVELETS_TPU_MXU2D=0.
    if os.environ.get("WAVELETS_TPU_MXU2D") != "0":
        from .mxu2d import mxu_ok, mxu_level_fw_quads
        if mxu_ok(m, n, wt, active.dtype):
            return mxu_level_fw_quads(active, wt)
    if os.environ.get("WAVELETS_TPU_FUSED2D") != "0":
        from .fused2d import fused_ok, fused_level_fw_quads
        if fused_ok(m, n, wt, active.dtype):
            return fused_level_fw_quads(active, wt)
    plan = _plan_level(m, n, len(wt.qmf), active.dtype)
    if plan is None:
        out = _level2_jnp(active, wt, fw=True)
        mh, nh = m // 2, n // 2
        return (out[:mh, :nh], out[:mh, nh:], out[mh:, :nh], out[mh:, nh:])
    tm_row, _, tm_col, _, halo, tn = plan
    rowt = _rows(active, wt, tm_row, fw=True)
    return _cols_fw_quads(rowt, wt, tm_col, halo, tn)


def _level_inv_quads(ll, lh, hl, hh, wt: OrthoFilter):
    mh, nh = ll.shape
    m, n = 2 * mh, 2 * nh
    import os
    # MXU synthesis kernel (mxu2d.py): single pass, no butterfly, 4
    # quadrant halo reads.  Opt out with WAVELETS_TPU_MXU2D=0.
    if os.environ.get("WAVELETS_TPU_MXU2D") != "0":
        from .mxu2d import mxu_inv_ok, mxu_inv_quads
        if mxu_inv_ok(m, n, wt, ll.dtype):
            return mxu_inv_quads(ll, lh, hl, hh, wt)
    # measured on v5e: the 36-ref fused inverse is corner-DMA-bound
    # (~2.6x slower than the two-kernel inverse at 8192^2) — opt-in
    # until the halo windows are batched
    if os.environ.get("WAVELETS_TPU_FUSED_INV") == "1":
        from .fused2d import fused_inv_ok, fused_level_inv_quads
        if fused_inv_ok(m, n, wt, ll.dtype):
            return fused_level_inv_quads(ll, lh, hl, hh, wt)
    plan = _plan_level(m, n, len(wt.qmf), ll.dtype)
    if plan is None:
        packed = jnp.concatenate([
            jnp.concatenate([ll, lh], axis=1),
            jnp.concatenate([hl, hh], axis=1)], axis=0)
        return _level2_jnp(packed, wt, fw=False)
    _, tm_row_inv, _, tm_ci, halo, tn = plan
    col = _cols_inv_quads(ll, lh, hl, hh, wt, tm_ci, halo, tn)
    return _rows(col, wt, tm_row_inv, fw=False)


def _dwt2_quads(x, wt: OrthoFilter, L: int):
    from . import tail2d
    ll = x
    details = []
    for l in range(L):
        rem = L - l
        m, n = ll.shape
        Lt = tail2d.tail_fit(m, n, rem, wt, ll.dtype)
        if Lt >= min(rem, 2):    # collapse small deep levels: one launch
            packed = tail2d.tail_fw(ll, wt, Lt)
            if Lt < rem:
                sub = _dwt2_quads(packed[: m >> Lt, : n >> Lt], wt, rem - Lt)
                packed = jax.lax.dynamic_update_slice(packed, sub, (0, 0))
            ll = packed
            break
        ll, lh, hl, hh = _level_fw_quads(ll, wt)
        details.append((lh, hl, hh))
    y = ll
    for lh, hl, hh in reversed(details):
        y = jnp.concatenate([
            jnp.concatenate([y, lh], axis=1),
            jnp.concatenate([hl, hh], axis=1)], axis=0)
    return y


def _dwt2_packed(x, wt: OrthoFilter, L: int):
    """Packed-mode driver (see lifting2d._dwt2_packed): detail quadrants
    stream straight into the alias-chained full-size buffer."""
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
    # fused 2-level first stage (see lifting2d._dwt2_packed)
    from .stage2d import stage2_ok, stage2_fw
    if (mxu and L >= 2 and _packed_dma()
            and stage2_ok(m, n, wt, x.dtype)
            and mxu_packed_ok(m, n, wt, x.dtype)):
        if L == 2:
            return stage2_fw(x, None, (m, n), wt, last=True)
        ll, y = stage2_fw(x, None, (m, n), wt)
        done = 2
    for l in range(done, L):
        if mxu and mxu_packed_ok(m >> l, n >> l, wt, x.dtype):
            if l == L - 1 and _packed_dma():
                # final level: ll streams into y in-kernel (see
                # lifting2d._dwt2_packed)
                return mxu_level_fw_packed_last(ll, y, (m, n), wt)
            ll, y = (mxu_level_fw_packed_first(ll, wt) if y is None
                     else mxu_level_fw_packed(ll, y, wt))
        elif vpu and packed_ok(m >> l, n >> l, wt, x.dtype):
            ll, y = (level_fw_packed_first(ll, wt) if y is None
                     else level_fw_packed(ll, y, wt))
        else:
            break
        done += 1
    if y is None:
        return None
    if done < L:
        ll = _dwt2_quads(ll, wt, L - done)   # small tail levels
    return jax.lax.dynamic_update_slice(y, ll, (0, 0))


def dwt2_filter(x, wt: OrthoFilter, L: int, packed: bool = True):
    """Multi-level forward 2-D filter-bank DWT, packed layout (Pallas).

    ``packed=False`` forces quadrant mode (vmap-safe — see
    lifting2d.dwt2_lifting)."""
    if L == 0:
        return x
    import os
    # Packed mode (device-validated bit-exact vs quadrant mode): detail
    # quadrants stream straight into the final packed buffer, no XLA
    # assembly pass.  Opt out with WAVELETS_TPU_PACKED2D=0.
    if packed and os.environ.get("WAVELETS_TPU_PACKED2D") != "0":
        y = _dwt2_packed(x, wt, L)
        if y is not None:
            return y
    return _dwt2_quads(x, wt, L)


def idwt2_filter(y, wt: OrthoFilter, L: int):
    """Inverse of dwt2_filter (packed-read fused levels where eligible —
    see lifting2d.idwt2_lifting)."""
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
                          wt, y.dtype):
            Lt = cand
            break
    if Lt >= min(L, 2):
        cm, cn = m >> (L - Lt), n >> (L - Lt)
        ll = tail2d.tail_inv(y[:cm, :cn], wt, Lt)
        start = L - Lt
    else:
        ll = y[: m >> L, : n >> L]
        start = L
    for l in range(start, 0, -1):
        mh, nh = m >> l, n >> l
        if mxu and mxu_inv_ok(2 * mh, 2 * nh, wt, y.dtype):
            ll = mxu_inv_packed(y, ll, (2 * mh, 2 * nh), wt)
            continue
        if fused and fused_inv_ok(2 * mh, 2 * nh, wt, y.dtype):
            ll = level_inv_packed(y, ll, (2 * mh, 2 * nh), wt)
            continue
        lh = y[:mh, nh: 2 * nh]
        hl = y[mh: 2 * mh, :nh]
        hh = y[mh: 2 * mh, nh: 2 * nh]
        ll = _level_inv_quads(ll, lh, hl, hh, wt)
    return ll
