"""Multi-chip sharded 2-D transforms: shard_map + ring halo exchange.

TPU-native scaling design (this subsystem has no reference analogue — the
reference is single-process; see SURVEY.md §2.3):

* images are sharded by rows over a 1-D device mesh axis, P(axis, None);
* the row-direction (last-axis) transform of each level is fully local;
* the column-direction transform needs only a (filterlen-2)-row periodic
  halo from the ring neighbors — periodic boundaries make the mesh ring
  *exactly* the boundary topology, so each level costs one
  `lax.ppermute` pair per axis and zero other communication;
* per level the active (scaling) band halves; it is re-sharded across all
  devices between levels (a slice under GSPMD), keeping every chip busy at
  every level;
* when the active band becomes too small to shard (local rows < halo or
  odd), the level falls back to the plain global formulation — the band is
  then tiny (O(m / 2^l)) and XLA replicates it cheaply.

Outputs use the same packed layout as the single-chip API, so
``sharded.dwt2`` is a drop-in for ``dwt`` on 2-D arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7: public API (the experimental path is deprecated)
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..utils.indexing import maxtransformlevels
from ..wt.carriers import OrthoFilter
from ..wt.schemes import PREDICT
from ..ops import filter_fb, lifting

__all__ = ["make_mesh", "dwt1", "idwt1", "dwt2", "idwt2", "dwt3", "idwt3",
           "shard_rows"]


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices:
        raise ValueError(f"make_mesh({n_devices}): only {len(devs)} "
                         "devices visible")
    return Mesh(np.array(devs[:n_devices]), (axis,))


def shard_rows(x, mesh: Mesh, axis: str = "x"):
    """Place a 2-D array row-sharded over the mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis, None)))


def _ring_from_next(blk, rows, axis_name, nd, wrap=True):
    """Each device receives the *next* device's first ``rows`` rows.
    ``wrap=False`` drops the ring's wrap link: the LAST device then
    receives ZEROS (lax.ppermute semantics) — exactly the "zeropad"
    boundary extension."""
    perm = ([(j, (j - 1) % nd) for j in range(nd)] if wrap
            else [(j, j - 1) for j in range(1, nd)])
    return lax.ppermute(blk[:rows], axis_name, perm=perm)


def _ring_from_prev(blk, rows, axis_name, nd, wrap=True):
    """Each device receives the *previous* device's last ``rows`` rows.
    ``wrap=False``: the FIRST device receives zeros (see _ring_from_next)."""
    perm = ([(j, (j + 1) % nd) for j in range(nd)] if wrap
            else [(j, j + 1) for j in range(nd - 1)])
    return lax.ppermute(blk[blk.shape[0] - rows:], axis_name, perm=perm)


# --- local (non-sharded) axes: Pallas on TPU, jnp elsewhere -----------------

def _local_level(v, wt, fw: bool):
    """Local periodic one-level transform along the last axis, packed
    [s|d] output.  On TPU the per-shard compute routes through the fused
    batched-1-D Pallas kernels (the same kernels as the single-chip path —
    VERDICT r1 weak #2); the jnp formulation is the CPU-mesh fallback."""
    from ..transforms import _pallas_enabled, _periodic
    if _pallas_enabled() and _periodic(wt):
        from ..ops.pallas import dwt1d as D1
        b = int(np.prod(v.shape[:-1]))
        n = v.shape[-1]
        if D1._level_ok(b, n, wt, v.dtype):
            return D1._level(v.reshape(b, n), wt, fw).reshape(v.shape)
    if isinstance(wt, OrthoFilter):
        h, g = filter_fb.filter_pair(wt)
        if fw:
            a, d = filter_fb.dwt_level(v, h, g)
            return jnp.concatenate([a, d], axis=-1)
        half = v.shape[-1] // 2
        return filter_fb.idwt_level(v[..., :half], v[..., half:], h, g)
    if fw:
        s, d = lifting.lifting_level_fw(v, wt)
        return jnp.concatenate([s, d], axis=-1)
    half = v.shape[-1] // 2
    return lifting.lifting_level_inv(v[..., :half], v[..., half:], wt)


def _local_axes_fw(blk, level_fn):
    """Transform every non-sharded axis (last to first) with a local
    periodic one-level transform; axis 0 is the sharded axis."""
    for axis in range(-1, -blk.ndim, -1):
        moved = jnp.moveaxis(blk, axis, -1) if axis != -1 else blk
        out = level_fn(moved)
        blk = jnp.moveaxis(out, -1, axis) if axis != -1 else out
    return blk


def _local_axes_inv(blk, level_fn):
    for axis in range(-(blk.ndim - 1), 0):
        moved = jnp.moveaxis(blk, axis, -1) if axis != -1 else blk
        out = level_fn(moved)
        blk = jnp.moveaxis(out, -1, axis) if axis != -1 else out
    return blk


def _split_rows(ext):
    """(even-indexed rows, odd-indexed rows) of ``ext`` along axis 0 as a
    pair reshape (XLA:TPU lowers stride-2 slices ~3x slower)."""
    r = ext.shape[0]
    if r % 2:
        ext = jnp.concatenate([ext, jnp.zeros_like(ext[:1])], axis=0)
        r += 1
    p = ext.reshape(r // 2, 2, *ext.shape[1:])
    return p[:, 0], p[:, 1]



def _axis0_fw_pallas(rowt, wt, axis_name, nd):
    """Route the sharded-axis forward level through the explicit-halo
    Pallas kernel (ops/pallas/axis0.py): one ppermute pair for the whole
    level, all steps in-kernel.  Returns None when ineligible (CPU mesh,
    odd shapes, tiny chunks)."""
    from ..transforms import _pallas_enabled, _periodic
    if not _pallas_enabled() or not _periodic(wt):
        return None
    from ..ops.pallas import axis0 as A0
    r = rowt.shape[0]
    C = int(np.prod(rowt.shape[1:]))
    halo = A0._halo_of(wt)
    if r < halo or not A0.axis0_ext_ok(r, C, wt, rowt.dtype):
        return None
    flat = rowt.reshape(r, C)
    above = _ring_from_prev(flat, halo, axis_name, nd)
    below = _ring_from_next(flat, halo, axis_name, nd)
    packed = A0.axis0_level_fw_ext(above, flat, below, wt).reshape(rowt.shape)
    return packed[: r // 2], packed[r // 2:]


def _axis0_inv_pallas(a_blk, d_blk, wt, axis_name, nd):
    from ..transforms import _pallas_enabled, _periodic
    if not _pallas_enabled() or not _periodic(wt):
        return None
    from ..ops.pallas import axis0 as A0
    rh = a_blk.shape[0]
    C = int(np.prod(a_blk.shape[1:]))
    halo = A0._halo_of(wt)
    if rh < halo or not A0.axis0_ext_ok(2 * rh, C, wt, a_blk.dtype):
        return None
    af = a_blk.reshape(rh, C)
    df = d_blk.reshape(rh, C)
    a_h = (_ring_from_prev(af, halo, axis_name, nd),
           _ring_from_next(af, halo, axis_name, nd))
    d_h = (_ring_from_prev(df, halo, axis_name, nd),
           _ring_from_next(df, halo, axis_name, nd))
    col = A0.axis0_level_inv_ext(a_h, af, d_h, df, wt)
    return col.reshape((2 * rh,) + a_blk.shape[1:])


def _filter_axis0_fw(rowt, h, g, axis_name, nd):
    """One forward filter level along the sharded axis 0 with ring halos:
    returns (a, d) local chunks (the device's slice of each half-band)."""
    flen = len(h)
    wrap = flen - 2
    r = rowt.shape[0]
    if wrap > 0:
        below = _ring_from_next(rowt, min(wrap, r), axis_name, nd)
        above = _ring_from_prev(rowt, min(wrap, r), axis_name, nd)
        ext = jnp.concatenate([above, rowt, below], axis=0)
    else:
        ext = rowt
    hj = jnp.asarray(h, dtype=rowt.dtype)
    gj = jnp.asarray(g[::-1].copy(), dtype=rowt.dtype)
    # stride-2 row slices via one even/odd pair-split (fast XLA:TPU path):
    # ext[a : a + len : 2] == (E if a even else O)[a//2 : a//2 + len//2]
    E, O = _split_rows(ext)

    def s2(a, cnt):
        src = E if a % 2 == 0 else O
        return src[a // 2: a // 2 + cnt]

    a0 = hj[0] * s2(wrap, r // 2)
    d0 = gj[0] * s2(0, r // 2)
    for m in range(1, flen):
        a0 = a0 + hj[m] * s2(wrap + m, r // 2)
        d0 = d0 + gj[m] * s2(m, r // 2)
    return a0, d0


def _filter_level2_fw_body(blk, wt, h, g, axis_name, nd):
    """blk: local chunk (sharded axis first).  Returns (top, bottom) local
    chunks of the level output (rank-agnostic: 2-D images or 3-D volumes)."""
    # non-sharded axes: fully local, periodic (Pallas-routed on TPU)
    rowt = _local_axes_fw(blk, lambda v: _local_level(v, wt, True))
    routed = _axis0_fw_pallas(rowt, wt, axis_name, nd)
    if routed is not None:
        return routed
    return _filter_axis0_fw(rowt, h, g, axis_name, nd)


def _filter_axis0_inv(a_blk, d_blk, h, g, axis_name, nd):
    """Inverse filter level along sharded axis 0 -> merged local rows."""
    flen = len(h)
    fa = (flen - 1) // 2          # scaling halo from prev
    bd = (flen - 1) // 2          # detail halo from next
    hl = a_blk.shape[0]

    # column inverse along axis 0
    if fa > 0:
        a_ext = jnp.concatenate(
            [_ring_from_prev(a_blk, min(fa, hl), axis_name, nd), a_blk], axis=0)
    else:
        a_ext = a_blk
    if bd > 0:
        d_ext = jnp.concatenate(
            [d_blk, _ring_from_next(d_blk, min(bd, hl), axis_name, nd)], axis=0)
    else:
        d_ext = d_blk

    def upsample0(v):
        z = jnp.zeros_like(v)
        u = jnp.stack([v, z], axis=1)
        return u.reshape(v.shape[0] * 2, *v.shape[1:])

    zpad = (flen - 1) - 2 * fa  # 0 or 1
    ue = upsample0(a_ext)
    if zpad:
        ue = jnp.concatenate([jnp.zeros_like(ue[:zpad]), ue], axis=0)
    we = upsample0(d_ext)
    we = jnp.concatenate([jnp.zeros_like(we[:1]), we], axis=0)

    hj = jnp.asarray(h[::-1].copy(), dtype=a_blk.dtype)
    gj = jnp.asarray(g, dtype=a_blk.dtype)
    r = 2 * hl
    col = hj[0] * lax.slice_in_dim(ue, 0, r, 1, axis=0) \
        + gj[0] * lax.slice_in_dim(we, 0, r, 1, axis=0)
    for m in range(1, flen):
        col = col + hj[m] * lax.slice_in_dim(ue, m, m + r, 1, axis=0)
        col = col + gj[m] * lax.slice_in_dim(we, m, m + r, 1, axis=0)

    return col


def _filter_level2_inv_body(a_blk, d_blk, wt, h, g, axis_name, nd):
    """Inverse level: (top-half, bottom-half) local chunks -> local rows."""
    col = _axis0_inv_pallas(a_blk, d_blk, wt, axis_name, nd)
    if col is None:
        col = _filter_axis0_inv(a_blk, d_blk, h, g, axis_name, nd)

    # non-sharded axes inverse: local periodic, first-to-last
    return _local_axes_inv(col, lambda v: _local_level(v, wt, False))


# --- lifting engine: one 2-D level -----------------------------------------

def _lift_steps_axis0(s, d, scheme, fw, axis_name, nd):
    """Apply the scheme's steps along the sharded row axis with ring halos.

    Non-periodic boundaries map onto the mesh exactly as on one device
    (ops/lifting._fix_edges, per-step extension of the step's source
    half): "zeropad" simply DROPS the ring's wrap link — lax.ppermute
    leaves non-receiving devices with zeros, which IS the extension —
    and "symmetric" (half-sample, ext[-j] = src[j-1]) overwrites the
    edge devices' halo with their own reflected edge rows, a purely
    local flip selected by lax.axis_index."""
    steps = scheme.steps if fw else scheme.steps[::-1]
    sign = -1.0 if fw else 1.0
    bd = getattr(scheme, "boundary", "periodic")
    wrap = bd == "periodic"

    def stencil(src, coef, shift):
        # result[i] = sum_k coef[k] * src_ext[i + k - shift]  (global rows)
        offs = [k - shift for k in range(len(coef))]
        front = max(0, -min(offs))
        back = max(0, max(offs))
        rloc = src.shape[0]
        idx = lax.axis_index(axis_name)
        parts = []
        if front > 0:
            f = min(front, rloc)
            above = _ring_from_prev(src, f, axis_name, nd, wrap)
            if bd == "symmetric":
                above = jnp.where(idx == 0, jnp.flip(src[:f], axis=0), above)
            parts.append(above)
        parts.append(src)
        if back > 0:
            b = min(back, rloc)
            below = _ring_from_next(src, b, axis_name, nd, wrap)
            if bd == "symmetric":
                below = jnp.where(idx == nd - 1,
                                  jnp.flip(src[rloc - b:], axis=0), below)
            parts.append(below)
        ext = jnp.concatenate(parts, axis=0) if len(parts) > 1 else src
        acc = None
        for k, c in enumerate(coef):
            sl = lax.slice_in_dim(ext, front + offs[k], front + offs[k] + rloc,
                                  1, axis=0)
            term = jnp.asarray(c, src.dtype) * sl
            acc = term if acc is None else acc + term
        return acc

    for step in steps:
        if step.kind == PREDICT:
            s = s + sign * stencil(d, step.coef, step.shift)
        else:
            d = d + sign * stencil(s, step.coef, step.shift)
    return s, d


def _lifting_axis0_fw(rowt, scheme, axis_name, nd):
    """One forward lifting level along sharded axis 0: even/odd split (local
    rows even => global parity alignment holds), halo'd steps, norms."""
    s0, d0 = _split_rows(rowt)
    s0, d0 = _lift_steps_axis0(s0, d0, scheme, True, axis_name, nd)
    dt = rowt.dtype
    return s0 * jnp.asarray(scheme.norm1, dt), d0 * jnp.asarray(scheme.norm2, dt)


def _lifting_axis0_inv(a_blk, d_blk, scheme, axis_name, nd):
    dt = a_blk.dtype
    s0 = a_blk * jnp.asarray(1.0 / scheme.norm1, dt)
    d0 = d_blk * jnp.asarray(1.0 / scheme.norm2, dt)
    s0, d0 = _lift_steps_axis0(s0, d0, scheme, False, axis_name, nd)
    return jnp.stack([s0, d0], axis=1).reshape(
        s0.shape[0] * 2, *s0.shape[1:])


def _lifting_level2_fw_body(blk, scheme, axis_name, nd):
    # non-sharded axes (local, periodic; Pallas-routed on TPU)
    rowt = _local_axes_fw(blk, lambda v: _local_level(v, scheme, True))
    routed = _axis0_fw_pallas(rowt, scheme, axis_name, nd)
    if routed is not None:
        return routed
    return _lifting_axis0_fw(rowt, scheme, axis_name, nd)


def _lifting_level2_inv_body(a_blk, d_blk, scheme, axis_name, nd):
    col = _axis0_inv_pallas(a_blk, d_blk, scheme, axis_name, nd)
    if col is None:
        col = _lifting_axis0_inv(a_blk, d_blk, scheme, axis_name, nd)
    return _local_axes_inv(col, lambda v: _local_level(v, scheme, False))


# --- public drivers ---------------------------------------------------------

def _can_shard(m_active: int, nd: int, halo: int) -> bool:
    m_loc = m_active // nd
    return (m_active % (2 * nd) == 0) and m_loc >= max(2, halo)


def _halo_rows(wt) -> int:
    """Minimum LOCAL rows per shard for the one-neighbor ring exchange.

    Filters: the pre-decimation stencil needs flen-2 rows from each
    neighbor on the full-resolution rows.  Lifting: each step's stencil
    runs on the SPLIT halves (m_loc/2 rows each), so one neighbor covers
    the per-step reach only when m_loc >= 2 * reach — factored schemes
    (wt/factor.py) carry shifts up to ~5 where the stock 4 schemes stay
    at 1-2, and the per-step exchange in _lift_steps_axis0 CLAMPS halos
    to the neighbor's size (silent corruption if under-gated; found by
    the round-3 sharded fuzz on factored db4 at 4 rows/shard)."""
    if isinstance(wt, OrthoFilter):
        return max(len(wt.qmf) - 1, 1)
    h = 1
    for st in wt.steps:
        h = max(h, abs(st.shift), len(st.coef))
    return 2 * h


def _level_fw_global(active, wt):
    """Fallback: plain (periodic) one-level transform, axes last-to-first."""
    if isinstance(wt, OrthoFilter):
        h, g = filter_fb.filter_pair(wt)
        return filter_fb.dwt_nd(active, h, g, 1, active.ndim)
    return lifting.dwt_nd_lifting(active, wt, 1, active.ndim)


def _level_inv_global(active, wt):
    if isinstance(wt, OrthoFilter):
        h, g = filter_fb.filter_pair(wt)
        return filter_fb.idwt_nd(active, h, g, 1, active.ndim)
    return lifting.idwt_nd_lifting(active, wt, 1, active.ndim)


def tail_switch_for(shape, dtype, wt, nd, L) -> int:
    """Deep-tail switch level for an ``shape`` rows-sharded transform:
    WAVELETS_TPU_SHARD_TAIL_LEVEL override, else the α-β cost model
    under the WAVELETS_TPU_SHARD_SCENARIO preset.  Computed OUTSIDE the
    jitted driver and passed as a static argument — env vars read
    inside a module-level jit are baked into the cache (the CLAUDE.md
    A/B trap, previously live in this driver; code-review r5)."""
    import os
    from math import prod
    from .costmodel import SCENARIOS, tail_switch_level
    ov = os.environ.get("WAVELETS_TPU_SHARD_TAIL_LEVEL")
    if ov is not None:
        return int(ov)
    sc = SCENARIOS.get(os.environ.get("WAVELETS_TPU_SHARD_SCENARIO", "ici"),
                       SCENARIOS["ici"])
    return tail_switch_level(
        shape[0], max(1, prod(shape[1:])), np.dtype(dtype).itemsize,
        _halo_rows(wt), nd, L, sc)


@partial(jax.jit, static_argnames=("wt", "L", "mesh", "axis_name", "fw",
                                   "tail"))
def _dwt_sharded_jit(x, wt, L, mesh, axis_name, fw, tail=None):
    """N-D sharded multi-level driver: axis 0 sharded over the mesh ring,
    remaining axes local.  Works for 2-D images and 3-D volumes.
    ``tail`` — the deep-tail switch level (see tail_switch_for); None =
    compute at trace time (legacy callers)."""
    _check_boundary(wt)
    nd = mesh.shape[axis_name]
    if nd == 1:
        # a 1-device mesh has no cross-shard axis: run the single-chip
        # path (fused Pallas levels) — parallel.dwt2 == dwt exactly
        from ..transforms import _dwt_impl
        return _dwt_impl(x, wt, L, x.ndim, fw)
    shape = x.shape
    halo = _halo_rows(wt)
    # deep-tail policy: halo while the α-β cost model prefers it (it
    # does at every reachable level on both ici and dcn presets —
    # SCALING_r05.json; the measured MODWT crossover agrees), gather
    # (the global-formulation fallback) beyond.
    switch = tail if tail is not None else tail_switch_for(
        shape, x.dtype, wt, nd, L)

    if isinstance(wt, OrthoFilter):
        h, g = filter_fb.filter_pair(wt)
        fw_body = partial(_filter_level2_fw_body, wt=wt, h=h, g=g,
                          axis_name=axis_name, nd=nd)
        inv_body = partial(_filter_level2_inv_body, wt=wt, h=h, g=g,
                           axis_name=axis_name, nd=nd)
    else:
        fw_body = partial(_lifting_level2_fw_body, scheme=wt,
                          axis_name=axis_name, nd=nd)
        inv_body = partial(_lifting_level2_inv_body, scheme=wt,
                           axis_name=axis_name, nd=nd)

    spec = P(*((axis_name,) + (None,) * (x.ndim - 1)))
    fw_shard = shard_map(fw_body, mesh=mesh, in_specs=(spec,),
                         out_specs=(spec, spec))
    inv_shard = shard_map(inv_body, mesh=mesh, in_specs=(spec, spec),
                          out_specs=spec)

    y = x
    if fw:
        for l in range(L):
            sub = tuple(s >> l for s in shape)
            idx = tuple(slice(0, s) for s in sub)
            active = y[idx]
            if l + 1 < switch and _can_shard(sub[0], nd, halo):
                top, bot = fw_shard(active)
                out = jnp.concatenate([top, bot], axis=0)
            else:
                out = _level_fw_global(active, wt)
            y = out if l == 0 else y.at[idx].set(out)
        return y
    for l in range(L, 0, -1):
        sub = tuple(s >> (l - 1) for s in shape)
        idx = tuple(slice(0, s) for s in sub)
        active = y[idx]
        if l < switch and _can_shard(sub[0], nd, halo):
            out = inv_shard(active[: sub[0] // 2], active[sub[0] // 2:])
        else:
            out = _level_inv_global(active, wt)
        y = out if sub == shape else y.at[idx].set(out)
    return y


def _require_periodic(wt):
    if getattr(wt, "boundary", "periodic") != "periodic":
        raise NotImplementedError(
            "this sharded driver implements the periodic boundary only; "
            "sharded.dwt2/idwt2/dwt3/idwt3 support zeropad/symmetric for "
            "the lifting engine")


def _check_boundary(wt):
    """The sharded DWT drivers support all lifting boundaries: zeropad is
    the ring with its wrap link dropped (ppermute zero-fill), symmetric a
    local flip on the edge devices.  The filter engine stays periodic
    (as the single-device API: the constructor rejects other boundaries
    for it)."""
    bd = getattr(wt, "boundary", "periodic")
    if bd != "periodic" and isinstance(wt, OrthoFilter):  # pragma: no cover
        raise NotImplementedError("filter-engine boundaries are periodic")


def _sharded(x, wt, L, mesh, axis_name, fw, rank):
    if mesh is None:
        mesh = make_mesh(axis=axis_name)
    # integer inputs must promote BEFORE the kernels (the level bodies
    # cast the filter taps to the array dtype — int input silently
    # truncated the taps to zero; code-review r5, confirmed on the
    # virtual mesh) and L must be validated like the single-chip API
    # (an over-large L died in a deep strippable assert)
    from ..transforms import _as_float, _check_levels
    x = _as_float(x)
    if L is None:
        L = maxtransformlevels(x)
    if x.ndim != rank:
        raise ValueError(f"expected rank-{rank} input, got shape {x.shape}")
    _check_levels(x, int(L), rank)
    tail = tail_switch_for(x.shape, x.dtype, wt,
                           mesh.shape[axis_name], int(L))
    return _dwt_sharded_jit(x, wt, int(L), mesh, axis_name, fw,
                            tail=tail)


def dwt1(x, wt, L: int | None = None, mesh: Mesh | None = None,
         axis_name: str = "x"):
    """Sharded 1-D forward DWT of a giant signal, packed layout.

    The signal is sharded as CONTIGUOUS CHUNKS over the mesh ring
    (P(axis_name,)); each level's stencil needs only an O(filterlen)
    sample halo from the ring neighbours, so the N-D driver's sharded-
    axis-0 bodies apply verbatim with rank 1 (no local axes).  Lifting
    boundaries (periodic/zeropad/symmetric) map onto the ring exactly as
    in 2-D/3-D.  Deep levels whose active band is smaller than the mesh
    fall back to the replicated global formulation — they are O(n/2^l)
    tiny."""
    return _sharded(x, wt, L, mesh, axis_name, True, 1)


def idwt1(y, wt, L: int | None = None, mesh: Mesh | None = None,
          axis_name: str = "x"):
    """Inverse of :func:`dwt1`."""
    return _sharded(y, wt, L, mesh, axis_name, False, 1)


def dwt2(x, wt, L: int | None = None, mesh: Mesh | None = None,
         axis_name: str = "x"):
    """Sharded 2-D forward DWT (filter or lifting), packed layout.

    ``x`` should be row-sharded over ``mesh``'s ``axis_name`` (see
    :func:`shard_rows`); the result carries the same sharding.
    """
    return _sharded(x, wt, L, mesh, axis_name, True, 2)


def idwt2(y, wt, L: int | None = None, mesh: Mesh | None = None,
          axis_name: str = "x"):
    """Inverse of :func:`dwt2`."""
    return _sharded(y, wt, L, mesh, axis_name, False, 2)


def dwt3(x, wt, L: int | None = None, mesh: Mesh | None = None,
         axis_name: str = "x"):
    """Sharded 3-D forward DWT: leading (plane) axis sharded over the mesh
    ring with periodic halo exchange; rows/cols local per shard.  The
    BASELINE "3-D volume sharded across hosts" configuration."""
    return _sharded(x, wt, L, mesh, axis_name, True, 3)


def idwt3(y, wt, L: int | None = None, mesh: Mesh | None = None,
          axis_name: str = "x"):
    """Inverse of :func:`dwt3`."""
    return _sharded(y, wt, L, mesh, axis_name, False, 3)
