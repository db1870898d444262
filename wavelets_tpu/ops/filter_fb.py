"""Filter-bank DWT engine (periodic boundary, orthogonal filters).

TPU-first design: instead of the reference's sequential FIR-state loop
(src/Transforms/transforms_filter.jl:387-541), each output sample is a small
periodic correlation — a gather-style formulation that vectorizes over
arbitrary leading batch dimensions and lowers to fused XLA elementwise code
(and to Pallas kernels on the hot path, see ops/pallas/).

Closed-form semantics (0-based, derived from the reference's filtdown!/
filtup! with its QMF-pair conventions, src/WT/wt_main.jl:172-183):

  forward, one level, signal x of even length n, scaling filter h (l2-
  normalized QMF), detail filter g[m] = (-1)^m h[m]:

      a[k] = sum_m h[m] * x[(2k + m)     mod n]      k = 0..n/2-1
      d[k] = sum_m g[m] * x[(2k + 1 - m) mod n]

  inverse (the exact adjoint — the transform is orthogonal):

      x[t] = sum_{m == t mod 2} h[m] * a[((t - m) mod n) / 2]
           + sum_{m == t+1 mod 2} g[m] * d[((t + m - 1) mod n) / 2]

The multi-level transform applies the level recursively to the scaling
band; the packed output layout is [s_L | d_L | ... | d_1] (see
utils/indexing.py).  Level loops run host-side over static shapes, exactly
like the reference GPU extension's per-level launches
(ext/WaveletsGPUExt/filter_transforms_gpu.jl:193-211).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..wt.carriers import OrthoFilter
from ..utils.signals import mirror

__all__ = [
    "filter_pair", "dwt_level", "idwt_level",
    "dwt1d", "idwt1d", "dwt_nd", "idwt_nd",
]


def filter_pair(wt: OrthoFilter, dtype=None):
    """(h, g): scaling filter and its quadrature mirror g[m] = (-1)^m h[m]."""
    h = wt.qmf_array()
    g = mirror(h)
    if dtype is not None:
        h = h.astype(dtype)
        g = g.astype(dtype)
    return h, g


def _extend_periodic(x, front: int, back: int):
    """Concatenate periodic wrap samples so that index arithmetic in
    [-front, n + back) becomes in-bounds.  Handles filters longer than the
    signal by tiling."""
    n = x.shape[-1]
    parts = []
    if front > 0:
        reps = -(-front // n)  # ceil
        ext = jnp.concatenate([x] * reps, axis=-1) if reps > 1 else x
        parts.append(ext[..., ext.shape[-1] - front:])
    parts.append(x)
    if back > 0:
        reps = -(-back // n)
        ext = jnp.concatenate([x] * reps, axis=-1) if reps > 1 else x
        parts.append(ext[..., :back])
    if len(parts) == 1:
        return x
    return jnp.concatenate(parts, axis=-1)


def dwt_level(x, h: np.ndarray, g: np.ndarray):
    """One forward DWT level along the last axis.

    x: (..., n) with n even.  Returns (a, d), each (..., n//2).
    Accumulation runs in ascending tap order, matching the reference FIR
    loop's effective association (transforms_filter.jl:362-377).
    """
    n = x.shape[-1]
    assert n % 2 == 0, "level transform requires even length"
    flen = len(h)
    half = n // 2

    # a[k] = sum_m h[m] xe[2k + m]            (xe = x extended right)
    # d[k] = sum_m g[flen-1-m] xd[2k + m]     (xd = x extended left by flen-2)
    # Stride-2 access runs through a pair reshape (even/odd planes) with
    # stride-1 slices — XLA:TPU lowers stride-2 slices ~3x slower.
    wrap = max(flen - 2, 0)
    pad = (n + wrap) % 2
    xe = _extend_periodic(x, 0, wrap + pad)
    xd = _extend_periodic(x, wrap, pad)
    grev = g[::-1]

    def planes(v):
        r = v.reshape(*v.shape[:-1], v.shape[-1] // 2, 2)
        return r[..., 0], r[..., 1]

    e0, e1 = planes(xe)   # xe[2q], xe[2q+1]
    f0, f1 = planes(xd)

    hj = jnp.asarray(h, dtype=x.dtype)
    gj = jnp.asarray(grev.copy(), dtype=x.dtype)

    a = None
    d = None
    for m in range(flen):
        src_a = e0 if m % 2 == 0 else e1
        src_d = f0 if m % 2 == 0 else f1
        off = m // 2
        ta = hj[m] * jax.lax.slice_in_dim(src_a, off, off + half, 1, axis=-1)
        td = gj[m] * jax.lax.slice_in_dim(src_d, off, off + half, 1, axis=-1)
        a = ta if a is None else a + ta
        d = td if d is None else d + td
    return a, d


def _upsample_last(a, phase: int):
    """Zero-stuff along the last axis: u[2k + phase] = a[k]."""
    z = jnp.zeros_like(a)
    pair = (a, z) if phase == 0 else (z, a)
    u = jnp.stack(pair, axis=-1)
    return u.reshape(*a.shape[:-1], a.shape[-1] * 2)


def idwt_level(a, d, h: np.ndarray, g: np.ndarray):
    """One inverse DWT level along the last axis: (a, d) -> x of length 2*half."""
    half = a.shape[-1]
    n = 2 * half
    flen = len(h)

    # scaling contribution: conv of the zero-stuffed a with h
    #   out_s[t] = sum_j h[flen-1-j] * u[(t + j - (flen-1)) mod n]
    u = _upsample_last(a, 0)
    ue = _extend_periodic(u, flen - 1, 0)
    hrev = h[::-1]

    # detail contribution: correlation of zero-stuffed d at offset -1 with g
    #   out_d[t] = sum_m g[m] * w[(t + m - 1) mod n]
    w = _upsample_last(d, 0)
    we = _extend_periodic(w, 1, max(flen - 2, 0))

    hj = jnp.asarray(hrev.copy(), dtype=a.dtype)
    gj = jnp.asarray(g, dtype=a.dtype)

    x = hj[0] * jax.lax.slice_in_dim(ue, 0, n, 1, axis=-1) \
        + gj[0] * jax.lax.slice_in_dim(we, 0, n, 1, axis=-1)
    for m in range(1, flen):
        x = x + hj[m] * jax.lax.slice_in_dim(ue, m, m + n, 1, axis=-1)
        x = x + gj[m] * jax.lax.slice_in_dim(we, m, m + n, 1, axis=-1)
    return x


# --- multi-level, multi-dimensional drivers ---------------------------------

def dwt1d(x, h, g, L: int):
    """L-level forward DWT along the last axis -> packed [s_L|d_L|...|d_1]."""
    if L == 0:
        return x
    s = x
    details = []
    for _ in range(L):
        s, d = dwt_level(s, h, g)
        details.append(d)
    return jnp.concatenate([s] + details[::-1], axis=-1)


def idwt1d(y, h, g, L: int):
    """Inverse of dwt1d on the packed layout."""
    if L == 0:
        return y
    n = y.shape[-1]
    s = y[..., : n >> L]
    for l in range(L, 0, -1):
        d = y[..., n >> l: n >> (l - 1)]
        s = idwt_level(s, d, h, g)
    return s


def _level_along_axis(active, h, g, axis: int, fw: bool):
    """One transform level along ``axis`` (negative, relative to active)."""
    moved = jnp.moveaxis(active, axis, -1) if axis != -1 else active
    if fw:
        a, d = dwt_level(moved, h, g)
        out = jnp.concatenate([a, d], axis=-1)
    else:
        half = moved.shape[-1] // 2
        out = idwt_level(moved[..., :half], moved[..., half:], h, g)
    return jnp.moveaxis(out, -1, axis) if axis != -1 else out


def dwt_nd(x, h, g, L: int, ndt: int):
    """L-level separable forward DWT over the last ``ndt`` axes.

    Per level the active (top-left) sub-block is transformed along axes
    last-to-first, then written back — the reference's axis ordering
    (rows→cols in 2-D, planes→rows→cols in 3-D;
    src/Transforms/transforms_filter.jl:146-186, 240-266).  Leading axes
    are batch.  Non-square sizes are supported (each transform dim must be
    divisible by 2^L).
    """
    if L == 0:
        return x
    y = x
    tshape = x.shape[-ndt:]
    for l in range(L):
        sub = tuple(s >> l for s in tshape)
        idx = (Ellipsis,) + tuple(slice(0, s) for s in sub)
        active = y[idx]
        for axis in range(-1, -ndt - 1, -1):
            active = _level_along_axis(active, h, g, axis, fw=True)
        y = active if l == 0 and all(a == b for a, b in zip(sub, tshape)) \
            else y.at[idx].set(active)
    return y


def idwt_nd(y, h, g, L: int, ndt: int):
    """Inverse of dwt_nd (axes first-to-last per level, levels deep-to-shallow)."""
    if L == 0:
        return y
    x = y
    tshape = y.shape[-ndt:]
    for l in range(L, 0, -1):
        sub = tuple(s >> (l - 1) for s in tshape)
        idx = (Ellipsis,) + tuple(slice(0, s) for s in sub)
        active = x[idx]
        for axis in range(-ndt, 0):
            active = _level_along_axis(active, h, g, axis, fw=False)
        x = active if all(a == b for a, b in zip(sub, tshape)) \
            else x.at[idx].set(active)
    return x
