"""Fully-fused 2-D lifting level: both axes in ONE kernel pass.

Each grid instance reads its (TM, TN) center tile plus a ring of 8 halo
blocks (3x3 neighborhood, index maps wrapped modulo the block counts on
both axes — the torus of tiles IS the periodic boundary).  Inside VMEM it

  1. runs the row (lane-direction) lifting chain on the interleaved layout
     — lane-halo columns give every interior lane its full stencil context;
  2. runs the column (sublane-direction) chain on the even/odd row halves;
  3. slices the exact interior, butterflies lanes block-locally, and writes
     the four quadrant outputs directly.

One level therefore costs ~1.06 reads + 1 write of the active array — the
separable-transform speed-of-light — instead of the 4 passes of the
two-kernel pipeline (lifting2d.py), which remains the fallback for shapes
this kernel's tile plan rejects.
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
from .common import roll, deint_lanes, roundup

__all__ = ["fused_level_fw_quads", "fused_ok"]


def _reach_half(scheme: GLS) -> int:
    r = 0
    for st in scheme.steps:
        offs = [k - st.shift for k in range(len(st.coef))]
        r += max(abs(o) for o in offs) if offs else 0
    return max(r, 1)


def _lane_reach(scheme: GLS) -> int:
    """Total lane contamination of the interleaved-lane step chain."""
    r = 0
    for st in scheme.steps:
        pred = st.kind == PREDICT
        offs = [abs(2 * (k - st.shift) + (1 if pred else -1))
                for k in range(len(st.coef))]
        r += max(offs) if offs else 0
    return max(r, 1)


def _steps_interleaved(v, scheme: GLS, axis_last: bool):
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    even = (lane % 2) == 0
    for st in scheme.steps:
        pred = st.kind == PREDICT
        acc = None
        for k, c in enumerate(st.coef):
            off = 2 * (k - st.shift) + (1 if pred else -1)
            t = roll(v, -off, v.ndim - 1)
            t = jnp.asarray(-c, v.dtype) * t
            acc = t if acc is None else acc + t
        mask = even if pred else jnp.logical_not(even)
        v = jnp.where(mask, v + acc, v)
    return v, even


def _steps_halves0(s, d, scheme: GLS):
    for st in scheme.steps:
        src = d if st.kind == PREDICT else s
        acc = None
        for k, c in enumerate(st.coef):
            t = roll(src, st.shift - k, 0)
            t = jnp.asarray(-c, src.dtype) * t
            acc = t if acc is None else acc + t
        if st.kind == PREDICT:
            s = s + acc
        else:
            d = d + acc
    return s, d


def _kernel(nw, nn, ne, ww, cc, ee, sw, ss, se, ll_ref, lh_ref, hl_ref,
            hh_ref, *, scheme, hm, hn):
    top = jnp.concatenate([nw[:], nn[:], ne[:]], axis=1)
    mid = jnp.concatenate([ww[:], cc[:], ee[:]], axis=1)
    bot = jnp.concatenate([sw[:], ss[:], se[:]], axis=1)
    ext = jnp.concatenate([top, mid, bot], axis=0)  # (tm+2hm, tn+2hn)
    dt = ext.dtype

    # rows: interleaved lane chain + lane-wise normalization
    v, even = _steps_interleaved(ext, scheme, axis_last=True)
    v = v * jnp.where(even, jnp.asarray(scheme.norm1, dt),
                      jnp.asarray(scheme.norm2, dt))

    # columns: even/odd row halves, sublane chain, per-half normalization
    rows = v.shape[0]
    r = v.reshape(rows // 2, 2, v.shape[1])
    s, d = r[:, 0, :], r[:, 1, :]
    s, d = _steps_halves0(s, d, scheme)
    s = s * jnp.asarray(scheme.norm1, dt)
    d = d * jnp.asarray(scheme.norm2, dt)

    # exact interior + block-local lane unshuffle -> quadrants
    hh_rows = hm // 2
    tm2 = s.shape[0] - hm
    s = deint_lanes(s[hh_rows: hh_rows + tm2, hn: s.shape[1] - hn])
    d = deint_lanes(d[hh_rows: hh_rows + tm2, hn: d.shape[1] - hn])
    half = s.shape[1] // 2
    ll_ref[:] = s[:, :half]
    lh_ref[:] = s[:, half:]
    hl_ref[:] = d[:, :half]
    hh_ref[:] = d[:, half:]


def _plan(m: int, n: int, scheme: GLS, dtype):
    hm = roundup(2 * _reach_half(scheme), 8)
    hn = roundup(_lane_reach(scheme), 128)   # lane blocks: multiples of 128
    tn = 512 if n % 512 == 0 else None
    if tn is None or hn > tn or n % hn or n // hn < 3:
        return None
    tm = 256
    while tm >= 2 * hm:
        if m % tm == 0 and tm % hm == 0:
            break
        tm //= 2
    else:
        return None
    if m // hm < 3:
        return None
    if np.dtype(dtype) not in (np.dtype(np.float32), np.dtype(jnp.bfloat16)):
        return None
    return tm, tn, hm, hn


def fused_ok(m: int, n: int, scheme: GLS, dtype) -> bool:
    return _plan(m, n, scheme, dtype) is not None


def fused_level_fw_quads(x, scheme: GLS):
    """One forward 2-D lifting level -> (ll, lh, hl, hh), single pass."""
    m, n = x.shape
    tm, tn, hm, hn = _plan(m, n, scheme, x.dtype)
    nbm = m // hm          # sublane halo-granule count
    nbn = n // hn          # lane halo-granule count
    sm = tm // hm
    sn = tn // hn

    def spec(bm, bn, im):
        return pl.BlockSpec((bm, bn), im, memory_space=pltpu.VMEM)

    def row_idx(i, d):
        return ((i * sm + (sm if d > 0 else -1)) % nbm) if d != 0 else None

    in_specs = []
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            bm = hm if dr != 0 else tm
            bn = hn if dc != 0 else tn
            def im(i, j, dr=dr, dc=dc):
                ri = (i * sm - 1) % nbm if dr < 0 else \
                    ((i + 1) * sm) % nbm if dr > 0 else i
                ci = (j * sn - 1) % nbn if dc < 0 else \
                    ((j + 1) * sn) % nbn if dc > 0 else j
                # mixed granularity: halo dims use halo-granule indices,
                # center dims use tile indices
                return (ri, ci)
            in_specs.append(spec(bm, bn, im))

    qshape = jax.ShapeDtypeStruct((m // 2, n // 2), x.dtype)
    qspec = pl.BlockSpec((tm // 2, tn // 2), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel, scheme=scheme, hm=hm, hn=hn),
        grid=(m // tm, n // tn),
        in_specs=in_specs,
        out_specs=(qspec, qspec, qspec, qspec),
        out_shape=(qshape, qshape, qshape, qshape),
    )(*([x] * 9))
