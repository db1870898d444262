"""Fully-fused 2-D lifting level: both axes in ONE kernel pass.

Each grid instance reads its (TM, TN) center tile plus a ring of 8 halo
blocks (3x3 neighborhood, index maps wrapped modulo the block counts on
both axes — the torus of tiles IS the periodic boundary).  Inside VMEM it

  1. runs the row (lane-direction) lifting chain on the interleaved
     layout — lane-halo columns give every interior lane its stencil
     context — and slices the interior lanes;
  2. runs the column (sublane-direction) chain on the even/odd row halves
     (the supported second-minor reshape), slices the interior rows;
  3. lane-unshuffles s and d with the log2(TN)-stage roll+mask butterfly
     and emits the four quadrant tiles.

One level therefore costs ~1.3 reads (halo overlap) + 1 write of the
active array — vs the 4 HBM passes of the two-kernel pipeline
(lifting2d.py).  Round 1 shipped a fused variant that was measured
slower than the pipeline; the differences here: interior-lane slicing
before the column chain, butterflies after interior-row slicing (no
halo rows butterflied), larger lane tiles (less halo overlap), and two
output modes:

* quadrant mode (default): four quadrant arrays; the packed reference
  layout is assembled by one XLA concatenation cascade at the end.
* packed mode (``level_fw_packed``): a third, innermost grid dimension
  q in {0,1,2} writes the three detail quadrants DIRECTLY into their
  final positions of a full-size packed output buffer (block-index
  arithmetic on q), while ll streams to a quarter-size array that feeds
  the next level.  The packed buffer is alias-chained through the
  levels, so the final layout assembly costs zero extra HBM passes.
  The compute runs only at q == 0; the detail tiles are staged in VMEM
  scratch across the q steps.

Reference analogue: the GPU extension's per-level batched launches,
ext/WaveletsGPUExt/lifting_transforms_gpu.jl:171-293.
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

__all__ = ["fused_level_fw_quads", "level_fw_packed",
           "level_fw_packed_first", "fused_ok", "packed_ok"]


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


def _steps_interleaved(v, scheme: GLS):
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


def _compute_quads(refs, scheme: GLS, hm: int, hn: int):
    """Shared kernel body: 9 halo refs -> (ll, lh, hl, hh) interior
    tiles of shape (tm/2, tn/2)."""
    nw, nn, ne, ww, cc, ee, sw, ss, se = refs
    top = jnp.concatenate([nw[:], nn[:], ne[:]], axis=1)
    mid = jnp.concatenate([ww[:], cc[:], ee[:]], axis=1)
    bot = jnp.concatenate([sw[:], ss[:], se[:]], axis=1)
    ext = jnp.concatenate([top, mid, bot], axis=0)  # (tm+2hm, tn+2hn)
    dt = ext.dtype

    # rows: interleaved lane chain + lane-wise normalization
    v, even = _steps_interleaved(ext, scheme)
    v = v * jnp.where(even, jnp.asarray(scheme.norm1, dt),
                      jnp.asarray(scheme.norm2, dt))

    # interior lanes only (the column chain never mixes lanes)
    v = v[:, hn: v.shape[1] - hn]

    # columns: even/odd row halves, sublane chain
    rows = v.shape[0]
    r = v.reshape(rows // 2, 2, v.shape[1])
    s, d = r[:, 0, :], r[:, 1, :]
    s, d = _steps_halves0(s, d, scheme)

    # interior rows, per-half normalization, lane unshuffle -> quadrants
    hh_rows = hm // 2
    tm2 = s.shape[0] - hm
    s = s[hh_rows: hh_rows + tm2] * jnp.asarray(scheme.norm1, dt)
    d = d[hh_rows: hh_rows + tm2] * jnp.asarray(scheme.norm2, dt)
    s = deint_lanes(s)
    d = deint_lanes(d)
    half = s.shape[1] // 2
    return (s[:, :half], s[:, half:], d[:, :half], d[:, half:])


def _plan(m: int, n: int, scheme: GLS, dtype):
    if np.dtype(dtype) != np.dtype(np.float32):
        return None
    hm = roundup(2 * _reach_half(scheme), 8)
    hn = roundup(_lane_reach(scheme), 128)   # lane blocks: multiples of 128
    tn = next((c for c in (2048, 1024, 512) if n % c == 0), None)
    if tn is None or hn > tn or n % hn or n // hn < 3:
        return None
    tm = 128
    while tm >= 2 * hm:
        if m % tm == 0 and tm % hm == 0:
            break
        tm //= 2
    else:
        return None
    if m // hm < 3:
        return None
    return tm, tn, hm, hn


def fused_ok(m: int, n: int, scheme: GLS, dtype) -> bool:
    return _plan(m, n, scheme, dtype) is not None


def _halo_in_specs(m, n, tm, tn, hm, hn, extra_dims=0):
    """The 3x3 ring of input block specs with torus-wrapped index maps.

    ``extra_dims`` trailing grid dimensions (e.g. the packed-mode q axis)
    are ignored by the maps, so Mosaic fetches each block once and reuses
    it across those steps."""
    nbm = m // hm          # sublane halo-granule count
    nbn = n // hn          # lane halo-granule count
    sm = tm // hm
    sn = tn // hn
    specs = []
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            bm = hm if dr != 0 else tm
            bn = hn if dc != 0 else tn

            def im(i, j, *rest, dr=dr, dc=dc):
                # mixed granularity: halo dims use halo-granule indices,
                # center dims use tile indices
                ri = (i * sm - 1) % nbm if dr < 0 else \
                    ((i + 1) * sm) % nbm if dr > 0 else i
                ci = (j * sn - 1) % nbn if dc < 0 else \
                    ((j + 1) * sn) % nbn if dc > 0 else j
                return (ri, ci)
            specs.append(pl.BlockSpec((bm, bn), im,
                                      memory_space=pltpu.VMEM))
    return specs


# --- quadrant mode -----------------------------------------------------------

def _quad_kernel(*refs, scheme, hm, hn):
    ins, outs = refs[:9], refs[9:]
    ll, lh, hl, hh = _compute_quads(ins, scheme, hm, hn)
    outs[0][:] = ll
    outs[1][:] = lh
    outs[2][:] = hl
    outs[3][:] = hh


def fused_level_fw_quads(x, scheme: GLS):
    """One forward 2-D lifting level -> (ll, lh, hl, hh), single pass."""
    m, n = x.shape
    tm, tn, hm, hn = _plan(m, n, scheme, x.dtype)
    qshape = jax.ShapeDtypeStruct((m // 2, n // 2), x.dtype)
    qspec = pl.BlockSpec((tm // 2, tn // 2), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_quad_kernel, scheme=scheme, hm=hm, hn=hn),
        grid=(m // tm, n // tn),
        in_specs=_halo_in_specs(m, n, tm, tn, hm, hn),
        out_specs=(qspec, qspec, qspec, qspec),
        out_shape=(qshape, qshape, qshape, qshape),
    )(*([x] * 9))


# --- packed mode -------------------------------------------------------------

def packed_ok(m: int, n: int, scheme: GLS, dtype) -> bool:
    plan = _plan(m, n, scheme, dtype)
    if plan is None:
        return False
    tm, tn, hm, hn = plan
    # detail blocks are (tm/2, tn/2); quadrant offsets must be block-
    # granular in the full packed buffer
    return (m // 2) % (tm // 2) == 0 and (n // 2) % (tn // 2) == 0


def _packed_kernel(*refs, scheme, hm, hn, has_alias):
    if has_alias:
        (ins, _yin, ll_ref, y_ref, stash) = (refs[:9], refs[9], refs[10],
                                             refs[11], refs[12])
        # _yin is the alias carrier only; never touched (ANY memory space)
    else:
        (ins, ll_ref, y_ref, stash) = (refs[:9], refs[9], refs[10], refs[11])
    q = pl.program_id(2)

    @pl.when(q == 0)
    def _():
        ll, lh, hl, hh = _compute_quads(ins, scheme, hm, hn)
        ll_ref[:] = ll
        stash[0] = lh
        stash[1] = hl
        stash[2] = hh

    y_ref[:] = stash[q]


def _packed_call(active, y, yshape, scheme: GLS):
    ml, nl = active.shape
    M, N = yshape
    tm, tn, hm, hn = _plan(ml, nl, scheme, active.dtype)
    bm, bn = tm // 2, tn // 2
    nbr = ml // tm        # detail row-blocks per quadrant = (ml/2)/bm
    nbc = nl // tn

    def y_im(i, j, q):
        # q=0 -> lh at (i, j + nbc); q=1 -> hl at (i + nbr, j);
        # q=2 -> hh at (i + nbr, j + nbc).  Integer-only arithmetic.
        return (i + ((q + 1) // 2) * nbr, j + (1 - (q % 2)) * nbc)

    in_specs = _halo_in_specs(ml, nl, tm, tn, hm, hn, extra_dims=1)
    inputs = [active] * 9
    aliases = {}
    if y is not None:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pltpu.ANY)]
        inputs = inputs + [y]
        aliases = {9: 1}
    return pl.pallas_call(
        partial(_packed_kernel, scheme=scheme, hm=hm, hn=hn,
                has_alias=y is not None),
        grid=(ml // tm, nl // tn, 3),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bm, bn), lambda i, j, q: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), y_im, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ml // 2, nl // 2), active.dtype),
            jax.ShapeDtypeStruct((M, N), active.dtype),
        ),
        input_output_aliases=aliases,
        scratch_shapes=[pltpu.VMEM((3, bm, bn), active.dtype)],
    )(*inputs)


def level_fw_packed(active, y, scheme: GLS):
    """One forward level in packed mode.

    ``active`` — the (m_l, n_l) scaling array of this level.  ``y`` — the
    full-size packed output buffer, donated and alias-chained level to
    level; this call writes the lh/hl/hh detail quadrants of this level
    into their final packed positions and leaves every other block of
    ``y`` untouched.  Returns (ll, y_out).
    """
    return _packed_call(active, y, y.shape, scheme)


def level_fw_packed_first(active, scheme: GLS):
    """Level-1 packed call: allocates the full-size packed buffer as a
    fresh (uninitialized) pallas output; only this level's detail blocks
    are defined — deeper levels and the final ll corner write fill in the
    rest.  Returns (ll, y)."""
    return _packed_call(active, None, active.shape, scheme)
