"""Fully-fused 2-D DWT level (either engine): both axes in ONE kernel pass.

Each grid instance reads its (TM, TN) center tile plus a ring of 8 halo
blocks (3x3 neighborhood, index maps wrapped modulo the block counts on
both axes — the torus of tiles IS the periodic boundary).  Inside VMEM it

  1. runs the row (lane-direction) chain on the interleaved layout —
     the lifting step chain or the filter correlation pair — with
     lane-halo columns giving every interior lane its stencil context;
  2. slices the interior lanes, then runs the column (sublane-direction)
     chain on the even/odd row halves (the supported second-minor
     reshape), slices the interior rows;
  3. lane-unshuffles s and d with the log2(TN)-stage roll+mask butterfly
     and emits the four quadrant tiles.

One level therefore costs ~1.3 reads (halo overlap) + 1 write of the
active array — vs the 4 HBM passes of the two-kernel pipelines
(lifting2d.py / filter2d.py), which remain the fallback for shapes the
tile plan rejects.

Output modes:

* quadrant mode (default): four quadrant arrays; the packed reference
  layout is assembled by one XLA concatenation cascade at the end.
* packed mode (``level_fw_packed``): a third, innermost grid dimension
  q in {0,1,2} writes the three detail quadrants DIRECTLY into their
  final positions of a full-size packed output buffer (block-index
  arithmetic on q), while ll streams to a quarter-size array that feeds
  the next level.  The packed buffer is alias-chained through the
  levels, so the final layout assembly costs zero extra HBM passes.
  The compute runs only at q == 0; the detail tiles are staged in VMEM
  scratch across the q steps (all grid dims marked "arbitrary" so the
  revisited input windows and the ll output window are fetched/flushed
  once per (i, j)).

Reference analogue: the GPU extension's per-level batched launches
(ext/WaveletsGPUExt/lifting_transforms_gpu.jl:171-293,
filter_transforms_gpu.jl:171-335).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...wt.carriers import GLS, OrthoFilter
from ...wt.schemes import PREDICT
from ..filter_fb import filter_pair
from .common import roll, deint_lanes, int_lanes, roundup

__all__ = ["fused_level_fw_quads", "fused_level_inv_quads",
           "level_fw_packed", "level_fw_packed_first",
           "level_inv_packed", "fused_ok", "fused_inv_ok", "packed_ok"]


def _reach_half(wt) -> int:
    if isinstance(wt, OrthoFilter):
        return len(wt.qmf)
    r = 0
    for st in wt.steps:
        offs = [k - st.shift for k in range(len(st.coef))]
        r += max(abs(o) for o in offs) if offs else 0
    return max(r, 1)


def _lane_reach(wt) -> int:
    """Total lane contamination of the interleaved-lane chain."""
    from .common import lane_reach
    return lane_reach(wt, 1)


def _row_chain(v, wt):
    """Forward interleaved-lane chain along the last axis, normalized."""
    dt = v.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    even = (lane % 2) == 0
    if isinstance(wt, GLS):
        for st in wt.steps:
            pred = st.kind == PREDICT
            acc = None
            for k, c in enumerate(st.coef):
                off = 2 * (k - st.shift) + (1 if pred else -1)
                t = roll(v, -off, v.ndim - 1)
                t = jnp.asarray(-c, dt) * t
                acc = t if acc is None else acc + t
            mask = even if pred else jnp.logical_not(even)
            v = jnp.where(mask, v + acc, v)
        return v * jnp.where(even, jnp.asarray(wt.norm1, dt),
                             jnp.asarray(wt.norm2, dt))
    h, g = filter_pair(wt)
    za = None
    zd = None
    for m_ in range(len(h)):
        ta = jnp.asarray(h[m_], dt) * roll(v, -m_, v.ndim - 1)
        td = jnp.asarray(g[m_], dt) * roll(v, m_, v.ndim - 1)
        za = ta if za is None else za + ta
        zd = td if zd is None else zd + td
    return jnp.where(even, za, zd)


def _col_pair(e0, e1, wt):
    """Forward column chain on (even rows, odd rows) -> (a, d) halves
    (sublane rolls only; same math as ops/pallas/axis0.py)."""
    dt = e0.dtype
    if isinstance(wt, GLS):
        s, d = e0, e1
        for st in wt.steps:
            src = d if st.kind == PREDICT else s
            acc = None
            for k, c in enumerate(st.coef):
                t = roll(src, st.shift - k, 0)
                t = jnp.asarray(-c, dt) * t
                acc = t if acc is None else acc + t
            if st.kind == PREDICT:
                s = s + acc
            else:
                d = d + acc
        return (s * jnp.asarray(wt.norm1, dt),
                d * jnp.asarray(wt.norm2, dt))
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
    return a, d


def _compute_quads(refs, wt, hm: int, hn: int):
    """Shared kernel body: 9 halo refs -> (ll, lh, hl, hh) interior
    tiles of shape (tm/2, tn/2)."""
    nw, nn, ne, ww, cc, ee, sw, ss, se = refs
    top = jnp.concatenate([nw[:], nn[:], ne[:]], axis=1)
    mid = jnp.concatenate([ww[:], cc[:], ee[:]], axis=1)
    bot = jnp.concatenate([sw[:], ss[:], se[:]], axis=1)
    ext = jnp.concatenate([top, mid, bot], axis=0)  # (tm+2hm, tn+2hn)

    # rows: interleaved lane chain, then interior lanes only
    v = _row_chain(ext, wt)
    v = v[:, hn: v.shape[1] - hn]

    # columns: even/odd row halves, sublane chain
    rows = v.shape[0]
    r = v.reshape(rows // 2, 2, v.shape[1])
    s, d = _col_pair(r[:, 0, :], r[:, 1, :], wt)

    # interior rows, lane unshuffle -> quadrants
    hh_rows = hm // 2
    tm2 = s.shape[0] - hm
    s = deint_lanes(s[hh_rows: hh_rows + tm2])
    d = deint_lanes(d[hh_rows: hh_rows + tm2])
    half = s.shape[1] // 2
    return (s[:, :half], s[:, half:], d[:, :half], d[:, half:])


def _plan(m: int, n: int, wt, dtype):
    from .common import dtype_ok, halo_granule
    if not dtype_ok(dtype):
        return None
    hm = roundup(2 * _reach_half(wt), halo_granule(dtype))
    hn = roundup(_lane_reach(wt), 128)   # lane blocks: multiples of 128
    tn = next((c for c in (2048, 1024, 512) if n % c == 0), None)
    if tn is None or hn > tn or n % hn or n // hn < 3:
        return None
    # Mosaic stack-allocates the chain temporaries but reuses retired
    # ones; measured live set is ~8 tiles (tm=128/tn=2048 cdf97 compiles
    # and runs at 5.8 ms vs tm=64's 6.3 — budget accordingly)
    taps = len(wt.qmf) if isinstance(wt, OrthoFilter) else 8
    budget_rows = (14 << 20) // np.dtype(dtype).itemsize // \
        max(taps, 8) // (tn + 2 * hn)
    tm = 128
    while tm >= 2 * hm:
        if m % tm == 0 and tm % hm == 0 and tm + 2 * hm <= budget_rows:
            break
        tm //= 2
    else:
        return None
    if m // hm < 3:
        return None
    return tm, tn, hm, hn


def fused_ok(m: int, n: int, wt, dtype) -> bool:
    return _plan(m, n, wt, dtype) is not None


def _halo_in_specs(m, n, tm, tn, hm, hn):
    """The 3x3 ring of input block specs with torus-wrapped index maps.

    Index maps ignore any trailing grid dimensions (e.g. the packed-mode
    q axis), so Mosaic fetches each block once and reuses it across those
    steps."""
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

def _quad_kernel(*refs, wt, hm, hn):
    ins, outs = refs[:9], refs[9:]
    ll, lh, hl, hh = _compute_quads(ins, wt, hm, hn)
    outs[0][:] = ll
    outs[1][:] = lh
    outs[2][:] = hl
    outs[3][:] = hh


def fused_level_fw_quads(x, wt):
    """One forward 2-D level -> (ll, lh, hl, hh), single pass."""
    m, n = x.shape
    tm, tn, hm, hn = _plan(m, n, wt, x.dtype)
    qshape = jax.ShapeDtypeStruct((m // 2, n // 2), x.dtype)
    qspec = pl.BlockSpec((tm // 2, tn // 2), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_quad_kernel, wt=wt, hm=hm, hn=hn),
        grid=(m // tm, n // tn),
        in_specs=_halo_in_specs(m, n, tm, tn, hm, hn),
        out_specs=(qspec, qspec, qspec, qspec),
        out_shape=(qshape, qshape, qshape, qshape),
    )(*([x] * 9))


# --- packed mode -------------------------------------------------------------


def _sem_packed():
    """(parallel, parallel, arbitrary): the i/j tile axes carry no
    cross-step state; only the q stash axis must stay ordered.  Lazy
    import because mxu2d imports this module."""
    from .mxu2d import _sem
    return _sem(2, 1)

def packed_ok(m: int, n: int, wt, dtype) -> bool:
    plan = _plan(m, n, wt, dtype)
    if plan is None:
        return False
    tm, tn, hm, hn = plan
    # detail blocks are (tm/2, tn/2); quadrant offsets must be block-
    # granular in the full packed buffer
    return (m // 2) % (tm // 2) == 0 and (n // 2) % (tn // 2) == 0


def _packed_kernel(*refs, wt, hm, hn, has_alias):
    if has_alias:
        (ins, _yin, ll_ref, y_ref, stash) = (refs[:9], refs[9], refs[10],
                                             refs[11], refs[12])
        # _yin is the alias carrier only; never touched (ANY memory space)
    else:
        (ins, ll_ref, y_ref, stash) = (refs[:9], refs[9], refs[10], refs[11])
    q = pl.program_id(2)

    @pl.when(q == 0)
    def _():
        ll, lh, hl, hh = _compute_quads(ins, wt, hm, hn)
        ll_ref[:] = ll
        stash[0] = lh
        stash[1] = hl
        stash[2] = hh

    y_ref[:] = stash[q]


def _packed_call(active, y, yshape, wt):
    ml, nl = active.shape
    M, N = yshape
    tm, tn, hm, hn = _plan(ml, nl, wt, active.dtype)
    bm, bn = tm // 2, tn // 2
    nbr = ml // tm        # detail row-blocks per quadrant = (ml/2)/bm
    nbc = nl // tn

    def y_im(i, j, q):
        # q=0 -> lh at (i, j + nbc); q=1 -> hl at (i + nbr, j);
        # q=2 -> hh at (i + nbr, j + nbc).  Integer-only arithmetic.
        return (i + ((q + 1) // 2) * nbr, j + (1 - (q % 2)) * nbc)

    in_specs = _halo_in_specs(ml, nl, tm, tn, hm, hn)
    inputs = [active] * 9
    aliases = {}
    if y is not None:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        inputs = inputs + [y]
        aliases = {9: 1}
    return pl.pallas_call(
        partial(_packed_kernel, wt=wt, hm=hm, hn=hn,
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
        compiler_params=_sem_packed(),
    )(*inputs)


def level_fw_packed(active, y, wt):
    """One forward level in packed mode.

    ``active`` — the (m_l, n_l) scaling array of this level.  ``y`` — the
    full-size packed output buffer, donated and alias-chained level to
    level; this call writes the lh/hl/hh detail quadrants of this level
    into their final packed positions and leaves every other block of
    ``y`` untouched.  Returns (ll, y_out).
    """
    return _packed_call(active, y, y.shape, wt)


def level_fw_packed_first(active, wt):
    """Level-1 packed call: allocates the full-size packed buffer as a
    fresh (uninitialized) pallas output; only this level's detail blocks
    are defined — deeper levels and the final ll corner write fill in the
    rest.  Returns (ll, y)."""
    return _packed_call(active, None, active.shape, wt)


# --- fused inverse level -----------------------------------------------------

def _row_chain_inv(v, wt):
    """Inverse interleaved-lane chain along the last axis."""
    dt = v.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    even = (lane % 2) == 0
    if isinstance(wt, GLS):
        v = v * jnp.where(even, jnp.asarray(1.0 / wt.norm1, dt),
                          jnp.asarray(1.0 / wt.norm2, dt))
        for st in wt.steps[::-1]:
            pred = st.kind == PREDICT
            acc = None
            for k, c in enumerate(st.coef):
                off = 2 * (k - st.shift) + (1 if pred else -1)
                t = roll(v, -off, v.ndim - 1)
                t = jnp.asarray(c, dt) * t
                acc = t if acc is None else acc + t
            mask = even if pred else jnp.logical_not(even)
            v = jnp.where(mask, v + acc, v)
        return v
    h, g = filter_pair(wt)
    u = jnp.where(even, v, 0)                        # upsampled a
    w = jnp.where(even, roll(v, -1, v.ndim - 1), 0)  # upsampled d (shifted)
    x = None
    for m_ in range(len(h)):
        ts = jnp.asarray(h[m_], dt) * roll(u, m_, v.ndim - 1)
        td = jnp.asarray(g[m_], dt) * roll(w, 1 - m_, v.ndim - 1)
        t = ts + td
        x = t if x is None else x + t
    return x


def _col_pair_inv(a, d, wt):
    """Inverse column chain on (a, d) halves -> (even rows, odd rows)."""
    dt = a.dtype
    if isinstance(wt, GLS):
        a = a * jnp.asarray(1.0 / wt.norm1, dt)
        d = d * jnp.asarray(1.0 / wt.norm2, dt)
        for st in wt.steps[::-1]:
            src = d if st.kind == PREDICT else a
            acc = None
            for k, c in enumerate(st.coef):
                t = roll(src, st.shift - k, 0)
                t = jnp.asarray(c, dt) * t
                acc = t if acc is None else acc + t
            if st.kind == PREDICT:
                a = a + acc
            else:
                d = d + acc
        return a, d
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
    return x0, x1


def _inv_kernel(*refs, wt, hm2, hn2, tm, tn):
    groups = [refs[9 * k: 9 * (k + 1)] for k in range(4)]
    o_ref = refs[36]

    def col_exts(g):
        """(left, center, right) lane segments, each row-extended."""
        nw, nn, ne, ww, cc, ee, sw, ss, se = g
        left = jnp.concatenate([nw[:], ww[:], sw[:]], axis=0)
        mid = jnp.concatenate([nn[:], cc[:], ss[:]], axis=0)
        right = jnp.concatenate([ne[:], ee[:], se[:]], axis=0)
        return left, mid, right

    ll, lh, hl, hh = (col_exts(g) for g in groups)

    def int_pair(A, B):
        # Interleaving the halo-extended half pair yields the
        # lane-extended interleaved row (interleaved lane 2k <-> A lane
        # k), BUT the roll+mask butterfly needs power-of-two widths — so
        # shuffle the margins and the center segment separately (each
        # 2*hn2 / 2*tn2 wide) and concatenate.
        return jnp.concatenate(
            [int_lanes(jnp.concatenate([a_, b_], axis=1))
             for a_, b_ in zip(A, B)], axis=1)

    a = int_pair(ll, lh)
    d = int_pair(hl, hh)
    x0, x1 = _col_pair_inv(a, d, wt)
    rows = x0.shape[0]
    v = jnp.stack([x0, x1], axis=1).reshape(2 * rows, x0.shape[1])
    v = _row_chain_inv(v, wt)
    o_ref[:] = v[2 * hm2: 2 * hm2 + tm, 2 * hn2: 2 * hn2 + tn]


def _plan_inv(m: int, n: int, wt, dtype):
    """Inverse tile plan (tm, tn, hm2, hn2) in FULL-level coordinates
    (quadrant tiles are half of each)."""
    from .common import dtype_ok, halo_granule
    if not dtype_ok(dtype):
        return None
    gran = halo_granule(dtype)
    hm2 = roundup(_reach_half(wt), gran)       # quadrant-space row halo
    hn2 = 128                                   # quadrant-space lane halo
    tn = next((c for c in (1024, 512) if n % c == 0), None)
    if tn is None or n // 2 % hn2 or (n // 2) // hn2 < 3:
        return None
    taps = len(wt.qmf) if isinstance(wt, OrthoFilter) else 8
    budget_rows = (10 << 20) // np.dtype(dtype).itemsize // \
        max(taps + 10, 12) // (tn + 4 * hn2)
    tm = 128
    while tm >= 4 * hm2:
        tm2 = tm // 2
        if m % tm == 0 and tm2 % hm2 == 0 and (m // 2) % hm2 == 0 \
                and tm + 4 * hm2 <= budget_rows:
            break
        tm //= 2
    else:
        return None
    if (m // 2) // hm2 < 3:
        return None
    return tm, tn, hm2, hn2


def fused_inv_ok(m: int, n: int, wt, dtype) -> bool:
    return _plan_inv(m, n, wt, dtype) is not None


def _inv_group_specs(plan, ml, nl, src_shape, off):
    """9 halo specs over one quadrant region: quadrant-space torus maps
    plus a constant (ro, co) element offset into the source array."""
    tm, tn, hm2, hn2 = plan
    tm2, tn2 = tm // 2, tn // 2
    mh, nh = ml // 2, nl // 2            # quadrant dims of this level
    nbm = mh // hm2
    nbn = nh // hn2
    sm = tm2 // hm2
    sn = tn2 // hn2
    ro, co = off
    specs = []
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            bm = hm2 if dr != 0 else tm2
            bn = hn2 if dc != 0 else tn2

            def im(i, j, dr=dr, dc=dc, bm=bm, bn=bn):
                ri = (i * sm - 1) % nbm if dr < 0 else \
                    ((i + 1) * sm) % nbm if dr > 0 else i
                ci = (j * sn - 1) % nbn if dc < 0 else \
                    ((j + 1) * sn) % nbn if dc > 0 else j
                return (ri + ro // bm, ci + co // bn)
            specs.append(pl.BlockSpec((bm, bn), im,
                                      memory_space=pltpu.VMEM))
    return specs


def _inv_call(plan, srcs, offs, ml, nl, wt):
    tm, tn, hm2, hn2 = plan
    in_specs = []
    inputs = []
    for src, off in zip(srcs, offs):
        in_specs += _inv_group_specs(plan, ml, nl, src.shape, off)
        inputs += [src] * 9
    return pl.pallas_call(
        partial(_inv_kernel, wt=wt, hm2=hm2, hn2=hn2, tm=tm, tn=tn),
        grid=(ml // tm, nl // tn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ml, nl), srcs[0].dtype),
    )(*inputs)


def fused_level_inv_quads(ll, lh, hl, hh, wt):
    """One inverse 2-D level from quadrant arrays, single pass."""
    mh, nh = ll.shape
    ml, nl = 2 * mh, 2 * nh
    plan = _plan_inv(ml, nl, wt, ll.dtype)
    return _inv_call(plan, (ll, lh, hl, hh), [(0, 0)] * 4, ml, nl, wt)


def level_inv_packed(y, ll, l_size, wt):
    """One inverse level reading the detail quadrants DIRECTLY from the
    packed array ``y`` (offset halo windows — no slice materialization);
    ``ll`` is the running scaling array from the deeper level.  Returns
    the (ml, nl) scaling array of the shallower level."""
    ml, nl = l_size
    plan = _plan_inv(ml, nl, wt, y.dtype)
    mh, nh = ml // 2, nl // 2
    return _inv_call(plan, (ll, y, y, y),
                     [(0, 0), (0, nh), (mh, 0), (mh, nh)], ml, nl, wt)
