"""Fused 2-level 2-D forward stage: levels 1+2 in ONE kernel launch.

Round-4 measurement context: at healthy sessions the bf16 forward
pipeline reads sol ~0.76-0.79 of the per-level traffic model — level 1
sits near its DMA floor and level 2 adds a full re-read+re-write of the
ll quadrant (0.41 ms bf16 / 0.85 f32 at 16k²).  With native 1-pass bf16
dots the MXU has headroom, so computing level 2 IN the level-1 launch
removes level 2's HBM round-trip entirely: stage traffic = read x +
write all detail/ll bands once ≈ 2 passes, vs 2.5 for two per-level
launches (the 2-D analogue of pyramid1d's Ls=2 stages; the round-3
"2-level fusion loses" model-out was for the f32 split dots, whose
compute exceeds DMA — f32 stays per-level by default).

How the halos work (everything is EXACT — no contamination, unlike the
1-D pyramid's outer-row fringe):

* The 3x3 ring reads ``hs = roundup(3r, granule)`` halo rows per side
  (r = the wavelet's band reach) and the usual 128-lane margin blocks.
* Level-1 row dots produce S/D for ALL ext rows; two extra 4m-lane EDGE
  windows against a small (4m, 2m) weight extend the scaling band by m
  lanes each side (input span 3m <= 128 stays inside the margin block).
* An asymmetric column weight (``_w_col_stage``) emits the ll1 band
  with ±r extra ROWS (a-rows = tm/2 + 2r) while detail rows stay
  interior-only — exactly the halo level 2 needs, all derived from real
  neighbor data.
* Level-2 dots then run in-register on the (tm/2 + 2r, tn/2 + 2m) ll1
  band: the SAME shared row weight (bands are scale-invariant) and the
  standard ``_w_col(wt, tm/2, r)`` column weight.
* The 6 detail quadrant blocks (3 per level) leave via in-kernel async
  copies to their final packed positions (the DMA-packed scheme);
  ``last=True`` streams ll2 as well and drops the separate ll output.

Reference semantics: two iterations of the level loop,
src/Transforms/transforms_lifting.jl:128-194 /
transforms_filter.jl:113-188; the fused stage is this framework's own
device mapping (no reference analogue).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import halo_granule, roundup
from .fused2d import _halo_in_specs
from .mxu2d import (_band_reach, _dot_f32, _mode_for, _mxu_dtype_ok, _pair,
                    _plan, _row_gl, _row_margin, _sem, _w_col, _w_row,
                    level_bands, _HN)

__all__ = ["stage2_ok", "stage2_fw", "stage2_on"]


def stage2_on(dtype) -> bool:
    """Routing default for the fused stage: OFF — a measured negative
    result (BENCHMARKS.md round 4).  The device A/B read bf16 16k² L8
    2.85 → 3.34 ms and f32 5.40 → 7.04 with the stage on: the forward
    pipeline is COMPUTE/GLUE-bound on this toolchain (bf16 L8 time is
    flat across 277–657 GB/s sessions), so removing level 2's HBM
    round-trip buys nothing while the stage's extra in-kernel work
    (edge windows, paired col dots, bigger live set) costs ~0.5 ms.
    Kept opt-in (WAVELETS_TPU_MXU_LS2=1) with its exactness pinned —
    the economics flip on a toolchain whose dots are cheaper or whose
    HBM is slower."""
    import os
    return os.environ.get("WAVELETS_TPU_MXU_LS2") == "1"


def _stage_plan(m: int, n: int, wt, dtype):
    """(tm, tn, hs, r, mr) or None.  Builds on the per-level tile plan;
    the stage's live set is ~2x the per-level kernel's, so the VMEM
    ladder drops to narrower tn earlier (boundary calibrated on device:
    the ext-tile budget halves)."""
    if not _mxu_dtype_ok(dtype):
        return None
    base = _plan(m, n, wt, dtype)
    if base is None:
        return None
    tm, tn, _hm = base
    lo, hi = _band_reach(wt)
    # even r keeps every in-kernel row slice at even sublane offsets
    # (bf16 packs row pairs into words)
    r = roundup(max(lo, hi, 1), 2)
    mr = _row_margin(wt, fw=True)
    if 3 * mr > _HN:            # edge windows must fit the lane margin
        return None
    g = halo_granule(dtype)
    hs = roundup(3 * r, g)
    while tm % hs and hs < tm:  # _halo_in_specs needs tm % hs == 0
        hs += g
    if tm % hs or m % hs or hs >= tm:
        return None
    # both in-kernel levels need lane-tileable halves
    gl = _row_gl(tn)
    if (tn // 2) % gl or (tn // 2) % 128 or (tm // 2) % 2 or n % tn:
        return None
    if (m // 4) % (tm // 4) or (n // 4) % (tn // 4):
        return None
    itemsize = np.dtype(dtype).itemsize
    while tn > 256 and (tm + 2 * hs) * (tn + 256) * itemsize > 1_600_000:
        tn //= 2
        if n % tn or (tn // 2) % _row_gl(tn) or (n // 4) % (tn // 4):
            return None
    if (tm + 2 * hs) * (tn + 256) * itemsize > 1_600_000:
        return None
    return tm, tn, hs, r, mr


def stage2_ok(m: int, n: int, wt, dtype) -> bool:
    if not stage2_on(dtype):
        return False
    return _stage_plan(m, n, wt, dtype) is not None


def _w_col_stage(wt, tm: int, r: int, hs: int, dtype):
    """Asymmetric level-1 column weight for the fused stage.

    Maps (tm + 2hs) halo-extended x rows -> [a: tm/2 + 2r rows (the ll1
    band INCLUDING its ±r level-2 halo) | d: tm/2 interior detail rows].
    Interior x row 0 sits at ext row hs; a-output row q is ll1 row
    (q - r), i.e. x rows 2(q - r) + delta."""
    ds, cs, dd, cd = level_bands(wt)
    A = tm // 2 + 2 * r
    E = tm + 2 * hs
    W = np.zeros((A + tm // 2, E), np.float64)
    for q in range(A):
        for delta, c in zip(ds, cs):
            W[q, hs - 2 * r + 2 * q + delta] += c
    for q in range(tm // 2):
        for delta, c in zip(dd, cd):
            W[A + q, hs + 2 * q + delta] += c
    return jnp.asarray(W.astype(dtype))


def _row_windows(ext_p, wr_pair, *, gl, m, off, nj, mode):
    """The v1 row-dot loop: nj windows of width gl+2m at stride gl from
    lane offset ``off``; returns (S, D) concatenated halves (f32)."""
    def win(j):
        a, (hi, lo) = ext_p
        sl = (slice(None), slice(gl * j + off, gl * j + off + gl + 2 * m))
        return a[sl], ((hi[sl], lo[sl]) if hi is not None else (None, None))

    pieces = [_dot_f32(win(j), wr_pair, mode) for j in range(nj)]
    g2 = gl // 2
    S = jnp.concatenate([p[:, :g2] for p in pieces], axis=1)
    D = jnp.concatenate([p[:, g2:] for p in pieces], axis=1)
    return S, D


def _stage2_kernel(*refs, tm, tn, hs, r, mr, mode, has_alias, nbr, nbc,
                   M, N, last):
    if has_alias:
        (ins, wr_ref, we_ref, w1c_ref, w2c_ref, _yin) = (
            refs[:9], refs[9], refs[10], refs[11], refs[12], refs[13])
        rest = refs[14:]
    else:
        (ins, wr_ref, we_ref, w1c_ref, w2c_ref) = (
            refs[:9], refs[9], refs[10], refs[11], refs[12])
        rest = refs[13:]
    if last:
        y_ref, stash1, stash2, sem1, sem2 = rest
        ll_ref = None
    else:
        ll_ref, y_ref, stash1, stash2, sem1, sem2 = rest

    nw, nn, ne, ww, cc, ee, sw, ss, se = ins
    top = jnp.concatenate([nw[:], nn[:], ne[:]], axis=1)
    mid = jnp.concatenate([ww[:], cc[:], ee[:]], axis=1)
    bot = jnp.concatenate([sw[:], ss[:], se[:]], axis=1)
    ext = jnp.concatenate([top, mid, bot], axis=0)   # (tm+2hs, tn+256)
    dt = ext.dtype
    gl = _row_gl(tn)

    wr_p = _pair(wr_ref[:], mode)
    ext_p = _pair(ext, mode)

    # --- level 1 rows: interior windows + the two edge windows --------
    S1, D1 = _row_windows(ext_p, wr_p, gl=gl, m=mr, off=_HN - mr,
                          nj=tn // gl, mode=mode)
    we_p = _pair(we_ref[:], mode)

    def edge(c0):
        a, (hi, lo) = ext_p
        sl = (slice(None), slice(c0, c0 + 4 * mr))
        pr = (a[sl], ((hi[sl], lo[sl]) if hi is not None
                      else (None, None)))
        return _dot_f32(pr, we_p, mode)[:, :mr]     # s-half only

    eL = edge(_HN - 3 * mr)          # ll1 lanes [-m, 0)
    eR = edge(_HN + tn - mr)         # ll1 lanes [tn/2, tn/2 + m)
    S1f = jnp.concatenate([eL, S1, eR], axis=1).astype(dt)
    D1 = D1.astype(dt)

    # --- level 1 columns: asymmetric weight ---------------------------
    w1c_p = _pair(w1c_ref[:], mode)
    A = tm // 2 + 2 * r
    Y_S = _dot_f32(w1c_p, _pair(S1f, mode), mode)   # (A + tm/2, tn/2+2m)
    Y_D = _dot_f32(w1c_p, _pair(D1, mode), mode)    # (A + tm/2, tn/2)
    ll1 = Y_S[:A].astype(dt)                        # (A, tn/2 + 2m)
    hl1 = Y_S[A:, mr: mr + tn // 2].astype(dt)
    lh1 = Y_D[r: r + tm // 2].astype(dt)
    hh1 = Y_D[A:].astype(dt)
    stash1[0] = lh1
    stash1[1] = hl1
    stash1[2] = hh1

    # --- level 2 on the ll1 band --------------------------------------
    ll1_p = _pair(ll1, mode)
    S2, D2 = _row_windows(ll1_p, wr_p, gl=gl, m=mr, off=0,
                          nj=(tn // 2) // gl, mode=mode)
    w2c_p = _pair(w2c_ref[:], mode)
    Y2S = _dot_f32(w2c_p, _pair(S2.astype(dt), mode), mode)  # (tm/2, tn/4)
    Y2D = _dot_f32(w2c_p, _pair(D2.astype(dt), mode), mode)
    q = tm // 4
    ll2 = Y2S[:q].astype(dt)
    stash2[0] = Y2D[:q].astype(dt)       # lh2
    stash2[1] = Y2S[q:].astype(dt)       # hl2
    stash2[2] = Y2D[q:].astype(dt)       # hh2
    if last:
        stash2[3] = ll2
    else:
        ll_ref[:] = ll2

    # --- stream everything to its packed position ---------------------
    i = pl.program_id(0)
    j = pl.program_id(1)
    bm, bn = tm // 2, tn // 2
    bm2, bn2 = tm // 4, tn // 4
    dmas = [
        pltpu.make_async_copy(
            stash1.at[0], y_ref.at[pl.ds(i * bm, bm),
                                   pl.ds((j + nbc) * bn, bn)], sem1.at[0]),
        pltpu.make_async_copy(
            stash1.at[1], y_ref.at[pl.ds((i + nbr) * bm, bm),
                                   pl.ds(j * bn, bn)], sem1.at[1]),
        pltpu.make_async_copy(
            stash1.at[2], y_ref.at[pl.ds((i + nbr) * bm, bm),
                                   pl.ds((j + nbc) * bn, bn)], sem1.at[2]),
        pltpu.make_async_copy(
            stash2.at[0], y_ref.at[pl.ds(i * bm2, bm2),
                                   pl.ds(N // 4 + j * bn2, bn2)],
            sem2.at[0]),
        pltpu.make_async_copy(
            stash2.at[1], y_ref.at[pl.ds(M // 4 + i * bm2, bm2),
                                   pl.ds(j * bn2, bn2)], sem2.at[1]),
        pltpu.make_async_copy(
            stash2.at[2], y_ref.at[pl.ds(M // 4 + i * bm2, bm2),
                                   pl.ds(N // 4 + j * bn2, bn2)],
            sem2.at[2]),
    ]
    if last:
        dmas.append(pltpu.make_async_copy(
            stash2.at[3], y_ref.at[pl.ds(i * bm2, bm2),
                                   pl.ds(j * bn2, bn2)], sem2.at[3]))
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()


def stage2_fw(x, y, yshape, wt, last=False):
    """Levels 1+2 of the packed forward in one launch.

    Returns (ll2, y) — or y alone with ``last=True`` (L == 2: ll2
    streams into the packed buffer like mxu_level_fw_packed_last)."""
    ml, nl = x.shape
    M, N = yshape
    if (ml, nl) != (M, N):
        # not an assert: stripped under python -O, and a sub-level shape
        # would silently mis-place DMA quadrants instead of failing
        raise ValueError(
            f"stage2_fw runs at level 1 only: active {(ml, nl)} must "
            f"equal the packed buffer {(M, N)}")
    tm, tn, hs, r, mr = _stage_plan(ml, nl, wt, x.dtype)
    gl = _row_gl(tn)
    mode = _mode_for(x.dtype)
    nbr, nbc = ml // tm, nl // tn
    wr = _w_row(wt, x.dtype, gl, mr)
    we = _w_row(wt, x.dtype, 2 * mr, mr)
    w1c = _w_col_stage(wt, tm, r, hs, x.dtype)
    w2c = _w_col(wt, tm // 2, r, x.dtype)
    const = lambda shape: pl.BlockSpec(shape, lambda i, j: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_specs = _halo_in_specs(ml, nl, tm, tn, hs, _HN) + [
        const(wr.shape), const(we.shape), const(w1c.shape),
        const(w2c.shape)]
    inputs = [x] * 9 + [wr, we, w1c, w2c]
    aliases = {}
    if y is not None:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        inputs = inputs + [y]
        aliases = {13: 0 if last else 1}
    ll_out = () if last else (
        (pl.BlockSpec((tm // 4, tn // 4), lambda i, j: (i, j),
                      memory_space=pltpu.VMEM),
         jax.ShapeDtypeStruct((ml // 4, nl // 4), x.dtype)),)
    out_specs = tuple(s for s, _ in ll_out) + (
        pl.BlockSpec(memory_space=pl.ANY),)
    out_shape = tuple(o for _, o in ll_out) + (
        jax.ShapeDtypeStruct((M, N), x.dtype),)
    res = pl.pallas_call(
        partial(_stage2_kernel, tm=tm, tn=tn, hs=hs, r=r, mr=mr,
                mode=mode, has_alias=y is not None, nbr=nbr, nbc=nbc,
                M=M, N=N, last=last),
        grid=(ml // tm, nl // tn),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=[
            pltpu.VMEM((3, tm // 2, tn // 2), x.dtype),
            pltpu.VMEM((4 if last else 3, tm // 4, tn // 4), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((4 if last else 3,)),
        ],
        compiler_params=_sem(2),
    )(*inputs)
    return res[0] if last else res
