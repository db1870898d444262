"""Multi-level 1-D "pyramid" kernels: several DWT levels per launch,
details streamed straight into the packed output buffer.

Round-2 device measurements showed the wide-1-D path is overhead-bound,
not bandwidth-bound: a chained jit dispatch through the tunneled backend
costs ~0.66 ms regardless of array size, each per-level launch adds
read+write passes, and the packed layout costs a final full-size
concatenate (at 2^24/L8 the whole op ran at ~6 HBM passes).  This module
collapses the pyramid:

* One launch computes a BLOCK of Ls levels (default 2, env
  WAVELETS_TPU_PYR_LS).  The signal rides the same row-major (R, C) fold
  as wide1d.py — sample i at (i // C, i % C), neighbour context = one
  sublane ring — and each grid chunk carries an 8-row halo whose
  interior rows stay valid across all in-kernel levels (corruption from
  the periodic roll at the tile edge is confined to a ~2*reach lane
  prefix of the OUTERMOST halo row per level; interior rows only ever
  read their neighbours' far tails).

* Per level the compute is the MXU banded-matmul body of mxu2d.py — the
  lane window dots with the deinterleave permutation baked into the
  weights (_w_row / _w_row_inv), ONE weight block shared by every level
  (the bands are scale-invariant) — so there is no lane butterfly and no
  VPU chain at all.

* Detail bands never touch a staging buffer: like the 2-D packed mode,
  an innermost q grid axis streams each chunk's detail blocks into their
  final positions of the full-size packed vector (viewed as an
  (n/128, 128) matrix), alias-chained across stages.  The q -> (band,
  sub-block) decode is branch-free index arithmetic: with t = q+1 and
  lp = 2^floor(log2 t) (bit smear), band d_l (l levels into the stage,
  lp = 2^(Ls-l)) starts at block nch*lp and chunk i owns blocks
  [i*lp, i*lp + lp) — block = nch*lp + i*lp + (t - lp).

* The stage's scaling band comes out as a separate (R, C/2^Ls) array —
  exactly the next stage's fold — and the LAST stage's (or the jnp
  tail's) packed prefix is written with one in-place
  dynamic_update_slice.

Why Ls = 2 and not "as deep as fits": the per-grid-step overhead on
this toolchain is ~1.5-2 us and the q axis emits one step per B-sized
output block, so a stage costs ~ n/B steps with B = tm*C/2^Ls —
doubling Ls doubles the step count while saving only a 1/4^stage
re-read of the scaling band.  Measured at 2^24/L8 the Ls=4 variant lost
~2.5 ms to grid steps; Ls=2's extra scaling-band traffic costs ~0.5 ms
at healthy bandwidth.

Reference semantics: src/Transforms/transforms_filter.jl:13-83 and
transforms_lifting.jl:30-122 (level loop over the shrinking scaling
prefix); the multi-level fold kernel is this framework's own device
mapping (no reference analogue — the GPU extension launches per level,
ext/WaveletsGPUExt/filter_transforms_gpu.jl:171-211).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import roundup
from .mxu2d import (_band_reach, _dot_f32, _mode_for, _mxu_dtype_ok, _pair,
                    _row_margin, _sem, _syn_reach, _w_row, _w_row_inv)
from .wide1d import _lane_extend

__all__ = ["pyr_ok", "dwt1d_pyramid", "idwt1d_pyramid",
           "dwt1d_pyramid_b", "idwt1d_pyramid_b", "plan_stages"]

_HR = 8   # sublane halo rows (f32 granule); interior rows stay valid
          # for any stage depth < _HR
_GL = 128  # output-group lane count of the banded dots


def _stage_plan(n: int, wt, L_rem: int, dtype):
    """(C, R, tm, Ls, m) for one multi-level stage on a length-n signal,
    or None.  Every in-kernel width stays a >=128-lane power of two
    (the dot windows' requirement)."""
    # f32 (split dots) and bf16 (native dots): the stage bodies are MXU
    # dots + sublane rolls only — no lane rotates, so bf16 avoids the
    # crash-prone bitcast-roll kernels.  bf16 device-validated round 3:
    # compiles and round-trips at 2^18/L4 and 2^22/L8 on the v5e with no
    # wedge (WAVELETS_TPU_PYR_BF16=0 disables if a future toolchain
    # regresses).
    if not _mxu_dtype_ok(dtype) or L_rem < 2:
        return None
    if (np.dtype(dtype) == np.dtype(jnp.bfloat16)
            and os.environ.get("WAVELETS_TPU_PYR_BF16") == "0"):
        return None
    lo, hi = _band_reach(wt)
    lo2, hi2 = _syn_reach(wt)
    if max(lo, hi, lo2, hi2) > 120:
        return None
    # one margin serves BOTH the stage's analysis and synthesis dots
    # (fw/inv stage plans must match); use the synthesis (32) granule
    m = _row_margin(wt, fw=False)
    for C in (2048, 1024, 512):
        if n % C:
            continue
        R = n // C
        if R < 32 or R % 16:
            continue
        cap = (C // _GL).bit_length() - 1
        Ls = min(L_rem, cap, _HR - 1,
                 int(os.environ.get("WAVELETS_TPU_PYR_LS", "2")))
        if Ls < 2:
            continue
        # margins must fit the smallest width's windows
        if 2 * m > (C >> (Ls - 1)):
            continue
        # VMEM: ~6 live (2*_HR+tm, C+2m) f32 temps + the detail stash
        budget = (11 << 20) // 4 // 6 // (C + 2 * m) - 2 * _HR
        tm = int(os.environ.get("WAVELETS_TPU_PYR_TM", "128"))
        while tm > 16 and (R % tm or tm > budget):
            tm //= 2
        if R % tm or tm % 16 or tm > budget:
            continue
        return C, R, tm, Ls, m
    return None


def plan_stages(n: int, wt, L: int, dtype):
    """The stage list [(n_k, plan_k), ...] shared by forward and inverse
    (they must split identically); n % 128 == 0 is required for the
    packed (n/128, 128) view."""
    if L < 1 or n % 128 or os.environ.get("WAVELETS_TPU_PYR1D") == "0":
        return []
    stages = []
    rem = L
    while rem:
        p = _stage_plan(n, wt, rem, dtype)
        if p is None:
            break
        stages.append((n, p))
        n >>= p[3]
        rem -= p[3]
    return stages


def pyr_ok(n: int, wt, L: int, dtype) -> bool:
    return bool(plan_stages(n, wt, L, dtype))


def _dots_fw(act, wr_pair, m, mode):
    """One analysis level on the (rows, w) fold via the banded window
    dots (mxu2d._w_row semantics): returns (s, d), each (rows, w/2),
    already deinterleaved."""
    w = act.shape[1]
    ext_p = _pair(_lane_extend(act, m), mode)
    w_ = _GL + 2 * m

    def win(j):
        a, (hi, lo) = ext_p
        sl = (slice(None), slice(_GL * j, _GL * j + w_))
        return a[sl], ((hi[sl], lo[sl]) if hi is not None else (None, None))

    pieces = [_dot_f32(win(j), wr_pair, mode) for j in range(w // _GL)]
    g2 = _GL // 2
    s = jnp.concatenate([p[:, :g2] for p in pieces], axis=1)
    d = jnp.concatenate([p[:, g2:] for p in pieces], axis=1)
    return s.astype(act.dtype), d.astype(act.dtype)


def _dots_inv(s, d, wi_pair, m, mode):
    """One synthesis level: (rows, w) scaling + detail fold ->
    (rows, 2w) interleaved signal (mxu2d._w_row_inv semantics)."""
    w = s.shape[1]
    s_p = _pair(_lane_extend(s, m), mode)
    d_p = _pair(_lane_extend(d, m), mode)
    g2 = _GL // 2
    wv = g2 + 2 * m

    def win(p, j):
        a, (hi, lo) = p
        sl = (slice(None), slice(g2 * j, g2 * j + wv))
        return a[sl], ((hi[sl], lo[sl]) if hi is not None else (None, None))

    pieces = []
    for j in range(w // g2):
        sa, (sh, sl_) = win(s_p, j)
        da, (dh, dl) = win(d_p, j)
        a = jnp.concatenate([sa, da], axis=1)
        pair = (a, ((jnp.concatenate([sh, dh], axis=1),
                     jnp.concatenate([sl_, dl], axis=1))
                    if sh is not None else (None, None)))
        pieces.append(_dot_f32(pair, wi_pair, mode))
    return jnp.concatenate(pieces, axis=1).astype(s.dtype)


def _fold_specs(R: int, C: int, tm: int, nch: int):
    """(up, center, down) ring specs over a (B*R, C) stack of per-signal
    folds: the sublane ring wraps WITHIN each signal's R-row segment
    (batched rows are independent periodic signals, like wide1d's
    _halo_specs_b).  ``nch`` = R // tm chunks per signal; (i, q) grid."""
    nbs = R // _HR
    step = tm // _HR

    def seg_loc(i):
        return i // nch, i % nch

    def up(i, q):
        seg, loc = seg_loc(i)
        return seg * nbs + (loc * step - 1) % nbs, 0

    def down(i, q):
        seg, loc = seg_loc(i)
        return seg * nbs + (loc * step + step) % nbs, 0

    return [
        pl.BlockSpec((_HR, C), up, memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, C), lambda i, q: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_HR, C), down, memory_space=pltpu.VMEM),
    ]


def _y_index(nch: int, sig_blocks: int):
    """(i, q) -> packed-buffer block decode (see module docstring),
    offset by the owning signal's region (``sig_blocks`` = n0 // B
    blocks per signal)."""
    def imap(i, q):
        t = q + 1
        p = t | (t >> 1)
        p = p | (p >> 2)
        p = p | (p >> 4)
        lp = (p + 1) >> 1
        seg, loc = i // nch, i % nch
        return seg * sig_blocks + nch * lp + loc * lp + (t - lp), 0
    return imap


def _fw_kernel(*refs, wt, m, tm, Ls, Br, mode, has_alias):
    if has_alias:
        up, cc, dn, wr_ref, _yin, s_ref, y_ref, stash = refs
    else:
        up, cc, dn, wr_ref, s_ref, y_ref, stash = refs
    q = pl.program_id(1)

    @pl.when(q == 0)
    def _():
        wr_pair = _pair(wr_ref[:], mode)
        act = jnp.concatenate([up[:], cc[:], dn[:]], axis=0)
        for l in range(1, Ls + 1):
            act, d = _dots_fw(act, wr_pair, m, mode)
            d = d[_HR: _HR + tm]
            cnt = 1 << (Ls - l)
            stash[cnt - 1: 2 * cnt - 1] = d.reshape(cnt, Br, 128)
        s_ref[:] = act[_HR: _HR + tm]

    y_ref[:] = stash[q]


def _stage_fw(s, y, n0: int, wt, plan):
    """One forward stage on a (BATCH, n_k) row batch of independent
    periodic signals: -> (s_next (BATCH, n_k/2^Ls), y as a
    ((BATCH*n0)//128, 128) view of the per-signal packed regions)."""
    BATCH, nk = s.shape
    C, R, tm, Ls, m = plan
    NQ = 1 << Ls
    Bsz = tm * C // NQ
    Br = Bsz // 128
    nch = R // tm
    wr = _w_row(wt, s.dtype, _GL, m)
    folded = s.reshape(BATCH * R, C)
    in_specs = _fold_specs(R, C, tm, nch) + [
        pl.BlockSpec(wr.shape, lambda i, q: (0, 0),
                     memory_space=pltpu.VMEM)]
    inputs = [folded, folded, folded, wr]
    aliases = {}
    if y is not None:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        inputs = inputs + [y]
        aliases = {4: 1}
    s_next, y = pl.pallas_call(
        partial(_fw_kernel, wt=wt, m=m, tm=tm, Ls=Ls, Br=Br,
                mode=_mode_for(s.dtype), has_alias=y is not None),
        grid=(BATCH * nch, NQ - 1),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tm, C // NQ), lambda i, q: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Br, 128), _y_index(nch, n0 // Bsz),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BATCH * R, C // NQ), s.dtype),
            jax.ShapeDtypeStruct((BATCH * n0 // 128, 128), s.dtype),
        ),
        input_output_aliases=aliases,
        scratch_shapes=[pltpu.VMEM((NQ - 1, Br, 128), s.dtype)],
        compiler_params=_sem(1, 1),
    )(*inputs)
    return s_next.reshape(BATCH, nk // NQ), y


def _fw_stages(x, n0: int, wt, stages):
    s = x
    y = None
    done = 0
    for _nk, plan in stages:
        s, y = _stage_fw(s, y, n0, wt, plan)
        done += plan[3]
    return s, y, done


def dwt1d_pyramid(x, wt, L: int):
    """Multi-level 1-D DWT of a flat signal, packed layout, staged
    pyramid kernels + jnp/wide tail."""
    from .wide1d import dwt1d_wide_nopyr
    n0 = x.shape[0]
    stages = plan_stages(n0, wt, L, x.dtype)
    s, y, done = _fw_stages(x.reshape(1, n0), n0, wt, stages)
    s = s.reshape(-1)
    rest = dwt1d_wide_nopyr(s, wt, L - done) if done < L else s
    if y is None:
        return rest
    return jax.lax.dynamic_update_slice(y.reshape(-1), rest, (0,))


def dwt1d_pyramid_b(x, wt, L: int):
    """Multi-level DWT of a (B, n) batch of independent signals, packed
    layout per row — the staged pyramid with segment-local rings; tail
    levels ride the per-level batched kernels (dwt1d.py)."""
    from .dwt1d import dwt1d_pallas
    BATCH, n0 = x.shape
    stages = plan_stages(n0, wt, L, x.dtype)
    s, y, done = _fw_stages(x, n0, wt, stages)
    rest = dwt1d_pallas(s, wt, L - done) if done < L else s
    if y is None:
        return rest
    yb = y.reshape(BATCH, n0)
    return jax.lax.dynamic_update_slice(yb, rest, (0, 0))


# --- inverse -----------------------------------------------------------------


def _band_specs(R: int, C: int, tm: int, l: int, n0: int):
    """(up, center, down) ring specs for detail band d_l read from the
    packed ((BATCH*n0)/128, 128) view.  In each spec's own block units,
    signal b's region starts at b * n0/blocksize and the band at R/8
    (halo blocks) / R/tm (center) into it: both the band offset n_k/2^l
    and the block sizes scale with the band width C/2^l.  The ring wraps
    within each signal's band."""
    wl = C >> l
    nbs = R // _HR
    nch = R // tm
    step = tm // _HR
    sig_up = n0 // (_HR * wl)     # signal stride in up/down-block units
    sig_c = n0 // (tm * wl)       # ... in center-block units

    def up(i):
        seg, loc = i // nch, i % nch
        return seg * sig_up + nbs + (loc * step - 1) % nbs, 0

    def center(i):
        seg, loc = i // nch, i % nch
        return seg * sig_c + nch + loc, 0

    def down(i):
        seg, loc = i // nch, i % nch
        return seg * sig_up + nbs + (loc * step + step) % nbs, 0

    return [
        pl.BlockSpec((_HR * wl // 128, 128), up, memory_space=pltpu.VMEM),
        pl.BlockSpec((tm * wl // 128, 128), center,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_HR * wl // 128, 128), down,
                     memory_space=pltpu.VMEM),
    ]


def _sfold_specs(R: int, C: int, tm: int, Ls: int):
    """(up, center, down) ring specs over the scaling band's own
    (BATCH*R, C/2^Ls) fold stack (segment-local ring), 1-axis grid."""
    w = C >> Ls
    nbs = R // _HR
    nch = R // tm
    step = tm // _HR

    def up(i):
        seg, loc = i // nch, i % nch
        return seg * nbs + (loc * step - 1) % nbs, 0

    def down(i):
        seg, loc = i // nch, i % nch
        return seg * nbs + (loc * step + step) % nbs, 0

    return [
        pl.BlockSpec((_HR, w), up, memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((_HR, w), down, memory_space=pltpu.VMEM),
    ]


def _inv_kernel(*refs, wt, m, tm, Ls, C, mode):
    wi_ref = refs[3 + 3 * Ls]
    o_ref = refs[-1]
    wi_pair = _pair(wi_ref[:], mode)
    s = jnp.concatenate([refs[0][:], refs[1][:], refs[2][:]], axis=0)
    idx = 3
    for l in range(Ls, 0, -1):
        wl = C >> l
        d = jnp.concatenate([refs[idx][:], refs[idx + 1][:],
                             refs[idx + 2][:]], axis=0)
        idx += 3
        d = d.reshape(2 * _HR + tm, wl)
        s = _dots_inv(s, d, wi_pair, m, mode)
    o_ref[:] = s[_HR: _HR + tm]


def _stage_inv(s, y2d, n0: int, wt, plan):
    """One inverse stage: scaling band s (BATCH, n_k/2^Ls) + detail
    bands read from the packed view -> reconstructed s (BATCH, n_k)."""
    BATCH, _nks = s.shape
    C, R, tm, Ls, m = plan
    nch = R // tm
    wi = _w_row_inv(wt, s.dtype, _GL, m)
    sf = s.reshape(BATCH * R, C >> Ls)
    in_specs = _sfold_specs(R, C, tm, Ls)
    inputs = [sf, sf, sf]
    for l in range(Ls, 0, -1):
        in_specs += _band_specs(R, C, tm, l, n0)
        inputs += [y2d, y2d, y2d]
    in_specs += [pl.BlockSpec(wi.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM)]
    inputs += [wi]
    out = pl.pallas_call(
        partial(_inv_kernel, wt=wt, m=m, tm=tm, Ls=Ls, C=C,
                mode=_mode_for(s.dtype)),
        grid=(BATCH * nch,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BATCH * R, C), s.dtype),
        compiler_params=_sem(1),
    )(*inputs)
    return out.reshape(BATCH, R * C)


def _inv_stages(s, y, n0: int, wt, stages):
    BATCH = s.shape[0]
    y2d = y.reshape(BATCH * n0 // 128, 128)
    for _nk, plan in reversed(stages):
        s = _stage_inv(s, y2d, n0, wt, plan)
    return s


def idwt1d_pyramid(y, wt, L: int):
    """Inverse of :func:`dwt1d_pyramid` (same stage split by
    construction: both call :func:`plan_stages`)."""
    from .wide1d import idwt1d_wide_nopyr
    n0 = y.shape[0]
    stages = plan_stages(n0, wt, L, y.dtype)
    done = sum(p[3] for _nk, p in stages)
    n_tail = n0 >> done
    s = y[:n_tail]
    if done < L:
        s = idwt1d_wide_nopyr(s, wt, L - done)
    return _inv_stages(s.reshape(1, n_tail), y, n0, wt,
                       stages).reshape(-1)


def idwt1d_pyramid_b(y, wt, L: int):
    """Inverse of :func:`dwt1d_pyramid_b`."""
    from .dwt1d import idwt1d_pallas
    BATCH, n0 = y.shape
    stages = plan_stages(n0, wt, L, y.dtype)
    done = sum(p[3] for _nk, p in stages)
    n_tail = n0 >> done
    s = y[:, :n_tail]
    if done < L:
        s = idwt1d_pallas(s, wt, L - done)
    return _inv_stages(s, y, n0, wt, stages)
