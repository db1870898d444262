"""MXU (systolic-array) formulation of one fused 2-D DWT level.

Round-2 measurements on v5e (BENCHMARKS.md) showed the fused VPU level
kernel (fused2d.py) is compute-bound, not bandwidth-bound: on this
toolchain Mosaic never overlaps grid-step DMA with compute (time =
DMA + VPU, additive — verified with a K-sweep of an FMA chain and with
a manual double-buffered make_async_copy pipeline, both exactly
additive), and Mosaic's VPU elementwise throughput is ~3-4x below
XLA's on the same chip.  The measured in-kernel f32 matmul rate,
however, is ~160 TFLOP/s — two orders of magnitude above the VPU rate.

So this module expresses the whole separable level as two banded
matmuls on the MXU:

    Y = W_c @ (X_ext @ W_r)

* ``W_r`` (512, 256) is one weight block shared by all 256-lane output
  groups: output lanes [s_j | d_j] of group j are the analysis bands
  a[k] = sum_delta band_s[delta] x[2k+delta] (and band_d for d), with
  the lane DEINTERLEAVE PERMUTATION baked into the band placement —
  the log2(W)-stage roll+select lane butterfly (the single largest VPU
  cost of fused2d.py) disappears entirely.
* ``W_c`` (tm, tm_ext) applies the same bands along rows (sublanes) and
  simultaneously slices the interior rows, emitting the quadrant block
  [[LL | LH], [HL | HH]] directly.

The bands are extracted ONCE per wavelet in float64 NumPy from the
engine's own closed forms — h/g gathers for OrthoFilter
(ops/filter_fb.py:75-117; reference src/Transforms/transforms_filter.jl
:362-377) and an exact circulant simulation of the lifting step chain
for GLS (ops/lifting.py:lift_steps; reference
src/Transforms/transforms_lifting.jl:323-483) — so both engines share
this kernel and agree with their VPU/XLA formulations to f32 rounding
(the matmul reassociates the accumulation).

FLOP cost at 8192^2: rows 68 GFLOP + cols 20 GFLOP ~ 0.6-0.9 ms on the
MXU, replacing ~2.9 ms of VPU chains/butterflies; HBM traffic is
identical to fused2d.py (~2.3 passes/level).
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
from .common import roundup
from .fused2d import _halo_in_specs

__all__ = ["level_bands", "mxu_ok", "mxu_level_fw_quads"]

_WIN = 512          # lane window per 256-lane output group
_HN = 128           # lane halo (left margin of the first window)


def level_bands(wt):
    """Analysis bands (delta_s, coef_s, delta_d, coef_d) in float64:

        a[k] = sum_i coef_s[i] * x[(2k + delta_s[i]) mod n]
        d[k] = sum_i coef_d[i] * x[(2k + delta_d[i]) mod n]

    Exact for both engines by construction from their own formulations.
    """
    if isinstance(wt, OrthoFilter):
        h, g = filter_pair(wt)
        h = np.asarray(h, np.float64)
        g = np.asarray(g, np.float64)
        return (np.arange(len(h)), h,
                1 - np.arange(len(g)), g)
    # GLS: run the lifting chain on a circulant response matrix.
    N = 512
    N2 = N // 2
    S = np.zeros((N2, N))
    D = np.zeros((N2, N))
    S[np.arange(N2), 2 * np.arange(N2)] = 1.0
    D[np.arange(N2), 2 * np.arange(N2) + 1] = 1.0
    for st in wt.steps:
        src = D if st.kind == PREDICT else S
        acc = np.zeros_like(src)
        for k, c in enumerate(st.coef):
            # roll(src, sh)[i] = src[i - sh] with sh = shift - k
            acc += c * np.roll(src, st.shift - k, axis=0)
        if st.kind == PREDICT:
            S = S - acc
        else:
            D = D - acc
    S *= wt.norm1
    D *= wt.norm2
    k0 = N2 // 2

    def band(M):
        row = M[k0]
        nz = np.nonzero(np.abs(row) > 0.0)[0]
        return nz - 2 * k0, row[nz]

    ds, cs = band(S)
    dd, cd = band(D)
    return ds, cs, dd, cd


def _band_reach(wt):
    ds, _, dd, _ = level_bands(wt)
    deltas = np.concatenate([ds, dd])
    return int(-deltas.min()), int(deltas.max())


def _w_row(wt, dtype):
    """(512, 256) weight block: window lanes [256j - 128, 256j + 384)
    -> output lanes [s-block j | d-block j] (128 + 128)."""
    ds, cs, dd, cd = level_bands(wt)
    W = np.zeros((_WIN, 256), np.float64)
    for o in range(128):
        for delta, c in zip(ds, cs):
            W[_HN + 2 * o + delta, o] += c
        for delta, c in zip(dd, cd):
            W[_HN + 2 * o + delta, 128 + o] += c
    return jnp.asarray(W.astype(dtype))


def _w_col(wt, tm, hm, dtype):
    """(tm, tm + 2hm) weight block: halo-extended rows -> interior
    [a-rows | d-rows] (the quadrant row split)."""
    ds, cs, dd, cd = level_bands(wt)
    ext = tm + 2 * hm
    W = np.zeros((tm, ext), np.float64)
    for r in range(tm // 2):
        for delta, c in zip(ds, cs):
            W[r, hm + 2 * r + delta] += c
        for delta, c in zip(dd, cd):
            W[tm // 2 + r, hm + 2 * r + delta] += c
    return jnp.asarray(W.astype(dtype))


def _plan(m: int, n: int, wt, dtype):
    if np.dtype(dtype) != np.dtype(np.float32):
        return None
    lo, hi = _band_reach(wt)
    if max(lo, hi) > 120:     # must fit the 128-lane window margins
        return None
    hm = roundup(max(lo, hi, 1), 8)
    tn = next((c for c in (2048, 1024, 512, 256) if n % c == 0), None)
    if tn is None or n % _HN or n // _HN < 3:
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
    return tm, tn, hm


def mxu_ok(m: int, n: int, wt, dtype) -> bool:
    return _plan(m, n, wt, dtype) is not None


def _mxu_mode() -> str:
    """f32 emulation strategy for the MXU dots.

    The MXU multiplies in bfloat16; Mosaic exposes only DEFAULT (1 bf16
    pass, ~2^-9 relative error — unacceptable for the f32 API) and
    HIGHEST (fp32 contract, 6 passes, measured ~5x the DEFAULT dot
    cost).  ``split3`` (default here) is the classical 3-pass bf16
    decomposition a_hi@w_hi + a_hi@w_lo + a_lo@w_hi accumulated in f32 —
    ~2^-17 relative error at 3 DEFAULT-dot cost.  Override with
    WAVELETS_TPU_MXU_PREC in {split3, highest, bf16}.
    """
    import os
    return os.environ.get("WAVELETS_TPU_MXU_PREC", "split3")


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_f32(a_pair, w_pair, mode):
    """dot(a, w) with f32-quality accumulation on the bf16 MXU."""
    a, (a_hi, a_lo) = a_pair
    w, (w_hi, w_lo) = w_pair
    if mode == "highest":
        return jnp.dot(a, w, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if mode == "bf16":
        return jnp.dot(a, w, preferred_element_type=jnp.float32)
    return (jnp.dot(a_hi, w_hi, preferred_element_type=jnp.float32)
            + jnp.dot(a_hi, w_lo, preferred_element_type=jnp.float32)
            + jnp.dot(a_lo, w_hi, preferred_element_type=jnp.float32))


def _pair(a, mode):
    if mode == "split3":
        return a, _split_bf16(a)
    return a, (None, None)


def _mxu_kernel(*refs, nj, tm, hm, mode):
    ins, wr_ref, wc_ref = refs[:9], refs[9], refs[10]
    outs = refs[11:]
    nw, nn, ne, ww, cc, ee, sw, ss, se = ins
    top = jnp.concatenate([nw[:], nn[:], ne[:]], axis=1)
    mid = jnp.concatenate([ww[:], cc[:], ee[:]], axis=1)
    bot = jnp.concatenate([sw[:], ss[:], se[:]], axis=1)
    ext = jnp.concatenate([top, mid, bot], axis=0)   # (tm + 2hm, tn + 256)

    wr = _pair(wr_ref[:], mode)
    ext_p = _pair(ext, mode)

    def win(p, j):
        a, (hi, lo) = p
        sl = (slice(None), slice(256 * j, 256 * j + _WIN))
        return (a[sl], ((hi[sl], lo[sl]) if hi is not None else (None, None)))

    pieces = [_dot_f32(win(ext_p, j), wr, mode) for j in range(nj)]
    S = jnp.concatenate([p[:, :128] for p in pieces], axis=1)
    D = jnp.concatenate([p[:, 128:] for p in pieces], axis=1)
    V = jnp.concatenate([S, D], axis=1)              # (tm + 2hm, tn)

    Y = _dot_f32(_pair(wc_ref[:], mode), _pair(V, mode), mode)
    tm2 = tm // 2
    half = V.shape[1] // 2
    outs[0][:] = Y[:tm2, :half]
    outs[1][:] = Y[:tm2, half:]
    outs[2][:] = Y[tm2:, :half]
    outs[3][:] = Y[tm2:, half:]


def mxu_level_fw_quads(x, wt):
    """One forward 2-D level -> (ll, lh, hl, hh) via two banded matmuls."""
    m, n = x.shape
    tm, tn, hm = _plan(m, n, wt, x.dtype)
    nj = tn // 256
    wr = _w_row(wt, x.dtype)
    wc = _w_col(wt, tm, hm, x.dtype)
    qshape = jax.ShapeDtypeStruct((m // 2, n // 2), x.dtype)
    qspec = pl.BlockSpec((tm // 2, tn // 2), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    in_specs = _halo_in_specs(m, n, tm, tn, hm, _HN) + [
        pl.BlockSpec((_WIN, 256), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, tm + 2 * hm), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        partial(_mxu_kernel, nj=nj, tm=tm, hm=hm, mode=_mxu_mode()),
        grid=(m // tm, n // tn),
        in_specs=in_specs,
        out_specs=(qspec,) * 4,
        out_shape=(qshape,) * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(*([x] * 9), wr, wc)
