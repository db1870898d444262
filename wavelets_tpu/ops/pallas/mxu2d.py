"""MXU (systolic-array) formulation of one fused 2-D DWT level.

Round-2 measurements on v5e (BENCHMARKS.md) showed the fused VPU level
kernel (fused2d.py) is compute-bound, not bandwidth-bound; Mosaic's VPU
elementwise throughput is ~3-4x below XLA's on the same chip, while the
measured in-kernel matmul rate is ~160 TFLOP/s (f32 split) — two orders
of magnitude above the VPU rate.

Round-3 correction to the round-2 overlap model: Mosaic's automatic
grid pipeline DOES overlap block DMA with MXU dots (time = max(DMA,
compute), verified in isolation by benchmarks/ab/overlap_probe.py — the
round-2 "exactly additive" readings were VPU-chain-specific).  For this
kernel the f32 residual above the DMA floor is exactly the two extra
bf16-split dot passes (the MXU is busy; dots cannot hide under dots),
and the bf16-storage residual is compute glue vs a HALVED floor — see
BENCHMARKS.md round-3 for the level-1 decomposition.

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

__all__ = ["level_bands", "synthesis_bands", "mxu_ok", "mxu_level_fw_quads",
           "mxu_inv_ok", "mxu_inv_quads", "mxu_inv_packed",
           "mxu_packed_ok", "mxu_level_fw_packed",
           "mxu_level_fw_packed_first"]

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


def _w_row(wt, dtype, gl=256, m=_HN):
    """(gl + 2m, gl) weight block: window lanes
    [gl·j - m, gl·j + gl + m) -> output lanes
    [s-block (gl/2) | d-block (gl/2)].

    ``gl`` is the output-group lane count; the dense-window FLOP cost is
    (gl + 2m) multiplies PER OUTPUT LANE, so smaller groups do strictly
    less MXU work (gl=128, m=32 -> K=192 vs gl=256 -> K=320) at the cost
    of more, narrower dots.  ``m`` is the lane margin (see
    _row_margin)."""
    ds, cs, dd, cd = level_bands(wt)
    W = np.zeros((gl + 2 * m, gl), np.float64)
    for o in range(gl // 2):
        for delta, c in zip(ds, cs):
            W[m + 2 * o + delta, o] += c
        for delta, c in zip(dd, cd):
            W[m + 2 * o + delta, gl // 2 + o] += c
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


def _mxu_dtype_ok(dtype) -> bool:
    """f32 (split-emulated dots) or bf16 (native 1-pass dots: the MXU
    path needs NO lane rolls, so it avoids the bitcast-roll kernels that
    crash this toolchain at bf16 — this is the safe bf16 device route)."""
    d = np.dtype(dtype)
    return d == np.dtype(np.float32) or d == np.dtype(jnp.bfloat16)


def _mode_for(dtype) -> str:
    """bf16 arrays use the native 1-pass dot (error ~2^-9 ≈ the dtype's
    own epsilon); f32 uses the configured split emulation."""
    if np.dtype(dtype) == np.dtype(jnp.bfloat16):
        return "bf16"
    return _mxu_mode()


def _plan(m: int, n: int, wt, dtype):
    if not _mxu_dtype_ok(dtype):
        return None
    lo, hi = _band_reach(wt)
    if max(lo, hi) > 120:     # must fit the 128-lane window margins
        return None
    from .common import halo_granule
    import os
    hm = roundup(max(lo, hi, 1), halo_granule(dtype))
    # wider tiles amortize the fixed 128-lane halo columns (12.5% extra
    # read at tn=2048 vs 6.25% at 4096 — the halo re-read is the largest
    # DMA term above the 2-pass model); 4096 is the DEFAULT first ladder
    # candidate, guarded by the measured VMEM boundary below;
    # WAVELETS_TPU_MXU_TN prepends a preferred width.
    tn_env = os.environ.get("WAVELETS_TPU_MXU_TN")
    # 8192 leads the ladder for bf16 (no-split bodies fit its extended
    # tile; fw bf16 2.75-2.88 -> 2.59-2.73 ms, bit-exact, round 5); the
    # f32 gate below drops it automatically
    cands = (8192, 4096, 2048, 1024, 512, 256)
    if tn_env:   # preferred width, falling back to the standard ladder
        cands = (int(tn_env),) + cands
    tn = next((c for c in cands if n % c == 0), None)
    # torus-wrapped halo index maps are correct for any granule count
    # >= 2 (left of granule 0 is the last granule)
    if tn is None or n % _HN or n // _HN < 2:
        return None
    # taller tiles amortize the col-dot halo rows and grid overhead but
    # grow the VMEM live set — 128 is the validated default for BOTH
    # dtypes at the tn=4096 tiles (the old bf16 tm=256 preference was a
    # tn=2048 measurement; at tn=4096 interleaved A/Bs read tm=128
    # equal-or-faster: 6.90 vs 7.07 ms congested, 5.42 vs 5.80 at a
    # faster window).  WAVELETS_TPU_MXU_TM overrides.
    import os
    tm = int(os.environ.get("WAVELETS_TPU_MXU_TM", "128"))
    while tm >= 2 * hm:
        if m % tm == 0 and tm % hm == 0:
            break
        tm //= 2
    else:
        return None
    if m // hm < 2:
        return None
    # VMEM feasibility, calibrated on the measured compile boundary: the
    # scoped-vmem OOM line falls between extended-tile sizes 2.51 MB
    # (f32 144x4352 / 272x2304 and bf16 288x4352 all compile) and
    # 2.65 MB (f32 272x4352 and bf16 576x2304 both OOM the 16 MB scoped
    # limit).  Drop to the next narrower tn when over the line instead
    # of failing at compile time.
    itemsize = np.dtype(dtype).itemsize
    # the 2.55 MB extended-tile boundary was measured on f32 SPLIT
    # bodies (hi/lo pairs double the live set per tile byte); bf16
    # bodies carry no splits, so their boundary sits higher — the
    # round-5 device probes put it between 2.70 MB (hm=16 at tn=8192:
    # compiles, quads + packed) and 3.24 MB (hm=32: OOMs), so the bf16
    # gate is 2.9 MB.  WAVELETS_TPU_MXU_VMEM_KB overrides for probes.
    gate = int(os.environ.get("WAVELETS_TPU_MXU_VMEM_KB", "0")) * 1024
    if not gate:
        gate = 2_550_000 if itemsize >= 4 else 2_900_000
    while tn > 256 and (tm + 2 * hm) * (tn + 256) * itemsize > gate:
        tn //= 2
    if n % tn:
        return None
    return tm, tn, hm


def mxu_ok(m: int, n: int, wt, dtype) -> bool:
    return _plan(m, n, wt, dtype) is not None


def _mxu_mode() -> str:
    """f32 emulation strategy for the MXU dots.

    The MXU multiplies in bfloat16; Mosaic exposes only DEFAULT (1 bf16
    pass, ~2^-9 relative error — unacceptable for the f32 API) and
    HIGHEST (fp32 contract, 6 passes, measured ~5x the DEFAULT dot
    cost).  ``split3`` is the classical 3-pass bf16 decomposition
    a_hi@w_hi + a_hi@w_lo + a_lo@w_hi accumulated in f32 — ~2^-17
    relative error at 3 DEFAULT-dot cost.  ``split3cat`` (default) is
    the same three terms computed as ONE dot on K-concatenated operands
    ([a_hi | a_lo | a_hi] @ [w_hi ; w_hi ; w_lo]): identical FLOPs and
    accuracy class, measured ~8% faster on the full pyramid (5.21 →
    4.81 ms at 8192² L8, 183 GB/s session) — one MXU launch amortizes
    the per-dot pipeline fill that three separate dots pay.  ``high``
    (Precision.HIGH) is NOT lowered by this Mosaic (kept as a probe).
    Override with WAVELETS_TPU_MXU_PREC in
    {split3cat, split3, high, highest, bf16}.
    """
    import os
    return os.environ.get("WAVELETS_TPU_MXU_PREC", "split3cat")


def _sem(n_par: int, n_arb: int = 0):
    """dimension_semantics tuple: the tile axes of these kernels carry no
    cross-step state, so they are declared "parallel" (Mosaic may then
    prefetch/pipeline grid DMA — measured fw 4.88 -> 4.61 ms at 8192² L8,
    bit-identical); only the packed q axis (VMEM stash carried across q)
    must stay "arbitrary".  WAVELETS_TPU_MXU_SEM=arb restores
    all-arbitrary for A/Bs.

    Under forced TPU interpret mode this returns None: the interpreter
    zips the FULL grid (including vmap-prepended axes) against the
    semantics tuple and errors on the length mismatch, while the real
    Mosaic lowering tracks vmapped dims separately and matches the
    semantics against the user grid only."""
    import os
    try:
        from jax._src import config as _jcfg
        if _jcfg.pallas_tpu_interpret_mode_context_manager.value is not None:
            return None
    except Exception:
        pass
    if os.environ.get("WAVELETS_TPU_MXU_SEM") == "arb":
        return pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * (n_par + n_arb))
    return pltpu.CompilerParams(
        dimension_semantics=("parallel",) * n_par + ("arbitrary",) * n_arb)


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
    if mode == "high":
        return jnp.dot(a, w, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGH)
    if mode == "bf16":
        return jnp.dot(a, w, preferred_element_type=jnp.float32)
    if mode == "split3cat":
        A = jnp.concatenate([a_hi, a_lo, a_hi], axis=1)
        W = jnp.concatenate([w_hi, w_hi, w_lo], axis=0)
        return jnp.dot(A, W, preferred_element_type=jnp.float32)
    return (jnp.dot(a_hi, w_hi, preferred_element_type=jnp.float32)
            + jnp.dot(a_hi, w_lo, preferred_element_type=jnp.float32)
            + jnp.dot(a_lo, w_hi, preferred_element_type=jnp.float32))


def _pair(a, mode):
    if mode in ("split3", "split3cat"):
        return a, _split_bf16(a)
    return a, (None, None)


def _row_gl(tn: int) -> int:
    """Output-group lane count of the shared row windows (see _w_row).

    The dense-window K per output lane is gl + 2m, so NARROWER groups do
    strictly fewer MXU FLOPs; gl=128 keeps full 128-lane output tiles
    and cut K 320 -> 192 at m=32.  (The old G=2 / gl=512 direction —
    amortizing margins over wider groups — measured ~0.7-1 ms SLOWER
    than gl=256 despite its K saving; gl=128 measured faster.)
    Override with WAVELETS_TPU_MXU_GL in {128, 256, 512}."""
    import os
    gl = int(os.environ.get("WAVELETS_TPU_MXU_GL", "128"))
    if int(os.environ.get("WAVELETS_TPU_MXU_G", "1")) >= 2:
        gl = 512                     # legacy experiment knob
    while gl > 128 and tn % gl:
        gl //= 2
    return gl


def _row_margin(wt, fw: bool = True) -> int:
    """Lane margin of the shared row windows.

    The band reach is tiny (<= ~24 lanes for every stock wavelet), so a
    narrow margin instead of the full 128-lane halo granule cuts the
    row-dot K sharply.  Round-3 retune at the tn=4096 default tiles:
    the FORWARD wins at a 16-lane granule (16k² L8 cdf97 f32 9.07 ->
    8.49 ms, bf16 6.36 -> 5.74 — sol 1.02/1.08 at 332-348 GB/s
    sessions) while the INVERSE loses there (9.65 -> 10.67; its
    [s-window | d-window] lane handling pays for sub-32 alignment), so
    the granule is direction-dependent: 16 forward, 32 inverse.
    WAVELETS_TPU_MXU_MARGIN overrides both (=128 restores halo-granule
    windows)."""
    import os
    ov = os.environ.get("WAVELETS_TPU_MXU_MARGIN")
    if ov:
        return int(ov)
    lo, hi = _band_reach(wt)
    lo2, hi2 = _syn_reach(wt)
    return min(128, roundup(max(lo, hi, lo2, hi2, 1), 16 if fw else 32))


def _v5() -> bool:
    """v1's S/D/V assembly chain collapsed to ONE concat (the only v4
    change that does not involve batched window stacking).  Part of the
    round-5 glue probes (benchmarks/ab/body_v4.py)."""
    import os
    return os.environ.get("WAVELETS_TPU_MXU_BODY", "v1") == "v5"


def _mxu_body_version() -> str:
    """Forward compute-body structure.

    ``v1`` materializes the halo-extended tile, the row-dot intermediate
    V, and the full Y before slicing quadrants — ~4 extra VPU passes
    over the tile per grid step.  Round-3 measurement (benchmarks/ab/
    level1_decomp.py) showed the kernel fully overlaps grid DMA with MXU
    compute, so those VPU passes ARE the critical path at fast sessions.
    Measured verdicts at 16k² level-1 (342-358 GB/s sessions): ``v1``
    7.69-7.91 ms, ``v2`` (per-window fused col dots + narrow writes)
    10.6 ms, ``v3`` (v1 structure minus the ext concat / V chain)
    8.60 f32 but -0.14 bf16 — many small ops lose to few big ones on
    this VPU, and the removable concats were not the critical path.
    ``v1`` stays the default; v2/v3 are kept as measured negative
    results reachable via WAVELETS_TPU_MXU_BODY for future toolchains.
    """
    import os
    return os.environ.get("WAVELETS_TPU_MXU_BODY", "v1")


def _fw_body_v2(ins, wr_ref, wc2_ref, emit, *, tm, hm, mode, gl, m=_HN):
    """Per-window fused forward body.

    For each lane window j: row-dot the mid band and the (2hm)-row
    top|bottom halo band, stack the two result pieces, col-dot with the
    [mid-rows | halo-rows]-ordered column weight (``_w_col2``), and
    ``emit(q, c0, val)`` the four quadrant column blocks at output-lane
    offset c0 (write-combined to 128-lane chunks).  Nothing tile-sized
    is materialized beyond the bf16 splits of the input bands."""
    nw, nn, ne, ww, cc, ee, sw, ss, se = (r[:] for r in ins)
    tn = cc.shape[1]
    nj = tn // gl
    w_ = gl + 2 * m
    off = _HN - m
    dt = cc.dtype
    split = mode in ("split3", "split3cat")

    # (2hm, *) top|bottom halo bands — tiny row concats
    tb_w = jnp.concatenate([nw, sw], axis=0)
    tb_c = jnp.concatenate([nn, ss], axis=0)
    tb_e = jnp.concatenate([ne, se], axis=0)

    if split:
        band = {"m": tuple(map(_split_bf16, (ww, cc, ee))),
                "tb": tuple(map(_split_bf16, (tb_w, tb_c, tb_e)))}
    else:
        band = {"m": ((ww, None), (cc, None), (ee, None)),
                "tb": ((tb_w, None), (tb_c, None), (tb_e, None))}

    wr = wr_ref[:]
    wc2 = wc2_ref[:]
    if mode == "split3cat":
        wrh, wrl = _split_bf16(wr)
        wr_cat = jnp.concatenate([wrh, wrh, wrl], axis=0)
        wch, wcl = _split_bf16(wc2)
        # pairs with P = [p_hi; p_lo; p_hi]: wch@p_hi + wch@p_lo + wcl@p_hi
        wc_cat = jnp.concatenate([wch, wch, wcl], axis=1)
    elif mode == "split3":
        wr_s = _split_bf16(wr)
        wc_s = _split_bf16(wc2)

    def lane_win(parts, c0, k):
        """Window [c0, c0+w_) of a (w|c|e) band triple, component k."""
        pw, pc, pe = (p[k] for p in parts)
        ps = []
        if c0 < _HN:
            ps.append(pw[:, c0:min(_HN, c0 + w_)])
        s = max(c0, _HN) - _HN
        e = min(c0 + w_, _HN + tn) - _HN
        if e > s:
            ps.append(pc[:, s:e])
        if c0 + w_ > _HN + tn:
            ps.append(pe[:, :c0 + w_ - _HN - tn])
        return ps[0] if len(ps) == 1 else jnp.concatenate(ps, axis=1)

    def row_dot(parts, c0):
        if mode == "split3cat":
            ah = lane_win(parts, c0, 0)
            al = lane_win(parts, c0, 1)
            A = jnp.concatenate([ah, al, ah], axis=1)
            return jnp.dot(A, wr_cat, preferred_element_type=jnp.float32)
        if mode == "split3":
            ah = lane_win(parts, c0, 0)
            al = lane_win(parts, c0, 1)
            return (jnp.dot(ah, wr_s[0], preferred_element_type=jnp.float32)
                    + jnp.dot(ah, wr_s[1], preferred_element_type=jnp.float32)
                    + jnp.dot(al, wr_s[0], preferred_element_type=jnp.float32))
        a = lane_win(parts, c0, 0)
        if mode == "highest":
            return jnp.dot(a, wr, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        return jnp.dot(a, wr, preferred_element_type=jnp.float32)

    def col_dot(piece):
        if mode == "split3cat":
            ph, plo = _split_bf16(piece)
            P = jnp.concatenate([ph, plo, ph], axis=0)
            return jnp.dot(wc_cat, P, preferred_element_type=jnp.float32)
        if mode == "split3":
            ph, plo = _split_bf16(piece)
            return (jnp.dot(wc_s[0], ph, preferred_element_type=jnp.float32)
                    + jnp.dot(wc_s[1], ph, preferred_element_type=jnp.float32)
                    + jnp.dot(wc_s[0], plo, preferred_element_type=jnp.float32))
        p = piece.astype(dt)
        if mode == "highest":
            return jnp.dot(wc2, p, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        return jnp.dot(wc2, p, preferred_element_type=jnp.float32)

    half = gl // 2
    tm2 = tm // 2
    pend = [None] * 4   # write-combining stage for 64-lane halves

    def put(q, j, val):
        if half >= 128:
            emit(q, half * j, val)
        elif j % 2 == 0:
            pend[q] = val
        else:
            emit(q, half * (j - 1),
                 jnp.concatenate([pend[q], val], axis=1))

    for j in range(nj):
        c0 = gl * j + off
        pm = row_dot(band["m"], c0)         # (tm, gl) f32
        ptb = row_dot(band["tb"], c0)       # (2hm, gl) f32
        piece = jnp.concatenate([pm, ptb], axis=0)
        y = col_dot(piece).astype(dt)       # (tm, gl): [a|d] x [s|d]
        put(0, j, y[:tm2, :half])
        put(1, j, y[:tm2, half:])
        put(2, j, y[tm2:, :half])
        put(3, j, y[tm2:, half:])


def _fw_quads_body_v3(ins, wr_ref, wc2_ref, *, tm, hm, mode, gl, m=_HN):
    """v1's big-dot structure with the tile-sized glue passes removed.

    Differences from v1 (kept: one col dot over the full lane width, one
    row dot per 128/256-lane window):
    * no halo-extended tile is materialized — the row dots run per row
      band (the (tm)-row mid band sliced straight from the ww/cc/ee
      refs; a (2hm)-row top|bottom band from tiny row concats), and the
      column dot splits its K dimension into [mid | top|bottom] chunks
      against the ``_w_col2`` column order;
    * V is assembled with ONE 32-piece concat in [S | D] order instead
      of the S-concat + D-concat + V-concat chain;
    * the f32 column dot uses split3 (three big dots) instead of
      split3cat so V is never triplicated along K.
    v2 (per-window fused col dots + narrow output writes) measured ~3 ms
    SLOWER than v1 at 16k² — many narrow ops lose to few big ones; v3
    keeps op sizes and only deletes passes."""
    nw, nn, ne, ww, cc, ee, sw, ss, se = (r[:] for r in ins)
    tn = cc.shape[1]
    nj = tn // gl
    w_ = gl + 2 * m
    off = _HN - m
    dt = cc.dtype
    split = mode in ("split3", "split3cat")

    tb_w = jnp.concatenate([nw, sw], axis=0)
    tb_c = jnp.concatenate([nn, ss], axis=0)
    tb_e = jnp.concatenate([ne, se], axis=0)

    if split:
        band_m = tuple(map(_split_bf16, (ww, cc, ee)))
        band_tb = tuple(map(_split_bf16, (tb_w, tb_c, tb_e)))
    else:
        band_m = ((ww, None), (cc, None), (ee, None))
        band_tb = ((tb_w, None), (tb_c, None), (tb_e, None))

    wr = wr_ref[:]
    wc2 = wc2_ref[:]
    if mode == "split3cat":
        wrh, wrl = _split_bf16(wr)
        wr_cat = jnp.concatenate([wrh, wrh, wrl], axis=0)

    def lane_win(parts, c0, k):
        pw, pc, pe = (p[k] for p in parts)
        ps = []
        if c0 < _HN:
            ps.append(pw[:, c0:min(_HN, c0 + w_)])
        s = max(c0, _HN) - _HN
        e = min(c0 + w_, _HN + tn) - _HN
        if e > s:
            ps.append(pc[:, s:e])
        if c0 + w_ > _HN + tn:
            ps.append(pe[:, :c0 + w_ - _HN - tn])
        return ps[0] if len(ps) == 1 else jnp.concatenate(ps, axis=1)

    def row_dot(parts, c0):
        if mode == "split3cat":
            ah = lane_win(parts, c0, 0)
            al = lane_win(parts, c0, 1)
            A = jnp.concatenate([ah, al, ah], axis=1)
            return jnp.dot(A, wr_cat, preferred_element_type=jnp.float32)
        if mode == "split3":
            ah = lane_win(parts, c0, 0)
            al = lane_win(parts, c0, 1)
            wrh, wrl = _split_bf16(wr)
            return (jnp.dot(ah, wrh, preferred_element_type=jnp.float32)
                    + jnp.dot(ah, wrl, preferred_element_type=jnp.float32)
                    + jnp.dot(al, wrh, preferred_element_type=jnp.float32))
        a = lane_win(parts, c0, 0)
        if mode == "highest":
            return jnp.dot(a, wr, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        return jnp.dot(a, wr, preferred_element_type=jnp.float32)

    half = gl // 2
    pm, ptb = [], []
    for j in range(nj):
        c0 = gl * j + off
        pm.append(row_dot(band_m, c0))
        ptb.append(row_dot(band_tb, c0))

    def assemble(ps):
        # one [S | D]-ordered concat of the 2*nj piece halves
        return jnp.concatenate([p[:, :half] for p in ps]
                               + [p[:, half:] for p in ps], axis=1)

    V_m = assemble(pm)                                # (tm, tn) f32
    V_tb = assemble(ptb)                              # (2hm, tn) f32
    wc_m, wc_tb = wc2[:, :tm], wc2[:, tm:]

    def col_dot(wc_part, V):
        if split:   # split3-style: V is split once, never K-triplicated
            vh, vl = _split_bf16(V)
            wh, wl = _split_bf16(wc_part)
            return (jnp.dot(wh, vh, preferred_element_type=jnp.float32)
                    + jnp.dot(wh, vl, preferred_element_type=jnp.float32)
                    + jnp.dot(wl, vh, preferred_element_type=jnp.float32))
        v = V.astype(dt)
        if mode == "highest":
            return jnp.dot(wc_part, v, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        return jnp.dot(wc_part, v, preferred_element_type=jnp.float32)

    Y = (col_dot(wc_m, V_m) + col_dot(wc_tb, V_tb)).astype(dt)
    tm2 = tm // 2
    hf = tn // 2
    return (Y[:tm2, :hf], Y[:tm2, hf:], Y[tm2:, :hf], Y[tm2:, hf:])


def _fw_quads_body_v4(ins, wr_ref, wc_ref, *, tm, mode, gl, m=_HN, hm=None,
                      blk=0):
    """v1 with the per-window row-dot storm replaced by ONE batched dot.

    v1 pays, per grid step, nj (= tn/gl) small row dots each preceded by
    a split3cat K-concat of its window — ~nj×(tm+2hm, 3·(gl+2m)) of VMEM
    concat writes plus nj MXU pipeline fills.  v4 stacks the window
    slices of the (already split) extended tile along M into one
    (nj·(tm+2hm), gl+2m) operand and runs THREE big split3 dots (no
    K-cat at all; bf16 runs one).  The S/D/V assembly chain (S concat +
    D concat + V concat = 2 tile passes) also collapses to a single
    [all-s-halves | all-d-halves] concat (1 pass).  Column stage
    identical to v1 (blocked or full).  Round-5 device A/Bs:
    benchmarks/ab/body_v4.py."""
    nw, nn, ne, ww, cc, ee, sw, ss, se = ins
    top = jnp.concatenate([nw[:], nn[:], ne[:]], axis=1)
    mid = jnp.concatenate([ww[:], cc[:], ee[:]], axis=1)
    bot = jnp.concatenate([sw[:], ss[:], se[:]], axis=1)
    ext = jnp.concatenate([top, mid, bot], axis=0)   # (tm + 2hm, tn + 256)
    tn = ext.shape[1] - 256
    rows = ext.shape[0]
    nj = tn // gl
    w_ = gl + 2 * m
    off = _HN - m
    split = mode in ("split3", "split3cat")

    def stackw(E):
        return jnp.concatenate(
            [E[:, gl * j + off: gl * j + off + w_] for j in range(nj)],
            axis=0)                                  # (nj·rows, w_)

    wr = wr_ref[:]
    if split:
        eh, el = _split_bf16(ext)
        A2h, A2l = stackw(eh), stackw(el)
        wrh, wrl = _split_bf16(wr)
        Y2 = (jnp.dot(A2h, wrh, preferred_element_type=jnp.float32)
              + jnp.dot(A2h, wrl, preferred_element_type=jnp.float32)
              + jnp.dot(A2l, wrh, preferred_element_type=jnp.float32))
    elif mode == "highest":
        Y2 = jnp.dot(stackw(ext), wr, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    else:
        Y2 = jnp.dot(stackw(ext), wr, preferred_element_type=jnp.float32)
    half = gl // 2
    V = jnp.concatenate(
        [Y2[k * rows:(k + 1) * rows, :half] for k in range(nj)]
        + [Y2[k * rows:(k + 1) * rows, half:] for k in range(nj)],
        axis=1).astype(ext.dtype)                    # (rows, tn), [S | D]

    if blk:
        Y = _col_dot_blocked(_pair(wc_ref[:], mode), _pair(V, mode),
                             mode=mode, q=blk, hm=hm, tm=tm, dt=ext.dtype)
    else:
        Y = _dot_f32(_pair(wc_ref[:], mode), _pair(V, mode), mode)
        Y = Y.astype(ext.dtype)
    tm2 = tm // 2
    hf = tn // 2
    return (Y[:tm2, :hf], Y[:tm2, hf:], Y[tm2:, :hf], Y[tm2:, hf:])


def _fw_quads_body_v7(ins, wr_ref, wc_ref, *, tm, mode, gl, m=_HN, hm=None,
                      blk=0, nseq=2):
    """v1 processed in ``nseq`` SEQUENCED lane segments.

    Each segment materializes only its own extended band (ext rows x
    (tn/nseq + 256) lanes), its split pair, V segment, and Y segment —
    the inverse's round-3 sequenced-col-dot trick applied to the
    forward, so the per-step live set shrinks ~nseq-fold and wider tn
    tiles fit the f32 VMEM envelope (tn=8192 halves the 128-lane halo
    re-read exactly as it did for the inverse).  Per-segment math is
    v1's verbatim; segment h covers output lanes [h*tn/nseq,
    (h+1)*tn/nseq) and returns quadrant column stripes."""
    nw, nn, ne, ww, cc, ee, sw, ss, se = ins
    tn = cc.shape[1]
    seg_w = tn // nseq
    if seg_w % gl or seg_w < 256:    # segments must hold whole windows
        return _fw_quads_body(ins, wr_ref, wc_ref, tm=tm, mode=mode,
                              gl=gl, m=m, hm=hm, blk=blk)
    nj_seg = seg_w // gl
    w_ = gl + 2 * m
    off = _HN - m
    dt = cc.dtype
    split = mode in ("split3", "split3cat")
    wr = _pair(wr_ref[:], mode)
    wc_p = _pair(wc_ref[:], mode)
    quads = [[], [], [], []]
    tm2 = tm // 2
    for h in range(nseq):
        lane0 = h * seg_w           # ext-coord start of this segment

        def band(wst, cnt, est):
            # lanes [lane0, lane0 + seg_w + 256) of the (128|tn|128)
            # [w | c | e] triple
            parts = []
            if lane0 < 128:
                parts.append(wst[:, lane0:])
            s = max(lane0 - 128, 0)
            e = min(lane0 + seg_w + 128, tn)
            parts.append(cnt[:, s:e])
            if lane0 + seg_w + 128 > tn:
                parts.append(est[:, :lane0 + seg_w + 256 - 128 - tn])
            return parts[0] if len(parts) == 1 else \
                jnp.concatenate(parts, axis=1)

        top = band(nw[:], nn[:], ne[:])
        mid = band(ww[:], cc[:], ee[:])
        bot = band(sw[:], ss[:], se[:])
        ext = jnp.concatenate([top, mid, bot], axis=0)
        ext_p = _pair(ext, mode)

        def win(p, j):
            a, (hi, lo) = p
            sl = (slice(None), slice(gl * j + off, gl * j + off + w_))
            return (a[sl],
                    ((hi[sl], lo[sl]) if hi is not None else (None, None)))

        pieces = [_dot_f32(win(ext_p, j), wr, mode) for j in range(nj_seg)]
        S = jnp.concatenate([p[:, : gl // 2] for p in pieces], axis=1)
        D = jnp.concatenate([p[:, gl // 2:] for p in pieces], axis=1)
        V = jnp.concatenate([S, D], axis=1).astype(dt)
        if blk:
            Y = _col_dot_blocked(wc_p, _pair(V, mode), mode=mode, q=blk,
                                 hm=hm, tm=tm, dt=dt)
        else:
            Y = _dot_f32(wc_p, _pair(V, mode), mode).astype(dt)
        half = seg_w // 2
        quads[0].append(Y[:tm2, :half])
        quads[1].append(Y[:tm2, half:])
        quads[2].append(Y[tm2:, :half])
        quads[3].append(Y[tm2:, half:])
    return tuple(jnp.concatenate(q, axis=1) for q in quads)


def _col_blk(dtype=None, fw: bool = True) -> int:
    """Block size q (in output POSITIONS) of the block-shared column dot.

    The dense column weight burns K = tm + 2hm multiplies per output
    element because the [a-rows | d-rows] quadrant split makes every
    output read the whole extended tile.  But a block of 2q output rows
    (q scaling + q detail POSITIONS) reads only ext rows
    [2bq, 2(b+1)q + 2hm) — and by shift invariance every block shares
    ONE (2q, 2q + 2hm) weight, which is exactly _w_col(wt, 2q, hm).  At
    tm=128/hm=8/q=32 the col-dot K per element falls 144 -> 80 (the f32
    split triples both).  0 disables (the round-3 full-width col dot).

    Round-4 device A/Bs (benchmarks/ab/col_blk.py, bf16_pipeline.py,
    the f32 pipeline probes recorded in BENCHMARKS.md; 635-657 GB/s
    sessions), full-pipeline 16k² L8 cdf97:

      forward: f32 5.90 -> 5.46 ms @ q=16 (sol 0.825, clears the
        BASELINE bar); bf16 3.24 -> 2.87 @ q=16 (sol 0.759) — the DEEP
        levels gain most (their tiles make the full-width col dot
        relatively costlier).
      inverse: f32 6.00 -> 7.06 @ q=16 (LOSES — the split triples the
        small block dots' narrow-M inefficiency); bf16 6.12 -> 3.82
        level-1 @ q=32 (full idwt2 2.98 ms, sol 0.72).

    Defaults from that data: forward -> 16 (both dtypes), inverse ->
    32 bf16 / 0 f32.  Blocked results differ from q=0 by f32
    reassociation only (3e-5 class; bf16 exact) — an earlier
    'miscompile' reading was an uninitialized-LL-quadrant comparison
    artifact, retracted in BENCHMARKS.md.  Override with
    WAVELETS_TPU_MXU_COLBLK in {0, 16, 32, 64}; the per-direction
    WAVELETS_TPU_MXU_COLBLK_FW / _INV take precedence (ADVICE r4: the
    shared knob forces one block size onto four distinct paths whose
    measured optima differ — e.g. q=16 is the fw default but an 18%
    regression on the f32 2-D inverse).  Interpret-mode equivalence is
    pinned by tests/test_mxu2d.py::test_mxu_col_blocked_*."""
    import os
    ov = os.environ.get("WAVELETS_TPU_MXU_COLBLK_FW" if fw
                        else "WAVELETS_TPU_MXU_COLBLK_INV")
    if ov is None:
        ov = os.environ.get("WAVELETS_TPU_MXU_COLBLK")
    if ov is not None:
        return int(ov)
    if fw:
        return 16
    if dtype is not None and np.dtype(dtype) == np.dtype(jnp.bfloat16):
        return 32
    return 0


def _blk_mode(mode: str) -> str:
    """Dot mode for the small block-shared dots: split3cat's K-concat
    trick amortizes pipeline fill on BIG dots and is pointless on (2q,
    2q+2hm) blocks, so blocked dots use the plain 3-dot split (measured
    with it: the fw f32 pipeline win above)."""
    return "split3" if mode == "split3cat" else mode


def _inv_col_dot_blocked(wc_pair, E_pair, *, mode, blk, hm2):
    """Block-shared synthesis col dot: output rows [2bq, 2bq + 2q) (q
    interleaved position pairs) read only ext rows [bq, bq + q + 2hm2),
    and every block shares the ONE (2q, q + 2hm2) weight (= _w_col_inv
    at tm=2q); K per output element falls from tm/2 + 2hm2 to q + 2hm2.
    Returns the per-block piece list (concatenate along rows)."""
    Ea, (Eh, El) = E_pair
    nb = (Ea.shape[0] - 2 * hm2) // blk
    pieces = []
    for b in range(nb):
        sl = slice(b * blk, b * blk + blk + 2 * hm2)
        Eb = (Ea[sl], ((Eh[sl], El[sl]) if Eh is not None
                       else (None, None)))
        pieces.append(_dot_f32(wc_pair, Eb, _blk_mode(mode)))
    return pieces


def _col_dot_blocked(wcq_pair, V_pair, *, mode, q, hm, tm, dt):
    """Column transform as tm/(2q) block dots against the shared
    (2q, 2q + 2hm) weight; returns Y (tm, tn) in quadrant row order
    [a-rows | d-rows] (matching the full-width col dot)."""
    V, (Vh, Vl) = V_pair
    nb = tm // (2 * q)
    ya, yd = [], []
    for b in range(nb):
        sl = slice(2 * b * q, 2 * (b + 1) * q + 2 * hm)
        Vb = (V[sl], ((Vh[sl], Vl[sl]) if Vh is not None else (None, None)))
        Yb = _dot_f32(wcq_pair, Vb, _blk_mode(mode))      # (2q, tn) f32
        ya.append(Yb[:q])
        yd.append(Yb[q:])
    return jnp.concatenate(ya + yd, axis=0).astype(dt)


def _fw_quads_body(ins, wr_ref, wc_ref, *, tm, mode, gl, m=_HN, hm=None,
                   blk=0):
    """Shared forward compute: 9 halo refs + weight refs -> the four
    (tm/2, tn/2) quadrant tiles.  With ``blk`` > 0 the column transform
    runs as block-shared dots (see _col_blk) and ``wc_ref`` holds the
    (2*blk, 2*blk + 2hm) shared block weight instead of the full
    (tm, tm + 2hm) one."""
    nw, nn, ne, ww, cc, ee, sw, ss, se = ins
    top = jnp.concatenate([nw[:], nn[:], ne[:]], axis=1)
    mid = jnp.concatenate([ww[:], cc[:], ee[:]], axis=1)
    bot = jnp.concatenate([sw[:], ss[:], se[:]], axis=1)
    ext = jnp.concatenate([top, mid, bot], axis=0)   # (tm + 2hm, tn + 256)
    tn = ext.shape[1] - 256

    wr = _pair(wr_ref[:], mode)
    ext_p = _pair(ext, mode)
    w_ = gl + 2 * m
    off = _HN - m       # ext offset of window j = gl·j + off

    def win(p, j):
        a, (hi, lo) = p
        sl = (slice(None), slice(gl * j + off, gl * j + off + w_))
        return (a[sl], ((hi[sl], lo[sl]) if hi is not None else (None, None)))

    pieces = [_dot_f32(win(ext_p, j), wr, mode)
              for j in range(tn // gl)]
    # dots accumulate in f32; for bf16 inputs the intermediate V is cast
    # back to the array dtype (mixed-dtype dots don't lower)
    if _v5():
        # one [all-s-halves | all-d-halves] concat instead of the
        # S-concat + D-concat + V-concat chain (saves ~1 tile pass)
        V = jnp.concatenate([p[:, : gl // 2] for p in pieces]
                            + [p[:, gl // 2:] for p in pieces],
                            axis=1).astype(ext.dtype)
    else:
        S = jnp.concatenate([p[:, : gl // 2] for p in pieces], axis=1)
        D = jnp.concatenate([p[:, gl // 2:] for p in pieces], axis=1)
        V = jnp.concatenate([S, D], axis=1).astype(ext.dtype)

    if blk:
        Y = _col_dot_blocked(_pair(wc_ref[:], mode), _pair(V, mode),
                             mode=mode, q=blk, hm=hm, tm=tm, dt=ext.dtype)
    else:
        Y = _dot_f32(_pair(wc_ref[:], mode), _pair(V, mode), mode)
        Y = Y.astype(ext.dtype)
    tm2 = tm // 2
    half = V.shape[1] // 2
    return (Y[:tm2, :half], Y[:tm2, half:],
            Y[tm2:, :half], Y[tm2:, half:])


def _quads_any_body(ins, wr_ref, wc_ref, *, tm, hm, mode, gl, m, body,
                    blk=0):
    if body == "v3":
        return _fw_quads_body_v3(ins, wr_ref, wc_ref, tm=tm, hm=hm,
                                 mode=mode, gl=gl, m=m)
    if body == "v4":
        return _fw_quads_body_v4(ins, wr_ref, wc_ref, tm=tm, mode=mode,
                                 gl=gl, m=m, hm=hm, blk=blk)
    if body in ("v7", "v7q"):
        return _fw_quads_body_v7(ins, wr_ref, wc_ref, tm=tm, mode=mode,
                                 gl=gl, m=m, hm=hm, blk=blk,
                                 nseq=4 if body == "v7q" else 2)
    return _fw_quads_body(ins, wr_ref, wc_ref, tm=tm, mode=mode, gl=gl, m=m,
                          hm=hm, blk=blk)


def _mxu_kernel(*refs, tm, hm, mode, gl, m, body, blk=0):
    ins, wr_ref, wc_ref = refs[:9], refs[9], refs[10]
    outs = refs[11:]
    if body == "v2":
        def emit(q, c0, val):
            outs[q][:, c0:c0 + val.shape[1]] = val
        _fw_body_v2(ins, wr_ref, wc_ref, emit, tm=tm, hm=hm, mode=mode,
                    gl=gl, m=m)
        return
    ll, lh, hl, hh = _quads_any_body(ins, wr_ref, wc_ref, tm=tm, hm=hm,
                                     mode=mode, gl=gl, m=m, body=body,
                                     blk=blk)
    outs[0][:] = ll
    outs[1][:] = lh
    outs[2][:] = hl
    outs[3][:] = hh


def _w_col2(wt, tm, hm, dtype):
    """_w_col with columns reordered to [mid rows (tm) | top (hm) |
    bottom (hm)] — the K order of the v2 body's stacked row-dot pieces."""
    W = _w_col(wt, tm, hm, dtype)
    return jnp.concatenate([W[:, hm:hm + tm], W[:, :hm], W[:, hm + tm:]],
                           axis=1)


def _pick_col_blk(tm: int, hm: int, body: str, dtype) -> int:
    """Validated block size for the block-shared column dot (0 = off):
    blocks must tile tm, slices must stay sublane-granule-aligned, and
    q = tm/2 is the full-width dot itself (allowed — same math, smaller
    weight).  Only the v1/v4/v5/v7 bodies route through it."""
    if body not in ("v1", "v4", "v5", "v7", "v7q"):
        return 0
    q = min(_col_blk(dtype, fw=True), tm // 2)
    from .common import halo_granule
    g = halo_granule(dtype)
    while q >= 8 and (tm % (2 * q) or (2 * q) % g):
        q //= 2
    return q if q >= 8 else 0


def _fw_weights(wt, tm, hm, blk, body, dtype):
    """(wr-builder input stays at the call sites) column weight for the
    selected body: _w_col2 for v2/v3, the shared (2*blk, 2*blk + 2hm)
    block for the blocked v1 col dot, the full (tm, tm + 2hm) otherwise."""
    if body in ("v2", "v3"):
        return _w_col2(wt, tm, hm, dtype)
    if blk:
        return _w_col(wt, 2 * blk, hm, dtype)
    return _w_col(wt, tm, hm, dtype)


def mxu_level_fw_quads(x, wt):
    """One forward 2-D level -> (ll, lh, hl, hh) via two banded matmuls."""
    m, n = x.shape
    tm, tn, hm = _plan(m, n, wt, x.dtype)
    gl = _row_gl(tn)
    mr = _row_margin(wt)
    body = _mxu_body_version()
    blk = _pick_col_blk(tm, hm, body, x.dtype)
    wr = _w_row(wt, x.dtype, gl, mr)
    wc = _fw_weights(wt, tm, hm, blk, body, x.dtype)
    qshape = jax.ShapeDtypeStruct((m // 2, n // 2), x.dtype)
    qspec = pl.BlockSpec((tm // 2, tn // 2), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    in_specs = _halo_in_specs(m, n, tm, tn, hm, _HN) + [
        pl.BlockSpec(wr.shape, lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wc.shape, lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        partial(_mxu_kernel, tm=tm, hm=hm, mode=_mode_for(x.dtype), gl=gl,
                m=mr, body=body, blk=blk),
        grid=(m // tm, n // tn),
        in_specs=in_specs,
        out_specs=(qspec,) * 4,
        out_shape=(qshape,) * 4,
        compiler_params=_sem(2),
    )(*([x] * 9), wr, wc)


# --- inverse level -----------------------------------------------------------
#
# The synthesis is the same banded-matmul shape transposed:
#
#     X = W_c_syn @ [quadrant rows]   then   lane groups @ W_r_syn
#
# with the lane RE-interleave baked into W_r_syn (output lanes 2k / 2k+1
# per parity), so the inverse lane butterfly AND the corner-DMA-bound
# 36-ref window assembly of fused2d's VPU inverse (measured ~2.6x slower
# than even the two-kernel inverse) are both gone: 4 quadrant halo reads
# + two dots + 1 write.  Reference semantics: the synthesis banks of
# src/Transforms/transforms_filter.jl:380-395 and the inverse lifting
# chain of transforms_lifting.jl:485-560.




def synthesis_bands(wt):
    """Per-parity synthesis bands, float64:

        x[2k + p] = sum_i cS[p][i] * s[k + dS[p][i]]
                  + sum_i cD[p][i] * d[k + dD[p][i]]

    Returned as [(dS0, cS0), (dD0, cD0), (dS1, cS1), (dD1, cD1)].
    Derived from the analysis bands: build the periodic analysis matrix,
    invert it (exact transpose for orthogonal filter banks), and read the
    bands off the circulant rows.
    """
    ds, cs, dd, cd = level_bands(wt)
    N = 512
    N2 = N // 2
    T = np.zeros((N, N))
    for k in range(N2):
        for dlt, c in zip(ds, cs):
            T[k, (2 * k + dlt) % N] += c
        for dlt, c in zip(dd, cd):
            T[N2 + k, (2 * k + dlt) % N] += c
    Ti = T.T if isinstance(wt, OrthoFilter) else np.linalg.inv(T)
    k0 = N2 // 2
    out = []
    for p in (0, 1):
        row = Ti[2 * k0 + p]
        for resp in (row[:N2], row[N2:]):
            nz = np.nonzero(np.abs(resp) > 1e-10)[0]
            out.append((nz - k0, resp[nz]))
    return out


def _syn_reach(wt):
    bands = synthesis_bands(wt)
    deltas = np.concatenate([d for d, _ in bands])
    return int(-deltas.min()), int(deltas.max())


def _w_row_inv(wt, dtype, gl=256, m=_HN):
    """(2·(gl/2 + 2m), gl) synthesis weight block: [s-window | d-window]
    lanes (each gl/2 pairs + m-lane margins) -> gl interleaved output
    lanes.  ``gl`` is the output-group lane count (see _w_row: smaller
    groups do strictly fewer MXU FLOPs); m is the lane margin (see
    _row_margin)."""
    (dS0, cS0), (dD0, cD0), (dS1, cS1), (dD1, cD1) = synthesis_bands(wt)
    wv = gl // 2 + 2 * m
    W = np.zeros((2 * wv, gl), np.float64)
    for o in range(gl // 2):
        for dlt, c in zip(dS0, cS0):
            W[m + o + dlt, 2 * o] += c
        for dlt, c in zip(dD0, cD0):
            W[wv + m + o + dlt, 2 * o] += c
        for dlt, c in zip(dS1, cS1):
            W[m + o + dlt, 2 * o + 1] += c
        for dlt, c in zip(dD1, cD1):
            W[wv + m + o + dlt, 2 * o + 1] += c
    return jnp.asarray(W.astype(dtype))


def _w_col_inv(wt, tm, hm2, dtype):
    """(tm, 2*(tm/2 + 2*hm2)) weight block: stacked halo-extended
    [a-rows ; d-rows] -> tm interleaved output rows."""
    (dS0, cS0), (dD0, cD0), (dS1, cS1), (dD1, cD1) = synthesis_bands(wt)
    tm2 = tm // 2
    E = tm2 + 2 * hm2
    W = np.zeros((tm, 2 * E), np.float64)
    for r in range(tm2):
        for dlt, c in zip(dS0, cS0):
            W[2 * r, hm2 + r + dlt] += c
        for dlt, c in zip(dD0, cD0):
            W[2 * r, E + hm2 + r + dlt] += c
        for dlt, c in zip(dS1, cS1):
            W[2 * r + 1, hm2 + r + dlt] += c
        for dlt, c in zip(dD1, cD1):
            W[2 * r + 1, E + hm2 + r + dlt] += c
    return jnp.asarray(W.astype(dtype))


def _plan_inv(ml: int, nl: int, wt, dtype):
    """(tm, tn, hm2, hn2) in FULL-level coordinates (fused2d plan-tuple
    layout, so fused2d._inv_group_specs is reused as-is)."""
    if not _mxu_dtype_ok(dtype):
        return None
    lo, hi = _syn_reach(wt)
    if max(lo, hi) > 120:
        return None
    from .common import halo_granule
    hm2 = roundup(max(lo, hi, 1), halo_granule(dtype))
    hn2 = 128
    mh, nh = ml // 2, nl // 2
    import os
    tn_env = os.environ.get("WAVELETS_TPU_MXU_INV_TN")
    cands = (8192, 4096, 2048, 1024, 512, 256)
    # a single lane granule is still correct: its periodic neighbor is
    # itself (whole quadrant row in one tile)
    if nh % hn2 or nh // hn2 < 1:
        return None
    # Tile aspect (round-5 sweeps): TALL inverse tiles lose in 2-D
    # (tm ∈ {256, 512}: 7.2-8.6 vs 5.9 ms — the quadrant ext operands
    # outgrow what blocked col dots save), but SHORT-WIDE tiles WIN for
    # f32 — tm=64 fits tn=8192 under the VMEM formula (lane-halo
    # re-read 12.5% -> 6.25%) and halves the col-dot K: f32 idwt2 16k
    # L8 6.07-6.28 -> 5.45-5.78 ms across 3 interleaved rounds (642
    # GB/s session).  bf16 measured the OPPOSITE (2.74-2.96 at tm=128
    # vs 3.22-3.36) and keeps 128.  tm=64 needs tm >= 4*hm2, so
    # large-halo wavelets (batt6 hm2=32) stay at 128.  Compile
    # envelope device-verified: (64, 8192) f32+bf16 up to hm2=16.
    # WAVELETS_TPU_MXU_INV_TM overrides.
    dflt = "64" if (np.dtype(dtype) == np.dtype(np.float32)
                    and hm2 <= 16) else "128"
    tm = int(os.environ.get("WAVELETS_TPU_MXU_INV_TM", dflt))
    while tm >= 4 * hm2:
        tm2 = tm // 2
        if ml % tm == 0 and tm2 % hm2 == 0 and mh % hm2 == 0:
            break
        tm //= 2
    else:
        return None
    if mh // hm2 < 2:
        return None
    if tn_env and nl % int(tn_env) == 0:
        # measured-knob override: trusted past the VMEM gate (A/B use),
        # but with a loose sanity ceiling — on this platform a failed or
        # killed over-VMEM remote compile can wedge the tunneled device
        # for 10-30+ min, so reject values whose formula estimate
        # exceeds ~2x the measured gate instead of compiling them.
        tno = int(tn_env)
        tno2 = tno // 2
        isz = np.dtype(dtype).itemsize
        est = (4 * (tm // 2 + 2 * hm2) * (tno2 + 256) * isz * 2
               + 2 * tm * (tno2 + 256) * isz * 2 + 2 * tm * tno * isz)
        if est <= 2 * (19 << 20):
            return tm, tno, hm2, hn2
        import warnings
        warnings.warn(
            f"WAVELETS_TPU_MXU_INV_TN={tno} rejected: estimated VMEM "
            f"{est / (1 << 20):.1f} MB exceeds 2x the measured gate "
            f"(risk of wedging the device on a failed compile); "
            f"falling back to the standard ladder")
    # VMEM gate: with the sequenced col-dot body (one (E, W) ext + its
    # split pair live at a time, no [s;d]-stacked copy) every stock
    # wavelet compiles at tn=4096 — device-probed up to hm2=32 (batt6)
    # f32+bf16, 18.2 MB in this formula's units; the limit keeps the
    # measured envelope and drops down the ladder beyond it.  The
    # formula is ITEMSIZE-aware (round 5): at bf16 the halved operand
    # bytes admit tn=8192, which the knobs A/B measured at 2.744 vs
    # 2.990 ms on the full 16k² L8 idwt2 (sol ≈ 0.84, device-verified
    # compile); f32 tn=8192 estimates 28 MB and stays rejected (its
    # forced compile OOMs — benchmarks/ab/body_v4.py knobs stage).
    isz = np.dtype(dtype).itemsize
    for tn in (c for c in cands if nl % c == 0):
        tn2 = tn // 2
        ext_b = 4 * (tm // 2 + 2 * hm2) * (tn2 + 256) * isz
        x_b = 2 * tm * (tn2 + 256) * isz
        if ext_b * 2 + x_b * 2 + 2 * tm * tn * isz <= (19 << 20):
            return tm, tn, hm2, hn2
    return None


def mxu_inv_ok(ml: int, nl: int, wt, dtype) -> bool:
    return _plan_inv(ml, nl, wt, dtype) is not None


def _mxu_inv_body_version() -> str:
    """Inverse compute-body structure (WAVELETS_TPU_MXU_INV_BODY).

    ``v1`` materializes four (E, W) halo-extended quadrant operands (4×
    [lane concats + vertical concat + hi/lo split]) and runs the row
    synthesis as nj per-window dots, each preceded by 3 window concats
    and a split3cat K-concat — the ~1.3 ms of in-kernel VPU glue the
    round-4 decomposition localized (benchmarks/ab/inv_structure.py).
    ``v2`` (a) K-splits the column dots into [mid | top|bot] chunks so
    the vertical ext concat is never materialized (the mid band is one
    lane concat of the w/c/e refs; top|bot is a tiny 2hm2-row band), and
    (b) stacks the row-dot windows along M into one (nj·tm, 2wv) operand
    and runs THREE big split3 dots (one for bf16) — no per-window
    concats.  With a blocked column dot (blk>0, the bf16 default) v2
    keeps v1's materialized ext for the column stage and only the row
    stage changes.  ``v2c`` = K-split col only (v1 row); ``v2r`` =
    batched row only (v1 col).  Round-5 device A/Bs (670-710 GB/s
    sessions, benchmarks/ab/body_v4.py): the restructures LOSE —
    level-1 16k² inv f32 v1 7.48 ms vs v2 8.19; bf16 v1 3.87 vs v2
    3.97 — the per-window small concats are cheaper on this VPU than
    building the big stacked operands; they stay env-reachable as
    measured negative results.  ``v6`` K-stacks the two column dots per
    half into one ([top_a;mid_a;bot_a;top_b;mid_b;bot_b] against the
    host-stacked (tm, 2E) weight — the pre-round-3 stacked formulation,
    which now fits VMEM at small halos): measured WIN, full 16k² L8
    idwt2 f32 6.18 -> 5.95 ms at a 645 GB/s session.  Default ``auto``
    = v6 where the stacked live set is inside the device-verified
    compile envelope (hm2 <= 16 at tn = 4096 f32 compiles; hm2 = 32
    OOMs — batt6 keeps v1), v1 elsewhere (incl. every blk > 0 path)."""
    import os
    return os.environ.get("WAVELETS_TPU_MXU_INV_BODY", "auto")


def _inv_row_batched(Xs, Xd, wr_ref, o_ref, *, nj, mode, gl, m):
    """Batched row-synthesis stage shared by the v2 inverse body."""
    g2 = gl // 2
    wv = g2 + 2 * m
    off = _HN - m
    tm = o_ref.shape[0]

    def stack(S, D):
        return jnp.concatenate(
            [jnp.concatenate([S[:, g2 * j + off: g2 * j + off + wv],
                              D[:, g2 * j + off: g2 * j + off + wv]],
                             axis=1)
             for j in range(nj)], axis=0)            # (nj·tm, 2wv)

    if mode in ("split3", "split3cat"):
        sh, sl_ = _split_bf16(Xs)
        dh, dl = _split_bf16(Xd)
        A2h = stack(sh, dh)
        A2l = stack(sl_, dl)
        wrh, wrl = _split_bf16(wr_ref[:])
        Y2 = (jnp.dot(A2h, wrh, preferred_element_type=jnp.float32)
              + jnp.dot(A2h, wrl, preferred_element_type=jnp.float32)
              + jnp.dot(A2l, wrh, preferred_element_type=jnp.float32))
    else:
        dt = o_ref.dtype
        A2 = stack(Xs.astype(dt), Xd.astype(dt))
        if mode == "highest":
            Y2 = jnp.dot(A2, wr_ref[:], preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        else:
            Y2 = jnp.dot(A2, wr_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = jnp.concatenate(
        [Y2[j * tm:(j + 1) * tm] for j in range(nj)],
        axis=1).astype(o_ref.dtype)


def _mxu_inv_kernel_v6(*refs, nj, mode, gl, m, hm2, blk=0):
    """v1 with the two column dots per half K-STACKED into one: the
    operand is the 6-piece concat [top_a; mid_a; bot_a; top_b; mid_b;
    bot_b] (same total concat bytes as v1's two 3-piece exts) against
    the host-stacked (tm, 2E) weight — one dot per half instead of two,
    and the Xa + Xb add pass disappears.  Row stage is v1's."""
    groups = [refs[9 * k: 9 * (k + 1)] for k in range(4)]
    wc_ref, wr_ref = refs[36], refs[37]
    o_ref = refs[38]
    wc = _pair(wc_ref[:], mode)

    def col(ga, gb):
        rows = []
        for g in (ga, gb):
            nw, nn, ne, ww, cc, ee, sw, ss, se = g
            rows += [jnp.concatenate([nw[:], nn[:], ne[:]], axis=1),
                     jnp.concatenate([ww[:], cc[:], ee[:]], axis=1),
                     jnp.concatenate([sw[:], ss[:], se[:]], axis=1)]
        ext2 = jnp.concatenate(rows, axis=0)        # (2E, W)
        return _dot_f32(wc, _pair(ext2, mode), mode)

    Xs = col(groups[0], groups[2])
    Xd = col(groups[1], groups[3])
    dt = o_ref.dtype
    _inv_row_windows(Xs.astype(dt), Xd.astype(dt), wr_ref, o_ref,
                     nj=nj, mode=mode, gl=gl, m=m)


def _inv_row_windows(Xs, Xd, wr_ref, o_ref, *, nj, mode, gl, m):
    """The v1 per-window row-synthesis stage (split once, slice + concat
    per window, one dot per window)."""
    wr = _pair(wr_ref[:], mode)
    Xs_p = _pair(Xs, mode)
    Xd_p = _pair(Xd, mode)
    wv = gl // 2 + 2 * m
    off = _HN - m       # ext offset of window j = (gl/2)·j + off

    def win(p, j):
        a, (hi, lo) = p
        g2 = gl // 2
        sl = (slice(None), slice(g2 * j + off, g2 * j + off + wv))
        return a[sl], ((hi[sl], lo[sl]) if hi is not None else (None, None))

    def wincat(j):
        sa, (sh, sl_) = win(Xs_p, j)
        da, (dh, dl) = win(Xd_p, j)
        a = jnp.concatenate([sa, da], axis=1)
        if sh is None:
            return a, (None, None)
        return a, (jnp.concatenate([sh, dh], axis=1),
                   jnp.concatenate([sl_, dl], axis=1))

    pieces = [_dot_f32(wincat(j), wr, mode) for j in range(nj)]
    o_ref[:] = jnp.concatenate(pieces, axis=1).astype(o_ref.dtype)


def _mxu_inv_kernel_v2(*refs, nj, mode, gl, m, hm2, blk=0, row="batched",
                       ksplit=True):
    groups = [refs[9 * k: 9 * (k + 1)] for k in range(4)]
    if not ksplit:
        wcs_ref, wcd_ref, wr_ref = refs[36], refs[37], refs[38]
        o_ref = refs[39]
        wc_s = _pair(wcs_ref[:], mode)
        wc_d = _pair(wcd_ref[:], mode)

        def ext(g):
            nw, nn, ne, ww, cc, ee, sw, ss, se = g
            top = jnp.concatenate([nw[:], nn[:], ne[:]], axis=1)
            mid = jnp.concatenate([ww[:], cc[:], ee[:]], axis=1)
            bot = jnp.concatenate([sw[:], ss[:], se[:]], axis=1)
            return jnp.concatenate([top, mid, bot], axis=0)

        def col(ga, gb):
            if blk:
                pa = _inv_col_dot_blocked(wc_s, _pair(ext(ga), mode),
                                          mode=mode, blk=blk, hm2=hm2)
                pb = _inv_col_dot_blocked(wc_d, _pair(ext(gb), mode),
                                          mode=mode, blk=blk, hm2=hm2)
                return jnp.concatenate([a + b for a, b in zip(pa, pb)],
                                       axis=0)
            return (_dot_f32(wc_s, _pair(ext(ga), mode), mode)
                    + _dot_f32(wc_d, _pair(ext(gb), mode), mode))
    else:
        (wcsm_ref, wcstb_ref, wcdm_ref, wcdtb_ref, wr_ref) = refs[36:41]
        o_ref = refs[41]
        wsm = _pair(wcsm_ref[:], mode)
        wstb = _pair(wcstb_ref[:], mode)
        wdm = _pair(wcdm_ref[:], mode)
        wdtb = _pair(wcdtb_ref[:], mode)

        def half(g, wm, wtb):
            nw, nn, ne, ww, cc, ee, sw, ss, se = g
            mid = jnp.concatenate([ww[:], cc[:], ee[:]], axis=1)
            tb = jnp.concatenate([
                jnp.concatenate([nw[:], nn[:], ne[:]], axis=1),
                jnp.concatenate([sw[:], ss[:], se[:]], axis=1)], axis=0)
            return (_dot_f32(wm, _pair(mid, mode), mode)
                    + _dot_f32(wtb, _pair(tb, mode), mode))

        def col(ga, gb):
            return half(ga, wsm, wstb) + half(gb, wdm, wdtb)   # f32 (tm, W)

    Xs = col(groups[0], groups[2])      # ll, hl -> scaling columns
    Xd = col(groups[1], groups[3])      # lh, hh -> detail columns
    if row == "batched":
        _inv_row_batched(Xs, Xd, wr_ref, o_ref, nj=nj, mode=mode, gl=gl, m=m)
    else:
        dt = o_ref.dtype    # v1's row stage expects X in the array dtype
        _inv_row_windows(Xs.astype(dt), Xd.astype(dt), wr_ref, o_ref,
                         nj=nj, mode=mode, gl=gl, m=m)


def _w_col_inv_ksplit(wt, tm, hm2, dtype):
    """The v2 inverse column weights, K-split at the host: (wcs_mid,
    wcs_tb, wcd_mid, wcd_tb) where *_mid is the (tm, tm/2) interior-rows
    chunk and *_tb the (tm, 2hm2) [top-halo | bottom-halo] chunk, in the
    K order of the v2 body's band operands."""
    wc = _w_col_inv(wt, tm, hm2, dtype)
    E = wc.shape[1] // 2
    out = []
    for half in (wc[:, :E], wc[:, E:]):
        out.append(half[:, hm2:E - hm2])
        out.append(jnp.concatenate([half[:, :hm2], half[:, E - hm2:]],
                                   axis=1))
    return tuple(out)


def _mxu_inv_kernel(*refs, nj, mode, gl, m, hm2=None, blk=0):
    groups = [refs[9 * k: 9 * (k + 1)] for k in range(4)]
    wcs_ref, wcd_ref, wr_ref = refs[36], refs[37], refs[38]
    o_ref = refs[39]

    def ext(g):
        nw, nn, ne, ww, cc, ee, sw, ss, se = g
        top = jnp.concatenate([nw[:], nn[:], ne[:]], axis=1)
        mid = jnp.concatenate([ww[:], cc[:], ee[:]], axis=1)
        bot = jnp.concatenate([sw[:], ss[:], se[:]], axis=1)
        return jnp.concatenate([top, mid, bot], axis=0)

    dt = groups[0][4].dtype
    wc_s = _pair(wcs_ref[:], mode)
    wc_d = _pair(wcd_ref[:], mode)

    def _blocked_half(wc_pair, E_pair):
        return _inv_col_dot_blocked(wc_pair, E_pair, mode=mode, blk=blk,
                                    hm2=hm2)

    def col(ga, gb):
        # X = Wc_s @ ext(ga) + Wc_d @ ext(gb), the [s;d]-stacked column
        # dot split into its two row halves so the (2E, W) stacked copy
        # is never materialized and only ONE (E, W) extended operand
        # (+ its split pair) is live at a time.  Same FLOPs; the VMEM
        # headroom is what admits the tn=4096 tile ladder (_plan_inv).
        if blk:
            pa = _blocked_half(wc_s, _pair(ext(ga), mode))
            pb = _blocked_half(wc_d, _pair(ext(gb), mode))
            return jnp.concatenate(
                [a + b for a, b in zip(pa, pb)], axis=0).astype(dt)
        Xa = _dot_f32(wc_s, _pair(ext(ga), mode), mode)
        Xb = _dot_f32(wc_d, _pair(ext(gb), mode), mode)
        return (Xa + Xb).astype(dt)

    Xs = col(groups[0], groups[2])      # ll, hl -> scaling columns
    Xd = col(groups[1], groups[3])      # lh, hh -> detail columns
    _inv_row_windows(Xs, Xd, wr_ref, o_ref, nj=nj, mode=mode, gl=gl, m=m)


def _mxu_inv_call(plan, srcs, offs, ml, nl, wt):
    from .fused2d import _inv_group_specs
    tm, tn, hm2, _hn2 = plan
    in_specs = []
    inputs = []
    for src, off in zip(srcs, offs):
        in_specs += _inv_group_specs(plan, ml, nl, src.shape, off)
        inputs += [src] * 9
    dt = srcs[0].dtype
    gl = _row_gl(tn)
    mr = _row_margin(wt, fw=False)
    wr = _w_row_inv(wt, dt, gl, mr)
    # block-shared synthesis col dot (see _mxu_inv_kernel._blocked_half):
    # blocks must tile tm and keep the ext slices granule-aligned
    blk = _col_blk(dt, fw=False)
    from .common import halo_granule
    g = halo_granule(dt)
    blk = min(blk, tm // 2)
    while blk >= 8 and (tm % (2 * blk) or blk % g):
        blk //= 2
    if blk < 8:
        blk = 0
    body = _mxu_inv_body_version()
    if body == "auto":
        # stacked-operand envelope: hm2=16 @ (tn=4096, f32) compiles
        # (metric 147k), hm2=32 OOMs (295k) — boundary at 150k
        fits = hm2 * (tn // 2 + 256) * np.dtype(dt).itemsize <= 150_000
        body = "v6" if (not blk and fits) else "v1"
    v6 = body == "v6" and not blk
    ksplit = body in ("v2", "v2c") and not blk
    row = "batched" if body in ("v2", "v2r") else "win"
    if ksplit:
        weights = list(_w_col_inv_ksplit(wt, tm, hm2, dt)) + [wr]
    elif v6:
        weights = [_w_col_inv(wt, tm, hm2, dt), wr]   # K-stacked [s | d]
    else:
        wc = _w_col_inv(wt, 2 * blk if blk else tm, hm2, dt)
        E = wc.shape[1] // 2
        weights = [wc[:, :E], wc[:, E:], wr]   # host-side split: no
    in_specs += [                              # in-kernel non-128-aligned
        pl.BlockSpec(wgt.shape, lambda i, j: (0, 0),   # lane slicing
                     memory_space=pltpu.VMEM)
        for wgt in weights]
    if v6:
        kern = _mxu_inv_kernel_v6
    elif ksplit or row == "batched":
        kern = partial(_mxu_inv_kernel_v2, row=row, ksplit=ksplit)
    else:
        kern = _mxu_inv_kernel
    return pl.pallas_call(
        partial(kern, nj=(tn // 2) // (gl // 2),
                mode=_mode_for(dt), gl=gl, m=mr, hm2=hm2, blk=blk),
        grid=(ml // tm, nl // tn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ml, nl), dt),
        compiler_params=_sem(2),
    )(*inputs, *weights)


def mxu_inv_quads(ll, lh, hl, hh, wt):
    """One inverse 2-D level from quadrant arrays via two banded matmuls."""
    mh, nh = ll.shape
    ml, nl = 2 * mh, 2 * nh
    plan = _plan_inv(ml, nl, wt, ll.dtype)
    return _mxu_inv_call(plan, (ll, lh, hl, hh), [(0, 0)] * 4, ml, nl, wt)


def mxu_inv_packed(y, ll, l_size, wt):
    """One inverse level reading the detail quadrants DIRECTLY from the
    packed array ``y`` through offset halo windows; ``ll`` is the running
    scaling array from the deeper level."""
    ml, nl = l_size
    plan = _plan_inv(ml, nl, wt, y.dtype)
    mh, nh = ml // 2, nl // 2
    return _mxu_inv_call(plan, (ll, y, y, y),
                         [(0, 0), (0, nh), (mh, 0), (mh, nh)], ml, nl, wt)


# --- packed output mode ------------------------------------------------------
#
# Same zero-assembly-pass scheme as fused2d's packed mode (innermost q
# grid axis writes the three detail quadrants into their final positions
# of the alias-chained full-size buffer; compute runs at q == 0 with the
# detail tiles staged in VMEM scratch), but with the MXU compute body.

def mxu_packed_ok(m: int, n: int, wt, dtype) -> bool:
    plan = _plan(m, n, wt, dtype)
    if plan is None:
        return False
    tm, tn, hm = plan
    return (m // 2) % (tm // 2) == 0 and (n // 2) % (tn // 2) == 0


def _fill_quads(ins, wr_ref, wc_ref, ll_ref, stash, *, tm, hm, mode, gl, m,
                body, blk=0, ll_slot=None):
    """Compute one tile's quadrants into ll_ref + the 3-slot stash.

    With ``ll_slot`` set, ll goes into that stash slot instead of
    ``ll_ref`` (the last-level packed variant streams it into the packed
    buffer alongside the details and drops the separate ll output)."""
    if body == "v2":
        def emit(qd, c0, val):
            if qd == 0 and ll_slot is None:
                ll_ref[:, c0:c0 + val.shape[1]] = val
            elif qd == 0:
                stash[ll_slot, :, c0:c0 + val.shape[1]] = val
            else:
                stash[qd - 1, :, c0:c0 + val.shape[1]] = val
        _fw_body_v2(ins, wr_ref, wc_ref, emit, tm=tm, hm=hm, mode=mode,
                    gl=gl, m=m)
        return
    ll, lh, hl, hh = _quads_any_body(ins, wr_ref, wc_ref, tm=tm, hm=hm,
                                     mode=mode, gl=gl, m=m, body=body,
                                     blk=blk)
    if ll_slot is None:
        ll_ref[:] = ll
    else:
        stash[ll_slot] = ll
    stash[0] = lh
    stash[1] = hl
    stash[2] = hh


def _mxu_packed_kernel(*refs, tm, hm, mode, gl, m, has_alias, body, blk=0):
    if has_alias:
        (ins, wr_ref, wc_ref, _yin, ll_ref, y_ref, stash) = (
            refs[:9], refs[9], refs[10], refs[11], refs[12], refs[13],
            refs[14])
    else:
        (ins, wr_ref, wc_ref, ll_ref, y_ref, stash) = (
            refs[:9], refs[9], refs[10], refs[11], refs[12], refs[13])
    q = pl.program_id(2)

    @pl.when(q == 0)
    def _():
        _fill_quads(ins, wr_ref, wc_ref, ll_ref, stash, tm=tm, hm=hm,
                    mode=mode, gl=gl, m=m, body=body, blk=blk)

    y_ref[:] = stash[q]


def _mxu_packed_call(active, y, yshape, wt):
    ml, nl = active.shape
    M, N = yshape
    tm, tn, hm = _plan(ml, nl, wt, active.dtype)
    gl = _row_gl(tn)
    bm, bn = tm // 2, tn // 2
    nbr = ml // tm
    nbc = nl // tn

    def y_im(i, j, q):
        return (i + ((q + 1) // 2) * nbr, j + (1 - (q % 2)) * nbc)

    mr = _row_margin(wt)
    body = _mxu_body_version()
    blk = _pick_col_blk(tm, hm, body, active.dtype)
    wr = _w_row(wt, active.dtype, gl, mr)
    wc = _fw_weights(wt, tm, hm, blk, body, active.dtype)
    in_specs = _halo_in_specs(ml, nl, tm, tn, hm, _HN) + [
        pl.BlockSpec(wr.shape, lambda i, j, q: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wc.shape, lambda i, j, q: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [active] * 9 + [wr, wc]
    aliases = {}
    if y is not None:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        inputs = inputs + [y]
        aliases = {11: 1}
    return pl.pallas_call(
        partial(_mxu_packed_kernel, tm=tm, hm=hm,
                mode=_mode_for(active.dtype), gl=gl, m=mr,
                has_alias=y is not None, body=body, blk=blk),
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
        compiler_params=_sem(2, 1),
    )(*inputs)


def _packed_dma() -> bool:
    """Use the DMA-packed forward kernel (default on device).

    The q-axis packed kernel spends 3 grid steps per tile — one computing,
    two existing only to place detail quadrants in the full-size buffer —
    and at ~1.5-2 µs/step on this platform those placement steps are the
    dominant non-DMA cost at 16k² (≈ 2×1024 steps/level-1).  The DMA
    variant collapses the grid to (nbr, nbc) and writes lh/hl/hh with
    in-kernel async copies straight to the packed buffer's HBM at
    program-id-derived offsets.  WAVELETS_TPU_PACKED_DMA=0 reverts."""
    import os
    return os.environ.get("WAVELETS_TPU_PACKED_DMA") != "0"


def _mxu_packed_dma_kernel(*refs, tm, hm, mode, gl, m, has_alias, nbr, nbc,
                           body, blk=0, last=False):
    if last:
        # last-level variant: no separate ll output — ll streams into the
        # packed buffer's top-left quadrant via a 4th async copy
        if has_alias:
            (ins, wr_ref, wc_ref, _yin, y_ref, stash, sem) = (
                refs[:9], refs[9], refs[10], refs[11], refs[12], refs[13],
                refs[14])
        else:
            (ins, wr_ref, wc_ref, y_ref, stash, sem) = (
                refs[:9], refs[9], refs[10], refs[11], refs[12], refs[13])
        ll_ref = None
        bm, bn = stash.shape[1], stash.shape[2]
    elif has_alias:
        (ins, wr_ref, wc_ref, _yin, ll_ref, y_ref, stash, sem) = (
            refs[:9], refs[9], refs[10], refs[11], refs[12], refs[13],
            refs[14], refs[15])
        bm, bn = ll_ref.shape
    else:
        (ins, wr_ref, wc_ref, ll_ref, y_ref, stash, sem) = (
            refs[:9], refs[9], refs[10], refs[11], refs[12], refs[13],
            refs[14])
        bm, bn = ll_ref.shape
    _fill_quads(ins, wr_ref, wc_ref, ll_ref, stash, tm=tm, hm=hm, mode=mode,
                gl=gl, m=m, body=body, blk=blk,
                ll_slot=3 if last else None)
    i = pl.program_id(0)
    j = pl.program_id(1)
    # element offsets of this tile's quadrant blocks in the packed buffer:
    # LH (i, j + nbc), HL (i + nbr, j), HH (i + nbr, j + nbc) in block
    # coords (cf. y_im above); all offsets are (bm, bn)-aligned so the
    # HBM destinations are native-tile-aligned.
    r_lo, r_hi = i * bm, (i + nbr) * bm
    c_lo, c_hi = j * bn, (j + nbc) * bn
    dmas = [
        pltpu.make_async_copy(
            stash.at[0], y_ref.at[pl.ds(r_lo, bm), pl.ds(c_hi, bn)],
            sem.at[0]),
        pltpu.make_async_copy(
            stash.at[1], y_ref.at[pl.ds(r_hi, bm), pl.ds(c_lo, bn)],
            sem.at[1]),
        pltpu.make_async_copy(
            stash.at[2], y_ref.at[pl.ds(r_hi, bm), pl.ds(c_hi, bn)],
            sem.at[2]),
    ]
    if last:
        dmas.append(pltpu.make_async_copy(
            stash.at[3], y_ref.at[pl.ds(r_lo, bm), pl.ds(c_lo, bn)],
            sem.at[3]))
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()


def _mxu_packed_call_dma(active, y, yshape, wt, last=False):
    """DMA-packed forward level: one grid step per tile (no q axis); the
    three detail quadrants leave via in-kernel VMEM→HBM async copies.

    ``last=True`` is the final-level variant: ll streams into the packed
    buffer's top-left quadrant as a 4th async copy and the separate ll
    output is dropped — the driver's closing dynamic_update_slice (a
    read+write of the whole ll quadrant, 0.85 ms f32 / 0.41 bf16 at 16k²
    L=1) disappears.  Returns y alone in that mode."""
    ml, nl = active.shape
    M, N = yshape
    tm, tn, hm = _plan(ml, nl, wt, active.dtype)
    gl = _row_gl(tn)
    bm, bn = tm // 2, tn // 2
    nbr = ml // tm
    nbc = nl // tn
    mr = _row_margin(wt)
    body = _mxu_body_version()
    blk = _pick_col_blk(tm, hm, body, active.dtype)
    wr = _w_row(wt, active.dtype, gl, mr)
    wc = _fw_weights(wt, tm, hm, blk, body, active.dtype)
    in_specs = _halo_in_specs(ml, nl, tm, tn, hm, _HN) + [
        pl.BlockSpec(wr.shape, lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wc.shape, lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [active] * 9 + [wr, wc]
    aliases = {}
    if y is not None:
        in_specs = in_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        inputs = inputs + [y]
        aliases = {11: 0 if last else 1}
    nslots = 4 if last else 3
    ll_out = () if last else (
        (pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                      memory_space=pltpu.VMEM),
         jax.ShapeDtypeStruct((ml // 2, nl // 2), active.dtype)),)
    out_specs = tuple(s for s, _ in ll_out) + (
        pl.BlockSpec(memory_space=pl.ANY),)
    out_shape = tuple(o for _, o in ll_out) + (
        jax.ShapeDtypeStruct((M, N), active.dtype),)
    res = pl.pallas_call(
        partial(_mxu_packed_dma_kernel, tm=tm, hm=hm,
                mode=_mode_for(active.dtype), gl=gl, m=mr,
                has_alias=y is not None, nbr=nbr, nbc=nbc, body=body,
                blk=blk, last=last),
        grid=(ml // tm, nl // tn),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=[pltpu.VMEM((nslots, bm, bn), active.dtype),
                        pltpu.SemaphoreType.DMA((nslots,))],
        compiler_params=_sem(2),
    )(*inputs)
    return res[0] if last else res


def mxu_level_fw_packed(active, y, wt):
    """One forward level in packed mode via the MXU body; ``y`` is the
    full-size packed buffer, donated and alias-chained (see
    fused2d.level_fw_packed).  Returns (ll, y_out)."""
    if _packed_dma():
        return _mxu_packed_call_dma(active, y, y.shape, wt)
    return _mxu_packed_call(active, y, y.shape, wt)


def mxu_level_fw_packed_last(active, y, yshape, wt):
    """Final-level packed call: ll streams into the packed buffer's
    top-left quadrant in-kernel, so the caller needs NO closing
    dynamic_update_slice.  Returns the finished packed buffer.  DMA
    variant only (callers must check _packed_dma())."""
    return _mxu_packed_call_dma(active, y, yshape, wt, last=True)


def mxu_level_fw_packed_first(active, wt):
    """Level-1 packed call allocating the full-size buffer.  Returns
    (ll, y)."""
    if _packed_dma():
        return _mxu_packed_call_dma(active, None, active.shape, wt)
    return _mxu_packed_call(active, None, active.shape, wt)
