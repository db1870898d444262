"""Shared Pallas kernel utilities: Mosaic-safe rolls, lane butterflies,
ring-halo block specs, tile planning.

Mosaic constraints discovered on this toolchain (jax 0.9.0 / TPU v5):
stride-2 slices fail on both lanes and sublanes; minor-dim transposes fail;
pltpu.roll requires non-negative shifts.  Everything here sticks to the
supported set: rolls, iota masks, second-minor reshapes, concatenates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["roll", "deint_lanes", "int_lanes", "halo_specs", "roundup",
           "pick_col_tm", "pick_row_tm", "halo_granule", "dtype_ok",
           "lane_reach", "half_reach"]


def roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def halo_granule(dtype) -> int:
    """Minimum sublane-tile height: 8 for 4-byte types, 16 for 2-byte."""
    import numpy as np
    return 8 if np.dtype(dtype).itemsize == 4 else 16


def dtype_ok(dtype) -> bool:
    """Kernel dtype eligibility: float32 always; bfloat16 via the
    bitcast-roll path (opt-in with WAVELETS_TPU_BF16=1 until the packed
    sublane layout is validated on the target toolchain)."""
    import os
    import numpy as np
    d = np.dtype(dtype)
    if d == np.dtype(np.float32):
        return True
    if d == np.dtype(jnp.bfloat16):
        # WARNING: on the current sandbox toolchain (jax 0.9 / v5e via
        # the axon tunnel) compiling the bitcast-roll kernels CRASHES the
        # TPU runtime outright (no error, device wedges).  Interpret-mode
        # tests pass; keep strictly opt-in until a toolchain accepts it.
        return os.environ.get("WAVELETS_TPU_BF16") == "1"
    return False


def roll(v, sh: int, axis: int):
    """Circular shift; lane axis uses the Mosaic-native pltpu.roll.

    This Mosaic rejects lane rotates of non-32-bit data ('Rotate with
    non-32-bit data'), so 16-bit arrays are rolled through an int32 view:
    Mosaic packs 2-byte types pairwise along the SUBLANE dimension, so
    ``pltpu.bitcast(v, int32)`` is a (m/2, n) word view in which a lane
    roll moves both packed halves together — exact for any shift."""
    if sh % v.shape[axis] == 0:
        return v
    if axis == v.ndim - 1:
        if v.dtype.itemsize == 2:
            w = pltpu.bitcast(v, jnp.int32)
            w = pltpu.roll(w, sh % v.shape[axis], axis=w.ndim - 1)
            return pltpu.bitcast(w, v.dtype)
        return pltpu.roll(v, sh % v.shape[axis], axis=axis)
    return jnp.roll(v, sh, axis=axis)


def _quarter_swap(v, B: int, lane):
    """Swap the 2nd and 3rd quarters of every B-lane block."""
    q = B // 4
    pos = lane % B
    second = (pos >= q) & (pos < 2 * q)
    third = (pos >= 2 * q) & (pos < 3 * q)
    fwd = roll(v, -q, v.ndim - 1)
    bwd = roll(v, q, v.ndim - 1)
    return jnp.where(second, fwd, jnp.where(third, bwd, v))


def _deint_chunk() -> int:
    import os
    return int(os.environ.get("WAVELETS_TPU_DEINT_CHUNK", "0"))


def deint_lanes(v, chunk: int | None = None):
    """Perfect lane unshuffle [s0 d0 s1 d1 ...] -> [s... | d...] in
    log2(W)-1 roll+mask stages (the only lane permutation Mosaic takes).

    With ``chunk`` (or WAVELETS_TPU_DEINT_CHUNK), wide tiles unshuffle
    chunk-locally and re-concatenate — fewer butterfly stages (log2 chunk
    instead of log2 W) at the cost of 2 extra VMEM copies; block-local
    unshuffles compose to the global one because chunks tile in order."""
    W = v.shape[-1]
    if chunk is None:
        chunk = _deint_chunk()
    if chunk and W > chunk:
        nc = W // chunk
        parts = [deint_lanes(v[..., i * chunk:(i + 1) * chunk], chunk)
                 for i in range(nc)]
        half = chunk // 2
        return jnp.concatenate([p[..., :half] for p in parts]
                               + [p[..., half:] for p in parts], axis=-1)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    B = 4
    while B <= W:
        v = _quarter_swap(v, B, lane)
        B *= 2
    return v


def int_lanes(v, chunk: int | None = None):
    """Perfect lane shuffle [s... | d...] -> [s0 d0 s1 d1 ...]."""
    W = v.shape[-1]
    if chunk is None:
        chunk = _deint_chunk()
    if chunk and W > chunk:
        nc = W // chunk
        half = chunk // 2
        s, d = v[..., : W // 2], v[..., W // 2:]
        parts = [int_lanes(jnp.concatenate(
            [s[..., i * half:(i + 1) * half],
             d[..., i * half:(i + 1) * half]], axis=-1), chunk)
            for i in range(nc)]
        return jnp.concatenate(parts, axis=-1)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    B = W
    while B >= 4:
        v = _quarter_swap(v, B, lane)
        B //= 2
    return v


def halo_specs(tm: int, halo: int, nblocks_h: int, tn: int):
    """(top-halo, center, bottom-halo) input specs whose index maps wrap
    modulo the block count — the periodic boundary expressed as a block
    ring, no padded array copy."""
    step = tm // halo
    return [
        pl.BlockSpec((halo, tn), lambda i, j: ((i * step - 1) % nblocks_h, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((halo, tn), lambda i, j: (((i + 1) * step) % nblocks_h, j),
                     memory_space=pltpu.VMEM),
    ]


def pick_col_tm(rows: int, halo: int, cap: int = 1024):
    """Largest power-of-two row-tile <= cap dividing ``rows`` and a
    multiple of ``halo`` (so halo blocks land on block-granular offsets)."""
    tm = cap
    while tm >= 2 * halo:
        if rows % tm == 0 and tm % halo == 0:
            return tm
        tm //= 2
    return None


def pick_row_tm(m: int, n: int, itemsize: int, budget: int = 2 << 20,
                live: int | None = None):
    """Row-kernel tile: keep one (tm, n) block near the VMEM budget.

    ``live`` (number of simultaneously live block-sized temporaries the
    kernel creates — Mosaic stack-allocates them) overrides the flat
    budget: the block is sized so live blocks fit in ~14 MB."""
    if live is not None:
        budget = (14 << 20) // max(live, 1)
    bpr = 2 * n * itemsize
    cap = max(8, min(512, budget // max(bpr, 1)))
    if m % 8:
        return None
    tm = 8
    while tm * 2 <= cap and m % (tm * 2) == 0:
        tm *= 2
    return tm


def lane_reach(wt, min_r: int = 1) -> int:
    """Total lane contamination of the INTERLEAVED-lane chain: each
    lifting step k touches lanes 2(k - shift) +/- 1 of the interleaved
    layout (predict writes odds, update evens); filters reach one full
    tap span + 1.  ``min_r`` is the caller's floor (e.g. 2 to keep the
    wrap parity even).  The single source for wide1d/fused2d halo
    planning — a reach-formula fix lands on every kernel at once."""
    from ...wt.carriers import OrthoFilter
    from ...wt.schemes import PREDICT
    if isinstance(wt, OrthoFilter):
        return max(len(wt.qmf) + 1, min_r)
    r = 0
    for st in wt.steps:
        pred = st.kind == PREDICT
        offs = [abs(2 * (k - st.shift) + (1 if pred else -1))
                for k in range(len(st.coef))]
        r += max(offs) if offs else 0
    return max(r, min_r)


def half_reach(wt, min_r: int = 1) -> int:
    """Total stencil reach of a lifting step chain in HALF-index space
    (the split s/d arrays); filters reach their tap count."""
    from ...wt.carriers import GLS
    if isinstance(wt, GLS):
        r = 0
        for st in wt.steps:
            offs = [k - st.shift for k in range(len(st.coef))]
            r += max(abs(o) for o in offs) if offs else 0
        return max(r, min_r)
    return max(len(wt.qmf), min_r)
