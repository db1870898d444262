"""Whole-pyramid-tail kernels: all small deep 2-D levels in ONE launch.

Once the active scaling array is small (<= ~512x512 f32), it fits VMEM
whole, so the remaining levels need neither halos (full-array rolls wrap
periodically and exactly) nor per-level launches.  The kernel loops over
the remaining levels in-registers — row chain, column chain, lane
butterfly — writing each level's detail quadrants into the packed output
ref at static offsets and recursing on ll.  The multi-level drivers
switch to this kernel when the active region drops below the fused/
pipeline tile plans, replacing both the per-level launches and the XLA
moveaxis fallback (whose transposes are the slowest path on TPU).

The inverse mirrors it: one launch reconstructs the full tail from the
packed array.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...wt.carriers import GLS, OrthoFilter
from .common import deint_lanes, int_lanes, dtype_ok
from .fused2d import _row_chain, _col_pair, _row_chain_inv, _col_pair_inv

__all__ = ["tail_ok", "tail_fw", "tail_inv"]

_MAX_SIDE = 512      # full array + ~8 live temps stays well under VMEM
_MIN_SIDE = 8        # below this the jnp fallback is fine


def tail_ok(m: int, n: int, L: int, wt, dtype) -> bool:
    if not dtype_ok(dtype) or L < 1:
        return False
    if not (_MIN_SIDE <= m <= _MAX_SIDE and 128 <= n <= _MAX_SIDE):
        return False
    # the in-kernel lane (de)interleave is a log2(n)-stage quarter-swap
    # butterfly — n must be a POWER OF TWO, not just a multiple of 128
    # (n = 384 produced wrong coefficients before this gate; rows only
    # need the f32 sublane granule)
    if n & (n - 1) or m % 8:
        return False
    # every level's active region must stay lane-tileable
    return (n >> (L - 1)) >= 128 and (m >> (L - 1)) >= _MIN_SIDE


def _fw_kernel(x_ref, o_ref, *, wt, L):
    act = x_ref[:]
    m, n = act.shape
    for l in range(L):
        v = _row_chain(act, wt)
        rows, cols = v.shape
        r = v.reshape(rows // 2, 2, cols)
        s, d = _col_pair(r[:, 0, :], r[:, 1, :], wt)
        s = deint_lanes(s)
        d = deint_lanes(d)
        mh, nh = rows // 2, cols // 2
        o_ref[0:mh, nh:cols] = s[:, nh:]          # lh
        o_ref[mh:rows, 0:nh] = d[:, :nh]          # hl
        o_ref[mh:rows, nh:cols] = d[:, nh:]       # hh
        act = s[:, :nh]                           # ll
    o_ref[0: act.shape[0], 0: act.shape[1]] = act


def tail_fw(x, wt, L: int):
    """All L remaining levels of the (m, n) active array in one launch ->
    packed (m, n)."""
    m, n = x.shape
    return pl.pallas_call(
        partial(_fw_kernel, wt=wt, L=L),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x)


def _inv_kernel(y_ref, o_ref, *, wt, L):
    m, n = y_ref.shape
    act = y_ref[0: m >> L, 0: n >> L]
    for l in range(L, 0, -1):
        mh, nh = m >> l, n >> l
        s = jnp.concatenate([act, y_ref[0:mh, nh: 2 * nh]], axis=1)
        d = jnp.concatenate([y_ref[mh: 2 * mh, 0:nh],
                             y_ref[mh: 2 * mh, nh: 2 * nh]], axis=1)
        s = int_lanes(s)
        d = int_lanes(d)
        x0, x1 = _col_pair_inv(s, d, wt)
        v = jnp.stack([x0, x1], axis=1).reshape(2 * mh, 2 * nh)
        act = _row_chain_inv(v, wt)
    o_ref[:] = act


def tail_inv(y, wt, L: int):
    """Inverse of tail_fw: packed (m, n) -> natural (m, n), one launch."""
    m, n = y.shape
    return pl.pallas_call(
        partial(_inv_kernel, wt=wt, L=L),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), y.dtype),
    )(y)


def tail_fit(m: int, n: int, rem: int, wt, dtype) -> int:
    """Largest level count <= rem the tail kernel can take at (m, n)."""
    Lt = rem
    while Lt >= 1 and not tail_ok(m, n, Lt, wt, dtype):
        Lt -= 1
    return Lt
