"""Pallas kernels for the batched MODWT (undecimated, dilated, periodic).

One level is one kernel: both the scaling and detail outputs of
modwt_step come from a single read of the input rows (the XLA formulation
materializes every dilated roll).  Dilated periodic indexing is just a
lane roll by n*2^(j-1); full rows live in VMEM so the wrap is exact.

Reference analogue: the GPU extension's _modwt_step_kernel!
(ext/WaveletsGPUExt/modwt_gpu.jl:12-31), one thread per sample computing
the pair — here one VMEM-resident row block per grid step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...wt.carriers import OrthoFilter
from ..modwt import modwt_filter_pair
from .common import roll

__all__ = ["modwt_pallas", "imodwt_pallas", "pallas_ok"]


def _fw_kernel(v_ref, v1_ref, w1_ref, *, g, h, dil):
    v = v_ref[:]
    dt = v.dtype
    v1 = None
    w1 = None
    for n_, (gc, hc) in enumerate(zip(g, h)):
        t = roll(v, n_ * dil, v.ndim - 1)
        tv = jnp.asarray(gc, dt) * t
        tw = jnp.asarray(hc, dt) * t
        v1 = tv if v1 is None else v1 + tv
        w1 = tw if w1 is None else w1 + tw
    v1_ref[:] = v1
    w1_ref[:] = w1


def _inv_kernel(v_ref, w_ref, o_ref, *, g, h, dil):
    v = v_ref[:]
    w = w_ref[:]
    dt = v.dtype
    out = None
    for n_, (gc, hc) in enumerate(zip(g, h)):
        t = jnp.asarray(hc, dt) * roll(w, -n_ * dil, v.ndim - 1) \
            + jnp.asarray(gc, dt) * roll(v, -n_ * dil, v.ndim - 1)
        out = t if out is None else out + t
    o_ref[:] = out


def _pick_tm(b: int, n: int, flen: int, itemsize: int) -> int | None:
    budget_elems = (12 << 20) // itemsize // (flen + 6)
    tm = 256
    while tm > 8 and (tm * n > budget_elems or b % tm):
        tm //= 2
    return tm if (b % tm == 0 and tm * n <= budget_elems) else None


def pallas_ok(shape, wt: OrthoFilter, dtype) -> bool:
    if len(shape) != 2:
        return False
    # this Mosaic lacks non-32-bit lane rotates ('Rotate with non-32-bit
    # data'), so bfloat16 is excluded until the rolls get a 32-bit cast path
    if np.dtype(dtype) != np.dtype(np.float32):
        return False
    b, n = shape
    if n % 128 or b % 8:
        return False
    return _pick_tm(b, n, len(wt.qmf), np.dtype(dtype).itemsize) is not None


def _step(v, wt, j: int, fw: bool, w=None):
    b, n = v.shape
    g, h = modwt_filter_pair(wt)
    dil = 2 ** (j - 1) % n
    tm = _pick_tm(b, n, len(wt.qmf), np.dtype(v.dtype).itemsize)
    spec = pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    if fw:
        return pl.pallas_call(
            partial(_fw_kernel, g=g, h=h, dil=dil),
            grid=(b // tm,),
            in_specs=[spec],
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((b, n), v.dtype),
                       jax.ShapeDtypeStruct((b, n), v.dtype)),
        )(v)
    return pl.pallas_call(
        partial(_inv_kernel, g=g, h=h, dil=dil),
        grid=(b // tm,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n), v.dtype),
    )(v, w)


def modwt_pallas(x, wt: OrthoFilter, L: int):
    """(B, N) batched MODWT -> (B, N, L+1)."""
    v = x
    cols = []
    for j in range(1, L + 1):
        v, w = _step(v, wt, j, fw=True)
        cols.append(w)
    cols.append(v)
    return jnp.stack(cols, axis=-1)


def imodwt_pallas(xw, wt: OrthoFilter):
    """(B, N, L+1) -> (B, N)."""
    L = xw.shape[-1] - 1
    v = xw[..., L]
    for j in range(L, 0, -1):
        v = _step(v, wt, j, fw=False, w=xw[..., j - 1])
    return v
