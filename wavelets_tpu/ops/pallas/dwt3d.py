"""3-D separable DWT on Pallas kernels.

Per level (reference axis order, transforms_filter.jl:240-266): the last
axis runs as a batched-1-D fused kernel on the (d*m, n) reshape; the middle
axis as the generic axis-0 kernel vmapped over the leading axis; the
leading axis as the axis-0 kernel on the (d, m*n) reshape.  All reshapes
are free (row-major); each axis pass is ~2 HBM passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import dwt1d, axis0

__all__ = ["dwt3_pallas", "idwt3_pallas", "pallas_ok"]


def _level_ok(shape, wt, dtype) -> bool:
    dd, mm, nn = shape
    rows_ok = (dwt1d._level_ok(dd * mm, nn, wt, dtype)
               or (dwt1d._mxu_on()
                   and dwt1d._mxu_level_plan(dd * mm, nn, wt, dtype)
                   is not None))
    return (rows_ok
            and axis0.axis0_ok(mm, nn, wt, dtype)
            and axis0.axis0_ok(dd, mm * nn, wt, dtype))


def pallas_ok(shape, wt, L: int, dtype) -> bool:
    if len(shape) != 3 or L < 1:
        return False
    return _level_ok(shape, wt, dtype)


def _fused2d_on(shape, wt, dtype) -> bool:
    import os
    if os.environ.get("WAVELETS_TPU_FUSED2D") == "0":
        return False
    from . import fused2d
    dd, mm, nn = shape
    return fused2d.fused_ok(mm, nn, wt, dtype)


def _mxu2d_on(shape, wt, dtype) -> bool:
    import os
    if os.environ.get("WAVELETS_TPU_MXU2D") == "0":
        return False
    from . import mxu2d
    dd, mm, nn = shape
    return mxu2d.mxu_ok(mm, nn, wt, dtype)


def _level_fw(active, wt):
    dd, mm, nn = active.shape
    if _mxu2d_on(active.shape, wt, active.dtype):
        # rows+cols of every slab via the MXU level kernel, then planes
        from . import mxu2d
        ll, lh, hl, hh = jax.vmap(
            lambda s: mxu2d.mxu_level_fw_quads(s, wt))(active)
        z = jnp.concatenate([jnp.concatenate([ll, lh], -1),
                             jnp.concatenate([hl, hh], -1)], -2)
        z = axis0.axis0_level_fw(z.reshape(dd, mm * nn), wt)
        return z.reshape(dd, mm, nn)
    if _fused2d_on(active.shape, wt, active.dtype):
        # rows+cols of every slab in ONE vmapped fused pass (~2.3 HBM
        # passes instead of 4), then the plane axis
        from . import fused2d
        ll, lh, hl, hh = jax.vmap(
            lambda s: fused2d.fused_level_fw_quads(s, wt))(active)
        z = jnp.concatenate([jnp.concatenate([ll, lh], -1),
                             jnp.concatenate([hl, hh], -1)], -2)
    else:
        # axis 2 (rows)
        z = dwt1d._level(active.reshape(dd * mm, nn), wt, fw=True)
        z = z.reshape(dd, mm, nn)
        # axis 1 (per-slab axis 0) — vmap over the leading axis
        z = jax.vmap(lambda s: axis0.axis0_level_fw(s, wt))(z)
    # axis 0
    z = axis0.axis0_level_fw(z.reshape(dd, mm * nn), wt)
    return z.reshape(dd, mm, nn)


def _level_inv(active, wt):
    dd, mm, nn = active.shape
    z = axis0.axis0_level_inv(active.reshape(dd, mm * nn), wt)
    z = z.reshape(dd, mm, nn)
    import os
    from . import fused2d, mxu2d
    if os.environ.get("WAVELETS_TPU_MXU2D") != "0" and \
            mxu2d.mxu_inv_ok(mm, nn, wt, active.dtype):
        return jax.vmap(
            lambda s: mxu2d.mxu_inv_packed(s, s[: mm // 2, : nn // 2],
                                           (mm, nn), wt))(z)
    if os.environ.get("WAVELETS_TPU_FUSED_INV") == "1" and \
            _fused2d_on(active.shape, wt, active.dtype) and \
            fused2d.fused_inv_ok(mm, nn, wt, active.dtype):
        z = jax.vmap(
            lambda s: fused2d.level_inv_packed(s, s[: mm // 2, : nn // 2],
                                               (mm, nn), wt))(z)
    else:
        z = jax.vmap(lambda s: axis0.axis0_level_inv(s, wt))(z)
        z = dwt1d._level(z.reshape(dd * mm, nn), wt, fw=False)
        z = z.reshape(dd, mm, nn)
    return z


def _level_jnp(active, wt, fw: bool):
    from .. import filter_fb as F, lifting as Lf
    from ...wt.carriers import OrthoFilter
    if isinstance(wt, OrthoFilter):
        h, g = F.filter_pair(wt)
        fn = (lambda v: jnp.concatenate(F.dwt_level(v, h, g), -1)) if fw else \
            (lambda v: F.idwt_level(v[..., : v.shape[-1] // 2],
                                    v[..., v.shape[-1] // 2:], h, g))
    else:
        fn = (lambda v: jnp.concatenate(Lf.lifting_level_fw(v, wt), -1)) if fw \
            else (lambda v: Lf.lifting_level_inv(
                v[..., : v.shape[-1] // 2], v[..., v.shape[-1] // 2:], wt))
    axes = (-1, -2, -3) if fw else (-3, -2, -1)
    z = active
    for ax in axes:
        moved = jnp.moveaxis(z, ax, -1) if ax != -1 else z
        out = fn(moved)
        z = jnp.moveaxis(out, -1, ax) if ax != -1 else out
    return z


def dwt3_pallas(x, wt, L: int):
    y = x
    shape = x.shape
    for l in range(L):
        sub = tuple(s >> l for s in shape)
        idx = tuple(slice(0, s) for s in sub)
        active = y[idx]
        out = _level_fw(active, wt) if _level_ok(sub, wt, x.dtype) \
            else _level_jnp(active, wt, True)
        y = out if l == 0 else y.at[idx].set(out)
    return y


def idwt3_pallas(y, wt, L: int):
    x = y
    shape = y.shape
    for l in range(L, 0, -1):
        sub = tuple(s >> (l - 1) for s in shape)
        idx = tuple(slice(0, s) for s in sub)
        active = x[idx]
        out = _level_inv(active, wt) if _level_ok(sub, wt, y.dtype) \
            else _level_jnp(active, wt, False)
        x = out if sub == shape else x.at[idx].set(out)
    return x
