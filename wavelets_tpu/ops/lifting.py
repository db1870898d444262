"""Lifting-scheme DWT engine (periodic boundary, GLS).

TPU-first design: the reference's in-place predict/update stencils with
explicit boundary ranges (src/Transforms/transforms_lifting.jl:323-483)
become functional rolls — each lifting step writes one half reading only
the other half, so a step is

    s <- s -/+ sum_k c[k] * roll(d, shift - k)     (predict)
    d <- d -/+ sum_k c[k] * roll(s, shift - k)     (update)

where roll is a periodic shift along the last axis (this uniformly covers
the reference's in-bounds fast path and its mod1 boundary path).  XLA fuses
the whole step chain into a handful of elementwise kernels; the fused
Pallas versions live in ops/pallas/lifting2d.py and ops/pallas/fused2d.py.

Boundaries beyond periodic (an extension — the reference declares
ZPBoundary/SymBoundary but implements neither, src/WT/wt_main.jl:33-49):
because each lifting step reads only the *other*, fully-known half, the
inverse can re-apply the identical extension and subtract it back, so ANY
deterministic extension rule gives exact reconstruction at same-size
coefficient arrays.  "zeropad" treats out-of-range reads as 0; "symmetric"
uses half-sample reflection (ext[-j] = x[j-1], ext[n-1+j] = x[n-j]) of the
kept half at every level.  A step's roll wraps at most |shift - k| edge
entries, so the non-periodic variants are the periodic roll plus an O(|sh|)
edge overwrite — XLA fuses the fix-up into the same elementwise kernel.

Forward: split even/odd -> steps with negated coefficients -> scale halves
by (norm1, norm2).  Inverse: scale by reciprocals -> steps reversed with
original coefficients -> re-interleave.  (makescheme,
src/Transforms/transforms_lifting.jl:13-25.)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..wt.carriers import GLS, PERIODIC
from ..wt.schemes import PREDICT

__all__ = [
    "split_last", "merge_last", "lift_steps",
    "lifting_level_fw", "lifting_level_inv",
    "dwt1d_lifting", "idwt1d_lifting", "dwt_nd_lifting", "idwt_nd_lifting",
]


def split_last(x):
    """Deinterleave the last axis: (s, d) = (x[..., 0::2], x[..., 1::2]).

    The reference's split! puts 1-based odd entries (0-based even) first
    (src/Util/util_main.jl:133-204).  Implemented as a pair reshape rather
    than stride-2 slices — XLA:TPU lowers the strided gather ~3x slower.
    """
    r = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    return r[..., 0], r[..., 1]


def merge_last(s, d):
    """Re-interleave: inverse of split_last (src/Util/util_main.jl:207-278)."""
    n = s.shape[-1] + d.shape[-1]
    return jnp.stack([s, d], axis=-1).reshape(*s.shape[:-1], n)


def _fix_edges(term, src, sh: int, boundary: str):
    """Overwrite the |sh| entries of ``term = roll(src, sh)`` that wrapped
    around, with the boundary-extension values src_ext[i - sh] instead.

    Half-sample symmetric reflection: ext[-j] = src[j-1] means positions
    [0, sh) read flip(src[:sh]); ext[n-1+j] = src[n-j] means positions
    [n+sh, n) read flip(src[sh:]).  Exact for |sh| <= n (checked by the
    caller); zeropad writes zeros.
    """
    zero = boundary != "symmetric"
    if sh > 0:
        fix = jnp.zeros_like(term[..., :sh]) if zero \
            else jnp.flip(src[..., :sh], axis=-1)
        return term.at[..., :sh].set(fix)
    fix = jnp.zeros_like(term[..., sh:]) if zero \
        else jnp.flip(src[..., sh:], axis=-1)
    return term.at[..., sh:].set(fix)


def _step_sum(src, coef, shift: int, boundary: str = PERIODIC):
    """sum_k coef[k] * src_ext[i + k - shift] as rolls along -1 (periodic:
    mod half; other boundaries: rolls + edge fix-up)."""
    n = src.shape[-1]
    acc = None
    for k, c in enumerate(coef):
        sh = shift - k
        term = jnp.roll(src, sh, axis=-1) if sh != 0 else src
        if sh != 0 and boundary != PERIODIC:
            if abs(sh) > n:
                raise NotImplementedError(
                    f"boundary {boundary!r} needs half length >= the step "
                    f"reach |{sh}| (transform fewer levels)")
            term = _fix_edges(term, src, sh, boundary)
        term = c * term
        acc = term if acc is None else acc + term
    return acc


def lift_steps(s, d, scheme: GLS, fw: bool):
    """Apply the scheme's step sequence to the (s, d) pair."""
    steps = scheme.steps if fw else scheme.steps[::-1]
    sign = -1.0 if fw else 1.0
    bd = scheme.boundary
    for step in steps:
        if step.kind == PREDICT:
            s = s + sign * _step_sum(d, step.coef, step.shift, bd)
        else:
            d = d + sign * _step_sum(s, step.coef, step.shift, bd)
    return s, d


def lifting_level_fw(x, scheme: GLS):
    """One forward lifting level along the last axis -> (s, d)."""
    from ..wt.factor import check_boundary_stability
    check_boundary_stability(scheme, x.dtype)
    s, d = split_last(x)
    s, d = lift_steps(s, d, scheme, fw=True)
    dt = x.dtype
    return s * jnp.asarray(scheme.norm1, dt), d * jnp.asarray(scheme.norm2, dt)


def lifting_level_inv(s, d, scheme: GLS):
    """One inverse lifting level along the last axis -> x."""
    from ..wt.factor import check_boundary_stability
    check_boundary_stability(scheme, s.dtype)
    dt = s.dtype
    s = s * jnp.asarray(1.0 / scheme.norm1, dt)
    d = d * jnp.asarray(1.0 / scheme.norm2, dt)
    s, d = lift_steps(s, d, scheme, fw=False)
    return merge_last(s, d)


# --- multi-level, multi-dimensional drivers ---------------------------------

def dwt1d_lifting(x, scheme: GLS, L: int):
    if L == 0:
        return x
    s = x
    details = []
    for _ in range(L):
        s, d = lifting_level_fw(s, scheme)
        details.append(d)
    return jnp.concatenate([s] + details[::-1], axis=-1)


def idwt1d_lifting(y, scheme: GLS, L: int):
    if L == 0:
        return y
    n = y.shape[-1]
    s = y[..., : n >> L]
    for l in range(L, 0, -1):
        d = y[..., n >> l: n >> (l - 1)]
        s = lifting_level_inv(s, d, scheme)
    return s


def _level_along_axis(active, scheme, axis: int, fw: bool):
    moved = jnp.moveaxis(active, axis, -1) if axis != -1 else active
    if fw:
        s, d = lifting_level_fw(moved, scheme)
        out = jnp.concatenate([s, d], axis=-1)
    else:
        half = moved.shape[-1] // 2
        out = lifting_level_inv(moved[..., :half], moved[..., half:], scheme)
    return jnp.moveaxis(out, -1, axis) if axis != -1 else out


def dwt_nd_lifting(x, scheme: GLS, L: int, ndt: int):
    """Separable multi-dim lifting DWT; same axis/level ordering as the
    filter engine (reference: transforms_lifting.jl:158-191, 230-277).

    The reference restricts lifting to square/cubic arrays
    (transforms_lifting.jl:132); this implementation lifts that
    restriction — any per-axis size divisible by 2^L works.
    """
    if L == 0:
        return x
    y = x
    tshape = x.shape[-ndt:]
    for l in range(L):
        sub = tuple(s >> l for s in tshape)
        idx = (Ellipsis,) + tuple(slice(0, s) for s in sub)
        active = y[idx]
        for axis in range(-1, -ndt - 1, -1):
            active = _level_along_axis(active, scheme, axis, fw=True)
        y = active if all(a == b for a, b in zip(sub, tshape)) \
            else y.at[idx].set(active)
    return y


def idwt_nd_lifting(y, scheme: GLS, L: int, ndt: int):
    if L == 0:
        return y
    x = y
    tshape = y.shape[-ndt:]
    for l in range(L, 0, -1):
        sub = tuple(s >> (l - 1) for s in tshape)
        idx = (Ellipsis,) + tuple(slice(0, s) for s in sub)
        active = x[idx]
        for axis in range(-ndt, 0):
            active = _level_along_axis(active, scheme, axis, fw=False)
        x = active if all(a == b for a, b in zip(sub, tshape)) \
            else x.at[idx].set(active)
    return x
