"""Thresholding operators (functional; elementwise ops fuse under XLA).

Mirrors the reference operator set (src/Threshold/threshold_main.jl):
hard, soft, semisoft, stein, biggest-m-term, pos, neg.  Operators are
singleton marker objects so call sites read like the reference
(``threshold(x, HardTH(), t)``); each lowers to a single fused jnp
expression.  BiggestTH uses jax.lax.top_k instead of a host sort.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = [
    "THType", "HardTH", "SoftTH", "SemiSoftTH", "SteinTH", "BiggestTH",
    "PosTH", "NegTH", "threshold", "DEFAULT_TH",
]


@dataclasses.dataclass(frozen=True)
class THType:
    pass


@dataclasses.dataclass(frozen=True)
class HardTH(THType):
    """x -> 0 where |x| <= t."""


@dataclasses.dataclass(frozen=True)
class SoftTH(THType):
    """x -> sign(x) * max(|x| - t, 0)."""


@dataclasses.dataclass(frozen=True)
class SemiSoftTH(THType):
    """0 for |x|<=t, linear ramp sign(x)*2(|x|-t) for t<|x|<2t, identity above."""


@dataclasses.dataclass(frozen=True)
class SteinTH(THType):
    """x -> x * max(1 - t^2/x^2, 0)."""


@dataclasses.dataclass(frozen=True)
class BiggestTH(THType):
    """Keep the m largest-magnitude coefficients, zero the rest."""


@dataclasses.dataclass(frozen=True)
class PosTH(THType):
    """Zero positive entries."""


@dataclasses.dataclass(frozen=True)
class NegTH(THType):
    """Zero negative entries."""


DEFAULT_TH = HardTH()


def _biggest(x, m: int):
    n = x.size
    m = max(0, min(int(m), n))
    if m == 0:
        return jnp.zeros_like(x)
    flat = x.reshape(-1)
    mag = jnp.abs(flat)
    # threshold at the m-th largest magnitude; keep >= cutoff, then trim
    # possible ties to exactly m by ranking
    _, idx = jax.lax.top_k(mag, m)
    keep = jnp.zeros(n, dtype=bool).at[idx].set(True)
    return jnp.where(keep, flat, 0).reshape(x.shape)


def threshold(x, th: THType, t=None):
    """Apply a thresholding operator; returns a new array.

    For BiggestTH, ``t`` is the integer m (number of kept coefficients);
    otherwise the non-negative threshold value.
    """
    x = jnp.asarray(x)
    if isinstance(th, BiggestTH):
        return _biggest(x, t)
    if isinstance(th, PosTH):
        return jnp.where(x > 0, 0, x)
    if isinstance(th, NegTH):
        return jnp.where(x < 0, 0, x)

    t = jnp.asarray(t, dtype=x.real.dtype)
    mag = jnp.abs(x)
    if isinstance(th, HardTH):
        return jnp.where(mag <= t, 0, x)
    if isinstance(th, SoftTH):
        sh = mag - t
        return jnp.where(sh < 0, 0, jnp.sign(x) * sh)
    if isinstance(th, SemiSoftTH):
        sh = mag - t
        ramp = jnp.sign(x) * sh * 2
        # |x| >= 2t already passes through unchanged via the inner
        # where (sh >= t  <=>  |x| >= 2t) — no extra gate needed, and
        # the old signed-x gate was dead code that would have broken
        # negative coefficients had the inner where ever changed
        return jnp.where(sh < 0, 0, jnp.where(sh < t, ramp, x))
    if isinstance(th, SteinTH):
        sh = 1 - t * t / (x * x)
        return jnp.where(sh < 0, 0, x * sh)
    raise ValueError(f"unknown threshold type {th!r}")
