"""Subband-pytree API: the TPU-native coefficient layout.

The packed array layout (reference parity) interleaves every level into
one buffer — convenient for storage, but device code mostly wants the
subbands separately: thresholding is elementwise per band, per-level
processing needs no index math, and sharded execution keeps every band
row-sharded without resharding the packed prefix.

``dwt_subbands`` returns ``{"ll": <coarse>, "levels": [(lh, hl, hh), ...]}``
for 2-D inputs (level 1 first), and ``{"s": <coarse>, "d": [d1, d2, ...]}``
for 1-D.  ``from_packed``/``to_packed`` convert between layouts (pure
slicing/concatenation — one fused pass).
"""

from __future__ import annotations

import jax.numpy as jnp

from .utils.indexing import maxtransformlevels
from .wt.carriers import DiscreteWavelet
from .transforms import dwt, idwt, _as_float

__all__ = [
    "dwt_subbands", "idwt_subbands", "to_packed", "from_packed",
]


def _split_packed_1d(y, L: int):
    n = y.shape[-1]
    return {
        "s": y[..., : n >> L],
        "d": [y[..., n >> l: n >> (l - 1)] for l in range(1, L + 1)],
    }


def _split_packed_2d(y, L: int):
    m, n = y.shape[-2:]
    levels = []
    for l in range(1, L + 1):
        mh, nh = m >> l, n >> l
        levels.append((y[..., :mh, nh: 2 * nh],
                       y[..., mh: 2 * mh, :nh],
                       y[..., mh: 2 * mh, nh: 2 * nh]))
    return {"ll": y[..., : m >> L, : n >> L], "levels": levels}


def from_packed(y, L: int, ndt: int = None):
    """Packed coefficient array -> subband pytree."""
    y = jnp.asarray(y)
    ndt = min(y.ndim, 2) if ndt is None else ndt
    if ndt == 1:
        return _split_packed_1d(y, L)
    if ndt == 2:
        return _split_packed_2d(y, L)
    raise ValueError("subband API supports ndt in (1, 2)")


def to_packed(bands):
    """Subband pytree -> packed coefficient array."""
    if "s" in bands:  # 1-D
        y = bands["s"]
        for d in reversed(bands["d"]):
            y = jnp.concatenate([y, d], axis=-1)
        return y
    y = bands["ll"]
    for lh, hl, hh in reversed(bands["levels"]):
        y = jnp.concatenate([
            jnp.concatenate([y, lh], axis=-1),
            jnp.concatenate([hl, hh], axis=-1)], axis=-2)
    return y


def dwt_subbands(x, wt: DiscreteWavelet, L: int | None = None,
                 *, ndt: int | None = None):
    """Forward DWT returning the subband pytree (1-D and 2-D)."""
    x = _as_float(x)
    ndt_eff = min(x.ndim, 2) if ndt is None else ndt
    if L is None:
        L = maxtransformlevels(x.shape[-ndt_eff:])
    y = dwt(x, wt, L, ndt=ndt_eff)
    return from_packed(y, int(L), ndt_eff)


def idwt_subbands(bands, wt: DiscreteWavelet):
    """Inverse DWT from a subband pytree."""
    if "s" in bands:
        L = len(bands["d"])
        return idwt(to_packed(bands), wt, L, ndt=1)
    L = len(bands["levels"])
    return idwt(to_packed(bands), wt, L, ndt=2)
