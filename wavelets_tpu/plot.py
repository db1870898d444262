"""Visualization data preparation (host-side NumPy; no plotting backend).

reference: src/Plot/plot_main.jl.  wplotim's 3-D color path calls the
per-channel transform dwtc, which the reference declares but never defines
(plot_main.jl:73 vs transforms_main.jl:180); here dwtc exists (see
transforms.py) so that path works.
"""

from __future__ import annotations

import numpy as np

from .utils.indexing import (
    isdyadic, ndyadicscales, dyadicdetailrange, dyadicdetailindex,
    dyadicdetailn,
)
from .transforms import dwt, dwtc

__all__ = ["wplotdots", "wplotim"]


def wplotdots(x, t: float = 0.0, r: float = 1.0):
    """(positions, levels) of 1-D packed detail coefs with |coef| >= t,
    centers scaled to [0, r)."""
    x = np.asarray(x)
    if not isdyadic(x):
        raise ValueError("array must be of dyadic size")
    n = len(x)
    J = ndyadicscales(n)
    d, l = [], []
    grid = np.arange(n) / n * r
    for j in range(J):
        centers = np.arange(2 ** (J - 1 - j) - 1, n, 2 ** (J - j))
        for i in range(dyadicdetailn(j)):
            if abs(x[dyadicdetailindex(j, i)]) >= t:
                d.append(grid[centers[i]])
                l.append(j)
    return np.array(d), np.array(l, dtype=int)


def _wplotim_1d(x):
    """J x n image: row j broadcasts the level-j detail coefficients."""
    x = np.asarray(x)
    if not isdyadic(x):
        raise ValueError("array must be of dyadic size")
    n = len(x)
    J = ndyadicscales(n)
    A = np.zeros((J, n))
    for j in range(J):
        dr = dyadicdetailrange(j)
        m = 2 ** (J - j)
        for i, p in enumerate(dr):
            A[j, i * m: (i + 1) * m] = x[p]
    return A


def _scale01(z):
    mi, ma = np.min(z), np.max(z)
    rng = ma - mi
    if rng == 0:
        return np.zeros_like(z)
    return (z - mi) / rng


def _wplotim_nd(x, L: int, wt=None, *, wabs=True, power=0.7, pnorm=1):
    x = np.asarray(x)
    if not np.issubdtype(x.dtype, np.floating):
        x = x.astype(np.float64)
    if x.ndim not in (2, 3):
        raise ValueError(f"dimension {x.ndim} not supported")
    # dyadic check on the spatial dims only (the reference checks every dim,
    # which would reject its own documented (n, n, 3) color case)
    if not all(isdyadic(int(s)) for s in x.shape[:2]):
        raise ValueError("array must be of dyadic size")
    n = x.shape[0]
    cn = x.shape[2] if x.ndim == 3 else 1
    if x.shape[1] != n:
        raise ValueError("array must be square")
    if cn not in (1, 3):
        raise ValueError(f"third dimension {cn} not supported")
    J = ndyadicscales(n)
    nsc = 2 ** (J - L)

    if wt is not None:
        if x.ndim == 3:
            # per-channel 2-D transform — also for (n, n, 1) grayscale
            # (dwt's default ndt=3 would reject the size-1 axis;
            # code-review r5)
            x = np.asarray(dwtc(x, wt, L))
        else:
            x = np.asarray(dwt(x, wt, L))

    x3 = x if x.ndim == 3 else x[:, :, None]
    scs = _scale01(x3[:nsc, :nsc, :].copy())

    xts = np.abs(x3) if wabs else x3.copy()
    xts[:nsc, :nsc, :] = 0
    xts = _scale01(xts)
    nrm = np.linalg.norm(xts, ord=pnorm, axis=2) if pnorm != 1 \
        else np.sum(np.abs(xts), axis=2)
    xts = np.repeat((nrm ** power)[:, :, None], xts.shape[2], axis=2)

    xts = _scale01(xts)
    xts[:nsc, :nsc, :] = scs
    return xts if x.ndim == 3 else xts[:, :, 0]


def wplotim(x, L: int | None = None, wt=None, **kw):
    """Coefficient image for plotting: 1-D packed vectors get a J x n level
    image; 2-D/3-D arrays get the power-law detail image of the transform."""
    x = np.asarray(x)
    if x.ndim == 1:
        return _wplotim_1d(x)
    if L is None:   # default: the full dyadic depth of the square size
        from .utils.indexing import maxtransformlevels
        L = maxtransformlevels(x.shape[0])
    return _wplotim_nd(x, int(L), wt, **kw)
