"""Distributed application layer: sharded best-basis, noise estimation,
and denoising (SURVEY §2.3/§3.5 — the psum story).

The reference's application layer is single-process (entropy.jl,
denoising.jl); these drivers map it onto a device mesh:

* ``bestbasistree`` — the per-depth segment entropy sums of the
  Coifman–Wickerhauser search (the reduction at
  /root/reference/src/Threshold/entropy.jl:74) become an explicit
  ``lax.psum`` across shards: every device scatters its local partial
  sums into a length-2^d segment vector and one psum yields the
  replicated per-segment entropies.  The per-depth packet transform runs
  under GSPMD with a sharding constraint that keeps deep (segment-local)
  depths fully local and lets XLA insert the ring collectives for the
  shallow depths whose segments span devices.  The min-prune over the
  tiny entropy heap stays host-side, exactly like the single-device path.
* ``noisest`` — the level-1 detail MAD (denoising.jl:94-110) on a
  sharded array: the one-level transform runs on the mesh
  (parallel.dwt2/dwt3), and the two nested medians run as distributed
  sorts under GSPMD (the band is O(n/2) — gather-equivalent, as SURVEY
  §3.5 prescribes for the small detail band).
* ``denoise`` — sharded VisuShrink: noisest -> sharded dwt -> elementwise
  threshold (trivially sharded) -> sharded idwt, composing the
  collectives of the transform layer; the TI variant cycle-spins the
  sharded pipeline serially over the shift grid (shifts of a row-sharded
  array are one collective-permute each).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7: public API (the experimental path is deprecated)
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..utils.indexing import maxtransformlevels
from ..utils.trees import maketree, isvalidtree
from ..threshold.entropy import (Entropy, ShannonEntropy, _coef_terms,
                                 prune_tree)
from ..threshold.denoise import VisuShrink, DEFAULT_WAVELET
from ..threshold.ops import threshold as _threshold
from ..ops.pallas.dwt1d import _level_jnp
from ..wt.carriers import DiscreteWavelet
from . import sharded
from .sharded import make_mesh

__all__ = ["bestbasistree", "noisest", "denoise"]


def _seg_entropies(x, et: Entropy, nrm, nseg: int, mesh: Mesh,
                   axis: str):
    """Per-segment entropy sums of a sharded 1-D signal: local partial
    sums scattered into a (nseg,) vector + one psum (entropy.jl:74's
    reduction, distributed)."""
    n = x.shape[0]
    nd = mesh.shape[axis]
    loc = n // nd
    nj = n // nseg

    def body(xl):
        xl = xl.reshape(-1)
        j = lax.axis_index(axis)
        e = jnp.zeros((nseg,), xl.dtype)
        if nj >= loc:
            # chunk lies inside one segment: one scalar partial sum
            seg = j * loc // nj
            e = e.at[seg].add(jnp.sum(_coef_terms(xl, et, nrm)))
        else:
            # whole segments are local: a contiguous run of segment sums
            sums = jnp.sum(_coef_terms(xl.reshape(loc // nj, nj), et, nrm),
                           axis=-1)
            e = lax.dynamic_update_slice(e, sums, (j * (loc // nj),))
        return lax.psum(e, axis)

    return shard_map(body, mesh=mesh, in_specs=(P(axis),),
                     out_specs=P())(x)


def _global_norm(x, mesh: Mesh, axis: str):
    """Replicated l2 norm of a sharded signal via psum of local sums."""
    def body(xl):
        return jnp.sqrt(lax.psum(jnp.sum(xl * xl), axis))
    return shard_map(body, mesh=mesh, in_specs=(P(axis),),
                     out_specs=P())(x)


def bestbasistree(y, wt: DiscreteWavelet, L: int | None = None,
                  tree: np.ndarray | None = None,
                  et: Entropy = ShannonEntropy(),
                  mesh: Mesh | None = None,
                  axis_name: str = "x") -> np.ndarray:
    """Distributed best-basis search for a mesh-sharded 1-D signal.

    Matches ``threshold.bestbasistree`` exactly (same prune on the same
    entropies); the entropy reductions run as psums across shards and the
    packet levels run under GSPMD.  ``y`` should be sharded P(axis_name)
    over ``mesh``.
    """
    if mesh is None:
        mesh = make_mesh(axis=axis_name)
    y = jnp.asarray(y)
    if y.ndim != 1:
        raise ValueError("bestbasistree expects a 1-D signal")
    n = y.shape[0]
    nd = mesh.shape[axis_name]
    Lmax = maxtransformlevels(n)
    if tree is None:
        tree = maketree(n, Lmax if L is None else int(L), "full")
    if not isvalidtree(n, tree):
        raise ValueError("invalid tree")

    nrm = _global_norm(y, mesh, axis_name)

    x = y
    entr_bf = []
    for d in range(Lmax):
        nseg = 2 ** d
        nj = n // nseg
        entr_bf.append(_seg_entropies(x, et, nrm, nseg, mesh, axis_name))
        # one packet level: segment-batched; deep (local) depths stay
        # shard-local, shallow depths let GSPMD insert the ring collectives
        segs = x.reshape(nseg, nj)
        spec = P(axis_name, None) if nseg >= nd else P(None, axis_name)
        segs = lax.with_sharding_constraint(
            segs, NamedSharding(mesh, spec))
        x = _level_jnp(segs, wt, fw=True).reshape(n)
        x = lax.with_sharding_constraint(x, NamedSharding(mesh, P(axis_name)))
    entr_bf = np.asarray(jnp.concatenate(entr_bf)) if entr_bf else np.zeros(0)

    n_af = 2 ** (Lmax - 1)
    entr_af = np.asarray(_seg_entropies(x, et, nrm, n_af, mesh, axis_name))

    return prune_tree(np.asarray(tree, dtype=bool), entr_bf, entr_af, n)


def noisest(x, wt: DiscreteWavelet | None = DEFAULT_WAVELET, L: int = 1,
            mesh: Mesh | None = None, axis_name: str = "x"):
    """Distributed noise-sigma estimate of a sharded 2-D/3-D array: MAD of
    the level-L detail-row band / 0.6745 (denoising.jl:94-110; same
    detail-band divergence as ``threshold.noisest`` — see PARITY.md)."""
    if mesh is None:
        mesh = make_mesh(axis=axis_name)
    x = jnp.asarray(x)
    if wt is None:
        y = x
    else:
        y = sharded._dwt_sharded_jit(x, wt, int(L), mesh, axis_name, True)
    m = y.shape[0]
    dr = y[m >> L: m >> (L - 1)].reshape(-1)
    med = jnp.median(dr)
    return jnp.median(jnp.abs(dr - med)) / 0.6745


def denoise(x, wt: DiscreteWavelet | None = DEFAULT_WAVELET, *,
            L: int | None = None, dnt=None, TI: bool = False,
            nspin: int | None = None,
            mesh: Mesh | None = None, axis_name: str = "x"):
    """Sharded VisuShrink denoising of a row-sharded 2-D/3-D array:
    sigma (distributed MAD) -> sharded dwt -> threshold -> sharded idwt
    (the denoise stack of denoising.jl:22-82 on a mesh).  ``TI=True``
    cycle-spins the sharded pipeline over an ``nspin``-per-axis shift
    grid (rolls of a sharded array = one collective-permute each),
    accumulating a running sum — peak memory is one extra array."""
    if mesh is None:
        mesh = make_mesh(axis=axis_name)
    x = jnp.asarray(x)
    if L is None:
        L = min(maxtransformlevels(x), 6)
    if dnt is None:
        dnt = VisuShrink.for_length(x.shape[0])
    sigma = noisest(x, wt, 1, mesh, axis_name)
    t = sigma * dnt.t
    if wt is None:
        return _threshold(x, dnt.th, t)

    def pipe(v):
        y = sharded._dwt_sharded_jit(v, wt, int(L), mesh, axis_name, True)
        y = _threshold(y, dnt.th, t)
        return sharded._dwt_sharded_jit(y, wt, int(L), mesh, axis_name, False)

    if not TI:
        return pipe(x)

    if nspin is None:
        nspin = 8
    shifts = [tuple(c) for c in np.ndindex(*(int(nspin),) * x.ndim)]
    acc = jnp.zeros_like(x)
    for sh in shifts:
        z = x
        for ax, s in enumerate(sh):
            if s:
                z = jnp.roll(z, s, axis=ax)
        z = pipe(z)
        for ax, s in enumerate(sh):
            if s:
                z = jnp.roll(z, -s, axis=ax)
        acc = acc + z
    return acc / len(shifts)
