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
from ..transforms import _as_float
from ..utils.trees import maketree, isvalidtree, treedepth
from ..threshold.entropy import (Entropy, ShannonEntropy, _coef_terms,
                                 prune_tree_device)
from ..threshold.denoise import VisuShrink, DEFAULT_WAVELET
from ..threshold.ops import threshold as _threshold
from ..ops.pallas.dwt1d import _level_jnp
from ..ops import modwt as modwt_ops
from ..wt.carriers import DiscreteWavelet, OrthoFilter
from . import sharded
from .sharded import make_mesh

__all__ = ["bestbasistree", "noisest", "denoise", "wpt", "iwpt",
           "modwt", "imodwt"]


def _mesh_dwt(v, wt, L: int, mesh: Mesh, axis_name: str, fw: bool):
    """Route a sharded multi-level DWT by mesh rank: 1-axis meshes take
    the ring drivers (sharded.py); 2-axis meshes the grid drivers
    (mesh2d.py) — so the app layer (noisest/denoise) runs unchanged on
    P('x','y') grids."""
    if len(mesh.axis_names) == 2:
        from . import mesh2d
        if v.ndim == 2:
            return mesh2d._dwt2_grid_jit(v, wt, int(L), mesh, fw)
        if v.ndim == 3:
            return mesh2d._dwt3_grid_jit(v, wt, int(L), mesh, fw)
        # other ranks (e.g. 1-D signals): ring driver over the first
        # mesh axis, second axis replicated — same behavior as before
        # the grid dispatch existed
        return sharded._dwt_sharded_jit(v, wt, int(L), mesh,
                                        mesh.axis_names[0], fw)
    return sharded._dwt_sharded_jit(v, wt, int(L), mesh, axis_name, fw)


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
    sharded._require_periodic(wt)
    y = _as_float(y)
    if y.ndim != 1:
        raise ValueError("bestbasistree expects a 1-D signal")
    n = y.shape[0]
    nd = mesh.shape[axis_name]
    # _seg_entropies' scatter requires shard chunks to nest with segment
    # boundaries at EVERY depth, which holds iff the device count is a
    # power of two dividing n.  Other meshes fall back to the replicated
    # host-path search (the signal is 1-D and small relative to HBM;
    # correctness beats the psum on an awkward mesh).
    if n % nd or nd & (nd - 1):
        from ..threshold.entropy import bestbasistree as _local_bbt
        return _local_bbt(y, wt, L=L, tree=tree, et=et)
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

    n_af = 2 ** (Lmax - 1)
    entr_af = _seg_entropies(x, et, nrm, n_af, mesh, axis_name)

    # min-prune on device (packed-bit fetch) — after the psums the
    # per-depth entropies are replicated, so the prune runs identically
    # on every device; exactly threshold.entropy.bestbasistree's prune
    out = prune_tree_device(np.asarray(tree, dtype=bool), entr_bf, entr_af)
    assert isvalidtree(n, out)
    return out


def noisest(x, wt: DiscreteWavelet | None = DEFAULT_WAVELET, L: int = 1,
            mesh: Mesh | None = None, axis_name: str = "x"):
    """Distributed noise-sigma estimate of a sharded 2-D/3-D array: MAD of
    the level-L detail-row band / 0.6745 (denoising.jl:94-110; same
    detail-band divergence as ``threshold.noisest`` — see PARITY.md)."""
    if mesh is None:
        mesh = make_mesh(axis=axis_name)
    x = _as_float(x)
    if wt is None:
        y = x
    else:
        y = _mesh_dwt(x, wt, int(L), mesh, axis_name, True)
    m = y.shape[0]
    dr = y[m >> L: m >> (L - 1)].reshape(-1)
    from ..threshold.denoise import mad_subsampled
    return mad_subsampled(dr) / 0.6745


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
    x = _as_float(x)
    if L is None:
        L = min(maxtransformlevels(x), 6)
    if dnt is None:
        dnt = VisuShrink.for_length(x.shape[0])
    sigma = noisest(x, wt, 1, mesh, axis_name)
    t = sigma * dnt.t
    if wt is None:
        if TI:      # match threshold.denoise: no silent non-TI result
            raise ValueError("TI not supported with wt=None")
        return _threshold(x, dnt.th, t)

    def pipe(v):
        y = _mesh_dwt(v, wt, int(L), mesh, axis_name, True)
        y = _threshold(y, dnt.th, t)
        return _mesh_dwt(y, wt, int(L), mesh, axis_name, False)

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


# --- sharded wavelet packets -------------------------------------------------

def _wpt_sharded(x, wt, tree, mesh: Mesh, axis_name: str, fw: bool):
    # lifting boundaries (periodic/zeropad/symmetric) apply PER
    # SEGMENT along the last axis of the (nseg, nj) view, and the
    # GSPMD formulation shards whatever _level_jnp traces — edge
    # fixup writes included — so non-periodic needs no extra
    # mechanics here (filter engine stays periodic, as everywhere)
    sharded._check_boundary(wt)
    n = x.shape[-1]
    nd = mesh.shape[axis_name]
    tree = np.asarray(tree, dtype=bool)
    if not isvalidtree(n, tree):
        raise ValueError("invalid tree")
    if tree.size == 0 or not tree[0]:
        return x
    Lmax = treedepth(tree)
    depths = range(Lmax) if fw else range(Lmax - 1, -1, -1)
    y = x
    for d in depths:
        nseg = 2 ** d
        nj = n // nseg
        flags = tree[nseg - 1: 2 * nseg - 1]
        if not flags.any():
            continue
        segs = y.reshape(nseg, nj)
        # deep (segment-local) depths stay shard-local; shallow depths'
        # cross-shard stencils become ring collectives under GSPMD
        spec = P(axis_name, None) if nseg >= nd else P(None, axis_name)
        segs = lax.with_sharding_constraint(segs, NamedSharding(mesh, spec))
        out = _level_jnp(segs, wt, fw=fw)
        if not flags.all():
            out = jnp.where(jnp.asarray(flags)[:, None], out, segs)
        y = out.reshape(n)
        y = lax.with_sharding_constraint(y, NamedSharding(mesh, P(axis_name)))
    return y


def wpt(x, wt: DiscreteWavelet, tree=None, L: int | None = None,
        mesh: Mesh | None = None, axis_name: str = "x"):
    """Sharded wavelet packet transform of a mesh-sharded 1-D signal.

    Shallow depths (segments spanning shards) run under GSPMD with ring
    collectives; deep depths are shard-local.  Matches ``wpt`` exactly.
    """
    if mesh is None:
        mesh = make_mesh(axis=axis_name)
    x = _as_float(x)
    if tree is None:
        L = maxtransformlevels(x.shape[-1]) if L is None else int(L)
        tree = maketree(x.shape[-1], L, "full")
    return _wpt_sharded(x, wt, tree, mesh, axis_name, fw=True)


def iwpt(y, wt: DiscreteWavelet, tree=None, L: int | None = None,
         mesh: Mesh | None = None, axis_name: str = "x"):
    """Inverse of :func:`wpt`."""
    if mesh is None:
        mesh = make_mesh(axis=axis_name)
    y = _as_float(y)
    if tree is None:
        L = maxtransformlevels(y.shape[-1]) if L is None else int(L)
        tree = maketree(y.shape[-1], L, "full")
    return _wpt_sharded(y, wt, tree, mesh, axis_name, fw=False)


# --- sharded MODWT -----------------------------------------------------------

def _modwt_gather_frac() -> float:
    """Halo->all_gather switch point of the sharded MODWT: gather when
    h_need >= frac * loc.  frac = 1.0 is the structural bound (a halo
    spanning more than one neighbor chunk would need chained ppermutes);
    frac < 1 gathers earlier.  Default measured on the 2-process mesh
    (benchmarks/ab/modwt_gather.py): the halo variant stays cheaper than
    the gather variant at every ratio it can reach — per-level time is
    flat in h_need/loc while the gather level pays the full-band
    replication AND nd x the tap compute — so the structural bound IS
    the measured optimum (BENCHMARKS.md round-4).  Env override:
    WAVELETS_TPU_MODWT_GATHER_FRAC in (0, 1]."""
    import os
    return float(os.environ.get("WAVELETS_TPU_MODWT_GATHER_FRAC", "1.0"))


def _modwt_level_body(v, taps_list, dil: int, sign: int, axis: str,
                      nd: int, gather: bool | None = None):
    """One dilated periodic correlation per taps vector, on the local
    chunk with explicit halo handling.

    MODWT's halo GROWS with level (2^(j-1) * (flen-1), SURVEY §5): while
    it fits in one neighbor chunk the wrap is a single ppermute; beyond
    that the undecimated band is all-gathered and the local slice
    computed from the replicated array (the SURVEY-prescribed switch).
    ``gather`` forces the variant (A/B hook); None applies the measured
    policy (_modwt_gather_frac)."""
    loc = v.shape[0]
    flen = max(len(t) for t in taps_list)
    h_need = (flen - 1) * dil
    if gather is None:
        gather = h_need >= _modwt_gather_frac() * loc

    if not gather and h_need < loc:
        if sign < 0:     # reads v[t - k*dil]: halo from the PREV device
            perm = [(jd, (jd + 1) % nd) for jd in range(nd)]
            halo = lax.ppermute(v[loc - h_need:], axis, perm=perm)
            ext = jnp.concatenate([halo, v], axis=0)
            off = h_need
        else:            # reads v[t + k*dil]: halo from the NEXT device
            perm = [(jd, (jd - 1) % nd) for jd in range(nd)]
            halo = lax.ppermute(v[:h_need], axis, perm=perm)
            ext = jnp.concatenate([v, halo], axis=0)
            off = 0
        outs = []
        for taps in taps_list:
            acc = None
            for k, c in enumerate(taps):
                start = off - k * dil if sign < 0 else off + k * dil
                sl = lax.slice_in_dim(ext, start, start + loc, 1, axis=0)
                t = jnp.asarray(c, v.dtype) * sl
                acc = t if acc is None else acc + t
            outs.append(acc)
        return outs

    # deep level: halo spans devices -> all-gather and compute the local
    # window from the replicated band
    vfull = lax.all_gather(v, axis, tiled=True)          # (N,)
    j0 = lax.axis_index(axis) * loc
    # same dilated periodic correlation as the single-device engine —
    # shared closed form, not a re-implementation (code-review r5)
    return [lax.dynamic_slice_in_dim(
        modwt_ops._dilated_corr(vfull, taps, dil, sign), j0, loc)
        for taps in taps_list]


def modwt(x, wt: OrthoFilter, L: int | None = None,
          mesh: Mesh | None = None, axis_name: str = "x"):
    """Sharded MODWT of a mesh-sharded 1-D signal -> (N, L+1) sharded on
    its first axis.  Matches ``modwt`` (same layout, transforms_maximal_
    overlap.jl semantics)."""
    if mesh is None:
        mesh = make_mesh(axis=axis_name)
    x = _as_float(x)
    N = x.shape[0]
    nd = mesh.shape[axis_name]
    if L is None:
        from ..utils.indexing import maxmodwttransformlevels
        L = maxmodwttransformlevels(N)
    L = int(L)
    if L < 1 or 2 ** L > N:
        # validate for EVERY mesh size — the nd>1 gather path happily
        # computed any L while the nd==1 delegate raised, so the
        # outcome depended on device count (code-review r5)
        raise ValueError("too many transform levels (N < 2^L)"
                         if L >= 1 else "L must be >= 1")
    if nd == 1:
        # a 1-device mesh has no ring: the single-chip path is
        # identical — and skips L+1 per-level shard_map compiles, which
        # cost ~20 minutes through this platform's remote compiler
        # (round-5 example-tour find)
        from ..transforms import modwt as _modwt_single
        return _modwt_single(x, wt, L)
    g, h = modwt_ops.modwt_filter_pair(wt)

    def level(v, j):
        def body(vl):
            w1, v1 = _modwt_level_body(vl, [h, g], 2 ** (j - 1), -1,
                                       axis_name, nd)
            return v1, w1
        return shard_map(body, mesh=mesh, in_specs=(P(axis_name),),
                         out_specs=(P(axis_name), P(axis_name)))(v)

    v = x
    cols = []
    for j in range(1, L + 1):
        v, w = level(v, j)
        cols.append(w)
    cols.append(v)
    return jnp.stack(cols, axis=-1)


def imodwt(xw, wt: OrthoFilter, mesh: Mesh | None = None,
           axis_name: str = "x"):
    """Inverse of :func:`modwt` for a sharded (N, L+1) array."""
    if mesh is None:
        mesh = make_mesh(axis=axis_name)
    xw = _as_float(xw)
    N = xw.shape[0]
    nd = mesh.shape[axis_name]
    L = xw.shape[-1] - 1
    if nd == 1:
        from ..transforms import imodwt as _imodwt_single
        return _imodwt_single(xw, wt)       # see modwt: no ring on 1 dev
    g, h = modwt_ops.modwt_filter_pair(wt)

    def level(v, w, j):
        def body(vl, wl):
            (tw,) = _modwt_level_body(wl, [h], 2 ** (j - 1), +1,
                                      axis_name, nd)
            (tv,) = _modwt_level_body(vl, [g], 2 ** (j - 1), +1,
                                      axis_name, nd)
            return tw + tv
        return shard_map(body, mesh=mesh,
                         in_specs=(P(axis_name), P(axis_name)),
                         out_specs=P(axis_name))(v, w)

    v = xw[:, L]
    for j in range(L, 0, -1):
        v = level(v, xw[:, j - 1], j)
    return v
