"""Entropy measures and best-basis tree search.

reference: src/Threshold/entropy.jl.  The per-node "before" entropies and
the in-place level-by-level packet transform become one traced program
(batched segment transforms + segment-sum reductions); the final min-prune
recursion over the tiny tree runs host-side on the fetched entropy vector.
"""

from __future__ import annotations

import dataclasses

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
    if tree is None:
        tree = maketree(n, Lmax if L is None else int(L), "full")
    if not isvalidtree(n, tree):
        raise ValueError("invalid tree")

    nrm = jnp.linalg.norm(y)
    x = y
    entr_bf = []
    # per-depth: record segment entropies, then transform every segment one
    # level (the reference transforms unconditionally while walking depths)
    for d in range(Lmax):
        nseg = 2 ** d
        nj = n // nseg
        segs = x.reshape(nseg, nj)
        entr_bf.append(jnp.sum(_coef_terms(segs, et, nrm), axis=-1))
        out = wpt_ops._level_fw(segs, wt)
        x = out.reshape(n)
    entr_bf = np.asarray(jnp.concatenate(entr_bf)) if entr_bf else np.zeros(0)

    # leaf entropies of the fully transformed signal
    n_af = 2 ** (Lmax - 1)
    segs = x.reshape(n_af, n // n_af)
    entr_af = np.asarray(jnp.sum(_coef_terms(segs, et, nrm), axis=-1))

    return prune_tree(np.asarray(tree, dtype=bool), entr_bf, entr_af, n)


def prune_tree(tree: np.ndarray, entr_bf: np.ndarray, entr_af: np.ndarray,
               n: int) -> np.ndarray:
    """Host-side Coifman–Wickerhauser bottom-up min-prune over the entropy
    heap (reference: entropy.jl:94-129).  ``entr_bf`` — per-node before-
    entropies (heap order); ``entr_af`` — bottom-depth leaf entropies."""
    ntree = len(tree)
    n_af = (ntree + 1) // 2

    # bottom-up: cheapest achievable entropy of the subtree rooted at i
    best = np.zeros(ntree)
    for i in range(ntree - 1, -1, -1):
        if 2 * i + 1 >= ntree:  # bottom depth: children are leaves
            child_sum = entr_af[i - (n_af - 1)]
        else:
            child_sum = best[2 * i + 1] + best[2 * i + 2]
        best[i] = min(entr_bf[i], child_sum)

    besttree = tree.copy()
    for i in range(ntree):
        parent_off = i > 0 and not besttree[(i - 1) // 2]
        if parent_off or not tree[i]:
            besttree[i] = False
        else:
            if 2 * i + 1 >= ntree:
                child_sum = entr_af[i - (n_af - 1)]
            else:
                child_sum = best[2 * i + 1] + best[2 * i + 2]
            besttree[i] = entr_bf[i] > child_sum
    assert isvalidtree(n, besttree)
    return besttree
