"""Greedy matching pursuit (Mallat 2009, p.642).

reference: src/Threshold/basis_functions.jl.  The data-dependent stopping
rule (residual norm vs tolerance) runs as a lax.while_loop so the whole
pursuit stays on device under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["matchingpursuit"]


def matchingpursuit(x, f, ft, tol: float, nmax: int = -1):
    """Sparse y with ||x - f(y)|| < tol (approximately), built greedily.

    ``f``/``ft`` are the dictionary operator and its transpose (traceable
    functions).  ``nmax`` bounds the number of atoms (-1: len(ft(x))).
    """
    assert nmax >= -1
    assert tol > 0
    x = jnp.asarray(x)
    y0 = jnp.zeros_like(ft(x))
    if y0.ndim != 1:
        # the flat argmax below is used as an axis-0 index; a rank>1
        # dictionary output would silently select wrong atoms (JAX
        # clips out-of-bounds scatter indices) — code-review r5
        raise ValueError("matchingpursuit expects ft(x) to be 1-D "
                         f"(got shape {y0.shape})")
    if nmax == -1:
        nmax = y0.size

    def cond(state):
        y, r, n = state
        return (jnp.linalg.norm(r) > tol) & (n < nmax)

    def body(state):
        y, r, n = state
        ftr = ft(r)
        i = jnp.argmax(jnp.abs(ftr))
        spat = jnp.zeros_like(y0).at[i].set(ftr[i])
        aphi = f(spat)
        return y.at[i].add(ftr[i]), r - aphi, n + 1

    y, _, _ = jax.lax.while_loop(cond, body, (y0, x, 0))
    return y
