"""Public transform API: dwt/idwt, wpt/iwpt, modwt/imodwt.

Functional analogue of the reference front-end
(src/Transforms/transforms_main.jl): the transform kind dispatches on the
wavelet carrier type (OrthoFilter -> filter engine, GLS -> lifting engine);
the array rank selects 1-D/2-D/3-D.  There are no mutating variants — JAX
is functional; the reference's in-place surface (dwt!/idwt!/wpt!,
transforms_main.jl:44-67) maps to ``donate=True`` on each entry point,
which hands XLA the input buffer for reuse (same peak-memory effect).

All entry points jit-compile once per (shape, dtype, wavelet, levels) and
cache; wavelet carriers are hashable static arguments.

Integer inputs promote to float (transforms_main.jl:188-190); the packed
coefficient layout is documented in utils/indexing.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .utils.indexing import maxtransformlevels, sufficientpoweroftwo
from .utils.trees import maketree
from .wt.carriers import OrthoFilter, GLS, DiscreteWavelet
from .ops import filter_fb, lifting, wpt as wpt_ops, modwt as modwt_ops

__all__ = ["dwt", "idwt", "wpt", "iwpt", "modwt", "imodwt", "dwtc", "idwtc"]

# transform dims = array rank, capped at 3 (rank-1/2/3 mirror the reference;
# higher-rank arrays treat leading axes as batch)
_MAX_NDT = 3


def _as_float(x):
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_:
        # Int -> default float (float64 under x64, float32 on accelerators),
        # mirroring the reference's float() promotion
        x = x.astype(jax.dtypes.canonicalize_dtype(np.float64))
    return x


def _ndt(x, ndt):
    if ndt is None:
        ndt = min(x.ndim, _MAX_NDT)
    if not 1 <= ndt <= x.ndim:
        raise ValueError(f"ndt={ndt} invalid for rank-{x.ndim} input")
    return ndt


def _check_levels(x, L, ndt):
    if L < 0:
        raise ValueError("L must be non-negative")
    for s in x.shape[-ndt:]:
        if not sufficientpoweroftwo(s, L):
            raise ValueError(
                f"size {x.shape[-ndt:]} lacks a 2^{L} factor in every "
                "transform dimension")


def _periodic(wt) -> bool:
    """The Pallas kernels and halo machinery implement the periodic
    boundary only; other boundaries take the XLA lifting path."""
    return getattr(wt, "boundary", "periodic") == "periodic"


def _use_pallas(x, wt, L) -> bool:
    """Route 2-D lifting transforms through the fused Pallas kernels when
    running on TPU hardware (override with WAVELETS_TPU_PALLAS=0/1)."""
    if not _periodic(wt) or not _pallas_enabled():
        return False
    if x.ndim < 2:
        return False
    if isinstance(wt, GLS):
        from .ops.pallas.lifting2d import pallas_ok
        return pallas_ok(x.shape[-2:], wt, L, x.dtype)
    from .ops.pallas.filter2d import pallas_ok
    return pallas_ok(x.shape[-2:], wt, L, x.dtype)


def _pallas_enabled() -> bool:
    import os
    flag = os.environ.get("WAVELETS_TPU_PALLAS")
    if flag == "0":
        return False
    on_tpu = jax.devices()[0].platform.lower() not in ("cpu", "gpu", "rocm")
    return flag == "1" or on_tpu


def _use_pallas_1d(x, wt, L) -> bool:
    if not _periodic(wt) or not _pallas_enabled() or x.ndim != 2:
        return False
    from .ops.pallas.dwt1d import pallas_ok
    return pallas_ok(x.shape, wt, L, x.dtype)


def _use_pallas_wide1d(x, wt, L) -> bool:
    """Single flat signal too wide for the batched row kernels: the
    (n,) -> (R, C) folded kernels (ops/pallas/wide1d.py)."""
    if not _periodic(wt) or not _pallas_enabled() or x.ndim != 1:
        return False
    from .ops.pallas.wide1d import wide_ok
    return wide_ok(x.shape[0], wt, L, x.dtype)


def _use_pallas_3d(x, wt, L) -> bool:
    if not _periodic(wt) or not _pallas_enabled():
        return False
    from .ops.pallas.dwt3d import pallas_ok
    return pallas_ok(x.shape, wt, L, x.dtype)


def _kernel_route_exists(x, wt, L, ndt) -> bool:
    """Would _dwt_impl dispatch ``x`` to a Pallas kernel path?  (Shape/
    dtype-only predicates — safe on tracers.)"""
    return ((ndt == 2 and x.ndim >= 2 and _use_pallas(x, wt, L))
            or (ndt == 1 and (_use_pallas_1d(x, wt, L)
                              or _use_pallas_wide1d(x, wt, L)))
            or (ndt == 3 and x.ndim == 3 and _use_pallas_3d(x, wt, L)))


# Incremented whenever a user vmap is rerouted off an alias-chained
# kernel by _guard_vmap; exists so tests can assert the reroute fired.
VMAP_REROUTES = 0


def _guard_vmap(fast_fn, safe_fn, x):
    """Run ``fast_fn(x)``, but under ``jax.vmap`` batch ``safe_fn``
    instead (via the supported ``jax.custom_batching.custom_vmap``
    mechanism).

    The packed-mode kernels alias-chain a full-size buffer through a
    ``pl.ANY`` input, which the Pallas TPU lowering cannot batch (a
    vmap-prepended block dim on an ANY-space aliased input crashed the
    device — commit 0d090d0).  Leading batch dims on a plain array are
    the preferred — and faster — way to batch; this guard makes user
    vmaps correct instead of fatal, without sniffing tracer internals."""
    guarded = jax.custom_batching.custom_vmap(fast_fn)

    @guarded.def_vmap
    def _rule(axis_size, in_batched, xs):
        global VMAP_REROUTES
        VMAP_REROUTES += 1
        return jax.vmap(safe_fn)(xs), True

    return guarded(x)


def _dwt_impl(x, wt, L, ndt, fw):
    """Kernel-route dispatch; alias-chained (packed-mode) kernels are
    wrapped in _guard_vmap so user vmaps batch the alias-free variants
    instead."""
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        # The DWT is linear over C with REAL coefficients, so a complex
        # transform is exactly (dwt(re), dwt(im)) — route complex64
        # through the f32 kernels as two real transforms when a kernel
        # path exists (the native-complex XLA formulation is the
        # fallback, and the only path on CPU/f64).
        xr = jnp.real(x)
        if _kernel_route_exists(xr, wt, L, ndt):
            return jax.lax.complex(
                _dwt_impl(xr, wt, L, ndt, fw),
                _dwt_impl(jnp.imag(x), wt, L, ndt, fw))
    if ndt == 2 and x.ndim >= 2 and _use_pallas(x, wt, L):
        if isinstance(wt, GLS):
            from .ops.pallas.lifting2d import dwt2_lifting, idwt2_lifting
            fn = dwt2_lifting if fw else idwt2_lifting
        else:
            from .ops.pallas.filter2d import dwt2_filter, idwt2_filter
            fn = dwt2_filter if fw else idwt2_filter
        if x.ndim == 2:
            if fw:
                return _guard_vmap(lambda v: fn(v, wt, L),
                                   lambda v: fn(v, wt, L, packed=False), x)
            return fn(x, wt, L)
        # batched images: vmap the 2-D kernels over the leading axes.
        # Forward must force quadrant mode — the packed-mode kernels
        # alias-chain the full buffer through a pl.ANY input, which the
        # Pallas TPU lowering cannot batch (it rejects the vmap-prepended
        # block dim on ANY-space inputs).
        flat = x.reshape((-1,) + x.shape[-2:])
        call = (lambda v: fn(v, wt, L, packed=False)) if fw \
            else (lambda v: fn(v, wt, L))
        out = jax.vmap(call)(flat)
        return out.reshape(x.shape)
    if ndt == 1 and _use_pallas_1d(x, wt, L):
        # the batched-rows kernels are alias-free, but the OPT-IN batched
        # pyramid (WAVELETS_TPU_PYR1DB=1) alias-chains — guard user vmaps
        # onto the per-level route
        from .ops.pallas.dwt1d import dwt1d_pallas, idwt1d_pallas
        fn1 = dwt1d_pallas if fw else idwt1d_pallas
        return _guard_vmap(lambda v: fn1(v, wt, L),
                           lambda v: fn1(v, wt, L, allow_pyr=False), x)
    if ndt == 1 and _use_pallas_wide1d(x, wt, L):
        from .ops.pallas.wide1d import (dwt1d_wide, idwt1d_wide,
                                        dwt1d_wide_nopyr, idwt1d_wide_nopyr)
        if fw:
            return _guard_vmap(lambda v: dwt1d_wide(v, wt, L),
                               lambda v: dwt1d_wide_nopyr(v, wt, L), x)
        return _guard_vmap(lambda v: idwt1d_wide(v, wt, L),
                           lambda v: idwt1d_wide_nopyr(v, wt, L), x)
    if ndt == 3 and x.ndim == 3 and _use_pallas_3d(x, wt, L):
        from .ops.pallas.dwt3d import dwt3_pallas, idwt3_pallas
        return dwt3_pallas(x, wt, L) if fw else idwt3_pallas(x, wt, L)
    if isinstance(wt, OrthoFilter):
        h, g = filter_fb.filter_pair(wt)
        if ndt == 1:
            return filter_fb.dwt1d(x, h, g, L) if fw \
                else filter_fb.idwt1d(x, h, g, L)
        return filter_fb.dwt_nd(x, h, g, L, ndt) if fw \
            else filter_fb.idwt_nd(x, h, g, L, ndt)
    if ndt == 1:
        return lifting.dwt1d_lifting(x, wt, L) if fw \
            else lifting.idwt1d_lifting(x, wt, L)
    return lifting.dwt_nd_lifting(x, wt, L, ndt) if fw \
        else lifting.idwt_nd_lifting(x, wt, L, ndt)


# Two compiled entry points: the default keeps the caller's array alive
# (reference's out-of-place dwt, transforms_main.jl:109-124); the donating
# variant gives XLA the input buffer to reuse — the functional stand-in for
# the reference's in-place dwt!/idwt! (transforms_main.jl:44-67), halving
# peak HBM for full-size transforms.
_dwt_jit = partial(jax.jit,
                   static_argnames=("wt", "L", "ndt", "fw"))(_dwt_impl)
_dwt_jit_donate = partial(jax.jit,
                          static_argnames=("wt", "L", "ndt", "fw"),
                          donate_argnums=0)(_dwt_impl)


def dwt(x, wt: DiscreteWavelet, L: int | None = None, *,
        ndt: int | None = None, donate: bool = False):
    """Forward discrete wavelet transform.

    ``x`` — rank-1/2/3 array (or higher: the trailing ``ndt`` axes are
    transformed, leading axes batch).  ``wt`` — a carrier from
    ``wt.wavelet``.  ``L`` — number of levels (default: max possible).
    ``donate=True`` donates ``x``'s device buffer to the computation (the
    functional analogue of the reference's in-place ``dwt!``); the caller
    must not use ``x`` afterwards.
    """
    x = _as_float(x)
    ndt = _ndt(x, ndt)
    if L is None:
        L = maxtransformlevels(x.shape[-ndt:])
    _check_levels(x, L, ndt)
    fn = _dwt_jit_donate if donate else _dwt_jit
    return fn(x, wt, int(L), ndt, True)


def idwt(y, wt: DiscreteWavelet, L: int | None = None, *,
         ndt: int | None = None, donate: bool = False):
    """Inverse of :func:`dwt` (``donate=True`` = the reference's idwt!)."""
    y = _as_float(y)
    ndt = _ndt(y, ndt)
    if L is None:
        L = maxtransformlevels(y.shape[-ndt:])
    _check_levels(y, L, ndt)
    fn = _dwt_jit_donate if donate else _dwt_jit
    return fn(y, wt, int(L), ndt, False)


# --- wavelet packets --------------------------------------------------------

class _TreeKey:
    """Hashable static-argument wrapper for a WPT tree.

    Trees are sized 2^maxtransformlevels(n)-1 (a ~1M-entry bool heap at
    n=2^20), and jit hashes static args on EVERY call — a Python tuple
    of that size cost ~115 ms per public wpt() call (measured; the
    device work itself is ~6 ms).  Packing to bytes makes the hash a
    one-shot memcmp-sized operation."""

    __slots__ = ("n", "data", "_hash")

    def __init__(self, tree):
        t = np.asarray(tree, dtype=bool)
        self.n = t.size
        self.data = np.packbits(t).tobytes()
        self._hash = hash((self.n, self.data))

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return (isinstance(other, _TreeKey) and self.n == other.n
                and self.data == other.data)

    def array(self) -> np.ndarray:
        return np.unpackbits(
            np.frombuffer(self.data, np.uint8), count=self.n).astype(bool)


def _wpt_impl(x, wt, tree, fw):
    t = tree.array() if isinstance(tree, _TreeKey) else \
        np.asarray(tree, dtype=bool)
    return wpt_ops.wpt(x, wt, t) if fw else wpt_ops.iwpt(x, wt, t)


_wpt_jit = partial(jax.jit, static_argnames=("wt", "tree", "fw"))(_wpt_impl)
_wpt_jit_donate = partial(jax.jit, static_argnames=("wt", "tree", "fw"),
                          donate_argnums=0)(_wpt_impl)


from functools import lru_cache


@lru_cache(maxsize=64)
def _full_tree_key(n: int, L: int) -> "_TreeKey":
    return _TreeKey(maketree(n, L, "full"))


def _wpt_common(x, wt, tree, L, fw, donate=False):
    x = _as_float(x)
    n = x.shape[-1]
    if tree is None:
        L = maxtransformlevels(n) if L is None else int(L)
        key = _full_tree_key(n, L)
    else:
        key = _TreeKey(tree)
    fn = _wpt_jit_donate if donate else _wpt_jit
    return fn(x, wt, key, fw)


def wpt(x, wt: DiscreteWavelet, tree=None, L: int | None = None, *,
        donate: bool = False):
    """Wavelet packet transform along the last axis.

    ``tree`` is a bool heap vector (see utils.maketree); if omitted, a full
    L-level tree is used.  An integer third positional is accepted as ``L``
    (the reference's L-or-tree overload, transforms_main.jl:134-176).
    ``donate=True`` = the reference's ``wpt!``.
    """
    tree, L = _tree_or_levels(tree, L)
    return _wpt_common(x, wt, tree, L, fw=True, donate=donate)


def _tree_or_levels(tree, L):
    """The reference's L-or-tree third-positional overload."""
    if isinstance(tree, (int, np.integer)):
        if L is not None and L != tree:
            raise ValueError("give either tree or L, not both")
        return None, int(tree)
    if tree is not None and L is not None:
        # the array overload must reject a conflicting L just like the
        # integer overload does (it was silently dropped; code-review r5)
        raise ValueError("give either tree or L, not both")
    return tree, L


def iwpt(y, wt: DiscreteWavelet, tree=None, L: int | None = None, *,
         donate: bool = False):
    """Inverse of :func:`wpt` (also accepts an integer as ``L``)."""
    tree, L = _tree_or_levels(tree, L)
    return _wpt_common(y, wt, tree, L, fw=False, donate=donate)


# --- MODWT ------------------------------------------------------------------

# MODWT stays on the XLA roll formulation: measured on v5e the fused
# Pallas variant (ops/pallas/modwt1d.py) is slightly slower (4.0 vs 3.6 ms
# at (512, 8192) L6) — XLA already fuses the roll chain well.  Set
# WAVELETS_TPU_PALLAS_MODWT=1 to opt in.
def _modwt_use_pallas(shape, wt, dtype) -> bool:
    import os
    if os.environ.get("WAVELETS_TPU_PALLAS_MODWT") != "1":
        return False
    from .ops.pallas.modwt1d import pallas_ok
    return _pallas_enabled() and pallas_ok(shape, wt, dtype)


def _modwt_impl(x, wt, L):
    if x.ndim == 2 and _modwt_use_pallas(x.shape, wt, x.dtype):
        from .ops.pallas.modwt1d import modwt_pallas
        return modwt_pallas(x, wt, L)
    return modwt_ops.modwt(x, wt, L)


def _imodwt_impl(xw, wt):
    if xw.ndim == 3 and _modwt_use_pallas(xw.shape[:2], wt, xw.dtype):
        from .ops.pallas.modwt1d import imodwt_pallas
        return imodwt_pallas(xw, wt)
    return modwt_ops.imodwt(xw, wt)


_modwt_jit = partial(jax.jit, static_argnames=("wt", "L"))(_modwt_impl)
_modwt_jit_donate = partial(jax.jit, static_argnames=("wt", "L"),
                            donate_argnums=0)(_modwt_impl)
_imodwt_jit = partial(jax.jit, static_argnames=("wt",))(_imodwt_impl)
_imodwt_jit_donate = partial(jax.jit, static_argnames=("wt",),
                             donate_argnums=0)(_imodwt_impl)


def modwt(x, wt: OrthoFilter, L: int | None = None, *,
          donate: bool = False):
    """Maximal-overlap DWT along the last axis -> (..., N, L+1)."""
    x = _as_float(x)
    if L is None:
        from .utils.indexing import maxmodwttransformlevels
        L = maxmodwttransformlevels(x.shape[-1])
    fn = _modwt_jit_donate if donate else _modwt_jit
    return fn(x, wt, int(L))


def imodwt(xw, wt: OrthoFilter, *, donate: bool = False):
    """Inverse MODWT of an (..., N, L+1) coefficient array."""
    xw = _as_float(xw)
    fn = _imodwt_jit_donate if donate else _imodwt_jit
    return fn(xw, wt)


# --- column-wise transform over the trailing channel axis -------------------

def dwtc(x, wt: DiscreteWavelet, L: int | None = None):
    """Per-channel 2-D DWT of an (m, n, c) array (channels last).

    The reference declares dwtc but leaves it unimplemented
    (src/Transforms/transforms_main.jl:180); provided here so the 3-D color
    path of wplotim works.
    """
    x = _as_float(x)
    moved = jnp.moveaxis(x, -1, 0)  # (c, m, n): channels batch
    out = dwt(moved, wt, L, ndt=2)
    return jnp.moveaxis(out, 0, -1)


def idwtc(y, wt: DiscreteWavelet, L: int | None = None):
    """Inverse of :func:`dwtc`."""
    y = _as_float(y)
    moved = jnp.moveaxis(y, -1, 0)
    out = idwt(moved, wt, L, ndt=2)
    return jnp.moveaxis(out, 0, -1)
