"""Denoising: VisuShrink and translation-invariant cycle-spinning.

reference: src/Threshold/denoising.jl.  The TI path — a serial loop of
circshift -> dwt -> threshold -> idwt -> unshift over prod(nspin) shifts —
becomes a single vmapped program over the shift axis: every spin runs as
one batched transform (the batch dimension is also the natural data-
parallel mesh axis; see parallel/).
"""

from __future__ import annotations

import dataclasses
import itertools
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.indexing import maxtransformlevels, iscube, detailrange
from ..wt.carriers import DiscreteWavelet, wavelet
from ..wt import classes as _classes
from ..transforms import _dwt_jit, _as_float
from .ops import THType, HardTH, threshold

__all__ = ["DNFT", "VisuShrink", "denoise", "noisest", "DEFAULT_WAVELET"]


@dataclasses.dataclass(frozen=True)
class DNFT:
    pass


@dataclasses.dataclass(frozen=True, init=False)
class VisuShrink(DNFT):
    """Universal threshold sqrt(2 log n) (for unit sigma) with a threshold
    operator (default hard).

    Constructors mirror the reference (denoising.jl:36-44):
    ``VisuShrink(n)`` — universal threshold for signal length n with the
    default hard operator; ``VisuShrink(th, t)`` — explicit operator and
    threshold value.
    """
    th: THType
    t: float

    def __init__(self, th_or_n, t: float | None = None):
        if isinstance(th_or_n, (int, np.integer)) and t is None:
            th = HardTH()
            t = float(np.sqrt(2 * np.log(th_or_n)))
        else:
            th = th_or_n
        object.__setattr__(self, "th", th)
        object.__setattr__(self, "t", float(t))

    @staticmethod
    def for_length(n: int, th: THType = HardTH()) -> "VisuShrink":
        return VisuShrink(th, float(np.sqrt(2 * np.log(n))))


def _default_wavelet():
    return wavelet(_classes.sym5, "filter")


DEFAULT_WAVELET = _default_wavelet()


def noisest(x, wt: DiscreteWavelet | None = DEFAULT_WAVELET, L: int = 1):
    """Estimate the noise sigma: MAD of the level-L detail band / 0.6745.

    reference: src/Threshold/denoising.jl:94-110.  Declared divergence for
    ndim > 1: the reference applies ``detailrange`` as LINEAR indices into
    the column-major array (grabbing an arbitrary flat chunk,
    denoising.jl:100-101); this implementation takes the detail-row band
    (the rows holding the level-L detail quadrants), which is the
    better-defined statistic.  See PARITY.md.
    """
    x = _as_float(x)
    if wt is None:
        y = x
    else:
        y = _dwt_jit(x, wt, int(L), min(x.ndim, 3), True)
    r = detailrange(y.shape[0], L)
    dr = y.reshape(y.shape[0], -1)[r.start: r.stop].reshape(-1) if y.ndim > 1 \
        else y[r.start: r.stop]
    return mad_subsampled(dr) / 0.6745


def mad_subsampled(dr, cap: int = 1 << 18):
    """Median absolute deviation with a deterministic stride subsample
    above ``cap`` coefficients: jnp.median sorts, and sorting the FULL
    detail band of a 16k² image (134M elements) cost ~850 ms on device —
    the dominant term of the whole TI-denoise stack (round-5
    decomposition).  The reference medians only an n/2-element flat
    chunk (denoising.jl:100-101, the linear-indexing quirk PARITY.md
    records), so a 256k-sample MAD is still strictly more data than
    parity requires.  SHARED by the single-device and sharded noisest —
    the two estimators must stay identical above the cap (code-review
    r5)."""
    if dr.shape[0] > cap:
        stride = -(-dr.shape[0] // cap)
        dr = dr[::stride]
    med = jnp.median(dr)
    return jnp.median(jnp.abs(dr - med))


def _spin_shifts(nspin, ndim: int) -> np.ndarray:
    """All shift vectors of the cycle-spin grid (Fortran order, matching the
    reference's CartesianIndices enumeration, denoising.jl:113-121)."""
    if isinstance(nspin, int):
        nspin = (nspin,)
    if len(nspin) != ndim:
        raise ValueError("nspin must have one entry per dimension")
    grids = [range(s) for s in nspin]
    # Julia CartesianIndices varies the first axis fastest
    combos = list(itertools.product(*reversed(grids)))
    return np.array([c[::-1] for c in combos], dtype=np.int32)


def _ti_spin_add_impl(acc, xp, shift, t, wt, L, th, smax, shape):
    """One TI spin, accumulated: slice the (+s)-rolled view out of the
    pre-padded ``xp`` (pad s rows/cols of tail prepended per axis, so
    roll(+s) = slice at offset smax - s), transform-threshold-invert,
    un-roll via a small per-spin pad + slice at offset s, and add into
    the donated accumulator.  All rolls are dynamic_slices (copies) —
    jnp.roll with a traced shift would lower to a gather."""
    starts = tuple(smax[ax] - shift[ax] for ax in range(len(shape)))
    z = jax.lax.dynamic_slice(xp, starts, shape)
    y = _dwt_jit(z, wt, L, len(shape), True)
    y = threshold(y, th, t)
    z = _dwt_jit(y, wt, L, len(shape), False)
    zp = z
    for ax, s in enumerate(smax):
        if s:
            head = jax.lax.slice_in_dim(zp, 0, s, axis=ax)
            zp = jnp.concatenate([zp, head], axis=ax)
    starts = tuple(shift[ax] for ax in range(len(shape)))
    return acc + jax.lax.dynamic_slice(zp, starts, shape)


_ti_spin_add = jax.jit(_ti_spin_add_impl,
                       static_argnames=("wt", "L", "th", "smax", "shape"),
                       donate_argnums=0)


def denoise(x, wt: DiscreteWavelet | None = DEFAULT_WAVELET, *,
            L: int | None = None, dnt: DNFT | None = None,
            estnoise=noisest, TI: bool = False,
            nspin=None, spin_chunk: int = 8):
    """Wavelet-shrinkage denoising (reference: denoising.jl:22-82).

    TI=True averages over all circular shifts in the ``nspin`` grid
    (default 8 per dimension).  The shifts are evaluated ``spin_chunk`` at
    a time (vmapped within a chunk, lax.scan across chunks, running-sum
    accumulation), so peak memory is ``spin_chunk`` full-size transforms
    regardless of the grid size — a 16k^2 float32 image with the default
    64-spin grid needs ~8 GB transient, not ~64 GB.
    """
    x = _as_float(x)
    if not iscube(x):
        raise ValueError("array must be square/cube")
    if L is None:
        L = min(maxtransformlevels(x), 6)
    if dnt is None:
        dnt = VisuShrink.for_length(x.shape[0])
    sigma = estnoise(x, wt)
    t = sigma * dnt.t

    if not TI:
        if wt is None:
            return threshold(x, dnt.th, t)
        y = _dwt_jit(x, wt, int(L), x.ndim, True)
        y = threshold(y, dnt.th, t)
        return _dwt_jit(y, wt, int(L), x.ndim, False)

    if wt is None:
        raise ValueError("TI not supported with wt=None")
    if nspin is None:
        nspin = tuple(8 for _ in range(x.ndim))
    elif isinstance(nspin, int):
        # normalize early: the kernel-route branch iterates nspin (the
        # int form crashed there while the vmap path accepted it —
        # code-review r5); _spin_shifts still validates the length
        nspin = (nspin,)
    else:
        nspin = tuple(nspin)
    shifts = _spin_shifts(nspin, x.ndim)

    def spin(shift):
        z = x
        for ax in range(x.ndim):
            z = jnp.roll(z, shift[ax], axis=ax)
        yt = _dwt_jit(z, wt, int(L), x.ndim, True)
        yt = threshold(yt, dnt.th, t)
        z = _dwt_jit(yt, wt, int(L), x.ndim, False)
        for ax in range(x.ndim):
            z = jnp.roll(z, -shift[ax], axis=ax)
        return z

    pns = len(shifts)
    # vmapping the spins batches every transform in one program — the
    # right shape for SMALL arrays on the XLA path.  When a Pallas
    # kernel route exists (big arrays on TPU), vmap is both unnecessary
    # (each spin's transform already fills the chip) and UNSUPPORTED:
    # the packed-mode kernels alias-chain a pl.ANY buffer that the
    # Pallas lowering cannot batch.  Kernel-route spins run as a HOST
    # loop over one compiled spin-accumulate program (shift is a traced
    # argument; the accumulator buffer is donated through the chain):
    # the round-4 scan formulation hid two costs worth ~70 ms/spin at
    # 16k² — jnp.roll with a traced shift lowers to a GATHER (ruinous
    # along the lane axis), and the scan body defeats the packed
    # kernels' alias chain.  The rolls here are dynamic_slices of
    # once-padded buffers (pure copies), VERDICT r4 item 5:
    # 16-spin 16k² L6 1.50 s -> ~0.4 s.
    from ..transforms import _kernel_route_exists
    if wt is not None and _kernel_route_exists(x, wt, int(L), x.ndim):
        smax = tuple(int(s) - 1 for s in nspin)
        xp = x
        for ax, s in enumerate(smax):
            if s:
                head = jax.lax.slice_in_dim(xp, xp.shape[ax] - s,
                                            xp.shape[ax], axis=ax)
                xp = jnp.concatenate([head, xp], axis=ax)
        acc = jnp.zeros_like(x)
        for sh in shifts:
            acc = _ti_spin_add(acc, xp, jnp.asarray(sh, jnp.int32), t,
                               wt, int(L), dnt.th, smax, x.shape)
        return acc / pns

    chunk = max(1, min(int(spin_chunk), pns))
    pad = (-pns) % chunk
    shifts_p = np.concatenate(
        [shifts, np.zeros((pad, x.ndim), np.int32)]) if pad else shifts
    wts = np.concatenate([np.ones(pns), np.zeros(pad)]).astype(x.dtype)

    def chunk_body(acc, args):
        sh, w = args
        vals = jax.vmap(spin)(sh)                       # (chunk, ...)
        return acc + jnp.tensordot(w, vals, axes=1), None

    acc, _ = jax.lax.scan(
        chunk_body, jnp.zeros_like(x),
        (jnp.asarray(shifts_p).reshape(-1, chunk, x.ndim),
         jnp.asarray(wts).reshape(-1, chunk)))
    return acc / pns
