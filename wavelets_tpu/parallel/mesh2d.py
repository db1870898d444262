"""2-axis mesh sharding: images partitioned P('x', 'y') over a device grid.

The BASELINE collective layout ("2-D images P('x','y')", SURVEY §2.3): both
image axes are sharded, so *both* directions of each separable level need a
periodic halo — each is one `lax.ppermute` ring exchange over its mesh
axis.  The per-axis compute reuses the axis-0 primitives from sharded.py;
the lane-direction pass runs them on the transposed local block (a local
swap, no communication).

Per level the forward body emits the four quadrant chunks (each still
P('x','y')); the driver concatenates them into the packed layout and
re-shards the shrinking active band, exactly like the 1-axis driver.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7: public API (the experimental path is deprecated)
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..utils.indexing import maxtransformlevels
from ..wt.carriers import OrthoFilter
from ..ops import filter_fb
from .sharded import (
    _filter_axis0_fw, _filter_axis0_inv,
    _lifting_axis0_fw, _lifting_axis0_inv,
    _level_fw_global, _level_inv_global, _halo_rows, _can_shard,
)

__all__ = ["make_mesh2d", "shard_grid", "dwt2", "idwt2", "dwt3", "idwt3",
           "shard_grid3"]


def make_mesh2d(shape: tuple[int, int] | None = None,
                axes: tuple[str, str] = ("x", "y")) -> Mesh:
    devs = jax.devices()
    if shape is None:
        n = len(devs)
        a = int(np.sqrt(n))
        while n % a:
            a -= 1
        shape = (a, n // a)
    ndev = shape[0] * shape[1]
    if len(devs) < ndev:
        raise ValueError(f"make_mesh2d({shape}): only {len(devs)} "
                         "devices visible")
    return Mesh(np.array(devs[:ndev]).reshape(shape), axes)


def shard_grid(x, mesh: Mesh):
    """Place a 2-D array block-sharded over both mesh axes."""
    ax, ay = mesh.axis_names
    return jax.device_put(x, NamedSharding(mesh, P(ax, ay)))


def _axis0_fw(rowt, wt, axis_name, nd):
    if isinstance(wt, OrthoFilter):
        h, g = filter_fb.filter_pair(wt)
        return _filter_axis0_fw(rowt, h, g, axis_name, nd)
    return _lifting_axis0_fw(rowt, wt, axis_name, nd)


def _axis0_inv(a, d, wt, axis_name, nd):
    if isinstance(wt, OrthoFilter):
        h, g = filter_fb.filter_pair(wt)
        return _filter_axis0_inv(a, d, h, g, axis_name, nd)
    return _lifting_axis0_inv(a, d, wt, axis_name, nd)


def _fw_body(blk, wt, ax, ay, ndx, ndy):
    """Local (m_loc, n_loc) block -> four quadrant chunks."""
    # lane direction first (reference order: rows then columns): run the
    # axis-0 primitive on the transposed block over the 'y' ring
    t = jnp.swapaxes(blk, 0, 1)
    aL, dL = _axis0_fw(t, wt, ay, ndy)
    left = jnp.swapaxes(aL, 0, 1)    # scaling half of every row
    right = jnp.swapaxes(dL, 0, 1)   # detail half
    # row direction over the 'x' ring
    ll, hl = _axis0_fw(left, wt, ax, ndx)
    lh, hh = _axis0_fw(right, wt, ax, ndx)
    return ll, lh, hl, hh


def _inv_body(ll, lh, hl, hh, wt, ax, ay, ndx, ndy):
    left = _axis0_inv(ll, hl, wt, ax, ndx)
    right = _axis0_inv(lh, hh, wt, ax, ndx)
    t = _axis0_inv(jnp.swapaxes(left, 0, 1), jnp.swapaxes(right, 0, 1),
                   wt, ay, ndy)
    return jnp.swapaxes(t, 0, 1)


@partial(jax.jit, static_argnames=("wt", "L", "mesh", "fw"))
def _dwt2_grid_jit(x, wt, L, mesh, fw):
    # both directions run the boundary-aware axis-0 primitives (zeropad =
    # wrapless ppermute on that mesh axis, symmetric = edge-device flip),
    # so all lifting boundaries work on the 2-axis mesh too
    from .sharded import _check_boundary
    _check_boundary(wt)
    ax, ay = mesh.axis_names
    ndx, ndy = mesh.shape[ax], mesh.shape[ay]
    m, n = x.shape
    halo = _halo_rows(wt)

    spec = P(ax, ay)
    fw_shard = shard_map(
        partial(_fw_body, wt=wt, ax=ax, ay=ay, ndx=ndx, ndy=ndy),
        mesh=mesh, in_specs=(spec,), out_specs=(spec, spec, spec, spec))
    inv_shard = shard_map(
        partial(_inv_body, wt=wt, ax=ax, ay=ay, ndx=ndx, ndy=ndy),
        mesh=mesh, in_specs=(spec,) * 4, out_specs=spec)

    def can(mm, nn):
        return _can_shard(mm, ndx, halo) and _can_shard(nn, ndy, halo)

    y = x
    if fw:
        for l in range(L):
            mm, nn = m >> l, n >> l
            active = y[:mm, :nn]
            if can(mm, nn):
                ll, lh, hl, hh = fw_shard(active)
                out = jnp.concatenate([
                    jnp.concatenate([ll, lh], axis=1),
                    jnp.concatenate([hl, hh], axis=1)], axis=0)
            else:
                out = _level_fw_global(active, wt)
            y = out if l == 0 else y.at[:mm, :nn].set(out)
        return y
    for l in range(L, 0, -1):
        mm, nn = m >> (l - 1), n >> (l - 1)
        active = y[:mm, :nn]
        if can(mm, nn):
            mh, nh = mm // 2, nn // 2
            out = inv_shard(active[:mh, :nh], active[:mh, nh:],
                            active[mh:, :nh], active[mh:, nh:])
        else:
            out = _level_inv_global(active, wt)
        y = out if (mm, nn) == (m, n) else y.at[:mm, :nn].set(out)
    return y


def shard_grid3(x, mesh: Mesh):
    """Place a 3-D array block-sharded over both mesh axes (last axis
    local)."""
    ax, ay = mesh.axis_names
    return jax.device_put(x, NamedSharding(mesh, P(ax, ay, None)))


def _local_level_last(blk, wt, fw: bool):
    """One transform level along the (local) last axis of a block."""
    if isinstance(wt, OrthoFilter):
        h, g = filter_fb.filter_pair(wt)
        return filter_fb._level_along_axis(blk, h, g, -1, fw)
    from ..ops import lifting
    return lifting._level_along_axis(blk, wt, -1, fw)


def _fw_body3(blk, wt, ax, ay, ndx, ndy):
    """Local (m_loc, n_loc, p) block -> eight octant chunks, axes
    transformed last-to-first (the reference's planes->rows->cols order,
    transforms_filter.jl:240-266)."""
    v = _local_level_last(blk, wt, True)           # packed [s|d] on axis 2
    p2 = blk.shape[2] // 2
    s2, d2 = v[:, :, :p2], v[:, :, p2:]
    octs = []
    for part in (s2, d2):                          # axis 1 over the 'y' ring
        t = jnp.swapaxes(part, 0, 1)
        a1, d1 = _axis0_fw(t, wt, ay, ndy)
        for q in (jnp.swapaxes(a1, 0, 1), jnp.swapaxes(d1, 0, 1)):
            octs.append(_axis0_fw(q, wt, ax, ndx))  # axis 0 over 'x'
    # octs[k] = (a0, d0) for (axis2, axis1) in [(s,a),(s,d),(d,a),(d,d)]
    return tuple(o for pair in octs for o in pair)


def _inv_body3(*octs, wt, ax, ay, ndx, ndy):
    # invert axis 0, then axis 1, then the local axis 2
    pairs = [(octs[2 * k], octs[2 * k + 1]) for k in range(4)]
    ax1 = [_axis0_inv(a, d, wt, ax, ndx) for a, d in pairs]
    half = []
    for a1, d1 in ((ax1[0], ax1[1]), (ax1[2], ax1[3])):
        t = _axis0_inv(jnp.swapaxes(a1, 0, 1), jnp.swapaxes(d1, 0, 1),
                       wt, ay, ndy)
        half.append(jnp.swapaxes(t, 0, 1))
    packed = jnp.concatenate(half, axis=2)
    return _local_level_last(packed, wt, False)


@partial(jax.jit, static_argnames=("wt", "L", "mesh", "fw"))
def _dwt3_grid_jit(x, wt, L, mesh, fw):
    from .sharded import _check_boundary
    _check_boundary(wt)
    ax, ay = mesh.axis_names
    ndx, ndy = mesh.shape[ax], mesh.shape[ay]
    shape = x.shape
    halo = _halo_rows(wt)
    spec = P(ax, ay, None)
    fw_shard = shard_map(
        partial(_fw_body3, wt=wt, ax=ax, ay=ay, ndx=ndx, ndy=ndy),
        mesh=mesh, in_specs=(spec,), out_specs=(spec,) * 8)
    inv_shard = shard_map(
        partial(_inv_body3, wt=wt, ax=ax, ay=ay, ndx=ndx, ndy=ndy),
        mesh=mesh, in_specs=(spec,) * 8, out_specs=spec)

    def can(mm, nn):
        return _can_shard(mm, ndx, halo) and _can_shard(nn, ndy, halo)

    y = x
    if fw:
        for l in range(L):
            sub = tuple(s >> l for s in shape)
            idx = tuple(slice(0, s) for s in sub)
            active = y[idx]
            if can(sub[0], sub[1]):
                o = fw_shard(active)
                # octant order: (axis2, axis1, axis0) = (s/d, a/d, a/d);
                # packed layout: axis0 [a|d] outer, axis1 middle, axis2 inner
                top = jnp.concatenate([
                    jnp.concatenate([o[0], o[4]], axis=2),
                    jnp.concatenate([o[2], o[6]], axis=2)], axis=1)
                bot = jnp.concatenate([
                    jnp.concatenate([o[1], o[5]], axis=2),
                    jnp.concatenate([o[3], o[7]], axis=2)], axis=1)
                out = jnp.concatenate([top, bot], axis=0)
            else:
                out = _level_fw_global(active, wt)
            y = out if l == 0 else y.at[idx].set(out)
        return y
    for l in range(L, 0, -1):
        sub = tuple(s >> (l - 1) for s in shape)
        idx = tuple(slice(0, s) for s in sub)
        active = y[idx]
        if can(sub[0], sub[1]):
            m2, n2, p2 = sub[0] // 2, sub[1] // 2, sub[2] // 2
            octs = []
            for k1 in range(2):          # axis2 s/d
                for k2 in range(2):      # axis1 a/d
                    for k3 in range(2):  # axis0 a/d
                        octs.append(active[
                            k3 * m2:(k3 + 1) * m2,
                            k2 * n2:(k2 + 1) * n2,
                            k1 * p2:(k1 + 1) * p2])
            out = inv_shard(*octs)
        else:
            out = _level_inv_global(active, wt)
        y = out if sub == shape else y.at[idx].set(out)
    return y


def _grid_entry(x, wt, L, mesh, rank):
    """Shared grid-driver entry validation: int promotion (the level
    bodies cast taps to the array dtype — int input silently zeroed
    them), rank check, and L validation (code-review r5)."""
    from ..transforms import _as_float, _check_levels
    x = _as_float(x)
    if mesh is None:
        mesh = make_mesh2d()
    if x.ndim != rank:
        raise ValueError(f"expected rank-{rank} input, got shape {x.shape}")
    if L is None:
        L = maxtransformlevels(x)
    _check_levels(x, int(L), rank)
    return x, int(L), mesh


def dwt3(x, wt, L: int | None = None, mesh: Mesh | None = None):
    """Forward 3-D DWT on a 2-axis device mesh (volume sharded
    P(x, y, None)), packed layout."""
    x, L, mesh = _grid_entry(x, wt, L, mesh, 3)
    return _dwt3_grid_jit(x, wt, L, mesh, True)


def idwt3(y, wt, L: int | None = None, mesh: Mesh | None = None):
    """Inverse of :func:`dwt3`."""
    y, L, mesh = _grid_entry(y, wt, L, mesh, 3)
    return _dwt3_grid_jit(y, wt, L, mesh, False)


def dwt2(x, wt, L: int | None = None, mesh: Mesh | None = None):
    """Forward 2-D DWT on a 2-axis device mesh, packed layout."""
    x, L, mesh = _grid_entry(x, wt, L, mesh, 2)
    return _dwt2_grid_jit(x, wt, L, mesh, True)


def idwt2(y, wt, L: int | None = None, mesh: Mesh | None = None):
    """Inverse of :func:`dwt2`."""
    y, L, mesh = _grid_entry(y, wt, L, mesh, 2)
    return _dwt2_grid_jit(y, wt, L, mesh, False)
