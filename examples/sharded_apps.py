"""Distributed application layer on a device mesh.

Run hardware-free on a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_apps.py

On a real pod slice the same code scales across chips/hosts
(jax.distributed.initialize first; the mesh picks up all devices).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax

# Honor the documented hardware-free invocation on sandboxes whose
# JAX_PLATFORMS env var is ignored (the tunneled-TPU "axon" platform
# otherwise wins and the virtual CPU mesh never forms): if the caller
# asked for virtual host devices, force the cpu platform in-process.
if "--xla_force_host_platform_device_count" in os.environ.get(
        "XLA_FLAGS", ""):
    jax.config.update("jax_platforms", "cpu")

if len(jax.devices()) < 2:  # pragma: no cover - convenience for laptops
    print("hint: set XLA_FLAGS=--xla_force_host_platform_device_count=8")

import jax.numpy as jnp
import wavelets_tpu as w
from wavelets_tpu import parallel


def main():
    mesh = parallel.make_mesh()
    nd = mesh.shape["x"]
    print(f"mesh: {nd} devices")
    rng = np.random.default_rng(0)

    # --- sharded 2-D denoising pipeline ------------------------------------
    img = np.add.outer(w.testfunction(512, "HeaviSine"),
                       w.testfunction(512, "Bumps"))
    noisy = img + 0.1 * rng.standard_normal(img.shape)
    xs = parallel.shard_rows(jnp.asarray(noisy, jnp.float32), mesh)

    sigma = float(parallel.noisest(xs, mesh=mesh))
    den = parallel.denoise(xs, w.wt.wavelet(w.wt.db2), L=4, mesh=mesh)
    print(f"sigma ~ {sigma:.4f};  noise var {np.var(noisy - img):.4f} -> "
          f"residual var {float(jnp.var(den - jnp.asarray(img))):.4f}")

    # --- distributed best basis (psum entropy reductions) ------------------
    sig = jnp.asarray(w.testfunction(1024, "Doppler"), jnp.float32)
    tree = parallel.bestbasistree(sig, w.wt.wavelet(w.wt.db4), mesh=mesh)
    print(f"best basis: {int(tree.sum())}/{len(tree)} nodes split")

    # --- sharded MODWT (growing halo -> all_gather switch) -----------------
    mw = parallel.modwt(sig, w.wt.wavelet(w.wt.db4), 8, mesh=mesh)
    rt = parallel.imodwt(mw, w.wt.wavelet(w.wt.db4), mesh=mesh)
    print(f"modwt L8 round-trip err {float(jnp.max(jnp.abs(rt - sig))):.2e}")

    # --- 2-axis grid mesh P('x','y'): both image axes sharded --------------
    if nd % 2 == 0:
        from wavelets_tpu.parallel import mesh2d
        grid = mesh2d.make_mesh2d((nd // 2, 2))
        xg = mesh2d.shard_grid(jnp.asarray(noisy, jnp.float32), grid)
        deng = parallel.denoise(xg, w.wt.wavelet(w.wt.db2), L=4, mesh=grid)
        print(f"grid-mesh denoise residual var "
              f"{float(jnp.var(deng - jnp.asarray(img))):.4f}")
        vol = jnp.asarray(rng.standard_normal((64, 32, 32)), jnp.float32)
        yg3 = mesh2d.dwt3(mesh2d.shard_grid3(vol, grid),
                          w.wt.wavelet(w.wt.db2), 2, grid)
        r3 = mesh2d.idwt3(yg3, w.wt.wavelet(w.wt.db2), 2, grid)
        print(f"grid-mesh 3-D round-trip err "
              f"{float(jnp.max(jnp.abs(r3 - vol))):.2e}")

    # Multi-host (DCN): `python benchmarks/multihost.py` runs this same
    # app layer across TWO jax.distributed processes forming one global
    # mesh — the hardware-free analogue of a 2-host pod slice.


if __name__ == "__main__":
    main()
