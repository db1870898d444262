"""Distributed application layer on a device mesh.

Run hardware-free on a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_apps.py

On a real pod slice the same code scales across chips/hosts
(jax.distributed.initialize first; the mesh picks up all devices).
"""

import numpy as np

import jax

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


if __name__ == "__main__":
    main()
