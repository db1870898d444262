"""Full-pyramid (16k², L8, cdf97) A/B of the MXU kernel knobs, f32+bf16,
with same-dtype floors.  (The old "bf16 bytes stream slower" reading was
a barrier-latency artifact — retracted, BENCHMARKS.md round-3-late — but
a same-dtype copy remains the honest calibration.)"""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from wavelets_tpu.profiling import time_fn

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/wavelets_tpu_jax_cache")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import wavelets_tpu as w
from wavelets_tpu.ops.pallas import lifting2d as P

SIZE = 16384
L = 8


def main():
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    rng = np.random.default_rng(0)
    x32 = jax.device_put(rng.standard_normal((SIZE, SIZE)).astype(np.float32))
    xb = x32.astype(jnp.bfloat16)

    copy = jax.jit(lambda v: v + 1.0)
    dt32 = time_fn(copy, x32, 10)
    bw32 = 2 * x32.size * 4 / dt32 / 1e9
    dtb = time_fn(copy, xb, 10)
    bwb = 2 * xb.size * 2 / dtb / 1e9
    sol32 = (4 / 3) * 2 * x32.size * 4 / bw32 / 1e9
    solb = (4 / 3) * 2 * xb.size * 2 / bwb / 1e9
    print(f"f32 copy {bw32:.1f} GB/s (pyr SOL {sol32*1e3:.2f} ms); "
          f"bf16 copy {bwb:.1f} GB/s (pyr SOL {solb*1e3:.2f} ms)")

    cases = [
        ("f32 default", x32, sol32, {}),
        ("f32 tn=4096 tm=64", x32, sol32,
         {"WAVELETS_TPU_MXU_TN": "4096", "WAVELETS_TPU_MXU_TM": "64"}),
        ("f32 tn=4096 tm=128", x32, sol32, {"WAVELETS_TPU_MXU_TN": "4096"}),
        ("bf16 default", xb, solb, {}),
        ("bf16 tn=4096", xb, solb, {"WAVELETS_TPU_MXU_TN": "4096"}),
        ("bf16 tn=4096 tm=128", xb, solb,
         {"WAVELETS_TPU_MXU_TN": "4096", "WAVELETS_TPU_MXU_TM": "128"}),
    ]
    for name, xx, sol, env in cases:
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            f = jax.jit(lambda v: P.dwt2_lifting(v, wt, L))
            dt = time_fn(f, xx, 12)
            print(f"{name}: {dt*1e3:7.3f} ms  sol={sol/dt:.3f}")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}")
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
