"""Profile wpt at 2^20: per-depth cost via L=1..10 diffs, both engines."""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/wavelets_tpu_jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/wavelets_tpu_jax_cache")

import wavelets_tpu as w
from wavelets_tpu.utils.trees import maketree

wt = w.wt.wavelet(w.wt.db4)
n = 1 << 20
x = jax.device_put(np.random.default_rng(0).standard_normal(n).astype(np.float32))

def bar(y):
    return float(jnp.sum(y[:1]))

def bench(fn, iters=10):
    # single shared chained-barrier implementation
    from wavelets_tpu.profiling import time_fn
    return time_fn(fn, x, iters)

prev = 0.0
for L in range(1, 11):
    tree = maketree(n, L, "full")
    f = jax.jit(lambda v, t=tree: w.wpt(v, wt, t))
    dt = bench(f)
    print(f"L={L:2d}  {dt*1e3:7.3f} ms  (+{(dt-prev)*1e3:6.3f})", flush=True)
    prev = dt

# dwt for comparison (same total work, recursive scaling-band)
f = jax.jit(lambda v: w.dwt(v, wt, 10))
print(f"dwt L10 {bench(f)*1e3:7.3f} ms", flush=True)
print("DONE", flush=True)
