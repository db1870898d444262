"""A/B: MXU dot precision modes + margins on the full L8 8192^2 pyramid.

One process => one session BW; chained-dependency timing with scalar-fetch
barrier.  Each variant traces its own fresh jit wrapper with the env set
(the inner driver reads WAVELETS_TPU_* at trace time).
"""
import os, time, json

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/wavelets_tpu_jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/wavelets_tpu_jax_cache")

import wavelets_tpu as w
from wavelets_tpu.ops.pallas.lifting2d import dwt2_lifting

wt = w.wt.wavelet(w.wt.cdf97, "lifting")
rng = np.random.default_rng(0)
x8 = jax.device_put(rng.standard_normal((8192, 8192)).astype(np.float32))

def bar(y):
    return float(jnp.sum(y[:1, :1]))

def bench(fn, x, iters=12):
    # single shared chained-barrier implementation
    from wavelets_tpu.profiling import time_fn
    return time_fn(fn, x, iters)

def variant(prec, margin=None, L=8):
    os.environ["WAVELETS_TPU_MXU_PREC"] = prec
    if margin is None:
        os.environ.pop("WAVELETS_TPU_MXU_MARGIN", None)
    else:
        os.environ["WAVELETS_TPU_MXU_MARGIN"] = str(margin)
    @jax.jit
    def f(v):
        return dwt2_lifting(v, wt, L)
    return f

# correctness oracle (small, CPU-free: compare variants to split3 on device)
xs = jax.device_put(rng.standard_normal((1024, 1024)).astype(np.float32))

results = {}
ref_small = None
for name, prec, margin in [
    ("split3",     "split3",    None),
    ("bf16",       "bf16",      None),
    ("high",       "high",      None),
    ("split3cat",  "split3cat", None),
    ("split3_m16", "split3",    16),
    ("split3_m8",  "split3",    8),
]:
    try:
        f = variant(prec, margin)
        ys = np.asarray(f(xs))
        if ref_small is None:
            ref_small = ys
            err = 0.0
        else:
            err = float(np.max(np.abs(ys - ref_small)) / np.max(np.abs(ref_small)))
        dt = bench(f, x8)
        results[name] = (dt, err)
        print(f"{name:14s} {dt*1e3:7.3f} ms   rel_err_vs_split3 {err:.2e}", flush=True)
    except Exception as e:
        print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

# copy BW calibration (same session)
copy = jax.jit(lambda v: v + 1.0)
bar(copy(x8))
t0 = time.perf_counter()
v = x8
for _ in range(12):
    v = copy(v)
bar(v)
dt_copy = (time.perf_counter() - t0) / 12
bw = 2 * x8.size * 4 / dt_copy / 1e9
print(f"copy_bw {bw:.1f} GB/s  (copy {dt_copy*1e3:.3f} ms)", flush=True)
sol = 2 * x8.size * 4 * (4/3) / (bw * 1e9)
for name, (dt, err) in results.items():
    print(f"  {name:14s} sol_fraction {sol/dt:.3f}", flush=True)

# 16384^2 headline at best-known mode (split3 for now)
try:
    x16 = jax.device_put(rng.standard_normal((16384, 16384)).astype(np.float32))
    f = variant("split3", None)
    dt = bench(f, x16, iters=8)
    sol16 = 2 * x16.size * 4 * (4/3) / (bw * 1e9)
    print(f"16k_split3     {dt*1e3:7.3f} ms  sol_fraction {sol16/dt:.3f}  "
          f"gsps {x16.size/dt/1e9:.2f}", flush=True)
except Exception as e:
    print(f"16k FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
print("DONE", flush=True)
