"""A/B: MXU tile height tm=128 (default) vs 256 on 8192^2 L8 fw+inv."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/wavelets_tpu_jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/wavelets_tpu_jax_cache")
import wavelets_tpu as w
from wavelets_tpu.ops.pallas.lifting2d import dwt2_lifting, idwt2_lifting
wt = w.wt.wavelet(w.wt.cdf97, "lifting")
rng = np.random.default_rng(0)
x8 = jax.device_put(rng.standard_normal((8192, 8192)).astype(np.float32))
def bar(y): return float(jnp.sum(y[:1, :1]))
def bench(fn, x, iters=12):
    # single shared chained-barrier implementation
    from wavelets_tpu.profiling import time_fn
    return time_fn(fn, x, iters)
xs = jax.device_put(rng.standard_normal((1024, 1024)).astype(np.float32))
ref = {}
for tm in ("128", "256"):
    os.environ["WAVELETS_TPU_MXU_TM"] = tm
    for inv in (False, True):
        name = f"tm{tm}_{'iv' if inv else 'fw'}"
        try:
            @jax.jit
            def f(v, inv=inv):
                return idwt2_lifting(v, wt, 8) if inv else dwt2_lifting(v, wt, 8)
            ys = np.asarray(f(xs))
            key = "iv" if inv else "fw"
            err = 0.0 if key not in ref else float(np.max(np.abs(ys - ref.setdefault(key, ys))))
            ref.setdefault(key, ys)
            print(f"{name:10s} {bench(f, x8)*1e3:7.3f} ms  abs_err {err:.2e}", flush=True)
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
copy = jax.jit(lambda v: v + 1.0)
bar(copy(x8))
t0 = time.perf_counter()
v = x8
for _ in range(12): v = copy(v)
bar(v)
print(f"copy_bw {2*x8.size*4/((time.perf_counter()-t0)/12)/1e9:.1f} GB/s", flush=True)
print("DONE", flush=True)
