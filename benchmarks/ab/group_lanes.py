"""A/B: output-group lane count gl on the full L8 8192^2 pyramid (split3cat)."""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/wavelets_tpu_jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/wavelets_tpu_jax_cache")

import wavelets_tpu as w
from wavelets_tpu.ops.pallas.lifting2d import dwt2_lifting, idwt2_lifting

wt = w.wt.wavelet(w.wt.cdf97, "lifting")
rng = np.random.default_rng(0)
x8 = jax.device_put(rng.standard_normal((8192, 8192)).astype(np.float32))

def bar(y):
    return float(jnp.sum(y[:1, :1]))

def bench(fn, x, iters=12):
    # single shared chained-barrier implementation
    from wavelets_tpu.profiling import time_fn
    return time_fn(fn, x, iters)

def variant(gl, inv=False, L=8):
    os.environ["WAVELETS_TPU_MXU_GL"] = str(gl)
    os.environ["WAVELETS_TPU_MXU_PREC"] = "split3cat"
    @jax.jit
    def f(v):
        return idwt2_lifting(v, wt, L) if inv else dwt2_lifting(v, wt, L)
    return f

xs = jax.device_put(rng.standard_normal((1024, 1024)).astype(np.float32))
ref = {}
for gl in (256, 128, 64):
    for inv in (False, True):
        name = f"gl{gl}{'_inv' if inv else '_fw'}"
        try:
            f = variant(gl, inv)
            ys = np.asarray(f(xs))
            key = "inv" if inv else "fw"
            if key not in ref:
                ref[key] = ys
                err = 0.0
            else:
                err = float(np.max(np.abs(ys - ref[key])) / np.max(np.abs(ref[key])))
            dt = bench(f, x8)
            print(f"{name:12s} {dt*1e3:7.3f} ms   rel_err {err:.2e}", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:250]}", flush=True)

copy = jax.jit(lambda v: v + 1.0)
bar(copy(x8))
t0 = time.perf_counter()
v = x8
for _ in range(12):
    v = copy(v)
bar(v)
bw = 2 * x8.size * 4 / ((time.perf_counter() - t0) / 12) / 1e9
print(f"copy_bw {bw:.1f} GB/s", flush=True)
print("DONE", flush=True)
