"""Device A/B: axis-0 block-shared col dots (dwt3 + a tall axis-0 level).

Round-4 verdict (670 GB/s session): the tall tiles make the dense col
K = tm + 2h huge, so blocking wins BOTH directions and dtypes — f32 fw
2.025 -> 1.597 ms / inv 2.524 -> 1.557, bf16 fw 1.071 -> 0.787 / inv
1.535 -> 0.813, every one of the four AT the same-session DMA floor
(1.07 GB @ 670 GB/s = 1.60 ms f32; half for bf16); dwt3 256^3 L3
pipeline 1.293 -> 1.152 ms.  f32 errs are reassociation class (5e-7),
bf16 exact.  Defaults set to fw q=16 / inv q=32 in axis0._axis0_blk."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/wavelets_tpu_jax_cache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/wavelets_tpu_jax_cache")
sys.path.insert(0, ".")
import wavelets_tpu as w
from wavelets_tpu.ops.pallas import axis0 as A
from wavelets_tpu.profiling import time_fn
wt = w.wt.wavelet(w.wt.cdf97, "lifting")
rng = np.random.default_rng(0)
x3 = jax.device_put(rng.standard_normal((256, 256, 256)).astype(np.float32))
# tall axis-0 level: (R=65536, C=2048) fold — the shape class the sharded
# 2-D local work and 3-D plane transforms see
xt = jax.device_put(rng.standard_normal((65536, 2048)).astype(np.float32))
copy = jax.jit(lambda v: v + 1.0)
dtc = time_fn(copy, xt, 12)
print(f"f32 copy {2*xt.size*4/dtc/1e9:.1f} GB/s", flush=True)
s_small = jax.device_put(rng.standard_normal((1024, 512)).astype(np.float32))
for dt_, tag in ((np.float32, "f32"), (jnp.bfloat16, "bf16")):
    xts = xt.astype(dt_)
    ss = s_small.astype(dt_)
    ref = {}
    for q in ("0", "16", "32"):
        os.environ["WAVELETS_TPU_MXU_COLBLK"] = q
        try:
            f = jax.jit(lambda v: A.axis0_level_fw(v, wt))
            g = jax.jit(lambda v: A.axis0_level_inv(v, wt))
            ys = np.asarray(f(ss), np.float32)
            xr = np.asarray(g(jnp.asarray(ys, dt_)), np.float32)
            fe = 0.0 if "f" not in ref else float(np.abs(ys - ref["f"]).max())
            ref.setdefault("f", ys)
            dtf = time_fn(f, xts, 12)
            y = f(xts)
            dti = time_fn(g, y, 12)
            rt = float(np.abs(xr - np.asarray(ss, np.float32)).max())
            print(f"{tag} q={q:2s}: fw {dtf*1e3:7.3f} ms  inv {dti*1e3:7.3f}"
                  f" ms  err_vs_q0 {fe:.1e} rt {rt:.1e}", flush=True)
        except Exception as e:
            print(f"{tag} q={q:2s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)
# dwt3 secondary (full 3-D pipeline): default policy vs COLBLK=0
for q in ("0", ""):
    if q:
        os.environ["WAVELETS_TPU_MXU_COLBLK"] = q
    else:
        os.environ.pop("WAVELETS_TPU_MXU_COLBLK", None)
    f3 = jax.jit(lambda v: w.dwt(v, wt, 3))
    dt3 = time_fn(f3, x3, 12, chain=False)
    print(f"dwt3 256^3 L3 COLBLK={q or 'default'}: {dt3*1e3:7.3f} ms",
          flush=True)
print("DONE", flush=True)
