"""A/B: bf16 full-pipeline knob sweep (16k^2 L8 cdf97 fw) — the bf16
level-1 decomposition follow-up (VERDICT r3 item 2).

Level-1 bf16 runs +0.6-0.7 ms over its same-session DMA floor and the
1-pass dots model well under it, so the residual is glue (V/Y casts,
ext concat, stash streaming) and dot efficiency.  Sweep the measured
knobs that move glue: body v1 vs v3 (v3 deletes the ext/V chains and
measured -0.14 bf16 at level 1 in round 3), COLBLK 0/16 (fw block dots
were -0.05 at level 1), PACKED_DMA on/off, tm 128/256.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/wavelets_tpu_jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wavelets_tpu_jax_cache")
sys.path.insert(0, ".")
import wavelets_tpu as w
from wavelets_tpu.ops.pallas.lifting2d import dwt2_lifting
from wavelets_tpu.profiling import time_fn

wt = w.wt.wavelet(w.wt.cdf97, "lifting")
rng = np.random.default_rng(0)
xb = jax.device_put(
    rng.standard_normal((16384, 16384)).astype(np.float32)).astype(jnp.bfloat16)
sb = jax.device_put(rng.standard_normal((1024, 1024)).astype(np.float32)
                    ).astype(jnp.bfloat16)
copy = jax.jit(lambda v: v + 1.0)
dtc = time_fn(copy, xb, 12)
fl = dtc * 4 / 3
print(f"bf16 copy {2*xb.size*2/dtc/1e9:.1f} GB/s; L8 floor {fl*1e3:.2f} ms",
      flush=True)

CASES = [
    ("default(v1)", {}),
    ("v3", {"WAVELETS_TPU_MXU_BODY": "v3"}),
    ("colblk16", {"WAVELETS_TPU_MXU_COLBLK": "16"}),
    ("v3+colblk16", {"WAVELETS_TPU_MXU_BODY": "v3",
                     "WAVELETS_TPU_MXU_COLBLK": "16"}),
    ("dma_off", {"WAVELETS_TPU_PACKED_DMA": "0"}),
    ("tm256", {"WAVELETS_TPU_MXU_TM": "256"}),
    ("tn2048", {"WAVELETS_TPU_MXU_TN": "2048"}),
]
ref = None
for name, env in CASES:
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        f = jax.jit(lambda v: dwt2_lifting(v, wt, 8))
        ys = np.asarray(f(sb)[:256, :256], np.float32)   # small dev check
        err = 0.0 if ref is None else float(np.max(np.abs(ys - ref)))
        ref = ys if ref is None else ref
        dt = time_fn(f, xb, 16)
        print(f"{name:14s} {dt*1e3:7.3f} ms  sol {fl/dt:.3f}  "
              f"err_vs_default {err:.2e}", flush=True)
    except Exception as e:
        print(f"{name:14s} FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
print("DONE", flush=True)
