"""Inverse DMA-structure probe: is the idwt2's +1.5-2.5ms-over-floor
paid to its 36-ref quadrant-gather DMA structure, to in-kernel glue, or
to the f32 split dots?

Round-4 findings (636-996 GB/s sessions):
* copy-through with the REAL 36-ref inverse specs: 3.89 ms vs a 3.34 ms
  1-ref floor -> the halo-ref structure costs only +0.55 ms.  NOT the
  bottleneck; a fewer-refs restructure has no headroom.
* the bf16-dot probe (same kernels, 1-pass dots) reads idwt2 L8 4.75 ms
  at a 996 GB/s session (floor 2.88) -> f32 split dots add ~1.1 ms and
  ~1.3 ms is in-kernel VPU glue (4x ext concats + window/piece concats),
  partially hidden under DMA at ordinary bandwidth.
* a v3-style band-split rebuild of the inverse body would cut the ext
  concats but fragment the col dots into K in {64, 8} chunks — the
  forward's v3 A/B already showed that loses for f32 ("many small ops
  lose to few big ones") and the inverse's chunks are smaller still.
  Assessed negative without a rebuild; revisit only on a toolchain
  whose small-dot issue cost drops."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/wavelets_tpu_jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/wavelets_tpu_jax_cache")
sys.path.insert(0, ".")
import wavelets_tpu as w
from wavelets_tpu.ops.pallas import mxu2d as M
from wavelets_tpu.ops.pallas.fused2d import _inv_group_specs
from wavelets_tpu.profiling import time_fn

wt = w.wt.wavelet(w.wt.cdf97, "lifting")
rng = np.random.default_rng(0)
x32 = jax.device_put(rng.standard_normal((16384, 16384)).astype(np.float32))
copy = jax.jit(lambda v: v + 1.0)
dtc = time_fn(copy, x32, 12)
print(f"f32 copy {2*x32.size*4/dtc/1e9:.1f} GB/s ({dtc*1e3:.2f} ms)",
      flush=True)
ml = nl = 16384
plan = M._plan_inv(ml, nl, wt, np.float32)
tm, tn, hm2, hn2 = plan
tm2, tn2 = tm // 2, tn // 2

def kernel36(*refs):
    out = refs[36]
    halves = []
    for g in range(4):
        c = refs[9 * g + 4][:]          # (tm2, tn2) center
        halves.append(c)
    top = jnp.concatenate([halves[0], halves[1]], axis=1)
    bot = jnp.concatenate([halves[2], halves[3]], axis=1)
    out[:] = jnp.concatenate([top, bot], axis=0)

offs = [(0, 0), (0, nl // 2), (ml // 2, 0), (ml // 2, nl // 2)]
def run36(v):
    in_specs = []
    for off in offs:
        in_specs += _inv_group_specs(plan, ml, nl, v.shape, off)
    return pl.pallas_call(
        kernel36, grid=(ml // tm, nl // tn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ml, nl), v.dtype),
        compiler_params=M._sem(2),
    )(*([v] * 36))

def run4(v):
    """4 center refs only (no halos): the pure quadrant-gather floor."""
    def kernel4(a, b, c, d, out):
        top = jnp.concatenate([a[:], b[:]], axis=1)
        bot = jnp.concatenate([c[:], d[:]], axis=1)
        out[:] = jnp.concatenate([top, bot], axis=0)
    specs = []
    for (ro, co) in offs:
        specs.append(pl.BlockSpec(
            (tm2, tn2), lambda i, j, ro=ro, co=co:
            (i + ro // tm2, j + co // tn2), memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel4, grid=(ml // tm, nl // tn),
        in_specs=specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ml, nl), v.dtype),
        compiler_params=M._sem(2),
    )(*([v] * 4))

for name, fn in (("36-ref (real inv specs)", run36),
                 ("4-ref centers only", run4)):
    try:
        f = jax.jit(fn)
        dt = time_fn(f, x32, 12)
        print(f"copy {name}: {dt*1e3:7.3f} ms", flush=True)
    except Exception as e:
        print(f"copy {name}: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
print("DONE", flush=True)
