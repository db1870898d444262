"""Level-1 cost decomposition of the MXU packed forward kernel.

The overlap probe (overlap_probe.py) showed Mosaic's automatic grid
pipeline DOES overlap block DMA with big clean MXU dots (time = max, not
sum).  So the residual above the DMA floor in the real kernel must come
from (a) per-grid-step fixed cost, (b) VPU glue (halo-ref concats, bf16
splits, window slicing, piece concats), or (c) small-dot inefficiency.
This script separates them at the headline size.

Usage: python benchmarks/ab/level1_decomp.py [size]
"""

import os
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from wavelets_tpu.profiling import barrier, time_fn  # noqa: E402


def halo_copy_kernel(x, tm, tn, hm=8, nrefs=9):
    """Copy-through kernel with the real 9-ref halo in_specs (or 1 ref)."""
    from wavelets_tpu.ops.pallas.fused2d import _halo_in_specs
    m, n = x.shape

    if nrefs == 9:
        specs = _halo_in_specs(m, n, tm, tn, hm, 128)

        def kernel(*refs):
            refs[-1][:] = refs[4][:]
        inputs = [x] * 9
    else:
        specs = [pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)]

        def kernel(a, o):
            o[:] = a[:]
        inputs = [x]

    return pl.pallas_call(
        kernel,
        grid=(m // tm, n // tn),
        in_specs=specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(*inputs)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    rng = np.random.default_rng(0)
    x32 = jax.device_put(rng.standard_normal((size, size)).astype(np.float32))

    copy = jax.jit(lambda v: v + 1.0)
    dt_copy = time_fn(copy, x32, 10)
    bw = 2 * x32.size * 4 / dt_copy / 1e9
    floor1_f32 = 2 * x32.size * 4 / bw / 1e9
    print(f"session bw {bw:.1f} GB/s; level-1 f32 floor {floor1_f32*1e3:.2f}"
          f" ms; bf16 floor {floor1_f32/2*1e3:.2f} ms")

    # grid-step cost: copy kernels, 1 vs 9 refs, tm 128 vs 256
    for nrefs in (1, 9):
        for tm in (128, 256):
            try:
                f = jax.jit(partial(halo_copy_kernel, tm=tm, tn=2048,
                                    nrefs=nrefs))
                dt = time_fn(f, x32, 10)
            except Exception as e:
                print(f"copy nrefs={nrefs} tm={tm}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            steps = (size // tm) * (size // 2048)
            print(f"copy nrefs={nrefs} tm={tm}: {dt*1e3:7.3f} ms "
                  f"({steps} steps, +{(dt - floor1_f32)/steps*1e6:5.2f} "
                  f"us/step over floor)")

    import wavelets_tpu as w
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")

    def lvl1(xx, env):
        """Trace the packed-first level under an env dict."""
        from wavelets_tpu.ops.pallas import mxu2d
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            f = jax.jit(lambda v: mxu2d.mxu_level_fw_packed_first(v, wt))
            dt = time_fn(lambda v: f(v)[1], xx, 10, chain=True)
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        return dt

    xb = x32.astype(jnp.bfloat16)
    # same-dtype bf16 floor (the "bf16 streams slower" reading was a
    # barrier-latency artifact — retracted, BENCHMARKS.md round-3-late)
    dtbc = time_fn(copy, xb, 10)
    print(f"bf16 xla copy: {dtbc*1e3:.3f} ms "
          f"({2*xb.size*2/dtbc/1e9:.1f} GB/s)")
    cases = [
        ("f32 v1 tm=128 tn=2048", x32, {"WAVELETS_TPU_MXU_BODY": "v1"}),
        ("f32 v1 tm=128 tn=4096", x32, {"WAVELETS_TPU_MXU_BODY": "v1",
                                        "WAVELETS_TPU_MXU_TN": "4096"}),
        ("f32 v1 tm=64 tn=4096", x32, {"WAVELETS_TPU_MXU_BODY": "v1",
                                       "WAVELETS_TPU_MXU_TN": "4096",
                                       "WAVELETS_TPU_MXU_TM": "64"}),
        ("f32 v1 tm=256 tn=4096", x32, {"WAVELETS_TPU_MXU_BODY": "v1",
                                        "WAVELETS_TPU_MXU_TN": "4096",
                                        "WAVELETS_TPU_MXU_TM": "256"}),
        ("bf16 v1 tm=256 tn=2048", xb, {"WAVELETS_TPU_MXU_BODY": "v1"}),
        ("bf16 v1 tm=256 tn=4096", xb, {"WAVELETS_TPU_MXU_BODY": "v1",
                                        "WAVELETS_TPU_MXU_TN": "4096"}),
        ("bf16 v1 tm=512 tn=2048", xb, {"WAVELETS_TPU_MXU_BODY": "v1",
                                        "WAVELETS_TPU_MXU_TM": "512"}),
    ]
    for name, xx, env in cases:
        try:
            dt = lvl1(xx, env)
            fl = floor1_f32 if xx.dtype == jnp.float32 else floor1_f32 / 2
            print(f"level1 {name}: {dt*1e3:7.3f} ms "
                  f"(+{(dt-fl)*1e3:6.3f} over floor)")
        except Exception as e:
            print(f"level1 {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}")


if __name__ == "__main__":
    main()
