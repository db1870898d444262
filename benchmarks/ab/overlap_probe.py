"""Does this toolchain overlap block DMA with MXU compute?

Round-2 found Mosaic's automatic grid pipeline to be exactly additive
(time = DMA + dots) on the fused level kernels, which caps the f32
headline at ~0.67-0.75 of the DMA roofline at fast sessions.  This probe
answers the question in isolation, away from the wavelet kernels:

* ``mosaic``: plain pallas_call grid pipeline, one (tm, tn) block in /
  one out per step, K chained (tm, tm) @ (tm, tn) MXU dots per block.
* ``pipe``: the same compute inside pltpu.emit_pipeline (manual
  double-buffered DMA pipeline) with the full array living in ANY/HBM.

If time(K) is flat until K*dot > DMA then jumps (max-behavior), overlap
works and the wavelet kernels should move to that structure; if time(K)
is linear from K=0 (additive), overlap is impossible on this toolchain
and the lever is cutting dot passes instead.

Usage: python benchmarks/ab/overlap_probe.py [size]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from wavelets_tpu.profiling import barrier, time_fn  # noqa: E402

TM, TN = 256, 2048


def mosaic_variant(x, w, K):
    m, n = x.shape

    def kernel(x_ref, w_ref, o_ref):
        acc = x_ref[:]
        for _ in range(K):
            acc = jnp.dot(w_ref[:], acc, preferred_element_type=jnp.float32)
        o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(m // TM, n // TN),
        in_specs=[
            pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TM), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x, w)


def pipe_variant(x, w, K):
    m, n = x.shape

    def kernel(x_hbm, w_ref, o_hbm):
        def inner(x_blk, o_blk):
            acc = x_blk[:]
            for _ in range(K):
                acc = jnp.dot(w_ref[:], acc,
                              preferred_element_type=jnp.float32)
            o_blk[:] = acc

        pipe = pltpu.emit_pipeline(
            inner,
            grid=(m // TM, n // TN),
            in_specs=[pl.BlockSpec((TM, TN), lambda i, j: (i, j))],
            out_specs=[pl.BlockSpec((TM, TN), lambda i, j: (i, j))],
        )
        pipe(x_hbm, o_hbm)

    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x, w)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    x = jax.device_put(np.random.default_rng(0)
                       .standard_normal((size, size)).astype(np.float32))
    w = jax.device_put((np.eye(TM) * 1.0).astype(np.float32))

    copy = jax.jit(lambda v: v + 1.0)
    dt_copy = time_fn(copy, x, 10)
    bw = 2 * x.size * 4 / dt_copy / 1e9
    print(f"session copy bw: {bw:.1f} GB/s  (2-pass floor "
          f"{2 * x.size * 4 / bw / 1e9 * 1e3:.2f} ms)")

    nblocks = (size // TM) * (size // TN)
    for name, make in (("mosaic", mosaic_variant), ("pipe", pipe_variant)):
        for K in (0, 1, 2, 4, 8):
            f = jax.jit(partial(make, K=K))
            try:
                dt = time_fn(lambda v: f(v, w), x, 10)
            except Exception as e:
                print(f"{name} K={K}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
                break
            gflop = 2 * TM * TM * TN * K * nblocks / 1e9
            print(f"{name} K={K}: {dt * 1e3:7.3f} ms   "
                  f"({gflop:7.1f} GFLOP -> "
                  f"{gflop / dt / 1e3 if dt > 0 else 0:6.1f} TFLOP/s eff)")


if __name__ == "__main__":
    main()
