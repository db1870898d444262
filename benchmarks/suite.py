"""Benchmark suite mirroring the reference's grids.

Covers the reference's BenchmarkTools suite (benchmark/benchmarks.jl:22-89:
dwt/idwt/wpt/iwpt at 1-D 2^{10,15,20}, 2-D {128,512,2048}^2, 3-D
{32,128,256}^3; filter db4, lifting haar/db2; modwt) plus the GPU-harness
sizes (gpu_benchmark.jl).  Float32, throughput in Gsamples/s.

Timing uses a chained-dependency loop with a scalar-fetch barrier (the
tunneled TPU backend's block_until_ready returns early; see bench.py).

Usage:  python benchmarks/suite.py [--quick] [--json]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _timeit(fn, x, iters):
    # single shared chained-barrier implementation (profiling.time_fn):
    # the suite, the regression grid, and the A/B scripts all time
    # through it so the methodology cannot drift.  Round-5 fix: a FIXED
    # iters drowned sub-ms cells in the tunnel's per-dispatch RTT and
    # the scalar-barrier noise floor (the r5 first capture read NaNs
    # and physically-impossible times on small cells) — a short pilot
    # sizes iters so each cell accumulates ~150 ms of work, capped to
    # keep dispatch-bound tiny cells from taking minutes.
    import math
    from wavelets_tpu.profiling import time_fn
    total = 0.15
    # cheap 2-iteration pilot sizes the real run (a full-length pilot
    # doubled the grid's wall clock on fast cells — code-review r5); a
    # NaN pilot (below the barrier noise floor) sizes toward the full
    # budget at a conservative per-iter guess instead of a blind 2x
    pilot = time_fn(fn, x, 2)
    if not (pilot == pilot):
        want = min(300, max(4 * iters, int(total / 1e-3)))
    else:
        want = int(min(300, max(iters, math.ceil(total / max(pilot,
                                                             1e-5)))))
    dt = time_fn(fn, x, want)
    if not (dt == dt):      # still below floor: one escalation
        dt = time_fn(fn, x, 300)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--force-cpu-full", action="store_true",
                    help="run the FULL reference grid on the CPU backend "
                         "(the gpu_benchmark.jl-style CPU side; used by "
                         "suite_compare.py)")
    args = ap.parse_args()

    import os
    import jax
    if args.force_cpu_full:
        jax.config.update("jax_platforms", "cpu")
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/wavelets_tpu_jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass
    import jax.numpy as jnp
    import wavelets_tpu as w
    from wavelets_tpu.transforms import _dwt_jit, _wpt_jit, _modwt_jit, \
        _TreeKey

    platform = jax.devices()[0].platform
    on_cpu = platform == "cpu"
    iters = 3 if on_cpu else 10
    full_shapes_on_cpu = args.force_cpu_full
    rng = np.random.default_rng(0)

    wavelets = {
        "db4/filter": w.wt.wavelet(w.wt.db4),
        "haar/lifting": w.wt.wavelet(w.wt.haar, "lifting"),
        "db2/lifting": w.wt.wavelet(w.wt.db2, "lifting"),
        "cdf97/lifting": w.wt.wavelet(w.wt.cdf97, "lifting"),
    }

    if (args.quick or on_cpu) and not full_shapes_on_cpu:
        shapes_1d = [2 ** 10, 2 ** 15]
        shapes_2d = [(128, 128), (512, 512)]
        shapes_3d = [(32, 32, 32)]
    else:
        shapes_1d = [2 ** 10, 2 ** 15, 2 ** 20]
        shapes_2d = [(128, 128), (512, 512), (2048, 2048), (8192, 8192)]
        shapes_3d = [(32, 32, 32), (128, 128, 128), (256, 256, 256)]

    results = []

    def record(op, wname, shape, dt):
        nsamp = int(np.prod(shape))
        gsps = nsamp / dt / 1e9
        results.append({"op": op, "wavelet": wname,
                        "shape": "x".join(map(str, np.atleast_1d(shape))),
                        "ms": round(dt * 1e3, 3), "gsps": round(gsps, 3)})

    def levels_for(shape):
        ndim = len(np.atleast_1d(shape))
        cap = {1: 6, 2: 4, 3: 3}[ndim]
        return min(cap, w.maxtransformlevels(
            shape if isinstance(shape, int) else min(shape)))

    for wname, wt in wavelets.items():
        for n in shapes_1d:
            x = jax.device_put(rng.standard_normal(n).astype(np.float32))
            L = levels_for(n)
            record("dwt", wname, n,
                   _timeit(lambda v: _dwt_jit(v, wt, L, 1, True), x, iters))
            record("idwt", wname, n,
                   _timeit(lambda v: _dwt_jit(v, wt, L, 1, False), x, iters))
        for shape in shapes_2d:
            x = jax.device_put(rng.standard_normal(shape).astype(np.float32))
            L = levels_for(shape)
            record("dwt2", wname, shape,
                   _timeit(lambda v: _dwt_jit(v, wt, L, 2, True), x, iters))
            record("idwt2", wname, shape,
                   _timeit(lambda v: _dwt_jit(v, wt, L, 2, False), x, iters))
        for shape in shapes_3d:
            x = jax.device_put(rng.standard_normal(shape).astype(np.float32))
            L = levels_for(shape)
            record("dwt3", wname, shape,
                   _timeit(lambda v: _dwt_jit(v, wt, L, 3, True), x, iters))

    # headline-size extras: 16k² f32 (BASELINE's stated size) + bf16 2-D
    if not (args.quick or on_cpu):
        wt97 = wavelets["cdf97/lifting"]
        x = jax.device_put(
            rng.standard_normal((16384, 16384)).astype(np.float32))
        record("dwt2", "cdf97/lifting", (16384, 16384),
               _timeit(lambda v: _dwt_jit(v, wt97, 8, 2, True), x, iters))
        record("idwt2", "cdf97/lifting", (16384, 16384),
               _timeit(lambda v: _dwt_jit(v, wt97, 8, 2, False), x, iters))
        del x
        xb = jax.device_put(
            rng.standard_normal((8192, 8192)).astype(jnp.bfloat16))
        record("dwt2/bf16", "cdf97/lifting", (8192, 8192),
               _timeit(lambda v: _dwt_jit(v, wt97, 8, 2, True), xb, iters))

    # WPT (full tree) and MODWT, 1-D
    wt4 = wavelets["db4/filter"]
    for n in shapes_1d:
        x = jax.device_put(rng.standard_normal(n).astype(np.float32))
        tree = _TreeKey(w.maketree(n, levels_for(n), "full"))
        record("wpt", "db4/filter", n,
               _timeit(lambda v: _wpt_jit(v, wt4, tree, True), x, iters))
        record("iwpt", "db4/filter", n,
               _timeit(lambda v: _wpt_jit(v, wt4, tree, False), x, iters))
        record("modwt", "db4/filter", n,
               _timeit(lambda v: _modwt_jit(v, wt4, min(6, levels_for(n))),
                       x, iters))

    if args.json:
        for r in results:
            print(json.dumps(r))
    else:
        print(f"platform={platform}  iters={iters}  float32")
        print(f"{'op':7} {'wavelet':14} {'shape':16} {'ms':>10} {'Gs/s':>9}")
        for r in results:
            print(f"{r['op']:7} {r['wavelet']:14} {r['shape']:16} "
                  f"{r['ms']:>10.3f} {r['gsps']:>9.3f}")


if __name__ == "__main__":
    main()
