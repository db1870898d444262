"""A/B: block-shared column dots (WAVELETS_TPU_MXU_COLBLK) on the MXU level.

The v1 body's full-width column dot pays K = tm + 2hm multiplies per
output element; block-shared dots cut that to 2q + 2hm (see
mxu2d._col_blk).  Interpret-mode equivalence is pinned by
tests/test_mxu2d.py; this script measures the device win and validates
on-device equivalence vs q=0.

Stages (compile cost on this tunnel is the constraint — a full L8
pipeline is ~10 fresh kernels per variant, a level-1 probe is 1):
  python benchmarks/ab/col_blk.py            # level-1 sweep, f32+bf16, fw+inv
  python benchmarks/ab/col_blk.py full 0 32  # full 16k^2 L8 fw+inv for q in args
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/wavelets_tpu_jax_cache")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/wavelets_tpu_jax_cache")
sys.path.insert(0, ".")
import wavelets_tpu as w  # noqa: E402
from wavelets_tpu.profiling import time_fn  # noqa: E402

SIZE = 16384
wt = w.wt.wavelet(w.wt.cdf97, "lifting")


def with_q(q, build):
    """Trace ``build()`` (returns a fresh-jitted fn) under COLBLK=q.

    Env knobs are read at trace time and module-level jits cache on
    arguments (CLAUDE.md A/B trap), so every variant traces a FRESH
    wrapper while the env is set.
    """
    old = os.environ.get("WAVELETS_TPU_MXU_COLBLK")
    os.environ["WAVELETS_TPU_MXU_COLBLK"] = str(q)
    try:
        return build()
    finally:
        if old is None:
            os.environ.pop("WAVELETS_TPU_MXU_COLBLK", None)
        else:
            os.environ["WAVELETS_TPU_MXU_COLBLK"] = old


def floors(x32, xb):
    copy = jax.jit(lambda v: v + 1.0)
    dtc32 = time_fn(copy, x32, 10)
    dtcb = time_fn(copy, xb, 10)
    bw = 2 * x32.size * 4 / dtc32 / 1e9
    print(f"session copy bw f32 {bw:.1f} GB/s "
          f"(bf16 {2 * xb.size * 2 / dtcb / 1e9:.1f}); "
          f"level-1 floor f32 {dtc32 * 1e3:.2f} ms bf16 {dtcb * 1e3:.2f} ms",
          flush=True)
    return dtc32, dtcb


def level1_sweep(x32, xb, fl32, flb):
    from wavelets_tpu.ops.pallas import mxu2d

    # small-size on-device equivalence vs q=0, per dtype / direction
    rng = np.random.default_rng(1)
    s32 = jax.device_put(rng.standard_normal((1024, 1024)).astype(np.float32))
    sb = s32.astype(jnp.bfloat16)
    refs = {}
    for q in (0, 16, 32, 64):
        for xx, big, fl, tag in ((s32, x32, fl32, "f32"), (sb, xb, flb, "bf16")):
            # forward: packed-first level (the headline's level-1 body).
            # NOTE: compare only the WRITTEN detail regions — the LL
            # quadrant of a fresh packed-first buffer is never written
            # (uninitialized HBM; comparing it produced the round-4
            # phantom-miscompile artifact).
            try:
                f = with_q(q, lambda: jax.jit(
                    lambda v: mxu2d.mxu_level_fw_packed_first(v, wt)[1]))
                ys = np.asarray(f(xx), np.float32)
                hq, wq = ys.shape[0] // 2, ys.shape[1] // 2
                ys[:hq, :wq] = 0.0
                err = (0.0 if (tag, "fw") not in refs
                       else float(np.max(np.abs(ys - refs[(tag, "fw")]))))
                refs.setdefault((tag, "fw"), ys)
                dt = time_fn(f, big, 10)
                print(f"level1 fw  {tag:4s} q={q:2d}: {dt * 1e3:7.3f} ms "
                      f"(+{(dt - fl) * 1e3:6.3f} over floor)  "
                      f"dev_err_vs_q0 {err:.2e}", flush=True)
            except Exception as e:
                print(f"level1 fw  {tag:4s} q={q:2d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)
            # inverse: synthesis level from quadrant slices of a full
            # array (same-shape in/out so time_fn's dependency chain works)
            try:
                def inv_full(v):
                    h = v.shape[0] // 2
                    return mxu2d.mxu_inv_quads(v[:h, :h], v[:h, h:],
                                               v[h:, :h], v[h:, h:], wt)
                g = with_q(q, lambda: jax.jit(inv_full))
                ys = np.asarray(g(xx), np.float32)
                err = (0.0 if (tag, "iv") not in refs
                       else float(np.max(np.abs(ys - refs[(tag, "iv")]))))
                refs.setdefault((tag, "iv"), ys)
                dt = time_fn(g, big, 10)
                print(f"level1 inv {tag:4s} q={q:2d}: {dt * 1e3:7.3f} ms "
                      f"(+{(dt - fl) * 1e3:6.3f} over floor)  "
                      f"dev_err_vs_q0 {err:.2e}", flush=True)
            except Exception as e:
                print(f"level1 inv {tag:4s} q={q:2d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)


def full_sweep(x32, xb, qs):
    from wavelets_tpu.ops.pallas.lifting2d import dwt2_lifting, idwt2_lifting
    for q in qs:
        for xx, tag in ((x32, "f32"), (xb, "bf16")):
            try:
                f = with_q(q, lambda: jax.jit(
                    lambda v: dwt2_lifting(v, wt, 8)))
                dt = time_fn(f, xx, 20)
                gsps = xx.size / dt / 1e9
                print(f"full fw  {tag:4s} q={q:2d}: {dt * 1e3:7.3f} ms "
                      f"({gsps:.1f} Gs/s)", flush=True)
                y = f(xx)
                g = with_q(q, lambda: jax.jit(
                    lambda v: idwt2_lifting(v, wt, 8)))
                dt = time_fn(g, y, 20)
                print(f"full inv {tag:4s} q={q:2d}: {dt * 1e3:7.3f} ms "
                      f"({xx.size / dt / 1e9:.1f} Gs/s)", flush=True)
            except Exception as e:
                print(f"full {tag:4s} q={q:2d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    x32 = jax.device_put(
        rng.standard_normal((SIZE, SIZE)).astype(np.float32))
    xb = x32.astype(jnp.bfloat16)
    fl32, flb = floors(x32, xb)
    if len(sys.argv) > 1 and sys.argv[1] == "full":
        full_sweep(x32, xb, [int(a) for a in sys.argv[2:]] or [0, 32])
    else:
        level1_sweep(x32, xb, fl32, flb)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
