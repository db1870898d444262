"""A/B: the round-5 glue-elimination bodies.

Forward WAVELETS_TPU_MXU_BODY v1 vs v4 (batched row dot, single V
concat) and inverse WAVELETS_TPU_MXU_INV_BODY v1 vs v2 (K-split col
dots, batched row windows) — the levers named by the round-4 inverse
decomposition (benchmarks/ab/inv_structure.py: ~1.3 ms in-kernel VPU
glue + ~1.1 ms split dots over the idwt2 floor).

Stages (compile cost per variant is the constraint):
  python benchmarks/ab/body_v4.py          # level-1, f32+bf16, fw+inv
  python benchmarks/ab/body_v4.py full     # full 16k^2 L8 pipelines
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/wavelets_tpu_jax_cache")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/wavelets_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import wavelets_tpu as w  # noqa: E402
from wavelets_tpu.profiling import time_fn  # noqa: E402

SIZE = 16384
wt = w.wt.wavelet(w.wt.cdf97, "lifting")


def with_env(env, build, *trace_args):
    """Build AND TRACE under the env dict (fresh wrapper per variant).

    jax.jit is lazy — tracing happens at the first CALL, not at jit()
    construction — so the wrapper must be invoked once per input shape
    INSIDE the env context or every variant silently traces the default
    path (the CLAUDE.md A/B trap in script form; the tell is
    dev_err_vs_v1 == 0.0 for a variant that must reassociate)."""
    old = {k: os.environ.get(k) for k in env}
    os.environ.update({k: str(v) for k, v in env.items()})
    try:
        fn = build()
        for a in trace_args:
            jax.block_until_ready(fn(a))
        return fn
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def floors(x32, xb):
    copy = jax.jit(lambda v: v + 1.0)
    dtc32 = time_fn(copy, x32, 10)
    dtcb = time_fn(copy, xb, 10)
    print(f"session copy bw f32 {2 * x32.size * 4 / dtc32 / 1e9:.1f} GB/s "
          f"(bf16 {2 * xb.size * 2 / dtcb / 1e9:.1f}); level-1 floor "
          f"f32 {dtc32 * 1e3:.2f} ms bf16 {dtcb * 1e3:.2f} ms", flush=True)
    return dtc32, dtcb


def level1(x32, xb, fl32, flb, fw_bodies=("v1", "v4"),
           inv_bodies=("v1", "v2")):
    from wavelets_tpu.ops.pallas import mxu2d

    rng = np.random.default_rng(1)
    s32 = jax.device_put(rng.standard_normal((1024, 1024)).astype(np.float32))
    sb = s32.astype(jnp.bfloat16)
    refs = {}
    for body in fw_bodies:
        for xx, big, fl, tag in ((s32, x32, fl32, "f32"),
                                 (sb, xb, flb, "bf16")):
            try:
                f = with_env({"WAVELETS_TPU_MXU_BODY": body}, lambda: jax.jit(
                    lambda v: mxu2d.mxu_level_fw_packed_first(v, wt)[1]),
                    xx, big)
                ys = np.array(f(xx), np.float32)
                hq, wq = ys.shape[0] // 2, ys.shape[1] // 2
                ys[:hq, :wq] = 0.0          # LL of a fresh buffer: unwritten
                err = (0.0 if (tag, "fw") not in refs
                       else float(np.max(np.abs(ys - refs[(tag, "fw")]))))
                refs.setdefault((tag, "fw"), ys)
                dt = time_fn(f, big, 10)
                print(f"level1 fw  {tag:4s} {body}: {dt * 1e3:7.3f} ms "
                      f"(+{(dt - fl) * 1e3:6.3f} over floor)  "
                      f"dev_err_vs_v1 {err:.2e}", flush=True)
            except Exception as e:
                print(f"level1 fw  {tag:4s} {body}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)
    for body in inv_bodies:
        for xx, big, fl, tag in ((s32, x32, fl32, "f32"),
                                 (sb, xb, flb, "bf16")):
            try:
                def inv_full(v):
                    h, hw = v.shape[0] // 2, v.shape[1] // 2
                    return mxu2d.mxu_inv_quads(v[:h, :hw], v[:h, hw:],
                                               v[h:, :hw], v[h:, hw:], wt)
                g = with_env({"WAVELETS_TPU_MXU_INV_BODY": body},
                             lambda: jax.jit(inv_full), xx, big)
                ys = np.array(g(xx), np.float32)
                err = (0.0 if (tag, "iv") not in refs
                       else float(np.max(np.abs(ys - refs[(tag, "iv")]))))
                refs.setdefault((tag, "iv"), ys)
                dt = time_fn(g, big, 10)
                print(f"level1 inv {tag:4s} {body}: {dt * 1e3:7.3f} ms "
                      f"(+{(dt - fl) * 1e3:6.3f} over floor)  "
                      f"dev_err_vs_v1 {err:.2e}", flush=True)
            except Exception as e:
                print(f"level1 inv {tag:4s} {body}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)


def full(x32, xb, fw_bodies=("v1", "v4"), inv_bodies=("v1", "v2")):
    from wavelets_tpu.ops.pallas.lifting2d import dwt2_lifting, idwt2_lifting
    for body in fw_bodies:
        for xx, tag in ((x32, "f32"), (xb, "bf16")):
            try:
                f = with_env({"WAVELETS_TPU_MXU_BODY": body},
                             lambda: jax.jit(lambda v: dwt2_lifting(v, wt, 8)),
                             xx)
                dt = time_fn(f, xx, 20)
                print(f"full fw  {tag:4s} {body}: {dt * 1e3:7.3f} ms "
                      f"({xx.size / dt / 1e9:.1f} Gs/s)", flush=True)
            except Exception as e:
                print(f"full fw  {tag:4s} {body}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)
    y32 = jax.jit(lambda v: dwt2_lifting(v, wt, 8))(x32)
    yb = jax.jit(lambda v: dwt2_lifting(v, wt, 8))(xb)
    for body in inv_bodies:
        for yy, tag in ((y32, "f32"), (yb, "bf16")):
            try:
                g = with_env({"WAVELETS_TPU_MXU_INV_BODY": body},
                             lambda: jax.jit(
                                 lambda v: idwt2_lifting(v, wt, 8)), yy)
                dt = time_fn(g, yy, 20)
                print(f"full inv {tag:4s} {body}: {dt * 1e3:7.3f} ms "
                      f"({yy.size / dt / 1e9:.1f} Gs/s)", flush=True)
            except Exception as e:
                print(f"full inv {tag:4s} {body}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)


def inv_tiles(x32, xb):
    """Tall-tile inverse sweep (the axis-0 lesson's 2-D analogue): tall
    tiles grow the dense col-dot K, which blocking then cuts —
    axis0._axis0_blk landed every direction/dtype on the DMA floor with
    tm up to 1024.  Sweeps WAVELETS_TPU_MXU_INV_TM x COLBLK on the full
    idwt2 L8 pipeline (the VERDICT r4 metric)."""
    from wavelets_tpu.ops.pallas.lifting2d import dwt2_lifting, idwt2_lifting
    from wavelets_tpu.ops.pallas import mxu2d
    y32 = jax.jit(lambda v: dwt2_lifting(v, wt, 8))(x32)
    yb = jax.jit(lambda v: dwt2_lifting(v, wt, 8))(xb)
    ref = {}
    for tag, yy in (("f32", y32), ("bf16", yb)):
        combos = ([(128, 0), (256, 0), (256, 16), (256, 32), (512, 32)]
                  if tag == "f32" else
                  [(128, 32), (256, 32), (512, 32), (512, 64)])
        for tm, q in combos:
            env = {"WAVELETS_TPU_MXU_INV_TM": tm,
                   "WAVELETS_TPU_MXU_COLBLK": q}
            try:
                plan = with_env(env, lambda: mxu2d._plan_inv(
                    SIZE, SIZE, wt, yy.dtype))
                g = with_env(env, lambda: jax.jit(
                    lambda v: idwt2_lifting(v, wt, 8)), yy)
                xs = np.array(g(yy), np.float32)
                err = (0.0 if tag not in ref
                       else float(np.max(np.abs(xs - ref[tag]))))
                ref.setdefault(tag, xs)
                dt = time_fn(g, yy, 20)
                print(f"idwt2 {tag:4s} tm={tm:3d} q={q:2d} plan={plan}: "
                      f"{dt * 1e3:7.3f} ms  err_vs_first {err:.2e}",
                      flush=True)
            except Exception as e:
                print(f"idwt2 {tag:4s} tm={tm:3d} q={q:2d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)


def knobs(x32, xb):
    """Residual single-knob probes on the full pipelines."""
    from wavelets_tpu.ops.pallas.lifting2d import dwt2_lifting, idwt2_lifting
    y32 = jax.jit(lambda v: dwt2_lifting(v, wt, 8))(x32)
    yb = jax.jit(lambda v: dwt2_lifting(v, wt, 8))(xb)
    fw_variants = [
        ("fw-default", {}),
        ("fw-v5", {"WAVELETS_TPU_MXU_BODY": "v5"}),
    ]
    inv_variants = [
        ("inv-default", {}),
        ("inv-margin16", {"WAVELETS_TPU_MXU_MARGIN": "16"}),
        ("inv-split3", {"WAVELETS_TPU_MXU_PREC": "split3"}),
        ("inv-tn8192", {"WAVELETS_TPU_MXU_INV_TN": "8192"}),
    ]
    for name, env in fw_variants:
        for xx, tag in ((x32, "f32"), (xb, "bf16")):
            try:
                f = with_env(env, lambda: jax.jit(
                    lambda v: dwt2_lifting(v, wt, 8)), xx)
                dt = time_fn(f, xx, 20)
                print(f"{name:14s} {tag:4s}: {dt * 1e3:7.3f} ms", flush=True)
            except Exception as e:
                print(f"{name:14s} {tag:4s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
    for name, env in inv_variants:
        for yy, tag in ((y32, "f32"), (yb, "bf16")):
            if name == "inv-split3" and tag == "bf16":
                continue            # bf16 runs native 1-pass dots
            try:
                g = with_env(env, lambda: jax.jit(
                    lambda v: idwt2_lifting(v, wt, 8)), yy)
                dt = time_fn(g, yy, 20)
                print(f"{name:14s} {tag:4s}: {dt * 1e3:7.3f} ms", flush=True)
            except Exception as e:
                print(f"{name:14s} {tag:4s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    x32 = jax.device_put(rng.standard_normal((SIZE, SIZE)).astype(np.float32))
    xb = x32.astype(jnp.bfloat16)
    fl32, flb = floors(x32, xb)
    # argv: [full] [fw=v1,v4] [inv=v1,v2]
    fw_bodies, inv_bodies = ("v1", "v4"), ("v1", "v2")
    args = sys.argv[1:]
    stage = "level1"
    for a in args:
        if a in ("full", "invtiles", "knobs"):
            stage = a
        elif a.startswith("fw="):
            fw_bodies = tuple(a[3:].split(",")) if a[3:] else ()
        elif a.startswith("inv="):
            inv_bodies = tuple(a[4:].split(",")) if a[4:] else ()
    if stage == "full":
        full(x32, xb, fw_bodies, inv_bodies)
    elif stage == "invtiles":
        inv_tiles(x32, xb)
    elif stage == "knobs":
        knobs(x32, xb)
    else:
        level1(x32, xb, fl32, flb, fw_bodies, inv_bodies)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
