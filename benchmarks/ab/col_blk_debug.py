"""Device repro for the forward COLBLK NaN (col_blk.py round-4 finding):
interpret mode is exact for q in {16,32,64} but the device output carries
NaN/inf.  Localize: quads path vs packed path, which quadrant, which rows.

RESOLUTION (round 4): the 'NaN' was a comparison artifact, not a
miscompile — mxu_level_fw_packed_first never writes the LL quadrant of
the fresh packed buffer (deeper levels or the closing update fill it),
so the probe compared uninitialized HBM.  The localization below showed
exactly that: all non-finite entries confined to the LL region, the
quads path exact.  The packed comparisons now mask the LL quadrant."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/wavelets_tpu_jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wavelets_tpu_jax_cache")
sys.path.insert(0, ".")
import wavelets_tpu as w
from wavelets_tpu.ops.pallas import mxu2d

wt = w.wt.wavelet(w.wt.cdf97, "lifting")
rng = np.random.default_rng(1)
x32 = jax.device_put(rng.standard_normal((1024, 1024)).astype(np.float32))
xb = x32.astype(jnp.bfloat16)

refs = {}
for q in (0, 16, 32):
    os.environ["WAVELETS_TPU_MXU_COLBLK"] = str(q)
    for xx, tag in ((x32, "f32"), (xb, "bf16")):
        # quads path
        try:
            f = jax.jit(lambda v: mxu2d.mxu_level_fw_quads(v, wt))
            quads = [np.asarray(a, np.float32) for a in f(xx)]
            bad = [int(np.sum(~np.isfinite(a))) for a in quads]
            errs = []
            if ("q", tag) in refs:
                errs = [float(np.max(np.abs(a - r)))
                        for a, r in zip(quads, refs[("q", tag)])]
            else:
                refs[("q", tag)] = quads
            print(f"quads  {tag:4s} q={q:2d}: nonfinite/quad {bad} "
                  f"err {['%.1e' % e for e in errs]}", flush=True)
        except Exception as e:
            print(f"quads  {tag:4s} q={q:2d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
        # packed path (LL quadrant masked — never written by this call)
        try:
            g = jax.jit(lambda v: mxu2d.mxu_level_fw_packed_first(v, wt)[1])
            y = np.asarray(g(xx), np.float32)
            y[: y.shape[0] // 2, : y.shape[1] // 2] = 0.0
            nf = ~np.isfinite(y)
            rowband = np.where(nf.any(axis=1))[0]
            colband = np.where(nf.any(axis=0))[0]
            err = (float(np.nanmax(np.abs(y - refs.get(("p", tag), y))))
                   if ("p", tag) in refs else 0.0)
            refs.setdefault(("p", tag), y)
            print(f"packed {tag:4s} q={q:2d}: nonfinite {int(nf.sum())} "
                  f"rows {rowband[:4]}..{rowband[-4:] if len(rowband) else ''} "
                  f"cols {colband[:4]}..{colband[-4:] if len(colband) else ''} "
                  f"err_finite {err:.1e}", flush=True)
        except Exception as e:
            print(f"packed {tag:4s} q={q:2d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
print("DONE", flush=True)
