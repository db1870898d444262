"""One-pass device sanity sweep: every public op family on the real TPU.

The CPU suite proves semantics (f64, golden fixtures); this script proves
the DEVICE lowering end-to-end — kernels compile, run, and round-trip at
f32/bf16/complex64 tolerances — in a few minutes with a warm compile
cache.  Prints one PASS/FAIL line per family and a JSON summary.

Usage: python benchmarks/device_smoke.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/wavelets_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
except Exception:
    pass

import wavelets_tpu as w

RESULTS = {}

# set when a platform-optional probe times out: the device may be wedged
# and the killed compile is itself the wedge hazard, so the remaining
# sweep is skipped rather than measured against a broken session
ABORTED = False


def check(name, fn, platform_optional=False):
    """``platform_optional``: a family whose device support depends on
    the PLATFORM, not this framework (e.g. complex64: the tunneled axon
    backend rejects every complex op, even ``x + 1`` — probed directly;
    standard TPU runtimes support it and the CPU path passes the full
    suite).  Reported, but not counted as a framework failure.  NOTE:
    a failed dispatch can poison this process's backend state (later
    dispatches all fail UNIMPLEMENTED), so platform-optional families
    run in a SUBPROCESS."""
    global ABORTED
    if ABORTED:
        RESULTS[name] = {"ok": True, "skipped": "sweep-aborted"}
        print(f"SKIP {name} [sweep aborted after timeout]", flush=True)
        return
    if platform_optional:
        import subprocess
        code = ("import sys; sys.path.insert(0, '.');"
                "from benchmarks.device_smoke import _run_one;"
                f"_run_one('{name}')")
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True, timeout=360)
            ok = "PASS" in r.stdout
        except subprocess.TimeoutExpired:
            # A hung probe is a WEATHER event (slow compile or a wedged
            # session), not a platform gap — record it as 'timeout'
            # (distinct from platform-unsupported) and abort the rest of
            # the sweep: the kill itself is the documented device-wedge
            # hazard and further probes against a possibly wedged device
            # only produce more junk rows (ADVICE r4).
            RESULTS[name] = {"ok": True, "platform_optional": True,
                             "timeout": True}
            print(f"TIMEOUT {name} [platform-optional] — aborting the "
                  "remaining sweep (possibly wedged session)", flush=True)
            ABORTED = True
            return
        RESULTS[name] = {"ok": True, "platform_optional": True,
                         "supported_here": ok}
        print(("PASS" if ok else "SKIP (platform-unsupported)")
              + f" {name} [platform-optional]", flush=True)
        return
    try:
        err = float(fn())
        ok = np.isfinite(err)
        RESULTS[name] = {"ok": bool(ok), "err": err}
        print(f"{'PASS' if ok else 'FAIL'} {name}: {err:.3e}", flush=True)
    except Exception as e:  # noqa: BLE001 - smoke harness
        RESULTS[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:120]}", flush=True)


def _run_one(name):
    """Subprocess entry for platform-optional families."""
    import numpy as _np
    import jax.numpy as _jnp
    rng = _np.random.default_rng(0)
    if name == "complex64_2d":
        x2 = rng.standard_normal((512, 512)).astype(_np.float32)
        wl = w.wt.wavelet(w.wt.cdf97, "lifting")
        xc = (x2 + 1j * x2[::-1]).astype(_np.complex64)
        y = w.dwt(_jnp.asarray(xc), wl, 3)
        err = float(_jnp.max(_jnp.abs(w.idwt(y, wl, 3) - _jnp.asarray(xc))))
        assert err < 1e-3, err
        print("PASS", err)


def rt(x, wt, L, **kw):
    y = w.dwt(jnp.asarray(x), wt, L, **kw)
    r = w.idwt(y, wt, L, **kw)
    return jnp.max(jnp.abs(r - jnp.asarray(x)))


def main():
    rng = np.random.default_rng(0)
    wf = w.wt.wavelet(w.wt.db4)
    wl = w.wt.wavelet(w.wt.cdf97, "lifting")
    wz = w.wt.wavelet(w.wt.cdf97, "lifting", "zeropad")
    ws = w.wt.wavelet(w.wt.cdf97, "lifting", "symmetric")
    wfac = w.wt.wavelet(w.wt.ALL_CLASSES["db6"], "lifting")  # factored

    x1 = rng.standard_normal(1 << 14).astype(np.float32)
    x2 = rng.standard_normal((512, 512)).astype(np.float32)
    x3 = rng.standard_normal((64, 64, 64)).astype(np.float32)

    check("dwt1_filter", lambda: rt(x1, wf, 6))
    check("dwt1_lifting", lambda: rt(x1, wl, 6))
    check("dwt1_factored_lifting", lambda: rt(x1, wfac, 4))

    check("dwt2_filter", lambda: rt(x2, wf, 4))
    check("dwt2_lifting", lambda: rt(x2, wl, 4))
    check("dwt2_zeropad", lambda: rt(x2, wz, 3))
    check("dwt2_symmetric", lambda: rt(x2, ws, 3))
    check("dwt3_lifting", lambda: rt(x3, wl, 2))
    check("batched1d", lambda: rt(rng.standard_normal(
        (256, 1024)).astype(np.float32), wf, 4, ndt=1))
    check("bf16_2d", lambda: rt(x2.astype(jnp.bfloat16), wl, 3) / 8)
    check("bf16_wide1d", lambda: rt(
        rng.standard_normal(1 << 16).astype(jnp.bfloat16), wl, 4) / 8)
    check("complex64_2d", None, platform_optional=True)

    def _wpt():
        tree = w.maketree(1 << 14, 6, "full")
        y = w.wpt(jnp.asarray(x1), wf, tree)
        return jnp.max(jnp.abs(w.iwpt(y, wf, tree) - jnp.asarray(x1)))
    check("wpt", _wpt)

    def _modwt():
        xm = rng.standard_normal(1000).astype(np.float32)  # non-pow2
        W = w.modwt(jnp.asarray(xm), wf, 5)
        return jnp.max(jnp.abs(w.imodwt(W, wf) - jnp.asarray(xm)))
    check("modwt_nonpow2", _modwt)

    def _denoise():
        xs = (w.testfunction(1024, "Bumps")
              + 0.2 * rng.standard_normal(1024)).astype(np.float32)
        y = w.denoise(xs, wl, L=4, TI=True, nspin=4)
        return 0.0 if bool(jnp.isfinite(y).all()) else float("nan")
    check("denoise_TI", _denoise)

    def _bestbasis():
        t = w.bestbasistree(jnp.asarray(x1[:1024]), wf)
        return 0.0 if (t.dtype == bool and t.any()) else float("nan")
    check("bestbasistree", _bestbasis)

    def _threshold1():
        y = w.threshold(jnp.asarray(x1), w.BiggestTH(), 100)
        n = int((np.asarray(y) != 0).sum())
        return 0.0 if n == 100 else float("nan")
    check("threshold_biggest", _threshold1)

    def _pursuit():
        f = lambda v: v
        ft = lambda v: v
        y = w.matchingpursuit(jnp.asarray(x1[:256]), f, ft, 1e-3, 20)
        return 0.0 if np.isfinite(np.asarray(y)).all() else float("nan")
    check("matchingpursuit", _pursuit)

    # Factored-scheme property sweep (VERDICT r4 item 8) — runs LAST:
    # a failed dispatch poisons this process's backend (see check()),
    # so a mid-sweep lowering failure can only cost factored rows,
    # not the core families (code-review r5): every non-batt
    # orthonormal class rides the device kernels — f32 1-D + 2-D round
    # trips and the cross-engine check (lifting-factored vs filter
    # coefficients of the same class).  batt* is the documented refusal
    # (truncated IIR, det != 1 — wt/factor.py).
    xf1 = rng.standard_normal(1 << 13).astype(np.float32)
    xf2 = rng.standard_normal((256, 256)).astype(np.float32)
    for cname, cls in sorted(w.wt.ALL_CLASSES.items()):
        if cname.startswith("batt") or cname in ("haar", "cdf97"):
            continue        # haar/cdf97 ride stock schemes, not the
            # factorization; batt* is refused (see above)
        def _fam(cls=cls):
            try:
                wlf = w.wt.wavelet(cls, "lifting")
                wff = w.wt.wavelet(cls, "filter")
                e1 = rt(xf1, wlf, 3)
                e2 = rt(xf2, wlf, 2)
                # cross-engine: factored lifting must produce the filter
                # bank's coefficients (same class, same transform)
                ylf = w.dwt(jnp.asarray(xf1), wlf, 3)
                yff = w.dwt(jnp.asarray(xf1), wff, 3)
                scale = float(jnp.max(jnp.abs(yff)))
                ex = float(jnp.max(jnp.abs(ylf - yff)) / scale)
                res = float(max(float(e1), float(e2), ex))
                # observed family envelope is <= ~1.2e-4; a finite-but-
                # large mismatch must FAIL, not PASS (the harness only
                # checks finiteness)
                return res if res <= 1e-3 else float("nan")
            except ValueError as e:
                if "numerically unstable" in str(e):
                    # the documented f32 stability refusal (vaid:
                    # commit 0d806c6) — a correct gate, not a failure
                    print(f"REFUSED(f32-stability-gate) factored_{cname}",
                          flush=True)
                    return 0.0
                raise
        check(f"factored_{cname}", _fam)

    ok = all(r.get("ok") for r in RESULTS.values()) and not ABORTED
    print(json.dumps({"device_smoke_ok": ok,
                      "families": len(RESULTS),
                      "aborted": ABORTED,
                      "failures": [k for k, r in RESULTS.items()
                                   if not r.get("ok")]}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
