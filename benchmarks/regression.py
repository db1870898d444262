"""Benchmark-as-regression-test harness.

Mirrors the reference's per-PR benchmark bot
(/root/reference/.github/workflows/benchmark.yml:12-22, AirspeedVelocity):
the CI job runs this grid once on the merge-base checkout and once on the
PR head ON THE SAME RUNNER, then compares — a PR that slows a headline op
by more than the tolerance fails.

Usage:
    python benchmarks/regression.py --out results.json        # run grid
    python benchmarks/regression.py --compare base.json pr.json [--tol 1.10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])   # repo root


def _grid(platform: str):
    """(name, builder) pairs; sizes scale down on CPU runners."""
    big = platform not in ("cpu",)
    s2 = 8192 if big else 512
    s1 = (1 << 20) if big else (1 << 14)
    s3 = 128 if big else 32
    return [
        ("dwt2_cdf97_lifting_L6", dict(op="dwt", ndim=2, size=s2,
                                       wavelet="cdf97", kind="lifting", L=6)),
        ("idwt2_cdf97_lifting_L6", dict(op="idwt", ndim=2, size=s2,
                                        wavelet="cdf97", kind="lifting", L=6)),
        ("dwt2_db2_filter_L6", dict(op="dwt", ndim=2, size=s2,
                                    wavelet="db2", kind="filter", L=6)),
        ("dwt1_db2_lifting_L6", dict(op="dwt", ndim=1, size=s1,
                                     wavelet="db2", kind="lifting", L=6)),
        ("wpt_db4_filter_L5", dict(op="wpt", ndim=1, size=s1,
                                   wavelet="db4", kind="filter", L=5)),
        ("modwt_db4_L4", dict(op="modwt", ndim=1, size=s1,
                              wavelet="db4", kind="filter", L=4)),
        ("dwt3_haar_lifting_L3", dict(op="dwt", ndim=3, size=s3,
                                      wavelet="haar", kind="lifting", L=3)),
    ]


def run_grid(out_path: str):
    import os
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/wavelets_tpu_jax_cache")
    import jax
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass
    import numpy as np
    import wavelets_tpu as w
    from wavelets_tpu.profiling import time_fn

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)
    results = {"_platform": platform}
    # Same-session copy floor: the tunneled chip's streaming bandwidth
    # varies by session (shared tenancy), so cross-session comparisons
    # must normalize each op time by its session's copy-kernel floor —
    # the gate below divides by this before applying the tolerance.
    s2 = 8192 if platform not in ("cpu",) else 512
    xcal = jax.device_put(rng.standard_normal((s2, s2)).astype(np.float32))
    dt_cal = time_fn(jax.jit(lambda v: v + 1.0), xcal,
                     iters=10 if platform != "cpu" else 3)
    results["_copy_floor_ms"] = round(dt_cal * 1e3, 4)
    for name, cfg in _grid(platform):
        wt = w.wt.wavelet(w.wt.ALL_CLASSES[cfg["wavelet"]], cfg["kind"])
        shape = (cfg["size"],) * cfg["ndim"]
        x = jax.device_put(rng.standard_normal(shape).astype(np.float32))
        L = cfg["L"]
        if cfg["op"] == "dwt":
            fn = lambda v: w.dwt(v, wt, L)
        elif cfg["op"] == "idwt":
            fn = lambda v: w.idwt(v, wt, L)
        elif cfg["op"] == "wpt":
            fn = lambda v: w.wpt(v, wt, L=L)
        else:
            fn = lambda v: w.modwt(v, wt, L)
        iters = 10 if platform != "cpu" else 3
        dt = time_fn(fn, x, iters=iters, chain=False)
        results[name] = round(dt * 1e3, 4)
        print(f"{name:28s} {dt*1e3:9.3f} ms", flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


def compare(base_path: str, pr_path: str, tol: float) -> int:
    """Flag entries slower than ``tol``x the base artifact.

    When BOTH artifacts carry a ``_copy_floor_ms`` (same-session copy
    calibration, see run_grid) and ran on the same platform class, each
    time is normalized by its session's floor first — cross-session
    comparisons on the shared-tenancy chip would otherwise flag (or
    mask) pure bandwidth-weather differences."""
    base = json.load(open(base_path))
    pr = json.load(open(pr_path))
    if base.get("_platform") != pr.get("_platform"):
        print(f"SKIP: artifacts are from different platforms "
              f"({base.get('_platform')} vs {pr.get('_platform')}) — "
              f"grid sizes differ, times are not comparable")
        return 0
    fb, fp = base.get("_copy_floor_ms"), pr.get("_copy_floor_ms")
    norm = (fp / fb) if (fb and fp) else 1.0
    if norm != 1.0:
        print(f"copy-floor normalization: base {fb:.3f} ms, "
              f"pr {fp:.3f} ms -> pr times divided by {norm:.3f}")
    bad = []
    for name, b in base.items():
        if name.startswith("_") or name not in pr:
            continue
        p = pr[name] / norm
        ratio = p / b if b > 0 else 1.0
        flag = "REGRESSION" if ratio > tol else "ok"
        print(f"{name:28s} base {b:9.3f} ms  pr {p:9.3f} ms "
              f"({ratio:5.2f}x)  {flag}")
        if ratio > tol:
            bad.append(name)
    if bad:
        print(f"FAIL: {len(bad)} benchmark(s) regressed beyond {tol:.2f}x: "
              + ", ".join(bad))
        return 1
    print("benchmark comparison passed")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out")
    ap.add_argument("--compare", nargs=2, metavar=("BASE", "PR"))
    ap.add_argument("--gate", metavar="LAST_ARTIFACT",
                    help="run the grid now and fail (exit 1) if any entry "
                         "regressed beyond --tol vs the given committed "
                         "artifact, after copy-floor normalization "
                         "(use --tol ~1.25 across sessions: RTT weather "
                         "survives the bandwidth normalization)")
    ap.add_argument("--tol", type=float, default=1.10)
    args = ap.parse_args()
    if args.compare:
        sys.exit(compare(args.compare[0], args.compare[1], args.tol))
    if args.gate:
        import tempfile
        tmp = tempfile.NamedTemporaryFile(suffix=".json", delete=False)
        run_grid(tmp.name)
        sys.exit(compare(args.gate, tmp.name, args.tol))
    run_grid(args.out or "bench_results.json")


if __name__ == "__main__":
    main()
