"""Reference-grid capture: device grid + CPU grid + comparative table.

Usage:  python benchmarks/suite_compare.py [--out SUITE_r05.json]

Runs benchmarks/suite.py twice in subprocesses — once on the device
backend, once with --force-cpu-full (the full reference grid on the CPU
backend, the analogue of gpu_benchmark.jl's CPU side) — and merges them
into one artifact with:

* per-cell device-vs-CPU speedup (the reference's GPU-harness table,
  /root/reference/benchmark/gpu_benchmark.jl:290-296 prints exactly
  this shape);
* vs_published ratios for the configs the reference README actually
  publishes numbers for (BASELINE.md: 1-D db2 2^20 L20 filter/lifting,
  2-D db4/cdf97 1024^2 L10 — measured here at the same config).
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reference README per-iteration times (BASELINE.md:12-17), seconds
PUBLISHED = {
    ("dwt", "db2/filter", "1048576", 20): 0.0247907616,
    ("dwt", "db2/lifting", "1048576", 20): 0.0131240966,
    ("dwt2", "db4/filter", "1024x1024", 10): 0.0773281141,
    ("dwt2", "cdf97/lifting", "1024x1024", 10): 0.0317705928,
}


def run_suite(extra):
    cmd = [sys.executable, os.path.join(ROOT, "benchmarks", "suite.py"),
           "--json"] + extra
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
    rows = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            rows.append(json.loads(line))
    # a non-zero exit after SOME rows (device wedge window mid-grid)
    # must not be silently merged as a complete artifact
    if r.returncode != 0:
        raise RuntimeError(
            f"suite.py {extra} exited {r.returncode} after {len(rows)} "
            f"rows — refusing to write a partial grid:\n"
            f"{r.stdout[-1500:]}\n{r.stderr[-1500:]}")
    if not rows:
        raise RuntimeError(
            f"suite.py {extra} produced no rows:\n{r.stdout[-2000:]}\n"
            f"{r.stderr[-2000:]}")
    return rows


def published_cells():
    """Measure the README-published configs at their exact parameters
    (L=20 / L=10, per-iteration timing) on the device backend."""
    import numpy as np
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/wavelets_tpu_jax_cache")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    sys.path.insert(0, ROOT)
    import wavelets_tpu as w
    from wavelets_tpu.profiling import time_fn
    from wavelets_tpu.transforms import _dwt_jit
    rng = np.random.default_rng(0)
    out = []
    cfgs = [
        ("dwt", "db2/filter", w.wt.wavelet(w.wt.db2), (1 << 20,), 20, 1),
        ("dwt", "db2/lifting", w.wt.wavelet(w.wt.db2, "lifting"),
         (1 << 20,), 20, 1),
        ("dwt2", "db4/filter", w.wt.wavelet(w.wt.db4), (1024, 1024), 10, 2),
        ("dwt2", "cdf97/lifting", w.wt.wavelet(w.wt.cdf97, "lifting"),
         (1024, 1024), 10, 2),
    ]
    for op, wname, wt, shape, L, ndt in cfgs:
        x = jax.device_put(rng.standard_normal(shape).astype(np.float32))
        dt = time_fn(lambda v: _dwt_jit(v, wt, L, ndt, True), x, 10)
        ref = PUBLISHED[(op, wname, "x".join(map(str, shape)), L)]
        out.append({"op": op, "wavelet": wname,
                    "shape": "x".join(map(str, shape)), "L": L,
                    "ms": round(dt * 1e3, 3),
                    "published_reference_ms": round(ref * 1e3, 3),
                    "speedup_vs_published": round(ref / dt, 1)})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SUITE_r05.json")
    args = ap.parse_args()
    dev = run_suite([])
    cpu = run_suite(["--force-cpu-full"])
    cpu_by = {(r["op"], r["wavelet"], r["shape"]): r for r in cpu}
    for r in dev:
        c = cpu_by.get((r["op"], r["wavelet"], r["shape"]))
        r["cpu_ms"] = c["ms"] if c else None
        r["speedup_vs_cpu"] = (round(c["ms"] / r["ms"], 1)
                               if c and r["ms"] else None)
    pub = published_cells()
    art = {"grid": dev, "published_configs": pub,
           "note": ("grid = the reference benchmark/benchmarks.jl cells "
                    "(+16k/bf16 extras); speedup_vs_cpu vs THIS "
                    "framework's CPU backend on the same cell "
                    "(gpu_benchmark.jl-style table); published_configs "
                    "vs the reference README's recorded CPU times")}
    path = os.path.join(ROOT, args.out)
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print(f"{'op':7} {'wavelet':14} {'shape':14} {'dev ms':>9} "
          f"{'cpu ms':>9} {'speedup':>8}")
    for r in dev:
        print(f"{r['op']:7} {r['wavelet']:14} {r['shape']:14} "
              f"{r['ms']:9.3f} "
              f"{r['cpu_ms'] if r['cpu_ms'] is not None else '-':>9} "
              f"{r['speedup_vs_cpu'] if r['speedup_vs_cpu'] else '-':>8}")
    for r in pub:
        print(f"published {r['op']} {r['wavelet']} {r['shape']} L={r['L']}: "
              f"{r['ms']} ms vs reference {r['published_reference_ms']} ms "
              f"({r['speedup_vs_published']}x)")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
