"""Weak-scaling measurement for the sharded 2-D transforms.

Fixed per-device work (rows per device constant), growing the mesh:
reports per-device throughput and weak-scaling efficiency vs 1 device.

On real multi-chip hardware run as-is (one process per host with
jax.distributed.initialize; the mesh spans all chips).  Without TPUs it
runs on the virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8)
— collective overheads are then simulated-in-process and the numbers only
validate the scaling *structure*, not ICI bandwidth.

Usage: python benchmarks/scaling.py [--rows-per-device 2048] [--cols 4096]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-device", type=int, default=1024)
    ap.add_argument("--cols", type=int, default=2048)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--json", type=str, default=None,
                    help="also write the per-mesh-size records to a file")
    ap.add_argument("--fixed-global", action="store_true",
                    help="keep the GLOBAL size fixed while growing the "
                         "mesh.  On the virtual CPU mesh (devices share "
                         "the same cores) this is the honest structure "
                         "metric: total work is constant, so any wall-"
                         "time growth is sharding/collective overhead — "
                         "whereas weak scaling there necessarily "
                         "collapses with core oversubscription.")
    args = ap.parse_args()
    records = []

    import jax
    import jax.numpy as jnp
    import wavelets_tpu as w
    from wavelets_tpu import parallel

    ndev_all = len(jax.devices())
    wt = w.wt.wavelet(w.wt.cdf97, "lifting")
    rng = np.random.default_rng(0)

    def bar(v):
        return float(jnp.sum(v[:1, :1]))

    base_tput = None
    print(f"devices available: {ndev_all}  "
          f"({jax.devices()[0].platform})")
    nd = 1
    base_dt = None
    while nd <= ndev_all:
        mesh = parallel.make_mesh(nd)
        m = (args.rows_per_device if args.fixed_global
             else args.rows_per_device * nd)
        x = rng.standard_normal((m, args.cols)).astype(np.float32)
        xs = parallel.shard_rows(x, mesh)

        y = parallel.dwt2(xs, wt, args.levels, mesh)
        bar(y)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = parallel.dwt2(xs, wt, args.levels, mesh)
        bar(y)
        dt = (time.perf_counter() - t0) / args.iters
        tput = m * args.cols / dt / 1e9
        per_dev = tput / nd
        if base_tput is None:
            base_tput = per_dev
            base_dt = dt
        eff = (base_dt / dt) if args.fixed_global else per_dev / base_tput
        kind = "fixed-global-eff" if args.fixed_global else "weak-eff"
        print(f"n_devices={nd:2d}  global={m}x{args.cols}  "
              f"{dt*1e3:8.2f} ms  {tput:7.2f} Gs/s  "
              f"per-dev {per_dev:6.2f}  {kind} {eff*100:5.1f}%")
        records.append({"n_devices": nd, "rows": m, "cols": args.cols,
                        "levels": args.levels, "ms": round(dt * 1e3, 3),
                        "gsps": round(tput, 3),
                        "per_device_gsps": round(per_dev, 3),
                        ("fixed_global_efficiency" if args.fixed_global
                         else "weak_efficiency"): round(eff, 4)})
        nd *= 2

    if args.json:
        import json
        payload = {"platform": jax.devices()[0].platform,
                   "virtual_mesh": jax.devices()[0].platform == "cpu",
                   "records": records}
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
