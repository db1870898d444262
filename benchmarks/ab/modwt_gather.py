"""A/B: sharded-MODWT halo (ppermute) vs all_gather per level, 2-process mesh.

The policy knob is WAVELETS_TPU_MODWT_GATHER_FRAC (parallel/apps.py:
_modwt_gather_frac): gather when h_need >= frac * loc.  This script forces
BOTH variants per level across a REAL process boundary (2 processes x 4
virtual CPU devices, the multihost.py scaffolding) and reports the ratio,
so the default comes from data.  Transport is loopback TCP (gRPC DCN
path) — a comm-PATTERN structure record, not hardware truth, same caveat
as benchmarks/multihost.py's timing section.

Parent mode:  python benchmarks/ab/modwt_gather.py
Worker mode (internal): --worker I PORT
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def worker(pid: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    import wavelets_tpu as w
    from wavelets_tpu import parallel
    from wavelets_tpu.parallel import apps as A
    from wavelets_tpu.ops import modwt as modwt_ops

    mesh = parallel.make_mesh(8)
    nd = mesh.shape["x"]
    wt = w.wt.wavelet(w.wt.db4)       # flen 8: h_need = 7 * 2^(j-1)
    g, h = modwt_ops.modwt_filter_pair(wt)
    rng = np.random.default_rng(3)
    n = 1 << 15                        # loc = 4096/device
    x = rng.standard_normal(n)
    xs = jax.make_array_from_callback(
        x.shape, NamedSharding(mesh, P("x")), lambda idx: x[idx])

    def _timeit(f, v, iters=6):
        r = f(v)
        jax.block_until_ready(r)       # honest on CPU
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(v)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters

    loc = n // nd
    rows = []
    ref_cols = None
    for j in range(1, 14):
        dil = 1 << (j - 1)
        h_need = (len(h) - 1) * dil

        def body(gather, vl):
            w1, v1 = A._modwt_level_body(vl, [h, g], dil, -1, "x", nd,
                                         gather=gather)
            return v1, w1

        out = {}
        for gather in (False, True):
            if not gather and h_need >= loc:
                continue               # single-hop halo structurally out
            f = jax.jit(shard_map(
                lambda v, gather=gather: body(gather, v), mesh=mesh,
                in_specs=(P("x"),), out_specs=(P("x"), P("x"))))
            # equivalence across variants, checked on the local shards
            # (a 2-process global array cannot be fetched whole)
            got = {sh.index: np.asarray(sh.data)
                   for sh in f(xs)[1].addressable_shards}
            if ref_cols is None:
                ref_cols = {}
            key = ("w", j)
            if key in ref_cols:
                for idx, arr in got.items():
                    assert np.abs(arr - ref_cols[key][idx]).max() < 1e-12, \
                        (j, gather)
            else:
                ref_cols[key] = got
            out["gather" if gather else "halo"] = _timeit(f, xs)
        row = {"level": j, "h_need": h_need, "loc": loc,
               "ratio": round(h_need / loc, 4)}
        for k, v in out.items():
            row[f"t_{k}_ms"] = round(v * 1e3, 3)
        if len(out) == 2:
            row["halo_over_gather"] = round(out["halo"] / out["gather"], 3)
        rows.append(row)
        if h_need >= loc:
            break
    if pid == 0:
        print("TIMING " + json.dumps({
            "op": "sharded modwt level, halo vs all_gather, db4",
            "n": n, "nd": nd, "dtype": "float64",
            "transport": "loopback TCP (structure record)",
            "levels": rows}), flush=True)
    print(f"WORKER {pid} OK", flush=True)


def parent() -> int:
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i),
         str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    ok = True
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out = p.communicate()[0] + "\nTIMEOUT"
        ok &= (p.returncode == 0 and f"WORKER {i} OK" in out)
        for ln in out.splitlines():
            if ln.startswith("TIMING ") and i == 0:
                print(ln[len("TIMING "):], flush=True)
        if p.returncode != 0:
            sys.stderr.write(f"--- worker {i} ---\n{out[-3000:]}\n")
    print("DONE" if ok else "FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
    else:
        sys.exit(parent())
