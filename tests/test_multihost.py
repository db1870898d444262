"""Multi-process (2-host analogue) mesh execution — the DCN code path.

Launches benchmarks/multihost.py: two `jax.distributed.initialize`
processes with 4 virtual CPU devices each form one 8-device global mesh;
sharded dwt1/dwt2 (periodic + zeropad), psum best-basis, and distributed
noisest must match single-process results across the process boundary.
Mirrors the reference's hardware-free accelerator testing discipline
(/root/reference/test/gpu.jl:11-193) applied to multi-host."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow   # ~2-4 min: two fresh processes each compile the
def test_two_process_mesh():   # shard_map programs from cold
    script = os.path.join(os.path.dirname(__file__), "..",
                          "benchmarks", "multihost.py")
    r = subprocess.run([sys.executable, script], capture_output=True,
                       text=True, timeout=900)
    line = r.stdout.strip().splitlines()[-1]
    verdict = json.loads(line)
    assert r.returncode == 0 and verdict["multihost_2proc_ok"], (
        r.stdout[-2000:], r.stderr[-2000:])
