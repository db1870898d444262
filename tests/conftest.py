"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Mirrors the reference's hardware-free GPU testing strategy (test/gpu.jl runs
the accelerator code path on JLArrays): all mesh/halo logic runs on a
virtual 8-device CPU mesh; Pallas kernels run in interpret mode on CPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment presets jax_platforms to "axon,cpu" (tunneled TPU); the
# env var alone does not override it, so force the CPU backend explicitly —
# tests must run hardware-free (and in float64, which TPU lacks).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

# Persistent XLA compile cache: the suite is compile-dominated (CPU f64
# jits + shard_map programs), so reruns drop sharply.  Harmless if the
# cache dir is cold or the backend skips it.
try:
    os.makedirs("/tmp/wavelets_tpu_test_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/wavelets_tpu_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
except Exception:
    pass
