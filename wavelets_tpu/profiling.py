"""Timing and roofline utilities for TPU measurement.

The reference ships no tracing/profiling (SURVEY §5); on TPU the essentials
are (a) an honest wall-clock for async dispatch — including backends whose
``block_until_ready`` is unreliable (the tunneled axon platform returns
early) — and (b) an HBM roofline estimate to report %-of-speed-of-light.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["barrier", "time_fn", "measure_hbm_bandwidth", "roofline_fraction"]


def barrier(y) -> float:
    """Force completion of everything ``y`` depends on by fetching one
    scalar (cost: one tunnel RTT, not a full-array transfer)."""
    flat = jnp.ravel(y) if not isinstance(y, (tuple, list)) else jnp.ravel(y[0])
    return float(jnp.sum(flat[:1]))


def time_fn(fn, x, iters: int = 10, chain: bool = True) -> float:
    """Median-free simple average seconds/iteration of ``fn`` with a
    dependency chain (prevents queue overlap) and a scalar barrier.

    The closing barrier's own latency is measured on the already-ready
    result and subtracted: on the tunneled axon platform one scalar
    fetch costs a FIXED ~29 ms (size-independent; pure host/RTT fetch
    path, no device work), which otherwise inflates every reading by
    ~29ms/iters — an iters-dependent artifact, not op time.  Discovered
    round 3 via an iters sweep (5..80 fits t + C/iters with C ≈ 28-29 ms
    for both a copy kernel and the dwt); all round-1/2 numbers carry it.
    Same-iters A/B comparisons were and remain valid (equal inflation)."""
    y = fn(x)
    barrier(y)
    same = getattr(y, "shape", None) == getattr(x, "shape", None) and \
        getattr(y, "dtype", None) == getattr(x, "dtype", None)
    t0 = time.perf_counter()
    v = x
    for _ in range(iters):
        v = fn(v) if (chain and same) else fn(x)
    barrier(v)
    t1 = time.perf_counter()
    # calibrate the fetch latency on the now-ready result (min of 3 —
    # robust to per-fetch RTT spikes during the timed barrier vs calmer
    # calibration probes)
    probes = []
    for _ in range(3):
        b0 = time.perf_counter()
        barrier(v)
        probes.append(time.perf_counter() - b0)
    c = min(probes)
    # robust noise scale: median-minus-min (a single RTT spike among the
    # probes must not condemn an otherwise clean reading)
    noise = sorted(probes)[1] - c
    net = (t1 - t0) - c
    # Below-floor guard: when the calibration swallows the whole
    # measurement (tiny op at low iters, or an RTT spike in the timed
    # barrier), the reading carries no signal — returning a tiny float
    # silently turns into absurd Gs/s downstream.  Warn and return NaN
    # so callers see the reading was below the measurement floor.
    if net <= noise:
        import warnings
        warnings.warn(
            f"time_fn: measurement ({t1 - t0:.4f}s) is within noise of "
            f"the barrier calibration ({c:.4f}s +/- {noise:.4f}s) — "
            f"reading is below the measurement floor; returning NaN "
            f"(raise iters)")
        return float("nan")
    return net / iters


def measure_hbm_bandwidth(nbytes: int = 1 << 28, iters: int = 30) -> float:
    """Streaming read+write bandwidth (GB/s) via a chained add-1 kernel —
    the copy-kernel calibration for roofline reporting."""
    n = nbytes // 4
    m = 8192
    x = jnp.zeros((n // m, m), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    dt = time_fn(f, x, iters)
    return 2 * x.size * 4 / dt / 1e9


def roofline_fraction(seconds: float, bytes_moved: int,
                      bw_gbps: float | None = None) -> float:
    """Fraction of the measured (or given) HBM roofline achieved by an op
    that must move ``bytes_moved`` bytes."""
    if bw_gbps is None:
        bw_gbps = measure_hbm_bandwidth()
    ideal = bytes_moved / (bw_gbps * 1e9)
    return ideal / seconds
