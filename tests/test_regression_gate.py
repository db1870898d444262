"""The benchmark-regression gate actually fails on a slowed kernel.

VERDICT r3 item 7: regression.py recorded artifacts but nothing failed
when a number regressed.  These tests pin the gate logic — a slowed
entry trips it (exit 1), pure bandwidth weather (op and copy floor
slowed together) does not, and cross-platform artifacts are refused —
so `regression.py --gate <last-artifact>` is a real CI gate.
"""

import json
import sys

import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from benchmarks.regression import compare  # noqa: E402


def _write(tmp_path, name, d):
    p = tmp_path / name
    p.write_text(json.dumps(d))
    return str(p)


BASE = {"_platform": "axon", "_copy_floor_ms": 10.0,
        "dwt2_cdf97_lifting_L6": 8.0, "wpt_db4_filter_L5": 1.0}


def test_slowed_kernel_trips_gate(tmp_path):
    pr = dict(BASE)
    pr["dwt2_cdf97_lifting_L6"] = 8.0 * 1.5     # deliberately slowed
    b = _write(tmp_path, "base.json", BASE)
    p = _write(tmp_path, "pr.json", pr)
    assert compare(b, p, tol=1.25) == 1


def test_equal_artifacts_pass(tmp_path):
    b = _write(tmp_path, "base.json", BASE)
    p = _write(tmp_path, "pr.json", dict(BASE))
    assert compare(b, p, tol=1.10) == 0


def test_bandwidth_weather_is_normalized_out(tmp_path):
    """A congested session slows every op AND the copy floor by the same
    factor; the floor normalization must keep that from flagging."""
    pr = {k: (v * 2.0 if not isinstance(v, str) else v)
          for k, v in BASE.items()}
    pr["_platform"] = "axon"
    b = _write(tmp_path, "base.json", BASE)
    p = _write(tmp_path, "pr.json", pr)
    assert compare(b, p, tol=1.10) == 0


def test_real_regression_survives_normalization(tmp_path):
    """Slowdown beyond the session's own floor shift still trips."""
    pr = dict(BASE)
    pr["_copy_floor_ms"] = 12.0                  # session 1.2x slower
    pr["dwt2_cdf97_lifting_L6"] = 8.0 * 1.2 * 1.4   # op 1.4x beyond that
    b = _write(tmp_path, "base.json", BASE)
    p = _write(tmp_path, "pr.json", pr)
    assert compare(b, p, tol=1.25) == 1


def test_cross_platform_refused(tmp_path):
    pr = dict(BASE)
    pr["_platform"] = "cpu"
    pr["dwt2_cdf97_lifting_L6"] = 1000.0
    b = _write(tmp_path, "base.json", BASE)
    p = _write(tmp_path, "pr.json", pr)
    # not comparable (different grid sizes) -> skip, not a false FAIL
    assert compare(b, p, tol=1.10) == 0
