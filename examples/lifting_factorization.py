"""Lifting schemes for EVERY orthogonal family (beyond the reference).

The reference ships hand-coded lifting schemes for four wavelets only
(src/WT/wt_main.jl:451-480: cdf9/7, haar, db1, db2).  Here
``wavelet(c, "lifting")`` works for every exactly-orthonormal family:
wt/factor.py factors the analysis polyphase matrix into predict/update
steps (Daubechies & Sweldens 1998) at construction time, cached per
filter.  The factored schemes

* agree with the filter engine to the coefficient table's own precision,
* round-trip exactly (every lifting step is structurally invertible),
* unlock the exact non-periodic boundary modes where numerically stable
  (a cached probe refuses precision-unsafe combinations), and
* run at filter-path speed on TPU (the MXU kernels derive their banded
  weights from the step chain).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax.numpy as jnp
import wavelets_tpu as w
from wavelets_tpu.wt.factor import cascade_gain

rng = np.random.default_rng(0)
x = rng.standard_normal(1024)

print(f"{'family':8s} {'steps':>5s} {'gain':>9s} {'vs filter':>10s} "
      f"{'round-trip':>10s}")
for name in ("db4", "db7", "db10", "coif4", "sym6", "sym8", "beyl"):
    c = w.wt.ALL_CLASSES[name]
    wf = w.wt.wavelet(c)                 # filter carrier
    wl = w.wt.wavelet(c, "lifting")      # factored GLS carrier
    y_f = w.dwt(x, wf, 4)
    y_l = w.dwt(x, wl, 4)
    rt = float(jnp.max(jnp.abs(w.idwt(y_l, wl, 4) - x)))
    agree = float(jnp.max(jnp.abs(y_f - y_l)))
    print(f"{name:8s} {len(wl.steps):5d} {cascade_gain(wl.steps):9.3g} "
          f"{agree:10.2e} {rt:10.2e}")

# Non-periodic boundaries for families the reference cannot lift at all:
wt = w.wt.wavelet(w.wt.ALL_CLASSES["db4"], "lifting", "symmetric")
img = rng.standard_normal((128, 128))
err = float(jnp.max(jnp.abs(w.idwt(w.dwt(img, wt, 3), wt, 3) - img)))
print(f"\ndb4 + symmetric boundary, 2-D round-trip: {err:.2e}")

# The stability gate in action: db6+symmetric is exact in float64 but
# loses its edge cancellation in float32 — the engine refuses rather
# than returning garbage.
wt6 = w.wt.wavelet(w.wt.ALL_CLASSES["db6"], "lifting", "symmetric")
if jnp.asarray(0.0).dtype == jnp.float64:
    _ = w.dwt(img, wt6, 2)                              # f64: fine
else:   # 32-bit backend (e.g. TPU): the f64 demonstration needs x64
    print("\n(f64 db6+symmetric demo skipped: backend has no float64)")
try:
    w.dwt(img.astype(np.float32), wt6, 2)
except ValueError as e:
    print(f"\ndb6+symmetric at f32 refused:\n  {str(e)[:110]}...")

# Truncated-IIR tables have no exact factorization:
try:
    w.wt.wavelet(w.wt.ALL_CLASSES["batt4"], "lifting")
except ValueError as e:
    print(f"\nbatt4 lifting refused:\n  {str(e)[:110]}...")
