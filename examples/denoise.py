"""TI denoising demo (mirror of reference example/denoise.jl)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import wavelets_tpu as w

n = 2 ** 11
x0 = w.testfunction(n, "Doppler")
x = (x0 + 0.05 * np.random.default_rng(0).standard_normal(n)).astype(np.float32)
y = np.asarray(w.denoise(x, TI=True))

print(f"noisy MSE {np.mean((x - x0) ** 2):.3e}  "
      f"denoised MSE {np.mean((y - x0) ** 2):.3e}")

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f, ax = plt.subplots(3, 1, sharex=True, figsize=(6, 5))
    for a, sig, ttl in zip(ax, (x0, x, y), ("clean", "noisy", "TI-denoised")):
        a.plot(sig, lw=0.7)
        a.set_ylabel(ttl)
    f.savefig("denoise_doppler.png", dpi=120)
    print("wrote denoise_doppler.png")
except ImportError:
    pass
