"""2-D transform coefficient image (mirror of reference example/transform2d.jl,
with a synthetic image instead of Lena)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import wavelets_tpu as w

n = 512
yy, xx = np.mgrid[0:n, 0:n] / n
img = (np.sin(8 * np.pi * xx) * np.cos(6 * np.pi * yy)
       + ((xx - 0.5) ** 2 + (yy - 0.5) ** 2 < 0.1)).astype(np.float32)

L = 3
xts = w.wplotim(img, L, w.wt.wavelet(w.wt.db3))
print(f"coefficient image {xts.shape}, range [{xts.min():.2f}, {xts.max():.2f}]")

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f, ax = plt.subplots(1, 2, figsize=(8, 4))
    ax[0].imshow(img, cmap="gray")
    ax[0].set_title("image")
    ax[1].imshow(xts, cmap="gray")
    ax[1].set_title(f"dwt coefficients (L={L})")
    f.savefig("transform2d.png", dpi=120)
    print("wrote transform2d.png")
except ImportError:
    pass
