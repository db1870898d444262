"""1-D transform visualization (mirror of reference example/transform1d.jl;
that script requests wavelet(cdf97, Filter), which no method serves even in
the reference — biorthogonal wavelets transform via lifting here)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import wavelets_tpu as w

J = 11
n = 2 ** J
x = w.testfunction(n, "Bumps")
y = np.asarray(w.dwt(x, w.wt.wavelet(w.wt.cdf97, w.wt.LIFTING)))
d, l = w.wplotdots(y, 0.1, n)
A = w.wplotim(y)

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f, ax = plt.subplots(3, 1, sharex=True, figsize=(6, 5))
    ax[0].plot(x, "k")
    ax[0].set_xlim([0, n])
    ax[0].set_ylabel("signal $x$")
    ax[1].scatter(d, l, s=4)
    ax[1].margins(0.05)
    ax[1].invert_yaxis()
    ax[1].set_ylabel("level $j$")
    ax[2].imshow(A, aspect="auto", interpolation="none")
    ax[2].set_ylim([J - 0.5, -0.5])
    ax[2].set_ylabel("level $j$")
    f.savefig("transform1d_bumps.png", dpi=120)
    print("wrote transform1d_bumps.png")
except ImportError:
    print(f"dwt({n}) -> {len(d)} coefs above 0.1; level image {A.shape}")
