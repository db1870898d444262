"""Property sweep: round-trip and energy invariants across randomized
(wavelet, shape, levels) configurations — the long tail of corner cases
the targeted tests don't enumerate."""

import numpy as np
import pytest

import wavelets_tpu as w

RNG = np.random.default_rng(12345)

ORTHO = ["haar", "db1", "db2", "db3", "db5", "db7", "db10",
         "coif2", "coif4", "sym4", "sym7", "sym10", "beyl", "vaid"]
# all factored schemes are fair game now (wt/factor.py); keep the
# ill-conditioned vaid out of blanket 1e-9 round-trip assertions
LIFT = ["haar", "db1", "db2", "cdf97", "db4", "db5", "db7", "db10",
        "coif4", "sym6", "sym8", "beyl"]


def _cases():
    cases = []
    for _ in range(30):
        wname = ORTHO[RNG.integers(len(ORTHO))]
        kind = "filter"
        if RNG.random() < 0.35:
            wname = LIFT[RNG.integers(len(LIFT))]
            kind = "lifting"
        ndim = int(RNG.integers(1, 4))
        dims = []
        for _ in range(ndim):
            dims.append(int(2 ** RNG.integers(2, 6) *
                            RNG.choice([1, 1, 1, 3, 5])))
        shape = tuple(dims)
        Lmax = w.maxtransformlevels(shape)
        L = int(RNG.integers(0, Lmax + 1))
        cases.append((wname, kind, shape, L))
    return cases


@pytest.mark.parametrize("wname,kind,shape,L", _cases())
def test_roundtrip_and_energy(wname, kind, shape, L):
    x = RNG.standard_normal(shape)
    wt = w.wt.wavelet(w.wt.ALL_CLASSES[wname], kind)
    y = np.asarray(w.dwt(x, wt, L))
    assert y.shape == x.shape
    xr = np.asarray(w.idwt(y, wt, L))
    assert np.max(np.abs(xr - x)) < 1e-9, (wname, kind, shape, L)
    # orthogonal filters preserve energy (truncated/biortho excluded)
    if kind == "filter" and wname not in ("beyl", "vaid") \
            and not wname.startswith(("batt", "coif10")):
        assert abs(np.linalg.norm(y) - np.linalg.norm(x)) < 1e-8 * x.size


@pytest.mark.parametrize("seed", range(6))
def test_wpt_random_trees_roundtrip(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(2 ** rng.integers(3, 7))
    x = rng.standard_normal(n)
    tree = w.maketree(n, w.maxtransformlevels(n), "full")
    # random prune preserving validity
    for i in range(len(tree) - 1, 0, -1):
        if tree[i] and rng.random() < 0.5:
            tree[i] = False
            j = 2 * i + 1
            stack = [j, j + 1]
            while stack:
                k = stack.pop()
                if k < len(tree) and tree[k]:
                    tree[k] = False
                    stack.extend([2 * k + 1, 2 * k + 2])
    assert w.isvalidtree(n, tree)
    for wt in (w.wt.wavelet(w.wt.db2), w.wt.wavelet(w.wt.db2, "lifting")):
        y = w.wpt(x, wt, tree)
        assert np.allclose(np.asarray(w.iwpt(y, wt, tree)), x, atol=1e-10)
