"""wavelets_tpu — a TPU-native wavelet transform framework in JAX/Pallas.

A from-scratch reimplementation of the full capability surface of the
Wavelets.jl reference library, designed TPU-first: functional transforms,
static shapes, batched/sharded execution, Pallas kernels on the hot paths,
and jax.sharding collectives for multi-chip scaling.

Public surface (mirrors the reference's export list, src/Wavelets.jl:17-64):

  transforms:  dwt, idwt, wpt, iwpt, modwt, imodwt, dwtc, idwtc
  wavelets:    wt.wavelet, wt.db2, wt.haar, wt.cdf97, ... (wt module)
  utilities:   maketree, isvalidtree, testfunction, makewavelet, index math
  threshold:   threshold, HardTH/SoftTH/..., denoise, VisuShrink, noisest,
               bestbasistree, coefentropy, matchingpursuit
  plotting:    wplotdots, wplotim
  parallel:    sharded multi-chip transforms (wavelets_tpu.parallel)
"""

from . import wt
from . import utils
from .utils import (
    detailindex, detailrange, detailn,
    maxtransformlevels, maxmodwttransformlevels,
    dyadicdetailindex, dyadicdetailrange, dyadicscalingrange,
    dyadicdetailn, ndyadicscales, maxdyadiclevel,
    tl2dyadiclevel, dyadiclevel2tl,
    iscube, isdyadic, sufficientpoweroftwo,
    maketree, isvalidtree,
    mirror, upsample, downsample, wcount, circshift,
    makewavelet, testfunction,
)
from .wt import (
    DiscreteWavelet, FilterWavelet, LSWavelet, OrthoFilter, GLS, wavelet,
)
from .transforms import dwt, idwt, wpt, iwpt, modwt, imodwt, dwtc, idwtc
# Functional analogues of the reference's split!/merge! polyphase utilities
# (src/Util/Util.jl:14-43; the in-place stridedcopy! has no functional
# counterpart — see PARITY.md).
from .ops.lifting import split_last, merge_last
from .subbands import dwt_subbands, idwt_subbands, to_packed, from_packed
from .threshold import (
    threshold, HardTH, SoftTH, SemiSoftTH, SteinTH, BiggestTH, PosTH, NegTH,
    DNFT, VisuShrink, denoise, noisest,
    coefentropy, Entropy, ShannonEntropy, LogEnergyEntropy, bestbasistree,
    matchingpursuit,
)
from .plot import wplotdots, wplotim

__version__ = "0.1.0"

__all__ = [
    "wt", "utils",
    "dwt", "idwt", "wpt", "iwpt", "modwt", "imodwt", "dwtc", "idwtc",
    "dwt_subbands", "idwt_subbands", "to_packed", "from_packed",
    "DiscreteWavelet", "FilterWavelet", "LSWavelet", "OrthoFilter", "GLS",
    "wavelet",
    "detailindex", "detailrange", "detailn",
    "maxtransformlevels", "maxmodwttransformlevels",
    "dyadicdetailindex", "dyadicdetailrange", "dyadicscalingrange",
    "dyadicdetailn", "ndyadicscales", "maxdyadiclevel",
    "tl2dyadiclevel", "dyadiclevel2tl",
    "iscube", "isdyadic", "sufficientpoweroftwo",
    "maketree", "isvalidtree",
    "mirror", "upsample", "downsample", "wcount", "circshift",
    "split_last", "merge_last",
    "makewavelet", "testfunction",
    "threshold", "HardTH", "SoftTH", "SemiSoftTH", "SteinTH", "BiggestTH",
    "PosTH", "NegTH", "DNFT", "VisuShrink", "denoise", "noisest",
    "coefentropy", "Entropy", "ShannonEntropy", "LogEnergyEntropy", "bestbasistree",
    "matchingpursuit",
    "wplotdots", "wplotim",
]
