"""Pallas TPU kernels — the fused accelerator layer (analogue of the
reference's ext/WaveletsGPUExt, as Mosaic kernels instead of
KernelAbstractions launches)."""
