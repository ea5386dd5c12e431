"""Pallas TPU kernels for the hot path.

The reference's accelerator stack is the CUDA file (one thread per hypothesis,
SoA layout, ``GPU_Runtime Test.cu``); here the same capability is VPU-tiled
Pallas: hypotheses live in the lane dimension, components in the sublane/major
dimensions, and the RANSAC scoring loop is fused into the solve so hypotheses
never round-trip through HBM.
"""
