"""sift_parallel_optimization_tpu — a TPU-native scale-space / SLAM-SfM framework.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of the
reference C++ study ``ZhangShuui/SIFT-parallel-optimization`` (see SURVEY.md):
the reference's twelve hand-written parallel variants of the Gaussian/DoG
scale-space pyramid (NEON/SSE/AVX/AVX-512 SIMD x pthread/OpenMP threads x MPI
processes) collapse here into

  * one fused Pallas scale-space kernel (SIMD level -> VPU lanes/sublanes,
    thread level -> kernel grid),
  * explicit mesh sharding with shard_map + collectives (process level ->
    ICI/DCN, no collector rank), and
  * a benchmark matrix replacing the reference's hand-edited #include variant
    selection (reference: main.cpp:5-13, GaussDePyramid-pThread.h:310-326).

On top of the parity slice the framework extends into the full north-star
pipeline: DoG extrema detection, SIFT descriptors, batched matching + RANSAC,
incremental SfM and distributed Schur-complement bundle adjustment.
"""

__version__ = "0.1.0"

from sift_parallel_optimization_tpu.config import PyramidConfig, ScaleSpaceMode

__all__ = ["PyramidConfig", "ScaleSpaceMode", "__version__"]
