"""tpugs — a TPU-native 3D Gaussian Splatting framework (JAX / XLA / Pallas).

A from-scratch re-design of the capabilities of the reference CUDA implementation
(Artemarius/cuda-gaussian-splatting): differentiable tile-based rasterization with
EWA projection and degree-3 spherical-harmonics color, fused Adam, ADC + MCMC
densification, COLMAP data loading, L1+SSIM training, PSNR/SSIM evaluation, and
3DGS-compatible PLY checkpoints — built TPU-first:

- fixed-capacity, shape-stable Gaussian state (masked, jit-friendly);
- the whole train step is one jitted function (no host syncs in the loop);
- the sequential per-tile compositor is a Pallas kernel pair (fwd + analytic bwd)
  wrapped in jax.custom_vjp; everything else differentiates by autodiff;
- scaling via jax.sharding.Mesh + shard_map collectives, not NCCL.
"""

__version__ = "0.1.0"
