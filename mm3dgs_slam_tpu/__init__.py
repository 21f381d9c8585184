"""MM3DGS-SLAM-TPU: a TPU-native 3D Gaussian Splatting SLAM framework.

A from-scratch JAX / XLA / Pallas rebuild of the capabilities of
VITA-Group/MM3DGS-SLAM (arXiv 2404.00923): online RGB(-D)(-IMU) SLAM via
differentiable 3D Gaussian Splatting, with

  * a TPU-native differentiable rasterizer (tile binning decoupled from the
    differentiable composite; fused 6-channel RGB+depth/silhouette/E[z^2]
    render; Pallas kernels for the hot composite),
  * gradient-based SE(3) tracking with constant-velocity / IMU motion models,
  * keyframed mapping with covisibility graph, densify/prune on a
    fixed-capacity Gaussian map pytree (static shapes, functional Adam),
  * dataset loaders (TUM, UT-MM, Replica, ...), evaluation (ATE-RMSE,
    PSNR/SSIM), and byte-compatible results.npz / .ply artifacts.

The compute path is functional: all hot loops are `jit`-compiled pure
functions over explicit state pytrees; multi-chip scaling uses
`jax.sharding.Mesh` over ICI (see `mm3dgs_slam_tpu.parallel`).
"""

__version__ = "0.1.0"
