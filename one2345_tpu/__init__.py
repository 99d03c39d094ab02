"""one2345_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the One-2-3-45
single-image-to-textured-mesh pipeline.

The reference system (One-2-3-45, NeurIPS 2023) is a four-stage feed-forward
pipeline: segmentation/recentering, multi-view latent diffusion (Zero123-XL),
LoFTR-based elevation estimation, and a generalizable SparseNeuS cost-volume
reconstruction.  This package re-designs every stage TPU-first:

- all compute stages are pure-functional jitted JAX programs,
- stages exchange in-process arrays instead of PNG files + subprocesses,
- the view x CFG batch axis is sharded over a `jax.sharding.Mesh`,
- dynamic/sparse computations of the reference are re-cast as fixed-shape
  masked dense computations that XLA can tile onto the MXU.

Subpackages
-----------
core         config / device-mesh / checkpoint / profiling substrate
geometry     cameras, rays, projection, sampling (pure jittable math)
nn           shared Flax building blocks
recon        generalizable SparseNeuS reconstruction (cost volume -> mesh)
diffusion    Zero123-XL latent diffusion (UNet, VAE, CLIP, DDIM)
segmentation SAM ViT-H segmentation + image recentering
elevation    LoFTR feature matching + elevation search
pipeline     end-to-end orchestration (CLI + API surface)
training     training loops (recon + zero123) with pjit data parallelism
ops          Pallas TPU kernels
native       C++ native components (marching cubes)
"""

__version__ = "0.1.0"
