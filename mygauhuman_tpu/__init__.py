"""mygauhuman_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for articulated
3D-Gaussian-splat humans with PBR relighting.

Re-designed from scratch with the capabilities of HandSomeWay/myGauHuman
(GauHuman CVPR 2024 fork): canonical-space Gaussians, SMPL LBS deformation with
learned pose / blend-weight corrections, a differentiable tile rasterizer, KL-guided
densification, and a split-sum IBL PBR stack — all expressed as functional JAX
programs sharded over `jax.sharding.Mesh` device meshes.

Layer map (TPU-first, not a port):
  ops/       fused differentiable rasterizer (projection -> binning -> blend),
             KNN, SH eval, cubemap sampling — jnp reference + Pallas kernels
  models/    SMPL body model, LBS deformation, Gaussian scene pytree, densify
  render/    single multi-channel render pass (replaces the reference's 7 passes)
  pbr/       cubemap env light, split-sum shading, occlusion baking
  data/      cameras + ZJU-MoCap / MonoCap / DNA-Rendering readers
  train/     losses, optimizer groups, train step, checkpointing
  parallel/  mesh + sharding specs (gaussians / tiles / data axes)
"""

__version__ = "0.1.0"
