"""bags_tpu — TPU-native self-calibrating (bundle-adjusting) Gaussian Splatting.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
denghilbert/Bundle-Adjusting-Gaussian-Splatting ("Self-Calibrating Gaussian
Splatting", CVPR 2025): a differentiable tile-based 3DGS renderer whose
gradients flow to Gaussian parameters AND through the projection Jacobian to
camera poses / intrinsics, plus the full calibration stack (invertible-ResNet
lens distortion, cubemap >180° FoV rendering, vignetting, entrance-pupil
shift), static-capacity densification, and mesh-sharded multi-chip execution.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  core/   — camera/pose/Lie/SH/projection math (pure jnp, differentiable)
  raster/ — the renderer: EWA projection, tile binning via lax.sort,
            Pallas forward/backward compositing kernels (custom_vjp)
  model/  — Gaussian parameter pytree + static-capacity densification
  calib/  — lens distortion (iResNet), vignetting, cubemap, specular ASG
  data/   — COLMAP/Blender/Metashape loaders, noise injection, Scene
  dist/   — jax.sharding Mesh setup + sharded train step
  train/  — config dataclasses, optax optimizers, training loop
  eval/   — PSNR/SSIM/LPIPS, SIM(3) pose alignment + pose error
"""

__version__ = "0.1.0"

# Top-level convenience API (heavier modules stay lazy).
from .raster import RenderConfig, RenderOutput, render  # noqa: E402,F401


def __getattr__(name):
    if name == "Scene":
        from .data import Scene
        return Scene
    if name == "Trainer":
        from .train.loop import Trainer
        return Trainer
    raise AttributeError(name)
