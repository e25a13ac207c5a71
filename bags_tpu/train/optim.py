"""Optimizers: per-field Adam groups via optax, matching reference LRs.

Parity targets (SURVEY.md §7.4):
  * one Adam, six parameter groups, eps=1e-15 (`training_setup`,
    scene/gaussian_model.py:192-210): xyz exponential 1.6e-4 -> 1.6e-6
    scaled by scene radius over 30k steps (delay_mult 0.01), f_dc 2.5e-3,
    f_rest /20, opacity 5e-2, scaling 5e-3, rotation 1e-3.
  * per-camera pose Adams with MultiStepLR([7000, 30000], gamma=0.5)
    (`scene/__init__.py:164-198`), fov lr 0.01, global-alignment lr 0.01.

torch.Adam(lr, eps) == optax.adam(lr, eps=eps, eps_root=0.0) (eps outside
the sqrt).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax

from ..core.camera import CameraParams
from ..model.gaussians import Gaussians
from .config import CalibConfig, OptimizationConfig

ADAM_EPS = 1e-15


def expon_lr_schedule(lr_init: float, lr_final: float, max_steps: int,
                      lr_delay_steps: int = 0, lr_delay_mult: float = 1.0):
    """The 3DGS exponential schedule (`get_expon_lr_func`,
    utils/general_utils.py:42-111): log-space interpolation with an optional
    sine-eased warmup delay."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
        else:
            delay = 1.0
        return delay * log_lerp

    return schedule


def multistep_schedule(base_lr: float, milestones: Sequence[int], gamma: float):
    """torch MultiStepLR: lr * gamma^(#milestones passed)."""

    def schedule(step):
        step = jnp.asarray(step)
        n = sum((step >= m).astype(jnp.int32) for m in milestones)
        return base_lr * (gamma ** n.astype(jnp.float32))

    return schedule


def _adam(lr) -> optax.GradientTransformation:
    return optax.adam(lr, b1=0.9, b2=0.999, eps=ADAM_EPS, eps_root=0.0)


def linear_noise_schedule(lr_init: float, lr_final: float, max_steps: int,
                          lr_delay_steps: int = 0, lr_delay_mult: float = 1.0):
    """The reference's `get_linear_noise_func` (utils/general_utils.py:78-111;
    LINEAR interpolation despite its docstring) — used by the specular MLP."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        lerp = lr_init * (1 - t) + lr_final * t
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
        else:
            delay = 1.0
        return delay * lerp

    return schedule


def make_gaussian_optimizer(opt: OptimizationConfig, spatial_lr_scale: float,
                            hybrid: bool = False
                            ) -> optax.GradientTransformation:
    """Six-group Adam over the Gaussians pytree (+ asg group when hybrid)."""
    xyz_sched = expon_lr_schedule(
        opt.position_lr_init * spatial_lr_scale,
        opt.position_lr_final * spatial_lr_scale,
        opt.position_lr_max_steps,
        lr_delay_mult=opt.position_lr_delay_mult)
    labels = Gaussians(
        xyz="xyz", sh_dc="f_dc", sh_rest="f_rest",
        scales_log="scaling", quats="rotation", opacity_raw="opacity",
        asg="asg" if hybrid else None)
    groups = {
        "xyz": _adam(xyz_sched),
        "f_dc": _adam(opt.feature_lr),
        "f_rest": _adam(opt.feature_lr / 20.0),
        "opacity": _adam(opt.opacity_lr),
        "scaling": _adam(opt.scaling_lr),
        "rotation": _adam(opt.rotation_lr),
    }
    if hybrid:
        # The reference never registers the per-splat asg features in any
        # optimizer (the snapshot's hybrid path is incomplete); the intended
        # Spec-Gaussian design trains them like appearance features.
        groups["asg"] = _adam(opt.feature_lr)
    return optax.multi_transform(groups, labels)


def make_specular_optimizer(opt: OptimizationConfig
                            ) -> optax.GradientTransformation:
    """Specular MLP Adam: linear-noise decay feature_lr -> feature_lr/20
    over specular_lr_max_steps (scene/specular_model.py:30-34,49-55)."""
    sched = linear_noise_schedule(
        opt.feature_lr, opt.feature_lr / 20.0,
        getattr(opt, "specular_lr_max_steps", 30_000),
        lr_delay_mult=opt.position_lr_delay_mult)
    return _adam(sched)


def make_camera_optimizer(calib: CalibConfig) -> optax.GradientTransformation:
    """One Adam over the batched CameraParams pytree with per-field LRs and
    the reference's MultiStepLR decay on pose residuals. Base pose/intrinsic
    fields (q_init/t_init) are frozen; when opt_cam/opt_intrinsic are off,
    the corresponding LR is zero."""
    rot_lr, trans_lr = calib.r_t_lr
    rot_sched = multistep_schedule(
        rot_lr if calib.opt_cam else 0.0,
        calib.pose_lr_milestones, calib.pose_lr_gamma)
    trans_sched = multistep_schedule(
        trans_lr if calib.opt_cam else 0.0,
        calib.pose_lr_milestones, calib.pose_lr_gamma)
    fov_lr = calib.fov_lr if calib.opt_intrinsic else 0.0
    labels = CameraParams(
        q_init="frozen", t_init="frozen",
        dq="rot", dt="trans", fovx="fov", fovy="fov")
    return optax.multi_transform(
        {
            "frozen": optax.set_to_zero(),
            "rot": _adam(rot_sched),
            "trans": _adam(trans_sched),
            "fov": _adam(fov_lr),
        },
        labels,
    )


def make_alignment_optimizer(calib: CalibConfig) -> optax.GradientTransformation:
    """Global SIM(3) alignment Adam (`scene/__init__.py:200-202`)."""
    return _adam(calib.global_alignment_lr)
