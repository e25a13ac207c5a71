"""End-to-end toy training: loss decreases, pose recovers, densify runs.

This is BASELINE config 1 ("toy 5k-Gaussian 400x400 perturbed-pose scene,
CPU-checkable") shrunk for CI speed.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bags_tpu.core.camera import CameraParams
from bags_tpu.model.gaussians import create_from_points
from bags_tpu.raster import RenderConfig, render
from bags_tpu.train.config import CalibConfig, OptimizationConfig, TrainConfig
from bags_tpu.train.loop import Trainer
from bags_tpu.utils.testing import make_toy_scene


def _setup(n_cams=4, n_pts=120, wh=48, cap=256, pose_noise=0.0):
    rng = np.random.default_rng(3)
    scene = make_toy_scene(n=n_pts, width=wh, height=wh, sh_degree=0, seed=3)
    static = scene["static"]

    # Ground-truth scene renders from several cameras around the origin.
    cams = []
    gt = []
    cfg_r = RenderConfig(sh_degree=0, backend="jnp", max_instances=2 ** 14)
    for i in range(n_cams):
        angle = 0.06 * (i - n_cams / 2)
        R = np.array([[np.cos(angle), 0, np.sin(angle)],
                      [0, 1, 0],
                      [-np.sin(angle), 0, np.cos(angle)]], np.float32)
        cam = CameraParams.create(R, np.zeros(3, np.float32), 0.8, 0.8)
        img = render(scene["xyz"], scene["scales"], scene["quats"],
                     scene["opacity"], scene["sh_coeffs"], cam, static,
                     cfg_r).render
        cams.append(cam)
        gt.append(img)
    gt = jnp.stack(gt)

    # Perturbed init: points jittered, colors random.
    pts = np.asarray(scene["xyz"]) + rng.normal(0, 0.05, (n_pts, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, (n_pts, 3)).astype(np.float32)
    g, alive = create_from_points(pts, cols, cap, sh_degree=0)

    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    if pose_noise > 0:
        dq = rng.normal(0, pose_noise, (n_cams, 4)).astype(np.float32)
        batched = dataclasses.replace(batched, dq=jnp.asarray(dq))
    return g, alive, batched, static, gt


def test_toy_training_loss_decreases():
    g, alive, cams, static, gt = _setup()
    cfg = TrainConfig(
        opt=OptimizationConfig(densify_from_iter=40, densify_until_iter=120,
                               densification_interval=50,
                               opacity_reset_interval=10_000),
        max_instances=2 ** 14,
    )
    cfg.model.sh_degree = 0
    tr = Trainer(g, alive, cams, static, cfg, scene_extent=3.0,
                 gt_images=gt, rcfg=RenderConfig(sh_degree=0, backend="jnp",
                                                 max_instances=2 ** 14))
    hist = tr.run(iterations=100, log_every=10)
    losses = [h[1] for h in hist]
    assert losses[-1] < 0.7 * losses[0], f"loss did not decrease: {losses}"
    # densification ran and the population is still healthy
    assert hist[-1][2] > 100


def test_toy_training_with_pose_optimization():
    g, alive, cams, static, gt = _setup(pose_noise=0.01)
    cfg = TrainConfig(
        opt=OptimizationConfig(densify_from_iter=10_000,
                               densify_until_iter=0),
        calib=CalibConfig(opt_cam=True, r_t_lr=(0.003, 0.003)),
        max_instances=2 ** 14,
    )
    cfg.model.sh_degree = 0
    tr = Trainer(g, alive, cams, static, cfg, scene_extent=3.0,
                 gt_images=gt, rcfg=RenderConfig(sh_degree=0, backend="jnp",
                                                 max_instances=2 ** 14))
    dq_before = float(jnp.abs(tr.state.cams.dq).max())
    hist = tr.run(iterations=60, log_every=20)
    losses = [h[1] for h in hist]
    assert losses[-1] < losses[0]
    # camera residuals moved (pose optimization is active)
    assert float(jnp.abs(tr.state.cams.dq - cams.dq).max()) > 1e-5


def test_camera_row_adam_only_touches_sampled_row():
    from bags_tpu.train.loop import row_adam_init, row_adam_update
    cams = CameraParams(
        q_init=jnp.zeros((3, 4)), t_init=jnp.zeros((3, 3)),
        dq=jnp.zeros((3, 4)), dt=jnp.zeros((3, 3)),
        fovx=jnp.full((3,), 0.8), fovy=jnp.full((3,), 0.8))
    st = row_adam_init(cams)
    grads = CameraParams(
        q_init=jnp.zeros(4), t_init=jnp.zeros(3),
        dq=jnp.ones(4), dt=jnp.ones(3),
        fovx=jnp.ones(()), fovy=jnp.ones(()))
    calib = CalibConfig(opt_cam=True, opt_intrinsic=True)
    new, st2 = row_adam_update(cams, st, grads, jnp.asarray(1), calib,
                               jnp.asarray(0))
    assert float(jnp.abs(new.dq[0]).max()) == 0.0
    assert float(jnp.abs(new.dq[2]).max()) == 0.0
    assert float(jnp.abs(new.dq[1]).max()) > 0.0
    assert int(st2.count[1]) == 1 and int(st2.count[0]) == 0
    # frozen base pose untouched
    assert float(jnp.abs(new.q_init).max()) == 0.0


def test_auto_capacity_growth_on_overflow():
    """A too-small instance budget triggers auto-growth (recompile at a
    bigger static capacity) instead of silently dropping Gaussians."""
    g, alive, cams, static, gt = _setup(n_pts=200, wh=48)
    cfg = TrainConfig(
        opt=OptimizationConfig(densify_from_iter=10_000, position_lr_max_steps=200),
        max_instances=128,  # far below the ~200+ instances the scene needs
        calib=CalibConfig(opt_cam=False),
    )
    tr = Trainer(g, alive, cams, static, cfg, scene_extent=2.0, gt_images=gt,
                 rcfg=RenderConfig(sh_degree=0, backend="jnp",
                                   max_instances=cfg.max_instances))
    m0 = tr._invoke_step(1, 0, gt[0])
    assert int(m0.n_dropped) > 0, "setup should overflow the tiny budget"
    tr.run(iterations=100)
    assert tr.rcfg.max_instances >= 65536
    m1 = tr._invoke_step(1, 0, gt[0])
    assert int(m1.n_dropped) == 0


def test_pose_recovery_below_threshold():
    """BASELINE config 1 pinned as a pytest: with the TRUE splats and noised
    poses, bundle adjustment must recover rotation error well below the
    injected noise and reach a healthy PSNR on a training view."""
    from bags_tpu.eval.metrics import psnr
    from bags_tpu.eval.pose_eval import align_and_pose_error
    from bags_tpu.raster import render as render_fn

    scene = make_toy_scene(n=150, width=48, height=48, sh_degree=0, seed=5)
    static = scene["static"]
    rng = np.random.default_rng(11)
    cfg_r = RenderConfig(sh_degree=0, backend="jnp", max_instances=2 ** 14)
    cams, gt = [], []
    for i in range(4):
        angle = 0.08 * (i - 2)
        R = np.array([[np.cos(angle), 0, np.sin(angle)], [0, 1, 0],
                      [-np.sin(angle), 0, np.cos(angle)]], np.float32)
        cam = CameraParams.create(R, np.zeros(3, np.float32), 0.8, 0.8)
        gt.append(render_fn(scene["xyz"], scene["scales"], scene["quats"],
                            scene["opacity"], scene["sh_coeffs"], cam,
                            static, cfg_r).render)
        cams.append(cam)
    gt = jnp.stack(gt)
    clean = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    noised = dataclasses.replace(
        clean, dq=jnp.asarray(rng.normal(0, 0.02, (4, 4)), jnp.float32))

    from bags_tpu.model.gaussians import create_from_points
    g, alive = create_from_points(np.asarray(scene["xyz"]),
                                  np.full((150, 3), 0.5, np.float32),
                                  256, sh_degree=0)
    # start from the TRUE geometry: this isolates the pose-recovery axis
    g = dataclasses.replace(
        g,
        xyz=g.xyz.at[:150].set(scene["xyz"]),
        scales_log=g.scales_log.at[:150].set(jnp.log(scene["scales"])),
        quats=g.quats.at[:150].set(scene["quats"]),
        opacity_raw=g.opacity_raw.at[:150].set(
            jnp.log(scene["opacity"] / (1 - scene["opacity"]))),
        sh_dc=g.sh_dc.at[:150].set(scene["sh_coeffs"][:, :1]),
        sh_rest=g.sh_rest.at[:150].set(scene["sh_coeffs"][:, 1:]))

    cfg = TrainConfig(
        opt=OptimizationConfig(densify_from_iter=10_000,
                               densify_until_iter=0,
                               position_lr_max_steps=200),
        calib=CalibConfig(opt_cam=True, r_t_lr=(0.003, 0.003)),
        max_instances=2 ** 14)
    cfg.model.sh_degree = 0
    tr = Trainer(g, alive, noised, static, cfg, scene_extent=3.0,
                 gt_images=gt, rcfg=cfg_r)

    _, err0 = align_and_pose_error(noised, clean)
    tr.run(iterations=150)
    _, err1 = align_and_pose_error(tr.state.cams, clean)
    assert err1["rotation_deg_mean"] < 0.5 * err0["rotation_deg_mean"], \
        f"rot err {err0['rotation_deg_mean']} -> {err1['rotation_deg_mean']}"

    cam0 = jax.tree_util.tree_map(lambda x: x[0], tr.state.cams)
    out = render_fn(tr.state.g.xyz, tr.state.g.scaling(), tr.state.g.quats,
                    tr.state.g.opacity(tr.state.alive),
                    tr.state.g.sh_coeffs(), cam0, static, cfg_r)
    p = float(psnr(jnp.clip(out.render, 0, 1), gt[0]))
    assert p > 25.0, f"PSNR after recovery {p}"


def test_gt_prefetch_preserves_camera_pairing():
    """The IO-prefetch path must hand each step the image of the camera it
    draws (order-sensitive: prefetch peeks the shuffled stack)."""
    g, alive, cams, static, gt = _setup(n_cams=4)
    served = []

    def gt_fn(idx):
        served.append(int(idx))
        return gt[idx]

    cfg = TrainConfig(
        opt=OptimizationConfig(densify_from_iter=10_000,
                               position_lr_max_steps=100),
        max_instances=2 ** 14)
    cfg.model.sh_degree = 0
    tr = Trainer(g, alive, cams, static, cfg, scene_extent=3.0,
                 gt_images=gt_fn,
                 rcfg=RenderConfig(sh_degree=0, backend="jnp",
                                   max_instances=2 ** 14))
    drawn = []
    orig = tr._next_camera

    def spy():
        i = orig()
        drawn.append(i)
        return i

    tr._next_camera = spy
    tr.run(iterations=9)
    # every drawn camera idx was served exactly at its position (prefetch
    # extras are fine; pairing is what matters)
    it = iter(served)
    for d in drawn:
        assert d in served
    # and the loss path consumed the right images: re-run one step manually
    m = tr._invoke_step(1, drawn[-1], gt[drawn[-1]])
    assert np.isfinite(float(m.loss))


def test_batched_cameras_training():
    """--batch_cams 2: loss decreases, all sampled camera rows get Adam
    steps, densify stats accumulate per view."""
    g, alive, cams, static, gt = _setup(n_cams=4)
    cfg = TrainConfig(
        opt=OptimizationConfig(densify_from_iter=10_000, batch_cams=2,
                               position_lr_max_steps=100),
        calib=CalibConfig(opt_cam=True, r_t_lr=(0.003, 0.003)),
        max_instances=2 ** 14)
    cfg.model.sh_degree = 0
    tr = Trainer(g, alive, cams, static, cfg, scene_extent=3.0,
                 gt_images=gt, rcfg=RenderConfig(sh_degree=0, backend="jnp",
                                                 max_instances=2 ** 14))
    hist = tr.run(iterations=40, log_every=10)
    losses = [h[1] for h in hist]
    assert losses[-1] < losses[0]
    # every camera's Adam row was stepped at least once over 40x2 draws
    assert int(jnp.min(tr.state.cam_opt.count)) >= 1
    # densify stats accumulated 2 views/iteration
    assert float(jnp.max(tr.state.stats.denom)) >= 2.0
