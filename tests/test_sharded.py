"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bags_tpu.core.camera import CameraParams, CameraStatic
from bags_tpu.dist.mesh import make_mesh
from bags_tpu.dist.sharded import sharded_render_loss
from bags_tpu.raster import RenderConfig, render
from bags_tpu.train.losses import photometric_loss
from bags_tpu.utils.testing import make_toy_scene


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_loss_matches_single_device(n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_devices)
    wh = 16 * n_devices  # tile rows divide the mesh
    sc = make_toy_scene(n=64 * n_devices, width=wh, height=wh, sh_degree=1,
                        seed=8)
    static = sc["static"]
    rcfg = RenderConfig(sh_degree=1, backend="jnp",
                        max_instances=1024 * n_devices, max_per_tile=1024)

    from bags_tpu.model.gaussians import Gaussians
    n = sc["xyz"].shape[0]
    g = Gaussians(
        xyz=sc["xyz"],
        sh_dc=sc["sh_coeffs"][:, :1, :],
        sh_rest=sc["sh_coeffs"][:, 1:, :],
        scales_log=jnp.log(sc["scales"]),
        quats=sc["quats"],
        opacity_raw=jnp.log(sc["opacity"] / (1 - sc["opacity"])),
    )
    alive = jnp.ones((n,), bool)
    gt = jnp.zeros((3, wh, wh))
    bg = jnp.zeros(3)

    loss_fn = sharded_render_loss(mesh, static, rcfg)
    from bags_tpu.core.camera import GlobalAlignment
    align = GlobalAlignment.identity()
    probe = jnp.zeros((n, 2))
    loss_sharded, aux = jax.jit(loss_fn)(g, alive, sc["cam"], align, probe,
                                         probe, gt, bg)

    # single-device oracle
    out = render(g.xyz, g.scaling(), g.quats, g.opacity(alive), g.sh_coeffs(),
                 sc["cam"], static, rcfg, bg=bg)
    loss_single = photometric_loss(out.render, gt)

    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux["image"]),
                               np.asarray(out.render), atol=1e-5)


def test_sharded_grads_match_single_device():
    n_devices = 4
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_devices)
    wh = 16 * n_devices
    sc = make_toy_scene(n=32 * n_devices, width=wh, height=wh, seed=9)
    static = sc["static"]
    rcfg = RenderConfig(sh_degree=0, backend="jnp",
                        max_instances=512 * n_devices, max_per_tile=512)

    from bags_tpu.core.camera import GlobalAlignment
    from bags_tpu.model.gaussians import Gaussians
    n = sc["xyz"].shape[0]
    g = Gaussians(
        xyz=sc["xyz"], sh_dc=sc["sh_coeffs"][:, :1, :],
        sh_rest=sc["sh_coeffs"][:, 1:, :],
        scales_log=jnp.log(sc["scales"]), quats=sc["quats"],
        opacity_raw=jnp.log(sc["opacity"] / (1 - sc["opacity"])))
    alive = jnp.ones((n,), bool)
    gt = jnp.full((3, wh, wh), 0.2)
    bg = jnp.zeros(3)
    align = GlobalAlignment.identity()

    loss_fn = sharded_render_loss(mesh, static, rcfg)

    def sharded(g, cam):
        probe = jnp.zeros((n, 2))
        return loss_fn(g, alive, cam, align, probe, probe, gt, bg)[0]

    def single(g, cam):
        out = render(g.xyz, g.scaling(), g.quats, g.opacity(alive),
                     g.sh_coeffs(), cam, static, rcfg, bg=bg)
        return photometric_loss(out.render, gt)

    gs = jax.jit(jax.grad(sharded, argnums=(0, 1)))(g, sc["cam"])
    g1 = jax.jit(jax.grad(single, argnums=(0, 1)))(g, sc["cam"])
    for a, b in zip(jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-3)


def test_sharded_trainer_multistep_densify_matches_single():
    """ShardedTrainer end-to-end: multi-iteration training INCLUDING a
    densification step on the 4-device mesh matches the single-device
    Trainer (same seeds, same cadence) — Gaussians, alive mask, cameras."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from bags_tpu.dist.trainer import ShardedTrainer
    from bags_tpu.model.gaussians import create_from_points
    from bags_tpu.train.config import CalibConfig, TrainConfig
    from bags_tpu.train.loop import Trainer

    rng = np.random.default_rng(4)
    cap = 256
    pts = np.stack([rng.uniform(-1, 1, 128), rng.uniform(-1, 1, 128),
                    rng.uniform(4, 8, 128)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (128, 3)).astype(np.float32)
    # height NOT divisible by 4*16: exercises the trainer's pad+slice
    static = CameraStatic(width=64, height=56)
    cams = jax.tree_util.tree_map(
        lambda *x: jnp.stack(x),
        *[CameraParams.create(np.eye(3, dtype=np.float32),
                              np.zeros(3, np.float32), 0.8, 0.8)
          for _ in range(2)])
    cfg = TrainConfig(max_instances=4096,
                      calib=CalibConfig(opt_cam=True))
    cfg.model.sh_degree = 1
    cfg.opt.densify_from_iter = 1
    cfg.opt.densification_interval = 4
    cfg.opt.densify_grad_threshold = 1e-8
    gt = jnp.full((2, 3, 56, 64), 0.5, jnp.float32)
    rcfg = RenderConfig(sh_degree=1, backend="jnp", max_instances=4096,
                        max_per_tile=512)

    def build(sharded):
        g, alive = create_from_points(pts, cols, cap, sh_degree=1)
        if sharded:
            return ShardedTrainer(g, alive, cams, static, cfg,
                                  scene_extent=10.0, gt_images=gt,
                                  rcfg=rcfg, n_devices=4, seed=3)
        return Trainer(g, alive, cams, static, cfg, scene_extent=10.0,
                       gt_images=gt, rcfg=rcfg, seed=3)

    tr_s = build(True)
    tr_1 = build(False)
    hist_s = tr_s.run(iterations=8, log_every=4)
    hist_1 = tr_1.run(iterations=8, log_every=4)

    n_s = int(jnp.sum(tr_s.state.alive))
    n_1 = int(jnp.sum(tr_1.state.alive))
    assert n_s == n_1 and n_s > 128, f"densify mismatch {n_s} vs {n_1}"
    # collective reduction orders differ from the single-device sums, and
    # Adam normalizes tiny grads, so per-step float drift compounds — the
    # parity bar here is structural + loose numerical agreement (the exact
    # one-step gradient parity is covered by the tests above).
    np.testing.assert_allclose(np.asarray(tr_s.state.g.xyz),
                               np.asarray(tr_1.state.g.xyz),
                               rtol=0.1, atol=2e-2)
    np.testing.assert_allclose(np.asarray(tr_s.state.cams.dq),
                               np.asarray(tr_1.state.cams.dq),
                               rtol=0.05, atol=5e-4)
    assert hist_s[-1][1] == pytest.approx(hist_1[-1][1], rel=1e-2)


def test_sharded_hybrid_trains_and_updates_specular():
    """--hybrid over a mesh: ASG features shard with the Gaussians, the
    specular MLP replicates, and both receive updates."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bags_tpu.core.camera import CameraParams, CameraStatic
    from bags_tpu.dist.mesh import make_mesh
    from bags_tpu.dist.trainer import ShardedTrainer
    from bags_tpu.model.gaussians import create_from_points
    from bags_tpu.raster import RenderConfig
    from bags_tpu.train.config import CalibConfig, TrainConfig

    mesh = make_mesh(2)
    static = CameraStatic(width=64, height=48)
    cap = 128
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1, 1, 64), rng.uniform(-1, 1, 64),
                    rng.uniform(4, 8, 64)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    g, alive = create_from_points(pts, cols, cap, sh_degree=1)
    cams = jax.tree_util.tree_map(
        lambda *x: jnp.stack(x),
        *[CameraParams.create(np.eye(3, dtype=np.float32),
                              np.zeros(3, np.float32), 0.8, 0.8)
          for _ in range(2)])
    cfg = TrainConfig(max_instances=2048, mesh=2,
                      calib=CalibConfig(opt_cam=True, hybrid=True))
    cfg.model.sh_degree = 1
    gt = jnp.full((2, 3, 48, 64), 0.4, jnp.float32)
    rcfg = RenderConfig(sh_degree=1, backend="jnp", max_instances=2048,
                        max_per_tile=512)
    tr = ShardedTrainer(g, alive, cams, static, cfg, scene_extent=8.0,
                        gt_images=gt, rcfg=rcfg, mesh=mesh)
    assert tr.state.g.asg is not None
    spec0 = jax.tree_util.tree_leaves(tr.state.spec)[0].copy()
    asg0 = np.asarray(tr.state.g.asg).copy()
    hist = tr.run(iterations=4, log_every=4)
    assert np.isfinite(hist[-1][1])
    moved_spec = float(jnp.max(jnp.abs(
        jax.tree_util.tree_leaves(tr.state.spec)[0] - spec0)))
    moved_asg = float(np.max(np.abs(np.asarray(tr.state.g.asg) - asg0)))
    assert moved_spec > 0, "specular MLP never updated under sharding"
    assert moved_asg > 0, "ASG features never updated under sharding"


def test_sharded_mcmc_relocation_runs():
    """MCMC mode over a mesh: relocation + SGLD noise on sharded state."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bags_tpu.core.camera import CameraParams, CameraStatic
    from bags_tpu.dist.mesh import make_mesh
    from bags_tpu.dist.trainer import ShardedTrainer
    from bags_tpu.model.gaussians import create_from_points
    from bags_tpu.raster import RenderConfig
    from bags_tpu.train.config import CalibConfig, TrainConfig

    mesh = make_mesh(2)
    static = CameraStatic(width=64, height=48)
    rng = np.random.default_rng(1)
    pts = np.stack([rng.uniform(-1, 1, 96), rng.uniform(-1, 1, 96),
                    rng.uniform(4, 8, 96)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (96, 3)).astype(np.float32)
    g, alive = create_from_points(pts, cols, 128, sh_degree=0)
    cams = jax.tree_util.tree_map(
        lambda *x: jnp.stack(x),
        *[CameraParams.create(np.eye(3, dtype=np.float32),
                              np.zeros(3, np.float32), 0.8, 0.8)
          for _ in range(2)])
    cfg = TrainConfig(max_instances=2048, mesh=2, mcmc=True,
                      calib=CalibConfig(opt_cam=False))
    cfg.model.sh_degree = 0
    cfg.model.cap_max = 128
    cfg.opt.densify_from_iter = 1
    cfg.opt.densification_interval = 2
    gt = jnp.full((2, 3, 48, 64), 0.3, jnp.float32)
    tr = ShardedTrainer(g, alive, cams, static, cfg, scene_extent=8.0,
                        gt_images=gt,
                        rcfg=RenderConfig(sh_degree=0, backend="jnp",
                                          max_instances=2048,
                                          max_per_tile=512), mesh=mesh)
    xyz0 = np.asarray(tr.state.g.xyz).copy()
    hist = tr.run(iterations=5, log_every=5)
    assert np.isfinite(hist[-1][1])
    # SGLD noise + relocation moved positions on the sharded state
    assert float(np.max(np.abs(np.asarray(tr.state.g.xyz) - xyz0))) > 0


@pytest.mark.parametrize("flow_scale,banded", [
    ((1.0, 1.0), False), ((1.5, 1.5), False),
    ((1.0, 1.0), True), ((1.5, 1.5), True)])
def test_sharded_fisheye_step_matches_single_device(flow_scale, banded):
    """One sharded fisheye train step (dist/calib.py) matches one
    single-chip fisheye step (train/calibrated.py) from the same CalibState:
    loss, Gaussian update, camera update, and lens update. flow_scale 1.0
    exercises the no-crop warp branch; 1.5 the center-crop branch; banded
    runs both steps under precision='fast' + warp_ky > 0 (the matmul warp,
    value-parity across the slab/band decomposition)."""
    n_devices = 4
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    from bags_tpu.dist.calib import make_sharded_fisheye_step
    from bags_tpu.model.gaussians import create_from_points
    from bags_tpu.train import calibrated
    from bags_tpu.train.config import CalibConfig, OptimizationConfig, \
        TrainConfig
    from bags_tpu.train.loop import init_train_state

    mesh = make_mesh(n_devices)
    cfg = TrainConfig(
        opt=OptimizationConfig(),
        calib=CalibConfig(opt_cam=True, opt_distortion=True,
                          iresnet_lr=1e-6, flow_scale=list(flow_scale)),
        max_instances=2 ** 13)
    rng = np.random.default_rng(5)
    sc = make_toy_scene(n=60, width=48, height=48, sh_degree=0, seed=5)
    pts = np.asarray(sc["xyz"]) + rng.normal(0, 0.05, (60, 3)).astype(
        np.float32)
    cols = rng.uniform(0.2, 0.8, (60, 3)).astype(np.float32)
    g, alive = create_from_points(pts, cols, 128, sh_degree=0)
    cams = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[CameraParams.create(np.eye(3, dtype=np.float32),
                              np.zeros(3, np.float32), 0.9, 0.9)
          for _ in range(2)])
    base, g_tx, _, _ = init_train_state(g, alive, cams, cfg, 2.0)
    calib_state, txs = calibrated.init_calib_state(base, cfg)
    calib_state = dataclasses.replace(
        calib_state,
        lens=jax.tree_util.tree_map(lambda x: x * 1e-4, calib_state.lens))

    setup = calibrated.make_fisheye_setup(
        focal_x=40.0, focal_y=40.0, persp_wh=(48, 48), fish_wh=(48, 48),
        flow_scale=flow_scale, control_point_sample_scale=8)
    p_view = calibrated.fisheye_control_points(setup, 40.0, 40.0,
                                               flow_scale)
    b2 = calib_state.base
    cams2 = dataclasses.replace(
        b2.cams,
        fovx=jnp.full_like(b2.cams.fovx, setup.fovx),
        fovy=jnp.full_like(b2.cams.fovy, setup.fovy))
    calib_state = dataclasses.replace(
        calib_state, base=dataclasses.replace(b2, cams=cams2))

    rcfg = RenderConfig(sh_degree=0, backend="jnp", max_instances=2 ** 13,
                        max_per_tile=1024,
                        precision="fast" if banded else "exact")
    if banded:
        ky = calibrated.measure_warp_ky(calib_state.lens, p_view, setup,
                                        apply2gt=False)
        setup = dataclasses.replace(setup, warp_ky=ky)
    fh, fw = setup.fish_hw
    fish_gt = jnp.asarray(
        np.random.default_rng(7).uniform(0, 1, (3, fh, fw)).astype(
            np.float32))
    bg = jnp.zeros(3)

    step_1 = calibrated.make_fisheye_train_step(
        setup, rcfg, cfg, g_tx, txs, sh_degree=0, opt_lens=True,
        use_vignetting=False)
    st1, (loss1, _, *_) = step_1(calib_state, fish_gt, p_view,
                                 jnp.asarray(0), bg)

    step_n = make_sharded_fisheye_step(
        mesh, setup, rcfg, cfg, g_tx, txs, sh_degree=0, opt_lens=True,
        use_vignetting=False)
    d = n_devices
    fh_pad = -(-fh // d) * d
    fish_pad = jnp.pad(fish_gt, ((0, 0), (0, fh_pad - fh), (0, 0)))
    stn, (lossn, *_) = step_n(calib_state, fish_pad, p_view,
                              jnp.asarray(0), bg)

    np.testing.assert_allclose(float(lossn), float(loss1),
                               rtol=1e-4, atol=1e-6)
    for name, a, b in [
            ("xyz", st1.base.g.xyz, stn.base.g.xyz),
            ("dq", st1.base.cams.dq, stn.base.cams.dq),
            ("dt", st1.base.cams.dt, stn.base.cams.dt)]:
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=2e-5, err_msg=name)
    for la, lb in zip(jax.tree_util.tree_leaves(st1.lens),
                      jax.tree_util.tree_leaves(stn.lens)):
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=1e-3, atol=1e-7)


def test_sharded_stress_realistic_shapes():
    """VERDICT r3 item 6: the sharded path at realistic shapes on the
    virtual mesh — 512x256 image, 1e5 Gaussians, an intentionally SKEWED
    alive distribution across shards, and capacity overflow — asserting
    loss parity vs single-chip (ample capacity) and overflow reporting
    (tight capacity). Step time is printed for the record."""
    import time

    n_devices = 8
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    mesh = make_mesh(n_devices)
    w, h = 512, 256
    n = 100_000
    sc = make_toy_scene(n=n, width=w, height=h, sh_degree=1, seed=3,
                        scale_range=(0.004, 0.012))
    static = sc["static"]

    from bags_tpu.core.camera import GlobalAlignment
    from bags_tpu.model.gaussians import Gaussians
    g = Gaussians(
        xyz=sc["xyz"], sh_dc=sc["sh_coeffs"][:, :1, :],
        sh_rest=sc["sh_coeffs"][:, 1:, :],
        scales_log=jnp.log(sc["scales"]), quats=sc["quats"],
        opacity_raw=jnp.log(sc["opacity"] / (1 - sc["opacity"])))
    # Skew: shard 0 fully alive, shards 1..6 sparse, shard 7 dead.
    alive_np = np.zeros((n,), bool)
    per = n // n_devices
    alive_np[:per] = True
    alive_np[per:7 * per:5] = True
    alive = jnp.asarray(alive_np)
    gt = jnp.full((3, h, w), 0.3)
    bg = jnp.zeros(3)
    align = GlobalAlignment.identity()
    probe = jnp.zeros((n, 2))

    # --- parity at ample capacity ---------------------------------------
    rcfg = RenderConfig(sh_degree=1, backend="jnp",
                        max_instances=2 ** 19, max_per_tile=2048)
    loss_fn = sharded_render_loss(mesh, static, rcfg, return_image=False)
    f = jax.jit(lambda g_, cam: loss_fn(g_, alive, cam, align, probe,
                                        probe, gt, bg)[0])
    t0 = time.perf_counter()
    loss_sharded = float(f(g, sc["cam"]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        ls = f(g, sc["cam"])
    jax.block_until_ready(ls)
    step_ms = (time.perf_counter() - t0) / 3 * 1e3
    print(f"[stress] 8-dev virtual mesh 512x256/1e5: compile {compile_s:.0f}s"
          f" step {step_ms:.0f}ms")

    out = render(g.xyz, g.scaling(), g.quats, g.opacity(alive),
                 g.sh_coeffs(), sc["cam"], static, rcfg, bg=bg)
    loss_single = float(photometric_loss(out.render, gt))
    np.testing.assert_allclose(loss_sharded, loss_single, rtol=2e-5)

    # --- capacity overflow under sharding --------------------------------
    rcfg_tight = RenderConfig(sh_degree=1, backend="jnp",
                              max_instances=8 * 1024, max_per_tile=2048)
    loss_tight = sharded_render_loss(mesh, static, rcfg_tight,
                                     return_image=False)
    loss_v, aux = jax.jit(
        lambda g_, cam: loss_tight(g_, alive, cam, align, probe, probe,
                                   gt, bg))(g, sc["cam"])
    assert int(aux["n_dropped"]) > 0, "tight budget should overflow"
    assert np.isfinite(float(loss_v))


def test_sharded_trainer_batch_cams():
    """--mesh + --batch_cams composes (VERDICT r2 weak #7): a 4-device
    ShardedTrainer trains with K=2 views per step, loss finite, poses move."""
    n_devices = 4
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    from bags_tpu.dist.trainer import ShardedTrainer
    from bags_tpu.model.gaussians import create_from_points
    from bags_tpu.train.config import CalibConfig, TrainConfig

    mesh = make_mesh(n_devices)
    h = 16 * n_devices
    w = 32
    static = CameraStatic(width=w, height=h)
    cap = 64 * n_devices
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1, 1, cap // 2),
                    rng.uniform(-1, 1, cap // 2),
                    rng.uniform(4, 8, cap // 2)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (cap // 2, 3)).astype(np.float32)
    g, alive = create_from_points(pts, cols, cap, sh_degree=1)
    cams = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[CameraParams.create(np.eye(3, dtype=np.float32),
                              np.zeros(3, np.float32), 0.8, 0.8)
          for _ in range(3)])
    cfg = TrainConfig(max_instances=1024 * n_devices, mesh=n_devices,
                      calib=CalibConfig(opt_cam=True))
    cfg.model.sh_degree = 1
    cfg.opt.batch_cams = 2
    cfg.opt.densify_from_iter = 10 ** 6
    gt = jnp.stack([jnp.full((3, h, w), 0.2 * (i + 1)) for i in range(3)])
    rcfg = RenderConfig(sh_degree=1, backend="jnp",
                        max_instances=cfg.max_instances, max_per_tile=512)
    tr = ShardedTrainer(g, alive, cams, static, cfg, scene_extent=10.0,
                        gt_images=gt, rcfg=rcfg, mesh=mesh)
    dq0 = np.asarray(tr.state.cams.dq).copy()
    hist = tr.run(iterations=4, log_every=4)
    assert np.isfinite(hist[-1][1])
    assert np.abs(np.asarray(tr.state.cams.dq) - dq0).max() > 0


def _mini_calib(cfg, n_pts=60, n_cams=2, seed=5):
    from bags_tpu.model.gaussians import create_from_points
    from bags_tpu.train import calibrated
    from bags_tpu.train.loop import init_train_state

    rng = np.random.default_rng(seed)
    sc = make_toy_scene(n=n_pts, width=48, height=48, sh_degree=0, seed=seed)
    pts = np.asarray(sc["xyz"]) + rng.normal(0, 0.05, (n_pts, 3)).astype(
        np.float32)
    cols = rng.uniform(0.2, 0.8, (n_pts, 3)).astype(np.float32)
    g, alive = create_from_points(pts, cols, 128, sh_degree=0)
    cams = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[CameraParams.create(np.eye(3, dtype=np.float32),
                              np.zeros(3, np.float32), 0.9, 0.9)
          for _ in range(n_cams)])
    base, g_tx, _, _ = init_train_state(g, alive, cams, cfg, 2.0)
    calib_state, txs = calibrated.init_calib_state(base, cfg)
    return sc, calib_state, g_tx, txs


def test_sharded_apply2gt_step_matches_single_device():
    """One sharded --apply2gt fisheye step (warp the GT into the render
    frame, dist/calib.py `_gt_warp_rows` — NO image all-gather) matches the
    single-chip apply2gt step exactly (VERDICT r3 item 5)."""
    n_devices = 4
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    from bags_tpu.dist.calib import make_sharded_fisheye_step
    from bags_tpu.train import calibrated
    from bags_tpu.train.config import CalibConfig, OptimizationConfig, \
        TrainConfig

    mesh = make_mesh(n_devices)
    cfg = TrainConfig(
        opt=OptimizationConfig(),
        calib=CalibConfig(opt_cam=True, opt_distortion=True,
                          iresnet_lr=1e-6, apply2gt=True),
        max_instances=2 ** 13)
    sc, calib_state, g_tx, txs = _mini_calib(cfg)
    calib_state = dataclasses.replace(
        calib_state,
        lens=jax.tree_util.tree_map(lambda x: x * 1e-4, calib_state.lens))

    setup = calibrated.make_fisheye_setup(
        focal_x=40.0, focal_y=40.0, persp_wh=(48, 48), fish_wh=(48, 48),
        control_point_sample_scale=8, apply2gt=True)
    p_view = calibrated.fisheye_control_points(setup, 40.0, 40.0)
    b2 = calib_state.base
    cams2 = dataclasses.replace(
        b2.cams,
        fovx=jnp.full_like(b2.cams.fovx, setup.fovx),
        fovy=jnp.full_like(b2.cams.fovy, setup.fovy))
    calib_state = dataclasses.replace(
        calib_state, base=dataclasses.replace(b2, cams=cams2))

    rcfg = RenderConfig(sh_degree=0, backend="jnp", max_instances=2 ** 13,
                        max_per_tile=1024)
    fh, fw = setup.fish_hw
    fish_gt = jnp.asarray(
        np.random.default_rng(7).uniform(0, 1, (3, fh, fw)).astype(
            np.float32))
    bg = jnp.zeros(3)

    step_1 = calibrated.make_fisheye_train_step(
        setup, rcfg, cfg, g_tx, txs, sh_degree=0, opt_lens=True,
        use_vignetting=False)
    st1, (loss1, _, *_) = step_1(calib_state, fish_gt, p_view,
                                 jnp.asarray(0), bg)

    step_n = make_sharded_fisheye_step(
        mesh, setup, rcfg, cfg, g_tx, txs, sh_degree=0, opt_lens=True,
        use_vignetting=False)
    # apply2gt: the fisheye GT enters REPLICATED and unpadded
    stn, (lossn, *_) = step_n(calib_state, fish_gt, p_view,
                              jnp.asarray(0), bg)

    np.testing.assert_allclose(float(lossn), float(loss1),
                               rtol=1e-4, atol=1e-6)
    for name, a, b in [
            ("xyz", st1.base.g.xyz, stn.base.g.xyz),
            ("dq", st1.base.cams.dq, stn.base.cams.dq),
            ("dt", st1.base.cams.dt, stn.base.cams.dt)]:
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=2e-5, err_msg=name)
    for la, lb in zip(jax.tree_util.tree_leaves(st1.lens),
                      jax.tree_util.tree_leaves(stn.lens)):
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=1e-3, atol=1e-7)


def test_sharded_cubemap_step_matches_single_device():
    """One sharded 5-face cubemap step (dist/calib.py
    make_sharded_cubemap_step) matches the single-chip cubemap step from
    the same CalibState: loss, Gaussian update, camera update, cubemap-net
    update (VERDICT r3 item 4)."""
    n_devices = 4
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    from bags_tpu.dist.calib import make_sharded_cubemap_step
    from bags_tpu.train import calibrated
    from bags_tpu.train.config import CalibConfig, OptimizationConfig, \
        TrainConfig

    mesh = make_mesh(n_devices)
    cfg = TrainConfig(
        opt=OptimizationConfig(),
        calib=CalibConfig(opt_cam=True, cubemap=True, mask_radius=20,
                          control_point_sample_scale=8, iresnet_lr=1e-7),
        max_instances=2 ** 13)
    sc, calib_state, g_tx, txs = _mini_calib(cfg)
    calib_state = dataclasses.replace(
        calib_state,
        cubemap_net=jax.tree_util.tree_map(lambda x: x * 1e-4,
                                           calib_state.cubemap_net))
    static = CameraStatic(width=48, height=48)
    subs = calibrated.build_sub_cameras(calib_state.base.cams)
    sub_q = jnp.stack([s.q_init[0] for s in subs[:4]])
    sub_t = jnp.stack([s.t_init[0] for s in subs[:4]])

    rcfg = RenderConfig(sh_degree=0, backend="jnp", max_instances=2 ** 13,
                        max_per_tile=1024)
    gt = jnp.asarray(np.random.default_rng(9).uniform(
        0, 1, (3, 48, 48)).astype(np.float32))
    bg = jnp.zeros(3)

    step_1 = calibrated.make_cubemap_train_step(
        static, rcfg, cfg, g_tx, txs, sh_degree=0, focal_x=24.0,
        focal_y=24.0)
    st1, (loss1, *_) = step_1(calib_state, gt, jnp.asarray(0), bg,
                              sub_q, sub_t)

    step_n = make_sharded_cubemap_step(
        mesh, static, rcfg, cfg, g_tx, txs, sh_degree=0, focal_x=24.0,
        focal_y=24.0)
    from bags_tpu.dist.mesh import padded_height
    from bags_tpu.raster.binning import TILE_H
    h_pad = padded_height(48, n_devices, TILE_H)
    gt_pad = jnp.pad(gt, ((0, 0), (0, h_pad - 48), (0, 0)))
    stn, (lossn, *_) = step_n(calib_state, gt_pad, jnp.asarray(0), bg,
                              sub_q, sub_t)

    np.testing.assert_allclose(float(lossn), float(loss1),
                               rtol=1e-4, atol=1e-5)
    # xyz atol covers one full Adam step (lr 1.6e-4 * extent 2): the sharded
    # loss sums the 5 face losses in a different f32 order than the
    # single-chip (1-l)*sum l1 + l*(5 - sum ssim) grouping, so a Gaussian
    # with a ~0 gradient can flip sign and Adam's m/sqrt(v) amplifies that
    # flip to +-lr on the first step. Loss and all other params are tight.
    for name, a, b, atol in [
            ("xyz", st1.base.g.xyz, stn.base.g.xyz, 1e-3),
            ("dq", st1.base.cams.dq, stn.base.cams.dq, 2e-5),
            ("dt", st1.base.cams.dt, stn.base.cams.dt, 2e-5)]:
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=atol, err_msg=name)
    for la, lb in zip(jax.tree_util.tree_leaves(st1.cubemap_net),
                      jax.tree_util.tree_leaves(stn.cubemap_net)):
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=1e-3, atol=1e-7)
