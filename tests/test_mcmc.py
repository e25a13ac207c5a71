"""MCMC relocation densifier tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bags_tpu.model import mcmc
from bags_tpu.model.gaussians import create_from_points, inverse_sigmoid


def _make(rng, n=40, cap=64):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    return create_from_points(pts, cols, cap, sh_degree=0)


def test_compute_relocation_identity():
    """N=1 merge leaves opacity/scale unchanged."""
    o = jnp.array([0.3, 0.7, 0.95])
    s = jnp.ones((3, 3)) * 0.1
    no, ns = mcmc.compute_relocation(o, s, jnp.array([1, 1, 1]))
    np.testing.assert_allclose(np.asarray(no), np.asarray(o), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ns), np.asarray(s), rtol=1e-4)


def test_compute_relocation_merge_reduces_opacity():
    o = jnp.array([0.9])
    s = jnp.ones((1, 3))
    no, ns = mcmc.compute_relocation(o, s, jnp.array([4]))
    # 1 - (1-0.9)^(1/4)
    np.testing.assert_allclose(float(no[0]), 1 - 0.1 ** 0.25, rtol=1e-5)
    assert float(ns[0, 0]) < 1.0  # merged scale shrinks


def test_relocate_dead(rng):
    g, alive = _make(rng)
    op = np.array(g.opacity_raw)
    op[:8] = float(inverse_sigmoid(jnp.float32(0.001)))  # 8 dead
    g = dataclasses.replace(g, opacity_raw=jnp.asarray(op))
    res = mcmc.relocate_dead(g, alive, jax.random.PRNGKey(0))
    assert int(res.n_relocated) == 8
    # relocated slots now have healthy opacity
    new_op = np.asarray(jax.nn.sigmoid(res.gaussians.opacity_raw))[:8]
    assert (new_op > 0.004).all()
    # relocated positions coincide with live sources
    live_xyz = np.asarray(g.xyz)[8:40]
    for i in range(8):
        d = np.abs(live_xyz - np.asarray(res.gaussians.xyz)[i]).sum(-1).min()
        assert d < 1e-5


def test_add_new_gaussians_grows(rng):
    g, alive = _make(rng, n=40, cap=64)
    res = mcmc.add_new_gaussians(g, alive, jax.random.PRNGKey(1),
                                 cap_max=64, growth=1.2)
    assert int(jnp.sum(res.alive)) == 48  # 40 * 1.2


def test_position_noise_moves_low_opacity_only(rng):
    g, alive = _make(rng)
    op = np.array(g.opacity_raw)
    op[:10] = -8.0   # nearly transparent -> gets noise
    op[10:] = 6.0    # opaque -> gate ~ 0
    g = dataclasses.replace(g, opacity_raw=jnp.asarray(op))
    xyz = mcmc.position_noise(g, alive, jax.random.PRNGKey(2),
                              xyz_lr=jnp.asarray(1e-4))
    moved = np.abs(np.asarray(xyz) - np.asarray(g.xyz)).sum(-1)
    assert moved[:10].mean() > moved[10:40].mean() * 10


def test_mcmc_training_runs(rng):
    from bags_tpu.core.camera import CameraParams
    from bags_tpu.raster import RenderConfig, render
    from bags_tpu.train.config import OptimizationConfig, TrainConfig
    from bags_tpu.train.loop import Trainer
    from bags_tpu.utils.testing import make_toy_scene

    sc = make_toy_scene(n=100, width=32, height=32, seed=6)
    cam = sc["cam"]
    gt = render(sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
                sc["sh_coeffs"], cam, sc["static"],
                RenderConfig(sh_degree=0, backend="jnp",
                             max_instances=2 ** 12)).render
    pts = np.asarray(sc["xyz"])
    g, alive = create_from_points(pts, rng.uniform(size=(100, 3)).astype(np.float32),
                                  256, sh_degree=0)
    cams = jax.tree_util.tree_map(lambda *x: jnp.stack(x), cam)
    cfg = TrainConfig(
        opt=OptimizationConfig(densify_from_iter=5, densify_until_iter=40,
                               densification_interval=10),
        mcmc=True, max_instances=2 ** 12)
    cfg.model.sh_degree = 0
    cfg.model.cap_max = 200
    tr = Trainer(g, alive, cams, sc["static"], cfg, scene_extent=3.0,
                 gt_images=gt[None],
                 rcfg=RenderConfig(sh_degree=0, backend="jnp",
                                   max_instances=2 ** 12))
    hist = tr.run(iterations=40, log_every=10)
    losses = [h[1] for h in hist]
    assert np.isfinite(losses).all()
    assert hist[-1][2] <= 200  # respects cap_max
    # 0.5%/interval growth of 100 rounds to 100 (same as the reference's
    # int(1.005 * current)) — population must at least not shrink
    assert hist[-1][2] >= 100
