"""Banded (gather-free) lens warp: parity with grid_sample + overflow
machinery + the fast-mode fisheye train-step integration.

On CPU, Precision.DEFAULT matmuls are true f32, so banded_warp here is
float-tight against the gather warp; the bf16-operand error bound that
applies on the chip (~4e-3) is asserted in the tpu-marked lane
(test_tpu.py) and by tools/warpbench.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bags_tpu.utils.image import banded_warp, grid_sample, required_ky


def _radial_grid(ho, wo, stretch=1.2, off=(0.0, 0.0)):
    gy, gx = np.meshgrid(np.linspace(-1.1, 1.1, ho),
                         np.linspace(-1.1, 1.1, wo), indexing="ij")
    r = np.sqrt(gx ** 2 + gy ** 2) + 1e-9
    s = np.tan(np.clip(r * stretch, 1e-6, 1.35)) / (r * stretch)
    return jnp.asarray(np.stack([gx * s + off[0], gy * s + off[1]],
                                axis=-1).astype(np.float32))


def test_banded_warp_matches_grid_sample():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (3, 60, 72)).astype(np.float32))
    grid = _radial_grid(52, 64)
    ky = required_ky(grid, 60, band=8)
    out, over = banded_warp(img, grid, ky=ky, band=8)
    ref = grid_sample(img, grid, align_corners=True)
    assert int(over) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_banded_warp_band_offset_invariant():
    """Band partitioning only shifts exact zeros in the tent contraction:
    different band sizes give the same values (so the sharded row-slab
    warp composes with any slab offset)."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (3, 40, 40)).astype(np.float32))
    grid = _radial_grid(40, 40)
    ky = required_ky(grid, 40, band=32) + 8
    a, _ = banded_warp(img, grid, ky=ky, band=8)
    b, _ = banded_warp(img, grid, ky=ky, band=32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_banded_warp_gradients_match():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (3, 40, 48)).astype(np.float32))
    grid = _radial_grid(36, 44)
    ky = required_ky(grid, 40, band=8)

    def f_ref(i, g):
        return jnp.sum(jnp.sin(grid_sample(i, g) * 3.0))

    def f_band(i, g):
        return jnp.sum(jnp.sin(banded_warp(i, g, ky=ky, band=8)[0] * 3.0))

    gr = jax.grad(f_ref, argnums=(0, 1))(img, grid)
    gb = jax.grad(f_band, argnums=(0, 1))(img, grid)
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(gr[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(gr[1]),
                               atol=1e-4)


def test_banded_warp_overflow_detects_small_window():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 1, (3, 64, 64)).astype(np.float32))
    grid = _radial_grid(64, 64)
    ky = required_ky(grid, 64, band=8)
    assert ky > 4
    _, over = banded_warp(img, grid, ky=4, band=8)
    assert int(over) > 0


def test_banded_warp_out_of_range_zeros():
    """Zeros padding: rows/cols sampling fully outside the image are 0,
    partially-outside taps match gather's inside-test semantics."""
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0.2, 1, (3, 32, 32)).astype(np.float32))
    grid = _radial_grid(32, 32, stretch=2.2)   # rim far outside
    ky = required_ky(grid, 32, band=8)
    out, over = banded_warp(img, grid, ky=ky, band=8)
    ref = grid_sample(img, grid, align_corners=True)
    assert int(over) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)
    assert float(out[:, 0, 0].sum()) == 0.0    # corner maps far outside


def test_cubemap_transposed_banding():
    """Per-face banding orientation (calibrated.measure_cubemap_warp_orient):
    the left/right face reprojections transpose rows<->columns, so their
    chosen orientation is transposed and the resulting window is far
    smaller than the full-height normal one; warp_to_face's transposed
    path is value-identical to the gather warp."""
    import jax

    from bags_tpu.calib import cubemap
    from bags_tpu.calib.iresnet import init_iresnet_params
    from bags_tpu.core.camera import CameraStatic
    from bags_tpu.train.calibrated import (measure_cubemap_warp_ky,
                                           measure_cubemap_warp_orient)

    net = jax.tree_util.tree_map(
        lambda x: x * 1e-6,
        init_iresnet_params(hidden=16, n_blocks=2, n_layers=2, seed=3))
    static = CameraStatic(width=96, height=96)
    ky_normal = measure_cubemap_warp_ky(net, 48.0, 48.0, static, 8)
    ky, flips = measure_cubemap_warp_orient(net, 48.0, 48.0, static, 8)
    assert flips[0] is False or flips[0] == False      # forward face
    assert flips[3] and flips[4], flips                # left/right faces
    assert ky < ky_normal, (ky, ky_normal)

    # value parity of the transposed path vs gather on the 'left' face
    K = np.asarray([[48.0, 0, 48], [0, 48.0, 48], [0, 0, 1]], np.float32)
    rays = cubemap.distorted_rays(net, K, 96, 96, 8)
    img = jnp.asarray(np.random.default_rng(6).uniform(
        0, 1, (3, 96, 96)).astype(np.float32))
    ref, _ = cubemap.warp_to_face(K, rays, img, "left", 96, 96)
    got, over = cubemap.warp_to_face(K, rays, img, "left", 96, 96,
                                     warp_ky=ky, transposed=True)
    assert int(over) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_apply_distortion_banded_parity():
    """apply_distortion_banded == apply_distortion (warp + slice-crop +
    mask) on a real control-grid flow, both directions."""
    from bags_tpu.calib.distortion import (apply_distortion,
                                           apply_distortion_banded)
    from bags_tpu.calib.iresnet import init_iresnet_params
    from bags_tpu.train import calibrated

    setup = calibrated.make_fisheye_setup(
        focal_x=40.0, focal_y=40.0, persp_wh=(48, 48), fish_wh=(40, 40),
        flow_scale=(1.2, 1.2), control_point_sample_scale=8)
    p_view = calibrated.fisheye_control_points(setup, 40.0, 40.0,
                                               (1.2, 1.2))
    lens = jax.tree_util.tree_map(lambda x: x * 1e-2,
                                  init_iresnet_params(seed=0))
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(
        0, 1, (3,) + tuple(
            (setup.render_static.height, setup.render_static.width))
    ).astype(np.float32))
    proj = jnp.asarray([1.0 / np.tan(setup.fovx / 2),
                        1.0 / np.tan(setup.fovy / 2)], jnp.float32)

    w_ref, m_ref, flow = apply_distortion(
        lens, p_view, setup.grid_hw, img, proj, setup.flow_hw,
        final_hw=setup.fish_hw, apply2gt=False)
    ky = calibrated.measure_warp_ky(lens, p_view, setup, apply2gt=False)
    w_b, m_b, _, over = apply_distortion_banded(
        lens, p_view, setup.grid_hw, img, proj, setup.flow_hw, ky,
        final_hw=setup.fish_hw, apply2gt=False)
    assert int(over) == 0
    # slice-crop vs grid-sample-crop: <= 1 ulp position error -> tiny value
    # difference on smooth content; masks must agree except possibly at
    # exact-zero boundary pixels
    np.testing.assert_allclose(np.asarray(w_b), np.asarray(w_ref),
                               atol=5e-5)
    assert float(jnp.mean(jnp.abs(m_b - m_ref))) < 0.01

    fish = jnp.asarray(rng.uniform(0, 1, (3,) + setup.fish_hw).astype(
        np.float32))
    g_ref, gm_ref, _ = apply_distortion(
        lens, p_view, setup.grid_hw, fish, proj, setup.flow_hw,
        apply2gt=True)
    ky2 = calibrated.measure_warp_ky(lens, p_view, setup, apply2gt=True)
    g_b, gm_b, _, over2 = apply_distortion_banded(
        lens, p_view, setup.grid_hw, fish, proj, setup.flow_hw, ky2,
        apply2gt=True)
    assert int(over2) == 0
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_ref),
                               atol=5e-5)


def test_fisheye_step_banded_runs_and_descends():
    """The fast-mode fisheye train step with warp_ky > 0 optimizes and
    reports zero overflow; a deliberately tiny warp_ky reports overflow."""
    from bags_tpu.raster import RenderConfig
    from bags_tpu.train import calibrated
    from bags_tpu.train.config import (CalibConfig, OptimizationConfig,
                                       TrainConfig)
    from tests.test_calibrated_train import _mini_state

    cfg = TrainConfig(
        opt=OptimizationConfig(),
        calib=CalibConfig(opt_cam=True, opt_distortion=True,
                          outside_rasterizer=True, iresnet_lr=1e-5),
        max_instances=2 ** 13)
    sc, base, g_tx, _ = _mini_state(cfg)
    calib_state, txs = calibrated.init_calib_state(base, cfg)
    calib_state = dataclasses.replace(
        calib_state,
        lens=jax.tree_util.tree_map(lambda x: x * 1e-3, calib_state.lens))

    setup = calibrated.make_fisheye_setup(
        focal_x=40.0, focal_y=40.0, persp_wh=(48, 48), fish_wh=(48, 48),
        control_point_sample_scale=8)
    p_view = calibrated.fisheye_control_points(setup, 40.0, 40.0)
    ky = calibrated.measure_warp_ky(calib_state.lens, p_view, setup,
                                    apply2gt=False)
    setup = dataclasses.replace(setup, warp_ky=ky)
    fish_gt = jnp.full((3, 48, 48), 0.4)

    # precision="fast" engages the banded warp (exact would not)
    step = calibrated.make_fisheye_train_step(
        setup, RenderConfig(sh_degree=0, backend="jnp",
                            max_instances=2 ** 13, precision="fast"),
        cfg, g_tx, txs, sh_degree=0, opt_lens=True, use_vignetting=False)
    losses = []
    st = calib_state
    for i in range(6):
        st, (loss, img, _, wover) = step(st, fish_gt, p_view,
                                         jnp.asarray(0), jnp.zeros(3))
        losses.append(float(loss))
        assert int(wover) == 0
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    tiny = dataclasses.replace(setup, warp_ky=2)
    step2 = calibrated.make_fisheye_train_step(
        tiny, RenderConfig(sh_degree=0, backend="jnp",
                           max_instances=2 ** 13, precision="fast"),
        cfg, g_tx, txs, sh_degree=0, opt_lens=False, use_vignetting=False)
    _, (_, _, _, wover) = step2(calib_state, fish_gt, p_view,
                                jnp.asarray(0), jnp.zeros(3))
    assert int(wover) > 0
