"""End-to-end self-calibration: recover a KNOWN lens (VERDICT r4 #2).

The reference's reason to exist is that photometric training alone pulls
the iResNet warp toward the true lens (train.py:255-325). This test
synthesizes fisheye GT through a KNOWN OPENCV_FISHEYE polynomial, starts
the lens from a PERTURBED polynomial (the "inaccurate COLMAP prediction"
scenario, README.md:117-123), trains the fisheye step, and asserts the
recovered flow moves toward the generator — not merely that the loss
descends. tools/lens_recovery.py runs the full-scale on-chip version.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bags_tpu.calib.distortion import (analytic_inverse_flow,
                                       apply_distortion,
                                       distort_by_coeff, flow_error_px,
                                       init_iresnet_from_colmap,
                                       invert_theta_poly)
from bags_tpu.calib.iresnet import init_iresnet_params, iresnet_forward
from bags_tpu.core.camera import CameraParams
from bags_tpu.model.gaussians import Gaussians
from bags_tpu.raster import RenderConfig, render
from bags_tpu.train import calibrated
from bags_tpu.train.config import (CalibConfig, OptimizationConfig,
                                   TrainConfig)
from bags_tpu.train.loop import init_train_state
from bags_tpu.utils.testing import make_toy_scene

TRUE_COEFF = (-0.12, 0.02, 0.0, 0.0)
INIT_COEFF = (-0.04, 0.0, 0.0, 0.0)    # the "inaccurate prediction"


def test_invert_theta_poly_roundtrip():
    r_n = np.linspace(0.01, 1.3, 50)
    theta = np.arctan(r_n)
    pts = np.stack([r_n, np.zeros_like(r_n)], -1)
    r_d = np.asarray(distort_by_coeff(jnp.asarray(pts), TRUE_COEFF))[:, 0]
    th_back = invert_theta_poly(r_d, TRUE_COEFF)
    np.testing.assert_allclose(th_back, theta, atol=2e-4)


def _make_dataset(n_cams=3, wh=64, n=400, focal=24.0):
    """Perspective renders warped through the TRUE analytic lens."""
    sc = make_toy_scene(n=n, width=wh, height=wh, sh_degree=0, seed=11,
                        scale_range=(0.03, 0.1))
    setup = calibrated.make_fisheye_setup(
        focal_x=focal, focal_y=focal, persp_wh=(wh, wh), fish_wh=(wh, wh),
        control_point_sample_scale=4)
    p_view = calibrated.fisheye_control_points(setup, focal, focal)
    proj = jnp.asarray([1.0 / np.tan(setup.fovx / 2),
                        1.0 / np.tan(setup.fovy / 2)], jnp.float32)
    true_flow = analytic_inverse_flow(TRUE_COEFF, p_view, setup.grid_hw,
                                      proj, setup.flow_hw)
    rcfg = RenderConfig(sh_degree=0, backend="jnp", max_instances=2 ** 14)
    static = setup.render_static

    cams, fish_gts = [], []
    for i in range(n_cams):
        a = 0.05 * (i - n_cams / 2)
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        cam = CameraParams.create(R, np.zeros(3, np.float32),
                                  setup.fovx, setup.fovy)
        img = render(sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
                     sc["sh_coeffs"], cam, static, rcfg).render
        fish, _, _ = apply_distortion(
            None, p_view, setup.grid_hw, img, proj, setup.flow_hw,
            final_hw=setup.fish_hw, apply2gt=False, flow=true_flow)
        cams.append(cam)
        fish_gts.append(fish)
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    return sc, setup, p_view, proj, batched, jnp.stack(fish_gts)


def test_fisheye_training_recovers_known_lens():
    sc, setup, p_view, proj, cams, fish_gts = _make_dataset()
    n = sc["xyz"].shape[0]
    g = Gaussians(
        xyz=sc["xyz"], sh_dc=sc["sh_coeffs"][:, :1, :],
        sh_rest=sc["sh_coeffs"][:, 1:, :],
        scales_log=jnp.log(sc["scales"]), quats=sc["quats"],
        opacity_raw=jnp.log(sc["opacity"] / (1 - sc["opacity"])))
    alive = jnp.ones((n,), bool)
    cfg = TrainConfig(
        opt=OptimizationConfig(),
        calib=CalibConfig(opt_cam=False, opt_distortion=True,
                          outside_rasterizer=True, iresnet_lr=3e-5),
        max_instances=2 ** 14)
    base, g_tx, _, _ = init_train_state(g, alive, cams, cfg, 2.0)
    calib_state, txs = calibrated.init_calib_state(base, cfg)

    # lens pre-fit to the WRONG coefficients (short fit: enough to encode
    # the perturbed polynomial)
    K = np.array([[24.0, 0, 32.0], [0, 24.0, 32.0], [0, 0, 1.0]])
    lens = init_iresnet_from_colmap(calib_state.lens, K, 64, 64,
                                    INIT_COEFF, iters=600, lr=3e-4)
    calib_state = dataclasses.replace(calib_state, lens=lens)

    err0 = flow_error_px(lens, TRUE_COEFF, p_view, np.asarray(proj),
                         setup.render_static.width)
    assert err0 > 0.3, f"perturbation produced no initial error: {err0}"

    step = calibrated.make_fisheye_train_step(
        setup, RenderConfig(sh_degree=0, backend="jnp",
                            max_instances=2 ** 14),
        cfg, g_tx, txs, sh_degree=0, opt_lens=True, use_vignetting=False)
    st = calib_state
    bg = jnp.zeros(3)
    losses = []
    for i in range(250):
        idx = i % fish_gts.shape[0]
        st, (loss, _, *_) = step(st, fish_gts[idx], p_view,
                                 jnp.asarray(idx), bg)
        losses.append(float(loss))

    err1 = flow_error_px(st.lens, TRUE_COEFF, p_view, np.asarray(proj),
                         setup.render_static.width)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # the CLAIM: the flow converged toward the generator, not just the loss
    assert err1 < 0.6 * err0, \
        f"lens did not recover: flow error {err0:.3f}px -> {err1:.3f}px"
