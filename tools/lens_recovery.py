#!/usr/bin/env python
"""Known-lens recovery experiment (VERDICT r4 #2): synthesize fisheye GT
through a KNOWN OPENCV_FISHEYE polynomial, start the lens from a perturbed
polynomial, train the full fisheye pipeline, and measure recovered-flow
error / pose error / PSNR against the generator.

Prints one JSON line with the recovery metrics. Run on-chip:

    python tools/lens_recovery.py --iters 3000 --wh 400 --n 20000
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--wh", type=int, default=400)
    p.add_argument("--n", type=int, default=20000)
    p.add_argument("--n_cams", type=int, default=12)
    p.add_argument("--focal_frac", type=float, default=0.375,
                   help="focal = focal_frac * wh (0.375 -> r_d up to "
                        "~1.33 at the sensor edge, a strong fisheye)")
    p.add_argument("--iresnet_lr", type=float, default=1e-6)
    p.add_argument("--pose_noise", type=float, default=0.01)
    p.add_argument("--true_coeff", type=float, nargs=4,
                   default=[-0.12, 0.02, 0.0, 0.0])
    p.add_argument("--init_coeff", type=float, nargs=4,
                   default=[-0.04, 0.0, 0.0, 0.0])
    p.add_argument("--report_every", type=int, default=200)
    p.add_argument("--sh_degree", type=int, default=0,
                   help="0 keeps colors view-independent: with few views, "
                        "view-dependent color lets the scene absorb lens "
                        "error (overfitting) instead of correcting it")
    p.add_argument("--spread", type=float, default=1.0)
    p.add_argument("--true_colors", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--lens_opt_until", type=int, default=0,
                   help="freeze the lens after this iteration (0 = never; "
                        "the reference's --iresnet_opt_duration: lens and "
                        "scene co-adapt, so the lens window is bounded)")
    p.add_argument("--opt_cam", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--scale_range", type=float, nargs=2,
                   default=[0.02, 0.09],
                   help="Gaussian scale range: big enough that the render "
                        "covers the frame (a sparse black scene makes the "
                        "mask-shrink degeneracy cheap for the optimizer)")
    args = p.parse_args(argv)

    from bags_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bags_tpu.calib.distortion import (analytic_inverse_flow,
                                           apply_distortion, flow_error_px,
                                           init_iresnet_from_colmap)
    from bags_tpu.core.camera import CameraParams
    from bags_tpu.eval.metrics import psnr
    from bags_tpu.eval.pose_eval import align_and_pose_error
    from bags_tpu.model.gaussians import Gaussians
    from bags_tpu.raster import RenderConfig, render
    from bags_tpu.train import calibrated
    from bags_tpu.train.config import (CalibConfig, OptimizationConfig,
                                       TrainConfig)
    from bags_tpu.train.loop import init_train_state
    from bags_tpu.utils.testing import make_toy_scene

    wh, focal = args.wh, args.focal_frac * args.wh
    sc = make_toy_scene(n=args.n, width=wh, height=wh,
                        sh_degree=args.sh_degree, seed=11,
                        scale_range=tuple(args.scale_range))
    setup = calibrated.make_fisheye_setup(
        focal_x=focal, focal_y=focal, persp_wh=(wh, wh), fish_wh=(wh, wh),
        control_point_sample_scale=8)
    p_view = calibrated.fisheye_control_points(setup, focal, focal)
    proj = jnp.asarray([1.0 / np.tan(setup.fovx / 2),
                        1.0 / np.tan(setup.fovy / 2)], jnp.float32)
    true_flow = analytic_inverse_flow(args.true_coeff, p_view,
                                      setup.grid_hw, proj, setup.flow_hw)
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    rcfg_gt = RenderConfig(sh_degree=args.sh_degree, backend=backend,
                           max_instances=2 ** 20)
    static = setup.render_static

    # GT fisheye views through the TRUE lens from clean poses (held-out
    # split: every 4th view)
    rng = np.random.default_rng(0)
    fish_gts = []
    render_j = jax.jit(lambda cam: render(
        sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
        sc["sh_coeffs"], cam, static, rcfg_gt).render)
    warp_j = jax.jit(lambda img: apply_distortion(
        None, p_view, setup.grid_hw, img, proj, setup.flow_hw,
        final_hw=setup.fish_hw, apply2gt=False, flow=true_flow)[0])
    # look-at rig with real parallax (a shared-center pure-rotation rig is
    # degenerate for self-calibration: radial remaps are absorbable)
    from bags_tpu.utils.testing import make_lookat_cameras
    cams = make_lookat_cameras(args.n_cams, setup.fovx, setup.fovy,
                               center=(0.0, 0.0, 6.0), radius=6.0,
                               spread=args.spread)
    for cam in cams:
        fish_gts.append(np.asarray(warp_j(render_j(cam))))
    clean_cams = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    fish_gts = np.stack(fish_gts)
    test_idx = list(range(0, args.n_cams, 4))
    train_idx = [i for i in range(args.n_cams) if i not in test_idx]

    # training init: jittered points, random colors, noisy poses,
    # perturbed lens
    from bags_tpu.model.gaussians import create_from_points
    pts = np.asarray(sc["xyz"]) + rng.normal(
        0, 0.02, (args.n, 3)).astype(np.float32)
    if args.true_colors:
        # content-consistent photometric init (the reference's regime:
        # SfM points + real image colors): the early residual is then
        # dominated by the LENS mismatch, not by content error the
        # geometry can imprint through the wrong lens
        C0 = 0.28209479177387814
        cols = np.clip(0.5 + C0 * np.asarray(sc["sh_coeffs"][:, 0, :]),
                       0.05, 0.95).astype(np.float32)
    else:
        cols = rng.uniform(0.2, 0.8, (args.n, 3)).astype(np.float32)
    cap = 1 << int(np.ceil(np.log2(args.n * 2)))
    g, alive = create_from_points(pts, cols, cap,
                                  sh_degree=args.sh_degree)
    noisy = dataclasses.replace(
        clean_cams,
        dq=jnp.asarray(rng.normal(0, args.pose_noise,
                                  (args.n_cams, 4)).astype(np.float32)),
        dt=jnp.asarray(rng.normal(0, args.pose_noise,
                                  (args.n_cams, 3)).astype(np.float32)))

    cfg = TrainConfig(
        opt=OptimizationConfig(densify_from_iter=10 ** 9),
        calib=CalibConfig(opt_cam=args.opt_cam, opt_distortion=True,
                          outside_rasterizer=True,
                          iresnet_lr=args.iresnet_lr,
                          r_t_lr=(0.002, 0.002)),
        max_instances=2 ** 21)
    base, g_tx, _, _ = init_train_state(g, alive, noisy, cfg, 2.0)
    calib_state, txs = calibrated.init_calib_state(base, cfg)
    print("pre-fitting lens to the perturbed coefficients ...", flush=True)
    K = np.array([[focal, 0, wh / 2], [0, focal, wh / 2], [0, 0, 1.0]])
    lens = init_iresnet_from_colmap(calib_state.lens, K, wh, wh,
                                    args.init_coeff, iters=3000, lr=3e-4)
    calib_state = dataclasses.replace(calib_state, lens=lens)

    def ferr(state, max_ndc=1.0):
        return flow_error_px(state.lens, args.true_coeff, p_view,
                             np.asarray(proj), static.width,
                             max_ndc=max_ndc)

    err0 = ferr(calib_state)
    err0_c = ferr(calib_state, max_ndc=0.7)
    err0_g = flow_error_px(calib_state.lens, args.true_coeff, p_view,
                           np.asarray(proj), static.width, fit_scale=True)
    _, perr0 = align_and_pose_error(noisy, clean_cams)
    print(f"init: flow err {err0:.3f}px, pose rot "
          f"{perr0['rotation_deg_mean']:.4f}deg", flush=True)

    ky = calibrated.measure_warp_ky(lens, p_view, setup, apply2gt=False)
    setup_t = dataclasses.replace(setup, warp_ky=ky)
    rcfg = RenderConfig(sh_degree=args.sh_degree, backend=backend,
                        max_instances=2 ** 21, precision="fast")
    step = calibrated.make_fisheye_train_step(
        setup_t, rcfg, cfg, g_tx, txs, sh_degree=args.sh_degree,
        opt_lens=True, use_vignetting=False)
    step_frozen = calibrated.make_fisheye_train_step(
        setup_t, rcfg, cfg, g_tx, txs, sh_degree=args.sh_degree,
        opt_lens=False, use_vignetting=False)

    st = calib_state
    bg = jnp.zeros(3)
    t0 = time.perf_counter()
    order = rng.permutation(np.asarray(train_idx * (
        args.iters // len(train_idx) + 1)))[:args.iters]
    trace = []
    for i, idx in enumerate(order):
        s_fn = step if (not args.lens_opt_until
                        or i < args.lens_opt_until) else step_frozen
        st, (loss, _, _, wover) = s_fn(st, jnp.asarray(fish_gts[idx]),
                                       p_view, jnp.asarray(int(idx)), bg)
        if (i + 1) % args.report_every == 0:
            e = ferr(st)
            ec = ferr(st, max_ndc=0.7)
            eg = flow_error_px(st.lens, args.true_coeff, p_view,
                               np.asarray(proj), static.width,
                               fit_scale=True)
            _, pe = align_and_pose_error(st.base.cams, clean_cams)
            trace.append(dict(it=i + 1, loss=float(loss), flow_err_px=e,
                              flow_err_center_px=ec, flow_err_gauge_px=eg,
                              rot_deg=pe["rotation_deg_mean"],
                              wover=int(wover)))
            print(f"it {i+1}: loss {float(loss):.4f} flow {e:.3f}px "
                  f"(center {ec:.3f}, gauge-fixed {eg:.3f}) "
                  f"rot {pe['rotation_deg_mean']:.4f}deg "
                  f"wover {int(wover)}", flush=True)
    jax.block_until_ready(st.base.g.xyz)
    dt = time.perf_counter() - t0

    # eval PSNR through the LEARNED lens on held-out clean-pose views
    eval_warp = jax.jit(lambda lens_p, img: apply_distortion(
        lens_p, p_view, setup.grid_hw, img, proj, setup.flow_hw,
        final_hw=setup.fish_hw, apply2gt=False)[0])
    g_f = st.base.g
    render_f = jax.jit(lambda cam: render(
        g_f.xyz, g_f.scaling(), g_f.quats, g_f.opacity(st.base.alive),
        g_f.sh_coeffs(), cam, static, rcfg_gt).render)
    psnrs = {}
    for split, idxs in (("train", train_idx), ("test", test_idx)):
        vals = []
        for i in idxs:
            cam = jax.tree_util.tree_map(
                lambda x: x[i],
                st.base.cams if split == "train" else clean_cams)
            img = jnp.clip(eval_warp(st.lens, render_f(cam)), 0, 1)
            vals.append(float(psnr(img, jnp.asarray(fish_gts[i]))))
        psnrs[split] = float(np.mean(vals))

    err1 = ferr(st)
    _, perr1 = align_and_pose_error(st.base.cams, clean_cams)
    out = dict(metric="lens_recovery",
               flow_err_init_px=round(err0, 4),
               flow_err_final_px=round(err1, 4),
               flow_err_center_init_px=round(err0_c, 4),
               flow_err_center_final_px=round(ferr(st, max_ndc=0.7), 4),
               flow_err_gauge_init_px=round(err0_g, 4),
               flow_err_gauge_final_px=round(flow_error_px(
                   st.lens, args.true_coeff, p_view, np.asarray(proj),
                   static.width, fit_scale=True), 4),
               pose_rot_init_deg=round(perr0["rotation_deg_mean"], 5),
               pose_rot_final_deg=round(perr1["rotation_deg_mean"], 5),
               pose_trans_final=round(perr1["translation_mean"], 6),
               psnr_train=round(psnrs["train"], 3),
               psnr_test=round(psnrs["test"], 3),
               iters=args.iters, s_per_iter=round(dt / args.iters, 4),
               true_coeff=args.true_coeff, init_coeff=args.init_coeff,
               warp_ky=ky, trace=trace)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
