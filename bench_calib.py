#!/usr/bin/env python
"""Calibrated-pipeline benchmarks: fisheye and cubemap train-step throughput.

The reference's HOT LOOP #2 (SURVEY §3.1) is the fisheye pipeline's
full-resolution grid-sample warp; the cubemap step does 5 renders per
iteration. `bench.py` measures only the vanilla step — this harness times
the two calibrated steps end-to-end (render + warp/stitch + loss + full
backward + optimizer updates) on one chip and prints one JSON line per
mode:

    {"metric": "fisheye_pixels_per_s_fwd_bwd", ...}
    {"metric": "cubemap_pixels_per_s_fwd_bwd", ...}

pixels/s counts the LOSS-side pixels per step (fisheye sensor pixels;
5x face pixels for cubemap — each face is a full rasterization).
vs_baseline uses the same 16 Mpix/s RTX-4090-class vanilla bar as
bench.py for scale (the reference publishes no calibrated-pipeline
numbers; its fisheye step would also run well below its vanilla rate —
the warp adds a full-image gather + iResNet on top of every step).

Roofline note: the fisheye step adds, on top of the vanilla render cost,
(a) a (H*W) bilinear warp with 4 gather taps per pixel — on TPU this is
GATHER-OP bound, not HBM bound: XLA's gather costs ~8 ns/element, so the
4 taps (+ their scatter-add transpose in the backward) dominate the
measured step; and (b) an iResNet forward + fixed-point inverse on a
(H/8)*(W/8) control grid (MXU, minor). The cubemap step is ~5x the
vanilla render cost plus 5 warps; its ceiling is 5x the vanilla step.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PIXELS_PER_S = 1.6e7  # bench.py's vanilla CUDA-class bar


def _state(cfg, sc, cap):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bags_tpu.core.camera import CameraParams
    from bags_tpu.model.gaussians import Gaussians
    from bags_tpu.train.loop import init_train_state

    n = sc["xyz"].shape[0]
    g = Gaussians(
        xyz=sc["xyz"], sh_dc=sc["sh_coeffs"][:, :1, :],
        sh_rest=sc["sh_coeffs"][:, 1:, :],
        scales_log=jnp.log(sc["scales"]), quats=sc["quats"],
        opacity_raw=jnp.log(sc["opacity"] / (1 - sc["opacity"])))
    alive = jnp.ones((n,), bool)
    cams = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[CameraParams.create(np.eye(3, dtype=np.float32),
                              np.zeros(3, np.float32), 0.9, 0.9)
          for _ in range(2)])
    state, g_tx, _, _ = init_train_state(g, alive, cams, cfg, 2.0)
    return state, g_tx


def bench_fisheye(n, wh, iters, precision="fast", warp_ky=384):
    import jax
    import jax.numpy as jnp

    from bags_tpu.raster import RenderConfig
    from bags_tpu.train import calibrated
    from bags_tpu.train.config import CalibConfig, OptimizationConfig, \
        TrainConfig
    from bags_tpu.train.loop import snap_capacity
    from bags_tpu.utils.testing import make_toy_scene

    sc = make_toy_scene(n=n, width=wh, height=wh, sh_degree=3, seed=0,
                        scale_range=(0.008, 0.035))
    cfg = TrainConfig(
        opt=OptimizationConfig(),
        calib=CalibConfig(opt_cam=True, opt_distortion=True,
                          outside_rasterizer=True, iresnet_lr=1e-7),
        max_instances=2 ** 20)
    state, g_tx = _state(cfg, sc, cfg.max_instances)
    calib_state, txs = calibrated.init_calib_state(state, cfg)
    calib_state = dataclasses.replace(
        calib_state,
        lens=jax.tree_util.tree_map(lambda x: x * 1e-4, calib_state.lens))

    # warp_ky: the bench lens is near-identity (scaled 1e-4), so a measured
    # window would be unrealistically small; 384 is the measured
    # requirement for a flow_scale-2 OPENCV_FISHEYE lens at 800x800
    # (tools/warpbench.py), i.e. the real cube-scene workload. 0 = gather.
    setup = calibrated.make_fisheye_setup(
        focal_x=wh / 2.0, focal_y=wh / 2.0, persp_wh=(wh, wh),
        fish_wh=(wh, wh))
    if warp_ky:
        setup = dataclasses.replace(
            setup, warp_ky=min(warp_ky, setup.render_static.height))
    p_view = calibrated.fisheye_control_points(setup, wh / 2.0, wh / 2.0)
    b = calib_state.base
    cams = dataclasses.replace(
        b.cams, fovx=jnp.full_like(b.cams.fovx, setup.fovx),
        fovy=jnp.full_like(b.cams.fovy, setup.fovy))
    calib_state = dataclasses.replace(
        calib_state, base=dataclasses.replace(b, cams=cams))

    # size the instance budget the way training does
    from bags_tpu.core.projection import project_gaussians
    from bags_tpu.raster import binning
    static_r = setup.render_static
    tiles_x, tiles_y = binning.tile_grid(static_r.width, static_r.height)
    cam0 = jax.tree_util.tree_map(lambda x: x[0], calib_state.base.cams)
    n_inst = int(jax.jit(lambda *a: binning.count_instances(
        project_gaussians(*a, static_r, 3), tiles_x, tiles_y))(
            sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
            sc["sh_coeffs"], cam0))
    cap = snap_capacity(n_inst)
    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    rcfg = RenderConfig(sh_degree=3, backend=backend, max_instances=cap,
                        precision=precision)

    fh, fw = setup.fish_hw
    fish_gt = jnp.full((3, fh, fw), 0.4, jnp.float32)
    bg = jnp.zeros(3)
    step = calibrated.make_fisheye_train_step(
        setup, rcfg, cfg, g_tx, txs, sh_degree=3, opt_lens=True,
        use_vignetting=False)
    st, out = step(calib_state, fish_gt, p_view, jnp.asarray(0), bg)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    st = calib_state
    for i in range(iters):
        st, out = step(st, fish_gt, p_view, jnp.asarray(i % 2), bg)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / iters
    return fh * fw / dt


def bench_cubemap(n, wh, iters, precision="fast"):
    import jax
    import jax.numpy as jnp

    from bags_tpu.raster import RenderConfig
    from bags_tpu.train import calibrated
    from bags_tpu.train.config import CalibConfig, OptimizationConfig, \
        TrainConfig
    from bags_tpu.utils.testing import make_toy_scene

    sc = make_toy_scene(n=n, width=wh, height=wh, sh_degree=3, seed=0,
                        scale_range=(0.008, 0.035))
    cfg = TrainConfig(
        opt=OptimizationConfig(),
        calib=CalibConfig(opt_cam=True, cubemap=True, iresnet_lr=1e-7),
        max_instances=2 ** 20)
    state, g_tx = _state(cfg, sc, cfg.max_instances)
    calib_state, txs = calibrated.init_calib_state(state, cfg)
    calib_state = dataclasses.replace(
        calib_state,
        cubemap_net=jax.tree_util.tree_map(
            lambda x: x * 1e-4, calib_state.cubemap_net))

    backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    # cubemap trains 5 full-frame renders per step at the base resolution
    rcfg = RenderConfig(sh_degree=3, backend=backend,
                        max_instances=cfg.max_instances,
                        sort_by_distance=True, precision=precision)
    static = sc["static"]
    gt = jnp.full((3, wh, wh), 0.4, jnp.float32)
    bg = jnp.zeros(3)
    subs = calibrated.build_sub_cameras(calib_state.base.cams)
    sub_q = jnp.stack([s.q_init for s in subs[:4]], axis=1)
    sub_t = jnp.stack([s.t_init for s in subs[:4]], axis=1)
    # the base tan-warp dominates the cubemap grids (the residual net is
    # near-zero here), so the measured window is the realistic one
    warp_ky, warp_t = (calibrated.measure_cubemap_warp_orient(
        calib_state.cubemap_net, wh / 2.0, wh / 2.0, static,
        int(cfg.calib.control_point_sample_scale))
        if precision == "fast" else (0, None))
    print(f"cubemap warp_ky={warp_ky} transposed={warp_t}", file=sys.stderr)
    step = calibrated.make_cubemap_train_step(
        static, rcfg, cfg, g_tx, txs, sh_degree=3,
        focal_x=wh / 2.0, focal_y=wh / 2.0, warp_ky=warp_ky,
        warp_transposed=warp_t)
    st, out = step(calib_state, gt, jnp.asarray(0), bg, sub_q[0], sub_t[0])
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    st = calib_state
    for i in range(iters):
        st, out = step(st, gt, jnp.asarray(i % 2), bg, sub_q[i % 2],
                       sub_t[i % 2])
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / iters
    return 5 * wh * wh / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["fisheye", "cubemap", "both"],
                   default="both")
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--wh", type=int, default=800)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--precision", choices=["fast", "exact"], default="fast",
                   help="compositing precision mode (see RenderConfig)")
    p.add_argument("--warp_ky", type=int, default=384,
                   help="banded-warp window for the fisheye step "
                        "(realistic lens default; 0 = gather warp)")
    args = p.parse_args(argv)

    from bags_tpu.utils.cache import enable_persistent_cache, warm_ssim_grad
    enable_persistent_cache()
    import jax
    if jax.default_backend() == "tpu":
        warm_ssim_grad()

    if args.mode in ("fisheye", "both"):
        pps = bench_fisheye(args.n, args.wh, args.iters, args.precision,
                            args.warp_ky)
        print(json.dumps({
            "metric": "fisheye_pixels_per_s_fwd_bwd",
            "value": round(pps, 1), "unit": "pixels/s/chip",
            "precision": args.precision, "warp_ky": args.warp_ky,
            "vs_baseline": round(pps / BASELINE_PIXELS_PER_S, 4)}))
    if args.mode in ("cubemap", "both"):
        pps = bench_cubemap(args.n, args.wh, args.iters, args.precision)
        print(json.dumps({
            "metric": "cubemap_pixels_per_s_fwd_bwd",
            "value": round(pps, 1), "unit": "pixels/s/chip",
            "precision": args.precision,
            "vs_baseline": round(pps / BASELINE_PIXELS_PER_S, 4)}))


if __name__ == "__main__":
    main()
