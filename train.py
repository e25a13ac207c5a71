#!/usr/bin/env python
"""Training CLI — the `train.py` entry point of the framework.

Capability parity with `/root/reference/train.py:681-785`: the same flag
surface (ModelParams/OptimizationParams/PipelineParams groups plus the
calibration flags), canonical 30k-iteration training with densification,
periodic held-out evaluation appended to `evaluation_results.txt`
(training_report, train.py:496-674), PLY saves at --save_iterations, full
checkpoints at --checkpoint_iterations, and resolved-config persistence
(cfg_args -> cfg.json).

Example (NeRF-Synthetic with pose noise, README.md:86-94):
  python train.py -s data/lego --opt_cam --r_t_noise 0.15 0.15 \
      --r_t_lr 0.002 0.002 --iterations 30000
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="bags_tpu training")
    # ModelParams (arguments/__init__.py:47-65)
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--model_path", "-m", default="output/run")
    p.add_argument("--images", "-i", default="images")
    p.add_argument("--resolution", "-r", type=int, default=-1)
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--cap_max", type=int, default=-1)
    p.add_argument("--init_type", default="sfm")
    p.add_argument("--num_init_points", type=int, default=100_000)
    # OptimizationParams (arguments/__init__.py:74-98)
    p.add_argument("--iterations", type=int, default=30_000)
    p.add_argument("--position_lr_init", type=float, default=0.00016)
    p.add_argument("--position_lr_final", type=float, default=0.0000016)
    p.add_argument("--feature_lr", type=float, default=0.0025)
    p.add_argument("--opacity_lr", type=float, default=0.05)
    p.add_argument("--scaling_lr", type=float, default=0.005)
    p.add_argument("--rotation_lr", type=float, default=0.001)
    p.add_argument("--percent_dense", type=float, default=0.01)
    p.add_argument("--lambda_dssim", type=float, default=0.2)
    p.add_argument("--densification_interval", type=int, default=100)
    p.add_argument("--opacity_reset_interval", type=int, default=3000)
    p.add_argument("--densify_from_iter", type=int, default=500)
    p.add_argument("--densify_until_iter", type=int, default=15_000)
    p.add_argument("--densify_grad_threshold", type=float, default=0.0002)
    p.add_argument("--abs_densify_grad_threshold", type=float, default=0.0004)
    p.add_argument("--batch_cams", type=int, default=1,
                   help="training views per iteration (K > 1 amortizes "
                        "fixed per-step cost; 1 = reference semantics)")
    # train.py:687-748 calibration / pose flags
    p.add_argument("--opt_cam", action="store_true")
    p.add_argument("--opt_intrinsic", action="store_true")
    p.add_argument("--r_t_lr", nargs="+", type=float, default=[0.01, 0.01])
    p.add_argument("--r_t_noise", nargs="+", type=float, default=[0.0, 0.0, 1.0])
    p.add_argument("--global_alignment_lr", type=float, default=0.01)
    p.add_argument("--opt_global_alignment", action="store_true",
                   help="optimize the global SIM(3) alignment (the reference "
                        "creates but never steps this optimizer)")
    p.add_argument("--opt_distortion", action="store_true")
    p.add_argument("--outside_rasterizer", action="store_true")
    p.add_argument("--apply2gt", action="store_true")
    p.add_argument("--flow_scale", nargs="+", type=float, default=[1.0, 1.0])
    p.add_argument("--render_resolution", type=float, default=1.0)
    p.add_argument("--control_point_sample_scale", type=float, default=8.0)
    p.add_argument("--iresnet_lr", type=float, default=1e-7)
    p.add_argument("--iresnet_opt_duration", nargs="+", type=int,
                   default=[0, 30000])
    p.add_argument("--no_init_iresnet", action="store_true")
    p.add_argument("--no_distortion_mask", action="store_true")
    p.add_argument("--start_vignetting", type=int, default=10_000_000_000)
    p.add_argument("--opt_shift", action="store_true")
    p.add_argument("--cubemap", action="store_true")
    p.add_argument("--mask_radius", type=int, default=512)
    p.add_argument("--abs_grad", action="store_true")
    p.add_argument("--opacity_threshold", type=float, default=0.005)
    p.add_argument("--mcmc", action="store_true")
    p.add_argument("--hybrid", action="store_true")
    p.add_argument("--random_init_pc", action="store_true")
    # cadence
    p.add_argument("--test_iterations", nargs="+", type=int,
                   default=[7000, 30000])
    p.add_argument("--save_iterations", nargs="+", type=int,
                   default=[7000, 30000])
    p.add_argument("--checkpoint_iterations", nargs="+", type=int,
                   default=[7000, 15000, 30000])
    p.add_argument("--start_checkpoint", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--backend", default="auto",
                   choices=["auto", "pallas", "jnp"])
    p.add_argument("--precision", default="fast",
                   choices=["fast", "exact"],
                   help="Pallas compositing precision: 'fast' = single-pass "
                        "bf16 MXU scans with f32 accumulation (the training "
                        "default; quality delta quantified in README), "
                        "'exact' = CUDA-parity f32 via 3x-bf16 splits")
    p.add_argument("--mesh", type=int, default=0,
                   help="train tile-parallel over an N-device mesh "
                        "(dist/trainer.py); 0 = single-device")
    p.add_argument("--max_instances", type=int, default=0,
                   help="rasterizer instance budget; 0 = estimate from the "
                        "scene (and auto-grow on overflow)")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--preset", default=None,
                   help="named hyperparameter preset (see train/presets.py)")
    # SIBR network viewer (reference train.py:688-689,771 + 180-193)
    p.add_argument("--gui", action="store_true",
                   help="serve the SIBR remote viewer protocol during "
                        "training")
    p.add_argument("--ip", default="127.0.0.1")
    p.add_argument("--port", type=int, default=6009)
    # wandb mirror (reference train.py:759 init_wandb; scalars mirrored when
    # the package + credentials exist, metrics.jsonl is always written)
    p.add_argument("--wandb_project_name", default=None)
    p.add_argument("--wandb_group_name", default=None)
    p.add_argument("--wandb_mode", default="online")
    # live pose plots to a visdom server (reference --vis_pose +
    # visdom.server/port, train.py:146-153,344-346); pose PNGs are always
    # saved at eval iterations regardless
    p.add_argument("--vis_pose", action="store_true")
    p.add_argument("--visdom_server", default="localhost")
    p.add_argument("--visdom_port", type=int, default=8600)
    from bags_tpu.utils.platform import add_platform_arg
    add_platform_arg(p)
    return p


def args_to_config(args):
    from bags_tpu.train.config import (CalibConfig, ModelConfig,
                                       OptimizationConfig, TrainConfig)

    return TrainConfig(
        model=ModelConfig(
            sh_degree=args.sh_degree, source_path=args.source_path,
            model_path=args.model_path, images=args.images,
            resolution=args.resolution,
            white_background=args.white_background, eval=args.eval,
            cap_max=args.cap_max, init_type=args.init_type,
            num_init_points=args.num_init_points),
        opt=OptimizationConfig(
            iterations=args.iterations,
            position_lr_init=args.position_lr_init,
            position_lr_final=args.position_lr_final,
            feature_lr=args.feature_lr, opacity_lr=args.opacity_lr,
            scaling_lr=args.scaling_lr, rotation_lr=args.rotation_lr,
            percent_dense=args.percent_dense,
            lambda_dssim=args.lambda_dssim,
            densification_interval=args.densification_interval,
            opacity_reset_interval=args.opacity_reset_interval,
            densify_from_iter=args.densify_from_iter,
            densify_until_iter=args.densify_until_iter,
            densify_grad_threshold=args.densify_grad_threshold,
            abs_densify_grad_threshold=args.abs_densify_grad_threshold,
            batch_cams=args.batch_cams),
        calib=CalibConfig(
            opt_cam=args.opt_cam, opt_intrinsic=args.opt_intrinsic,
            r_t_lr=tuple(args.r_t_lr[:2]),
            r_t_noise=tuple(args.r_t_noise),
            global_alignment_lr=args.global_alignment_lr,
            opt_global_alignment=args.opt_global_alignment,
            opt_distortion=args.opt_distortion,
            outside_rasterizer=args.outside_rasterizer,
            apply2gt=args.apply2gt, flow_scale=tuple(args.flow_scale),
            render_resolution=args.render_resolution,
            control_point_sample_scale=args.control_point_sample_scale,
            iresnet_lr=args.iresnet_lr,
            iresnet_opt_duration=tuple(args.iresnet_opt_duration),
            no_init_iresnet=args.no_init_iresnet,
            no_distortion_mask=args.no_distortion_mask,
            start_vignetting=args.start_vignetting,
            opt_shift=args.opt_shift, cubemap=args.cubemap,
            mask_radius=args.mask_radius, hybrid=args.hybrid),
        abs_grad=args.abs_grad, opacity_threshold=args.opacity_threshold,
        mcmc=args.mcmc, random_init_pc=args.random_init_pc,
        test_iterations=tuple(args.test_iterations),
        save_iterations=tuple(args.save_iterations),
        checkpoint_iterations=tuple(args.checkpoint_iterations),
        max_instances=args.max_instances, seed=args.seed,
        mesh=args.mesh, precision=args.precision,
    )


def _finalize_capacity(cfg, trainer, rcfg):
    """--max_instances 0: estimate the budget AFTER trainer construction so
    the trainer's ACTUAL render geometry is measured (CalibTrainer renders
    at the extended-FoV render_static, which needs far more instances than
    the raw perspective cameras would suggest)."""
    if cfg.max_instances:
        return rcfg
    from bags_tpu.train.loop import estimate_capacity

    base = getattr(trainer.state, "base", trainer.state)
    cfg.max_instances = estimate_capacity(
        base.g, base.alive, base.cams, trainer.static, seed=cfg.seed)
    trainer.rcfg = dataclasses.replace(trainer.rcfg,
                                       max_instances=cfg.max_instances)
    print(f"instance budget: auto-sized to {cfg.max_instances} "
          f"(grows on overflow)", flush=True)
    return trainer.rcfg


def build_scene_and_trainer(cfg, backend: str = "auto"):
    """Construct the Scene + Trainer exactly as training does, from a
    (possibly cfg.json-restored) TrainConfig. Shared with render.py so that
    eval rebuilds a checkpoint-compatible state template."""
    from bags_tpu.data import Scene
    from bags_tpu.raster import RenderConfig
    from bags_tpu.train.loop import Trainer

    scene = Scene(cfg.model.source_path, eval_split=cfg.model.eval,
                  resolution=cfg.model.resolution,
                  r_t_noise=tuple(cfg.calib.r_t_noise),
                  white_background=cfg.model.white_background,
                  capacity=(cfg.model.cap_max if cfg.model.cap_max > 0
                            else None),
                  sh_degree=cfg.model.sh_degree, images_dir=cfg.model.images,
                  init_type=("random" if cfg.random_init_pc
                             else cfg.model.init_type),
                  num_pts=cfg.model.num_init_points)
    rcfg = RenderConfig(sh_degree=cfg.model.sh_degree, backend=backend,
                        max_instances=cfg.max_instances or 2 ** 20,
                        precision=getattr(cfg, "precision", "fast"))
    if getattr(cfg, "mesh", 0):
        if cfg.calib.outside_rasterizer or cfg.calib.cubemap:
            from bags_tpu.dist.trainer import ShardedCalibTrainer

            info0 = scene.train_infos[0]
            fish_wh = (scene.static.width, scene.static.height)
            if info0.fish_image_path:
                from PIL import Image
                with Image.open(info0.fish_image_path) as im:
                    fish_wh = im.size
            trainer = ShardedCalibTrainer(
                scene.gaussians, scene.alive, scene.train_cams,
                scene.static, cfg, scene_extent=scene.cameras_extent,
                gt_images=scene.train_image,
                focal_x=info0.focal_x, focal_y=info0.focal_y,
                persp_wh=(scene.static.width, scene.static.height),
                fish_wh=fish_wh, source_path=cfg.model.source_path,
                rcfg=rcfg, seed=cfg.seed, n_devices=cfg.mesh,
                fish_images=(scene.fish_image if info0.fish_image_path
                             else scene.train_image))
            return scene, trainer, _finalize_capacity(cfg, trainer, rcfg)
        from bags_tpu.dist.trainer import ShardedTrainer

        trainer = ShardedTrainer(
            scene.gaussians, scene.alive, scene.train_cams, scene.static,
            cfg, scene_extent=scene.cameras_extent,
            gt_images=scene.train_image, rcfg=rcfg, seed=cfg.seed,
            n_devices=cfg.mesh)
        return scene, trainer, _finalize_capacity(cfg, trainer, rcfg)
    if cfg.calib.outside_rasterizer or cfg.calib.cubemap:
        from bags_tpu.train.calibrated import CalibTrainer

        info0 = scene.train_infos[0]
        fish_wh = (scene.static.width, scene.static.height)
        if info0.fish_image_path:
            from PIL import Image
            with Image.open(info0.fish_image_path) as im:
                fish_wh = im.size
        trainer = CalibTrainer(
            scene.gaussians, scene.alive, scene.train_cams, scene.static,
            cfg, scene_extent=scene.cameras_extent,
            gt_images=scene.train_image,
            focal_x=info0.focal_x, focal_y=info0.focal_y,
            persp_wh=(scene.static.width, scene.static.height),
            fish_wh=fish_wh, source_path=cfg.model.source_path,
            rcfg=rcfg, seed=cfg.seed,
            fish_images=(scene.fish_image if info0.fish_image_path
                         else scene.train_image))
    else:
        trainer = Trainer(scene.gaussians, scene.alive, scene.train_cams,
                          scene.static, cfg,
                          scene_extent=scene.cameras_extent,
                          gt_images=scene.train_image, rcfg=rcfg,
                          seed=cfg.seed)
    return scene, trainer, _finalize_capacity(cfg, trainer, rcfg)


def main(argv=None):
    from bags_tpu.train.presets import apply_preset

    argv = apply_preset(list(argv if argv is not None else sys.argv[1:]))
    args = build_parser().parse_args(argv)
    cfg = args_to_config(args)

    from bags_tpu.utils.platform import apply_platform
    apply_platform(args.platform)

    if args.mesh:
        # Multi-host init must precede ANY backend-initializing JAX call
        # (jax.distributed.initialize raises once the XLA backend exists).
        from bags_tpu.dist.trainer import init_distributed
        init_distributed()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bags_tpu.eval.metrics import psnr
    from bags_tpu.eval.pose_eval import align_and_pose_error
    from bags_tpu.model.gaussians import save_ply
    from bags_tpu.raster import RenderConfig, render as render_fn
    from bags_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from bags_tpu.utils.cache import enable_persistent_cache, warm_ssim_grad

    enable_persistent_cache()
    os.makedirs(args.model_path, exist_ok=True)
    with open(os.path.join(args.model_path, "cfg.json"), "w") as f:
        f.write(cfg.to_json())

    scene, trainer, rcfg = build_scene_and_trainer(cfg, backend=args.backend)
    print(f"scene: {scene.n_train} train / {scene.n_test} test cameras, "
          f"extent {scene.cameras_extent:.3f}, "
          f"capacity {scene.gaussians.capacity}, "
          f"size {scene.static.width}x{scene.static.height}")

    if args.start_checkpoint:
        trainer.state = load_checkpoint(args.start_checkpoint, trainer.state)
        if hasattr(trainer, "_shard_state"):
            trainer._shard_state()  # re-pin mesh shardings after restore

    if jax.default_backend() == "tpu":
        warm_ssim_grad()

    from bags_tpu.utils.logging import MetricsLogger
    logger = MetricsLogger(args.model_path,
                           use_wandb=args.wandb_project_name is not None,
                           wandb_project=args.wandb_project_name,
                           config=json.loads(cfg.to_json()))
    eval_file = os.path.join(args.model_path, "evaluation_results.txt")

    fisheye_eval = None
    cubemap_eval = None
    if cfg.calib.outside_rasterizer and not cfg.calib.cubemap:
        from bags_tpu.train.calibrated import make_fisheye_eval_fn
        fisheye_eval = make_fisheye_eval_fn(trainer)
    elif cfg.calib.cubemap:
        from bags_tpu.train.calibrated import make_cubemap_eval_fn
        cubemap_eval = make_cubemap_eval_fn(trainer)

    from bags_tpu.eval.metrics import Lpips
    from bags_tpu.train.losses import ssim as ssim_fn

    # In-loop LPIPS defaults to the alex backbone like the reference
    # (utils/lpipsPyTorch/__init__.py:8); metrics.py keeps vgg offline.
    lpips_fn = Lpips(net="alex")

    # One jitted eval renderer per RenderConfig (the active SH degree
    # changes at the 1k ramp); eager per-view rendering pays per-op
    # dispatch over the device link.
    _eval_jits = {}

    def _eval_render(eval_cfg):
        if eval_cfg not in _eval_jits:
            _eval_jits[eval_cfg] = jax.jit(
                lambda xyz, sc_, q, o, shc, cam, align, bg: render_fn(
                    xyz, sc_, q, o, shc, cam, scene.static, eval_cfg,
                    bg=bg, align=align).render)
        return _eval_jits[eval_cfg]

    def _eval_view(split, i, eval_cfg, base):
        """Render one held-out/train view with the current calibration
        applied; returns (render, gt) both clipped/masked for metrics."""
        g, alive = base.g, base.alive
        if split == "test":
            cams, infos = scene.test_cams, scene.test_infos
            gt_plain = scene.test_image(i)
        else:
            cams, infos = base.cams, scene.train_infos  # OPTIMIZED poses
            gt_plain = scene.train_image(i)
        cam = jax.tree_util.tree_map(lambda x: x[i], cams)
        if fisheye_eval is not None:
            # training_report's fisheye branch (train.py:569-607): warp
            # through the lens field, compare against the fisheye GT.
            cam = dataclasses.replace(
                cam,
                fovx=jnp.asarray(trainer.setup.fovx),
                fovy=jnp.asarray(trainer.setup.fovy))
            fish = (scene.test_fish_image if split == "test"
                    else scene.fish_image)
            gt_i = (fish(i) if infos[i].fish_image_path else gt_plain)
            return fisheye_eval(trainer.state, cam, gt_i)
        if cubemap_eval is not None:
            # training_report's cubemap branch (train.py:608-634): 5-face
            # max-intensity stitch vs circular-masked GT.
            if split == "train":
                sub_q, sub_t = trainer.sub_q[i], trainer.sub_t[i]
            else:
                from bags_tpu.train.calibrated import build_sub_cameras
                subs = build_sub_cameras(
                    jax.tree_util.tree_map(lambda x: x[i:i + 1], cams))
                sub_q = jnp.stack([s.q_init[0] for s in subs[:4]])
                sub_t = jnp.stack([s.t_init[0] for s in subs[:4]])
            return cubemap_eval(trainer.state, cam, gt_plain, sub_q, sub_t)
        out = _eval_render(eval_cfg)(g.xyz, g.scaling(), g.quats,
                                     g.opacity(alive), g.sh_coeffs(), cam,
                                     base.align, trainer.bg)
        return jnp.clip(out, 0.0, 1.0), gt_plain

    def evaluate(it):
        eval_cfg = RenderConfig(sh_degree=trainer.active_sh_degree,
                                backend=args.backend,
                                max_instances=cfg.max_instances,
                                precision=cfg.precision)
        base = getattr(trainer.state, "base", trainer.state)
        # training_report protocol (train.py:504-518): the full test split
        # plus the first 5 train views; L1/PSNR/SSIM(/LPIPS).
        configs = [("test", range(scene.n_test)),
                   ("train", range(min(5, scene.n_train)))]
        lines = []
        img = None
        for split, idxs in configs:
            l1s, psnrs, ssims, lpipss = [], [], [], []
            for i in idxs:
                img, gt_img = _eval_view(split, i, eval_cfg, base)
                l1s.append(float(jnp.mean(jnp.abs(img - gt_img))))
                psnrs.append(float(psnr(img, gt_img)))
                ssims.append(float(ssim_fn(img, gt_img)))
                if lpips_fn.available:
                    lpipss.append(float(lpips_fn(img, gt_img)))
            if not l1s:
                continue
            line = (f"[ITER {it}] Evaluating {split}: "
                    f"L1 {np.mean(l1s):.5f} PSNR {np.mean(psnrs):.3f} "
                    f"SSIM {np.mean(ssims):.5f} "
                    f"LPIPS {np.mean(lpipss):.5f}" if lpipss else
                    f"[ITER {it}] Evaluating {split}: "
                    f"L1 {np.mean(l1s):.5f} PSNR {np.mean(psnrs):.3f} "
                    f"SSIM {np.mean(ssims):.5f} LPIPS n/a")
            lines.append(line)
        # periodic visual artifact (train.py:314-320 saves render/gt pngs)
        if img is not None:
            try:
                from render import save_png
                save_png(os.path.join(args.model_path, f"render_{it}.png"),
                         np.asarray(img))
            except Exception:
                pass
        if args.opt_cam:
            _, err = align_and_pose_error(base.cams,
                                          scene.train_cams_clean)
            lines.append(f"[ITER {it}] pose error: "
                         f"rot {err['rotation_deg_mean']:.4f} deg, "
                         f"trans {err['translation_mean']:.5f}")
            # pose-frusta artifact, the reference's in-training visdom plots
            # (train.py:146-153,344-346) as a saved figure
            try:
                from bags_tpu.eval.vis import plot_poses
                plot_poses(base.cams, scene.train_cams_clean,
                           path=os.path.join(args.model_path,
                                             f"poses_{it}.png"))
            except Exception:
                pass
        for line in lines:
            print(line)
        with open(eval_file, "a") as f:
            f.write("\n".join(lines) + "\n")

    # --- SIBR network viewer (polled at the top of every iteration,
    # reference train.py:180-193) -----------------------------------------
    gui = None
    if args.gui:
        from bags_tpu.eval.network_gui import NetworkGUI, request_to_camera
        try:
            gui = NetworkGUI(args.ip, args.port)
            print(f"network GUI listening on {args.ip}:{args.port}")
        except OSError as e:
            print(f"network GUI unavailable ({e}); continuing without")

    def gui_render(req):
        cam, static_r = request_to_camera(req)
        base = getattr(trainer.state, "base", trainer.state)
        gcfg = RenderConfig(sh_degree=trainer.active_sh_degree,
                            backend=args.backend,
                            max_instances=cfg.max_instances,
                            precision=cfg.precision)
        out = render_fn(base.g.xyz, base.g.scaling(), base.g.quats,
                        base.g.opacity(base.alive), base.g.sh_coeffs(),
                        cam, static_r, gcfg, bg=trainer.bg, align=base.align)
        return out.render

    # instance-capacity overflow guidance (metrics.jsonl carries n_dropped
    # every 10 iters; a persistent overflow also warns loudly here)
    drop_state = {"streak": 0, "last_warn": -10**9}

    def _check_capacity(it, metrics):
        nd = int(metrics.n_dropped)
        drop_state["streak"] = drop_state["streak"] + 1 if nd > 0 else 0
        if drop_state["streak"] >= 5 and it - drop_state["last_warn"] >= 500:
            drop_state["last_warn"] = it
            print(f"WARNING iter {it}: rasterizer instance capacity "
                  f"overflow for {drop_state['streak']} consecutive steps "
                  f"({nd} instances dropped; farthest Gaussians are culled "
                  f"first). Rendering quality will silently degrade — "
                  f"re-run with --max_instances {2 * cfg.max_instances} "
                  f"(current {cfg.max_instances}).", flush=True)

    vis_client = None
    if args.vis_pose:
        from bags_tpu.eval.vis import VisdomClient
        vis_client = VisdomClient(args.visdom_server, args.visdom_port)

    def callback(it, state, metrics):
        if gui is not None:
            gui.poll(gui_render, args.source_path,
                     training_done=(it >= args.iterations))
        if vis_client is not None and it % 500 == 0:
            # live pose frusta to the visdom server, every 500 iters
            # (reference train.py:344-346)
            base = getattr(state, "base", state)
            if not vis_client.plot_cameras(it, base.cams,
                                           scene.train_cams_clean):
                if it == 500:
                    print(f"visdom server {vis_client.url} unreachable; "
                          "live pose plots disabled for this run")
        if it % 10 == 0:
            # n_dropped is a host sync (29 ms over the axon tunnel); check it
            # only at the logging cadence. Trainer.run additionally
            # auto-grows the budget (cfg.auto_capacity).
            _check_capacity(it, metrics)
            logger.log(it, loss=metrics.loss, l1=metrics.l1,
                       n_alive=metrics.n_alive, n_dropped=metrics.n_dropped)
        if not args.quiet and it % 200 == 0:
            print(f"iter {it}: loss {float(metrics.loss):.5f}, "
                  f"alive {int(metrics.n_alive)}", flush=True)
        if it in cfg.test_iterations:
            evaluate(it)
        if it in cfg.save_iterations:
            base = getattr(state, "base", state)
            ply_dir = os.path.join(args.model_path, "point_cloud",
                                   f"iteration_{it}")
            os.makedirs(ply_dir, exist_ok=True)
            save_ply(os.path.join(ply_dir, "point_cloud.ply"),
                     base.g, np.asarray(base.alive))
        if it in cfg.checkpoint_iterations:
            save_checkpoint(os.path.join(args.model_path, f"chkpnt{it}.npz"),
                            state)
            # re-persist the config: capacity may have auto-grown since the
            # initial write, and render.py sizes its buffers from cfg.json
            with open(os.path.join(args.model_path, "cfg.json"), "w") as f:
                f.write(cfg.to_json())

    trainer.run(iterations=args.iterations, callback=callback)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
