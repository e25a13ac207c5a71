#!/usr/bin/env python
"""Rendering CLI — render train/test sets from a trained model.

Capability parity with `/root/reference/render.py`: loads the TRAINED state
— the full `chkpnt{it}.npz` checkpoint when present (optimized cameras,
global alignment, lens net, specular MLP + asg features; reference
render.py:97-124,198 loads `cams_train{it}.pt` + lens_net and applies the
distortion flow), falling back to the PLY-only model otherwise — optionally
runs test-time pose optimization (photometric, pose-only Adam on the test
cameras; render.py:214-283), renders each view and writes `renders/` +
`gt/` PNG trees that `metrics.py` consumes, and reports per-split PSNR.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def save_png(path, img):
    import numpy as np
    from PIL import Image

    arr = (np.clip(np.asarray(img), 0, 1) * 255).astype("uint8")
    Image.fromarray(arr.transpose(1, 2, 0)).save(path)


def _load_trained_state(args):
    """Rebuild the training-time Scene/Trainer from the persisted cfg.json
    and restore the checkpoint into it. Returns None if no checkpoint."""
    from bags_tpu.train.checkpoint import find_max_iteration, load_checkpoint
    from bags_tpu.train.config import TrainConfig
    from train import build_scene_and_trainer

    cfg_path = os.path.join(args.model_path, "cfg.json")
    if not os.path.exists(cfg_path):
        return None
    it = args.iteration
    if it == -1:
        it = find_max_iteration(args.model_path, r"chkpnt(\d+)\.npz")
    ck = os.path.join(args.model_path, f"chkpnt{it}.npz")
    if it < 0 or not os.path.exists(ck):
        return None
    with open(cfg_path) as f:
        cfg = TrainConfig.from_json(f.read())
    cfg.model.source_path = args.source_path  # data may have moved
    # Rendering needs no device mesh: a --mesh N checkpoint must load on a
    # single-chip host (the TrainState pytree is identical either way).
    cfg.mesh = 0
    scene, trainer, rcfg = build_scene_and_trainer(cfg, backend=args.backend)
    trainer.state = load_checkpoint(ck, trainer.state)
    trainer.active_sh_degree = trainer.max_sh_degree
    print(f"restored full training state from {ck}")
    return dict(cfg=cfg, scene=scene, trainer=trainer, rcfg=rcfg, it=it)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_test", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--resolution", "-r", type=int, default=-1)
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--backend", default="auto")
    p.add_argument("--max_instances", type=int, default=2 ** 20)
    p.add_argument("--ply_only", action="store_true",
                   help="ignore checkpoints; render the saved PLY with the "
                        "raw Scene cameras")
    p.add_argument("--optim_test_pose_iter", type=int, default=0,
                   help="test-time pose optimization iterations "
                        "(reference: 7000)")
    from bags_tpu.utils.platform import add_platform_arg, apply_platform
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bags_tpu.data import Scene
    from bags_tpu.eval.metrics import psnr
    from bags_tpu.model.gaussians import load_ply
    from bags_tpu.raster import RenderConfig, render
    from bags_tpu.train.checkpoint import find_max_iteration
    from bags_tpu.train.losses import photometric_loss

    trained = None if args.ply_only else _load_trained_state(args)

    fisheye_eval = None
    align = None
    spec = None
    if trained is not None:
        scene = trained["scene"]
        trainer = trained["trainer"]
        cfg_t = trained["cfg"]
        it = trained["it"]
        base = getattr(trainer.state, "base", trainer.state)
        g, alive = base.g, base.alive
        align = base.align
        spec = base.spec
        train_cams = base.cams          # OPTIMIZED training cameras
        static = scene.static
        sh_degree = cfg_t.model.sh_degree
        cfg = RenderConfig(sh_degree=sh_degree, backend=args.backend,
                           max_instances=cfg_t.max_instances,
                           precision=getattr(cfg_t, "precision", "fast"))
        bg = (jnp.ones(3) if cfg_t.model.white_background else jnp.zeros(3))
        if cfg_t.calib.outside_rasterizer and not cfg_t.calib.cubemap:
            from bags_tpu.train.calibrated import make_fisheye_eval_fn
            fisheye_eval = make_fisheye_eval_fn(trainer)
    else:
        it = args.iteration
        if it == -1:
            it = find_max_iteration(
                os.path.join(args.model_path, "point_cloud"))
        ply = os.path.join(args.model_path, "point_cloud",
                           f"iteration_{it}", "point_cloud.ply")
        g, alive = load_ply(ply)
        print(f"loaded {int(np.asarray(alive).sum())} Gaussians from {ply}")
        scene = Scene(args.source_path, eval_split=args.eval,
                      resolution=args.resolution,
                      white_background=args.white_background,
                      sh_degree=args.sh_degree)
        static = scene.static
        train_cams = scene.train_cams
        sh_degree = args.sh_degree
        cfg = RenderConfig(sh_degree=sh_degree, backend=args.backend,
                           max_instances=args.max_instances)
        bg = jnp.ones(3) if args.white_background else jnp.zeros(3)

    def render_cam(cam):
        extra = None
        if spec is not None and g.asg is not None:
            from bags_tpu.calib.specular import specular_extra_color
            extra = specular_extra_color(spec, g.xyz, g.asg, cam, align)
        return render(g.xyz, g.scaling(), g.quats, g.opacity(alive),
                      g.sh_coeffs(), cam, static, cfg, bg=bg,
                      align=align, extra_color=extra).render

    test_cams = scene.test_cams
    opt_cam_path = os.path.join(args.model_path, "opt_test_cams.npz")
    if args.optim_test_pose_iter > 0 and os.path.exists(opt_cam_path):
        # resume previously optimized test poses (reference render.py:215
        # loads opt_test_cam.pt when present)
        saved = np.load(opt_cam_path)
        test_cams = dataclasses.replace(
            test_cams, dq=jnp.asarray(saved["dq"]),
            dt=jnp.asarray(saved["dt"]))
        print(f"loaded optimized test poses from {opt_cam_path}")
        args.optim_test_pose_iter = 0
    if args.optim_test_pose_iter > 0:
        # Test-time pose optimization (render.py:214-283): photometric,
        # only dq/dt of each test camera move.
        print(f"test-time pose optimization "
              f"({args.optim_test_pose_iter} iters)")
        # reference test-camera lrs: rotation 5e-4, translation 2.5e-3
        # (scene/__init__.py:166-170)
        tx = optax.multi_transform(
            {"dq": optax.adam(5e-4, eps=1e-15),
             "dt": optax.adam(2.5e-3, eps=1e-15)},
            ("dq", "dt"))

        @jax.jit
        def step(dq, dt, opt_state, idx_gt, cam):
            def loss_fn(dq, dt):
                c = dataclasses.replace(cam, dq=dq, dt=dt)
                return photometric_loss(render_cam(c), idx_gt)

            loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(dq, dt)
            upd, opt_state = tx.update(grads, opt_state)
            dq = dq + upd[0]
            dt = dt + upd[1]
            return dq, dt, opt_state, loss

        new_dq, new_dt = [], []
        for i in range(scene.n_test):
            cam = jax.tree_util.tree_map(lambda x: x[i], test_cams)
            gt = scene.test_image(i)
            dq, dt = cam.dq, cam.dt
            opt_state = tx.init((dq, dt))
            for _ in range(args.optim_test_pose_iter):
                dq, dt, opt_state, loss = step(dq, dt, opt_state, gt, cam)
            new_dq.append(dq)
            new_dt.append(dt)
        test_cams = dataclasses.replace(
            test_cams, dq=jnp.stack(new_dq), dt=jnp.stack(new_dt))
        # persist like the reference's opt_test_cam.pt (render.py:283)
        np.savez(opt_cam_path, dq=np.asarray(test_cams.dq),
                 dt=np.asarray(test_cams.dt))
        print(f"saved optimized test poses to {opt_cam_path}")

    def fisheye_pair(i, cams, split):
        """Render + lens-warp one view against the fisheye GT (reference
        render.py:97-124 applies the saved lens flow to eval renders)."""
        trainer = trained["trainer"]
        cam = jax.tree_util.tree_map(lambda x: x[i], cams)
        cam = dataclasses.replace(cam,
                                  fovx=jnp.asarray(trainer.setup.fovx),
                                  fovy=jnp.asarray(trainer.setup.fovy))
        infos = (scene.test_infos if split == "test" else scene.train_infos)
        if split == "test":
            gt = (scene.test_fish_image(i) if infos[i].fish_image_path
                  else scene.test_image(i))
        else:
            gt = (scene.fish_image(i) if infos[i].fish_image_path
                  else scene.train_image(i))
        img, gt_img = fisheye_eval(trainer.state, cam, gt)
        return img, gt_img

    jobs = []
    if not args.skip_test:
        jobs.append(("test", test_cams, scene.n_test, scene.test_image))
    if not args.skip_train:
        jobs.append(("train", train_cams, scene.n_train, scene.train_image))
    for split, cams, n, gt_fn in jobs:
        out_dir = os.path.join(args.model_path, split, f"ours_{it}")
        os.makedirs(os.path.join(out_dir, "renders"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "gt"), exist_ok=True)
        vals = []
        for i in range(n):
            if fisheye_eval is not None:
                img, gt_img = fisheye_pair(i, cams, split)
            else:
                cam = jax.tree_util.tree_map(lambda x: x[i], cams)
                img = jnp.clip(render_cam(cam), 0.0, 1.0)
                gt_img = gt_fn(i)
            vals.append(float(psnr(img, gt_img)))
            save_png(os.path.join(out_dir, "renders", f"{i:05d}.png"), img)
            save_png(os.path.join(out_dir, "gt", f"{i:05d}.png"), gt_img)
        print(f"wrote {n} {split} renders to {out_dir} "
              f"(PSNR {float(np.mean(vals)):.3f})")


if __name__ == "__main__":
    main()
