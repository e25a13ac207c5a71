#!/usr/bin/env python
"""Rendering CLI — render train/test sets from a trained model.

Capability parity with `/root/reference/render.py`: loads the trained model
(PLY or full checkpoint, `load_iteration=-1` resolves the max saved
iteration), optionally runs test-time pose optimization (photometric,
pose-only Adam on the test cameras; render.py:214-283), renders each view
and writes `renders/` + `gt/` PNG trees that `metrics.py` consumes.
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def save_png(path, img):
    import numpy as np
    from PIL import Image

    arr = (np.clip(np.asarray(img), 0, 1) * 255).astype("uint8")
    Image.fromarray(arr.transpose(1, 2, 0)).save(path)


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
    p.add_argument("--optim_test_pose_iter", type=int, default=0,
                   help="test-time pose optimization iterations "
                        "(reference: 7000)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bags_tpu.data import Scene
    from bags_tpu.model.gaussians import load_ply
    from bags_tpu.raster import RenderConfig, render
    from bags_tpu.train.checkpoint import find_max_iteration
    from bags_tpu.train.losses import photometric_loss

    it = args.iteration
    if it == -1:
        it = find_max_iteration(os.path.join(args.model_path, "point_cloud"))
    ply = os.path.join(args.model_path, "point_cloud", f"iteration_{it}",
                       "point_cloud.ply")
    g, alive = load_ply(ply)
    print(f"loaded {int(np.asarray(alive).sum())} Gaussians from {ply}")

    scene = Scene(args.source_path, eval_split=args.eval,
                  resolution=args.resolution,
                  white_background=args.white_background,
                  sh_degree=args.sh_degree)
    cfg = RenderConfig(sh_degree=args.sh_degree, backend=args.backend,
                       max_instances=args.max_instances)
    bg = jnp.ones(3) if args.white_background else jnp.zeros(3)

    def render_cam(cam):
        return render(g.xyz, g.scaling(), g.quats, g.opacity(alive),
                      g.sh_coeffs(), cam, scene.static, cfg, bg=bg).render

    test_cams = scene.test_cams
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

    jobs = []
    if not args.skip_test:
        jobs.append(("test", test_cams, scene.n_test, scene.test_image))
    if not args.skip_train:
        jobs.append(("train", scene.train_cams, scene.n_train,
                     scene.train_image))
    for split, cams, n, gt_fn in jobs:
        out_dir = os.path.join(args.model_path, split, f"ours_{it}")
        os.makedirs(os.path.join(out_dir, "renders"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "gt"), exist_ok=True)
        for i in range(n):
            cam = jax.tree_util.tree_map(lambda x: x[i], cams)
            img = render_cam(cam)
            save_png(os.path.join(out_dir, "renders", f"{i:05d}.png"), img)
            save_png(os.path.join(out_dir, "gt", f"{i:05d}.png"), gt_fn(i))
        print(f"wrote {n} {split} renders to {out_dir}")


if __name__ == "__main__":
    main()
