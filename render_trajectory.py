#!/usr/bin/env python
"""Trajectory-rendering CLI — novel-view video frames from a trained model.

Capability parity with the reference's `render_trajectory/` script family
(~10 scripts, SURVEY.md §2.1): spiral / orbit / sequential-interpolated
camera paths rendered to numbered PNG frames (assemble with ffmpeg or any
tool; an animated GIF is written when --gif is set).

Like `render.py`, this restores the FULL `chkpnt{it}.npz` when one exists:
paths are anchored on the OPTIMIZED cameras, the specular/ASG color and the
global SIM(3) alignment are applied, and fisheye models warp every frame
through the trained lens field (the reference's
`render_trajectory/render_sequential_fisheye.py:64` applies the saved lens
flow per trajectory frame). `--ply_only` keeps the raw-PLY fallback.
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", "-m", required=True)
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--iteration", type=int, default=-1)
    p.add_argument("--mode",
                   choices=["spiral", "orbit", "sequential", "wander"],
                   default="spiral")
    p.add_argument("--n_frames", type=int, default=120)
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--backend", default="auto")
    p.add_argument("--max_instances", type=int, default=2 ** 20)
    p.add_argument("--white_background", "-w", action="store_true")
    p.add_argument("--gif", action="store_true")
    p.add_argument("--ply_only", action="store_true",
                   help="ignore checkpoints; render the saved PLY with the "
                        "raw Scene cameras")
    p.add_argument("--panorama_fov", type=float, default=0.0,
                   help="render 5 cubemap faces per pose and resample into "
                        "a perspective view of this FoV (degrees) — the "
                        "reference's render_mitsuba wide-FoV flow")
    p.add_argument("--out", default=None)
    from bags_tpu.utils.platform import add_platform_arg, apply_platform
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bags_tpu.core.camera import pose_w2c
    from bags_tpu.data import Scene
    from bags_tpu.eval import trajectory
    from bags_tpu.model.gaussians import load_ply
    from bags_tpu.raster import RenderConfig, render
    from bags_tpu.train.checkpoint import find_max_iteration
    from render import _load_trained_state

    trained = None if args.ply_only else _load_trained_state(args)

    align = None
    spec = None
    warp_frame = None
    if trained is not None:
        scene = trained["scene"]
        trainer = trained["trainer"]
        cfg_t = trained["cfg"]
        it = trained["it"]
        base = getattr(trainer.state, "base", trainer.state)
        g, alive = base.g, base.alive
        align = base.align
        spec = base.spec
        anchor_cams = base.cams        # OPTIMIZED training cameras
        static = scene.static
        sh_degree = cfg_t.model.sh_degree
        cfg = RenderConfig(sh_degree=sh_degree, backend=args.backend,
                           max_instances=cfg_t.max_instances)
        bg = (jnp.ones(3) if cfg_t.model.white_background else jnp.zeros(3))
        path_fovx = float(jnp.mean(anchor_cams.fovx))
        path_fovy = float(jnp.mean(anchor_cams.fovy))
        if (cfg_t.calib.outside_rasterizer and not cfg_t.calib.cubemap
                and not cfg_t.calib.apply2gt):
            # Fisheye model: render at the extended FoV, then warp each
            # frame through the trained lens field into fisheye space
            # (render_sequential_fisheye.py:64).
            from bags_tpu.calib import distortion as dist_lib
            setup = trainer.setup
            static = setup.render_static
            path_fovx = float(setup.fovx)
            path_fovy = float(setup.fovy)
            lens = trainer.state.lens
            p_view = trainer.p_view

            def warp_frame(img, cam):
                proj_scale = jnp.stack([1.0 / jnp.tan(cam.fovx * 0.5),
                                        1.0 / jnp.tan(cam.fovy * 0.5)])
                warped, mask, _ = dist_lib.apply_distortion(
                    lens, p_view, setup.grid_hw, img, proj_scale,
                    setup.flow_hw, final_hw=setup.fish_hw, apply2gt=False)
                return warped
    else:
        it = args.iteration
        if it == -1:
            it = find_max_iteration(
                os.path.join(args.model_path, "point_cloud"))
        g, alive = load_ply(os.path.join(args.model_path, "point_cloud",
                                         f"iteration_{it}",
                                         "point_cloud.ply"))
        scene = Scene(args.source_path,
                      white_background=args.white_background,
                      sh_degree=args.sh_degree)
        anchor_cams = scene.train_cams
        static = scene.static
        sh_degree = args.sh_degree
        cfg = RenderConfig(sh_degree=sh_degree, backend=args.backend,
                           max_instances=args.max_instances)
        bg = jnp.ones(3) if args.white_background else jnp.zeros(3)
        path_fovx = float(anchor_cams.fovx[0])
        path_fovy = float(anchor_cams.fovy[0])

    R, t = pose_w2c(anchor_cams)
    R, t = np.asarray(R), np.asarray(t)
    c2ws = np.zeros((len(R), 4, 4))
    c2ws[:, :3, :3] = np.transpose(R, (0, 2, 1))
    c2ws[:, :3, 3] = -np.einsum("nji,nj->ni", R, t)
    c2ws[:, 3, 3] = 1.0

    n_anchor = len(R)
    if args.mode == "spiral":
        path = trajectory.spiral_path(c2ws, n_frames=args.n_frames)
    elif args.mode == "orbit":
        center = c2ws[:, :3, 3].mean(axis=0)
        rad = np.linalg.norm(c2ws[:, :3, 3] - center, axis=1).mean()
        path = trajectory.orbit_path(center, rad, 0.0, args.n_frames)
    elif args.mode == "wander":
        # in-place elliptical wander around the first (optimized) view
        # (utils/pose_utils.render_wander_path)
        path = trajectory.wander_path(R[0], t[0], path_fovy,
                                      static.height, args.n_frames)
    else:
        path = trajectory.interpolate_path(
            anchor_cams, max(args.n_frames // max(n_anchor - 1, 1), 1))

    cams = trajectory.path_to_cameras(path, path_fovx, path_fovy)

    out_dir = args.out or os.path.join(args.model_path,
                                       f"trajectory_{args.mode}_{it}")
    os.makedirs(out_dir, exist_ok=True)

    def render_core(cam):
        extra = None
        if spec is not None and g.asg is not None:
            from bags_tpu.calib.specular import specular_extra_color
            extra = specular_extra_color(spec, g.xyz, g.asg, cam, align)
        return render(g.xyz, g.scaling(), g.quats, g.opacity(alive),
                      g.sh_coeffs(), cam, static, cfg, bg=bg,
                      align=align, extra_color=extra).render

    @jax.jit
    def render_plain(cam):
        img = render_core(cam)
        # lens warp applies to full frames only (panorama faces below
        # resample their own tan-space geometry)
        if warp_frame is not None:
            img = warp_frame(img, cam)
        return img

    if args.panorama_fov > 0:
        # 5-face cubemap render + dominant-axis resample per pose
        # (render_mitsuba.py:273-440's perspective-from-cubemap flow).
        from bags_tpu.calib.cubemap import (SUB_CAMERA_ROTATIONS,
                                            cubemap_to_perspective)
        from bags_tpu.core.camera import rotate_camera_pose
        from bags_tpu.core.lie import quat_to_rotmat, rotmat_to_quat

        @jax.jit
        def render_one(cam):
            # faces render at 90-degree FoV in BOTH axes: the resampler maps
            # u,v in [-1,1] to tan(+-45 deg) at each face's edges
            fov90 = jnp.asarray(np.pi / 2, jnp.float32)
            cam = dataclasses.replace(cam, fovx=fov90, fovy=fov90)
            faces = [render_core(cam)]                   # forward
            R0 = quat_to_rotmat(cam.q_init)
            for degs in SUB_CAMERA_ROTATIONS[:4]:        # up down left right
                Rn, tn = rotate_camera_pose(R0, cam.t_init, *degs)
                c = dataclasses.replace(cam, q_init=rotmat_to_quat(Rn),
                                        t_init=tn)
                faces.append(render_core(c))
            fwd, up, down, left, right = faces
            return cubemap_to_perspective(
                fwd, left, right, up, down, args.panorama_fov,
                args.panorama_fov, static.width, static.height)
    else:
        render_one = render_plain

    from PIL import Image
    frames = []
    n = int(cams.fovx.shape[0])
    for i in range(n):
        cam = jax.tree_util.tree_map(lambda x: x[i], cams)
        img = np.clip(np.asarray(render_one(cam)), 0, 1)
        arr = (img * 255).astype(np.uint8).transpose(1, 2, 0)
        Image.fromarray(arr).save(os.path.join(out_dir, f"{i:05d}.png"))
        if args.gif:
            frames.append(Image.fromarray(arr))
    if args.gif and frames:
        frames[0].save(os.path.join(out_dir, "trajectory.gif"),
                       save_all=True, append_images=frames[1:],
                       duration=50, loop=0)
    print(f"wrote {n} frames to {out_dir}")


if __name__ == "__main__":
    main()
