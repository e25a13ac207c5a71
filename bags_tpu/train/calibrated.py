"""Calibrated training modes: fisheye (outside-rasterizer) and cubemap.

Capability parity with the reference's calibration training paths:
  * fisheye / `--outside_rasterizer` (`train.py:255-325`): render the scene
    at an extended FoV, warp the render into the fisheye frame through the
    iResNet lens field (or warp the GT into perspective with `--apply2gt`),
    masked L1+SSIM loss, joint optimization of Gaussians, camera poses/
    intrinsics, the lens net (Adam, `--iresnet_lr`), the vignetting model
    after `--start_vignetting`, and the entrance-pupil shift (`--opt_shift`,
    Adam lr 1e-5, train.py:124-126);
  * cubemap / `--cubemap` (`train.py:231-247,287-323`): five-face rendering
    through `calib.cubemap`, per-face masked losses against a circular-
    masked fisheye GT with the (5 - sum ssim) objective; cubemap_net
    NaN-guarded updates (train.py:423-432).

The extended-FoV camera geometry mirrors `scene/cameras.py:117-175`: for
apply2render the render spans focal2fov(f, flow_scale * W_perspective) at
render_resolution * perspective resolution; for apply2gt it spans the
fisheye sizes. Learnable per-camera FoVs are re-initialized to the extended
values, so intrinsics optimization operates on the extended frustum exactly
as in the reference.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..calib import cubemap as cubemap_lib
from ..calib import distortion as dist_lib
from ..calib.iresnet import IResNetParams, init_iresnet_params
from ..calib.vignetting import VignettingParams, vignetting_mask
from ..core.camera import CameraParams, CameraStatic, rotate_camera_pose
from ..model.densify import update_stats
from ..raster import RenderConfig, render

from .config import TrainConfig
from .losses import photometric_loss
from .loop import TrainState, Trainer, row_adam_update
from .optim import ADAM_EPS, multistep_schedule


# ---------------------------------------------------------------------------
# Extended-FoV fisheye geometry
# ---------------------------------------------------------------------------

def _focal2fov(f, px):
    return 2.0 * np.arctan(px / (2.0 * f))


@dataclasses.dataclass(frozen=True)
class FisheyeSetup:
    render_static: CameraStatic       # extended-FoV render size
    fish_hw: Tuple[int, int]          # fisheye GT (H, W)
    grid_hw: Tuple[int, int]          # control-grid sampling (h, w)
    flow_hw: Tuple[int, int]          # flow upsample target (H, W)
    fovx: float                       # extended FoVs (init for learnables)
    fovy: float
    # banded-warp source-row window (0 = use the gather warp). Measured
    # from the initialized lens field by measure_warp_ky; fast-precision
    # train steps use the matmul warp when > 0.
    warp_ky: int = 0


def make_fisheye_setup(focal_x: float, focal_y: float,
                       persp_wh: Tuple[int, int], fish_wh: Tuple[int, int],
                       flow_scale=(1.0, 1.0), render_resolution: float = 1.0,
                       control_point_sample_scale: int = 8,
                       apply2gt: bool = False) -> FisheyeSetup:
    pw, ph = persp_wh
    fw, fh = fish_wh
    if not apply2gt:
        # cameras.py:154-161
        fovx = _focal2fov(focal_x, int(flow_scale[0] * pw))
        fovy = _focal2fov(focal_y, int(flow_scale[1] * ph))
        rw, rh = int(render_resolution * pw), int(render_resolution * ph)
        # util_distortion.py:299 (note the reference's index/scale pairing)
        flow_hw = (int(fh * flow_scale[0]), int(fw * flow_scale[1]))
    else:
        # cameras.py:167-175
        fovx = _focal2fov(focal_x, int(flow_scale[0] * fw))
        fovy = _focal2fov(focal_y, int(flow_scale[1] * fh))
        rw = int((flow_scale[0] / flow_scale[1]) * render_resolution * fw)
        rh = int(render_resolution * fh)
        flow_hw = (rh, rw)
    grid_hw = (max(rh // control_point_sample_scale, 2),
               max(rw // control_point_sample_scale, 2))
    return FisheyeSetup(
        render_static=CameraStatic(width=rw, height=rh),
        fish_hw=(fh, fw), grid_hw=grid_hw, flow_hw=flow_hw,
        fovx=float(fovx), fovy=float(fovy))


from ..utils.image import WARP_BAND  # banded-warp output-row band


def snap_warp_ky(ky: int) -> int:
    """Round a measured window up a warp-ky ladder step: 1.5x headroom for
    lens-field drift during training, snapped to a multiple of 32."""
    return int(-(-int(ky * 1.5) // 32) * 32)


def measure_warp_ky(lens, p_view: jnp.ndarray, setup: FisheyeSetup,
                    apply2gt: bool) -> int:
    """Required banded-warp window for the CURRENT lens field (run once
    after lens initialization; the warp-ky ladder handles later drift).
    The warped image is the extended-FoV render for apply2render and the
    fisheye GT for apply2gt."""
    from ..utils.image import required_ky

    proj_scale = jnp.stack([1.0 / jnp.tan(jnp.asarray(setup.fovx) * 0.5),
                            1.0 / jnp.tan(jnp.asarray(setup.fovy) * 0.5)])
    flow = dist_lib.compute_flow(lens, p_view, setup.grid_hw, proj_scale,
                                 setup.flow_hw, sensor_to_frustum=apply2gt)
    h_img = setup.fish_hw[0] if apply2gt else setup.render_static.height
    return snap_warp_ky(required_ky(np.asarray(flow), h_img,
                                    band=WARP_BAND))


def fisheye_control_points(setup: FisheyeSetup, focal_x: float,
                           focal_y: float, flow_scale=(1.0, 1.0)
                           ) -> jnp.ndarray:
    """`generate_control_pts` (util_distortion.py:314-342): grid over the
    flow-scaled fisheye sensor, back-projected through the (recentered) K."""
    fh, fw = setup.fish_hw
    sensor_w = int(fw * flow_scale[0])
    sensor_h = int(fh * flow_scale[1])
    K = np.array([[focal_x, 0, sensor_w / 2],
                  [0, focal_y, sensor_h / 2],
                  [0, 0, 1.0]])
    _, view = dist_lib.make_control_grid(
        K, sensor_w, sensor_h, setup.grid_hw[1], setup.grid_hw[0])
    return view


# ---------------------------------------------------------------------------
# Calibrated state
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CalibState:
    base: TrainState
    lens: IResNetParams
    lens_opt: optax.OptState
    cubemap_net: IResNetParams
    cubemap_opt: optax.OptState
    vig: VignettingParams
    vig_opt: optax.OptState
    shift: jnp.ndarray
    shift_opt: optax.OptState


def _moments_only() -> optax.GradientTransformation:
    """Adam moments with NO learning rate: the LR is applied by the caller
    from a GLOBAL-iteration MultiStepLR schedule, matching the reference's
    per-iteration `scheduler.step()` calls (train.py:105-127) — the decay
    milestones are global iterations, not per-optimizer update counts."""
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=ADAM_EPS, eps_root=0.0)


def _apply_lr(params, updates, lr_val):
    return optax.apply_updates(
        params, jax.tree_util.tree_map(lambda u: -lr_val * u, updates))


def init_calib_state(base: TrainState, cfg: TrainConfig,
                     seed: int = 0) -> Tuple[CalibState, dict]:
    lens = init_iresnet_params(seed=seed)
    cub = init_iresnet_params(seed=seed + 1)
    vig = VignettingParams.create()
    shift = jnp.zeros((3,), jnp.float32)
    # (moment transform, global-step LR schedule) per group, mirroring the
    # reference's Adams + MultiStepLR decays (train.py:105-127):
    #   lens_net    Adam(iresnet_lr)  x0.5 @ [7000]
    #   cubemap_net Adam(iresnet_lr)  x0.5 @ [2000, 7000, 9000]
    #   vignetting  Adam(0.01)        x10  @ [1000]
    #   shift       Adam(1e-5)        x0.1 @ [30000]
    txs = {
        "lens": (_moments_only(),
                 multistep_schedule(cfg.calib.iresnet_lr, (7000,), 0.5)),
        "cubemap": (_moments_only(),
                    multistep_schedule(cfg.calib.iresnet_lr,
                                       (2000, 7000, 9000), 0.5)),
        "vig": (_moments_only(), multistep_schedule(0.01, (1000,), 10.0)),
        "shift": (_moments_only(), multistep_schedule(1e-5, (30000,), 0.1)),
    }
    return CalibState(
        base=base,
        lens=lens, lens_opt=txs["lens"][0].init(lens),
        cubemap_net=cub, cubemap_opt=txs["cubemap"][0].init(cub),
        vig=vig, vig_opt=txs["vig"][0].init(vig),
        shift=shift, shift_opt=txs["shift"][0].init(shift),
    ), txs


# ---------------------------------------------------------------------------
# Fisheye train step
# ---------------------------------------------------------------------------

def make_fisheye_train_step(setup: FisheyeSetup, rcfg: RenderConfig,
                            cfg: TrainConfig, g_tx, txs, sh_degree: int,
                            opt_lens: bool, use_vignetting: bool,
                            spec_tx=None):
    static = setup.render_static
    rcfg = dataclasses.replace(rcfg, sh_degree=sh_degree)
    lam = cfg.opt.lambda_dssim
    apply2gt = cfg.calib.apply2gt
    use_mask = not cfg.calib.no_distortion_mask
    # --hybrid: the specular ASG color rides the extended-FoV render exactly
    # like the vanilla step's (the reference threads mlp_color through the
    # fisheye render at train.py:250 and render_cubemap at train.py:235).
    hybrid = cfg.calib.hybrid
    K = cfg.opt.batch_cams
    # fast precision + measured window -> the gather-free banded warp;
    # exact mode keeps the f32 gather warp (reference-parity numerics)
    banded = setup.warp_ky > 0 and rcfg.precision == "fast"

    @jax.jit
    def step(state: CalibState, fish_gt: jnp.ndarray, p_view: jnp.ndarray,
             cam_idx: jnp.ndarray, bg: jnp.ndarray):
        b = state.base
        cam_i = jax.tree_util.tree_map(lambda x: x[cam_idx], b.cams)
        n_cap = b.g.capacity
        lead = (K,) if K > 1 else ()
        probe = jnp.zeros(lead + (n_cap, 2), jnp.float32)
        absp = jnp.zeros(lead + (n_cap, 2), jnp.float32)

        def one_view(g, cam, align, probe2d, abs_probe, lens, vig, shift,
                     spec, gt_one):
            extra = None
            if hybrid:
                from ..calib.specular import specular_extra_color
                extra = specular_extra_color(spec, g.xyz, g.asg, cam, align)
            out = render(
                g.xyz, g.scaling(), g.quats, g.opacity(b.alive),
                g.sh_coeffs(), cam, static, rcfg, bg=bg, align=align,
                probe2d=probe2d, abs_probe=abs_probe, extra_color=extra,
                shift_factors=shift if cfg.calib.opt_shift else None)
            proj_scale = jnp.stack([1.0 / jnp.tan(cam.fovx * 0.5),
                                    1.0 / jnp.tan(cam.fovy * 0.5)])
            if not apply2gt:
                if banded:
                    warped, mask, _, wover = dist_lib.apply_distortion_banded(
                        lens, p_view, setup.grid_hw, out.render, proj_scale,
                        setup.flow_hw, setup.warp_ky, final_hw=setup.fish_hw,
                        apply2gt=False, band=WARP_BAND)
                else:
                    warped, mask, _ = dist_lib.apply_distortion(
                        lens, p_view, setup.grid_hw, out.render, proj_scale,
                        setup.flow_hw, final_hw=setup.fish_hw, apply2gt=False)
                    wover = jnp.asarray(0, jnp.int32)
                gt_img = gt_one
                if use_vignetting:
                    mask = mask * vignetting_mask(vig, *setup.fish_hw)[None]
                if use_mask:
                    gt_img = gt_img * mask
                loss = photometric_loss(warped, gt_img, lam)
                image = warped
            else:
                if banded:
                    gt_warped, mask, _, wover = dist_lib.apply_distortion_banded(
                        lens, p_view, setup.grid_hw, gt_one, proj_scale,
                        setup.flow_hw, setup.warp_ky, apply2gt=True,
                        band=WARP_BAND)
                else:
                    gt_warped, mask, _ = dist_lib.apply_distortion(
                        lens, p_view, setup.grid_hw, gt_one, proj_scale,
                        setup.flow_hw, apply2gt=True)
                    wover = jnp.asarray(0, jnp.int32)
                image = out.render
                if use_vignetting:
                    mask = mask * vignetting_mask(
                        vig, static.height, static.width)[None]
                if use_mask:
                    image = image * mask
                loss = photometric_loss(image, gt_warped, lam)
            return loss, (out, image, wover)

        if K > 1:
            # K fisheye views per step (--batch_cams composed with
            # --outside_rasterizer, VERDICT r3 item 7): mean loss over K
            # unrolled view chains (the pattern of dist/sharded.py:275-292),
            # per-view probes so densify stats accumulate like K single-view
            # reference iterations.
            def loss_fn(g, cams_k, align, probes, absps, lens, vig, shift,
                        spec):
                total = 0.0
                wover = jnp.asarray(0, jnp.int32)
                outs, imgs = [], []
                for k in range(K):
                    cam_k = jax.tree_util.tree_map(lambda x: x[k], cams_k)
                    l_k, (out_k, img_k, wo_k) = one_view(
                        g, cam_k, align, probes[k], absps[k], lens, vig,
                        shift, spec, fish_gt[k])
                    total = total + l_k
                    wover = wover + wo_k
                    outs.append(out_k)
                    imgs.append(img_k)
                out = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *outs)
                return total / K, (out, jnp.stack(imgs), wover)
        else:
            def loss_fn(g, cam, align, probe2d, abs_probe, lens, vig,
                        shift, spec):
                return one_view(g, cam, align, probe2d, abs_probe, lens,
                                vig, shift, spec, fish_gt)

        argnums = (0, 1, 2, 3, 4, 5, 6, 7) + ((8,) if hybrid else ())
        (loss, (out, image, wover)), grads = jax.value_and_grad(
            loss_fn, argnums=argnums, has_aux=True)(
                b.g, cam_i, b.align, probe, absp, state.lens, state.vig,
                state.shift, b.spec)
        (g_grads, cam_grads, align_grads, signed_stat, abs_stat, lens_grads,
         vig_grads, shift_grads) = grads[:8]

        updates, g_opt = g_tx.update(g_grads, b.g_opt, b.g)
        new_g = optax.apply_updates(b.g, updates)
        new_cams, cam_opt = row_adam_update(b.cams, b.cam_opt, cam_grads,
                                            cam_idx, cfg.calib, b.step)

        if hybrid:
            s_upd, spec_opt = spec_tx.update(grads[8], b.spec_opt, b.spec)
            new_spec = optax.apply_updates(b.spec, s_upd)
        else:
            new_spec, spec_opt = b.spec, b.spec_opt

        if opt_lens:
            # NaN guard (train.py:423-432): skip the update on any NaN grad.
            bad = jnp.any(jnp.array(
                [jnp.any(~jnp.isfinite(l))
                 for l in jax.tree_util.tree_leaves(lens_grads)]))
            lens_grads = jax.tree_util.tree_map(
                lambda l: jnp.where(bad, jnp.zeros_like(l), l), lens_grads)
            l_upd, lens_opt = txs["lens"][0].update(lens_grads,
                                                   state.lens_opt)
            new_lens = _apply_lr(state.lens, l_upd, txs["lens"][1](b.step))
        else:
            new_lens, lens_opt = state.lens, state.lens_opt

        if use_vignetting:
            v_upd, vig_opt = txs["vig"][0].update(vig_grads, state.vig_opt)
            new_vig = _apply_lr(state.vig, v_upd, txs["vig"][1](b.step))
        else:
            new_vig, vig_opt = state.vig, state.vig_opt

        if cfg.calib.opt_shift:
            s_upd, shift_opt = txs["shift"][0].update(shift_grads,
                                                      state.shift_opt)
            new_shift = _apply_lr(state.shift, s_upd,
                                  txs["shift"][1](b.step))
        else:
            new_shift, shift_opt = state.shift, state.shift_opt

        if K > 1:
            # mean-over-views scales probe cotangents by 1/K; densify
            # thresholds are single-view reference magnitudes (loop.py).
            stats = b.stats
            for k in range(K):
                stats = update_stats(stats, signed_stat[k] * K,
                                     abs_stat[k] * K, out.radii[k],
                                     out.visibility[k])
            n_drop = jnp.sum(out.n_dropped)
        else:
            stats = update_stats(b.stats, signed_stat, abs_stat, out.radii,
                                 out.visibility)
            n_drop = out.n_dropped

        new_base = dataclasses.replace(
            b, g=new_g, g_opt=g_opt, cams=new_cams, cam_opt=cam_opt,
            stats=stats, step=b.step + 1, spec=new_spec, spec_opt=spec_opt)
        new_state = dataclasses.replace(
            state, base=new_base, lens=new_lens, lens_opt=lens_opt,
            vig=new_vig, vig_opt=vig_opt, shift=new_shift,
            shift_opt=shift_opt)
        return new_state, (loss, image, n_drop, wover)

    return step


# ---------------------------------------------------------------------------
# Cubemap train step
# ---------------------------------------------------------------------------

def build_sub_cameras(cams: CameraParams) -> List[CameraParams]:
    """The five ±90° sub-camera batches (cameras.py:177-201)."""
    subs = []
    from ..core.lie import quat_to_rotmat
    R = np.asarray(quat_to_rotmat(cams.q_init + cams.dq))
    t = np.asarray(cams.t_init + cams.dt)
    for degs in cubemap_lib.SUB_CAMERA_ROTATIONS:
        rs, ts = [], []
        for i in range(R.shape[0]):
            Rn, tn = rotate_camera_pose(jnp.asarray(R[i]), jnp.asarray(t[i]),
                                        *degs)
            rs.append(np.asarray(Rn))
            ts.append(np.asarray(tn))
        sub = CameraParams.create(np.stack(rs), np.stack(ts),
                                  np.asarray(cams.fovx), np.asarray(cams.fovy))
        subs.append(sub)
    return subs


def _cubemap_face_kys(cubemap_net, focal_x: float, focal_y: float,
                      static: CameraStatic, scale: int):
    """Per-face (ky_normal, ky_transposed) banded-warp windows for the
    CURRENT cubemap net (singular/out-of-image grid entries are excluded
    by required_ky's in-image mask)."""
    from ..utils.image import required_ky

    K = np.array([[focal_x, 0, static.width / 2],
                  [0, focal_y, static.height / 2], [0, 0, 1.0]])
    rays = cubemap_lib.distorted_rays(cubemap_net, K, static.width,
                                      static.height, scale)
    out = []
    for face in cubemap_lib.FACES:
        grid = np.asarray(cubemap_lib.face_grid(
            jnp.asarray(K, jnp.float32), rays, face, static.height,
            static.width, (static.height, static.width)))
        ky_n = required_ky(grid, static.height, band=WARP_BAND)
        ky_t = required_ky(grid.transpose(1, 0, 2)[..., ::-1],
                           static.width, band=WARP_BAND)
        out.append((ky_n, ky_t))
    return out


def measure_cubemap_warp_ky(cubemap_net, focal_x: float, focal_y: float,
                            static: CameraStatic, scale: int) -> int:
    """Required banded-warp window over the five cubemap face grids, all
    in the normal (row-band) orientation — the sharded step's scan needs
    one uniform orientation."""
    kys = _cubemap_face_kys(cubemap_net, focal_x, focal_y, static, scale)
    return snap_warp_ky(max(n for n, _ in kys))


def measure_cubemap_warp_orient(cubemap_net, focal_x: float, focal_y: float,
                                static: CameraStatic, scale: int):
    """(warp_ky, per-face transposed flags): each face picks the banding
    orientation with the smaller source window — the left/right face
    reprojections transpose rows<->columns, so their row-band windows span
    nearly the full image while the column-band ones are tight. warp_ky is
    the max over the chosen orientations."""
    kys = _cubemap_face_kys(cubemap_net, focal_x, focal_y, static, scale)
    transposed = tuple(t < n for n, t in kys)
    return (snap_warp_ky(max(min(n, t) for n, t in kys)), transposed)


def make_cubemap_train_step(static: CameraStatic, rcfg: RenderConfig,
                            cfg: TrainConfig, g_tx, txs, sh_degree: int,
                            focal_x: float, focal_y: float, spec_tx=None,
                            warp_ky: int = 0, warp_transposed=None):
    """Five-face cubemap training (train.py:231-247, 287-323)."""
    rcfg = dataclasses.replace(rcfg, sh_degree=sh_degree,
                               sort_by_distance=True)
    # fast precision + measured window -> banded face warps
    warp_ky = warp_ky if rcfg.precision == "fast" else 0
    lam = cfg.opt.lambda_dssim
    # --hybrid (reference render_cubemap takes mlp_color, train.py:235).
    # The five faces share one camera center (pure rotations about it), so
    # the view-dependent ASG color is computed ONCE and reused per face.
    hybrid = cfg.calib.hybrid
    K = np.array([[focal_x, 0, static.width / 2],
                  [0, focal_y, static.height / 2], [0, 0, 1.0]])
    mask90 = cubemap_lib.fov90_square_mask(static.height, static.width,
                                           focal_x, focal_y)
    circ = cubemap_lib.circular_mask(static.height, static.width,
                                     cfg.calib.mask_radius)
    scale = int(cfg.calib.control_point_sample_scale)

    @jax.jit
    def step(state: CalibState, gt: jnp.ndarray, cam_idx: jnp.ndarray,
             bg: jnp.ndarray, sub_q: jnp.ndarray, sub_t: jnp.ndarray):
        """sub_q/sub_t: (4, 4)/(4, 3) — the up/down/left/right sub-camera
        base poses for this camera (precomputed host-side)."""
        b = state.base
        cam_i = jax.tree_util.tree_map(lambda x: x[cam_idx], b.cams)
        n_cap = b.g.capacity
        probe = jnp.zeros((n_cap, 2), jnp.float32)
        absp = jnp.zeros((n_cap, 2), jnp.float32)

        def loss_fn(g, cam, align, probe2d, abs_probe, cub_net, spec):
            outs = []
            extra = None
            if hybrid:
                from ..calib.specular import specular_extra_color
                extra = specular_extra_color(spec, g.xyz, g.asg, cam, align)

            def one_render(c, pr, ap):
                return render(g.xyz, g.scaling(), g.quats,
                              g.opacity(b.alive), g.sh_coeffs(), c, static,
                              rcfg, bg=bg, align=align, probe2d=pr,
                              abs_probe=ap, extra_color=extra)

            main = one_render(cam, probe2d, abs_probe)
            outs.append(main)
            face_renders = [main.render]
            for f in range(4):
                sub_cam = dataclasses.replace(
                    cam, q_init=sub_q[f], t_init=sub_t[f])
                o = one_render(sub_cam, None, None)
                outs.append(o)
                face_renders.append(o.render)

            faces, wover = cubemap_lib.render_cubemap_faces(
                lambda i: face_renders[i], cub_net, K, static.width,
                static.height, scale, mask90, warp_ky=warp_ky,
                transposed=warp_transposed)
            half_masks = [jnp.ones_like(circ)] + [
                cubemap_lib.mask_half(jnp.ones_like(circ), f)
                for f in ("up", "down", "left", "right")]
            l1_sum = 0.0
            ssim_sum = 0.0
            from .losses import l1_loss, ssim as ssim_fn
            for img, hm in zip(faces, half_masks):
                a = img * circ * hm
                bb = gt * circ * hm
                l1_sum = l1_sum + l1_loss(a, bb)
                ssim_sum = ssim_sum + ssim_fn(a, bb)
            loss = (1 - lam) * l1_sum + lam * (5.0 - ssim_sum)
            n_drop = sum(o.n_dropped for o in outs)
            return loss, (main, faces[0], n_drop, wover)

        argnums = (0, 1, 2, 3, 4, 5) + ((6,) if hybrid else ())
        (loss, (main, face0, n_drop, wover)), grads = jax.value_and_grad(
            loss_fn, argnums=argnums, has_aux=True)(
                b.g, cam_i, b.align, probe, absp, state.cubemap_net, b.spec)
        g_grads, cam_grads, _, signed_stat, abs_stat, cub_grads = grads[:6]

        updates, g_opt = g_tx.update(g_grads, b.g_opt, b.g)
        new_g = optax.apply_updates(b.g, updates)
        new_cams, cam_opt = row_adam_update(b.cams, b.cam_opt, cam_grads,
                                            cam_idx, cfg.calib, b.step)

        if hybrid:
            s_upd, spec_opt = spec_tx.update(grads[6], b.spec_opt, b.spec)
            new_spec = optax.apply_updates(b.spec, s_upd)
        else:
            new_spec, spec_opt = b.spec, b.spec_opt

        bad = jnp.any(jnp.array(
            [jnp.any(~jnp.isfinite(l))
             for l in jax.tree_util.tree_leaves(cub_grads)]))
        cub_grads = jax.tree_util.tree_map(
            lambda l: jnp.where(bad, jnp.zeros_like(l), l), cub_grads)
        c_upd, cub_opt = txs["cubemap"][0].update(cub_grads,
                                                 state.cubemap_opt)
        new_cub = _apply_lr(state.cubemap_net, c_upd,
                            txs["cubemap"][1](b.step))

        stats = update_stats(b.stats, signed_stat, abs_stat, main.radii,
                             main.visibility)

        new_base = dataclasses.replace(
            b, g=new_g, g_opt=g_opt, cams=new_cams, cam_opt=cam_opt,
            stats=stats, step=b.step + 1, spec=new_spec, spec_opt=spec_opt)
        return dataclasses.replace(state, base=new_base, cubemap_net=new_cub,
                                   cubemap_opt=cub_opt), (loss, face0,
                                                          n_drop, wover)

    return step


# ---------------------------------------------------------------------------
# Host-side orchestration for calibrated modes
# ---------------------------------------------------------------------------

class CalibTrainer(Trainer):
    """Trainer for `--outside_rasterizer` (fisheye) and `--cubemap` modes.

    Wraps the base TrainState in a CalibState carrying the lens/cubemap
    nets, vignetting, and shift parameters, and drives the calibrated train
    steps while reusing the base class's densify/MCMC/opacity cadences and
    camera sampling. Mirrors the reference's extra setup (train.py:103-178):
    iResNet pre-initialization from COLMAP coefficients, extended-FoV camera
    intrinsics, cubemap sub-cameras, and the lens-optimization window
    (`--iresnet_opt_duration`).
    """

    def __init__(self, g, alive, cams, static, cfg, scene_extent, gt_images,
                 focal_x, focal_y, persp_wh, fish_wh=None, source_path="",
                 bg=None, rcfg=None, seed: int = 0, fish_images=None):
        calib = cfg.calib
        if cfg.opt.batch_cams > 1 and calib.cubemap:
            # The fisheye mode composes with --batch_cams (K unrolled view
            # chains); the 5-face cubemap step is already a 5-render batch
            # per step, so stacking K cameras on top is unsupported.
            raise ValueError("--batch_cams > 1 is not supported with "
                             "--cubemap (use the fisheye mode or K=1)")
        self.mode = "cubemap" if calib.cubemap else "fisheye"
        self.focal = (float(focal_x), float(focal_y))
        fish_wh = fish_wh or persp_wh

        if self.mode == "fisheye":
            self.setup = make_fisheye_setup(
                focal_x, focal_y, persp_wh, fish_wh,
                flow_scale=calib.flow_scale,
                render_resolution=calib.render_resolution,
                control_point_sample_scale=int(calib.control_point_sample_scale),
                apply2gt=calib.apply2gt)
            static = self.setup.render_static
            # extended-FoV learnable intrinsics (cameras.py:117-175)
            cams = dataclasses.replace(
                cams,
                fovx=jnp.full_like(cams.fovx, self.setup.fovx),
                fovy=jnp.full_like(cams.fovy, self.setup.fovy))
            self.p_view = fisheye_control_points(
                self.setup, focal_x, focal_y, calib.flow_scale)
        super().__init__(g, alive, cams, static, cfg, scene_extent,
                         gt_images, bg=bg, rcfg=rcfg, seed=seed)
        self.fish_images = fish_images or gt_images

        calib_state, self.txs = init_calib_state(self.state, cfg, seed)
        self.state = calib_state

        if self.mode == "fisheye" and calib.opt_distortion \
                and not calib.no_init_iresnet:
            from ..calib.distortion import (init_iresnet_from_colmap,
                                            read_colmap_coeff)
            coeff = read_colmap_coeff(source_path) if source_path \
                else [0.0, 0.0, 0.0, 0.0]
            K = np.array([[focal_x, 0, fish_wh[0] / 2],
                          [0, focal_y, fish_wh[1] / 2], [0, 0, 1.0]])
            print(f"pre-fitting lens net to coeff {coeff} ...", flush=True)
            lens = init_iresnet_from_colmap(
                self.state.lens, K, fish_wh[0], fish_wh[1], coeff)
            self.state = dataclasses.replace(self.state, lens=lens)
        elif self.mode == "cubemap" and not calib.no_init_iresnet:
            from ..calib.distortion import (init_cubemap_net,
                                            read_colmap_coeff)
            coeff = read_colmap_coeff(source_path) if source_path \
                else [0.0, 0.0, 0.0, 0.0]
            cub = init_cubemap_net(self.state.cubemap_net, coeff)
            self.state = dataclasses.replace(self.state, cubemap_net=cub)

        if self.mode == "cubemap":
            subs = build_sub_cameras(self.state.base.cams)
            self.sub_q = jnp.stack([s.q_init for s in subs[:4]], axis=1)
            self.sub_t = jnp.stack([s.t_init for s in subs[:4]], axis=1)

        self.cubemap_warp_ky = 0
        self.cubemap_warp_transposed = None
        if calib.banded_warp and self.rcfg.precision == "fast":
            # size the banded-warp window from the (initialized) lens /
            # cubemap field; the warp-ky ladder re-traces if training
            # drifts past it
            if self.mode == "fisheye":
                ky = measure_warp_ky(self.state.lens, self.p_view,
                                     self.setup, calib.apply2gt)
                self.setup = dataclasses.replace(self.setup, warp_ky=ky)
            else:
                ky, flips = measure_cubemap_warp_orient(
                    self.state.cubemap_net, *self.focal, self.static,
                    int(calib.control_point_sample_scale))
                self.cubemap_warp_ky = ky
                self.cubemap_warp_transposed = flips
            print(f"banded lens warp: ky={ky} (band={WARP_BAND})",
                  flush=True)

    def _train_step_fn(self):
        raise RuntimeError("CalibTrainer uses _calib_step_fn")

    def _calib_step_fn(self, it: int):
        calib = self.cfg.calib
        opt_lens = (calib.opt_distortion
                    and calib.iresnet_opt_duration[0] <= it
                    < calib.iresnet_opt_duration[1]
                    and it >= calib.start_opt_lens)
        use_vig = it > calib.start_vignetting
        key = (self.active_sh_degree, self.mode, opt_lens, use_vig)
        if key not in self._steps:
            if self.mode == "fisheye":
                self._steps[key] = make_fisheye_train_step(
                    self.setup, self.rcfg, self.cfg, self.g_tx, self.txs,
                    self.active_sh_degree, opt_lens, use_vig,
                    spec_tx=self.spec_tx)
            else:
                self._steps[key] = make_cubemap_train_step(
                    self.static, self.rcfg, self.cfg, self.g_tx, self.txs,
                    self.active_sh_degree, *self.focal,
                    spec_tx=self.spec_tx, warp_ky=self.cubemap_warp_ky,
                    warp_transposed=self.cubemap_warp_transposed)
        return self._steps[key]

    def _invoke_step(self, it, idx, gt):
        from .loop import StepMetrics

        step = self._calib_step_fn(it)
        wover = 0
        if self.mode == "fisheye":
            load = (self.fish_images if callable(self.fish_images)
                    else self.fish_images.__getitem__)
            if self.cfg.opt.batch_cams > 1:
                gt_img = jnp.stack([load(int(i)) for i in np.asarray(idx)])
            else:
                gt_img = load(idx)
            self.state, (loss, _, n_drop, wover) = step(
                self.state, gt_img, self.p_view, jnp.asarray(idx), self.bg)
        else:
            self.state, (loss, _, n_drop, wover) = step(
                self.state, gt, jnp.asarray(idx), self.bg, self.sub_q[idx],
                self.sub_t[idx])
        b = self.state.base
        return StepMetrics(loss=loss, l1=loss,
                           n_alive=jnp.sum(b.alive),
                           n_dropped=n_drop, warp_overflow=wover)

    def _grow_warp_ky(self, overflow: int) -> None:
        """Banded-warp window overflow: the lens/cubemap field drifted past
        the window measured at init. Re-measure from the CURRENT field,
        take a ladder step up, and re-trace the steps (compile-cache
        amortized, like the instance-capacity ladder)."""
        if self.mode == "fisheye":
            old = self.setup.warp_ky
            ky = max(measure_warp_ky(self.state.lens, self.p_view,
                                     self.setup, self.cfg.calib.apply2gt),
                     old + 32)
            self.setup = dataclasses.replace(self.setup, warp_ky=ky)
        else:
            old = self.cubemap_warp_ky
            new_ky, flips = measure_cubemap_warp_orient(
                self.state.cubemap_net, *self.focal, self.static,
                int(self.cfg.calib.control_point_sample_scale))
            ky = max(new_ky, old + 32)
            self.cubemap_warp_ky = ky
            self.cubemap_warp_transposed = flips
        self._steps = {}
        print(f"[warp-ky] {overflow} window overflows: growing "
              f"warp_ky {old} -> {ky} (re-tracing)", flush=True)

    def _base_transform(self, fn):
        self.state = dataclasses.replace(self.state, base=fn(self.state.base))


def make_fisheye_eval_fn(trainer: "CalibTrainer"):
    """Held-out evaluation for fisheye mode (training_report's distortion
    branch, train.py:569-607): render at the extended FoV, warp through the
    current lens field, compare against the fisheye GT."""
    setup = trainer.setup
    rcfg = dataclasses.replace(trainer.rcfg,
                               sh_degree=trainer.max_sh_degree)
    static = setup.render_static
    apply2gt = trainer.cfg.calib.apply2gt

    hybrid = trainer.cfg.calib.hybrid

    @jax.jit
    def eval_one(state: CalibState, cam, fish_gt):
        b = state.base
        g = b.g
        extra = None
        if hybrid:
            from ..calib.specular import specular_extra_color
            extra = specular_extra_color(b.spec, g.xyz, g.asg, cam, b.align)
        out = render(g.xyz, g.scaling(), g.quats, g.opacity(b.alive),
                     g.sh_coeffs(), cam, static, rcfg, bg=jnp.zeros(3),
                     extra_color=extra)
        proj_scale = jnp.stack([1.0 / jnp.tan(cam.fovx * 0.5),
                                1.0 / jnp.tan(cam.fovy * 0.5)])
        if not apply2gt:
            warped, mask, _ = dist_lib.apply_distortion(
                state.lens, trainer.p_view, setup.grid_hw, out.render,
                proj_scale, setup.flow_hw, final_hw=setup.fish_hw,
                apply2gt=False)
            return jnp.clip(warped, 0.0, 1.0), fish_gt * mask
        gt_warped, mask, _ = dist_lib.apply_distortion(
            state.lens, trainer.p_view, setup.grid_hw, fish_gt, proj_scale,
            setup.flow_hw, apply2gt=True)
        return jnp.clip(out.render * mask, 0.0, 1.0), gt_warped

    return eval_one


def make_cubemap_eval_fn(trainer: "CalibTrainer"):
    """Held-out evaluation for cubemap mode (training_report's cubemap
    branch, train.py:608-634): render the five faces through the cubemap
    distortion field, stitch them by per-pixel MAX INTENSITY, and compare
    against the circular-masked wide-FoV GT."""
    static = trainer.static
    cfg = trainer.cfg
    rcfg = dataclasses.replace(trainer.rcfg,
                               sh_degree=trainer.max_sh_degree,
                               sort_by_distance=True)
    focal_x, focal_y = trainer.focal
    K = np.array([[focal_x, 0, static.width / 2],
                  [0, focal_y, static.height / 2], [0, 0, 1.0]])
    mask90 = cubemap_lib.fov90_square_mask(static.height, static.width,
                                           focal_x, focal_y)
    circ = cubemap_lib.circular_mask(static.height, static.width,
                                     cfg.calib.mask_radius)
    scale = int(cfg.calib.control_point_sample_scale)

    hybrid = cfg.calib.hybrid

    @jax.jit
    def eval_one(state: CalibState, cam, gt, sub_q, sub_t):
        b = state.base
        g = b.g
        extra = None
        if hybrid:
            from ..calib.specular import specular_extra_color
            extra = specular_extra_color(b.spec, g.xyz, g.asg, cam, b.align)

        def one_render(c):
            return render(g.xyz, g.scaling(), g.quats, g.opacity(b.alive),
                          g.sh_coeffs(), c, static, rcfg,
                          bg=jnp.zeros(3), align=b.align,
                          extra_color=extra).render

        face_renders = [one_render(cam)]
        for f in range(4):
            sub_cam = dataclasses.replace(cam, q_init=sub_q[f],
                                          t_init=sub_t[f])
            face_renders.append(one_render(sub_cam))

        faces, _ = cubemap_lib.render_cubemap_faces(
            lambda i: face_renders[i], state.cubemap_net, K, static.width,
            static.height, scale, mask90)
        half_masks = [jnp.ones_like(circ)] + [
            cubemap_lib.mask_half(jnp.ones_like(circ), f)
            for f in ("up", "down", "left", "right")]

        # max-intensity stitch (train.py:617-624)
        final = jnp.zeros_like(faces[0])
        intensity = jnp.sum(final, axis=0, keepdims=True)
        for img, hm in zip(faces, half_masks):
            masked = img * hm
            inten = jnp.sum(masked, axis=0, keepdims=True)
            sel = inten > intensity
            final = jnp.where(sel, masked, final)
            intensity = jnp.where(sel, inten, intensity)

        return jnp.clip(final * circ, 0.0, 1.0), gt * circ

    return eval_one
