"""Tile-parallel sharded render + train step via shard_map.

Forward (per device, under `shard_map` over mesh axis 'tile'):
  1. project the LOCAL Gaussian shard (C/D Gaussians): EWA + SH — the
     FLOP-heavy per-Gaussian work is fully sharded (structure-of-arrays, so
     the all-gather moves exactly 11 floats per Gaussian);
  2. `all_gather` the projected packets along 'tile';
  3. bin + depth-sort instances for the LOCAL slab of image tile rows only;
  4. composite the local tiles (Pallas or jnp backend) -> local image slab;
  5. `all_gather` slabs for the replicated photometric loss.

Backward is the shard_map transpose: slab cotangents scatter back, the
packet all-gather transposes to a reduce-scatter of per-Gaussian grads onto
the owning shard, and pose/intrinsics/alignment grads psum — the TPU-native
analogue of the CUDA rasterizer's atomic accumulations, with collectives XLA
can overlap with compute. The densification stat channels ride the same
probe mechanism as the single-chip path (render.py): `probe2d` and
`abs_probe` enter replicated, so their cotangents are psum'd across the
slab shards automatically by the transpose.

The tile-row grid is padded internally to a mesh-size multiple; projection
keeps the true image height (see `sharded_render_loss`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.camera import CameraParams, CameraStatic, GlobalAlignment
from ..core.projection import project_gaussians
from ..model.gaussians import Gaussians
from ..raster import RenderConfig
from ..raster import binning, tiles
from ..raster.render import gather_rows
from ..train.losses import _blur, _gaussian_window


def _halo_slab_loss(pred, gt, axis, y0_px, true_height, lambda_dssim):
    """Photometric loss computed SLAB-LOCALLY with a 5-pixel halo exchange.

    The SSIM window only needs window//2 = 5 rows of context, so instead of
    all-gathering the full image + GT to every device (O(H*W) ICI bytes per
    device per step, D-times redundant SSIM compute), each device exchanges
    5-row halos with its two slab neighbors (two ppermutes of (6, 5, W) ~
    O(W) bytes) and psums three scalars. Identical math to
    `photometric_loss(full_img[:true_height], full_gt[:true_height])`: rows
    past the true image height are zeroed (matching the sliced image's zero
    'SAME' padding), boundary devices receive zero halos from ppermute
    (matching the global zero padding), and only valid-row pixels enter the
    sums. Summation order differs (per-slab partials), so parity vs the
    replicated loss is exact to f32 reduction order.
    """
    d = jax.lax.axis_size(axis)
    h_local, width = pred.shape[1], pred.shape[2]
    halo = 5  # window_size // 2
    rows = y0_px + jax.lax.broadcasted_iota(jnp.float32, (h_local, 1), 0)
    valid = rows[None, :, :] < true_height            # (1, Hl, 1)
    pred = jnp.where(valid, pred, 0.0)
    gt = jnp.where(valid, gt, 0.0)

    both = jnp.concatenate([pred, gt], axis=0)        # (6, Hl, W)
    up = [(i, i + 1) for i in range(d - 1)]           # my bottom -> i+1's top
    dn = [(i + 1, i) for i in range(d - 1)]           # my top -> i-1's bottom
    top_halo = jax.lax.ppermute(both[:, -halo:], axis, up)
    bot_halo = jax.lax.ppermute(both[:, :halo], axis, dn)
    ext = jnp.concatenate([top_halo, both, bot_halo], axis=1)

    window = jnp.asarray(_gaussian_window(11))
    p_e, g_e = ext[:3], ext[3:]
    stacked = jnp.concatenate(
        [p_e, g_e, p_e * p_e, g_e * g_e, p_e * g_e], axis=0)
    b = _blur(stacked, window)[:, halo:-halo]         # center Hl rows
    c = 3
    mu1, mu2 = b[:c], b[c:2 * c]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = b[2 * c:3 * c] - mu1_sq
    sigma2_sq = b[3 * c:4 * c] - mu2_sq
    sigma12 = b[4 * c:5 * c] - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / \
        ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    ssim_sum = jnp.sum(jnp.where(valid, ssim_map, 0.0))
    l1_sum = jnp.sum(jnp.abs(pred - gt))              # padded rows are 0-0
    denom = 3.0 * true_height * width
    l1 = jax.lax.psum(l1_sum, axis) / denom
    ssim_mean = jax.lax.psum(ssim_sum, axis) / denom
    return (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim_mean)


def _tiles_y_local(static: CameraStatic, d: int) -> int:
    _, tiles_y0 = binning.tile_grid(static.width, static.height)
    return (-(-tiles_y0 // d) * d) // d


def _make_device_render(axis: str, static: CameraStatic, rcfg: RenderConfig,
                        d: int, hybrid: bool, shift_enabled: bool = False):
    """Per-device tile-slab render closure shared by the vanilla and
    fisheye sharded steps (module docstring steps 1-4). Returns
    (slab, gathered_projection, bins, y0_px)."""
    tiles_x, _ = binning.tile_grid(static.width, static.height)
    tiles_y_local = _tiles_y_local(static, d)
    local_max_inst = -(-(rcfg.max_instances // d) // binning.CHUNK) \
        * binning.CHUNK

    def render_slab(xyz, scales_log, quats, opacity_raw, sh_dc, sh_rest,
                    asg, alive, cam, align, probe2d, abs_probe, spec, bg,
                    shift=None):
        # 1. project the local Gaussian shard
        g_local = Gaussians(xyz=xyz, sh_dc=sh_dc, sh_rest=sh_rest,
                            scales_log=scales_log, quats=quats,
                            opacity_raw=opacity_raw)
        extra = None
        if hybrid:
            from ..calib.specular import specular_extra_color

            extra = specular_extra_color(spec, xyz, asg, cam, align)
        proj = project_gaussians(
            xyz, g_local.scaling(), quats, g_local.opacity(alive),
            g_local.sh_coeffs(), cam, static, rcfg.sh_degree,
            align=align, scale_modifier=rcfg.scale_modifier,
            extra_color=extra,
            shift_factors=shift if shift_enabled else None)

        # 2. all-gather projected packets (SoA: one (C,) vector per field)
        full = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True), proj)

        # 3. bin for the local slab: shift into the slab's pixel frame
        dev = jax.lax.axis_index(axis)
        y0_px = (dev * tiles_y_local * binning.TILE_H).astype(jnp.float32)
        x2d = full.x2d + probe2d[:, 0]
        y2d = full.y2d - y0_px + probe2d[:, 1]
        bins = binning.bin_gaussians(
            jax.lax.stop_gradient(
                dataclasses.replace(full, x2d=x2d, y2d=y2d)),
            tiles_x, tiles_y_local, local_max_inst)

        from ..raster.render import build_packet_table

        table = build_packet_table(full, x2d, y2d)
        rows = gather_rows(table, abs_probe, bins)  # (FEATS, M_aligned)

        # 4. composite local tiles
        if rcfg.backend == "pallas" or (
                rcfg.backend == "auto" and jax.default_backend() == "tpu"):
            from ..raster.pallas_raster import composite_tiles_pallas
            tile_img = composite_tiles_pallas(
                rows, bins.tile_start, bins.tile_count, tiles_x,
                tiles_y_local, bg, fast=(rcfg.precision == "fast"))
        else:
            tile_img = tiles.composite_tiles_jnp(
                jnp.transpose(rows[0:2]), jnp.transpose(rows[2:5]),
                jnp.transpose(rows[6:9]), rows[5], rows[9],
                bins.tile_start, bins.tile_count, tiles_x,
                tiles_y_local, bg, max_per_tile=rcfg.max_per_tile)

        slab = tiles.tiles_to_image(
            tile_img.color, tiles_x, tiles_y_local,
            static.width, tiles_y_local * binning.TILE_H)
        return slab, full, bins, y0_px

    return render_slab


def sharded_render_loss(mesh: Mesh, static: CameraStatic, rcfg: RenderConfig,
                        lambda_dssim: float = 0.2, hybrid: bool = False,
                        return_image: bool = True):
    """Returns loss_fn(g, alive, cam, align, probe2d, abs_probe, spec, gt,
    bg) -> (loss, aux), differentiable, executing tile-parallel over `mesh`.

    hybrid: per-Gaussian ASG specular color — `g.asg` is sharded with the
    other Gaussian fields, the specular MLP params replicate, and the extra
    color is computed on the owning shard BEFORE the packet all-gather (it
    folds into the per-Gaussian color rows, so it moves zero extra bytes).

    probe2d / abs_probe: (C, 2) zeros — the signed / abs densification
    gradient channels (see render.py docstring); their gradients are the
    psum'd per-Gaussian screen-gradient stats.

    The tile-row grid is padded up to a multiple of the mesh size so every
    device owns an equal slab; PROJECTION uses the true image height (the
    ndc->pixel mapping must not change), padded rows render empty, and the
    loss is sliced back to the true height after the slab all-gather. `gt`
    must arrive padded to padded_height(...) rows (see ShardedTrainer).
    """
    axis = mesh.axis_names[0]
    d = mesh.devices.size
    true_height = static.height
    tiles_y_local = _tiles_y_local(static, d)
    render_slab = _make_device_render(axis, static, rcfg, d, hybrid)

    def device_fn(xyz, scales_log, quats, opacity_raw, sh_dc, sh_rest,
                  asg, alive, cam, align, probe2d, abs_probe, spec,
                  gt_slab, bg):
        slab, full, bins, y0_px = render_slab(
            xyz, scales_log, quats, opacity_raw, sh_dc, sh_rest, asg,
            alive, cam, align, probe2d, abs_probe, spec, bg)

        # 5. slab-local loss with 5-px halo exchange + scalar psums — the
        # post-composite collective is O(W) per device instead of the old
        # O(H*W) full-image all-gather (VERDICT r2: sharded-loss comm).
        loss = _halo_slab_loss(slab, gt_slab, axis, y0_px, true_height,
                               lambda_dssim)

        # full.radius is identical on every device (all-gathered), so the
        # visibility/radii stats replicate for free.
        aux = dict(radii=full.radius,
                   n_dropped=jax.lax.psum(bins.n_dropped, axis))
        if return_image:
            # eval/GUI convenience only — the train step runs with
            # return_image=False so no full-image collective exists at all.
            full_img = jax.lax.all_gather(slab, axis, axis=1, tiled=True)
            aux["image"] = full_img[:, :true_height, :]
        return loss, aux

    in_specs = (
        P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),  # g fields
        P(axis) if hybrid else P(),                            # asg
        P(axis),                                               # alive
        P(), P(),                                              # cam, align
        P(), P(),                                              # probes
        P(),                                                   # spec params
        P(None, axis, None),                                   # gt slab
        P(),                                                   # bg
    )
    aux_specs = dict(radii=P(), n_dropped=P())
    if return_image:
        aux_specs["image"] = P()
    out_specs = (P(), aux_specs)

    fn = shard_map(device_fn, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)

    def loss_fn(g: Gaussians, alive, cam: CameraParams,
                align: GlobalAlignment, probe2d, abs_probe, gt, bg,
                spec=None):
        asg = g.asg if hybrid else jnp.zeros((), jnp.float32)
        return fn(g.xyz, g.scales_log, g.quats, g.opacity_raw,
                  g.sh_dc, g.sh_rest, asg, alive, cam, align, probe2d,
                  abs_probe, spec, gt, bg)

    return loss_fn


def make_sharded_train_step(mesh: Mesh, static: CameraStatic,
                            rcfg: RenderConfig, cfg, g_tx, sh_degree: int,
                            align_tx=None, spec_tx=None):
    """Full sharded train step: loss + grads for Gaussians (sharded), camera
    pose/intrinsics, global alignment and the specular MLP (replicated),
    plus optimizer updates and densification statistics."""
    import optax

    from ..model.densify import update_stats
    from ..train.loop import TrainState, row_adam_update

    hybrid = bool(getattr(cfg.calib, "hybrid", False))
    K = cfg.opt.batch_cams
    rcfg = dataclasses.replace(rcfg, sh_degree=sh_degree)
    loss_fn = sharded_render_loss(mesh, static, rcfg, cfg.opt.lambda_dssim,
                                  hybrid=hybrid, return_image=False)

    @jax.jit
    def step(state: TrainState, gt, cam_idx, bg):
        cam_i = jax.tree_util.tree_map(lambda x: x[cam_idx], state.cams)
        n_cap = state.g.capacity
        lead = (K,) if K > 1 else ()
        probe = jnp.zeros(lead + (n_cap, 2), jnp.float32)
        absp = jnp.zeros(lead + (n_cap, 2), jnp.float32)

        if K > 1:
            # K views per step: mean loss over K unrolled sharded renders
            # (vmap cannot map a shard_map'd Pallas grid; the unroll lets
            # XLA pipeline the K independent chains), per-view probes so
            # densify stats accumulate exactly like K single-view steps.
            def wrapped(g, cams_k, align, probes, absps, spec):
                total = 0.0
                radii, nd = [], 0
                for k in range(K):
                    cam_k = jax.tree_util.tree_map(lambda x: x[k], cams_k)
                    l_k, aux_k = loss_fn(g, state.alive, cam_k, align,
                                         probes[k], absps[k], gt[k], bg,
                                         spec=spec)
                    total = total + l_k
                    radii.append(aux_k["radii"])
                    nd = nd + aux_k["n_dropped"]
                return total / K, dict(radii=jnp.stack(radii),
                                       n_dropped=nd)
        else:
            def wrapped(g, cam, align, probe2d, abs_probe, spec):
                return loss_fn(g, state.alive, cam, align, probe2d,
                               abs_probe, gt, bg, spec=spec)

        argnums = (0, 1, 2, 3, 4, 5) if hybrid else (0, 1, 2, 3, 4)
        (loss, aux), grads = jax.value_and_grad(
            wrapped, argnums=argnums, has_aux=True)(
                state.g, cam_i, state.align, probe, absp, state.spec)
        g_grads, cam_grads, align_grads, signed_stat, abs_stat = grads[:5]

        updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g)
        new_g = optax.apply_updates(state.g, updates)
        new_cams, cam_opt = row_adam_update(
            state.cams, state.cam_opt, cam_grads, cam_idx, cfg.calib,
            state.step)

        if align_tx is not None and getattr(cfg.calib,
                                            "opt_global_alignment", False):
            a_upd, align_opt = align_tx.update(align_grads, state.align_opt,
                                               state.align)
            new_align = optax.apply_updates(state.align, a_upd)
        else:
            new_align, align_opt = state.align, state.align_opt

        if hybrid:
            s_upd, spec_opt = spec_tx.update(grads[5], state.spec_opt,
                                             state.spec)
            new_spec = optax.apply_updates(state.spec, s_upd)
        else:
            new_spec, spec_opt = state.spec, state.spec_opt

        if K > 1:
            # mean-over-views scales probe cotangents by 1/K; densify
            # thresholds are single-view reference magnitudes (loop.py).
            stats = state.stats
            for k in range(K):
                stats = update_stats(stats, signed_stat[k] * K,
                                     abs_stat[k] * K, aux["radii"][k],
                                     aux["radii"][k] > 0)
        else:
            stats = update_stats(state.stats, signed_stat, abs_stat,
                                 aux["radii"], aux["radii"] > 0)

        new_state = dataclasses.replace(
            state, g=new_g, g_opt=g_opt, cams=new_cams, cam_opt=cam_opt,
            align=new_align, align_opt=align_opt, stats=stats,
            spec=new_spec, spec_opt=spec_opt,
            step=state.step + 1)
        return new_state, (loss, aux["n_dropped"])

    return step
