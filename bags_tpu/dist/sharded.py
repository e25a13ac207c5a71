"""Tile-parallel sharded render + train step via shard_map.

Forward (per device, under `shard_map` over mesh axis 'tile'):
  1. project the LOCAL Gaussian shard (C/D Gaussians): EWA + SH — the
     FLOP-heavy per-Gaussian work is fully sharded;
  2. `all_gather` the projected packets (mean2d/conic/color/opacity/depth/
     radius: 10 floats per Gaussian) along 'tile';
  3. bin + depth-sort instances for the LOCAL slab of image tile rows only;
  4. composite the local tiles (Pallas or jnp backend) -> local image slab;
  5. `all_gather` slabs for the replicated photometric loss.

Backward is the shard_map transpose: slab cotangents scatter back, the
packet all-gather transposes to a reduce-scatter of per-Gaussian grads onto
the owning shard, and pose/intrinsics grads psum — the TPU-native analogue
of the CUDA rasterizer's atomic accumulations, with collectives XLA can
overlap with compute.

Constraint: the tile-row count must divide evenly by the mesh size (pad the
image height to D*16 multiples).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.camera import CameraParams, CameraStatic, GlobalAlignment
from ..core.projection import Projected, project_gaussians
from ..model.gaussians import Gaussians
from ..raster import RenderConfig
from ..raster import binning, tiles
from ..train.losses import photometric_loss


def sharded_render_loss(mesh: Mesh, static: CameraStatic, rcfg: RenderConfig,
                        lambda_dssim: float = 0.2):
    """Returns loss_fn(g, alive, cam, align, probe_inst, gt) -> (loss, aux),
    differentiable, executing tile-parallel over `mesh`.

    probe_inst: (D * m_aligned_local, 2) zeros — per-instance screen probe,
    sharded; aux contains the (C,) psum'd densification stat channels.
    """
    axis = mesh.axis_names[0]
    d = mesh.devices.size
    tiles_x, tiles_y = binning.tile_grid(static.width, static.height)
    assert tiles_y % d == 0, (
        f"tile rows {tiles_y} must divide mesh size {d}; pad image height")
    tiles_y_local = tiles_y // d
    local_max_inst = rcfg.max_instances // d
    m_aligned_local = binning.aligned_capacity(local_max_inst,
                                               tiles_x * tiles_y_local)

    def device_fn(xyz, scales_log, quats, opacity_raw, sh_dc, sh_rest,
                  alive, cam, align, probe_inst, gt_slab, bg):
        # 1. project the local Gaussian shard
        g_local = Gaussians(xyz=xyz, sh_dc=sh_dc, sh_rest=sh_rest,
                            scales_log=scales_log, quats=quats,
                            opacity_raw=opacity_raw)
        proj = project_gaussians(
            xyz, g_local.scaling(), quats, g_local.opacity(alive),
            g_local.sh_coeffs(), cam, static, rcfg.sh_degree,
            align=align, scale_modifier=rcfg.scale_modifier)

        # 2. all-gather projected packets
        def ag(x):
            return jax.lax.all_gather(x, axis, axis=0, tiled=True)

        full = Projected(
            mean2d=ag(proj.mean2d), depth=ag(proj.depth), conic=ag(proj.conic),
            radius=ag(proj.radius), color=ag(proj.color),
            opacity=ag(proj.opacity))

        # 3. bin for the local slab: shift into the slab's pixel frame
        dev = jax.lax.axis_index(axis)
        y0_px = dev * tiles_y_local * binning.TILE
        local_mean2d = full.mean2d - jnp.array([0.0, 1.0]) * y0_px
        local_proj = dataclasses.replace(
            full, mean2d=jax.lax.stop_gradient(local_mean2d))
        bins = binning.bin_gaussians(local_proj, tiles_x, tiles_y_local,
                                     local_max_inst)

        n = full.mean2d.shape[0]
        gid = jnp.minimum(bins.gauss_id, n - 1)
        inst_valid = bins.gauss_id < n
        table = jnp.concatenate(
            [local_mean2d, full.conic, full.color, full.opacity[:, None],
             full.depth[:, None], jnp.zeros((n, 2), local_mean2d.dtype)],
            axis=1)
        rows = jnp.take(table, gid, axis=0)
        rows = rows * inst_valid[:, None].astype(rows.dtype)
        rows = rows + jnp.pad(probe_inst, ((0, 0), (0, 10)))

        # 4. composite local tiles
        if rcfg.backend == "pallas" or (
                rcfg.backend == "auto" and jax.default_backend() == "tpu"):
            from ..raster.pallas_raster import composite_tiles_pallas
            tile_img = composite_tiles_pallas(
                rows, bins.tile_start, bins.tile_count, tiles_x,
                tiles_y_local, bg)
        else:
            tile_img = tiles.composite_tiles_jnp(
                rows[:, 0:2], rows[:, 2:5], rows[:, 5:8], rows[:, 8],
                rows[:, 9], bins.tile_start, bins.tile_count, tiles_x,
                tiles_y_local, bg, max_per_tile=rcfg.max_per_tile)

        slab = tiles.tiles_to_image(tile_img.color, tiles_x, tiles_y_local,
                                    static.width, tiles_y_local * binning.TILE)

        # 5. replicated loss over the gathered image
        full_img = jax.lax.all_gather(slab, axis, axis=1, tiled=True)
        full_img = full_img[:, :static.height, :]
        full_gt = jax.lax.all_gather(gt_slab, axis, axis=1, tiled=True)
        full_gt = full_gt[:, :static.height, :]
        loss = photometric_loss(full_img, full_gt, lambda_dssim)

        # full.radius is identical on every device (all-gathered), so the
        # visibility/radii stats replicate for free.
        aux = dict(image=full_img, radii=full.radius,
                   n_dropped=jax.lax.psum(bins.n_dropped, axis),
                   gauss_id=gid, inst_valid=inst_valid)
        return loss, aux

    in_specs = (
        P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),  # g fields
        P(axis),                                               # alive
        P(), P(),                                              # cam, align
        P(axis),                                               # probe_inst
        P(None, axis, None),                                   # gt slab
        P(),                                                   # bg
    )
    out_specs = (P(), dict(image=P(), radii=P(),
                           n_dropped=P(), gauss_id=P(axis),
                           inst_valid=P(axis)))

    fn = shard_map(device_fn, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)

    def loss_fn(g: Gaussians, alive, cam: CameraParams,
                align: GlobalAlignment, probe_inst, gt, bg):
        return fn(g.xyz, g.scales_log, g.quats, g.opacity_raw,
                  g.sh_dc, g.sh_rest, alive, cam, align, probe_inst, gt, bg)

    return loss_fn, m_aligned_local * d


def make_sharded_train_step(mesh: Mesh, static: CameraStatic,
                            rcfg: RenderConfig, cfg, g_tx, sh_degree: int):
    """Full sharded train step: loss + grads for Gaussians (sharded), camera
    pose/intrinsics and alignment (replicated), plus optimizer updates."""
    import optax

    from ..model.densify import update_stats
    from ..train.loop import TrainState, row_adam_update

    rcfg = dataclasses.replace(rcfg, sh_degree=sh_degree)
    loss_fn, probe_len = sharded_render_loss(mesh, static, rcfg,
                                             cfg.opt.lambda_dssim)

    @jax.jit
    def step(state: TrainState, gt, cam_idx, bg):
        cam_i = jax.tree_util.tree_map(lambda x: x[cam_idx], state.cams)
        probe = jnp.zeros((probe_len, 2), jnp.float32)

        def wrapped(g, cam, align, probe_inst):
            loss, aux = loss_fn(g, state.alive, cam, align, probe_inst, gt, bg)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(
            wrapped, argnums=(0, 1, 2, 3), has_aux=True)(
                state.g, cam_i, state.align, probe)
        g_grads, cam_grads, _, probe_grads = grads

        updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g)
        new_g = optax.apply_updates(state.g, updates)
        new_cams, cam_opt = row_adam_update(
            state.cams, state.cam_opt, cam_grads, cam_idx, cfg.calib,
            state.step)

        n = state.g.capacity
        signed = jax.ops.segment_sum(probe_grads, aux["gauss_id"],
                                     num_segments=n + 1)[:n]
        abs_ = jax.ops.segment_sum(jnp.abs(probe_grads), aux["gauss_id"],
                                   num_segments=n + 1)[:n]
        stats = update_stats(state.stats, signed, abs_, aux["radii"],
                             aux["radii"] > 0)

        new_state = dataclasses.replace(
            state, g=new_g, g_opt=g_opt, cams=new_cams, cam_opt=cam_opt,
            stats=stats, step=state.step + 1)
        return new_state, loss

    return step
