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
from ..raster.render import FEATS, F_ACTIVE, gather_rows
from ..train.losses import photometric_loss


def sharded_render_loss(mesh: Mesh, static: CameraStatic, rcfg: RenderConfig,
                        lambda_dssim: float = 0.2, hybrid: bool = False):
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
    tiles_x, tiles_y0 = binning.tile_grid(static.width, static.height)
    tiles_y = -(-tiles_y0 // d) * d
    tiles_y_local = tiles_y // d
    local_max_inst = -(-(rcfg.max_instances // d) // binning.CHUNK) \
        * binning.CHUNK

    def device_fn(xyz, scales_log, quats, opacity_raw, sh_dc, sh_rest,
                  asg, alive, cam, align, probe2d, abs_probe, spec,
                  gt_slab, bg):
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
            extra_color=extra)

        # 2. all-gather projected packets (SoA: one (C,) vector per field)
        full = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True), proj)

        # 3. bin for the local slab: shift into the slab's pixel frame
        dev = jax.lax.axis_index(axis)
        y0_px = (dev * tiles_y_local * binning.TILE).astype(jnp.float32)
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
                tiles_y_local, bg)
        else:
            tile_img = tiles.composite_tiles_jnp(
                jnp.transpose(rows[0:2]), jnp.transpose(rows[2:5]),
                jnp.transpose(rows[6:9]), rows[5], rows[9],
                bins.tile_start, bins.tile_count, tiles_x,
                tiles_y_local, bg, max_per_tile=rcfg.max_per_tile)

        slab = tiles.tiles_to_image(tile_img.color, tiles_x, tiles_y_local,
                                    static.width, tiles_y_local * binning.TILE)

        # 5. replicated loss over the gathered image
        full_img = jax.lax.all_gather(slab, axis, axis=1, tiled=True)
        full_img = full_img[:, :true_height, :]
        full_gt = jax.lax.all_gather(gt_slab, axis, axis=1, tiled=True)
        full_gt = full_gt[:, :true_height, :]
        loss = photometric_loss(full_img, full_gt, lambda_dssim)

        # full.radius is identical on every device (all-gathered), so the
        # visibility/radii stats replicate for free.
        aux = dict(image=full_img, radii=full.radius,
                   n_dropped=jax.lax.psum(bins.n_dropped, axis))
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
    out_specs = (P(), dict(image=P(), radii=P(), n_dropped=P()))

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
    rcfg = dataclasses.replace(rcfg, sh_degree=sh_degree)
    loss_fn = sharded_render_loss(mesh, static, rcfg, cfg.opt.lambda_dssim,
                                  hybrid=hybrid)

    @jax.jit
    def step(state: TrainState, gt, cam_idx, bg):
        cam_i = jax.tree_util.tree_map(lambda x: x[cam_idx], state.cams)
        n_cap = state.g.capacity
        probe = jnp.zeros((n_cap, 2), jnp.float32)
        absp = jnp.zeros((n_cap, 2), jnp.float32)

        def wrapped(g, cam, align, probe2d, abs_probe, spec):
            return loss_fn(g, state.alive, cam, align, probe2d, abs_probe,
                           gt, bg, spec=spec)

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

        stats = update_stats(state.stats, signed_stat, abs_stat,
                             aux["radii"], aux["radii"] > 0)

        new_state = dataclasses.replace(
            state, g=new_g, g_opt=g_opt, cams=new_cams, cam_opt=cam_opt,
            align=new_align, align_opt=align_opt, stats=stats,
            spec=new_spec, spec_opt=spec_opt,
            step=state.step + 1)
        return new_state, (loss, aux["n_dropped"])

    return step
