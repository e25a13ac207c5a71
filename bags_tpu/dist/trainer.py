"""ShardedTrainer: the full training loop over a device mesh.

New scope vs the reference (SURVEY.md §2.2: the reference is strictly
single-GPU); this is the BASELINE.json north-star stack:

  * the per-iteration train step runs tile-parallel under `shard_map`
    (dist/sharded.py): Gaussian fields + Adam moments sharded over the
    'tile' axis, projected packets all-gathered, each device compositing its
    own slab of image tile rows; backward reduce-scatters Gaussian grads and
    psums camera/alignment grads.
  * densify / opacity reset / MCMC relocation reuse the SAME jitted
    single-chip functions — their inputs carry NamedShardings, so GSPMD
    partitions the masked scatters and inserts collectives for the global
    pairing argsorts. Capacity slots are statically bound to shards, so the
    population stays balanced across devices by construction (new Gaussians
    land in dead slots wherever they are; per-slot compute is
    shard-uniform).
  * multi-host: call `bags_tpu.dist.init_distributed()` (a guarded
    `jax.distributed.initialize`) before constructing the trainer; the mesh
    then spans all processes' devices and every collective rides ICI/DCN.

Image heights that don't divide into D * TILE_H-pixel tile rows: the tile grid
is padded inside the sharded loss (projection keeps the true height so the
camera framing is unchanged); the ground truth is zero-padded here purely
for equal-slab sharding and the loss slices back to the true height.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.camera import CameraStatic
from ..raster import RenderConfig
from ..raster.binning import TILE_H
from ..train.config import TrainConfig
from ..train.loop import Trainer
from .mesh import make_mesh
from .sharded import make_sharded_train_step


def init_distributed(**kwargs) -> bool:
    """Multi-host initialization (`jax.distributed.initialize`). Reads the
    standard coordinator env (JAX_COORDINATOR_ADDRESS etc.) or explicit
    kwargs; no-op when already initialized or single-process.

    MUST run before any JAX call that initializes the XLA backend (even
    `jax.process_count()` does) — train.py calls it first thing in main()
    when --mesh is set, before the Scene builds any device array."""
    import os

    if jax.distributed.is_initialized():
        return True
    addr = kwargs.get("coordinator_address") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if not addr and not kwargs:
        return False
    jax.distributed.initialize(**kwargs)
    return True


class ShardedTrainer(Trainer):
    """Drop-in Trainer over a `Mesh` (use `--mesh N` in train.py)."""

    def __init__(self, g, alive, cams, static: CameraStatic,
                 cfg: TrainConfig, scene_extent: float, gt_images,
                 bg=None, rcfg: Optional[RenderConfig] = None,
                 seed: int = 0, mesh=None, n_devices: Optional[int] = None):
        self.mesh = mesh or make_mesh(n_devices)
        d = self.mesh.devices.size
        from .mesh import padded_height
        self.pad_height = padded_height(static.height, d, TILE_H)
        super().__init__(g, alive, cams, static, cfg, scene_extent,
                         gt_images, bg=bg, rcfg=rcfg, seed=seed)
        self._shard_state()

    # -- sharding ----------------------------------------------------------

    def _shardings_for(self, state):
        cap = state.g.capacity
        gs = NamedSharding(self.mesh, P("tile"))
        rep = NamedSharding(self.mesh, P())

        def pick(leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 \
                    and leaf.shape[0] == cap:
                return gs
            return rep

        def rep_tree(sub):
            return jax.tree_util.tree_map(lambda _: rep, sub)

        sh = jax.tree_util.tree_map(pick, state)
        # Specular MLP params/opt are small replicated tensors whose leading
        # dim can coincidentally equal a small test capacity — pin them (and
        # the camera rows) replicated explicitly.
        import dataclasses as _dc
        return _dc.replace(sh, cams=rep_tree(state.cams),
                           cam_opt=rep_tree(state.cam_opt),
                           spec=rep_tree(state.spec),
                           spec_opt=rep_tree(state.spec_opt))

    def _shard_state(self):
        self.state = jax.device_put(self.state,
                                    self._shardings_for(self.state))
        self._gt_sharding = NamedSharding(self.mesh, P(None, "tile", None))

    def _pad_gt(self, gt):
        """Zero-pad the GT to the mesh-divisible height and lay it out
        row-sharded. Built per-shard (`make_array_from_callback`): in a
        multi-host mesh each host materializes ONLY its devices' row slabs —
        the host-sharded data feed (no full-image broadcast over DCN)."""
        if jax.process_count() == 1:
            # single-host: keep the GT on device (np.asarray would force a
            # device->host round trip when gt is already a device array)
            gt = jnp.asarray(gt)
            if gt.shape[1] != self.pad_height:
                gt = jnp.pad(gt, ((0, 0),
                                  (0, self.pad_height - gt.shape[1]),
                                  (0, 0)))
            return jax.device_put(gt, self._gt_sharding)
        gt = np.asarray(gt)
        c, h, w = gt.shape
        shape = (c, self.pad_height, w)

        def shard(idx):
            rows = np.zeros((c, len(range(*idx[1].indices(self.pad_height))),
                             w), np.float32)
            r0, r1, _ = idx[1].indices(self.pad_height)
            real = max(0, min(r1, h) - r0)
            if real > 0:
                rows[:, :real] = gt[:, r0:r0 + real]
            return rows

        return jax.make_array_from_callback(shape, self._gt_sharding, shard)

    # -- step dispatch -------------------------------------------------------

    def _train_step_fn(self):
        dkey = self.active_sh_degree
        if dkey not in self._steps:
            self._steps[dkey] = make_sharded_train_step(
                self.mesh, self.static, self.rcfg, self.cfg, self.g_tx,
                sh_degree=dkey, align_tx=self.align_tx,
                spec_tx=self.spec_tx)
        return self._steps[dkey]

    def _invoke_step(self, it: int, idx, gt):
        from ..train.loop import StepMetrics

        if self.cfg.opt.batch_cams > 1:
            # gt arrives (K, 3, H, W) from Trainer.run — pad + shard each
            # view's rows, keeping the K axis replicated.
            gt = jnp.stack([jnp.pad(
                g, ((0, 0), (0, self.pad_height - g.shape[1]), (0, 0)))
                for g in gt])
            gt = jax.device_put(
                gt, NamedSharding(self.mesh, P(None, None, "tile", None)))
        else:
            gt = self._pad_gt(gt)
        self.state, (loss, n_dropped) = self._train_step_fn()(
            self.state, gt, jnp.asarray(idx), self.bg)
        return StepMetrics(loss=loss, l1=loss,
                           n_alive=jnp.sum(self.state.alive),
                           n_dropped=n_dropped)

    def _base_transform(self, fn) -> None:
        # densify/opacity-reset/MCMC run via GSPMD on the sharded state;
        # re-pin the canonical shardings afterwards (XLA may propagate a
        # different layout through the pairing argsorts).
        self.state = fn(self.state)
        self._shard_state()


class ShardedCalibTrainer(ShardedTrainer):
    """Calibrated training over a device mesh, both modes (dist/calib.py):

    * fisheye (--outside_rasterizer): tile-slab sharded render + row-sharded
      lens warp and halo loss. apply-to-render pays one image all-gather;
      --apply2gt pays none (the GT is warped row-locally).
    * cubemap (--cubemap): five tile-slab sharded face renders, one
      all-gather per face, row-sharded warp + per-face halo losses.

    Mirrors `CalibTrainer` — same CalibState, same optimizer schedules, same
    iResNet pre-fit — so checkpoints interchange with single-chip runs."""

    def __init__(self, g, alive, cams, static: CameraStatic,
                 cfg: TrainConfig, scene_extent: float, gt_images,
                 focal_x, focal_y, persp_wh, fish_wh=None, source_path="",
                 bg=None, rcfg: Optional[RenderConfig] = None,
                 seed: int = 0, mesh=None, n_devices: Optional[int] = None,
                 fish_images=None):
        import dataclasses

        from ..train.calibrated import (build_sub_cameras,
                                        fisheye_control_points,
                                        init_calib_state,
                                        make_fisheye_setup)

        calib = cfg.calib
        if cfg.opt.batch_cams > 1:
            raise ValueError("--batch_cams > 1 is not supported with the "
                             "sharded fisheye/cubemap calibrated modes")
        self.mode = "cubemap" if calib.cubemap else "fisheye"
        self.focal = (float(focal_x), float(focal_y))
        fish_wh = fish_wh or persp_wh
        if self.mode == "fisheye":
            self.setup = make_fisheye_setup(
                focal_x, focal_y, persp_wh, fish_wh,
                flow_scale=calib.flow_scale,
                render_resolution=calib.render_resolution,
                control_point_sample_scale=int(
                    calib.control_point_sample_scale),
                apply2gt=calib.apply2gt)
            static = self.setup.render_static
            import jax.numpy as _jnp
            cams = dataclasses.replace(
                cams,
                fovx=_jnp.full_like(cams.fovx, self.setup.fovx),
                fovy=_jnp.full_like(cams.fovy, self.setup.fovy))
            self.p_view = fisheye_control_points(
                self.setup, focal_x, focal_y, calib.flow_scale)

        super().__init__(g, alive, cams, static, cfg, scene_extent,
                         gt_images, bg=bg, rcfg=rcfg, seed=seed, mesh=mesh,
                         n_devices=n_devices)
        self.fish_images = fish_images or gt_images
        d = self.mesh.devices.size
        if self.mode == "fisheye":
            fh, fw = self.setup.fish_hw
            self._fish_pad = -(-fh // d) * d

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
            import jax.numpy as _jnp
            subs = build_sub_cameras(self.state.base.cams)
            self.sub_q = _jnp.stack([s.q_init for s in subs[:4]], axis=1)
            self.sub_t = _jnp.stack([s.t_init for s in subs[:4]], axis=1)

        self.cubemap_warp_ky = 0
        if calib.banded_warp and self.rcfg.precision == "fast":
            from ..train.calibrated import (WARP_BAND,
                                            measure_cubemap_warp_ky,
                                            measure_warp_ky)
            if self.mode == "fisheye":
                ky = measure_warp_ky(self.state.lens, self.p_view,
                                     self.setup, calib.apply2gt)
                self.setup = dataclasses.replace(self.setup, warp_ky=ky)
            else:
                ky = measure_cubemap_warp_ky(
                    self.state.cubemap_net, *self.focal, self.static,
                    int(calib.control_point_sample_scale))
                self.cubemap_warp_ky = ky
            print(f"banded lens warp (sharded): ky={ky} "
                  f"(band={WARP_BAND})", flush=True)
        self._shard_state()

    # -- sharding ----------------------------------------------------------

    def _shardings_for(self, state):
        from ..train.calibrated import CalibState

        if not isinstance(state, CalibState):
            return super()._shardings_for(state)
        import dataclasses as _dc

        rep = NamedSharding(self.mesh, P())

        def rep_tree(sub):
            return jax.tree_util.tree_map(lambda _: rep, sub)

        base_sh = super()._shardings_for(state.base)
        return CalibState(
            base=base_sh,
            lens=rep_tree(state.lens), lens_opt=rep_tree(state.lens_opt),
            cubemap_net=rep_tree(state.cubemap_net),
            cubemap_opt=rep_tree(state.cubemap_opt),
            vig=rep_tree(state.vig), vig_opt=rep_tree(state.vig_opt),
            shift=rep_tree(state.shift),
            shift_opt=rep_tree(state.shift_opt))

    def _pad_fish_gt(self, gt):
        gt = jnp.asarray(gt)
        if self.cfg.calib.apply2gt:
            # apply2gt warps the GT row-locally from arbitrary positions:
            # it enters the step REPLICATED, unpadded (dist/calib.py).
            return jax.device_put(gt, NamedSharding(self.mesh, P()))
        if gt.shape[1] != self._fish_pad:
            gt = jnp.pad(gt, ((0, 0), (0, self._fish_pad - gt.shape[1]),
                              (0, 0)))
        return jax.device_put(gt, self._gt_sharding)

    # -- step dispatch -------------------------------------------------------

    def _calib_step_fn(self, it: int):
        from .calib import make_sharded_cubemap_step, make_sharded_fisheye_step

        calib = self.cfg.calib
        if self.mode == "cubemap":
            key = (self.active_sh_degree, "sharded-cubemap")
            if key not in self._steps:
                self._steps[key] = make_sharded_cubemap_step(
                    self.mesh, self.static, self.rcfg, self.cfg, self.g_tx,
                    self.txs, self.active_sh_degree, *self.focal,
                    spec_tx=self.spec_tx, warp_ky=self.cubemap_warp_ky)
            return self._steps[key]
        opt_lens = (calib.opt_distortion
                    and calib.iresnet_opt_duration[0] <= it
                    < calib.iresnet_opt_duration[1]
                    and it >= calib.start_opt_lens)
        use_vig = it > calib.start_vignetting
        key = (self.active_sh_degree, "sharded-fisheye", opt_lens, use_vig)
        if key not in self._steps:
            self._steps[key] = make_sharded_fisheye_step(
                self.mesh, self.setup, self.rcfg, self.cfg, self.g_tx,
                self.txs, self.active_sh_degree, opt_lens, use_vig)
        return self._steps[key]

    def _train_step_fn(self):
        raise RuntimeError("ShardedCalibTrainer uses _calib_step_fn")

    def _invoke_step(self, it, idx, gt):
        from ..train.loop import StepMetrics

        if self.mode == "cubemap":
            gt = self._pad_gt(gt)
            self.state, (loss, n_drop, wover) = self._calib_step_fn(it)(
                self.state, gt, jnp.asarray(idx), self.bg, self.sub_q[idx],
                self.sub_t[idx])
            b = self.state.base
            return StepMetrics(loss=loss, l1=loss,
                               n_alive=jnp.sum(b.alive),
                               n_dropped=n_drop, warp_overflow=wover)
        gt_img = self.fish_images(idx) if callable(self.fish_images) \
            else self.fish_images[idx]
        gt_img = self._pad_fish_gt(gt_img)
        self.state, (loss, n_drop, wover) = self._calib_step_fn(it)(
            self.state, gt_img, self.p_view, jnp.asarray(idx), self.bg)
        b = self.state.base
        return StepMetrics(loss=loss, l1=loss,
                           n_alive=jnp.sum(b.alive),
                           n_dropped=n_drop, warp_overflow=wover)

    def _grow_warp_ky(self, overflow: int) -> None:
        """Banded-warp window ladder (see CalibTrainer._grow_warp_ky)."""
        import dataclasses

        from ..train.calibrated import (measure_cubemap_warp_ky,
                                        measure_warp_ky)

        if self.mode == "fisheye":
            old = self.setup.warp_ky
            ky = max(measure_warp_ky(self.state.lens, self.p_view,
                                     self.setup, self.cfg.calib.apply2gt),
                     old + 32)
            self.setup = dataclasses.replace(self.setup, warp_ky=ky)
        else:
            old = self.cubemap_warp_ky
            ky = max(measure_cubemap_warp_ky(
                self.state.cubemap_net, *self.focal, self.static,
                int(self.cfg.calib.control_point_sample_scale)), old + 32)
            self.cubemap_warp_ky = ky
        self._steps = {}
        print(f"[warp-ky] {overflow} window overflows: growing "
              f"warp_ky {old} -> {ky} (re-tracing)", flush=True)

    def _base_transform(self, fn) -> None:
        import dataclasses

        self.state = dataclasses.replace(self.state,
                                         base=fn(self.state.base))
        self._shard_state()
