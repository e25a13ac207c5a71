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

Image heights that don't divide into D * 16-pixel tile rows: the tile grid
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
from ..raster.binning import TILE
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
        if cfg.opt.batch_cams > 1:
            raise ValueError("--batch_cams > 1 is not supported with --mesh "
                             "(the sharded step is single-view)")
        self.mesh = mesh or make_mesh(n_devices)
        d = self.mesh.devices.size
        from .mesh import padded_height
        self.pad_height = padded_height(static.height, d, TILE)
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

    def _invoke_step(self, it: int, idx: int, gt):
        from ..train.loop import StepMetrics

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
