"""Device-mesh construction and sharding rules.

The reference has NO distributed execution (SURVEY.md §2.2: single process,
single cuda:0, shell-level fan-out only). This layer is the new scope defined
by BASELINE.json's north star: shard image *tiles* and *Gaussians* across a
TPU mesh with gradient collectives overlapped with backward, replacing a
NCCL-style stack with `jax.sharding.Mesh` + `shard_map` over ICI.

Axis layout:
  'tile' — the single required axis. Gaussians are sharded over it for
  projection/SH (compute + memory), then projected packets are all-gathered
  (9 floats/Gaussian) so every device can bin/composite its own slab of
  image tile rows. Backward reverses this: the all-gather transposes to a
  reduce-scatter of per-Gaussian gradients onto the owning shard, and camera
  pose gradients psum — exactly the overlap-friendly pattern XLA's
  latency-hiding scheduler pipelines.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "tile") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"make_mesh({n}) but only {len(devs)} devices are visible; for a "
            f"virtual mesh set XLA_FLAGS=--xla_force_host_platform_device_"
            f"count={n} and force the cpu platform before importing jax")
    return Mesh(np.array(devs[:n]), (axis,))


def gauss_sharding(mesh: Mesh) -> NamedSharding:
    """Gaussian fields: sharded along capacity."""
    return NamedSharding(mesh, P("tile"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def image_sharding(mesh: Mesh) -> NamedSharding:
    """(3, H, W) images: sharded along H (tile rows)."""
    return NamedSharding(mesh, P(None, "tile", None))


def padded_height(height: int, n_devices: int, tile: int = 16) -> int:
    """Image rows after padding the tile-row grid to a mesh-size multiple."""
    tiles_y = -(-height // tile)
    return (-(-tiles_y // n_devices) * n_devices) * tile
