"""Checkpoint save/restore for full training state.

Capability parity with the reference's three artifact families (SURVEY.md §5):
  (1) full state `chkpnt{it}.npz` — every leaf of the TrainState pytree
      including Adam moments (reference: `gaussians.capture()` +
      torch.save, train.py:487-489);
  (2) model-only PLY `point_cloud/iteration_N/point_cloud.ply`
      (scene/__init__.py:208-210) — kept for 3DGS-ecosystem interop;
  (3) side-cars for calibration modules (lens_net/cubemap_net/vignetting/
      shift/specular, train.py:490-494) — stored in the same npz when a
      CalibState wraps the TrainState.

Implementation (format v2): leaves are stored BY PYTREE PATH
("v2|.g.xyz", "v2|.g_opt[0]...") in one .npz, so adding/reordering state
fields can never silently misassign arrays — restore matches by name against
a freshly-constructed template state and reports exactly which leaves are
missing or extra. Format is backend/topology independent (re-shards on load
under any mesh). Legacy positional v1 checkpoints (anonymous `leaf_NNNNN`)
are still readable when the leaf count matches. `load_iteration=-1`
resolves to the max saved iteration (utils/system_utils.py:28-30).
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np

FORMAT_VERSION = 2
_PREFIX = "v2|"


def _named_leaves(tree: Any):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [(jax.tree_util.keystr(kp), leaf) for kp, leaf in flat]


def _to_numpy(leaf) -> np.ndarray:
    """Host materialization that also works for MULTI-PROCESS sharded
    arrays: a leaf whose shards live partly on other hosts is resharded to
    fully-replicated (a collective — every process must call save) and
    read from the local replica. Single-process / fully-addressable leaves
    take the plain np.asarray path."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        if not leaf.sharding.is_fully_replicated:
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(leaf.sharding.mesh, PartitionSpec())
            leaf = jax.jit(lambda x: x, out_shardings=rep)(leaf)
        return np.asarray(leaf.addressable_shards[0].data)
    return np.asarray(leaf)


def save_checkpoint(path: str, state: Any) -> None:
    """Save the full state pytree. Under `jax.distributed` every process
    must call this (the gather of cross-host shards is collective); only
    process 0 writes the file."""
    arrays = {_PREFIX + name: _to_numpy(leaf)
              for name, leaf in _named_leaves(state)}
    if jax.process_index() == 0:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **arrays)


def load_checkpoint(path: str, template: Any) -> Any:
    import jax.numpy as jnp

    data = np.load(path)
    treedef = jax.tree_util.tree_structure(template)
    named = _named_leaves(template)

    if any(f.startswith(_PREFIX) for f in data.files):
        by_name = {f[len(_PREFIX):]: f for f in data.files
                   if f.startswith(_PREFIX)}
        missing = [n for n, _ in named if n not in by_name]
        extra = sorted(set(by_name) - {n for n, _ in named})
        if missing:
            raise ValueError(
                f"checkpoint {path} is missing leaves {missing[:8]}"
                + (f" (+{len(missing) - 8} more)" if len(missing) > 8 else "")
                + (f"; it has extra leaves {extra[:8]}" if extra else ""))
        leaves = [data[by_name[n]] for n, _ in named]
    else:
        # Legacy v1: anonymous positional leaves.
        leaves = [data[f"leaf_{i:05d}"] for i in range(len(data.files))]
        assert len(leaves) == len(named), (
            f"legacy checkpoint has {len(leaves)} leaves, "
            f"template {len(named)}")

    cast = [jnp.asarray(l, tpl.dtype if hasattr(tpl, "dtype") else None)
            for l, (_, tpl) in zip(leaves, named)]
    return jax.tree_util.tree_unflatten(treedef, cast)


def find_max_iteration(folder: str, pattern: str = r"iteration_(\d+)") -> int:
    """`searchForMaxIteration` (utils/system_utils.py:28-30)."""
    best = -1
    if os.path.isdir(folder):
        for name in os.listdir(folder):
            m = re.search(pattern, name)
            if m:
                best = max(best, int(m.group(1)))
    return best
