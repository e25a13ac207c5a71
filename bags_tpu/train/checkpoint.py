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

Implementation: tree_flatten to ordered leaves in one .npz; restore
unflattens against a freshly-constructed template state, so the format is
backend/topology independent (and re-shards on load under any mesh).
`load_iteration=-1` resolves to the max saved iteration
(utils/system_utils.py:28-30 semantics).
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, state: Any) -> None:
    leaves = jax.tree_util.tree_leaves(state)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **{f"leaf_{i:05d}": np.asarray(l)
                      for i, l in enumerate(leaves)})


def load_checkpoint(path: str, template: Any) -> Any:
    data = np.load(path)
    treedef = jax.tree_util.tree_structure(template)
    tpl_leaves = jax.tree_util.tree_leaves(template)
    leaves = [data[f"leaf_{i:05d}"] for i in range(len(data.files))]
    assert len(leaves) == len(tpl_leaves), (
        f"checkpoint has {len(leaves)} leaves, template {len(tpl_leaves)}")
    import jax.numpy as jnp
    cast = [jnp.asarray(l, tpl.dtype if hasattr(tpl, "dtype") else None)
            for l, tpl in zip(leaves, tpl_leaves)]
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
