#!/usr/bin/env python
"""Import a REFERENCE training checkpoint (`chkpnt{it}.pth`) without torch.

The reference saves `torch.save((gaussians.capture(), iteration), ...)`
(`/root/reference/train.py:487-489`; capture layout
`scene/gaussian_model.py:62-76`). This tool parses that file with the
numpy-only torch-pickle reader (`bags_tpu/eval/lpips_weights.py`) and
writes the model as a bags_tpu-compatible `point_cloud.ply` — letting a
reference user switch frameworks mid-project even if they only kept
checkpoints (the PLY reader/writer is byte-compatible both ways).

The per-camera optimized poses (`cams_train{it}.pt`) pickle whole
nn.Modules (Camera classes + PIL state), which the restricted unpickler
deliberately refuses — re-derive poses by resuming pose optimization, or
export PLYs from the reference directly.

Usage:
    python tools/import_reference_checkpoint.py --pth chkpnt30000.pth \
        --out point_cloud.ply
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def capture_to_gaussians(cap):
    """reference `gaussians.capture()` tuple -> (Gaussians, alive,
    active_sh_degree). Handles both the 12- and 15-element layouts
    (gaussian_model.py:79-107)."""
    import jax.numpy as jnp

    from bags_tpu.model.gaussians import Gaussians

    if len(cap) == 12:
        (sh_deg, xyz, f_dc, f_rest, scaling, rotation, opacity,
         _max_radii, _grad_accum, _denom, _opt, _lr_scale) = cap
    elif len(cap) == 15:
        (sh_deg, xyz, _, _, f_dc, f_rest, scaling, rotation, opacity,
         _, _max_radii, _grad_accum, _denom, _opt, _lr_scale) = cap
    else:
        raise ValueError(f"unrecognized capture tuple of {len(cap)} items")
    xyz = np.asarray(xyz, np.float32)
    n = xyz.shape[0]
    g = Gaussians(
        xyz=jnp.asarray(xyz),
        sh_dc=jnp.asarray(np.asarray(f_dc, np.float32).reshape(n, 1, 3)),
        sh_rest=jnp.asarray(np.asarray(f_rest, np.float32).reshape(
            n, -1, 3)),
        scales_log=jnp.asarray(np.asarray(scaling, np.float32)),
        quats=jnp.asarray(np.asarray(rotation, np.float32)),
        opacity_raw=jnp.asarray(
            np.asarray(opacity, np.float32).reshape(n)),
    )
    alive = jnp.ones((n,), bool)
    return g, alive, int(np.asarray(sh_deg))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True,
                   help="reference chkpnt{it}.pth file")
    p.add_argument("--out", required=True, help="output .ply path")
    args = p.parse_args(argv)

    from bags_tpu.eval.lpips_weights import load_torch_object
    from bags_tpu.model.gaussians import save_ply

    obj = load_torch_object(args.pth)
    # chkpnt files are (capture_tuple, iteration); accept a bare capture too
    if (isinstance(obj, tuple) and len(obj) == 2
            and isinstance(obj[1], (int, np.integer))):
        cap, it = obj
    else:
        cap, it = obj, -1
    g, alive, sh_deg = capture_to_gaussians(cap)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_ply(args.out, g, alive)
    print(f"imported {int(np.asarray(alive).sum())} Gaussians "
          f"(iteration {it}, active SH degree {sh_deg}) -> {args.out}")


if __name__ == "__main__":
    main()
