#!/usr/bin/env python
"""Metrics CLI — offline PSNR/SSIM/LPIPS over rendered image directories.

Capability parity with `/root/reference/metrics.py:36-97`: walks
`model_path/{test,train}/ours_N/{renders,gt}`, computes per-view and mean
metrics, writes `results.json` and `per_view.json`. LPIPS requires local
weights (see eval/metrics.py); it is reported as NaN when unavailable.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_paths", "-m", nargs="+", required=True)
    from bags_tpu.utils.platform import add_platform_arg, apply_platform
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args.platform)

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    import jax

    from bags_tpu.eval.metrics import Lpips, psnr, ssim

    # the reference's offline metrics CLI uses the vgg backbone
    # (/root/reference/metrics.py:78); in-loop eval uses alex
    lpips = Lpips(net="vgg")
    # one trace per image shape (constant within a run)
    psnr_j = jax.jit(psnr)
    ssim_j = jax.jit(ssim)

    for model_path in args.model_paths:
        full, per_view = {}, {}
        for split in ("test", "train"):
            split_dir = os.path.join(model_path, split)
            if not os.path.isdir(split_dir):
                continue
            for method in sorted(os.listdir(split_dir)):
                rdir = os.path.join(split_dir, method, "renders")
                gdir = os.path.join(split_dir, method, "gt")
                if not (os.path.isdir(rdir) and os.path.isdir(gdir)):
                    continue
                names = sorted(os.listdir(rdir))
                psnrs, ssims, lpipss = [], [], []
                for name in names:
                    r = np.asarray(Image.open(os.path.join(rdir, name)),
                                   dtype=np.float32) / 255.0
                    g = np.asarray(Image.open(os.path.join(gdir, name)),
                                   dtype=np.float32) / 255.0
                    r = jnp.asarray(r[..., :3].transpose(2, 0, 1))
                    g = jnp.asarray(g[..., :3].transpose(2, 0, 1))
                    psnrs.append(float(psnr_j(r, g)))
                    ssims.append(float(ssim_j(r, g)))
                    if lpips.available:
                        lpipss.append(float(lpips(r, g)))
                key = f"{split}/{method}"
                # Annotated fallback instead of a silent NaN so a missing
                # weights bundle cannot be misread as a real NaN bug.
                lpips_na = "n/a (no weights)"
                full[key] = {
                    "PSNR": float(np.mean(psnrs)),
                    "SSIM": float(np.mean(ssims)),
                    "LPIPS": (float(np.mean(lpipss)) if lpipss
                              else lpips_na),
                }
                per_view[key] = {
                    "PSNR": dict(zip(names, psnrs)),
                    "SSIM": dict(zip(names, ssims)),
                    "LPIPS": (dict(zip(names, lpipss)) if lpipss
                              else lpips_na),
                }
                print(f"{model_path} {key}: PSNR {full[key]['PSNR']:.3f} "
                      f"SSIM {full[key]['SSIM']:.4f}")
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(full, f, indent=2)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=2)


if __name__ == "__main__":
    main()
