#!/usr/bin/env python
"""Convert LPIPS (v0.1) weights to the bags_tpu eval/metrics.py npz layout.

This image has no torchvision and no network egress, so the pretrained
backbone cannot be fetched here. Run this ONCE on any machine with
`torch`, `torchvision`, and internet access:

    python tools/convert_lpips.py --net alex --out lpips_alex.npz
    python tools/convert_lpips.py --net vgg  --out lpips_vgg.npz

then point the framework at the file:

    export BAGS_TPU_LPIPS_WEIGHTS=/path/to/lpips_alex.npz

Layout consumed by `bags_tpu/eval/metrics.py::Lpips`:
  conv{i}_w (O,I,kh,kw), conv{i}_b (O,)   backbone convs, in order
  conv{i}_stride, conv{i}_pad (scalars)   optional; default stride 1 / SAME
  pool_after_{i} (scalar 1)               max-pool 2x2/s2 after conv i
  pool_after_{i}_k, _s (scalars)          optional general pool (alex: 3/2)
  tap_{i} (scalar k)                      conv i's ReLU output is feature k
  lin{k}_w (C_k,)                         LPIPS linear calibration weights

The linear weights come from the official LPIPS v0.1 release (the same
files the reference's utils/lpipsPyTorch/modules/utils.py get_state_dict
downloads from richzhang/PerceptualSimilarity).

Backbones: vgg16 (reference metrics.py:78, offline) and alexnet-owt (the
reference's in-loop training_report default, lpipsPyTorch/__init__.py:8).
The structure tables live in bags_tpu/eval/lpips_weights.py; this script
just pulls the pretrained state dicts and reuses convert_state_dicts.
"""

import argparse


def convert(net_type: str, out: str) -> None:
    import numpy as np
    import torch
    from torchvision import models

    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bags_tpu.eval.lpips_weights import convert_state_dicts

    if net_type == "vgg":
        backbone_sd = models.vgg16(weights="IMAGENET1K_V1").features \
            .state_dict(prefix="features.")
    elif net_type == "alex":
        backbone_sd = models.alexnet(weights="IMAGENET1K_V1").features \
            .state_dict(prefix="features.")
    else:
        raise SystemExit("--net must be vgg or alex")

    url = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity"
           f"/master/lpips/weights/v0.1/{net_type}.pth")
    lin_sd = torch.hub.load_state_dict_from_url(url, progress=True,
                                                map_location="cpu")

    arrays = convert_state_dicts(
        {k: v.detach().numpy() for k, v in backbone_sd.items()},
        {k: v.detach().numpy() for k, v in lin_sd.items()},
        net=net_type)
    np.savez(out, **arrays)
    print(f"wrote {out} ({len(arrays)} arrays)")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--net", default="vgg", choices=["vgg", "alex"])
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    convert(args.net, args.out)


if __name__ == "__main__":
    main()
