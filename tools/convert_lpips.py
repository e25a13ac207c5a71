#!/usr/bin/env python
"""Convert LPIPS (v0.1) weights to the bags_tpu eval/metrics.py npz layout.

This image has no torchvision and no network egress, so the pretrained
backbone cannot be fetched here. Run this ONCE on any machine with
`torch`, `torchvision`, and internet access:

    python tools/convert_lpips.py --out lpips_vgg.npz

then point the framework at the file:

    export BAGS_TPU_LPIPS_WEIGHTS=/path/to/lpips_vgg.npz

Layout consumed by `bags_tpu/eval/metrics.py::Lpips`:
  conv{i}_w (O,I,kh,kw), conv{i}_b (O,)   backbone convs, in order
  pool_after_{i} (scalar 1)               max-pool 2x2 after conv i
  tap_{i} (scalar k)                      conv i's ReLU output is feature k
  lin{k}_w (C_k,)                         LPIPS linear calibration weights

The linear weights come from the official LPIPS v0.1 release (the same
files the reference's utils/lpipsPyTorch/modules/utils.py get_state_dict
downloads from richzhang/PerceptualSimilarity).

Only the VGG16 backbone is supported (all convs 3x3/s1/p1, pools 2x2/s2 —
exactly the structure eval/metrics.py executes). The reference's metrics.py
also uses LPIPS-vgg (metrics.py:78); its in-loop training_report defaults to
LPIPS-alex — this framework reports LPIPS-vgg in both places.
"""

import argparse


def convert(net_type: str, out: str) -> None:
    import numpy as np
    import torch
    from torchvision import models

    if net_type != "vgg":
        raise SystemExit("only the vgg backbone is supported (see docstring)")
    backbone = models.vgg16(weights="IMAGENET1K_V1").features
    # LPIPS taps the ReLU outputs of conv{1_2, 2_2, 3_3, 4_3, 5_3}
    taps = {3: 0, 8: 1, 15: 2, 22: 3, 29: 4}

    url = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity"
           f"/master/lpips/weights/v0.1/{net_type}.pth")
    lin_sd = torch.hub.load_state_dict_from_url(url, progress=True,
                                                map_location="cpu")

    arrays = {}
    conv_i = 0
    pending_pool = False
    for idx, layer in enumerate(backbone):
        name = layer.__class__.__name__
        if name == "Conv2d":
            arrays[f"conv{conv_i}_w"] = layer.weight.detach().numpy()
            arrays[f"conv{conv_i}_b"] = layer.bias.detach().numpy()
            if pending_pool:
                # pool applied BEFORE this conv in metrics.py ordering:
                # mark the PREVIOUS conv as pooled-after
                arrays[f"pool_after_{conv_i - 1}"] = np.asarray(1)
                pending_pool = False
            conv_i += 1
        elif name == "MaxPool2d":
            pending_pool = True
        elif name == "ReLU":
            if idx in taps:
                arrays[f"tap_{conv_i - 1}"] = np.asarray(taps[idx])

    for k in range(5):
        # official richzhang v0.1 state-dict keys are 'lin{k}.model.1.weight'
        # (the reference's get_state_dict strips 'lin'/'model.' to '{k}.1.weight')
        for key in (f"lin{k}.model.1.weight", f"lin.{k}.model.1.weight",
                    f"{k}.1.weight"):
            if key in lin_sd:
                break
        else:
            raise KeyError(f"no linear weight for tap {k}: {list(lin_sd)[:6]}")
        arrays[f"lin{k}_w"] = lin_sd[key].detach().numpy().reshape(-1)

    np.savez(out, **arrays)
    print(f"wrote {out} ({len(arrays)} arrays)")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--net", default="vgg", choices=["vgg"])
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    convert(args.net, args.out)


if __name__ == "__main__":
    main()
