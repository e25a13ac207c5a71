"""LPIPS evaluator: npz weight-bundle contract + metric sanity.

True pretrained weights cannot be fetched in this image (no egress);
tools/convert_lpips.py documents the offline generation path. These tests
exercise the jax executor against a synthetic bundle in the same layout.
"""

import numpy as np
import pytest

from bags_tpu.eval.metrics import Lpips, psnr


def _synthetic_bundle(path):
    rng = np.random.default_rng(0)
    arrays = {}
    chans = [3, 8, 8, 16]
    taps = {1: 0, 2: 1, 3: 2}
    pools = {1}
    for i in range(3):
        arrays[f"conv{i}_w"] = rng.normal(
            0, 0.2, (chans[i + 1], chans[i], 3, 3)).astype(np.float32)
        arrays[f"conv{i}_b"] = rng.normal(0, 0.01, chans[i + 1]).astype(
            np.float32)
        if i + 1 in taps:
            arrays[f"tap_{i}"] = np.asarray(taps[i + 1])
        if i + 1 in pools:
            arrays[f"pool_after_{i}"] = np.asarray(1)
    for k, c in enumerate([8, 8, 16]):
        arrays[f"lin{k}_w"] = np.abs(
            rng.normal(0, 0.1, c)).astype(np.float32)
    np.savez(path, **arrays)


def _fake_vgg16_sd(rng, torch, width=4):
    """VGG16-shaped state dict (torchvision key layout, tiny channels)."""
    from bags_tpu.eval.lpips_weights import VGG16_CONV_IDX

    sd = {}
    c_in = 3
    for idx in VGG16_CONV_IDX:
        sd[f"features.{idx}.weight"] = torch.tensor(
            rng.normal(0, 0.2, (width, c_in, 3, 3)).astype(np.float32))
        sd[f"features.{idx}.bias"] = torch.tensor(
            rng.normal(0, 0.01, width).astype(np.float32))
        c_in = width
    return sd


def _fake_lin_sd(rng, torch, width=4):
    return {f"lin{k}.model.1.weight": torch.tensor(
        np.abs(rng.normal(0, 0.1, (1, width, 1, 1))).astype(np.float32))
        for k in range(5)}


def test_numpy_pth_loader_matches_torch_zip(tmp_path):
    """load_torch_pth (numpy-only) round-trips a torch zip-format save."""
    import torch

    from bags_tpu.eval.lpips_weights import load_torch_pth

    rng = np.random.default_rng(2)
    sd = {
        "a.weight": torch.tensor(rng.normal(size=(4, 3, 3, 3))
                                 .astype(np.float32)),
        "a.bias": torch.tensor(rng.normal(size=(4,)).astype(np.float32)),
        "b.weight": torch.nn.Parameter(
            torch.tensor(rng.normal(size=(2, 4)).astype(np.float32))),
        "c.long": torch.tensor(np.arange(6, dtype=np.int64).reshape(2, 3)),
        "d.noncontig": torch.tensor(
            rng.normal(size=(4, 5)).astype(np.float32)).t(),
    }
    path = str(tmp_path / "zip.pth")
    torch.save(sd, path)
    got = load_torch_pth(path)
    assert set(got) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(got[k], sd[k].detach().numpy())


def test_numpy_pth_loader_matches_torch_legacy(tmp_path):
    """Same for the legacy (pre-1.6, non-zip) format — the format the
    2017-era torchvision vgg16 / LPIPS v0.1 release files use."""
    import torch

    from bags_tpu.eval.lpips_weights import load_torch_pth

    rng = np.random.default_rng(3)
    sd = {
        "w": torch.tensor(rng.normal(size=(3, 2, 3, 3)).astype(np.float32)),
        "b": torch.tensor(rng.normal(size=(3,)).astype(np.float32)),
    }
    path = str(tmp_path / "legacy.pth")
    torch.save(sd, path, _use_new_zipfile_serialization=False)
    got = load_torch_pth(path)
    assert set(got) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(got[k], sd[k].numpy())


def test_numpy_pth_loader_rejects_arbitrary_classes(tmp_path):
    """The restricted unpickler must refuse anything beyond a plain state
    dict — no code execution from untrusted checkpoint files."""
    import pickle

    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    from bags_tpu.eval.lpips_weights import load_torch_pth

    path = str(tmp_path / "evil.pth")
    import io
    import zipfile
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"x": Evil()}))
    with pytest.raises(Exception, match="refusing|unpickl"):
        load_torch_pth(path)


def test_lpips_loads_official_file_pair(tmp_path):
    """Lpips(weights_path=<dir of untouched upstream .pth files>) works
    end-to-end and matches the npz path bit-for-bit."""
    import torch

    from bags_tpu.eval.lpips_weights import (convert_state_dicts,
                                             load_official_dir)

    rng = np.random.default_rng(4)
    d = tmp_path / "weights"
    d.mkdir()
    vgg_sd = _fake_vgg16_sd(rng, torch)
    lin_sd = _fake_lin_sd(rng, torch)
    # the torchvision backbone ships zip-format in modern mirrors and
    # legacy in the original — exercise one of each
    torch.save(vgg_sd, str(d / "vgg16-397923af.pth"))
    torch.save(lin_sd, str(d / "vgg.pth"),
               _use_new_zipfile_serialization=False)

    arrays = load_official_dir(str(d))
    ref = convert_state_dicts(
        {k: v.detach().numpy() for k, v in vgg_sd.items()},
        {k: v.detach().numpy() for k, v in lin_sd.items()})
    assert set(arrays) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(arrays[k], ref[k])

    lp = Lpips(weights_path=str(d))
    assert lp.available
    a = np.random.default_rng(5).uniform(0, 1, (3, 64, 64)).astype(
        np.float32)
    b = np.clip(a + 0.2, 0, 1)
    same, diff = float(lp(a, a)), float(lp(a, b))
    assert same == pytest.approx(0.0, abs=1e-6)
    assert np.isfinite(diff) and diff > 0

    npz = str(tmp_path / "conv.npz")
    np.savez(npz, **ref)
    lp2 = Lpips(weights_path=npz)
    assert float(lp2(a, b)) == pytest.approx(diff, rel=1e-6)


def _fake_alexnet_sd(rng, torch, width=6):
    """AlexNet-shaped state dict (torchvision key layout, tiny channels,
    REAL geometry: 11x11/s4/p2, 5x5/p2, 3x3/p1 convs)."""
    from bags_tpu.eval.lpips_weights import ALEX_CONV_IDX

    kernels = [11, 5, 3, 3, 3]
    sd = {}
    c_in = 3
    for conv_i, idx in enumerate(ALEX_CONV_IDX):
        k = kernels[conv_i]
        sd[f"features.{idx}.weight"] = torch.tensor(
            rng.normal(0, 0.2, (width, c_in, k, k)).astype(np.float32))
        sd[f"features.{idx}.bias"] = torch.tensor(
            rng.normal(0, 0.01, width).astype(np.float32))
        c_in = width
    return sd


def _fake_alex_lin_sd(rng, torch, width=6):
    return {f"lin{k}.model.1.weight": torch.tensor(
        np.abs(rng.normal(0, 0.1, (1, width, 1, 1))).astype(np.float32))
        for k in range(5)}


def test_lpips_alex_matches_torch_oracle(tmp_path):
    """The alex-arch executor (strided conv0, explicit pads, 3x3/s2 pools)
    matches a torch transcription of the reference's AlexNet LPIPS
    (lpipsPyTorch/modules/networks.py:79-85) on the same fake weights."""
    import torch
    import torch.nn.functional as F

    from bags_tpu.eval.lpips_weights import (ALEX_CONV_IDX, ALEX_PADS,
                                             ALEX_STRIDES,
                                             convert_state_dicts)

    rng = np.random.default_rng(7)
    sd = _fake_alexnet_sd(rng, torch)
    lin_sd = _fake_alex_lin_sd(rng, torch)
    arrays = convert_state_dicts(
        {k: v.numpy() for k, v in sd.items()},
        {k: v.numpy() for k, v in lin_sd.items()}, net="alex")
    npz = str(tmp_path / "alex.npz")
    np.savez(npz, **arrays)
    lp = Lpips(weights_path=npz)
    assert lp.available and lp.net == "alex"
    # geometry decoded from the bundle matches the structure table
    assert [a[0] for a in lp.arch] == ALEX_STRIDES
    assert [a[1] for a in lp.arch] == ALEX_PADS
    assert [a[3] for a in lp.arch] == [(3, 2), (3, 2), None, None, None]

    def torch_feats(x):
        mean = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
        std = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
        h = ((x * 2.0 - 1.0) - mean) / std
        feats = []
        for i, idx in enumerate(ALEX_CONV_IDX):
            h = F.conv2d(h, sd[f"features.{idx}.weight"],
                         sd[f"features.{idx}.bias"],
                         stride=ALEX_STRIDES[i], padding=ALEX_PADS[i])
            h = F.relu(h)
            norm = torch.sqrt(torch.sum(h ** 2, dim=1, keepdim=True))
            feats.append(h / torch.clamp(norm, min=1e-10))
            if i in (0, 1):
                h = F.max_pool2d(h, kernel_size=3, stride=2)
        return feats

    a = np.random.default_rng(8).uniform(0, 1, (3, 96, 96)).astype(
        np.float32)
    b = np.clip(a + 0.1 * np.random.default_rng(9).normal(
        size=a.shape).astype(np.float32), 0, 1)
    fa = torch_feats(torch.tensor(a)[None])
    fb = torch_feats(torch.tensor(b)[None])
    want = 0.0
    for k, (x, y) in enumerate(zip(fa, fb)):
        d = (x - y) ** 2
        w = torch.tensor(arrays[f"lin{k}_w"]).view(1, -1, 1, 1)
        want += float((d * w).sum(1).mean())
    got = float(lp(a, b))
    assert got == pytest.approx(want, rel=1e-4)


def test_lpips_alex_official_dir_and_fallback(tmp_path):
    """load_official_dir resolves the alexnet pair; Lpips(net='alex') on a
    vgg-only directory falls back to vgg instead of failing."""
    import torch

    rng = np.random.default_rng(11)
    d = tmp_path / "weights"
    d.mkdir()
    torch.save(_fake_alexnet_sd(rng, torch), str(d / "alexnet-owt.pth"))
    torch.save(_fake_alex_lin_sd(rng, torch), str(d / "alex.pth"))
    lp = Lpips(weights_path=str(d), net="alex")
    assert lp.available and lp.net == "alex"
    a = np.random.default_rng(12).uniform(0, 1, (3, 64, 64)).astype(
        np.float32)
    assert float(lp(a, a)) == pytest.approx(0.0, abs=1e-6)
    assert float(lp(a, np.clip(a + 0.2, 0, 1))) > 0

    d2 = tmp_path / "vgg_only"
    d2.mkdir()
    torch.save(_fake_vgg16_sd(rng, torch), str(d2 / "vgg16-397923af.pth"))
    torch.save(_fake_lin_sd(rng, torch), str(d2 / "vgg.pth"))
    lp2 = Lpips(weights_path=str(d2), net="alex")
    assert lp2.available and lp2.net == "vgg"
    # and net=None on a dir holding BOTH pairs prefers alex
    torch.save(_fake_alexnet_sd(rng, torch), str(d2 / "alexnet-owt.pth"))
    torch.save(_fake_alex_lin_sd(rng, torch), str(d2 / "alex.pth"))
    lp3 = Lpips(weights_path=str(d2))
    assert lp3.net == "alex"


def test_lpips_unavailable_returns_nan():
    lp = Lpips(weights_path=None)
    assert not lp.available
    assert np.isnan(float(lp(np.zeros((3, 16, 16)), np.zeros((3, 16, 16)))))


def test_lpips_synthetic_bundle(tmp_path):
    import jax.numpy as jnp

    path = str(tmp_path / "lpips.npz")
    _synthetic_bundle(path)
    lp = Lpips(weights_path=path)
    assert lp.available

    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    same = float(lp(a, a))
    diff = float(lp(a, b))
    assert same == pytest.approx(0.0, abs=1e-6)
    assert diff > 1e-4
    assert np.isfinite(diff)

    # small perturbations score lower than unrelated images
    near = float(lp(a, jnp.clip(a + 0.01, 0, 1)))
    assert near < diff
