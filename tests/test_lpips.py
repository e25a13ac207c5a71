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
