"""Relaxed-precision ("fast") compositing mode vs exact mode.

RenderConfig(precision="fast") runs the Pallas kernels' MXU scans and
reductions as SINGLE-pass bf16 matmuls (f32 accumulation) instead of the
exact 3x-bf16-split — VERDICT r3 item 1. These tests bound the quality
delta: image error well under the 8-bit quantization step, gradients
within a fraction of a percent relative, and abs-densify stats intact.

Runs in Pallas interpret mode on CPU (conftest), so the bf16 rounding is
bit-identical to the chip's.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bags_tpu.raster import RenderConfig, render
from bags_tpu.utils.testing import make_toy_scene


def _cfg(precision):
    return RenderConfig(sh_degree=1, backend="pallas", max_instances=16384,
                        precision=precision)


def _args(sc):
    return (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
            sc["sh_coeffs"], sc["cam"])


def test_fast_forward_close_to_exact():
    sc = make_toy_scene(n=400, width=48, height=32, sh_degree=1, seed=21)
    out_e = render(*_args(sc), sc["static"], _cfg("exact"))
    out_f = render(*_args(sc), sc["static"], _cfg("fast"))
    # Image error far below the 8-bit step (1/255 ~ 3.9e-3).
    err = np.max(np.abs(np.asarray(out_f.render) - np.asarray(out_e.render)))
    assert err < 1.5e-3, err
    terr = np.max(np.abs(np.asarray(out_f.t_final) - np.asarray(out_e.t_final)))
    assert terr < 1.5e-3, terr


def test_fast_grads_close_to_exact():
    sc = make_toy_scene(n=300, width=32, height=32, sh_degree=1, seed=22)
    target = jnp.full((3, 32, 32), 0.3)

    def make_loss(precision):
        cfg = _cfg(precision)

        def loss(xyz, scales, quats, opacity, sh, cam):
            out = render(xyz, scales, quats, opacity, sh, cam,
                         sc["static"], cfg)
            return jnp.mean((out.render - target) ** 2)
        return loss

    g_e = jax.grad(make_loss("exact"), argnums=tuple(range(6)))(*_args(sc))
    g_f = jax.grad(make_loss("fast"), argnums=tuple(range(6)))(*_args(sc))
    names = ["xyz", "scales", "quats", "opacity", "sh", "cam"]
    for name, a, b in zip(names, g_e, g_f):
        for la, lb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            la, lb = np.asarray(la), np.asarray(lb)
            scale = np.max(np.abs(la)) + 1e-12
            rel = np.max(np.abs(lb - la)) / scale
            # bf16 operand rounding is 2^-9 per term. Gaussian-parameter
            # grads stay within ~2%; camera grads are near-cancelling sums
            # over all pixels (the toy camera sits at a symmetric optimum),
            # which amplifies relative-to-max error — bound those at the
            # vector level instead (descent-direction check below).
            bound = 0.1 if name == "cam" else 2e-2
            assert rel < bound, f"{name}: rel grad err {rel}"
    # Descent direction: the concatenated camera gradient must be nearly
    # parallel to the exact one (what pose optimization actually consumes).
    ce = np.concatenate([np.ravel(l) for l in jax.tree_util.tree_leaves(g_e[5])])
    cf = np.concatenate([np.ravel(l) for l in jax.tree_util.tree_leaves(g_f[5])])
    cos = np.dot(ce, cf) / (np.linalg.norm(ce) * np.linalg.norm(cf) + 1e-30)
    assert cos > 0.999, cos
    assert np.linalg.norm(cf - ce) / (np.linalg.norm(ce) + 1e-30) < 0.05


def test_exact2_midpoint_between_fast_and_exact():
    """precision='exact2' (2-term bf16 split, ~2^-17 operand rounding,
    VERDICT r4 #7): image error must sit orders of magnitude under fast's
    2^-9 bound, and gradients must be near-exact."""
    sc = make_toy_scene(n=400, width=48, height=32, sh_degree=1, seed=24)
    out_e = render(*_args(sc), sc["static"], _cfg("exact"))
    out_2 = render(*_args(sc), sc["static"], _cfg("exact2"))
    err = np.max(np.abs(np.asarray(out_2.render) - np.asarray(out_e.render)))
    assert err < 1e-5, err  # vs fast's ~1e-3 at the same scene scale

    target = jnp.full((3, 32, 32), 0.3)
    sc2 = make_toy_scene(n=300, width=32, height=32, sh_degree=1, seed=22)

    def make_loss(precision):
        cfg = _cfg(precision)

        def loss(xyz, scales, quats, opacity, sh, cam):
            out = render(xyz, scales, quats, opacity, sh, cam,
                         sc2["static"], cfg)
            return jnp.mean((out.render - target) ** 2)
        return loss

    g_e = jax.grad(make_loss("exact"), argnums=tuple(range(6)))(*_args(sc2))
    g_2 = jax.grad(make_loss("exact2"), argnums=tuple(range(6)))(*_args(sc2))
    for a, b in zip(jax.tree_util.tree_leaves(g_e),
                    jax.tree_util.tree_leaves(g_2)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.max(np.abs(b - a)) / (np.max(np.abs(a)) + 1e-12)
        assert rel < 1e-3, rel


def test_fast_abs_probe_channel_survives():
    """The fused abs-densify channel works identically under fast mode."""
    sc = make_toy_scene(n=200, width=32, height=32, sh_degree=0, seed=23)
    target = jnp.zeros((3, 32, 32))
    n = sc["xyz"].shape[0]

    def make_loss(precision):
        cfg = RenderConfig(sh_degree=0, backend="pallas",
                           max_instances=16384, precision=precision)

        def loss(abs_probe):
            out = render(*_args(sc), sc["static"], cfg, abs_probe=abs_probe)
            return jnp.mean((out.render - target) ** 2)
        return loss

    zeros = jnp.zeros((n, 2))
    g_e = jax.grad(make_loss("exact"))(zeros)
    g_f = jax.grad(make_loss("fast"))(zeros)
    assert np.all(np.asarray(g_f) >= 0.0)
    scale = np.max(np.abs(np.asarray(g_e))) + 1e-12
    rel = np.max(np.abs(np.asarray(g_f) - np.asarray(g_e))) / scale
    assert rel < 1.5e-2, rel


def test_precision_validation():
    import pytest

    with pytest.raises(ValueError):
        RenderConfig(precision="wrong")
