"""Pallas compositing kernels vs the jnp oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from bags_tpu.raster import RenderConfig, render
from bags_tpu.raster.reference import render_reference
from bags_tpu.utils.testing import make_toy_scene


def _render_both(sc, sh_degree, **kw):
    cfg_j = RenderConfig(sh_degree=sh_degree, backend="jnp", max_instances=16384)
    cfg_p = RenderConfig(sh_degree=sh_degree, backend="pallas", max_instances=16384)
    args = (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
            sc["sh_coeffs"], sc["cam"], sc["static"])
    return (render(*args, cfg_j, **kw), render(*args, cfg_p, **kw))


def test_pallas_forward_matches_jnp():
    sc = make_toy_scene(n=200, width=48, height=32, sh_degree=1, seed=11)
    out_j, out_p = _render_both(sc, 1)
    np.testing.assert_allclose(np.asarray(out_p.render), np.asarray(out_j.render),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_p.t_final), np.asarray(out_j.t_final),
                               atol=2e-5)


def test_pallas_forward_with_background():
    sc = make_toy_scene(n=100, width=32, height=32, seed=12)
    bg = jnp.array([0.9, 0.1, 0.4])
    out_j, out_p = _render_both(sc, 0, bg=bg)
    np.testing.assert_allclose(np.asarray(out_p.render), np.asarray(out_j.render),
                               atol=2e-5)


def test_pallas_grads_match_jnp():
    sc = make_toy_scene(n=150, width=32, height=32, sh_degree=1, seed=13)
    target = jnp.zeros((3, 32, 32))

    def make_loss(backend):
        cfg = RenderConfig(sh_degree=1, backend=backend, max_instances=16384)

        def loss(xyz, scales, quats, opacity, sh, cam):
            out = render(xyz, scales, quats, opacity, sh, cam, sc["static"], cfg)
            return jnp.mean((out.render - target) ** 2)
        return loss

    args = (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
            sc["sh_coeffs"], sc["cam"])
    g_j = jax.grad(make_loss("jnp"), argnums=tuple(range(6)))(*args)
    g_p = jax.grad(make_loss("pallas"), argnums=tuple(range(6)))(*args)
    names = ["xyz", "scales", "quats", "opacity", "sh", "cam"]
    for name, a, b in zip(names, g_j, g_p):
        for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(
                np.asarray(lb), np.asarray(la), atol=1e-5, rtol=1e-3,
                err_msg=f"grad mismatch for {name}")


def test_pallas_grads_vs_naive_reference():
    """Pallas gradients against the naive golden renderer (incl. pose)."""
    sc = make_toy_scene(n=120, width=32, height=32, seed=14)
    target = jnp.full((3, 32, 32), 0.25)
    cfg = RenderConfig(sh_degree=0, backend="pallas", max_instances=16384)

    def loss_p(cam):
        out = render(sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
                     sc["sh_coeffs"], cam, sc["static"], cfg)
        return jnp.mean((out.render - target) ** 2)

    def loss_r(cam):
        out = render_reference(sc["xyz"], sc["scales"], sc["quats"],
                               sc["opacity"], sc["sh_coeffs"], cam,
                               sc["static"], 0)
        return jnp.mean((out["render"] - target) ** 2)

    g_p = jax.grad(loss_p)(sc["cam"])
    g_r = jax.grad(loss_r)(sc["cam"])
    for lp, lr in zip(jax.tree_util.tree_leaves(g_p), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lr),
                                   atol=1e-5, rtol=1e-3)


def test_pallas_grads_unaligned_spill_across_tiles():
    """Adversarial case for binning v3's unaligned segments: many small
    splats so most tiles have counts not divisible by the chunk width —
    every tile's last backward DMA window spills into its neighbor's slots
    and must be rewritten correctly in program order."""
    sc = make_toy_scene(n=700, width=64, height=48, sh_degree=0, seed=21,
                        scale_range=(0.01, 0.05))
    target = jnp.zeros((3, 48, 64))

    def loss(backend, xyz, opac, cam_dq):
        import dataclasses
        cam = dataclasses.replace(sc["cam"], dq=cam_dq)
        cfg = RenderConfig(sh_degree=0, backend=backend, max_instances=16384)
        out = render(xyz, sc["scales"], sc["quats"], opac, sc["sh_coeffs"],
                     cam, sc["static"], cfg)
        return jnp.mean((out.render - target) ** 2)

    args = (sc["xyz"], sc["opacity"], jnp.zeros(4))
    gj = jax.grad(lambda *a: loss("jnp", *a), argnums=(0, 1, 2))(*args)
    gp = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(*args)
    for a, b in zip(gj, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=2e-6)
