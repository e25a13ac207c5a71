"""Rasterizer correctness: projection sanity, tiled-vs-naive parity, autodiff."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bags_tpu.core import projection
from bags_tpu.core.camera import CameraParams, CameraStatic
from bags_tpu.raster import RenderConfig, render
from bags_tpu.raster.reference import render_reference
from bags_tpu.utils.testing import make_toy_scene


def _scene(**kw):
    return make_toy_scene(**kw)


def test_projection_center_point():
    """A point on the optical axis projects to the image center."""
    static = CameraStatic(width=64, height=48)
    cam = CameraParams.create(np.eye(3), np.zeros(3), 0.8, 0.6)
    xyz = jnp.array([[0.0, 0.0, 5.0]])
    proj = projection.project_gaussians(
        xyz, jnp.full((1, 3), 0.1), jnp.array([[1.0, 0, 0, 0]]),
        jnp.array([0.8]), jnp.zeros((1, 1, 3)), cam, static, 0)
    np.testing.assert_allclose(np.asarray(proj.mean2d[0]),
                               [(64 - 1) / 2, (48 - 1) / 2], atol=1e-3)
    assert float(proj.depth[0]) == 5.0
    assert int(proj.radius[0]) > 0


def test_projection_culls_behind_camera():
    static = CameraStatic(width=64, height=64)
    cam = CameraParams.create(np.eye(3), np.zeros(3), 0.8, 0.8)
    xyz = jnp.array([[0.0, 0.0, -5.0], [0.0, 0.0, 0.1], [0.0, 0.0, 5.0]])
    proj = projection.project_gaussians(
        xyz, jnp.full((3, 3), 0.1), jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (3, 1)),
        jnp.full((3,), 0.8), jnp.zeros((3, 1, 3)), cam, static, 0)
    assert int(proj.radius[0]) == 0
    assert int(proj.radius[1]) == 0  # z < 0.2 near plane
    assert int(proj.radius[2]) > 0


def test_isotropic_gaussian_conic():
    """Isotropic world Gaussian at distance d: cov2d ≈ (f*s/d)^2 I + 0.3 I."""
    static = CameraStatic(width=128, height=128)
    cam = CameraParams.create(np.eye(3), np.zeros(3), 0.8, 0.8)
    s, d = 0.2, 5.0
    proj = projection.project_gaussians(
        jnp.array([[0.0, 0.0, d]]), jnp.full((1, 3), s),
        jnp.array([[1.0, 0, 0, 0]]), jnp.array([0.9]), jnp.zeros((1, 1, 3)),
        cam, static, 0)
    f = 128 / (2 * np.tan(0.4))
    expected_var = (f * s / d) ** 2 + 0.3
    conic = np.asarray(proj.conic[0])
    np.testing.assert_allclose(conic[0], 1 / expected_var, rtol=1e-4)
    np.testing.assert_allclose(conic[2], 1 / expected_var, rtol=1e-4)
    np.testing.assert_allclose(conic[1], 0.0, atol=1e-6)


def test_tiled_matches_reference():
    sc = _scene(n=200, width=48, height=32, sh_degree=1, seed=1)
    ref = render_reference(sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
                           sc["sh_coeffs"], sc["cam"], sc["static"], 1)
    cfg = RenderConfig(sh_degree=1, backend="jnp", max_instances=8192)
    out = render(sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
                 sc["sh_coeffs"], sc["cam"], sc["static"], cfg)
    assert int(out.n_dropped) == 0
    np.testing.assert_allclose(np.asarray(out.render), np.asarray(ref["render"]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.t_final), np.asarray(ref["T_final"]),
                               atol=1e-4)


def test_tiled_matches_reference_nonmultiple_size():
    """Image size not a multiple of 16 exercises edge-tile cropping."""
    sc = _scene(n=200, width=50, height=35, seed=3)
    ref = render_reference(sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
                           sc["sh_coeffs"], sc["cam"], sc["static"], 0)
    cfg = RenderConfig(sh_degree=0, backend="jnp", max_instances=16384)
    out = render(sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
                 sc["sh_coeffs"], sc["cam"], sc["static"], cfg)
    np.testing.assert_allclose(np.asarray(out.render), np.asarray(ref["render"]),
                               atol=1e-4)


def test_background_blend():
    sc = _scene(n=5, width=32, height=32, seed=2)
    bg = jnp.array([1.0, 0.5, 0.25])
    cfg = RenderConfig(sh_degree=0, backend="jnp", max_instances=4096)
    out = render(sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
                 sc["sh_coeffs"], sc["cam"], sc["static"], cfg, bg=bg)
    # Corner pixels see no Gaussians -> pure background.
    img = np.asarray(out.render)
    np.testing.assert_allclose(img[:, 0, 0], np.asarray(bg), atol=1e-5)


def test_grad_matches_reference_renderer():
    """d(loss)/d(params) identical between tiled-jnp and naive compositors."""
    sc = _scene(n=80, width=32, height=32, seed=4)
    target = jnp.zeros((3, 32, 32))
    cfg = RenderConfig(sh_degree=0, backend="jnp", max_instances=8192)

    def loss_tiled(xyz, opacity, cam):
        out = render(xyz, sc["scales"], sc["quats"], opacity, sc["sh_coeffs"],
                     cam, sc["static"], cfg)
        return jnp.mean((out.render - target) ** 2)

    def loss_ref(xyz, opacity, cam):
        out = render_reference(xyz, sc["scales"], sc["quats"], opacity,
                               sc["sh_coeffs"], cam, sc["static"], 0)
        return jnp.mean((out["render"] - target) ** 2)

    g_t = jax.grad(loss_tiled, argnums=(0, 1, 2))(sc["xyz"], sc["opacity"], sc["cam"])
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(sc["xyz"], sc["opacity"], sc["cam"])
    np.testing.assert_allclose(np.asarray(g_t[0]), np.asarray(g_r[0]),
                               atol=1e-6, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_t[1]), np.asarray(g_r[1]),
                               atol=1e-6, rtol=1e-3)
    # Camera pose + intrinsics grads (the bundle-adjustment path).
    for leaf_t, leaf_r in zip(jax.tree_util.tree_leaves(g_t[2]),
                              jax.tree_util.tree_leaves(g_r[2])):
        np.testing.assert_allclose(np.asarray(leaf_t), np.asarray(leaf_r),
                                   atol=1e-5, rtol=1e-3)


def test_pose_grads_finite_differences():
    """Pose gradient against central finite differences on the naive renderer.

    Runs in float64 with a tiny step: the rasterizer has discrete masks
    (alpha >= 1/255, termination) whose flips would otherwise dominate the
    finite difference at larger eps.
    """
    with jax.enable_x64(True):
        sc = _scene(n=60, width=32, height=32, seed=5)
        sc = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, sc)
        target = jnp.full((3, 32, 32), 0.3, jnp.float64)

        def loss(dt):
            cam = dataclasses.replace(sc["cam"], dt=dt)
            out = render_reference(sc["xyz"], sc["scales"], sc["quats"],
                                   sc["opacity"], sc["sh_coeffs"], cam,
                                   sc["static"], 0)
            return jnp.mean((out["render"] - target) ** 2)

        g = np.asarray(jax.grad(loss)(jnp.zeros(3, jnp.float64)))
        eps = 1e-7
        for i in range(3):
            e = np.zeros(3)
            e[i] = eps
            fd = (float(loss(jnp.asarray(e))) - float(loss(jnp.asarray(-e)))) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=1e-3, atol=1e-10)


def test_probe2d_screen_space_grads():
    """Gradient w.r.t. the screen-space probe equals d(loss)/d(mean2d)."""
    sc = _scene(n=80, width=32, height=32, seed=6)
    cfg = RenderConfig(sh_degree=0, backend="jnp", max_instances=8192)
    target = jnp.zeros((3, 32, 32))

    def loss(probe):
        out = render(sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
                     sc["sh_coeffs"], sc["cam"], sc["static"], cfg,
                     probe2d=probe)
        return jnp.mean((out.render - target) ** 2)

    g = np.asarray(jax.grad(loss)(jnp.zeros((80, 2))))
    assert np.isfinite(g).all()
    assert (np.abs(g).sum(axis=-1) > 0).any()


def test_depth_map():
    """Expected-depth output: one opaque Gaussian at depth d gives
    depth_map ~= alpha * d at its center, 0 in empty space."""
    static = CameraStatic(width=32, height=32)
    cam = CameraParams.create(np.eye(3), np.zeros(3), 0.8, 0.8)
    xyz = jnp.array([[0.0, 0.0, 5.0]])
    args = (xyz, jnp.full((1, 3), 0.3), jnp.array([[1.0, 0, 0, 0]]),
            jnp.array([0.999]), jnp.zeros((1, 1, 3)), cam, static)
    for backend in ["jnp", "pallas"]:
        out = render(*args, RenderConfig(sh_degree=0, backend=backend,
                                         max_instances=1024))
        # expected depth / accumulated alpha == the Gaussian's depth exactly
        alpha = 1.0 - float(out.t_final[15, 15])
        d_center = float(out.depth_map[15, 15])
        np.testing.assert_allclose(d_center / alpha, 5.0, rtol=1e-4)
        assert float(out.depth_map[0, 0]) < 1.0


def test_binning_wide_key_fallback_matches_packed():
    """The >1M-Gaussian / >4k-tile two-operand sort path must produce the
    same bins as the packed u32 key path."""
    import jax
    import numpy as np
    from bags_tpu.core.projection import project_gaussians
    from bags_tpu.raster import binning
    from bags_tpu.utils.testing import make_toy_scene

    sc = make_toy_scene(n=600, width=96, height=80, sh_degree=0, seed=4)
    tiles_x, tiles_y = binning.tile_grid(96, 80)
    proj = jax.jit(lambda *a: project_gaussians(*a, sc["static"], 0))(
        sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
        sc["sh_coeffs"], sc["cam"])
    a = binning.bin_gaussians(proj, tiles_x, tiles_y, 4096)
    b = binning.bin_gaussians(proj, tiles_x, tiles_y, 4096,
                              force_wide_keys=True)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_binning_adaptive_packing_beyond_4095_tiles():
    """Images beyond 4095 tiles now keep the packed single-u32-key sort
    (adaptive tile/rank bit split) — bins must match the wide-key oracle.
    1088x1088 -> 68x68 = 4624 tiles (13 tile bits, 19 rank bits)."""
    import jax
    import numpy as np
    from bags_tpu.core.projection import project_gaussians
    from bags_tpu.raster import binning
    from bags_tpu.utils.testing import make_toy_scene

    wh = 1088
    sc = make_toy_scene(n=800, width=wh, height=wh, sh_degree=0, seed=6,
                        scale_range=(0.01, 0.12))
    tiles_x, tiles_y = binning.tile_grid(wh, wh)
    assert tiles_x * tiles_y > 4095
    proj = jax.jit(lambda *a: project_gaussians(*a, sc["static"], 0))(
        sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
        sc["sh_coeffs"], sc["cam"])
    a = binning.bin_gaussians(proj, tiles_x, tiles_y, 8192)
    b = binning.bin_gaussians(proj, tiles_x, tiles_y, 8192,
                              force_wide_keys=True)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    # the packed path must actually be taken at this size for a small N
    rank_bits = 32 - (tiles_x * tiles_y).bit_length()
    assert 800 < (1 << rank_bits)
