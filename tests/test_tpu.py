"""Real-chip regression lane (`BAGS_TPU_TEST_TPU=1 pytest -m tpu`).

Runs the Pallas kernels in COMPILED (Mosaic) mode on the TPU — the DMA /
semaphore / early-termination code paths the CPU interpret-mode suite never
executes — and compares forward renders + gradients against the jnp oracle
evaluated on the host CPU device in the same process.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

_ON_TPU = (os.environ.get("BAGS_TPU_TEST_TPU", "0") == "1")
if _ON_TPU:
    import jax

    _ON_TPU = jax.default_backend() == "tpu"

skip_unless_tpu = pytest.mark.skipif(
    not _ON_TPU, reason="requires BAGS_TPU_TEST_TPU=1 and a real TPU")


def _scene(n=20_000, wh=256):
    from bags_tpu.utils.testing import make_toy_scene

    sc = make_toy_scene(n=n, width=wh, height=wh, sh_degree=2, seed=3,
                        scale_range=(0.01, 0.05))
    return sc, (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
                sc["sh_coeffs"], sc["cam"])


@skip_unless_tpu
def test_pallas_chip_parity_fwd_and_grads():
    import jax
    import jax.numpy as jnp

    from bags_tpu.raster import RenderConfig, render

    sc, args = _scene()
    cpu = jax.devices("cpu")[0]

    def loss(cfg, *a):
        out = render(*a, sc["static"], cfg)
        return jnp.mean(out.render ** 2) + jnp.mean(out.t_final), out.render

    # Pallas (Mosaic) on the chip
    cfg_p = RenderConfig(sh_degree=2, backend="pallas", max_instances=2**19)
    (l_p, img_p), g_p = jax.jit(jax.value_and_grad(
        lambda *a: loss(cfg_p, *a), argnums=(0, 1, 2, 3), has_aux=True))(
            *args)

    # jnp oracle on the host CPU device
    cfg_j = RenderConfig(sh_degree=2, backend="jnp", max_instances=2**19,
                         max_per_tile=1024)
    cpu_args = jax.device_put(args, cpu)
    with jax.default_device(cpu):
        (l_j, img_j), g_j = jax.jit(jax.value_and_grad(
            lambda *a: loss(cfg_j, *a), argnums=(0, 1, 2, 3),
            has_aux=True))(*cpu_args)

    assert float(jnp.max(jnp.abs(np.asarray(img_p) - np.asarray(img_j)))) \
        < 5e-4
    for i, name in enumerate(["xyz", "scales", "quats", "opacity"]):
        a = np.asarray(g_j[i])
        b = np.asarray(g_p[i])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
        assert rel < 5e-3, f"{name} grad rel diff {rel}"


@skip_unless_tpu
def test_pallas_chip_overflow_reports_dropped():
    import jax
    import jax.numpy as jnp

    from bags_tpu.raster import RenderConfig, render

    sc, args = _scene(n=20_000, wh=256)
    cfg = RenderConfig(sh_degree=2, backend="pallas", max_instances=4096)
    out = jax.jit(lambda *a: render(*a, sc["static"], cfg))(*args)
    assert int(out.n_dropped) > 0
    assert bool(jnp.all(jnp.isfinite(out.render)))
    # gradients through the truncated frame stay finite
    g = jax.jit(jax.grad(
        lambda *a: jnp.mean(render(*a, sc["static"], cfg).render ** 2)))(
            *args)
    assert bool(jnp.all(jnp.isfinite(g)))


@skip_unless_tpu
def test_pallas_chip_early_termination_opaque():
    """Fully-opaque near splats saturate every pixel: the early-termination
    path (fwd + bwd zero-fill) must still produce exact gradients for the
    visible front and zeros for occluded splats."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bags_tpu.raster import RenderConfig, render

    sc, args = _scene(n=5_000, wh=128)
    opaque = jnp.minimum(args[3] + 0.95, 0.995)
    args = (args[0], args[1], args[2], opaque, args[4], args[5])
    cfg = RenderConfig(sh_degree=2, backend="pallas", max_instances=2**18)
    out = jax.jit(lambda *a: render(*a, sc["static"], cfg))(*args)
    # enough pixels saturate to exercise the termination/zero-fill paths
    assert float(jnp.mean(out.t_final < 1e-3)) > 0.03

    cpu = jax.devices("cpu")[0]
    cfg_j = RenderConfig(sh_degree=2, backend="jnp", max_instances=2**18,
                         max_per_tile=1024)

    def loss(cfg_, *a):
        return jnp.mean(render(*a, sc["static"], cfg_).render ** 2)

    g_p = jax.jit(jax.grad(lambda *a: loss(cfg, *a), argnums=(0, 3)))(*args)
    with jax.default_device(cpu):
        g_j = jax.jit(jax.grad(lambda *a: loss(cfg_j, *a), argnums=(0, 3)))(
            *jax.device_put(args, cpu))
    for i, name in enumerate(["xyz", "opacity"]):
        a, b = np.asarray(g_j[i]), np.asarray(g_p[i])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
        assert rel < 5e-3, f"{name} grad rel diff {rel}"


@pytest.mark.tpu
def test_pallas_chip_unaligned_spill_grads():
    """Real-Mosaic check of binning v3's cross-tile spill writes + the
    cross-program DMA handoff: many small splats, unaligned tile counts."""
    import jax
    import jax.numpy as jnp

    from bags_tpu.raster import RenderConfig, render
    from bags_tpu.utils.testing import make_toy_scene

    if jax.default_backend() != "tpu":
        pytest.skip("needs the real chip")
    sc = make_toy_scene(n=700, width=64, height=48, sh_degree=0, seed=21,
                        scale_range=(0.01, 0.05))
    target = jnp.zeros((3, 48, 64))

    def loss(backend, xyz, opac):
        cfg = RenderConfig(sh_degree=0, backend=backend, max_instances=16384)
        out = render(xyz, sc["scales"], sc["quats"], opac, sc["sh_coeffs"],
                     sc["cam"], sc["static"], cfg)
        return jnp.mean((out.render - target) ** 2)

    gj = jax.jit(jax.grad(lambda *a: loss("jnp", *a), argnums=(0, 1)))(
        sc["xyz"], sc["opacity"])
    gp = jax.jit(jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1)))(
        sc["xyz"], sc["opacity"])
    for a, b in zip(gj, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=2e-6)


@pytest.mark.tpu
def test_pallas_chip_vmap_batched_views():
    """Real-Mosaic check that vmap over the compositing kernels (the
    --batch_cams path) matches per-view rendering."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bags_tpu.raster import RenderConfig, render
    from bags_tpu.utils.testing import make_toy_scene

    if jax.default_backend() != "tpu":
        pytest.skip("needs the real chip")
    sc = make_toy_scene(n=300, width=64, height=48, sh_degree=0, seed=5)
    cfg = RenderConfig(sh_degree=0, backend="pallas", max_instances=8192)
    cams = [dataclasses.replace(sc["cam"], dt=jnp.array([0.02 * i, 0., 0.]))
            for i in range(3)]
    cam_b = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *cams)

    def one(cam):
        return render(sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
                      sc["sh_coeffs"], cam, sc["static"], cfg).render

    seq = jnp.stack([jax.jit(one)(c) for c in cams])
    bat = jax.jit(jax.vmap(one))(cam_b)
    np.testing.assert_allclose(np.asarray(bat), np.asarray(seq), atol=1e-6)
