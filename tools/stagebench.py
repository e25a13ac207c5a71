"""Reliable per-stage timings on the real chip.

The axon tunnel adds a noisy ~30-40 ms host round-trip per fetch and
`block_until_ready` does not synchronize, so single-dispatch timing is
useless. This harness chains K invocations of the op inside ONE jit with a
scalar data dependency (defeats CSE, forces serialization), fetches one
scalar, and reports (t - floor) / K.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bags_tpu.utils.cache import enable_persistent_cache

KCHAIN = 16


def _first_scalar(out):
    return sum(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(out))


def timed_chain(f, perturb, reps=7, k=KCHAIN):
    """f: args-closed thunk taking a scalar eps; returns pytree.
    perturb threads eps into f's computation to serialize iterations."""

    @jax.jit
    def run(eps):
        def body(c, _):
            out = f(c)
            return _first_scalar(out) * 1e-30 + eps, None
        c, _ = jax.lax.scan(body, eps, None, length=k)
        return c

    float(run(jnp.float32(0.0)))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(jnp.float32(0.0)))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2] / k


def main():
    enable_persistent_cache()

    from bags_tpu.core.projection import project_gaussians
    from bags_tpu.raster import RenderConfig, binning, render
    from bags_tpu.raster.render import FEATS, F_ACTIVE, gather_rows
    from bags_tpu.raster.pallas_raster import composite_tiles_pallas
    from bags_tpu.train.losses import photometric_loss
    from bags_tpu.utils.testing import make_toy_scene

    n, wh, mi = 100_000, 800, 2 ** 20
    sc = make_toy_scene(n=n, width=wh, height=wh, sh_degree=3, seed=0,
                        scale_range=(0.008, 0.035))
    static = sc["static"]
    a = (sc["xyz"], sc["scales"], sc["quats"], sc["opacity"],
         sc["sh_coeffs"], sc["cam"])
    tiles_x, tiles_y = binning.tile_grid(wh, wh)
    gt = jnp.zeros((3, wh, wh), jnp.float32)
    cfg = RenderConfig(sh_degree=3, backend="auto", max_instances=mi)

    proj = jax.jit(lambda *x: project_gaussians(*x, static, 3))(*a)
    bins = jax.jit(
        lambda pr: binning.bin_gaussians(pr, tiles_x, tiles_y, mi))(proj)
    print("n_instances:", int(bins.n_instances),
          "m_aligned:", bins.gauss_id.shape[0])

    def report(name, t):
        print(f"{name:26s}: {t * 1e3:7.2f} ms")

    import dataclasses

    # --- binning ---
    def f_bin(eps):
        pr = dataclasses.replace(proj, x2d=proj.x2d + eps)
        b = binning.bin_gaussians(pr, tiles_x, tiles_y, mi)
        return (b.rank_sorted, b.tile_start, b.tile_count, b.rank_of,
                b.order2)
    report("binning (hot outputs)", timed_chain(f_bin, None))

    # full render forward + loss forward (bisection vs the full grad step)
    def f_render_fwd(eps):
        return render(a[0] + eps, *a[1:], static, cfg).render
    report("render fwd (full)", timed_chain(f_render_fwd, None))

    def f_loss_fwd(eps):
        out = render(a[0] + eps, *a[1:], static, cfg)
        return photometric_loss(out.render, gt)
    report("render+loss fwd", timed_chain(f_loss_fwd, None))

    # --- gather fwd ---
    table0 = jnp.zeros((FEATS, n + 1), jnp.float32)
    absp = jnp.zeros((n, 2), jnp.float32)

    def f_gather(eps):
        return gather_rows(table0 + eps, absp, bins)
    report("gather fwd", timed_chain(f_gather, None))

    # --- gather vjp (bwd only, via vjp of closed fwd) ---
    rows0 = jax.jit(lambda e: gather_rows(table0 + e, absp, bins))(0.0)
    _, vjp_fn = jax.vjp(lambda t: gather_rows(t, absp, bins), table0)

    def f_gather_bwd(eps):
        return vjp_fn(rows0 + eps)
    report("gather bwd (segsum)", timed_chain(f_gather_bwd, None))

    # --- composite fwd ---
    rows = jax.jit(lambda: gather_rows(
        jnp.pad(jnp.stack(
            [proj.x2d, proj.y2d, proj.conic_a, proj.conic_b, proj.conic_c,
             proj.col_r, proj.col_g, proj.col_b, proj.opacity, proj.depth]
            + [jnp.zeros_like(proj.x2d)] * (FEATS - F_ACTIVE), axis=0),
            ((0, 0), (0, 1))), absp, bins))()
    bgv = jnp.zeros(3)

    def f_comp(eps):
        return composite_tiles_pallas(
            rows + eps * 0, bins.tile_start, bins.tile_count,
            tiles_x, tiles_y, bgv).color
    report("composite fwd", timed_chain(f_comp, None))

    def comp_only(r):
        return composite_tiles_pallas(r, bins.tile_start, bins.tile_count,
                                      tiles_x, tiles_y, bgv).color
    col0, comp_vjp = jax.vjp(comp_only, rows)

    def f_comp_bwd(eps):
        return comp_vjp(col0 + eps)
    report("composite bwd", timed_chain(f_comp_bwd, None))

    # --- projection fwd+bwd ---
    def f_proj(eps):
        def pf(xyz):
            pr = project_gaussians(xyz, *a[1:5], a[5], static, 3)
            return pr.x2d
        out, vjp = jax.vjp(pf, a[0] + eps)
        return vjp(out)
    report("projection fwd+bwd", timed_chain(f_proj, None))

    # --- ssim loss fwd+bwd ---
    img0 = jnp.zeros((3, wh, wh), jnp.float32)

    def f_loss(eps):
        return jax.grad(lambda x: photometric_loss(x, gt))(img0 + eps)
    report("ssim loss fwd+bwd", timed_chain(f_loss, None))

    # --- full step ---
    def loss_fn(xyz, scales, quats, opacity, sh, cam):
        out = render(xyz, scales, quats, opacity, sh, cam, static, cfg)
        return photometric_loss(out.render, gt)

    def f_step(eps):
        return jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5))(
            a[0] + eps, *a[1:])
    t_step = timed_chain(f_step, None, k=8)
    report("FULL fwd+bwd step", t_step)
    print(f"  -> {wh * wh / t_step / 1e6:.2f} Mpix/s")


if __name__ == "__main__":
    main()
