"""Marginal costs of the post-composite loss chain (fwd+bwd), isolated
from the rasterizer: tile->image assembly, L1, SSIM, full photometric.
Inputs are synthetic (2500, 256, 3) tile colors at the bench's 800x800
geometry so jax.grad flows exactly like the train step's image branch."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bags_tpu.utils.cache import enable_persistent_cache
from tools.stagebench import timed_chain


def main():
    enable_persistent_cache()

    from bags_tpu.raster import tiles
    from bags_tpu.train.losses import l1_loss, photometric_loss, ssim

    wh = 800
    tiles_x = tiles_y = wh // 16
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.uniform(0, 1, (tiles_x * tiles_y, 256, 3))
                        .astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (3, wh, wh)).astype(np.float32))

    def report(name, t):
        print(f"{name:28s}: {t * 1e3:7.2f} ms")

    def asm(c):
        return tiles.tiles_to_image(c, tiles_x, tiles_y, wh, wh)

    report("assembly + sum", timed_chain(
        lambda eps: jax.grad(lambda c: jnp.sum(asm(c)))(color + eps), None))
    report("assembly + L1", timed_chain(
        lambda eps: jax.grad(lambda c: l1_loss(asm(c), gt))(color + eps),
        None))
    report("assembly + SSIM", timed_chain(
        lambda eps: jax.grad(lambda c: ssim(asm(c), gt))(color + eps),
        None))
    report("assembly + photometric", timed_chain(
        lambda eps: jax.grad(
            lambda c: photometric_loss(asm(c), gt))(color + eps), None))


if __name__ == "__main__":
    main()
