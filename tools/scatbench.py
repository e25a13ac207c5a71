"""Scatter/segment-reduction variants for the gather backward, on-chip."""

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
    n = 100_000
    m = 1_368_576
    rng = np.random.default_rng(0)
    # rank_sorted-like: sorted-ish duplicates in [0, n], n = pad sentinel
    idx = jnp.asarray(np.sort(rng.integers(0, n + 1, size=m)), jnp.int32)
    idx_unsorted = jnp.asarray(rng.integers(0, n + 1, size=m), jnp.int32)
    aug = jnp.asarray(rng.standard_normal((12, m)), jnp.float32)
    augT = jnp.asarray(rng.standard_normal((m, 12)), jnp.float32)

    def report(name, t):
        print(f"{name:40s}: {t * 1e3:7.2f} ms")

    def fA(eps):
        return jnp.zeros((12, n + 1), jnp.float32).at[:, idx].add(aug + eps)
    report("A col-scatter (12,n+1).at[:,idx]", timed_chain(fA, None))

    def fB(eps):
        t0 = jnp.zeros((12, n + 1), jnp.float32)
        _, vjp = jax.vjp(lambda t: jnp.take(t, idx, axis=1), t0)
        return vjp(aug + eps)
    report("B vjp-of-take axis=1", timed_chain(fB, None))

    def fD(eps):
        return jnp.zeros((n + 1, 12), jnp.float32).at[idx].add(augT + eps)
    report("D row-scatter (n+1,12).at[idx]", timed_chain(fD, None))

    def fE(eps):
        return jnp.zeros((n + 1, 12), jnp.float32).at[idx_unsorted].add(
            augT + eps)
    report("E row-scatter unsorted idx", timed_chain(fE, None))

    def fF(eps):
        # segment_sum on transposed layout
        return jax.ops.segment_sum(augT + eps, idx, num_segments=n + 1)
    report("F segment_sum rows (sorted idx)", timed_chain(fF, None))

    def fG(eps):
        return jax.ops.segment_sum(
            augT + eps, idx, num_segments=n + 1,
            indices_are_sorted=True)
    report("G segment_sum rows sorted=True", timed_chain(fG, None))

    # H: col scatter but idx ascending + unique_indices False vs sorted flag
    def fH(eps):
        seg = jax.vmap(lambda row: jax.ops.segment_sum(
            row, idx, num_segments=n + 1, indices_are_sorted=True))(aug + eps)
        return seg
    report("H vmapped 1d segment_sum sorted", timed_chain(fH, None))


if __name__ == "__main__":
    main()
