"""Throwaway experiment: gather/scatter/sort layout variants on the chip."""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bags_tpu.utils.cache import enable_persistent_cache


_FLOOR = [0.0]


def timed(fn, *args, reps=10):
    # Force a host scalar fetch per call: block_until_ready does not
    # synchronize through this image's axon TPU tunnel. The tunnel
    # round-trip floor (measured once) is subtracted.
    def wrapped(*a):
        out = fn(*a)
        return sum(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))

    g = jax.jit(wrapped)
    float(g(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2] - _FLOOR[0]


def main():
    enable_persistent_cache()
    _FLOOR[0] = timed(lambda x: x * 2.0, jnp.ones(8, jnp.float32)) - _FLOOR[0]
    print(f"tunnel floor                      : {_FLOOR[0]*1e3:7.2f} ms")
    n, m = 100_000, 1_048_576
    rng = np.random.default_rng(0)
    gid = jnp.asarray(rng.integers(0, n, size=m), jnp.int32)
    table = jnp.asarray(rng.standard_normal((n, 12)), jnp.float32)
    tableT = jnp.asarray(rng.standard_normal((12, n)), jnp.float32)
    flats = tuple(jnp.asarray(rng.standard_normal(n), jnp.float32)
                  for _ in range(12))

    # --- gathers ---
    t_row = timed(lambda t, g: jnp.take(t, g, axis=0), table, gid)
    print(f"gather rows (m,12) from (n,12)    : {t_row*1e3:7.2f} ms")

    t_lane = timed(lambda t, g: jnp.take(t, g, axis=1), tableT, gid)
    print(f"gather lanes (12,m) from (12,n)   : {t_lane*1e3:7.2f} ms")

    def flat_gather(g, *fs):
        return jnp.stack([jnp.take(f, g) for f in fs])

    t_flat = timed(flat_gather, gid, *flats)
    print(f"12 flat gathers -> stack (12,m)   : {t_flat*1e3:7.2f} ms")

    def flat_gather_nostack(g, *fs):
        return [jnp.take(f, g) for f in fs]

    t_flatn = timed(flat_gather_nostack, gid, *flats)
    print(f"12 flat gathers (no stack)        : {t_flatn*1e3:7.2f} ms")

    # --- scatters (VJP of gather) ---
    drows = jnp.asarray(rng.standard_normal((m, 12)), jnp.float32)
    drowsT = jnp.asarray(rng.standard_normal((12, m)), jnp.float32)
    dflat = jnp.asarray(rng.standard_normal(m), jnp.float32)

    t_srow = timed(lambda d, g: jnp.zeros((n, 12), jnp.float32).at[g].add(d),
                   drows, gid)
    print(f"scatter-add rows (m,12) -> (n,12) : {t_srow*1e3:7.2f} ms")

    def scat_flat(d, g):
        return [jnp.zeros(n, jnp.float32).at[g].add(d[i]) for i in range(12)]

    t_sflat = timed(scat_flat, drowsT, gid)
    print(f"12 flat scatter-adds              : {t_sflat*1e3:7.2f} ms")

    t_sflat1 = timed(lambda d, g: jnp.zeros(n, jnp.float32).at[g].add(d),
                     dflat, gid)
    print(f"1 flat scatter-add (m,)->(n,)     : {t_sflat1*1e3:7.2f} ms")

    # segment-sum alternative
    t_seg = timed(lambda d, g: jax.ops.segment_sum(d, g, num_segments=n),
                  dflat, gid)
    print(f"segment_sum flat                  : {t_seg*1e3:7.2f} ms")

    # --- sorts ---
    keys32 = jnp.asarray(rng.integers(0, 2**31, size=m), jnp.int32)
    keysu = keys32.astype(jnp.uint32)
    depth = jnp.asarray(rng.standard_normal(m), jnp.float32)
    payload = jnp.arange(m, dtype=jnp.int32)

    t_s1 = timed(lambda k: jax.lax.sort(k), keysu)
    print(f"sort 1M u32 single operand        : {t_s1*1e3:7.2f} ms")

    t_s2 = timed(lambda k, p: jax.lax.sort((k, p), num_keys=1), keysu, payload)
    print(f"sort 1M u32 + i32 payload         : {t_s2*1e3:7.2f} ms")

    t_s3 = timed(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2),
                 keys32, depth, payload)
    print(f"sort 1M (i32,f32) keys + payload  : {t_s3*1e3:7.2f} ms")

    n_small = 131072
    ksmall = keysu[:n_small]
    t_s4 = timed(lambda k, p: jax.lax.sort((k, p), num_keys=1),
                 ksmall, payload[:n_small])
    print(f"sort 128k u32 + payload           : {t_s4*1e3:7.2f} ms")

    # argsort-based permutation inverse
    t_inv = timed(lambda p: jnp.zeros(m, jnp.int32).at[p].set(
        jnp.arange(m, dtype=jnp.int32)), payload)
    print(f"perm-inverse scatter (unique ids) : {t_inv*1e3:7.2f} ms")

    # cumsum over 1M
    t_cs = timed(lambda d: jnp.cumsum(d), dflat)
    print(f"cumsum (1M,) f32                  : {t_cs*1e3:7.2f} ms")
    t_cs2 = timed(lambda d: jnp.cumsum(d, axis=1), drowsT)
    print(f"cumsum (12,1M) f32 axis=1         : {t_cs2*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
