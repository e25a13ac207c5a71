#!/bin/bash
# Run the full on-chip validation ladder after TPU recovery/changes:
# dispatch-overhead probe -> kernel-parity pytest lane -> bench -> profile.
# One TPU client at a time.
set -x
cd /root/repo
timeout 600 python -u -c "
import time
import jax, jax.numpy as jnp
x = jnp.ones((256,), jnp.float32)
f = jax.jit(lambda x: x * 1.0000001)
y = f(x); jax.block_until_ready(y)
float(y[0])
t0 = time.perf_counter()
N = 200
for _ in range(N):
    y = f(y)
jax.block_until_ready(y); float(y[0])
dt = (time.perf_counter() - t0) / N
print(f'per-dispatch overhead (trivial jit, {N}x chained): {dt*1e3:.3f} ms')
" 2>&1 | tail -2
timeout 1800 env BAGS_TPU_TEST_TPU=1 python -m pytest tests/test_tpu.py -m tpu -q 2>&1 | tail -4
timeout 900 python bench.py 2>&1 | tail -2
timeout 900 python profile.py 2>&1 | tail -8
timeout 900 python tools/mesh1_parity.py 2>&1 | tail -4
