"""Sorted-segment reduction via blocked prefix sums (MXU triangular matmuls).

The rasterizer backward needs per-Gaussian sums of per-instance gradient rows
(the reference does this with CUDA atomicAdd). XLA's scatter-add lowering
costs ~15 ms per 2^20 rows on v5e — it serializes on duplicate indices — so
instead we exploit that binning (`binning.py`) already knows a permutation
(`order2`) grouping every Gaussian's instances contiguously:

    segment_sum = diff-of-prefix at segment boundaries,

with the prefix computed hierarchically: within 128-column blocks as an
(F, m/128, 128) x (128, 128) upper-triangular matmul on the MXU (f32 HIGHEST,
exact FMA accumulation, full 128-lane output), plus a recursive prefix over
block totals. Total cost ~0.5 ms per 16 x 2^20 — ~30x cheaper than the
scatter.

Precision: within-block prefixes are exact-f32 matmul accumulations; only the
(m/128,) block-total prefix spans globally-growing magnitudes, and its
contribution cancels exactly for segments inside one block (the common case —
mean segment length is the mean tile coverage, ~6) and to ~eps * blocks-spanned
otherwise, which parity tests against the jnp oracle confirm is < 1e-6.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BLOCK = 128


def blocked_inclusive_prefix(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along axis 1 of (F, m) f32, m padded internally."""
    f, m = x.shape
    m_pad = -(-m // _BLOCK) * _BLOCK
    if m_pad != m:
        x = jnp.pad(x, ((0, 0), (0, m_pad - m)))
    xb = x.reshape(f, m_pad // _BLOCK, _BLOCK)
    # U[j, i] = 1 for j <= i: out[f, r, i] = sum_{j<=i} x[f, r, j]
    upper = jnp.triu(jnp.ones((_BLOCK, _BLOCK), jnp.float32))
    within = jnp.einsum("frj,ji->fri", xb, upper,
                        precision=jax.lax.Precision.HIGHEST)
    totals = within[..., -1]                       # (F, R)
    if totals.shape[1] > _BLOCK:
        pre_incl = blocked_inclusive_prefix(totals)
    else:
        pre_incl = jnp.cumsum(totals, axis=1)
    excl = pre_incl - totals
    out = (within + excl[..., None]).reshape(f, m_pad)
    return out[:, :m]


def segment_sum_sorted(cols: jnp.ndarray, seg_cum: jnp.ndarray,
                       seg_len: jnp.ndarray) -> jnp.ndarray:
    """Per-segment sums of `cols` (F, m) whose segments are contiguous:
    segment r occupies columns [seg_cum[r] - seg_len[r], seg_cum[r]).
    Returns (F, n_segments). Columns past seg_cum[-1] are ignored."""
    prefix = blocked_inclusive_prefix(cols)
    padded = jnp.concatenate(
        [jnp.zeros((cols.shape[0], 1), cols.dtype), prefix], axis=1)
    hi = jnp.take(padded, seg_cum, axis=1)
    lo = jnp.take(padded, seg_cum - seg_len, axis=1)
    return hi - lo
