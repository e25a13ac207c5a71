"""Pallas TPU kernels for tiled front-to-back alpha compositing (fwd + bwd).

This is the TPU-native replacement for the reference's CUDA rasterizer core
(`3dgs-pose` fork of diff-gaussian-rasterization, SURVEY.md §2.3): per-tile
front-to-back compositing with transmittance termination, and a backward pass
producing per-instance gradients for means2D/conic/color/opacity. The
surrounding projection/pose gradient chain lives in XLA (core/projection.py),
so the reference's ∂viewmatrix/∂projmatrix/∂campos CUDA path becomes plain
JAX autodiff through `project_gaussians`.

TPU-first design decisions (NOT a CUDA translation):
  * One grid program per 16x16 tile; the 256 pixels are a flat lane vector.
  * Gaussians stream through in chunks of K=128 as a feature-major (16, M)
    packet array, double-buffered HBM->VMEM with async DMA, with early
    termination once every pixel of the tile saturates.
  * The sequential front-to-back recurrence is vectorized: within a chunk,
    exclusive cumulative log-transmittance is a Hillis-Steele prefix scan
    (pltpu.roll shift-adds — exact f32 on the VPU). Color + expected-depth
    accumulation is a (4,K)x(K,256) MXU matmul.
  * Backward replays chunks in forward order using the identity
      suffix_i = C_total - prefix_i
    so no back-to-front pass or atomics are needed; per-camera pose grads
    fall out of XLA's segment reductions upstream.

Numerical semantics match `reference.py`/`tiles.py` exactly (alpha clamp
0.99, skip alpha < 1/255, termination when T would drop below 1e-4).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import CHUNK, TILE
from .tiles import ALPHA_MAX, ALPHA_MIN, T_EPS, TileImage

NPIX = TILE * TILE     # 256 pixels per tile
K = CHUNK              # Gaussians per chunk == lane width (Mosaic DMA alignment)
NROWS = 16             # packet rows (9 used, padded for sublane alignment)

# Packet row indices.
R_MX, R_MY, R_CA, R_CB, R_CC, R_R, R_G, R_B, R_O, R_D = range(10)


def _interpret() -> bool:
    return os.environ.get("BAGS_TPU_PALLAS_INTERPRET", "0") == "1"


def _prefix_sum(x: jnp.ndarray, exclusive: bool) -> jnp.ndarray:
    """Prefix sum along axis 0 of (K, NPIX) — Hillis-Steele scan built from
    `pltpu.roll` shift-adds. Exact in f32 (unlike a triangular matmul, whose
    bf16 MXU passes or 6-pass HIGHEST mode cost precision or throughput;
    Mosaic has no cumsum lowering)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    s = 1
    while s < K:
        shifted = pltpu.roll(x, shift=s, axis=0)
        x = x + jnp.where(rows >= s, shifted, 0.0)
        s *= 2
    if exclusive:
        shifted = pltpu.roll(x, shift=1, axis=0)
        x = jnp.where(rows >= 1, shifted, 0.0)
    return x


def _prefix_or(x: jnp.ndarray, exclusive: bool) -> jnp.ndarray:
    """Running logical-or (as float 0/1) along axis 0 via the same scan."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    s = 1
    while s < K:
        shifted = pltpu.roll(x, shift=s, axis=0)
        x = jnp.maximum(x, jnp.where(rows >= s, shifted, 0.0))
        s *= 2
    if exclusive:
        shifted = pltpu.roll(x, shift=1, axis=0)
        x = jnp.where(rows >= 1, shifted, 0.0)
    return x


def _chunk_forward(chunk, px, py, t_run, done, valid):
    """Shared fwd math for one chunk. Returns per-chunk tensors.

    chunk: (NROWS, K); px/py: (1, NPIX); t_run/done: (1, NPIX).
    """
    mx = chunk[R_MX, :].reshape(K, 1)
    my = chunk[R_MY, :].reshape(K, 1)
    ca = chunk[R_CA, :].reshape(K, 1)
    cb = chunk[R_CB, :].reshape(K, 1)
    cc = chunk[R_CC, :].reshape(K, 1)
    op = chunk[R_O, :].reshape(K, 1)

    dx = px - mx                       # (K, NPIX)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
    ok = (alpha >= ALPHA_MIN) & (power <= 0.0) & valid
    a = jnp.where(ok, alpha, 0.0)

    log_om = jnp.log1p(-a)
    # Exclusive within-chunk log-transmittance.
    log_cum_excl = _prefix_sum(log_om, exclusive=True)
    t_before = t_run * jnp.exp(log_cum_excl)
    kill = (a > 0.0) & (t_before * (1.0 - a) < T_EPS)
    kill_f = kill.astype(jnp.float32)
    # The Gaussian that trips the termination test is itself EXCLUDED from
    # compositing (CUDA: `if (test_T < 0.0001) { done = true; continue; }`),
    # so the running prefix-or must be inclusive of the killer.
    killed_at = _prefix_or(kill_f, exclusive=False) > 0.0
    include = (a > 0.0) & ~killed_at & ~(done > 0.0)

    a_inc = jnp.where(include, a, 0.0)
    log_om_inc = jnp.log1p(-a_inc)
    t_before_inc = t_run * jnp.exp(_prefix_sum(log_om_inc, exclusive=True))
    w = a_inc * t_before_inc           # (K, NPIX)
    t_run_new = t_run * jnp.exp(jnp.sum(log_om_inc, axis=0, keepdims=True))
    done_new = jnp.maximum(done, jnp.max(kill_f, axis=0, keepdims=True))
    return dict(dx=dx, dy=dy, power=power, alpha=alpha, a_inc=a_inc, w=w,
                t_before_inc=t_before_inc, include=include,
                t_run=t_run_new, done=done_new)


def _pixel_coords(tiles_x: int):
    t = pl.program_id(0)
    tx = ((t % tiles_x) * TILE).astype(jnp.float32)
    ty = ((t // tiles_x) * TILE).astype(jnp.float32)
    off = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
    px = tx + (off % TILE).astype(jnp.float32)
    py = ty + (off // TILE).astype(jnp.float32)
    return px, py


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(tiles_x: int, max_chunks: int,
                start_ref, count_ref, pk_hbm,
                out_color, out_t, scratch, sems):
    t = pl.program_id(0)
    start = pl.multiple_of(start_ref[t], K)
    count = count_ref[t]
    n_chunks = jnp.minimum(pl.cdiv(count, K), max_chunks)
    px, py = _pixel_coords(tiles_x)

    def dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            pk_hbm.at[:, pl.ds(start + chunk_idx * K, K)],
            scratch.at[slot], sems.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    # Early termination: stop streaming chunks once every pixel in the tile
    # has saturated (done == 1 everywhere) — the chunked analogue of the
    # CUDA rasterizer's per-pixel transmittance early-out. The next chunk's
    # DMA is only started when the loop will continue, so no semaphore is
    # left signaled on early exit.
    def cond(carry):
        i, acc, t_run, done = carry
        return (i < n_chunks) & (jnp.min(done) < 0.5)

    def body(carry):
        i, acc, t_run, done = carry
        slot = jax.lax.rem(i, 2)
        dma(slot, i).wait()
        chunk = scratch[slot]
        offs = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        valid = (i * K + offs) < count
        f = _chunk_forward(chunk, px, py, t_run, done, valid)
        # rgb + expected-depth accumulation in one (4, K) x (K, NPIX) matmul
        color = jnp.stack([chunk[R_R, :], chunk[R_G, :], chunk[R_B, :],
                           chunk[R_D, :]])
        acc = acc + jax.lax.dot_general(
            color, f["w"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        @pl.when((i + 1 < n_chunks) & (jnp.min(f["done"]) < 0.5))
        def _():
            dma(1 - slot, i + 1).start()

        return i + 1, acc, f["t_run"], f["done"]

    acc0 = jnp.zeros((4, NPIX), jnp.float32)
    t0 = jnp.ones((1, NPIX), jnp.float32)
    d0 = jnp.zeros((1, NPIX), jnp.float32)
    _, acc, t_run, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), acc0, t0, d0))
    out_color[0] = acc
    out_t[0] = t_run


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(tiles_x: int, max_chunks: int,
                start_ref, count_ref, pk_hbm, g_color_ref, g_t_ref,
                c_total_ref, t_final_ref,
                dpk_hbm, scratch, dscratch, sems, dsems):
    t = pl.program_id(0)
    start = pl.multiple_of(start_ref[t], K)
    count = count_ref[t]
    n_chunks = jnp.minimum(pl.cdiv(count, K), max_chunks)
    px, py = _pixel_coords(tiles_x)

    g = g_color_ref[0]          # (4, NPIX) cotangent of rgb+depth (no bg)
    g_t = g_t_ref[0]            # (1, NPIX) cotangent of final transmittance
    c_total = c_total_ref[0]    # (4, NPIX) forward rgb+depth (no bg)
    t_final = t_final_ref[0]    # (1, NPIX)

    def dma_in(slot, chunk_idx):
        return pltpu.make_async_copy(
            pk_hbm.at[:, pl.ds(start + chunk_idx * K, K)],
            scratch.at[slot], sems.at[slot])

    def dma_out(slot, chunk_idx):
        return pltpu.make_async_copy(
            dscratch.at[slot],
            dpk_hbm.at[:, pl.ds(start + chunk_idx * K, K)], dsems.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma_in(0, 0).start()

    def body(i, carry):
        t_run, done, prefix = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_chunks)
        def _():
            dma_in(1 - slot, i + 1).start()

        dma_in(slot, i).wait()
        # Wait for the previous output DMA using this slot before overwriting.
        @pl.when(i >= 2)
        def _():
            dma_out(slot, i - 2).wait()

        chunk = scratch[slot]
        offs = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        valid = (i * K + offs) < count
        f = _chunk_forward(chunk, px, py, t_run, done, valid)
        color = jnp.stack([chunk[R_R, :], chunk[R_G, :], chunk[R_B, :],
                           chunk[R_D, :]])  # (4, K)
        a_inc, w, include = f["a_inc"], f["w"], f["include"]
        one_minus = jnp.maximum(1.0 - a_inc, 1e-6)

        # Per-channel weighted colors and inclusive prefix within the chunk.
        cw = color[:, :, None] * w[None, :, :]            # (4, K, NPIX)
        prefix_in = jnp.stack(
            [_prefix_sum(cw[c], exclusive=False) for c in range(4)]) \
            + prefix[:, None, :]
        suffix = c_total[:, None, :] - prefix_in          # (4, K, NPIX)

        # dL/dalpha_i = sum_c g_c (T_i c_i - suffix_i/(1-a_i)) - g_T T_fin/(1-a_i)
        t_before_inc = f["t_before_inc"]
        d_alpha = jnp.sum(
            g[:, None, :] * (t_before_inc[None] * color[:, :, None]
                             - suffix / one_minus[None]), axis=0)
        d_alpha = d_alpha - g_t * t_final / one_minus
        d_alpha = jnp.where(include, d_alpha, 0.0)

        # Chain to packet fields. alpha = min(0.99, o * G), G = exp(power).
        op = chunk[R_O, :].reshape(K, 1)
        G = jnp.exp(f["power"])
        unclamped = (op * G) < ALPHA_MAX
        d_aG = jnp.where(unclamped, d_alpha, 0.0)
        d_o = jnp.sum(d_aG * G, axis=1)                    # (K,)
        d_power = d_aG * op * G
        dx, dy = f["dx"], f["dy"]
        ca = chunk[R_CA, :].reshape(K, 1)
        cb = chunk[R_CB, :].reshape(K, 1)
        cc = chunk[R_CC, :].reshape(K, 1)
        d_ca = jnp.sum(-0.5 * dx * dx * d_power, axis=1)
        d_cb = jnp.sum(-dx * dy * d_power, axis=1)
        d_cc = jnp.sum(-0.5 * dy * dy * d_power, axis=1)
        d_dx = -(ca * dx + cb * dy) * d_power
        d_dy = -(cc * dy + cb * dx) * d_power
        d_mx = jnp.sum(-d_dx, axis=1)                      # dx = px - mx
        d_my = jnp.sum(-d_dy, axis=1)
        d_col = jax.lax.dot_general(                       # (4, K)
            g, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        zeros = jnp.zeros((NROWS - 10, K), jnp.float32)
        dchunk = jnp.concatenate([
            d_mx.reshape(1, K), d_my.reshape(1, K),
            d_ca.reshape(1, K), d_cb.reshape(1, K), d_cc.reshape(1, K),
            d_col[:3], d_o.reshape(1, K), d_col[3:4], zeros],
            axis=0)                                        # (NROWS, K)
        dscratch[slot] = dchunk
        dma_out(slot, i).start()

        return f["t_run"], f["done"], prefix_in[:, K - 1, :]

    t0 = jnp.ones((1, NPIX), jnp.float32)
    d0 = jnp.zeros((1, NPIX), jnp.float32)
    p0 = jnp.zeros((4, NPIX), jnp.float32)
    jax.lax.fori_loop(0, n_chunks, body, (t0, d0, p0))
    # Drain outstanding output DMAs.
    @pl.when(n_chunks >= 2)
    def _():
        dma_out(jax.lax.rem(n_chunks - 2, 2), n_chunks - 2).wait()

    @pl.when(n_chunks >= 1)
    def _():
        dma_out(jax.lax.rem(n_chunks - 1, 2), n_chunks - 1).wait()


# ---------------------------------------------------------------------------
# Host-side wrappers + custom VJP
# ---------------------------------------------------------------------------

def _pack(rows):
    """(M, >=10) instance rows [mx,my,ca,cb,cc,r,g,b,o,depth,...] ->
    feature-major (NROWS, M_pad) packets for chunked DMA."""
    m = rows.shape[0]
    m_pad = -(-m // K) * K  # aligned segments already bound all chunk reads
    pk = jnp.transpose(rows[:, :10]).astype(jnp.float32)
    return jnp.pad(pk, ((0, NROWS - 10), (0, m_pad - m)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _composite_core(packed, tile_start, tile_count, tiles_x, tiles_y):
    color, t_final = _composite_fwd_call(packed, tile_start, tile_count,
                                         tiles_x, tiles_y)
    return color, t_final


def _max_chunks(m_pad: int) -> int:
    return m_pad // K


def _composite_fwd_call(packed, tile_start, tile_count, tiles_x, tiles_y):
    num_tiles = tiles_x * tiles_y
    m_pad = packed.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 4, NPIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NPIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NROWS, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    color, t_final = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x, _max_chunks(m_pad)),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 4, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, NPIX), jnp.float32),
        ],
        interpret=_interpret(),
    )(tile_start, tile_count, packed)
    return color, t_final[:, 0, :]


def _composite_core_fwd(packed, tile_start, tile_count, tiles_x, tiles_y):
    color, t_final = _composite_fwd_call(packed, tile_start, tile_count,
                                         tiles_x, tiles_y)
    return (color, t_final), (packed, tile_start, tile_count, color, t_final)


def _composite_core_bwd(tiles_x, tiles_y, res, cts):
    packed, tile_start, tile_count, color, t_final = res
    g_color, g_t = cts
    num_tiles = tiles_x * tiles_y
    m_pad = packed.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                     # packets
            pl.BlockSpec((1, 4, NPIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                    # g_color
            pl.BlockSpec((1, 1, NPIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                    # g_t
            pl.BlockSpec((1, 4, NPIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                    # c_total
            pl.BlockSpec((1, 1, NPIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                    # t_final
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, NROWS, K), jnp.float32),
            pltpu.VMEM((2, NROWS, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    d_packed = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x, _max_chunks(m_pad)),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NROWS, m_pad), jnp.float32)],
        interpret=_interpret(),
    )(tile_start, tile_count, packed,
      g_color, g_t[:, None, :],
      color, t_final[:, None, :])[0]

    # Slots past the last tile's aligned segment are never written by any
    # kernel program and hold uninitialized memory — mask them out. (Padding
    # slots inside segments ARE written, with exact zeros, since their
    # opacity is 0.)
    n_aligned = jnp.max(tile_start + (-(-tile_count // K)) * K)
    slot_ids = jnp.arange(m_pad, dtype=jnp.int32)
    d_packed = jnp.where(slot_ids[None, :] < n_aligned, d_packed, 0.0)
    return d_packed, None, None


_composite_core.defvjp(_composite_core_fwd, _composite_core_bwd)


def composite_tiles_pallas(rows, tile_start, tile_count, tiles_x, tiles_y,
                           bg) -> TileImage:
    """Pallas compositor over packed instance rows (M, >=10):
    [mx, my, conic_a, conic_b, conic_c, r, g, b, opacity, depth].
    Returns rgb (bg-blended), expected depth, and final transmittance."""
    packed = _pack(rows)
    out, t_final = _composite_core(packed, tile_start, tile_count,
                                   tiles_x, tiles_y)
    out = jnp.transpose(out, (0, 2, 1))                # (T, NPIX, 4)
    color = out[..., :3] + t_final[..., None] * bg[None, None, :]
    return TileImage(color=color, t_final=t_final, depth=out[..., 3])
