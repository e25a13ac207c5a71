"""Pallas TPU kernels for tiled front-to-back alpha compositing (fwd + bwd).

This is the TPU-native replacement for the reference's CUDA rasterizer core
(`3dgs-pose` fork of diff-gaussian-rasterization, SURVEY.md §2.3): per-tile
front-to-back compositing with transmittance termination, and a backward pass
producing per-instance gradients for means2D/conic/color/opacity. The
surrounding projection/pose gradient chain lives in XLA (core/projection.py),
so the reference's ∂viewmatrix/∂projmatrix/∂campos CUDA path becomes plain
JAX autodiff through `project_gaussians`.

TPU-first design decisions (NOT a CUDA translation):
  * One grid program per TILE_W x TILE_H tile (16x16, measured best —
    see binning.py). Layout: GAUSSIANS ON LANES, PIXELS ON SUBLANES. Instance rows stream as feature-major (FEATS, K=128) slabs
    (contiguous 512B-per-row DMA, lane dim 128-aligned); each feature slice
    chunk[f:f+1, :] is natively a (1, K) lane vector and every per-pixel
    carry is a (NPIX, 1) sublane vector — zero relayouts in the inner loop,
    and the per-instance reductions for the backward land directly as
    (1, K) rows of the output slab.
  * Double-buffered HBM->VMEM async DMA with early termination once every
    pixel of the tile saturates.
  * The sequential front-to-back recurrence is vectorized with ONE exclusive
    prefix scan of log-transmittance per chunk (Hillis-Steele pltpu.roll
    shift-adds along lanes — exact f32 on the VPU); the termination point is
    a cheap min-reduction over the kill mask rather than two more scans (the
    first killed index is a prefix-closed property, so `t_before` from the
    single scan is already correct for every included Gaussian).
  * Color + expected-depth accumulation is a (4,K) x (NPIX,K)^T MXU matmul.
  * Backward replays chunks in forward order using the identity
      suffix_i = <g, C_total> - prefix_i<g, c w>
    — the 4-channel suffix the CUDA kernel tracks back-to-front collapses to
    ONE scalar scan because the image cotangent g is constant across the
    chunk. No back-to-front pass, no atomics; per-Gaussian reduction happens
    upstream in render.py's gather VJP.

Numerical semantics match `reference.py`/`tiles.py` exactly (alpha clamp
0.99, skip alpha < 1/255, termination when T would drop below 1e-4, the
killing Gaussian itself excluded).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import CHUNK, TILE_H, TILE_W, padded_chunks
from .tiles import ALPHA_MAX, ALPHA_MIN, T_EPS, TileImage

NPIX = TILE_W * TILE_H  # pixels per tile
K = CHUNK              # Gaussians per chunk == lane width (Mosaic DMA alignment)
FEATS = 16             # packet rows (10 used, padded for alignment)
# Forward streaming width (env override for A/B perf runs; 256 = 2 binning
# chunks per loop iteration). Measured ~neutral on the bench workload at
# mean tile occupancy ~1.4 chunks (isolated-kernel gains are offset by
# coarser masking/early-termination granularity), so the default stays K.
# The backward stays at K: its padded output layout is keyed to K windows.
FWD_LANES = int(os.environ.get("BAGS_TPU_FWD_LANES", str(K)))

# Packet row indices.
R_MX, R_MY, R_CA, R_CB, R_CC, R_O, R_R, R_G, R_B, R_D = range(10)


def _interpret() -> bool:
    return os.environ.get("BAGS_TPU_PALLAS_INTERPRET", "0") == "1"


# Mosaic supports only DEFAULT (bf16) and HIGHEST (exact-f32 passes) dot
# precisions; transmittance math needs f32 in exact mode, so HIGHEST.
_MM_PREC = jax.lax.Precision.HIGHEST


def _mm_prec(terms: int):
    """Matmul precision policy for TRUE matmuls (non-0/1 operands): fast
    mode (terms=1) runs DEFAULT (ONE bf16 pass per operand pair, f32
    accumulation); exact2/exact (terms>=2) run HIGHEST (6 bf16 passes,
    f32-exact) — Mosaic supports only these two dot precisions, and these
    sites are minor next to the split-term prefix scans. Accumulators stay
    f32 either way."""
    return jax.lax.Precision.DEFAULT if terms == 1 else \
        jax.lax.Precision.HIGHEST


def _split3(x: jnp.ndarray):
    """Exact 3-term bf16 decomposition of f32: x == x0 + x1 + x2 to within
    2^-25 relative (3 x 8 mantissa bits cover f32's 24). Each residual
    subtraction is exact in f32 (the leading bits cancel exactly).

    Precondition: |x| < bf16 max normal (~3.39e38) — larger f32 values round
    to inf in the first cast, making r1 = x - inf = NaN. All callers here
    feed bounded integrands (prefix-sum operands in [0, 1])."""
    x0 = x.astype(jnp.bfloat16)
    r1 = x - x0.astype(jnp.float32)
    x1 = r1.astype(jnp.bfloat16)
    x2 = (r1 - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    return x0, x1, x2


def _split_terms(x: jnp.ndarray, terms: int):
    """bf16 operand decomposition for exact-via-split matmuls against 0/1
    matrices: `terms` leading bf16 terms of the exact 3-term decomposition.
    terms=3 is f32-exact (2^-25); terms=2 is the exact2 midpoint (~2^-17
    operand rounding, two one-pass matmuls); terms=1 is fast mode (~2^-9,
    one pass). f32 accumulation in all modes."""
    if terms == 1:
        return (x.astype(jnp.bfloat16),)
    return _split3(x)[:terms]


def _lane_prefix_sum(x: jnp.ndarray, exclusive: bool,
                     terms: int = 3) -> jnp.ndarray:
    """Prefix sum along axis 1 (lanes) of (NPIX, L) as triangular
    (NPIX, L) x (L, L) matmuls on the MXU, freeing the VPU (the kernel's
    bottleneck) of the 21-op Hillis-Steele shift-add scan. Mosaic has no
    cumsum lowering.

    Precision: the triangular matrix is 0/1 (exact in bf16), so splitting
    only the data operand into three bf16 terms gives f32-exact products in
    THREE one-pass bf16 matmuls — half the MXU passes of a HIGHEST f32
    matmul (6), with the same f32 accumulation. Fast mode keeps only the
    leading bf16 term: ONE pass, <= 2^-9 relative operand rounding."""
    lanes = x.shape[1]
    r = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (lanes, lanes), 1)
    tri = ((r < c) if exclusive else (r <= c)).astype(jnp.bfloat16)
    out = None
    for part in _split_terms(x, terms):
        term = jax.lax.dot_general(
            part, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = term if out is None else out + term
    return out


def _lane_sum(x: jnp.ndarray, terms: int = 3) -> jnp.ndarray:
    """(NPIX, L) -> (NPIX, 1) row sums on the MXU (ones matvec)."""
    ones = jnp.ones((x.shape[1], 1), jnp.float32)
    return jax.lax.dot_general(
        x, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mm_prec(terms))


def _pix_sum(x: jnp.ndarray) -> jnp.ndarray:
    """(NPIX, K) -> (1, K) column sums on the MXU (ones vecmat)."""
    ones = jnp.ones((1, NPIX), jnp.float32)
    return jax.lax.dot_general(
        ones, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_MM_PREC)


def _chunk_forward(chunk, px, py, t_run, done, valid, terms: int = 3):
    """Shared fwd math for one chunk. Returns per-chunk tensors.

    chunk: (FEATS, K); px/py: (NPIX, 1); t_run/done: (NPIX, 1);
    valid: (1, K); terms: bf16 split-term count for scans/reductions (see _split_terms).

    One MXU scan, no index search: t_before comes from the exclusive prefix
    of log(1-a) over ALL candidate alphas. Because t_before is non-increasing
    along the lane axis, every Gaussian at-or-after the terminating one with
    a > 0 also trips the kill test, so `include = ok & ~kill & ~done` equals
    the CUDA "first-kill cuts the stream" semantics exactly — no
    first-kill-index min-reduction needed.
    """
    mx = chunk[R_MX:R_MX + 1, :]       # (1, K)
    my = chunk[R_MY:R_MY + 1, :]
    ca = chunk[R_CA:R_CA + 1, :]
    cb = chunk[R_CB:R_CB + 1, :]
    cc = chunk[R_CC:R_CC + 1, :]
    op = chunk[R_O:R_O + 1, :]

    dx = px - mx                       # (NPIX, K)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    expp = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, op * expp)
    ok = (alpha >= ALPHA_MIN) & (power <= 0.0) & valid
    a = jnp.where(ok, alpha, 0.0)

    log_om = jnp.log1p(-a)
    log_cum_excl = _lane_prefix_sum(log_om, exclusive=True, terms=terms)
    t_before = t_run * jnp.exp(log_cum_excl)
    # The Gaussian that trips the termination test is itself EXCLUDED from
    # compositing (CUDA: `if (test_T < 0.0001) { done = true; continue; }`).
    kill = (a > 0.0) & (t_before * (1.0 - a) < T_EPS)
    include = ok & jnp.logical_not(kill) & (done < 0.5)

    w = jnp.where(include, a * t_before, 0.0)       # (NPIX, K)
    # One (2*NPIX, K) x (K, 1) matvec for both lane reductions (included
    # log-transmittance sum and kill count) — halves the reduction
    # dispatches per chunk.
    both = _lane_sum(jnp.concatenate(
        [jnp.where(include, log_om, 0.0), kill.astype(jnp.float32)], axis=0),
        terms=terms)
    log_sum_inc = both[:NPIX]
    n_kill = both[NPIX:]
    t_run_new = t_run * jnp.exp(log_sum_inc)
    done_new = jnp.maximum(done, (n_kill > 0.0).astype(jnp.float32))
    return dict(dx=dx, dy=dy, expp=expp, a=a, w=w,
                t_before=t_before, include=include,
                t_run=t_run_new, done=done_new)


def _pixel_coords(tiles_x: int):
    t = pl.program_id(0)
    tx = ((t % tiles_x) * TILE_W).astype(jnp.float32)
    ty = ((t // tiles_x) * TILE_H).astype(jnp.float32)
    off = jax.lax.broadcasted_iota(jnp.int32, (NPIX, 1), 0)
    px = tx + (off % TILE_W).astype(jnp.float32)
    py = ty + (off // TILE_W).astype(jnp.float32)
    return px, py


def _color4(chunk):
    """(4, K) r/g/b/depth rows of a chunk — contiguous by row layout."""
    return chunk[R_R:R_D + 1, :]


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(tiles_x: int, max_chunks: int, lanes: int, terms: int,
                chunk0_ref, off_ref, count_ref, nxt_ref, rows_hbm,
                out_color, out_t, scratch, sems):
    t = pl.program_id(0)
    # Tile starts are NOT chunk-aligned (binning v3), but Mosaic requires
    # DMA offsets provably divisible by the lane tiling, so every window is
    # taken at the ALIGNED-DOWN chunk boundary `chunk0 * K` (advancing by
    # `lanes` — the forward streams 2 binning chunks per iteration to halve
    # loop/DMA-wait overhead) and the `off` head lanes (plus the tail
    # spill) are excluded by the `valid` lane mask. `chunk0`/`off` are
    # host-computed (tile_start // K, % K).
    chunk0 = chunk0_ref[t]
    off = off_ref[t]
    count = count_ref[t]
    n_chunks = jnp.where(
        count > 0, jnp.minimum(pl.cdiv(off + count, lanes), max_chunks), 0)
    px, py = _pixel_coords(tiles_x)
    num_tiles = pl.num_programs(0)

    def dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(chunk0 * K + chunk_idx * lanes, lanes)],
            scratch.at[slot], sems.at[slot])

    def dma_tile0(tile):
        # chunk 0 of another tile — the cross-program prefetch handoff.
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(chunk0_ref[tile] * K, lanes)],
            scratch.at[0], sems.at[0])

    # Cross-program DMA pipelining: every NON-EMPTY tile's chunk-0 copy is
    # started by the PREVIOUS non-empty tile's program (nxt_ref holds the
    # next non-empty tile id), so the grid never exposes a cold DMA start.
    # Program 0 bootstraps the chain.
    @pl.when((t == 0) & (n_chunks > 0))
    def _():
        dma(0, 0).start()

    @pl.when((t == 0) & (n_chunks == 0))
    def _():
        nt = nxt_ref[t]

        @pl.when(nt < num_tiles)
        def _():
            dma_tile0(nt).start()

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

        # Eager prefetch: chunk i+1's DMA is in flight while chunk i computes
        # (drained after the loop if early termination strands it).
        @pl.when(i + 1 < n_chunks)
        def _():
            dma(1 - slot, i + 1).start()

        dma(slot, i).wait()
        chunk = scratch[slot]
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
        pos = i * lanes + lane_i
        valid = (pos >= off) & (pos < off + count)
        f = _chunk_forward(chunk, px, py, t_run, done, valid, terms=terms)
        # rgb + expected-depth accumulation in one (4,K) x (NPIX,K)^T matmul
        acc = acc + jax.lax.dot_general(
            _color4(chunk), f["w"], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mm_prec(terms))

        return i + 1, acc, f["t_run"], f["done"]

    acc0 = jnp.zeros((4, NPIX), jnp.float32)
    t0 = jnp.ones((NPIX, 1), jnp.float32)
    d0 = jnp.zeros((NPIX, 1), jnp.float32)
    i_end, acc, t_run, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), acc0, t0, d0))
    # Drain the prefetch stranded by early termination.
    @pl.when(i_end < n_chunks)
    def _():
        dma(jax.lax.rem(i_end, 2), i_end).wait()

    # Hand the DMA pipeline to the next non-empty tile (slot 0 is free:
    # every in-flight copy above has been waited).
    @pl.when(n_chunks > 0)
    def _():
        nt = nxt_ref[t]

        @pl.when(nt < num_tiles)
        def _():
            dma_tile0(nt).start()

    out_color[0] = acc
    out_t[0] = t_run


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(tiles_x: int, max_chunks: int, terms: int,
                chunk0_ref, off_ref, count_ref, nxt_ref, ocs_ref, rows_hbm,
                g_color_ref, g_t_ref, c_total_ref, t_final_ref,
                drows_hbm, scratch, dscratch, sems, dsems):
    t = pl.program_id(0)
    # Input windows: aligned-down chunks with `off` head lanes masked (see
    # _fwd_kernel). Output windows go to this tile's PRIVATE chunk-aligned
    # region of the padded gradient buffer, starting at chunk `ocs[t]`
    # (host-computed exclusive cumsum of per-tile window counts) — regions
    # are disjoint, so no program ever overwrites another tile's gradients.
    # Masked lanes are written as exact zeros; the consumer maps slot s of
    # tile t to padded column (ocs[t] - chunk0[t]) * K + s (render.py).
    chunk0 = chunk0_ref[t]
    off = off_ref[t]
    count = count_ref[t]
    ocs = ocs_ref[t]
    n_chunks = jnp.where(
        count > 0, jnp.minimum(pl.cdiv(off + count, K), max_chunks), 0)
    px, py = _pixel_coords(tiles_x)

    g = g_color_ref[0]          # (NPIX, 4) cotangent of rgb+depth (no bg)
    g_t = g_t_ref[0]            # (NPIX, 1) cotangent of final transmittance
    c_total = c_total_ref[0]    # (NPIX, 4) forward rgb+depth (no bg)
    t_final = t_final_ref[0]    # (NPIX, 1)
    # <g, C_total>: the only cross-channel state the suffix trick needs.
    g_dot_ctotal = jnp.sum(g * c_total, axis=1, keepdims=True)   # (NPIX, 1)

    num_tiles = pl.num_programs(0)

    def dma_in(slot, chunk_idx):
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds((chunk0 + chunk_idx) * K, K)],
            scratch.at[slot], sems.at[slot])

    def dma_in_tile0(tile):
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(chunk0_ref[tile] * K, K)],
            scratch.at[0], sems.at[0])

    def dma_out(slot, chunk_idx):
        return pltpu.make_async_copy(
            dscratch.at[slot],
            drows_hbm.at[:, pl.ds((ocs + chunk_idx) * K, K)],
            dsems.at[slot])

    # Cross-program chunk-0 prefetch handoff (see _fwd_kernel).
    @pl.when((t == 0) & (n_chunks > 0))
    def _():
        dma_in(0, 0).start()

    @pl.when((t == 0) & (n_chunks == 0))
    def _():
        nt = nxt_ref[t]

        @pl.when(nt < num_tiles)
        def _():
            dma_in_tile0(nt).start()

    g_t_tfin = g_t * t_final        # (NPIX, 1) hoisted

    # Constant pixel-moment basis for the per-instance reductions (see the
    # loop body): every gradient the chunk emits is a polynomial moment
    # M_phi = sum_pixels phi(qx, qy) * d_power with phi in
    # {1, qx, qy, qx^2, qx*qy, qy^2} and q the TILE-CENTERED pixel offset
    # (+-0.5 .. +-7.5). All basis entries are products of two 4-bit-mantissa
    # halves, hence EXACT in bf16 — so three bf16 matmuls of the split
    # d_power give f32-exact moments (same precision model as the forward's
    # prefix scan). Built once per program, hoisted out of the chunk loop.
    offb = jax.lax.broadcasted_iota(jnp.int32, (8, NPIX), 1)
    qx = (offb % TILE_W).astype(jnp.float32) - (TILE_W - 1) / 2.0
    qy = (offb // TILE_W).astype(jnp.float32) - (TILE_H - 1) / 2.0
    rowi = jax.lax.broadcasted_iota(jnp.int32, (8, NPIX), 0)
    basis = jnp.where(
        rowi == 0, 1.0,
        jnp.where(rowi == 1, qx,
                  jnp.where(rowi == 2, qy,
                            jnp.where(rowi == 3, qx * qx,
                                      jnp.where(rowi == 4, qx * qy,
                                                jnp.where(rowi == 5, qy * qy,
                                                          0.0))))))
    basis = basis.astype(jnp.bfloat16)
    # Tile-centered offset of the Gaussian means (for the moment epilogue).
    t_id = pl.program_id(0)
    cx = ((t_id % tiles_x) * TILE_W).astype(jnp.float32) + (TILE_W - 1) / 2.0
    cy = ((t_id // tiles_x) * TILE_H).astype(jnp.float32) + (TILE_H - 1) / 2.0

    # Early termination mirrors the forward: once every pixel is saturated
    # the remaining chunks contribute exactly zero gradient, so the compute
    # loop stops and a cheap second loop zero-fills their output slabs
    # (they must still be written — the output buffer is uninitialized).
    def cond(carry):
        i, t_run, done, prefix = carry
        return (i < n_chunks) & (jnp.min(done) < 0.5)

    def body(carry):
        i, t_run, done, prefix = carry
        slot = jax.lax.rem(i, 2)

        # Eager prefetch (drained after the loop on early termination).
        @pl.when(i + 1 < n_chunks)
        def _():
            dma_in(1 - slot, i + 1).start()

        dma_in(slot, i).wait()
        # Wait for the previous output DMA using this slot before overwriting.
        @pl.when(i >= 2)
        def _():
            dma_out(slot, i - 2).wait()

        chunk = scratch[slot]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
        pos = i * K + lanes
        valid = (pos >= off) & (pos < off + count)
        f = _chunk_forward(chunk, px, py, t_run, done, valid, terms=terms)

        w, include, t_before = f["w"], f["include"], f["t_before"]
        a_inc = jnp.where(include, f["a"], 0.0)
        inv_om = 1.0 / jnp.maximum(1.0 - a_inc, 1e-6)

        # gdotcolor_i = sum_c g_c color_ci : one (NPIX,4)x(4,K) MXU matmul.
        gdotcolor = jax.lax.dot_general(
            g, _color4(chunk), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_mm_prec(terms))

        # suffix_i = <g, C_total> - inclusive-prefix_i <g, c w> — ONE scan.
        prefix_in = _lane_prefix_sum(gdotcolor * w, exclusive=False,
                                     terms=terms) + prefix
        suffix = g_dot_ctotal - prefix_in

        # dL/dalpha_i = gdotcolor_i T_i - suffix_i/(1-a_i) - g_T T_fin/(1-a_i)
        d_alpha = gdotcolor * t_before - (suffix + g_t_tfin) * inv_om
        d_alpha = jnp.where(include, d_alpha, 0.0)

        # Chain to packet fields. alpha = min(0.99, o * G), G = exp(power).
        # The ONLY (NPIX, K) integrand materialized is d_power: every packet
        # gradient is a polynomial moment of it —
        #   d_o   = sum d_aG G           = M_1 / o
        #   S_x   = sum dx d_power       = M_x - mxq M_1           (dy alike)
        #   S_xx  = sum dx^2 d_power     = M_xx - 2 mxq M_x + mxq^2 M_1
        #   S_xy  = M_xy - mxq M_y - myq M_x + mxq myq M_1
        #   d_ca  = -0.5 S_xx, d_cb = -S_xy, d_cc = -0.5 S_yy
        #   d_mx  = ca S_x + cb S_y,  d_my = cc S_y + cb S_x
        # with M_phi = sum phi(qx,qy) d_power from THREE bf16 matmuls of the
        # split d_power against the exact-bf16 constant basis (hoisted
        # above) — replacing the former six-block (6*NPIX, K) stacked
        # integrand + its 3-way split, the backward's dominant VPU cost.
        op = chunk[R_O:R_O + 1, :]
        G = f["expp"]
        d_aG = jnp.where((op * G) < ALPHA_MAX, d_alpha, 0.0)
        d_power = d_aG * (op * G)
        mom = None
        for part in _split_terms(d_power, terms):
            term = jax.lax.dot_general(
                basis, part, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mom = term if mom is None else mom + term           # (8, K)
        m1 = mom[0:1]
        mxq = chunk[R_MX:R_MX + 1, :] - cx     # tile-centered mean offsets
        myq = chunk[R_MY:R_MY + 1, :] - cy
        s_x = mom[1:2] - mxq * m1
        s_y = mom[2:3] - myq * m1
        d_o = m1 / jnp.maximum(op, 1e-30)
        d_ca = -0.5 * (mom[3:4] - mxq * (mom[1:2] + s_x))
        d_cb = -(mom[4:5] - mxq * mom[2:3] - myq * s_x)
        d_cc = -0.5 * (mom[5:6] - myq * (mom[2:3] + s_y))
        ca = chunk[R_CA:R_CA + 1, :]
        cb = chunk[R_CB:R_CB + 1, :]
        cc = chunk[R_CC:R_CC + 1, :]
        d_mx = ca * s_x + cb * s_y
        d_my = cc * s_y + cb * s_x
        d_col = jax.lax.dot_general(                           # (4, K)
            g, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mm_prec(terms))

        zeros = jnp.zeros((FEATS - 10, K), jnp.float32)
        dchunk = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc,
             d_o, d_col, zeros], axis=0)                       # (FEATS, K)
        dscratch[slot] = dchunk
        dma_out(slot, i).start()

        return i + 1, f["t_run"], f["done"], prefix_in[:, K - 1:K]

    t0 = jnp.ones((NPIX, 1), jnp.float32)
    d0 = jnp.zeros((NPIX, 1), jnp.float32)
    p0 = jnp.zeros((NPIX, 1), jnp.float32)
    i_end, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, d0, p0))

    # Drain the input prefetch stranded by early termination.
    @pl.when(i_end < n_chunks)
    def _():
        dma_in(jax.lax.rem(i_end, 2), i_end).wait()

    # Hand the input DMA pipeline to the next non-empty tile.
    @pl.when(n_chunks > 0)
    def _():
        nt = nxt_ref[t]

        @pl.when(nt < num_tiles)
        def _():
            dma_in_tile0(nt).start()

    # Zero-fill loop for early-terminated chunks (same slot rotation, so the
    # in-flight output DMA bookkeeping below stays uniform).
    def zbody(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j >= 2)
        def _():
            dma_out(slot, j - 2).wait()

        dscratch[slot] = jnp.zeros((FEATS, K), jnp.float32)
        dma_out(slot, j).start()
        return 0

    jax.lax.fori_loop(i_end, n_chunks, zbody, 0)

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

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _composite_core(rows, tile_start, tile_count, tiles_x, tiles_y, terms):
    color, t_final = _composite_fwd_call(rows, tile_start, tile_count,
                                         tiles_x, tiles_y, terms=terms)
    return color, t_final


def _next_nonempty(tile_count):
    """nxt[t] = smallest t' > t with tile_count[t'] > 0, else num_tiles —
    drives the kernels' cross-program DMA handoff."""
    T = tile_count.shape[0]
    idx = jnp.where(tile_count > 0, jnp.arange(T, dtype=jnp.int32), T)
    suff = jax.lax.cummin(idx[::-1])[::-1]          # min over t'..T-1
    return jnp.concatenate([suff[1:], jnp.full((1,), T, jnp.int32)])


def _window_scalars(tile_start, tile_count):
    """Host-side per-tile DMA window descriptors: aligned-down base chunk,
    head-lane offset, and the exclusive cumsum of per-tile window counts
    (the backward's private output regions)."""
    chunk0 = tile_start // K
    off = tile_start % K
    n_ch = jnp.where(tile_count > 0, -(-(off + tile_count) // K), 0)
    ocs = jnp.cumsum(n_ch) - n_ch
    return chunk0, off, ocs.astype(jnp.int32)


def _composite_fwd_call(rows, tile_start, tile_count, tiles_x, tiles_y,
                        terms: int = 3):
    num_tiles = tiles_x * tiles_y
    m_pad = rows.shape[1]
    assert rows.shape[0] == FEATS and m_pad % K == 0
    # The forward streams FWD_LANES (= 2 binning chunks) per loop iteration
    # when the spill margin allows: same math over wider lanes, half the
    # DMA-wait/loop overhead.
    lanes = FWD_LANES if m_pad % FWD_LANES == 0 else K
    chunk0, off, _ = _window_scalars(tile_start, tile_count)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 4, NPIX), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPIX, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, FEATS, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    color, t_final = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x, -(-m_pad // lanes), lanes,
                          terms),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 4, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, NPIX, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(chunk0, off, tile_count, _next_nonempty(tile_count), rows)
    return color, t_final[:, :, 0]


def _composite_core_fwd(rows, tile_start, tile_count, tiles_x, tiles_y,
                        terms):
    color, t_final = _composite_fwd_call(rows, tile_start, tile_count,
                                         tiles_x, tiles_y, terms=terms)
    return (color, t_final), (rows, tile_start, tile_count, color, t_final)


def composite_bwd_padded(rows, tile_start, tile_count, tiles_x, tiles_y,
                         g_color, g_t, color, t_final, terms: int = 3):
    """Backward kernel call. Returns the PADDED gradient buffer
    (FEATS, padded_chunks * K): tile t's gradient rows live at columns
    (ocs[t] - chunk0[t]) * K + s for slot s in [start, start+count);
    every other written lane is exactly zero and unwritten chunks are
    uninitialized (consumers must index only via padded positions)."""
    num_tiles = tiles_x * tiles_y
    m_pad = rows.shape[1]
    chunk0, off, ocs = _window_scalars(tile_start, tile_count)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                     # rows
            pl.BlockSpec((1, NPIX, 4), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                    # g_color
            pl.BlockSpec((1, NPIX, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                    # g_t
            pl.BlockSpec((1, NPIX, 4), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                    # c_total
            pl.BlockSpec((1, NPIX, 1), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),                    # t_final
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, FEATS, K), jnp.float32),
            pltpu.VMEM((2, FEATS, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    c_out = padded_chunks(m_pad, num_tiles)
    d_pad = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x, m_pad // K, terms),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((FEATS, c_out * K), jnp.float32)],
        interpret=_interpret(),
    )(chunk0, off, tile_count, _next_nonempty(tile_count), ocs, rows,
      jnp.transpose(g_color, (0, 2, 1)), g_t[:, :, None],
      jnp.transpose(color, (0, 2, 1)), t_final[:, :, None])[0]
    return d_pad


def padded_slot_positions(tile_start, tile_count, m_pad: int,
                          num_tiles: int) -> jnp.ndarray:
    """(m_pad,) int32: padded-buffer column of each instance slot, derived
    from the tile ranges alone (slot -> owning tile via searchsorted).
    Invalid slots (>= total) map one past the buffer — gather with
    mode='fill'."""
    chunk0, _, ocs = _window_scalars(tile_start, tile_count)
    slots = jnp.arange(m_pad, dtype=jnp.int32)
    tid = jnp.clip(
        jnp.searchsorted(tile_start, slots, side="right").astype(jnp.int32)
        - 1, 0, num_tiles - 1)
    base = (ocs - chunk0) * K
    total = tile_start[num_tiles - 1] + tile_count[num_tiles - 1]
    c_out = padded_chunks(m_pad, num_tiles)
    return jnp.where(slots < total, jnp.take(base, tid) + slots, c_out * K)


def _composite_core_bwd(tiles_x, tiles_y, terms, res, cts):
    rows, tile_start, tile_count, color, t_final = res
    g_color, g_t = cts
    num_tiles = tiles_x * tiles_y
    m_pad = rows.shape[1]
    d_pad = composite_bwd_padded(rows, tile_start, tile_count,
                                 tiles_x, tiles_y, g_color, g_t,
                                 color, t_final, terms=terms)
    # Un-pad back to the rows layout (one extra (FEATS, m) gather; the
    # fused render path skips this by reducing straight from the padded
    # buffer — see render.py).
    pos = padded_slot_positions(tile_start, tile_count, m_pad, num_tiles)
    d_rows = jnp.take(d_pad, pos, axis=1, mode="fill", fill_value=0.0)
    return d_rows, None, None


_composite_core.defvjp(_composite_core_fwd, _composite_core_bwd)


def composite_tiles_pallas(rows, tile_start, tile_count, tiles_x, tiles_y,
                           bg, terms: int = 3) -> TileImage:
    """Pallas compositor over feature-major sorted instance rows
    (16, M_aligned): [mx, my, conic_a, conic_b, conic_c, r, g, b, opacity,
    depth, 0...]. Returns rgb (bg-blended), expected depth, and final
    transmittance."""
    out, t_final = _composite_core(rows, tile_start, tile_count,
                                   tiles_x, tiles_y, terms)
    out = jnp.transpose(out, (0, 2, 1))                # (T, NPIX, 4)
    color = out[..., :3] + t_final[..., None] * bg[None, None, :]
    return TileImage(color=color, t_final=t_final, depth=out[..., 3])
