"""Transposed-geometry Pallas compositor kernels (round-3 redesign).

Same contract as tpugs.ops.pallas.composite (forward + analytic backward of
the tiled compositor; reference: src/rasterizer/forward.cu:26-180,
backward.cu:40-232) with the kernel axes swapped:

  round-1/2 geometry:  pixels on SUBLANES ((pix, 1) carries), entries walked
                       in 128-wide LANE waves.
  this geometry:       pixels on LANES ((1, pix) carries), entries walked in
                       EWAVE-deep SUBLANE waves.

Why transpose (docs/NEXT.md, VERDICT r2 item 1): Mosaic lane-pads every
(pix, 1) array 128x, so the old per-pixel carries/outputs set a ~1 MB-each
VMEM floor at pix=2048 that made tiles >= 2048 px uncompilable and forced
the backward pixel sub-blocking (_PIX_BLOCK). With pixels on lanes the
carries are dense (1, pix) rows (sublane-padded 8x of something 128x
smaller), so
  - any tile size compiles (64x32 and beyond — each tile-size doubling
    historically halved the pair count, the dominant [P]-plumbing cost);
  - the per-entry transmittance recurrence closes with a log2(EWAVE)-step
    shift-multiply tree along SUBLANES (cheap vreg rotates) instead of lane
    rolls;
  - per-pixel accumulation (color/T/n_contrib) is a sublane reduction,
    vectorized across all pix lanes;
  - the backward per-PAIR gradients are lane reductions over pix,
    vectorized across the EWAVE sublane entries.

Attribute streaming keeps the round-2 layout ([ATTR_ROWS, P_pad]
column-major, contiguous lane-aligned per-tile segments, double-buffered
DMA); each wave transposes its (ATTR_ROWS, EWAVE) slice once to get
entry-major (EWAVE, 1) attribute columns.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugs.ops.pallas.composite import (
    ALIGN,
    ATTR_ROWS,
    NUM_ATTR,
    _interpret,
    _p_aligned,
    align_segments,
    pack_sorted_attrs,
)
from tpugs.ops.rasterize_tiled import (
    ALPHA_CLAMP,
    ALPHA_MIN,
    RasterConfig,
    T_THRESHOLD,
)

import os as _os

EWAVE = int(_os.environ.get("TPUGS_EWAVE", "64"))  # entries per vector
#              sub-wave (sublane axis); env knob for perf A/B — every value
#              is exact (the prefix trees are shape-generic). Default 64
#              from the r4 TPU ladder at 1080p/1M (ms/frame): 8 -> 75.7,
#              16 -> 59.8, 32 -> 57.3, 64 -> 56.5, 128 -> 57.5 — the
#              prefix-tree cost per entry falls as log2(E)/E until the
#              deeper wave's tail waste catches up
GROUP = 128  # entries per dynamically-indexed lane group (Mosaic requires
#              dynamic lane offsets provably 128-aligned; the EWAVE sub-wave
#              slices inside a group are STATIC, which is free)
GSUB = GROUP // EWAVE  # sub-waves unrolled per group
EWAVE_BWD = int(_os.environ.get("TPUGS_EWAVE_BWD", str(EWAVE)))  # backward
#              sub-wave depth, its own knob: the backward pays TWO prefix
#              trees per sub-wave (suffix prod + suffix sum) plus the piece
#              transpose, so its log2(E)/E amortization optimum can sit
#              deeper than the forward's
GSUB_BWD = GROUP // EWAVE_BWD
CHUNK = 512  # entries per DMA chunk
OUT_LANES = 128  # backward-output row width: NUM_ATTR gradient lanes padded
#                  to one full lane tile. The backward emits ENTRY-MAJOR
#                  [P_pad, OUT_LANES] rows — the natural in-kernel layout
#                  (per-wave grads are (EWAVE, attr) already) and exactly
#                  what the segment-reduce consumer streams (segreduce
#                  IN_LANES). The old [ATTR_ROWS, P_pad] contract forced an
#                  XLA relayout-transpose + lane pad outside the kernel
#                  (1.62 + 0.44 ms of the 8.9 ms 50k train step, r4 xprof)
#                  plus GSUB in-kernel transposes per group.
OUT_ROWS = ATTR_ROWS  # transposed_out mode: the backward emits ATTR-MAJOR
#                  [OUT_ROWS, P_pad] instead — each gradient a CONTIGUOUS
#                  [P_pad] row, the layout the sorted-key reduction's column
#                  sort consumes with free row slices. Extracting those
#                  columns from the [P_pad, 128] layout instead cost 9
#                  full-array read fusions + an XLA relayout (~45 ms of the
#                  141 ms garden step, r5 xprof). The price in-kernel is one
#                  (EWAVE, 16) -> (16, EWAVE) transpose per sub-wave (the
#                  exact mirror of the input transpose both kernels already
#                  do) and an 8x SMALLER output DMA + VMEM footprint.


def _sub_shift_down_fill(m, s, fill):
    """Row i <- row i-s; top s rows <- fill (prefix scans along sublanes)."""
    rolled = pltpu.roll(m, s, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
    return jnp.where(rows >= s, rolled, fill)


def _sub_shift_up_fill(m, s, fill):
    """Row i <- row i+s; bottom s rows <- fill (suffix scans)."""
    rolled = pltpu.roll(m, m.shape[0] - s, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
    return jnp.where(rows < m.shape[0] - s, rolled, fill)


def _sub_prefix_prod_incl(m):
    """Inclusive cumulative product along sublanes (log2(EWAVE) steps)."""
    s = 1
    while s < m.shape[0]:
        m = m * _sub_shift_down_fill(m, s, 1.0)
        s *= 2
    return m


def _sub_suffix_prod_incl(m):
    s = 1
    while s < m.shape[0]:
        m = m * _sub_shift_up_fill(m, s, 1.0)
        s *= 2
    return m


def _sub_suffix_sum_incl(m):
    s = 1
    while s < m.shape[0]:
        m = m + _sub_shift_up_fill(m, s, 0.0)
        s *= 2
    return m


def _pixel_coords_row(cfg: RasterConfig, t, row_offset):
    """Per-tile pixel coordinates on the LANE axis: two (1, pix) floats."""
    tx = t % cfg.ntx
    ty = t // cfg.ntx + row_offset
    i = jax.lax.broadcasted_iota(jnp.int32, (1, cfg.pix), 1)
    px = (tx * cfg.tile_w + i % cfg.tile_w).astype(jnp.float32)
    py = (ty * cfg.tile_h + i // cfg.tile_w).astype(jnp.float32)
    return px, py


def _wave_alpha_t(attr_t, px, py, base_idx, num):
    """Evaluate EWAVE entries (sublanes) against pix pixels (lanes).

    attr_t [EWAVE, ATTR_ROWS] (entry-major transposed slice); px/py (1, pix).
    Returns (EWAVE, pix) tensors + the (EWAVE, 1) attribute columns."""
    x = attr_t[:, 0:1]  # (EWAVE, 1)
    y = attr_t[:, 1:2]
    # Conic pre-scaled at pack time: ca = -a/2, cb = -b, cc = -c/2.
    ca = attr_t[:, 2:3]
    cb = attr_t[:, 3:4]
    cc = attr_t[:, 4:5]
    op = attr_t[:, 5:6]

    dx = px - x  # (EWAVE, pix)
    dy = py - y
    power = ca * (dx * dx) + cc * (dy * dy) + cb * (dx * dy)
    gauss = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = op * gauss
    alpha = jnp.minimum(alpha_raw, ALPHA_CLAMP)

    rows = jax.lax.broadcasted_iota(jnp.int32, power.shape, 0)
    kidx = base_idx + rows
    passes = (kidx < num) & (power <= 0.0) & (alpha >= ALPHA_MIN)
    return dx, dy, gauss, alpha_raw, alpha, passes, kidx


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(cfg: RasterConfig,
                tile_start_ref, tile_stop_ref, rowoff_ref,  # scalar prefetch
                attr_hbm,  # [ATTR_ROWS, P_pad] ANY
                cr_ref, cg_ref, cb_ref, t_ref, nc_ref, kl_ref,  # (1, PIX) outs
                chunk_buf, sems):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    stop = tile_stop_ref[t]
    num = stop - start
    px, py = _pixel_coords_row(cfg, t, rowoff_ref[0])

    n_chunks = pl.cdiv(num, CHUNK)
    gpc = CHUNK // GROUP
    n_groups = pl.cdiv(num, GROUP)

    def dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            attr_hbm.at[:, pl.ds(pl.multiple_of(start + chunk_idx * CHUNK, ALIGN), CHUNK)],
            chunk_buf.at[slot],
            sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    # Group-granular early exit every GROUP entries (same 128-entry
    # granularity as the lane-wave geometry; the EWAVE sub-waves inside a
    # group are a static unroll because Mosaic only allows dynamic lane
    # offsets that are provably 128-aligned).
    def cond(carry):
        g, T, Cr, Cg, Cb, nc, kl = carry
        return (g < n_groups) & (jnp.max(T) >= T_THRESHOLD)

    def body(carry):
        g, T, Cr, Cg, Cb, nc, kl = carry
        chunk_idx = g // gpc
        slot = chunk_idx % 2

        @pl.when(g % gpc == 0)
        def _():
            @pl.when(chunk_idx + 1 < n_chunks)
            def _():
                dma(1 - slot, chunk_idx + 1).start()

            dma(slot, chunk_idx).wait()

        base_g = (g % gpc) * GROUP
        grp = chunk_buf[slot, :, pl.ds(pl.multiple_of(base_g, GROUP), GROUP)]

        def acc(v):
            return jnp.sum(v, axis=0, keepdims=True)  # (1, pix)

        for j in range(GSUB):
            attr_t = jnp.transpose(
                grp[:, j * EWAVE:(j + 1) * EWAVE]
            )  # (EWAVE, ATTR_ROWS)
            r_w = attr_t[:, 6:7]  # (EWAVE, 1)
            g_w = attr_t[:, 7:8]
            b_w = attr_t[:, 8:9]

            dx, dy, gauss, alpha_raw, alpha, passes, kidx = _wave_alpha_t(
                attr_t, px, py, g * GROUP + j * EWAVE, num
            )
            a_eff = jnp.where(passes, alpha, 0.0)
            incl = _sub_prefix_prod_incl(1.0 - a_eff)  # (EWAVE, pix)
            excl = _sub_shift_down_fill(incl, 1, 1.0)

            T_before = T * excl  # (1, pix) * (EWAVE, pix)
            gate = T_before >= T_THRESHOLD
            w_px = jnp.where(gate, a_eff * T_before, 0.0)

            Cr = Cr + acc(w_px * r_w)
            Cg = Cg + acc(w_px * g_w)
            Cb = Cb + acc(w_px * b_w)

            # excl is non-increasing along entries, so the T gate is a
            # prefix: post-wave transmittance = T * incl at the last gated
            # entry — one sublane-min instead of a second suffix tree.
            T = T * jnp.min(jnp.where(gate, incl, 1.0), axis=0, keepdims=True)
            contrib = (a_eff > 0.0) & gate
            nc = nc + acc(contrib.astype(jnp.int32))
            kl = jnp.maximum(
                kl, jnp.max(jnp.where(contrib, kidx, -1), axis=0, keepdims=True)
            )
        return (g + 1, T, Cr, Cg, Cb, nc, kl)

    pix = cfg.pix
    init = (
        jnp.zeros((), jnp.int32),
        jnp.ones((1, pix), jnp.float32),
        jnp.zeros((1, pix), jnp.float32),
        jnp.zeros((1, pix), jnp.float32),
        jnp.zeros((1, pix), jnp.float32),
        jnp.zeros((1, pix), jnp.int32),
        jnp.full((1, pix), -1, jnp.int32),
    )
    g_f, T, Cr, Cg, Cb, nc, kl = jax.lax.while_loop(cond, body, init)

    # Await any in-flight prefetch started for the group after an early exit
    # (same semaphore-balance argument as the lane-wave kernel).
    @pl.when((g_f > 0) & (g_f < n_groups))
    def _():
        c_done = (g_f - 1) // gpc

        @pl.when(c_done + 1 < n_chunks)
        def _():
            dma((c_done + 1) % 2, c_done + 1).wait()

    cr_ref[...] = Cr
    cg_ref[...] = Cg
    cb_ref[...] = Cb
    t_ref[...] = T
    nc_ref[...] = nc
    kl_ref[...] = kl


def composite_forward_pallas(cfg: RasterConfig, tile_start, tile_stop, sorted_attr,
                             row_offset=0, interpret: bool = False):
    """Run the forward kernel. sorted_attr [ATTR_ROWS, P_pad].

    Returns (color [T, PIX, 3] pre-background, final_T [T, PIX],
    n_contrib [T, PIX], k_last [T, PIX]) — identical contract to the
    lane-wave kernel."""
    num_tiles, pix = cfg.num_tiles, cfg.pix
    rowoff = jnp.asarray(row_offset, jnp.int32).reshape((1,))

    tile_block = pl.BlockSpec(
        (None, 1, pix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[tile_block] * 6,
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((num_tiles, 1, pix), jnp.float32),  # Cr
        jax.ShapeDtypeStruct((num_tiles, 1, pix), jnp.float32),  # Cg
        jax.ShapeDtypeStruct((num_tiles, 1, pix), jnp.float32),  # Cb
        jax.ShapeDtypeStruct((num_tiles, 1, pix), jnp.float32),  # T
        jax.ShapeDtypeStruct((num_tiles, 1, pix), jnp.int32),  # n_contrib
        jax.ShapeDtypeStruct((num_tiles, 1, pix), jnp.int32),  # k_last
    ]
    cr, cg, cb, t, nc, kl = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tile_start, tile_stop, rowoff, sorted_attr)
    color = jnp.stack([cr[:, 0, :], cg[:, 0, :], cb[:, 0, :]], axis=-1)
    return color, t[:, 0, :], nc[:, 0, :], kl[:, 0, :]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(cfg: RasterConfig, transposed: bool,
                tile_start_ref, tile_stop_ref, rowoff_ref,  # scalar prefetch
                attr_hbm,  # [ATTR_ROWS, P_pad] ANY
                dcr_ref, dcg_ref, dcb_ref,  # (1, PIX) incoming color cotangent
                r0_ref,  # (1, PIX) scalar suffix init (bg + d_finalT terms)
                ft_ref,  # (1, PIX) final transmittance
                kl_ref,  # (1, PIX) last contributor index
                dattr_hbm,  # out [P_pad, OUT_LANES] / [OUT_ROWS, P_pad] ANY
                in_buf, out_buf, in_sems, out_sems):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    stop = tile_stop_ref[t]
    num = stop - start
    px, py = _pixel_coords_row(cfg, t, rowoff_ref[0])

    dcr = dcr_ref[...]  # (1, PIX)
    dcg = dcg_ref[...]
    dcb = dcb_ref[...]
    kl = kl_ref[...]
    max_kl = jnp.max(kl)

    n_chunks = pl.cdiv(num, CHUNK)

    def dma_in(slot, chunk_idx):
        return pltpu.make_async_copy(
            attr_hbm.at[:, pl.ds(pl.multiple_of(start + chunk_idx * CHUNK, ALIGN), CHUNK)],
            in_buf.at[slot],
            in_sems.at[slot],
        )

    def dma_out(slot, chunk_idx):
        dst = (
            dattr_hbm.at[:, pl.ds(pl.multiple_of(start + chunk_idx * CHUNK, ALIGN), CHUNK)]
            if transposed
            else dattr_hbm.at[pl.ds(pl.multiple_of(start + chunk_idx * CHUNK, ALIGN), CHUNK), :]
        )
        return pltpu.make_async_copy(out_buf.at[slot], dst, out_sems.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma_in(0, n_chunks - 1).start()

    def chunk_body(i, carry):
        T_run, R = carry  # both (1, PIX)
        c = n_chunks - 1 - i
        slot = i % 2

        @pl.when(i + 1 < n_chunks)
        def _():
            dma_in(1 - slot, c - 1).start()

        dma_in(slot, c).wait()
        @pl.when(i >= 2)
        def _():
            dma_out(slot, c + 2).wait()

        # Zero-fill once; the group loop writes only ACTIVE groups (groups
        # whose entries are all past every pixel's last contributor produce
        # zero grads and unchanged T/R, so they are skipped wholesale).
        if transposed:
            out_buf[slot, :, :] = jnp.zeros((OUT_ROWS, CHUNK), jnp.float32)
        else:
            out_buf[slot, :, :] = jnp.zeros((CHUNK, OUT_LANES), jnp.float32)

        gpc_ = CHUNK // GROUP
        n_active = jnp.clip((max_kl - c * CHUNK) // GROUP + 1, 0, gpc_)

        def group_grads(g_rev, wcarry):
            Th, Rh = wcarry
            g = n_active - 1 - g_rev  # reverse group order
            base_g = g * GROUP
            grp = in_buf[slot, :, pl.ds(pl.multiple_of(base_g, GROUP), GROUP)]

            pieces = [None] * GSUB_BWD
            for j in reversed(range(GSUB_BWD)):
                base_idx = c * CHUNK + base_g + j * EWAVE_BWD
                attr_t = jnp.transpose(
                    grp[:, j * EWAVE_BWD:(j + 1) * EWAVE_BWD]
                )  # (EWAVE_BWD, ATTR_ROWS)
                dx, dy, gauss, alpha_raw, alpha, passes, kidx = _wave_alpha_t(
                    attr_t, px, py, base_idx, num
                )
                contrib = passes & (kidx <= kl)
                a_g = jnp.where(contrib, alpha, 0.0)
                om = jnp.maximum(1.0 - a_g, 1e-5)

                sp = _sub_suffix_prod_incl(om)  # sp[e] = prod_{k>=e} om_k
                T_before = Th / sp  # (EWAVE, pix)

                r_w = attr_t[:, 6:7]
                g_w = attr_t[:, 7:8]
                b_w = attr_t[:, 8:9]
                dCdot = dcr * r_w + dcg * g_w + dcb * b_w  # (EWAVE, pix)
                w_px = a_g * T_before
                contribX = w_px * dCdot

                s_incl = _sub_suffix_sum_incl(contribX)
                s_excl = _sub_shift_up_fill(s_incl, 1, 0.0)

                g_alpha = jnp.where(
                    contrib, T_before * dCdot - (s_excl + Rh) / om, 0.0
                )
                clamp_ok = (alpha_raw < ALPHA_CLAMP).astype(jnp.float32)
                g_op_px = g_alpha * gauss * clamp_ok
                g_pow = g_alpha * alpha * clamp_ok

                ca = attr_t[:, 2:3]
                cb_w = attr_t[:, 3:4]
                cc = attr_t[:, 4:5]
                g_dx = g_pow * (2.0 * ca * dx + cb_w * dy)
                g_dy = g_pow * (cb_w * dx + 2.0 * cc * dy)

                def rsum(x):
                    return jnp.sum(x, axis=1, keepdims=True)  # (EWAVE, 1)

                # Entry-major (EWAVE, width) rows — the (EWAVE, 1)
                # reductions already have entries on sublanes. transposed
                # mode pads only to OUT_ROWS and flips to attr-major
                # (OUT_ROWS, EWAVE) — the mirror of the input transpose.
                width = OUT_ROWS if transposed else OUT_LANES
                grads = jnp.concatenate(
                    [
                        -rsum(g_dx),  # d mean_x
                        -rsum(g_dy),  # d mean_y
                        rsum(g_pow * (dx * dx)),  # d conic_a_scaled
                        rsum(g_pow * (dx * dy)),  # d conic_b_scaled
                        rsum(g_pow * (dy * dy)),  # d conic_c_scaled
                        rsum(g_op_px),  # d opac
                        rsum(w_px * dcr),  # d r
                        rsum(w_px * dcg),  # d g
                        rsum(w_px * dcb),  # d b
                        jnp.zeros((EWAVE_BWD, width - NUM_ATTR),
                                  jnp.float32),
                    ],
                    axis=1,
                )  # (EWAVE, width)
                pieces[j] = jnp.transpose(grads) if transposed else grads

                Th = Th / sp[0:1, :]  # whole-sub-wave transmittance peel
                Rh = Rh + s_incl[0:1, :]

            if transposed:
                out_buf[slot, :, pl.ds(pl.multiple_of(base_g, GROUP), GROUP)] = (
                    jnp.concatenate(pieces, axis=1)
                )
            else:
                out_buf[slot, pl.ds(pl.multiple_of(base_g, GROUP), GROUP), :] = (
                    jnp.concatenate(pieces, axis=0)
                )
            return Th, Rh

        T_run, R = jax.lax.fori_loop(0, n_active, group_grads, (T_run, R))
        dma_out(slot, c).start()
        return T_run, R

    T0 = ft_ref[...]
    R0 = r0_ref[...]
    jax.lax.fori_loop(0, n_chunks, chunk_body, (T0, R0))

    @pl.when(n_chunks >= 2)
    def _():
        dma_out((n_chunks - 2) % 2, 1).wait()

    @pl.when(n_chunks >= 1)
    def _():
        dma_out((n_chunks - 1) % 2, 0).wait()


def composite_backward_pallas(cfg: RasterConfig, tile_start, tile_stop, sorted_attr,
                              d_color_t, r0, final_t, k_last, row_offset=0,
                              interpret: bool = False,
                              transposed_out: bool = False):
    """Run the backward kernel. d_color_t [T, PIX, 3]; returns ENTRY-MAJOR
    per-pair gradient rows [P_pad, OUT_LANES] (first NUM_ATTR lanes), or
    with transposed_out ATTR-MAJOR [OUT_ROWS, P_pad] (first NUM_ATTR rows,
    each a contiguous [P_pad] gradient column — the sorted-key reduction's
    input). Slots past each tile's chunked range are UNWRITTEN in both
    layouts — consumers mask on validity (composite._pallas_bwd /
    _segred_bwd)."""
    num_tiles, pix = cfg.num_tiles, cfg.pix
    p_pad = sorted_attr.shape[1]
    rowoff = jnp.asarray(row_offset, jnp.int32).reshape((1,))

    tile_block = pl.BlockSpec(
        (None, 1, pix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # attrs
            tile_block,  # dcr
            tile_block,  # dcg
            tile_block,  # dcb
            tile_block,  # r0
            tile_block,  # final_T
            tile_block,  # k_last
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM(
                (2, OUT_ROWS, CHUNK) if transposed_out
                else (2, CHUNK, OUT_LANES),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    exp = lambda a: a[:, None, :]  # [T, PIX] -> [T, 1, PIX]
    (d_attr,) = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg, transposed_out),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(
            (OUT_ROWS, p_pad) if transposed_out else (p_pad, OUT_LANES),
            jnp.float32,
        )],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_start, tile_stop, rowoff, sorted_attr,
        exp(d_color_t[..., 0]), exp(d_color_t[..., 1]), exp(d_color_t[..., 2]),
        exp(r0), exp(final_t), exp(k_last),
    )
    return d_attr
