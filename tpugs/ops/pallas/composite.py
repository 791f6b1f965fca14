"""Pallas TPU compositor kernels — forward + analytic backward.

The performance-critical re-design of the reference's two hottest CUDA kernels
(reference: src/rasterizer/forward.cu:26-180, backward.cu:40-232) for the TPU
execution model:

CUDA shape:  one 16x16 tile per thread block, 256 threads = 256 pixels, each
             thread serially walks the tile's depth-sorted Gaussian list from
             10 KB shared-memory batches, per-pixel early exit + block vote.

TPU shape:   grid = one kernel step per tile. The tile's PIX pixels sit on the
             *sublane* axis and the depth-sorted list is walked in waves of
             128 entries on the *lane* axis: alpha for PIX pixels x 128
             entries is one (PIX, 128) vector-op sequence, and the serial
             transmittance recurrence inside a wave is closed with a 7-step
             shift-multiply cumulative-product tree along lanes. Early
             termination is a while_loop condition on the max remaining
             transmittance.

Memory: attributes are pre-gathered (XLA gather) into depth-sorted pair order
and stored column-major [16, P_pad] so each tile's entries are a contiguous,
lane-aligned slice streamed HBM->VMEM with double-buffered DMA (the analogue
of the cooperative shared-memory load in forward.cuh:17-27, but asynchronous).

The backward kernel walks waves in reverse, reconstructs per-entry
transmittance from final_T by suffix products (backward.cu:147-151), uses the
scalar-collapsed suffix-sum S_after trick (backward.cu:161-173 — dotted with
the incoming color cotangent so the suffix is one scalar per pixel), and
writes per-PAIR gradients to its tile's contiguous slice — races are
structurally impossible, and the pair->gaussian reduction is one deterministic
XLA segment-sum outside the kernel (replacing CUDA atomicAdd scatter,
backward.cu:214-228).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugs.ops.rasterize_tiled import (
    ALPHA_CLAMP,
    ALPHA_MIN,
    RasterConfig,
    T_THRESHOLD,
)

WAVE = 128  # entries per vector wave (lane axis)
CHUNK = 512  # entries per DMA chunk
_PIX_BLOCK = 256  # max pixel sublanes processed at once in the backward
# kernel. The live (PB, WAVE) temporaries count against the ~16 MB
# scoped-VMEM stack; with the dead-wave lax.cond pair removed (zero-fill +
# dynamic-bound wave loop) 256 fits the garden-shaped bench config that
# previously overflowed by 496 KB, and 128 costs ~4% on the primary config.
def _fwd_pix_limit(pix: int) -> int:
    """Forward-kernel pixel sub-block limit: tiles up to 1024 px (32x32, the
    tuned default) keep the original single-block codegen; larger tiles
    split at 512 px. NOTE: splitting does NOT rescue pix >= 2048 — the
    scoped-VMEM floor there (~19.9 MB vs the 16 MB limit) comes from the
    (pix, 1)-shaped per-pixel carries and output blocks, which Mosaic
    lane-pads 128x (1 MB each at pix 2048). Supporting bigger tiles needs a
    lane-major per-pixel state layout (pixels on lanes, entries on
    sublanes), i.e. a transposed kernel geometry — see docs/NEXT.md."""
    return 1024 if pix <= 1024 else 512


def _pix_blocks(pix: int, limit: int):
    """Smallest block count dividing pix with block size <= limit."""
    n_blocks = -(-pix // limit)
    while pix % n_blocks:
        n_blocks += 1
    return n_blocks, pix // n_blocks
ALIGN = 128  # per-tile segment alignment (lane-dim DMA offsets must be 128-aligned)
ATTR_ROWS = 16  # padded attr rows: x, y, ca, cb, cc, opac, r, g, b, (pad)
NUM_ATTR = 9


def align_segments(tile_start, tile_stop, pair_gauss, p_aligned: int):
    """Re-lay the sorted pair list so every tile's segment starts on an ALIGN
    boundary (TPU DMA lane offsets must be 128-aligned). Gap slots are marked
    invalid; they cost masked lanes in the kernel, not correctness.

    Slot ownership uses the scatter-histogram + cumsum trick (see
    binning.bin_gaussians) and one packed small-table row-gather — a
    searchsorted here costs ~35x more on TPU.

    Returns (astart [T], astop [T], aligned_gauss [p_aligned], valid [p_aligned]).
    """
    counts = tile_stop - tile_start
    padded = -(-counts // ALIGN) * ALIGN
    astart = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    astop = astart + counts

    pos = jnp.arange(p_aligned, dtype=jnp.int32)
    ind = jnp.zeros((p_aligned,), jnp.int32).at[astart].add(1, mode="drop")
    t = jnp.clip(jnp.cumsum(ind) - 1, 0, counts.shape[0] - 1)

    f32 = jnp.float32
    ttab = jnp.stack(
        [astart.astype(f32), (tile_start - astart).astype(f32), counts.astype(f32)],
        axis=1,
    )  # [T, 3]
    rows = ttab[t]
    local = pos - rows[:, 0].astype(jnp.int32)
    valid = (local >= 0) & (local < rows[:, 2].astype(jnp.int32))
    src = jnp.clip(pos + rows[:, 1].astype(jnp.int32), 0, pair_gauss.shape[0] - 1)
    aligned_gauss = jnp.where(valid, pair_gauss[src], 0)
    return astart, astop, aligned_gauss, valid


def _lane_shift_right_fill(m, s, fill):
    """Col j <- col j-s; left s cols <- fill (prefix scans along lanes)."""
    rolled = pltpu.roll(m, s, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    return jnp.where(cols >= s, rolled, fill)


def _lane_shift_left_fill(m, s, fill):
    """Col j <- col j+s; right s cols <- fill (suffix scans along lanes)."""
    rolled = pltpu.roll(m, m.shape[1] - s, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    return jnp.where(cols < m.shape[1] - s, rolled, fill)


def _prefix_prod_incl(m):
    """Inclusive cumulative product along lanes (7-step tree for 128)."""
    s = 1
    while s < m.shape[1]:
        m = m * _lane_shift_right_fill(m, s, 1.0)
        s *= 2
    return m


def _suffix_prod_incl(m):
    """Inclusive suffix product along lanes: out[j] = prod_{k>=j} m[k]."""
    s = 1
    while s < m.shape[1]:
        m = m * _lane_shift_left_fill(m, s, 1.0)
        s *= 2
    return m


def _suffix_sum_incl(m):
    """Inclusive suffix sum along lanes: out[j] = sum_{k>=j} m[k]."""
    s = 1
    while s < m.shape[1]:
        m = m + _lane_shift_left_fill(m, s, 0.0)
        s *= 2
    return m


def _pixel_coords(cfg: RasterConfig, t, row_offset):
    """Per-tile pixel coordinates on the sublane axis: two (PIX, 1) floats.

    row_offset: global tile-row index of tile 0 — nonzero only under the
    tile-sharded distribution (parallel/tile_shard.py), which composites a
    slice of the tile grid in global pixel coordinates."""
    tx = t % cfg.ntx
    ty = t // cfg.ntx + row_offset
    i = jax.lax.broadcasted_iota(jnp.int32, (cfg.pix, 1), 0)
    px = (tx * cfg.tile_w + i % cfg.tile_w).astype(jnp.float32)
    py = (ty * cfg.tile_h + i // cfg.tile_w).astype(jnp.float32)
    return px, py


def _wave_alpha(attr_w, px, py, base_idx, num):
    """Evaluate WAVE entries (lanes) against PIX pixels (sublanes).

    attr_w [ATTR_ROWS, WAVE]; px/py [PIX, 1]. Returns (PIX, WAVE) tensors and
    the per-entry row vectors."""
    x = attr_w[0:1, :]  # (1, WAVE)
    y = attr_w[1:2, :]
    # Conic rows are pre-scaled at pack time: ca = -a/2, cb = -b, cc = -c/2
    # (three fewer multiplies per lane-element in the hot wave).
    ca = attr_w[2:3, :]
    cb = attr_w[3:4, :]
    cc = attr_w[4:5, :]
    op = attr_w[5:6, :]

    dx = px - x  # (PIX, WAVE)
    dy = py - y
    power = ca * (dx * dx) + cc * (dy * dy) + cb * (dx * dy)
    gauss = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = op * gauss
    alpha = jnp.minimum(alpha_raw, ALPHA_CLAMP)

    cols = jax.lax.broadcasted_iota(jnp.int32, power.shape, 1)
    kidx = base_idx + cols
    passes = (kidx < num) & (power <= 0.0) & (alpha >= ALPHA_MIN)
    return dx, dy, gauss, alpha_raw, alpha, passes, kidx


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(cfg: RasterConfig,
                tile_start_ref, tile_stop_ref, rowoff_ref,  # scalar prefetch
                attr_hbm,  # [ATTR_ROWS, P_pad] ANY
                cr_ref, cg_ref, cb_ref, t_ref, nc_ref, kl_ref,  # (PIX, 1) outs
                chunk_buf, sems):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    stop = tile_stop_ref[t]
    num = stop - start
    px, py = _pixel_coords(cfg, t, rowoff_ref[0])

    n_chunks = pl.cdiv(num, CHUNK)
    wpc = CHUNK // WAVE
    # Bound by actual entries, not whole chunks: the last chunk's tail waves
    # (base >= num) are pure masked work. The chunk of the last wave always
    # equals n_chunks-1, so the DMA schedule below is unaffected.
    n_waves = pl.cdiv(num, WAVE)

    def dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            attr_hbm.at[:, pl.ds(pl.multiple_of(start + chunk_idx * CHUNK, ALIGN), CHUNK)],
            chunk_buf.at[slot],
            sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    # Wave-granular early exit: the transmittance check runs every 128-entry
    # wave, not every 512-entry chunk — on saturating scenes pixels die within
    # a wave or two, and chunk-granular exit wasted up to 3 extra waves.
    def cond(carry):
        w, T, Cr, Cg, Cb, nc, kl = carry
        return (w < n_waves) & (jnp.max(T) >= T_THRESHOLD)

    def body(carry):
        w, T, Cr, Cg, Cb, nc, kl = carry
        chunk_idx = w // wpc
        slot = chunk_idx % 2

        @pl.when(w % wpc == 0)
        def _():
            @pl.when(chunk_idx + 1 < n_chunks)
            def _():
                dma(1 - slot, chunk_idx + 1).start()

            dma(slot, chunk_idx).wait()

        base = (w % wpc) * WAVE
        attr_w = chunk_buf[slot, :, pl.ds(base, WAVE)]  # (ATTR_ROWS, WAVE)
        r_w = attr_w[6:7, :]  # (1, WAVE)
        g_w = attr_w[7:8, :]
        b_w = attr_w[8:9, :]

        # Pixel sub-blocks (single block at <= 1024 pixels; all per-pixel
        # state is independent, so blocks just concatenate).
        n_blocks, pb = _pix_blocks(cfg.pix, _fwd_pix_limit(cfg.pix))
        parts = []
        for h in range(n_blocks):
            sl = slice(h * pb, (h + 1) * pb)
            dx, dy, gauss, alpha_raw, alpha, passes, kidx = _wave_alpha(
                attr_w, px[sl], py[sl], w * WAVE, num
            )
            a_eff = jnp.where(passes, alpha, 0.0)
            incl = _prefix_prod_incl(1.0 - a_eff)  # (PB, WAVE)
            excl = _lane_shift_right_fill(incl, 1, 1.0)

            T_before = T[sl] * excl
            gate = T_before >= T_THRESHOLD
            w_px = jnp.where(gate, a_eff * T_before, 0.0)

            cr_h = Cr[sl] + jnp.sum(w_px * r_w, axis=1, keepdims=True)
            cg_h = Cg[sl] + jnp.sum(w_px * g_w, axis=1, keepdims=True)
            cb_h = Cb[sl] + jnp.sum(w_px * b_w, axis=1, keepdims=True)

            # excl is non-increasing along lanes, so the T gate is a prefix:
            # the post-wave transmittance is T * incl at the last gated lane
            # — one lane-min instead of a second suffix-product tree.
            t_h = T[sl] * jnp.min(
                jnp.where(gate, incl, 1.0), axis=1, keepdims=True
            )
            contrib = (a_eff > 0.0) & gate
            nc_h = nc[sl] + jnp.sum(
                contrib.astype(jnp.int32), axis=1, keepdims=True
            )
            kl_h = jnp.maximum(
                kl[sl],
                jnp.max(jnp.where(contrib, kidx, -1), axis=1, keepdims=True),
            )
            parts.append((t_h, cr_h, cg_h, cb_h, nc_h, kl_h))

        if n_blocks == 1:
            T, Cr, Cg, Cb, nc, kl = parts[0]
        else:
            T, Cr, Cg, Cb, nc, kl = (
                jnp.concatenate(xs, axis=0) for xs in zip(*parts)
            )
        return (w + 1, T, Cr, Cg, Cb, nc, kl)

    pix = cfg.pix
    init = (
        jnp.zeros((), jnp.int32),
        jnp.ones((pix, 1), jnp.float32),
        jnp.zeros((pix, 1), jnp.float32),
        jnp.zeros((pix, 1), jnp.float32),
        jnp.zeros((pix, 1), jnp.float32),
        jnp.zeros((pix, 1), jnp.int32),
        jnp.full((pix, 1), -1, jnp.int32),
    )
    w_f, T, Cr, Cg, Cb, nc, kl = jax.lax.while_loop(cond, body, init)

    # If early-exited, an already-started prefetch DMA must still be awaited
    # so the semaphore stays balanced. The last executed wave's chunk was
    # waited inside the loop; only its successor's prefetch can be in flight.
    @pl.when((w_f > 0) & (w_f < n_waves))
    def _():
        c_done = (w_f - 1) // wpc

        @pl.when(c_done + 1 < n_chunks)
        def _():
            dma((c_done + 1) % 2, c_done + 1).wait()

    cr_ref[...] = Cr
    cg_ref[...] = Cg
    cb_ref[...] = Cb
    t_ref[...] = T
    nc_ref[...] = nc
    kl_ref[...] = kl


def pack_sorted_attrs(pair_gauss, means2d, conic, rgb, opac, p_pad: int):
    """Gather per-pair attributes in sorted order -> [ATTR_ROWS, P_pad].

    XLA gather outside the kernel: after the (tile, depth) sort each tile's
    entries are contiguous, turning kernel access into sequential lane-aligned
    DMA."""
    conic_scaled = conic * jnp.asarray([-0.5, -1.0, -0.5], conic.dtype)
    attr = jnp.concatenate(
        [means2d, conic_scaled, opac[:, None], rgb], axis=1
    )  # [N, 9]: x y -a/2 -b -c/2 opac r g b (conic pre-scaled for the kernel)
    gathered = attr[pair_gauss]  # [P, 9]
    out = jnp.pad(
        gathered, ((0, p_pad - gathered.shape[0]), (0, ATTR_ROWS - NUM_ATTR))
    )
    return out.T  # [ATTR_ROWS, P_pad]


def composite_forward_pallas(cfg: RasterConfig, tile_start, tile_stop, sorted_attr,
                             row_offset=0, interpret: bool = False):
    """Run the forward kernel. sorted_attr [ATTR_ROWS, P_pad].

    Returns (color [T, PIX, 3] pre-background, final_T [T, PIX],
    n_contrib [T, PIX], k_last [T, PIX])."""
    num_tiles, pix = cfg.num_tiles, cfg.pix
    rowoff = jnp.asarray(row_offset, jnp.int32).reshape((1,))

    tile_block = pl.BlockSpec(
        (None, pix, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
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
        jax.ShapeDtypeStruct((num_tiles, pix, 1), jnp.float32),  # Cr
        jax.ShapeDtypeStruct((num_tiles, pix, 1), jnp.float32),  # Cg
        jax.ShapeDtypeStruct((num_tiles, pix, 1), jnp.float32),  # Cb
        jax.ShapeDtypeStruct((num_tiles, pix, 1), jnp.float32),  # T
        jax.ShapeDtypeStruct((num_tiles, pix, 1), jnp.int32),  # n_contrib
        jax.ShapeDtypeStruct((num_tiles, pix, 1), jnp.int32),  # k_last
    ]
    cr, cg, cb, t, nc, kl = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tile_start, tile_stop, rowoff, sorted_attr)
    color = jnp.concatenate([cr, cg, cb], axis=-1)  # [T, PIX, 3]
    return color, t[..., 0], nc[..., 0], kl[..., 0]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(cfg: RasterConfig,
                tile_start_ref, tile_stop_ref, rowoff_ref,  # scalar prefetch
                attr_hbm,  # [ATTR_ROWS, P_pad] ANY
                dcr_ref, dcg_ref, dcb_ref,  # (PIX, 1) incoming color cotangent
                r0_ref,  # (PIX, 1) scalar suffix init (bg + d_finalT terms)
                ft_ref,  # (PIX, 1) final transmittance
                kl_ref,  # (PIX, 1) last contributor index
                dattr_hbm,  # out [ATTR_ROWS, P_pad] ANY
                in_buf, out_buf, in_sems, out_sems):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    stop = tile_stop_ref[t]
    num = stop - start
    px, py = _pixel_coords(cfg, t, rowoff_ref[0])

    dcr = dcr_ref[...]  # (PIX, 1)
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
        return pltpu.make_async_copy(
            out_buf.at[slot],
            dattr_hbm.at[:, pl.ds(pl.multiple_of(start + chunk_idx * CHUNK, ALIGN), CHUNK)],
            out_sems.at[slot],
        )

    # Reverse chunk order: chunk c = n_chunks - 1 - i.
    @pl.when(n_chunks > 0)
    def _():
        dma_in(0, n_chunks - 1).start()

    def chunk_body(i, carry):
        T_run, R = carry
        c = n_chunks - 1 - i
        slot = i % 2

        @pl.when(i + 1 < n_chunks)
        def _():
            dma_in(1 - slot, c - 1).start()

        dma_in(slot, c).wait()
        # The out-buffer slot is reused every 2 chunks; its previous DMA must
        # have drained before it is overwritten.
        @pl.when(i >= 2)
        def _():
            dma_out(slot, c + 2).wait()

        # Zero-fill the out buffer once; the wave loop below only writes
        # ACTIVE waves. This replaces the per-wave active/dead lax.cond pair
        # (and the per-chunk active/inactive cond) whose joint live
        # temporaries dominated the kernel's scoped-VMEM stack.
        out_buf[slot, :, :] = jnp.zeros((ATTR_ROWS, CHUNK), jnp.float32)

        # Pixels are processed in sub-blocks of <= _PIX_BLOCK sublanes so the
        # live (PIX, WAVE) temporaries fit scoped VMEM for large tiles
        # (32x32 tiles with full-PIX temps exceed the ~16 MB limit).
        # The block count must DIVIDE pix or the tail pixels are never
        # processed (e.g. --tile 40: pix=1600, ceil gives 7, 7*228=1596) —
        # _pix_blocks walks up to the next divisor.
        pix = cfg.pix
        n_blocks, pb = _pix_blocks(pix, _PIX_BLOCK)

        # Waves 0..n_active-1 of this chunk hold entries <= max_kl (all
        # pixels' last contributors); later waves are dead — zero grads,
        # T/R unchanged — and are skipped entirely (n_active = 0 for fully
        # dead chunks: the loop is a no-op).
        wpc_ = CHUNK // WAVE
        n_active = jnp.clip((max_kl - c * CHUNK) // WAVE + 1, 0, wpc_)

        def wave_half(attr_w, pxh, pyh, base_idx, Th, Rh, klh, dcrh, dcgh, dcbh):
            """One pixel sub-block of one wave. Returns (T', R', grad rows)."""
            dx, dy, gauss, alpha_raw, alpha, passes, kidx = _wave_alpha(
                attr_w, pxh, pyh, base_idx, num
            )
            contrib = passes & (kidx <= klh)
            a_g = jnp.where(contrib, alpha, 0.0)
            om = jnp.maximum(1.0 - a_g, 1e-5)

            sp = _suffix_prod_incl(om)  # sp[j] = prod_{k>=j} om_k
            T_before = Th / sp  # (PB, WAVE)

            r_w = attr_w[6:7, :]
            g_w = attr_w[7:8, :]
            b_w = attr_w[8:9, :]
            dCdot = dcrh * r_w + dcgh * g_w + dcbh * b_w  # (PB, WAVE)
            w_px = a_g * T_before
            contribX = w_px * dCdot

            s_incl = _suffix_sum_incl(contribX)
            s_excl = _lane_shift_left_fill(s_incl, 1, 0.0)

            g_alpha = jnp.where(
                contrib, T_before * dCdot - (s_excl + Rh) / om, 0.0
            )
            clamp_ok = (alpha_raw < ALPHA_CLAMP).astype(jnp.float32)
            g_op_px = g_alpha * gauss * clamp_ok
            g_pow = g_alpha * alpha * clamp_ok

            # Pre-scaled conic rows (ca = -a/2, cb = -b, cc = -c/2):
            # d power/d dx = 2*ca*dx + cb*dy, and the conic gradient rows are
            # w.r.t. the SCALED values — unscaled back in _pallas_bwd.
            ca = attr_w[2:3, :]
            cb_w = attr_w[3:4, :]
            cc = attr_w[4:5, :]
            g_dx = g_pow * (2.0 * ca * dx + cb_w * dy)
            g_dy = g_pow * (cb_w * dx + 2.0 * cc * dy)

            def csum(x):
                return jnp.sum(x, axis=0, keepdims=True)  # (1, WAVE)

            grads = (
                -csum(g_dx),  # d mean_x
                -csum(g_dy),  # d mean_y
                csum(g_pow * (dx * dx)),  # d conic_a_scaled
                csum(g_pow * (dx * dy)),  # d conic_b_scaled
                csum(g_pow * (dy * dy)),  # d conic_c_scaled
                csum(g_op_px),  # d opac
                csum(w_px * dcrh),  # d r
                csum(w_px * dcgh),  # d g
                csum(w_px * dcbh),  # d b
            )
            return Th / sp[:, 0:1], Rh + s_incl[:, 0:1], grads

        def wave_grads(w_rev, wcarry):
            T_run, R = wcarry
            w = n_active - 1 - w_rev  # traced wave index (reverse order)
            base = w * WAVE
            base_idx = c * CHUNK + base

            attr_w = in_buf[slot, :, pl.ds(base, WAVE)]
            t_parts, r_parts = [], []
            grad_acc = None
            for h in range(n_blocks):
                sl = slice(h * pb, (h + 1) * pb)
                Th, Rh, grads = wave_half(
                    attr_w, px[sl], py[sl], base_idx,
                    T_run[sl], R[sl], kl[sl], dcr[sl], dcg[sl], dcb[sl],
                )
                t_parts.append(Th)
                r_parts.append(Rh)
                grad_acc = grads if grad_acc is None else tuple(
                    a + b for a, b in zip(grad_acc, grads)
                )

            grad_w = jnp.concatenate(
                list(grad_acc)
                + [jnp.zeros((ATTR_ROWS - NUM_ATTR, WAVE), jnp.float32)],
                axis=0,
            )  # (ATTR_ROWS, WAVE)
            out_buf[slot, :, pl.ds(base, WAVE)] = grad_w

            T_run = t_parts[0] if n_blocks == 1 else jnp.concatenate(t_parts, 0)
            R = r_parts[0] if n_blocks == 1 else jnp.concatenate(r_parts, 0)
            return T_run, R

        T_run, R = jax.lax.fori_loop(0, n_active, wave_grads, (T_run, R))
        dma_out(slot, c).start()
        return T_run, R

    T0 = ft_ref[...]
    R0 = r0_ref[...]
    jax.lax.fori_loop(0, n_chunks, chunk_body, (T0, R0))

    # Drain outstanding out-DMAs so the next (sequential) grid step cannot
    # overwrite rows this step still has in flight.
    @pl.when(n_chunks >= 2)
    def _():
        dma_out((n_chunks - 2) % 2, 1).wait()

    @pl.when(n_chunks >= 1)
    def _():
        dma_out((n_chunks - 1) % 2, 0).wait()


def composite_backward_pallas(cfg: RasterConfig, tile_start, tile_stop, sorted_attr,
                              d_color_t, r0, final_t, k_last, row_offset=0,
                              interpret: bool = False):
    """Run the backward kernel. d_color_t [T, PIX, 3]; returns per-pair
    gradient rows [ATTR_ROWS, P_pad] (columns past each tile's range zero)."""
    num_tiles, pix = cfg.num_tiles, cfg.pix
    p_pad = sorted_attr.shape[1]
    rowoff = jnp.asarray(row_offset, jnp.int32).reshape((1,))

    tile_block = pl.BlockSpec(
        (None, pix, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
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
            pltpu.VMEM((2, ATTR_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    exp = lambda a: a[..., None]  # [T, PIX] -> [T, PIX, 1]
    (d_attr,) = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ATTR_ROWS, p_pad), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_start, tile_stop, rowoff, sorted_attr,
        exp(d_color_t[..., 0]), exp(d_color_t[..., 1]), exp(d_color_t[..., 2]),
        exp(r0), exp(final_t), exp(k_last),
    )
    return d_attr


# ---------------------------------------------------------------------------
# custom_vjp wrapper — drop-in replacement for rasterize_tiled.composite_tiles
# ---------------------------------------------------------------------------


def _p_aligned(cfg: RasterConfig) -> int:
    """Aligned pair-list capacity: worst case adds ALIGN-1 pad per tile."""
    raw = cfg.pair_capacity + cfg.num_tiles * ALIGN
    return -(-raw // CHUNK) * CHUNK + CHUNK


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Kernel geometry selector. "transposed" (default, composite_t.py): pixels on
# lanes, entries on sublane waves — no Mosaic 128x lane-padding on per-pixel
# state, so any tile size compiles. "lane": the round-1/2 geometry above
# (pixels on sublanes, 128-entry lane waves), kept for A/B measurement.
import os as _os

KERNEL_GEOMETRY = _os.environ.get("TPUGS_KERNEL_GEOMETRY", "transposed")

# Align-layout producer. "1" (default): the Pallas align-copy kernel —
# per-tile sequential DMA re-layout (pallas/pack.py), no [P_aligned]-scale
# ownership/gather ops. "0": the round-2 align_segments + pack_sorted_attrs
# XLA path, kept for A/B measurement.
ALIGN_KERNEL = _os.environ.get("TPUGS_ALIGN_KERNEL", "1") == "1"


def _kernel_impls():
    if KERNEL_GEOMETRY == "transposed":
        from tpugs.ops.pallas import composite_t

        return (composite_t.composite_forward_pallas,
                composite_t.composite_backward_pallas)
    return composite_forward_pallas, composite_backward_pallas


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def composite_tiles_pallas(cfg: RasterConfig, tile_start, tile_stop, pair_gauss,
                           means2d, conic, rgb, opac, background, row_offset=0,
                           attr_c=None):
    """Pallas compositor with the same contract as composite_tiles:
    returns (color [T,PIX,3] incl. background blend, final_T, n_contrib).

    row_offset: global tile-row index of tile 0 (tile-sharded path only).
    attr_c: optional pre-sorted compact attribute rows ([11, P] —
    BinningResult.attr_c from carry_attrs binning); when given, the
    latency-bound [P]-row pack gather is skipped. Values are bit-identical
    to the gathered path's, so the output (and the manual VJP, which never
    differentiates the pack) is unchanged."""
    out, _ = _pallas_fwd(cfg, tile_start, tile_stop, pair_gauss,
                         means2d, conic, rgb, opac, background, row_offset,
                         attr_c)
    return out


def _pallas_fwd(cfg, tile_start, tile_stop, pair_gauss, means2d, conic, rgb, opac,
                background, row_offset=0, attr_c=None):
    carried_rows = None if attr_c is None else attr_c.shape[0]
    if ALIGN_KERNEL:
        from tpugs.ops.pallas import pack as _pack

        astart, astop, counts = _pack.aligned_offsets(tile_start, tile_stop)
        p_aligned = _pack.p_aligned_chunked(cfg.pair_capacity, cfg.num_tiles)
        # The pair list may be longer than pair_capacity (the Pallas expand
        # kernel emits a padded layout, binning.bin_gaussians_expand_kernel);
        # real entries never exceed capacity, so p_aligned is unaffected.
        pc_pad = pair_gauss.shape[0] + _pack.CHUNK + 2 * _pack.LANE_ALIGN
        if attr_c is not None:
            # Attributes already in compact sorted order (expand kernel +
            # sort payload): pad rows/lanes to the streaming layout — the
            # only [P]-sized op left on this path is this one copy.
            attr_cp = jnp.pad(
                attr_c,
                ((0, _pack.ATTR_ROWS - attr_c.shape[0]),
                 (0, pc_pad - attr_c.shape[1])),
            )
        else:
            # Valid pairs always occupy the FIRST min(num_pairs, capacity)
            # sorted slots (sentinels sort to the back), so gather only that
            # prefix: the expand kernel's padded layout appends ~12-24%
            # slack slots whose attr rows nobody reads (every tile segment
            # ends <= num_pairs <= pair_capacity, and the align-copy DMA
            # overruns at most CHUNK + LANE_ALIGN past a segment).
            pg = pair_gauss[: min(pair_gauss.shape[0], cfg.pair_capacity)]
            attr_cp = _pack.pack_compact_attrs(
                pg, means2d, conic, rgb, opac,
                pg.shape[0] + _pack.CHUNK + 2 * _pack.LANE_ALIGN,
            )
        attr = _pack.align_copy_pallas(
            attr_cp, tile_start, astart, counts, p_aligned,
            interpret=_interpret(),
        )
        # Aligned gauss ids / validity ride the copy as attr rows; gaps are
        # zero (valid 0.0), only the tail slack past astop[-1] is unwritten.
        aligned_gauss = attr[_pack.GID_ROW].astype(jnp.int32)
        avalid = attr[_pack.VALID_ROW] > 0.5
    else:
        p_aligned = _p_aligned(cfg)
        astart, astop, aligned_gauss, avalid = align_segments(
            tile_start, tile_stop, pair_gauss, p_aligned
        )
        attr = pack_sorted_attrs(
            aligned_gauss, means2d, conic, rgb, opac, p_aligned
        )
    fwd_impl, _ = _kernel_impls()
    color, t, nc, kl = fwd_impl(
        cfg, astart, astop, attr, row_offset, interpret=_interpret()
    )
    color = color + t[..., None] * background[None, None, :]
    res = (astart, astop, aligned_gauss, avalid, attr, t, kl, background,
           means2d.shape[0], row_offset, pair_gauss.shape[0], carried_rows)
    return (color, t, nc), res


def _bwd_entry_rows(cfg, astart, astop, attr, d_color, r0, final_t, kl,
                    row_offset):
    """Entry-major per-pair gradient rows [P_aligned, >= NUM_ATTR] from the
    geometry-selected backward kernel. The transposed kernel emits this
    layout natively ([P, OUT_LANES] — composite_t.OUT_LANES rationale); the
    lane-wave A/B geometry keeps [ATTR_ROWS, P] and pays the relayout
    transpose here."""
    _, bwd_impl = _kernel_impls()
    out = bwd_impl(
        cfg, astart, astop, attr, d_color, r0, final_t, kl, row_offset,
        interpret=_interpret(),
    )
    if KERNEL_GEOMETRY == "transposed":
        return out  # [P_aligned, OUT_LANES]
    return out[:NUM_ATTR, :].T  # [P_aligned, 9]


def _pallas_bwd(cfg, res, cot):
    (astart, astop, aligned_gauss, avalid, attr, final_t, kl, background, n,
     row_offset, n_pairs, carried_rows) = res
    d_color, d_finalT, _d_nc = cot

    dc_dot_bg = jnp.einsum("tpc,c->tp", d_color, background)
    r0 = (dc_dot_bg + d_finalT) * final_t

    d_attr = _bwd_entry_rows(
        cfg, astart, astop, attr, d_color, r0, final_t, kl, row_offset,
    )[:, :NUM_ATTR]  # [P_aligned, 9]

    # Pair -> gaussian reduction (deterministic XLA scatter-add). Alignment
    # gaps and columns past the last tile's range are masked out.
    valid = avalid & (jnp.arange(d_attr.shape[0]) < astop[-1])
    rows = jnp.where(valid[:, None], d_attr, 0.0)
    safe_g = jnp.where(valid, aligned_gauss, 0)
    acc = jnp.zeros((n, NUM_ATTR), jnp.float32).at[safe_g].add(rows)

    d_means2d = acc[:, 0:2]
    # Kernel emits grads w.r.t. the pre-scaled conic (-a/2, -b, -c/2).
    d_conic = acc[:, 2:5] * jnp.asarray([-0.5, -1.0, -0.5], acc.dtype)
    d_opac = acc[:, 5]
    d_rgb = acc[:, 6:9]
    d_bg = jnp.einsum("tpc,tp->c", d_color, final_t)

    # float0 cotangents shaped like the *primal* int inputs.
    return (
        np.zeros(astart.shape, jax.dtypes.float0),  # tile_start
        np.zeros(astop.shape, jax.dtypes.float0),  # tile_stop
        np.zeros((n_pairs,), jax.dtypes.float0),  # pair_gauss
        d_means2d,
        d_conic,
        d_rgb,
        d_opac,
        d_bg,
        np.zeros(np.shape(row_offset), jax.dtypes.float0),  # row_offset
        # attr_c carries no gradient: it is built from stop_gradient'd
        # binning plumbing; the real gradient path is the manual reduction
        # to means2d/conic/rgb/opac above.
        None if carried_rows is None
        else jnp.zeros((carried_rows, n_pairs), jnp.float32),
    )


composite_tiles_pallas.defvjp(_pallas_fwd, _pallas_bwd)


# ---------------------------------------------------------------------------
# Pre-aligned variant: consumes binning.bin_gaussians_aligned's layout
# directly, skipping the align_segments ownership pass (~3 [P]-sized ops).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def composite_tiles_pallas_pre(cfg: RasterConfig, tile_start, tile_stop,
                               pair_gauss, pair_valid, means2d, conic, rgb,
                               opac, background, row_offset=0):
    """Same contract as composite_tiles_pallas, but tile_start/tile_stop/
    pair_gauss/pair_valid are already in the kernels' aligned layout
    (binning.bin_gaussians_aligned with p_aligned = _p_aligned(cfg))."""
    out, _ = _pallas_pre_fwd(cfg, tile_start, tile_stop, pair_gauss,
                             pair_valid, means2d, conic, rgb, opac,
                             background, row_offset)
    return out


def _pallas_pre_fwd(cfg, tile_start, tile_stop, pair_gauss, pair_valid,
                    means2d, conic, rgb, opac, background, row_offset=0):
    p_al = pair_gauss.shape[0]
    # Gap slots hold gaussian 0's attrs (harmless: kernels never read outside
    # [start, stop) and backward masks on pair_valid).
    attr = pack_sorted_attrs(pair_gauss, means2d, conic, rgb, opac, p_al)
    fwd_impl, _ = _kernel_impls()
    color, t, nc, kl = fwd_impl(
        cfg, tile_start, tile_stop, attr, row_offset, interpret=_interpret()
    )
    color = color + t[..., None] * background[None, None, :]
    res = (tile_start, tile_stop, pair_gauss, pair_valid, attr, t, kl,
           background, means2d.shape[0], row_offset)
    return (color, t, nc), res


def _pallas_pre_bwd(cfg, res, cot):
    (tile_start, tile_stop, pair_gauss, pair_valid, attr, final_t, kl,
     background, n, row_offset) = res
    d_color, d_finalT, _d_nc = cot

    dc_dot_bg = jnp.einsum("tpc,c->tp", d_color, background)
    r0 = (dc_dot_bg + d_finalT) * final_t

    _, bwd_impl = _kernel_impls()
    d_attr = bwd_impl(
        cfg, tile_start, tile_stop, attr, d_color, r0, final_t, kl,
        row_offset, interpret=_interpret(),
    )[:NUM_ATTR, :].T  # [P_al, 9]

    valid = pair_valid & (jnp.arange(d_attr.shape[0]) < tile_stop[-1])
    rows = jnp.where(valid[:, None], d_attr, 0.0)
    safe_g = jnp.where(valid, pair_gauss, 0)
    acc = jnp.zeros((n, NUM_ATTR), jnp.float32).at[safe_g].add(rows)

    d_means2d = acc[:, 0:2]
    d_conic = acc[:, 2:5] * jnp.asarray([-0.5, -1.0, -0.5], acc.dtype)
    d_opac = acc[:, 5]
    d_rgb = acc[:, 6:9]
    d_bg = jnp.einsum("tpc,tp->c", d_color, final_t)

    f0 = lambda x: np.zeros(np.shape(x), jax.dtypes.float0)
    return (
        f0(tile_start),
        f0(tile_stop),
        f0(pair_gauss),
        f0(pair_valid),
        d_means2d,
        d_conic,
        d_rgb,
        d_opac,
        d_bg,
        f0(row_offset),
    )


composite_tiles_pallas_pre.defvjp(_pallas_pre_fwd, _pallas_pre_bwd)


# ---------------------------------------------------------------------------
# Segment-reduce variant: same forward as composite_tiles_pallas, but the
# backward's pair->gaussian reduction runs as a monotone segment sum
# (ops/pallas/segreduce.py) instead of an XLA scatter-add — the scatter was
# the single largest op in the train step (225 ms of a 336 ms garden step;
# docs/PERF_NOTES.md r3). Requires the expansion metadata that
# binning.bin_gaussians_expand_kernel(reduce_meta=True) emits.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def composite_tiles_pallas_segred(cfg: RasterConfig, tile_start, tile_stop,
                                  pair_gauss, pair_tile, exp_slot, red_start,
                                  red_count, exp_end, means2d, conic, rgb,
                                  opac, background, row_offset=0,
                                  attr_c=None):
    """composite_tiles_pallas with a segment-sum backward reduction.

    pair_tile/exp_slot/red_start/red_count/exp_end are the BinningResult
    reduction-metadata fields (reduce_meta=True); tile_stop must be the
    CLAMPED stops (clamp_tile_segments), so dropped front-K entries are
    excluded from both the forward and the gradient — identical semantics
    to the scatter path's avalid masking. attr_c: optional carried sorted
    attributes (see composite_tiles_pallas)."""
    out, _ = _segred_fwd(cfg, tile_start, tile_stop, pair_gauss, pair_tile,
                         exp_slot, red_start, red_count, exp_end, means2d,
                         conic, rgb, opac, background, row_offset, attr_c)
    return out


def _segred_fwd(cfg, tile_start, tile_stop, pair_gauss, pair_tile, exp_slot,
                red_start, red_count, exp_end, means2d, conic, rgb, opac,
                background, row_offset=0, attr_c=None):
    out, inner = _pallas_fwd(cfg, tile_start, tile_stop, pair_gauss, means2d,
                             conic, rgb, opac, background, row_offset, attr_c)
    return out, (inner, tile_start, tile_stop, pair_tile, exp_slot,
                 red_start, red_count, exp_end)


def _segred_bwd(cfg, res, cot):
    from tpugs.ops.pallas import segreduce as SR

    (inner, tile_start, tile_stop, pair_tile, exp_slot, red_start, red_count,
     exp_end) = res
    (astart, _astop, _aligned_gauss, _avalid, attr, final_t, kl, background,
     n, row_offset, n_pairs, carried_rows) = inner
    d_color, d_finalT, _d_nc = cot

    dc_dot_bg = jnp.einsum("tpc,c->tp", d_color, background)
    r0 = (dc_dot_bg + d_finalT) * final_t

    d_rows = _bwd_entry_rows(
        cfg, astart, _astop, attr, d_color, r0, final_t, kl, row_offset,
    )  # [P_aligned, OUT_LANES] (transposed geometry: native entry-major)
    if d_rows.shape[1] != SR.IN_LANES:
        # Lane-wave A/B geometry: pad the 9 gradient lanes to the reduce
        # kernel's row width (physically free — a [P, 9] f32 array is
        # 128-lane padded in HBM anyway).
        d_rows = jnp.pad(d_rows, ((0, 0), (0, SR.IN_LANES - d_rows.shape[1])))

    # Re-order the per-pair gradient rows into the gaussian-major expansion
    # domain: (1) each sorted pair's aligned position is elementwise
    # (astart[tile] + rank within tile, valid iff inside the CLAMPED stop);
    # (2) one u32 sort keyed on the expansion slot inverts the pair sort.
    # Gap/culled/clamped/sentinel slots fold to the out-of-range marker and
    # are masked to zero in the gather (rows past each tile's chunked range
    # are unwritten kernel output — never read unmasked).
    i32 = jnp.int32
    p_al = attr.shape[1]
    zero_idx = p_al
    p_out = pair_tile.shape[0]
    tbl = jnp.concatenate(
        [jnp.stack([tile_start, tile_stop, astart], axis=1),
         jnp.zeros((1, 3), i32)],
        axis=0,
    )  # [num_tiles + 1, 3] — one row-table gather for all three lookups
    rowsT = tbl[jnp.minimum(pair_tile, cfg.num_tiles)]
    s_iota = jnp.arange(p_out, dtype=i32)
    a_s = rowsT[:, 2] + (s_iota - rowsT[:, 0])
    valid = (s_iota < rowsT[:, 1]) & (pair_tile < cfg.num_tiles)
    a_fold = jnp.where(valid, a_s, zero_idx)
    _, a_e = jax.lax.sort((exp_slot.astype(jnp.uint32), a_fold), num_keys=1)
    p_in = -(-p_out // SR.C) * SR.C + SR.C
    a_e = jnp.pad(a_e, (0, p_in - p_out), constant_values=zero_idx)
    gathered = jnp.where(
        (a_e < p_al)[:, None],
        d_rows[jnp.minimum(a_e, p_al - 1)],
        0.0,
    )  # [p_in, IN_LANES] gid-major gradient rows

    acc16 = SR.segment_reduce_pallas(
        gathered, red_start, red_count, exp_end, interpret=_interpret()
    )  # [ATTR_ROWS, n_pad]
    acc = acc16[:NUM_ATTR, :n].T  # [n, 9]

    d_means2d = acc[:, 0:2]
    d_conic = acc[:, 2:5] * jnp.asarray([-0.5, -1.0, -0.5], acc.dtype)
    d_opac = acc[:, 5]
    d_rgb = acc[:, 6:9]
    d_bg = jnp.einsum("tpc,tp->c", d_color, final_t)

    f0 = lambda x: np.zeros(np.shape(x), jax.dtypes.float0)
    return (
        f0(tile_start),
        f0(tile_stop),
        np.zeros((n_pairs,), jax.dtypes.float0),  # pair_gauss
        f0(pair_tile),
        f0(exp_slot),
        f0(red_start),
        f0(red_count),
        f0(exp_end),
        d_means2d,
        d_conic,
        d_rgb,
        d_opac,
        d_bg,
        f0(row_offset),
        None if carried_rows is None
        else jnp.zeros((carried_rows, n_pairs), jnp.float32),  # attr_c
    )


composite_tiles_pallas_segred.defvjp(_segred_fwd, _segred_bwd)
