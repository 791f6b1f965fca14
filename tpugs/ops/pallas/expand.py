"""Pallas pair-expansion kernel — the binning [P]-plumbing as sequential
writes + one-hot MXU ownership.

The XLA expansion in ops/binning.bin_gaussians builds the (tile, gaussian)
pair list with a [N]->[P] marker scatter, a [P] cumsum, and a [P, 8]
row-table gather — ~58 ms of a 118 ms 1080p/1M viewer frame in context
(docs/PERF_NOTES.md r3: the gather is latency-bound, the scatter+cumsum are
two more full [P] passes). This kernel replaces all of it:

- grid over GAUSSIAN chunks of GC; chunk c's pairs occupy the contiguous
  output span starting at a 128-aligned base (abase[c]) — written with
  sequential double-buffered DMA (bandwidth-bound, no scatter);
- slot ownership inside a chunk is an interval one-hot
  (offset[j] <= slot < offset[j]+count[j]) and the per-slot "gather" of the
  owning gaussian's rect/cull row is ONE MXU matmul
  (table[16, GC] @ one_hot[GC, OB]) — the classic one-hot-gather trick;
- per-chunk output spans are padded to PAD_ALIGN(128)-lane granularity
  (Mosaic DMA alignment); gap slots carry the sentinel tile id and SORT TO
  THE BACK, so the existing pair sort absorbs the padding. A chunk's tail
  OB-block may overrun up to OB-PAD_ALIGN lanes past its padded span with
  sentinels — safe because the TPU grid is sequential, real writes happen
  after (forward-only overruns), and the final fill step re-covers the last
  chunk's overrun;
- one extra trailing grid step sentinel-fills [aligned_total, p_out) with a
  4096/512/128 static-size DMA ladder so no uninitialized HBM can
  masquerade as pairs.

Output layout: one [4, P_out] f32 array —
  row 0 = tile id (sentinel = num_tiles), row 1 = depth (inf at sentinel),
  row 2 = gaussian id, row 3 = validity (1.0 real pair, 0.0 sentinel).
All values < 2^24, exact in f32. Downstream casts + the same 2-key
(tile, depth, g) sort reproduce bin_gaussians' non-presorted path
bit-for-bit (tests/test_expand_pallas.py).

carry_attrs=True additionally emits the 9 compositor attribute rows per
pair (x y ca cb cc op r g b — the pack.pack_compact_attrs layout) as output
rows 4..12 ([16, P_out] total): the expansion is gaussian-major, so the
attributes stream out SEQUENTIALLY here (rows of the same one-hot MXU
product that already resolves slot ownership) instead of being randomly
gathered per sorted pair afterwards. The [P]-sized pair sort then carries
them as payload operands — measured FREE on TPU (scripts/
bench_sort_payload.py: 3-array 12.5 ms vs 12-array 12.1 ms at P=2.4M)
— which deletes the ~17 ms latency-bound pack row-gather from the 1080p/1M
viewer frame (scripts/trace_report.py). Attribute values are exact: the
one-hot matmul runs at precision=HIGHEST, so they are bit-identical to the
gathered path's.

Reference analogue: k_fill_sort_pairs, one thread per (gaussian, tile)
(/root/reference/src/rasterizer/sorting.cu:30-72).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

GC = int(_os.environ.get("TPUGS_EXPAND_GC", "256"))  # gaussians per chunk
#      (grid axis); env knob for perf A/B — bigger chunks mean fewer grid
#      steps and less PAD_ALIGN padding but a wider one-hot matmul
OB = 512  # output slots per compute/DMA block
PAD_ALIGN = 128  # per-chunk output padding granularity (DMA alignment)
ROWS = 16  # table rows: off cnt tx0 ty0 w gx gy r2 depth gid (pad to 16)
ROWS_ATTR = 24  # carry_attrs table: ROWS layout + ca cb cc op r g b (pad 24)
OUT_ROWS = 4  # output rows: tile depth gid valid
OUT_ROWS_ATTR = 16  # + x y ca cb cc op r g b (pad to 16)
FILL_BIG = 4096  # tail-fill ladder block sizes (static DMA widths)


def expand_capacity(pair_capacity: int, n: int) -> int:
    """Static output capacity: pair capacity + worst-case per-chunk padding
    (PAD_ALIGN-1 per chunk) + one OB tail-overrun slack, OB-rounded."""
    n_chunks = -(-n // GC)
    raw = pair_capacity + n_chunks * (PAD_ALIGN - 1) + OB
    return -(-raw // OB) * OB


def _expand_kernel(num_tiles: int, ntx: int, tile_w: int, tile_h: int,
                   p_out: int, orows: int,
                   coffs_ref, abase_ref, fill_ref,  # scalar prefetch
                   table_ref,  # (trows, GC) VMEM block
                   out_hbm,  # [orows, p_out] ANY
                   out_buf,  # VMEM (2, orows, OB)
                   fill_buf,  # VMEM (orows, FILL_BIG)
                   sems):  # DMA (2,)
    c = pl.program_id(0)
    nc_real = pl.num_programs(0) - 1

    @pl.when(c < nc_real)
    def _chunk():
        base = coffs_ref[c]
        span = coffs_ref[c + 1] - base
        ab = abase_ref[c]
        n_blocks = pl.cdiv(span, OB)
        base_f = base.astype(jnp.float32)
        span_f = span.astype(jnp.float32)

        tblk = table_ref[...]  # (ROWS, GC)
        # (GC, 1) columns for the interval compare: local offset and count.
        occ = jnp.transpose(tblk[0:2, :])  # (GC, 2)
        loff = occ[:, 0:1] - base_f
        cnt = occ[:, 1:2]

        def dma(slot, b):
            return pltpu.make_async_copy(
                out_buf.at[slot],
                out_hbm.at[
                    :, pl.ds(pl.multiple_of(ab + b * OB, PAD_ALIGN), OB)
                ],
                sems.at[slot],
            )

        def body(b, carry):
            slot = b % 2

            # Reusing the buffer written by block b-2: drain that DMA first.
            @pl.when(b >= 2)
            def _():
                dma(slot, b - 2).wait()

            s = (b * OB + jax.lax.broadcasted_iota(jnp.int32, (1, OB), 1)
                 ).astype(jnp.float32)  # (1, OB) local slot ids
            oh = ((loff <= s) & (s < loff + cnt)).astype(
                jnp.float32
            )  # (GC, OB)
            # precision=HIGHEST is load-bearing: the MXU truncates f32
            # operands to bf16 by default (ulp 2 above 256 — offsets, pixel
            # coords, and depths all corrupt); HIGHEST runs the 3-pass f32
            # emulation, exact for one-hot x f32.
            g = jax.lax.dot_general(
                tblk, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (ROWS, OB) — owning gaussian's row per slot
            has = jnp.sum(oh, axis=0, keepdims=True) > 0.0  # (1, OB)

            local = s - (g[0:1, :] - base_f)
            w = jnp.maximum(g[4:5, :], 1.0)
            # Exact: local < 2^20 and w <= a few thousand, so the f32
            # division sits far inside the rounding-safe range.
            q = jnp.floor(local / w)
            tx = g[2:3, :] + (local - q * w)
            ty = g[3:4, :] + q

            # Pixel-exact corner cull (binning.bin_gaussians semantics).
            px0 = tx * float(tile_w)
            py0 = ty * float(tile_h)
            gx = g[5:6, :]
            gy = g[6:7, :]
            dx = jnp.clip(gx, px0, px0 + float(tile_w - 1)) - gx
            dy = jnp.clip(gy, py0, py0 + float(tile_h - 1)) - gy
            hit = dx * dx + dy * dy <= g[7:8, :]

            valid = has & hit & (s < span_f)
            tile_id = jnp.where(valid, ty * float(ntx) + tx,
                                float(num_tiles))
            depth = jnp.where(valid, g[8:9, :], jnp.inf)

            out_buf[slot, 0:1, :] = tile_id
            out_buf[slot, 1:2, :] = depth
            out_buf[slot, 2:3, :] = g[9:10, :]
            out_buf[slot, 3:4, :] = valid.astype(jnp.float32)
            if orows > OUT_ROWS:
                # Attribute rows in pack_compact_attrs order (x y ca cb cc
                # op r g b): x/y reuse the cull's gx/gy table rows, the rest
                # sit at table rows 10..16. Sentinel slots carry garbage
                # attrs — harmless, they sort outside every tile segment.
                out_buf[slot, 4:6, :] = g[5:7, :]
                out_buf[slot, 6:13, :] = g[10:17, :]
                out_buf[slot, 13:orows, :] = jnp.zeros(
                    (orows - 13, OB), jnp.float32
                )
            dma(slot, b).start()
            return carry

        jax.lax.fori_loop(0, n_blocks, body, 0)

        @pl.when(n_blocks >= 2)
        def _():
            dma((n_blocks - 2) % 2, n_blocks - 2).wait()

        @pl.when(n_blocks >= 1)
        def _():
            dma((n_blocks - 1) % 2, n_blocks - 1).wait()

    @pl.when(c == nc_real)
    def _tail():
        start = fill_ref[0]  # PAD_ALIGN-aligned end of real data
        remaining = p_out - start  # multiple of PAD_ALIGN

        fill_buf[0:1, :] = jnp.full((1, FILL_BIG), float(num_tiles))
        fill_buf[1:2, :] = jnp.full((1, FILL_BIG), jnp.inf)
        fill_buf[2:orows, :] = jnp.zeros((orows - 2, FILL_BIG))

        def ladder(width, off, count):
            def step(i, carry):
                copy = pltpu.make_async_copy(
                    fill_buf.at[:, pl.ds(0, width)],
                    out_hbm.at[
                        :, pl.ds(pl.multiple_of(off + i * width, PAD_ALIGN),
                                 width)
                    ],
                    sems.at[0],
                )
                copy.start()
                copy.wait()
                return carry

            jax.lax.fori_loop(0, count, step, 0)

        # Static guard: the FILL_BIG slice must type-check against p_out
        # even at zero trip count.
        if p_out >= FILL_BIG:
            n_big = remaining // FILL_BIG
            ladder(FILL_BIG, start, n_big)
        else:
            n_big = 0
        off2 = start + n_big * FILL_BIG
        rem2 = remaining - n_big * FILL_BIG
        n_mid = rem2 // OB
        ladder(OB, off2, n_mid)
        off3 = off2 + n_mid * OB
        n_small = (rem2 - n_mid * OB) // PAD_ALIGN
        ladder(PAD_ALIGN, off3, n_small)


def expand_pairs_pallas(table, coffs, abase, fill_start, num_tiles: int,
                        ntx: int, tile_w: int, tile_h: int, p_out: int,
                        interpret: bool = False):
    """Run the expansion. table [ROWS or ROWS_ATTR, N_pad] f32 (N_pad
    multiple of GC; ROWS_ATTR selects the carry_attrs output layout);
    coffs [nc+1] i32 chunk pair-offsets (CLAMPED to pair capacity by the
    caller); abase [nc] i32 PAD_ALIGN-aligned output bases; fill_start [1]
    i32 = abase[-1] + padded last span (<= p_out - OB by expand_capacity).
    Returns [OUT_ROWS or OUT_ROWS_ATTR, p_out] f32 (see module doc)."""
    trows, n_pad = table.shape
    orows = OUT_ROWS_ATTR if trows == ROWS_ATTR else OUT_ROWS
    nc = n_pad // GC
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nc + 1,),
        in_specs=[
            pl.BlockSpec((trows, GC),
                         lambda c, *_: (0, jnp.minimum(c, nc - 1)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, orows, OB), jnp.float32),
            pltpu.VMEM((orows, FILL_BIG), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(_expand_kernel, num_tiles, ntx, tile_w, tile_h,
                          p_out, orows),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((orows, p_out), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(coffs.astype(jnp.int32), abase.astype(jnp.int32),
      fill_start.astype(jnp.int32), table)
    return out
