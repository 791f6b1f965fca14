"""Pallas align-copy kernel — the [P]-plumbing's segment re-layout as DMA.

The compositor kernels stream per-tile attribute segments whose starts must
sit on aligned lane offsets of a [ATTR_ROWS, P_aligned] array. Round 1/2
produced that layout with `align_segments` + `pack_sorted_attrs`: an
[P_aligned]-scale slot-ownership recompute (scatter-histogram + cumsum) and
two random XLA gathers. XLA TPU gathers run ~10 ns/row (latency-bound, ~100x
off HBM bandwidth — docs/PERF_NOTES.md), so that pass was a major share of
the 1080p/1M viewer frame.

This module replaces it with the observation that the re-layout is a
*per-tile contiguous copy*: tile t's entries occupy [tile_start[t],
tile_start[t]+count) of the compact sorted list and [astart[t],
astart[t]+count) of the aligned layout. A Pallas kernel with a grid over
tiles moves each segment with sequential double-buffered DMAs (read at the
128-floored compact offset, shift in VMEM, write at the aligned offset) —
bandwidth-bound, no gathers, no ownership pass. Aligned segment starts are
LANE_ALIGN-granular (128 — see aligned_offsets for why chunk-write overrun
into the next tile's region is safe by grid ordering); gap lanes are
zero-filled, which also zeroes the validity row (row 10), so downstream
masking needs no separate valid array.

The attribute table additionally carries per-pair metadata the backward pass
needs (reference exports these via its sorted pair list,
src/rasterizer/sorting.cu:30-109):
  row 9  = gaussian id (exact in f32: ids < 2^24)
  row 10 = 1.0 for real entries, 0.0 in alignment gaps
so the aligned gauss-id/validity arrays come free with the copy instead of
from their own [P_aligned] gathers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ATTR_ROWS = 16  # padded attr rows: x y ca cb cc opac r g b gid valid (pad)
NUM_ATTR = 9
CHUNK = 512  # entries per DMA chunk == aligned-segment start granularity
LANE_ALIGN = 128  # lane-offset floor granularity for the compact-side read
GID_ROW = 9
VALID_ROW = 10


def aligned_offsets(tile_start, tile_stop):
    """LANE_ALIGN-granular aligned segment starts from (possibly clamped)
    compact segment bounds. Returns (astart [T], astop [T], counts [T]) i32.

    128-granular (not CHUNK): the compositor kernels only need 128-lane
    starts (composite_tiles_pallas_pre already streams the 128-granular
    bin_gaussians_aligned layout), and CHUNK granularity padded the aligned
    domain ~4x more (avg CHUNK/2 vs LANE_ALIGN/2 gap per tile — ~0.5M of
    3.0M slots at garden), a tax every [P_aligned]-scale op downstream
    paid (backward-kernel output DMA, the segred key sort, masks). Chunk
    DMAs may now overrun a segment's 128-padded end into the NEXT tile's
    region; that is safe by ORDERING: the Pallas TPU grid is sequential and
    every kernel waits its output DMAs before the step ends, so tile t's
    overrun (align_copy writes zero-masked tails; the backward kernel
    writes zero-filled buffers) lands before tile t+1 writes its real data
    over it. Gap lanes therefore stay zero exactly as before."""
    counts = (tile_stop - tile_start).astype(jnp.int32)
    padded = -(-counts // LANE_ALIGN) * LANE_ALIGN
    astart = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    return astart, astart + counts, counts


def p_aligned_chunked(pair_capacity: int, num_tiles: int) -> int:
    """Aligned capacity for LANE_ALIGN-granular starts: worst case every
    tile adds LANE_ALIGN-1 pad; +CHUNK tail slack (kernels read/write whole
    CHUNK-wide windows past the last segment's padded end)."""
    raw = pair_capacity + num_tiles * (LANE_ALIGN - 1)
    return -(-raw // CHUNK) * CHUNK + CHUNK


def pack_compact_attrs(pair_gauss, means2d, conic, rgb, opac, p_pad: int):
    """Gather per-pair attributes in compact sorted order -> [ATTR_ROWS, p_pad].

    One row-table gather at the *compact* pair count (the aligned-scale
    gathers are what the align-copy kernel eliminates). Rows GID_ROW/VALID_ROW
    carry the pair's gaussian id and a constant 1.0 validity marker; alignment
    gaps get zeros from the kernel's masked copy. p_pad must include
    CHUNK + LANE_ALIGN slack past the last readable entry (floored chunk
    reads overrun by up to that much)."""
    conic_scaled = conic * jnp.asarray([-0.5, -1.0, -0.5], conic.dtype)
    attr = jnp.concatenate(
        [means2d, conic_scaled, opac[:, None], rgb], axis=1
    )  # [N, 9]: x y -a/2 -b -c/2 opac r g b
    gathered = attr[pair_gauss]  # [P, 9]
    gid = pair_gauss.astype(jnp.float32)[:, None]
    rows = jnp.concatenate([gathered, gid, jnp.ones_like(gid)], axis=1)
    out = jnp.pad(
        rows, ((0, p_pad - rows.shape[0]), (0, ATTR_ROWS - rows.shape[1]))
    )
    return out.T  # [ATTR_ROWS, p_pad]


def _align_copy_kernel(start_ref, astart_ref, counts_ref,  # scalar prefetch
                       attr_hbm,  # [ATTR_ROWS, Pc_pad] ANY
                       out_hbm,  # [ATTR_ROWS, p_aligned] ANY
                       in_buf, out_buf, in_sems, out_sems):
    t = pl.program_id(0)
    start = start_ref[t]
    a0 = astart_ref[t]
    num = counts_ref[t]
    n_chunks = pl.cdiv(num, CHUNK)
    floor = (start // LANE_ALIGN) * LANE_ALIGN
    off = start - floor

    def dma_in(slot, c):
        return pltpu.make_async_copy(
            attr_hbm.at[
                :, pl.ds(pl.multiple_of(floor + c * CHUNK, LANE_ALIGN),
                         CHUNK + LANE_ALIGN)
            ],
            in_buf.at[slot],
            in_sems.at[slot],
        )

    def dma_out(slot, c):
        return pltpu.make_async_copy(
            out_buf.at[slot],
            out_hbm.at[
                :, pl.ds(pl.multiple_of(a0 + c * CHUNK, LANE_ALIGN), CHUNK)
            ],
            out_sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma_in(0, 0).start()

    def body(c, carry):
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            dma_in(1 - slot, c + 1).start()

        dma_in(slot, c).wait()

        # out_buf[slot] is reused from chunk c-2; drain that write first.
        @pl.when(c >= 2)
        def _():
            dma_out(slot, c - 2).wait()

        # Mosaic cannot vector-load at a dynamic lane offset unless it is
        # provably 128-aligned; a dynamic lane ROTATE is supported, so shift
        # the whole buffer left by `off` and take a static CHUNK-wide slice.
        wide = CHUNK + LANE_ALIGN
        rolled = pltpu.roll(in_buf[slot], wide - off, axis=1)
        val = rolled[:, :CHUNK]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (ATTR_ROWS, CHUNK), 1)
        out_buf[slot, :, :] = jnp.where(lanes < num - c * CHUNK, val, 0.0)
        dma_out(slot, c).start()
        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)

    @pl.when(n_chunks >= 2)
    def _():
        dma_out((n_chunks - 2) % 2, n_chunks - 2).wait()

    @pl.when(n_chunks >= 1)
    def _():
        dma_out((n_chunks - 1) % 2, n_chunks - 1).wait()


def align_copy_pallas(attr_c, tile_start, astart, counts, p_aligned: int,
                      interpret: bool = False):
    """Re-lay compact per-tile attribute segments into the CHUNK-aligned
    layout the compositor kernels stream. attr_c [ATTR_ROWS, Pc_pad] (Pc_pad
    must carry CHUNK + LANE_ALIGN read slack); returns [ATTR_ROWS, p_aligned]
    with gap lanes zeroed (only the tail slack past the last segment is
    unwritten — mask consumers with position < astop[-1])."""
    num_tiles = tile_start.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_ROWS, CHUNK + LANE_ALIGN), jnp.float32),
            pltpu.VMEM((2, ATTR_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (out,) = pl.pallas_call(
        _align_copy_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ATTR_ROWS, p_aligned), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start.astype(jnp.int32), astart.astype(jnp.int32),
      counts.astype(jnp.int32), attr_c)
    return out
