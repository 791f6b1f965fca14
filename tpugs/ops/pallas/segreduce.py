"""Pallas monotone segment-reduce kernel — the pair->gaussian gradient
reduction as blocked interval-one-hot matmuls.

The backward pass must sum per-pair gradient rows into per-gaussian
accumulators. The XLA formulation (`zeros([N, 9]).at[gid].add(rows)`) is a
serial random read-modify-write over an HBM-resident table: measured
94 ns/update at garden scale — 225 ms of a 336 ms train step, the single
largest op in the build (docs/PERF_NOTES.md r3). The reference solves the
same problem with atomicAdd shared-memory staging
(/root/reference/src/rasterizer/backward.cu); TPUs have no atomics, but the
expansion layout built by ops/pallas/expand.py is *gaussian-major by
construction*: gaussian g's pairs occupy one contiguous slot interval
[estart[g], estart[g]+ecount[g]) of the expansion domain. Once the per-pair
gradient rows are re-ordered into that domain (one u32 sort + one row
gather, see ops/pallas/composite.py::_segred_bwd), the reduction is a
segment sum over *monotone, non-overlapping* intervals:

- grid over blocks of W gaussians; block b's intervals cover the contiguous
  slot range [estart[W*b], estart[W*(b+1)]) — streamed with double-buffered
  sequential DMA (no random access);
- per C-slot chunk, segment membership is an interval one-hot
  (estart[g] <= slot < estart[g]+ecount[g]) and the per-segment sum is ONE
  MXU matmul: rows[C, 16]^T-contracted against onehot[C, W] -> [16, W]
  partials accumulated in VMEM (the same one-hot-matmul trick as the expand
  kernel, run in reverse);
- precision=HIGHEST keeps the f32 rows exact (one-hot x f32 is a pure sum);
- slots belonging to no interval (chunk-alignment gaps, culled rect
  positions, sentinel tail) match no one-hot column and contribute zero.

Output: [ATTR_ROWS, n_pad] f32 — attribute rows on sublanes, gaussians on
lanes, written as aligned disjoint [16, W] blocks (no flush/carry logic:
a segment belongs to exactly one gaussian and blocks are whole gaussians).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpugs.ops.pallas.pack import NUM_ATTR

W = 512  # gaussians per grid step (multiple of 128; sets matmul width)
C = 512  # expansion slots per inner DMA/compute chunk
ROWS = 16  # gradient rows per pair (pack.ATTR_ROWS layout)
IN_LANES = 128  # input row width: ROWS padded to one lane tile (a [p, 16]
#                f32 array is physically 128-lane padded anyway, so the
#                logical pad is free and Mosaic can DMA whole rows)
IN_ALIGN = 128  # slot-offset floor for the chunk DMA


def _segreduce_kernel(r0s_ref, ks_ref,  # scalar prefetch [nb]
                      estart_ref, ecount_ref,  # [1, W] blocks
                      rows_hbm,  # [p_in, ROWS] ANY
                      out_ref,  # [ROWS, W] block
                      in_buf,  # VMEM (2, C, ROWS)
                      sems):  # DMA (2,)
    b = pl.program_id(0)
    r0 = r0s_ref[b]
    k = ks_ref[b]
    es = estart_ref[...].astype(jnp.float32)  # [1, W]
    ec = ecount_ref[...].astype(jnp.float32)

    def dma(slot, i):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(pl.multiple_of(r0 + i * C, IN_ALIGN), C), :],
            in_buf.at[slot],
            sems.at[slot],
        )

    @pl.when(k > 0)
    def _():
        dma(0, 0).start()

    def body(i, acc):
        slot = i % 2

        @pl.when(i + 1 < k)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(slot, i).wait()
        chunk = in_buf[slot][:, :ROWS]  # [C, ROWS]
        s = (r0 + i * C
             + jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
             ).astype(jnp.float32)
        oh = ((es <= s) & (s < es + ec)).astype(jnp.float32)  # [C, W]
        # Contract the slot (sublane) dim of both operands on the MXU.
        # HIGHEST is load-bearing: default f32 matmul truncates operands to
        # bf16; one-hot x f32 under the 3-pass emulation is an exact sum.
        part = jax.lax.dot_general(
            chunk, oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [ROWS, W]
        return acc + part

    acc = jax.lax.fori_loop(0, k, body, jnp.zeros((ROWS, W), jnp.float32))
    out_ref[...] = acc


def segment_reduce_pallas(rows, estart, ecount, end_slot,
                          interpret: bool = False):
    """Sum `rows` over monotone contiguous segments.

    rows [p_in, IN_LANES] f32: per-slot gradient rows (first ROWS columns
      used) in expansion (gid-major) order; p_in must be a multiple of C
      with >= C slack past `end_slot` (slack rows are read but match no
      interval).
    estart/ecount [n_pad] i32: per-gaussian slot interval; estart must be
      non-decreasing and intervals non-overlapping in order.
    end_slot: scalar i32, exclusive end of the last possible interval
      (aligned end of real expansion data).

    Returns [ROWS, n_pad] f32 per-gaussian sums (empty intervals -> 0).
    """
    p_in, rows_dim = rows.shape
    assert rows_dim == IN_LANES and p_in % C == 0
    n_pad = estart.shape[0]
    n_w = -(-n_pad // W) * W
    nb = n_w // W
    pad = n_w - n_pad
    # Padding gaussians: empty intervals at the end keeps block_lo monotone.
    estart_w = jnp.concatenate(
        [estart.astype(jnp.int32),
         jnp.broadcast_to(end_slot.astype(jnp.int32), (pad,))]
    )
    ecount_w = jnp.pad(ecount.astype(jnp.int32), (0, pad))
    block_lo = estart_w[::W]  # [nb]
    block_hi = jnp.concatenate(
        [block_lo[1:], end_slot.astype(jnp.int32)[None]]
    )
    r0s = block_lo // IN_ALIGN * IN_ALIGN
    ks = jnp.maximum(-(-(block_hi - r0s) // C), 0)
    # Static bound: reads stay inside [0, p_in) (end_slot <= p_in - C).
    ks = jnp.minimum(ks, (p_in - r0s) // C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((None, 1, W), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, W), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, W), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, C, IN_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (out,) = pl.pallas_call(
        _segreduce_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ROWS, n_w), jnp.float32)],
        interpret=interpret,
    )(r0s.astype(jnp.int32), ks.astype(jnp.int32),
      estart_w.reshape(nb, 1, W), ecount_w.reshape(nb, 1, W), rows)
    return out[:, :n_pad]


# ---------------------------------------------------------------------------
# Sorted-key variant (round 5): the reduction WITHOUT the re-order gather.
#
# The classic path above re-orders per-pair gradient rows into the expansion
# domain with one u32 inversion sort + one [p_in, 128]-row gather. That
# gather is latency-bound (~13 ns/row — 35.8 ms of the 151.7 ms garden
# step, r5 xprof) and cannot be narrowed: a gather whose slice is narrower
# than the operand's 128-lane rows is lowered by XLA to a SERIAL per-row
# dynamic-slice loop (measured ~25k dynamic-slices/step — the r4 f02511b
# 50x regression, and reproduced independently with a [.., :16] slice).
#
# This variant never gathers: it sorts the ALIGNED domain itself by the
# gaussian id that already rides the attribute rows (pack.GID_ROW), carrying
# the NUM_ATTR gradient columns as sort payloads — payload movement is
# streaming (measured ~1.2 ms/column at P=2.4M, scripts/bench_sort_payload)
# rather than latency-bound. The 1-key sort groups each gaussian's rows
# contiguously (order within a gid is arbitrary — an unstable sort saves
# XLA's hidden stability-iota payload column; per-gid f32 summation order
# wobbles at ulp scale but stays deterministic) and the kernel then needs
# NO interval tables at all: per-gaussian membership is an EQUALITY one-hot
# against the sorted key column (which rides the packed rows), and the
# per-block slot ranges come from a small searchsorted (n/W + 1 queries —
# the allowed small-query form, same as binning's tile_start).
# ---------------------------------------------------------------------------

KEY_ROW = 9  # row index of the sorted gaussian-id key in the [16, p] input
SENTINEL = float(1 << 25)  # key for invalid slots: integer-exact in f32,
#                            greater than any gaussian id (capacity asserted
#                            < 2^24 so ids stay f32-exact)


def _segreduce_sorted_kernel(r0s_ref, ks_ref,  # scalar prefetch [nb]
                             rows_hbm,  # [16, p_in] ANY (sorted columns)
                             out_ref,  # [ROWS, W] block
                             in_buf,  # VMEM (2, ROWS, C)
                             sems):  # DMA (2,)
    b = pl.program_id(0)
    r0 = r0s_ref[b]
    k = ks_ref[b]
    g0 = (b * W).astype(jnp.float32)
    gcol = g0 + jax.lax.broadcasted_iota(
        jnp.int32, (W, 1), 0
    ).astype(jnp.float32)  # (W, 1) this block's gaussian ids

    def dma(slot, i):
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(pl.multiple_of(r0 + i * C, IN_ALIGN), C)],
            in_buf.at[slot],
            sems.at[slot],
        )

    @pl.when(k > 0)
    def _():
        dma(0, 0).start()

    def body(i, acc):
        slot = i % 2

        @pl.when(i + 1 < k)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(slot, i).wait()
        chunk = in_buf[slot]  # [ROWS, C]: grads rows 0-8, key row KEY_ROW
        keys = chunk[KEY_ROW:KEY_ROW + 1, :]  # (1, C)
        ohT = (keys == gcol).astype(jnp.float32)  # (W, C) equality one-hot
        # Contract the slot (lane) dim of both operands on the MXU; rows
        # 9-15 of the output accumulate key/zero garbage the consumer never
        # reads. HIGHEST is load-bearing: default f32 matmul truncates
        # operands to bf16; one-hot x f32 is an exact sum.
        part = jax.lax.dot_general(
            chunk, ohT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [ROWS, W]
        return acc + part

    acc = jax.lax.fori_loop(0, k, body, jnp.zeros((ROWS, W), jnp.float32))
    out_ref[...] = acc


def segment_reduce_sorted_pallas(key, grad_cols, n_pad: int,
                                 interpret: bool = False):
    """Sum gradient rows per gaussian via a stable key sort (no gather).

    key [p_al] f32: integer-valued gaussian id per aligned slot, SENTINEL
      for invalid slots (alignment gaps, tail slack, masked rows). Ids must
      be < 2^24 (f32-exact; asserted by the caller's capacity).
    grad_cols: tuple of NUM_ATTR [p_al] f32 columns, already MASKED to zero
      on invalid slots (unwritten kernel rows may hold garbage/NaN, and
      0 * NaN would poison the matmul).
    n_pad: number of gaussians (output width before padding to W).

    Returns [ROWS, n_pad] f32 per-gaussian sums (rows >= NUM_ATTR carry
    garbage from the key row — callers slice [:NUM_ATTR]).
    """
    p_al = key.shape[0]
    # Unstable: XLA implements is_stable by appending a hidden s32 iota
    # payload — one more full sorted column (~1.9 ms at garden scale).
    # Order within a gid only permutes the f32 summation order of that
    # gid's ~2-8 gradient rows (ulp-scale wobble); the reduction is
    # deterministic either way (same input -> same output).
    skey, *scols = jax.lax.sort((key, *grad_cols), num_keys=1,
                                is_stable=False)
    n_w = -(-n_pad // W) * W
    nb = n_w // W
    # Per-block slot ranges: nb + 1 small queries over the sorted keys (the
    # allowed small-query searchsorted form — NOT the banned P-scale one).
    bounds = (jnp.arange(nb + 1, dtype=jnp.float32)) * W
    lo = jnp.searchsorted(skey, bounds, side="left").astype(jnp.int32)
    r0s = lo[:-1] // IN_ALIGN * IN_ALIGN
    p_in = -(-p_al // C) * C + C
    ks = jnp.maximum(-(-(lo[1:] - r0s) // C), 0)
    ks = jnp.minimum(ks, (p_in - r0s) // C)

    pad = p_in - p_al
    # Pad the 1-D columns BEFORE the stack (key pad = SENTINEL so tail
    # slack matches no gaussian) — the stack of contiguous rows is then one
    # concat, with no post-hoc full-array update.
    rows_t = jnp.stack(
        [jnp.pad(c, (0, pad)) for c in scols]
        + [jnp.pad(skey, (0, pad), constant_values=SENTINEL)]
        + [jnp.zeros((p_in,), jnp.float32)] * (ROWS - NUM_ATTR - 1)
    )  # [ROWS, p_in]: rows 0-8 grads, row KEY_ROW key, rest zero

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((ROWS, W), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (out,) = pl.pallas_call(
        _segreduce_sorted_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ROWS, n_w), jnp.float32)],
        interpret=interpret,
    )(r0s, ks.astype(jnp.int32), rows_t)
    return out[:, :n_pad]
