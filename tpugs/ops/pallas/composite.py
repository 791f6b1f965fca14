"""Pallas TPU compositor orchestration — custom VJPs around the kernels.

The performance-critical re-design of the reference's two hottest CUDA kernels
(reference: src/rasterizer/forward.cu:26-180, backward.cu:40-232) for the TPU
execution model:

CUDA shape:  one 16x16 tile per thread block, 256 threads = 256 pixels, each
             thread serially walks the tile's depth-sorted Gaussian list from
             10 KB shared-memory batches, per-pixel early exit + block vote.

TPU shape:   grid = one kernel step per tile; the tile's PIX pixels sit on
             the LANE axis and the depth-sorted list is walked in EWAVE-deep
             SUBLANE waves (tpugs/ops/pallas/composite_t.py — the round-3
             transposed geometry, sole kernel implementation since round 4;
             the round-1/2 lane-wave geometry lost every A/B from round 3 on
             and was deleted). The serial transmittance recurrence inside a
             wave closes with a log2(EWAVE)-step shift-multiply tree; early
             termination is a while_loop condition on the max remaining
             transmittance, checked every 128-entry group.

Memory: attributes are pre-gathered (one XLA row gather at the compact pair
count) and re-laid per tile into CHUNK-aligned [ATTR_ROWS, P] lane-major
segments by the align-copy DMA kernel (pallas/pack.py) — the dense physical
layout (a [P, 16] f32 array lane-pads 8x, and Mosaic DMA requires
128-aligned minor-dim slices) — so each tile's entries stream HBM->VMEM
with double-buffered sequential DMA (the analogue of the cooperative
shared-memory load in forward.cuh:17-27, but asynchronous). The BACKWARD
emits entry-major [P, 128] gradient rows (dense: all 128 lanes a full lane
tile) — the segment-reduce consumer's streaming format.

The backward kernel walks waves in reverse, reconstructs per-entry
transmittance from final_T by suffix products (backward.cu:147-151), uses the
scalar-collapsed suffix-sum S_after trick (backward.cu:161-173 — dotted with
the incoming color cotangent so the suffix is one scalar per pixel), and
writes per-PAIR gradient rows to its tile's contiguous slice — races are
structurally impossible. The pair->gaussian reduction is either a
deterministic XLA scatter-add (composite_tiles_pallas) or the monotone
segment-sum kernel (composite_tiles_pallas_segred + ops/pallas/segreduce.py,
the hot path) — both replacing CUDA atomicAdd (backward.cu:214-228).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpugs.ops.pallas.pack import ATTR_ROWS, GID_ROW, NUM_ATTR, VALID_ROW
from tpugs.ops.rasterize_tiled import RasterConfig

ALIGN = 128  # per-tile segment alignment of the align_segments layout
CHUNK = 512  # aligned-capacity granularity (pack.CHUNK)

# Aligned-slot count above which the segred backward uses the sorted-key
# reduction (segreduce.segment_reduce_sorted_pallas) instead of the classic
# inversion-sort + row-gather path. Default 0 — with the transposed kernel
# emit the sorted path wins at BOTH bench scales (r5 TPU A/B: 13.14 vs
# 11.74 Mpix/s at 50k, garden 7.39 -> see PERF_NOTES); the classic path
# remains the automatic fallback for capacities past f32-exact gids
# (n >= 2^24) and keeps parity coverage via a test override. The env var
# is a measurement knob for re-running the A/B on real hardware.
_SORTED_SEGRED_MIN = int(
    __import__("os").environ.get("TPUGS_SORTED_SEGRED_MIN", "0")
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def segred_needs_meta(cfg: RasterConfig, n: int) -> bool:
    """True when composite_tiles_pallas_segred's backward will take the
    CLASSIC (inversion-sort + row-gather) reduction and therefore needs the
    real expansion metadata (reduce_meta=True binning). The sorted-key path
    — the default — never reads it, so callers skip building it: the
    exp_slot sort payload alone is ~1.2 ms/M pairs (docs/PERF_NOTES.md).
    Both operands of the predicate are static (shapes), so the decision is
    trace-time and matches _segred_bwd's branch exactly."""
    from tpugs.ops.pallas import pack as _pack

    p_al = _pack.p_aligned_chunked(cfg.pair_capacity, cfg.num_tiles)
    return not (p_al >= _SORTED_SEGRED_MIN and n < (1 << 24))


def segred_dummy_meta():
    """Placeholder metadata args for composite_tiles_pallas_segred when
    segred_needs_meta() is False: (exp_slot, red_start, red_count, exp_end).
    The (1,)-shape marks them as dummies — the classic branch refuses them."""
    z = jnp.zeros((1,), jnp.int32)
    return z, z, z, jnp.zeros((), jnp.int32)


def _p_aligned(cfg: RasterConfig) -> int:
    """Aligned pair-list capacity for the ALIGN-granular align_segments
    layout: worst case adds ALIGN-1 pad per tile."""
    raw = cfg.pair_capacity + cfg.num_tiles * ALIGN
    return -(-raw // CHUNK) * CHUNK + CHUNK


def align_segments(tile_start, tile_stop, pair_gauss, p_aligned: int):
    """Re-lay the sorted pair list so every tile's segment starts on an ALIGN
    boundary. Gap slots are marked invalid; they cost masked lanes in the
    kernel, not correctness.

    Slot ownership uses the scatter-histogram + cumsum trick (see
    binning.bin_gaussians) and one packed small-table row-gather — a
    searchsorted here costs ~35x more on TPU. This XLA formulation is the
    ORACLE for binning.bin_gaussians_aligned (tests/test_binning_aligned.py);
    the hot path produces the aligned layout with the align-copy DMA kernel
    (pack.align_copy_pallas) instead.

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


def pack_sorted_attrs(pair_gauss, means2d, conic, rgb, opac, p_pad: int):
    """Gather per-pair attributes in sorted order -> [ATTR_ROWS, p_pad]
    (lane-major: attrs on sublanes, entries on lanes — the dense physical
    layout; a [P, 16] f32 array would lane-pad 8x).

    XLA gather outside the kernel: after the (tile, depth) sort each tile's
    entries are contiguous, turning kernel access into sequential DMA."""
    conic_scaled = conic * jnp.asarray([-0.5, -1.0, -0.5], conic.dtype)
    attr = jnp.concatenate(
        [means2d, conic_scaled, opac[:, None], rgb], axis=1
    )  # [N, 9]: x y -a/2 -b -c/2 opac r g b (conic pre-scaled for the kernel)
    gathered = attr[pair_gauss]  # [P, 9]
    out = jnp.pad(
        gathered, ((0, p_pad - gathered.shape[0]), (0, ATTR_ROWS - NUM_ATTR))
    )
    return out.T  # [ATTR_ROWS, p_pad]


def _fwd_impl(*args, **kw):
    from tpugs.ops.pallas import composite_t

    return composite_t.composite_forward_pallas(*args, **kw)


def _bwd_entry_rows(cfg, astart, astop, attr, d_color, r0, final_t, kl,
                    row_offset, transposed_out: bool = False):
    """Per-pair gradient rows from the backward kernel: entry-major
    [P_aligned, OUT_LANES] (default; first NUM_ATTR lanes are the
    gradients) or attr-major [OUT_ROWS, P_aligned] (transposed_out; each
    gradient a contiguous row — the sorted-key reduction's input). Slots
    past each tile's chunked range are unwritten and must be masked by the
    consumer. Layout rationale: composite_t.OUT_LANES / OUT_ROWS."""
    from tpugs.ops.pallas import composite_t

    return composite_t.composite_backward_pallas(
        cfg, astart, astop, attr, d_color, r0, final_t, kl, row_offset,
        interpret=_interpret(), transposed_out=transposed_out,
    )


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
    from tpugs.ops.pallas import pack as _pack

    carried_rows = None if attr_c is None else attr_c.shape[0]
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
    aligned_gauss = attr[GID_ROW].astype(jnp.int32)
    avalid = attr[VALID_ROW] > 0.5
    color, t, nc, kl = _fwd_impl(
        cfg, astart, astop, attr, row_offset, interpret=_interpret()
    )
    color = color + t[..., None] * background[None, None, :]
    res = (astart, astop, aligned_gauss, avalid, attr, t, kl, background,
           means2d.shape[0], row_offset, pair_gauss.shape[0], carried_rows)
    return (color, t, nc), res


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
    # gaps and rows past the last tile's range are masked out.
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
    color, t, nc, kl = _fwd_impl(
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

    d_attr = _bwd_entry_rows(
        cfg, tile_start, tile_stop, attr, d_color, r0, final_t, kl,
        row_offset,
    )[:, :NUM_ATTR]  # [P_al, 9]

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

    p_al = attr.shape[1]
    if p_al >= _SORTED_SEGRED_MIN and n < (1 << 24):
        # Sorted-key reduction (r5): no re-order gather at all — the gather
        # is latency-bound (~13 ns/row, 35.8 ms of the 151.7 ms garden step)
        # and un-narrowable (sub-128-lane gathers lower to a serial
        # dynamic-slice loop, the r4 50x regression). Sort the aligned
        # domain by the gid that rides the attr rows, gradient columns as
        # streaming payloads; summation order (ascending aligned = tile
        # order within each gid, via the stable sort) matches the expansion
        # domain's. n >= 2^24 falls back to the classic path (gids must
        # stay f32-exact for the key sort).
        d_rows_t = _bwd_entry_rows(
            cfg, astart, _astop, attr, d_color, r0, final_t, kl, row_offset,
            transposed_out=True,
        )  # [OUT_ROWS, P_aligned] — each gradient a contiguous row
        valid = _avalid & (jnp.arange(p_al) < _astop[-1])
        key = jnp.where(
            valid, _aligned_gauss.astype(jnp.float32), SR.SENTINEL
        )
        # Mask BEFORE the sort: unwritten kernel slots may hold garbage/NaN
        # and 0 * NaN in the reduction matmul would poison the output.
        cols = tuple(
            jnp.where(valid, d_rows_t[k], 0.0) for k in range(NUM_ATTR)
        )
        acc16 = SR.segment_reduce_sorted_pallas(
            key, cols, n, interpret=_interpret()
        )  # [ATTR_ROWS, n_pad]
    else:
        if exp_slot.shape[0] <= 1:
            raise ValueError(
                "composite_tiles_pallas_segred got dummy reduction metadata "
                "(segred_dummy_meta) but the sorted-key backward is "
                "unavailable at this shape — caller must consult "
                "segred_needs_meta with the same cfg/n"
            )
        d_rows = _bwd_entry_rows(
            cfg, astart, _astop, attr, d_color, r0, final_t, kl, row_offset,
        )  # [P_aligned, OUT_LANES] — already segreduce's IN_LANES row width
        # Classic path: re-order the per-pair gradient rows into the
        # gaussian-major expansion domain: (1) each sorted pair's aligned
        # position is elementwise (astart[tile] + rank within tile, valid
        # iff inside the CLAMPED stop); (2) one u32 sort keyed on the
        # expansion slot inverts the pair sort. Gap/culled/clamped/sentinel
        # slots fold to the out-of-range marker and are masked to zero in
        # the gather (rows past each tile's chunked range are unwritten
        # kernel output — never read unmasked).
        i32 = jnp.int32
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
        _, a_e = jax.lax.sort(
            (exp_slot.astype(jnp.uint32), a_fold), num_keys=1
        )
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
