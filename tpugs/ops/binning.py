"""Stage 2 — tile binning + depth sort, shape-stable.

The reference builds a data-dependent-length (tile, gaussian) pair list with a
cumsum + one-pair-per-thread fill, radix-sorts packed 64-bit keys with CUB, and
detects range boundaries (reference: src/rasterizer/sorting.cu:10-211). That
design has two TPU problems: the pair count P changes every frame (dynamic
shape => retrace) and 64-bit keys are slow on TPU.

TPU-native redesign:
- fixed pair capacity P chosen at jit time; the actual pair count is carried
  as a traced scalar and an `overflow` flag (no `.item()` sync — the reference
  syncs on `total_pairs.item<int>()` every frame, sorting.cu:152);
- slot -> (gaussian, tile) ownership uses the scatter-histogram + cumsum
  trick: one scatter-add of offset markers followed by a prefix sum (a
  vectorized searchsorted over the offsets costs ~35x more on TPU —
  docs/PERF_NOTES.md measured op table);
- sorting uses `jax.lax.sort` with two 32-bit keys (tile_id, depth) instead of
  packed uint64 — lexicographic multi-key sort is native in XLA;
- tile ranges come from two vectorized searchsorted calls over the sorted
  tile ids (replaces the boundary-detection kernel).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from tpugs.ops.projection import ProjectionOutput


@struct.dataclass
class BinningResult:
    """Sorted (tile, gaussian) pair list + per-tile ranges.

    pair_gauss [P]  gaussian index per sorted pair (num_tiles sentinel rows are
                    sorted to the back; check pair_tile < num_tiles for validity)
    pair_tile  [P]  tile id per sorted pair (== num_tiles for invalid slots)
    tile_start [T]  start offset of each tile's run in the sorted list
    tile_stop  [T]  end offset (exclusive)
    num_pairs  []   true total pair count (may exceed P)
    overflow   []   bool: true total exceeded capacity P (pairs dropped)
    """

    pair_gauss: jnp.ndarray
    pair_tile: jnp.ndarray
    tile_start: jnp.ndarray
    tile_stop: jnp.ndarray
    num_pairs: jnp.ndarray
    overflow: jnp.ndarray
    # Pair->gaussian reduction metadata (bin_gaussians_expand_kernel with
    # reduce_meta=True only; None otherwise). The expansion domain is
    # gaussian-major by construction, so the backward's per-pair gradient
    # reduction becomes a monotone segment sum (ops/pallas/segreduce.py)
    # instead of a random scatter-add.
    exp_slot: jnp.ndarray | None = None  # [P] expansion slot per sorted pair
    red_start: jnp.ndarray | None = None  # [n_pad] interval start per gauss
    red_count: jnp.ndarray | None = None  # [n_pad] interval length per gauss
    exp_end: jnp.ndarray | None = None  # [] aligned end of real expansion
    # Compact-sorted compositor attributes (bin_gaussians_expand_kernel with
    # carry_attrs=True only): [11, P] f32 in pack.pack_compact_attrs row
    # order (x y ca cb cc op r g b gid valid) — streamed sequentially by the
    # expand kernel and sorted as payload, replacing the latency-bound
    # [P]-row pack gather.
    attr_c: jnp.ndarray | None = None


def tile_rects(proj: ProjectionOutput, img_w: int, img_h: int, tile_w: int,
               tile_h: int, r2_cull=None):
    """Per-Gaussian touched tile rectangle (reference: projection.cu:172-188).

    Returns (tx0, ty0, w_tiles, h_tiles) int32 arrays; culled Gaussians get
    zero-area rects.

    With r2_cull (from cull_radius_sq) the rect radius is min(3-sigma,
    alpha-aware radius) — pixel-exact by the same argument as the corner
    cull: pixels past the alpha radius have alpha < 1/255 and are skipped by
    the compositor even inside an included tile, and the 3-sigma bound keeps
    the reference's rect-granular truncation semantics. Tighter rects mean
    fewer (tile, gaussian) pairs, which every [P]-sized binning op scales
    with (low-opacity splats shrink the most — on trained scenes with
    opacity collapse this is a large reduction).
    """
    ntx = -(-img_w // tile_w)
    nty = -(-img_h // tile_h)
    x = proj.means2d[:, 0]
    y = proj.means2d[:, 1]
    r = proj.radii.astype(jnp.float32)
    if r2_cull is not None:
        r_alpha = jnp.sqrt(jnp.minimum(r2_cull, 3.4e38))
        r = jnp.minimum(r, jnp.ceil(r_alpha))

    rect_min_x = jnp.clip(jnp.floor(x - r), 0, img_w).astype(jnp.int32)
    rect_min_y = jnp.clip(jnp.floor(y - r), 0, img_h).astype(jnp.int32)
    rect_max_x = jnp.clip(jnp.floor(x + r + 1.0), 0, img_w).astype(jnp.int32)
    rect_max_y = jnp.clip(jnp.floor(y + r + 1.0), 0, img_h).astype(jnp.int32)

    tx0 = rect_min_x // tile_w
    ty0 = rect_min_y // tile_h
    tx1 = jnp.minimum(ntx, -(-rect_max_x // tile_w))
    ty1 = jnp.minimum(nty, -(-rect_max_y // tile_h))

    w_tiles = jnp.maximum(tx1 - tx0, 0)
    h_tiles = jnp.maximum(ty1 - ty0, 0)
    zero = jnp.zeros_like(w_tiles)
    w_tiles = jnp.where(proj.visible, w_tiles, zero)
    h_tiles = jnp.where(proj.visible, h_tiles, zero)
    return tx0, ty0, w_tiles, h_tiles


def cull_radius_sq(proj: ProjectionOutput) -> jnp.ndarray:
    """Per-Gaussian squared cull radius r² = 2λ_max(Σ)·ln(255·op).

    Pixel-exact pair culling: the compositor skips any entry with
    α = op·exp(−½ΔᵀΣ⁻¹Δ) < 1/255 (forward.cu:137-141 semantics). Since
    ΔᵀΣ⁻¹Δ ≥ d²/λ_max(Σ), every pixel at distance d with
    d² > 2λ_max·ln(255·op) is provably skipped — a (tile, gaussian) pair whose
    nearest tile pixel is farther than that contributes nothing and can be
    dropped from the pair list without changing a single output pixel. (No 3σ
    clamp here: the reference's 3σ truncation is tile-rect-granular — pixels
    past 3σ inside an included tile still composite — and the pair list this
    culls is already rect-limited.) A 1.001 inflation absorbs f32 rounding on
    the boundary so the bound stays conservative.
    """
    a, b, c = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
    # λ_min of the conic (inverse covariance) -> λ_max of Σ = 1/λ_min.
    lmin = (a + c) / 2.0 - jnp.sqrt(((a - c) / 2.0) ** 2 + b * b + 1e-20)
    lam_max = 1.0 / jnp.maximum(lmin, 1e-12)
    r2_alpha = 2.0 * lam_max * jnp.log(jnp.maximum(255.0 * proj.opac, 1.0))
    big = jnp.full_like(r2_alpha, jnp.finfo(jnp.float32).max)
    r2 = jnp.where(lmin > 0, r2_alpha * 1.001, big)
    return jnp.where(proj.visible, r2, 0.0)


def presort_by_depth(proj: ProjectionOutput, quant_bits: int = 0):
    """Sort the per-Gaussian projection outputs front-to-back ONCE per frame
    ([N]-sized ops) so pair binning can sort by (tile, INDEX) instead of
    (tile, depth): after the presort the gaussian index IS the depth rank.
    That turns the [P]-sized 2-key 3-array sort — the largest single binning
    cost (docs/PERF_NOTES.md e2e profile) — into a single-array sort of one
    packed u32 key per pair (bin_gaussians(presorted=True)), and drops the
    depth column from the [P, 8] row table.

    Exactness (quant_bits=0): stable argsort keeps equal-depth gaussians in
    original-index order — the same tie-break the (tile, depth, g) 2-key
    stable sort applies — so the composited image is bit-identical (pinned by
    tests/test_binning.py).

    quant_bits > 0 — the FAST path (viewer): XLA's single-array u32 sort is
    ~20x faster than the 2-array (f32 key, i32 payload) stable sort at
    N = 1M (scripts/bench_sort.py; the exact presort was +101 ms of a 175 ms
    1080p/1M frame). Pack (depth bin << idx_bits | index) into ONE u32: the
    low bits ARE the permutation, ties inside a bin break by original index
    (stable). Depth is quantized linearly over the visible [min, max] range
    into min(quant_bits, 32 - idx_bits) bins — BOUNDED error: only gaussians
    whose depths fall in the same bin (width = range / 2^bits, e.g. 1/4096th
    of the depth range at 12 bits) can composite out of exact depth order;
    gaussians with bin-distinct depths are ordered exactly. When every
    visible depth lands in a distinct bin the result is bit-identical to the
    exact path (pinned by tests/test_binning_presort.py).

    Returns (perm [N] int32, permuted ProjectionOutput). Consumers must index
    the SAME permuted arrays with the resulting pair_gauss ids; gradients
    flow back to original order through the gather's VJP.
    """
    n = proj.depths.shape[0]
    sort_key = jnp.where(proj.visible, proj.depths, jnp.inf)
    idx_bits = max(1, (n - 1).bit_length())
    if quant_bits > 0 and idx_bits <= 31:
        bits = min(quant_bits, 32 - idx_bits)
        nbins = (1 << bits) - 1  # last bin = invisible sentinel
        d = proj.depths
        vis = proj.visible
        dmin = jnp.min(jnp.where(vis, d, jnp.inf))
        dmax = jnp.max(jnp.where(vis, d, -jnp.inf))
        scale = (nbins - 1) / jnp.maximum(dmax - dmin, 1e-12)
        binned = jnp.clip((d - dmin) * scale, 0, nbins - 1).astype(jnp.uint32)
        binned = jnp.where(vis, binned, jnp.uint32(nbins))
        key = (binned << idx_bits) | jnp.arange(n, dtype=jnp.uint32)
        (skey,) = jax.lax.sort((key,), num_keys=1)
        perm = (skey & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
    else:
        _, perm = jax.lax.sort(
            (sort_key, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
            is_stable=True,
        )
    # One packed [N, 12] row gather instead of seven column gathers. radii
    # (< 2^24) and visible (0/1) are exact in f32.
    f32 = jnp.float32
    table = jnp.concatenate(
        [proj.means2d, proj.conic, proj.rgb, proj.opac[:, None],
         proj.depths[:, None], proj.radii.astype(f32)[:, None],
         proj.visible.astype(f32)[:, None]],
        axis=1,
    )
    rows = table[perm]
    return perm, ProjectionOutput(
        means2d=rows[:, 0:2],
        depths=rows[:, 9],
        conic=rows[:, 2:5],
        radii=rows[:, 10].astype(jnp.int32),
        rgb=rows[:, 5:8],
        opac=rows[:, 8],
        visible=rows[:, 11] > 0.5,
    )


def _packed_key_shift(n: int, num_tiles: int):
    """Bit budget for the single-u32 pair sort key (tile_id << shift | g):
    returns the shift, or None when tile ids + gaussian ids don't fit —
    sentinel num_tiles << shift must stay <= 2^32 - 1."""
    shift = max(1, (n - 1).bit_length())
    if num_tiles << shift <= 0xFFFFFFFF:
        return shift
    return None


def bin_gaussians(
    proj: ProjectionOutput,
    img_w: int,
    img_h: int,
    tile_w: int,
    tile_h: int,
    pair_capacity: int,
    tile_row_lo=0,
    num_tile_rows: int = 0,
    presorted: bool = False,
) -> BinningResult:
    """Expand Gaussians into a depth-sorted, tile-grouped pair list.

    With num_tile_rows > 0 (static), binning is restricted to the tile rows
    [tile_row_lo, tile_row_lo + num_tile_rows) — tile_row_lo may be a traced
    scalar — and tile ids in the result are LOCAL to that slice (tile 0 = the
    slice's first tile). This is the tile-sharded distribution path
    (parallel/tile_shard.py): each device bins only its slice of the grid, so
    every [P]-sized op shrinks by the device count. Pixel-exact: a pair lands
    in exactly one device's slice.

    With presorted=True, `proj` must be the output of presort_by_depth: the
    gaussian index is the depth rank, so the [P] sort runs on ONE packed
    u32 key (or a 2-array int sort when ids don't fit 32 bits) and the depth
    column drops out of the pair row table. pair_gauss ids index the
    PERMUTED arrays.
    """
    ntx = -(-img_w // tile_w)
    nty = -(-img_h // tile_h)
    if num_tile_rows <= 0:
        num_tile_rows = nty
    num_tiles = ntx * num_tile_rows
    tile_row_lo = jnp.asarray(tile_row_lo, jnp.int32)
    tile_row_hi = tile_row_lo + num_tile_rows

    r2_cull = cull_radius_sq(proj)
    tx0, ty0, w_tiles, h_tiles = tile_rects(
        proj, img_w, img_h, tile_w, tile_h, r2_cull
    )
    # Clip the rect's tile rows to the local slice; ty0 stays global, the
    # emitted tile id is made local below.
    ty1 = jnp.minimum(ty0 + h_tiles, tile_row_hi)
    ty0 = jnp.maximum(ty0, tile_row_lo)
    h_tiles = jnp.maximum(ty1 - ty0, 0)
    counts = w_tiles * h_tiles  # [N]
    offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum
    total = offsets[-1] + counts[-1]

    # Slot -> owning gaussian: largest g with offsets[g] <= slot, computed as
    # cumsum(histogram of offsets) - 1. (A vectorized searchsorted here costs
    # ~35x more on TPU — log2(N) rounds of 1M-wide random gathers — while the
    # scatter-add + prefix sum is two linear passes.) Duplicated offsets
    # (zero-count gaussians) resolve to the last duplicate, which is the one
    # with a nonzero count; offsets past capacity drop out of the scatter.
    slots = jnp.arange(pair_capacity, dtype=jnp.int32)
    ind = jnp.zeros((pair_capacity,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(ind) - 1, 0, counts.shape[0] - 1)
    in_range = slots < jnp.minimum(total, pair_capacity)

    # One packed row-gather instead of five column gathers (row gathers cost
    # barely more than one column on TPU). Integer fields are exact in f32
    # (all < 2^24). presorted drops the depth column: the index g IS the
    # depth rank.
    f32 = jnp.float32
    cols = [offsets.astype(f32), tx0.astype(f32), ty0.astype(f32),
            w_tiles.astype(f32),
            proj.means2d[:, 0], proj.means2d[:, 1], r2_cull]
    if not presorted:
        cols.insert(4, proj.depths)
    table = jnp.stack(cols, axis=1)  # [N, 7 or 8]
    rows = table[g]
    off_g = rows[:, 0].astype(jnp.int32)
    tx0_g = rows[:, 1].astype(jnp.int32)
    ty0_g = rows[:, 2].astype(jnp.int32)
    w_g = jnp.maximum(rows[:, 3].astype(jnp.int32), 1)

    local = slots - off_g
    tx = tx0_g + local % w_g
    ty = ty0_g + local // w_g  # global tile row
    tile_id = ((ty - tile_row_lo) * ntx + tx).astype(jnp.int32)

    # Pixel-exact corner cull: distance from the Gaussian center to the tile's
    # nearest pixel vs the alpha-aware radius (see cull_radius_sq). Culled
    # pairs become sentinel entries that sort to the back — per-tile segments
    # shrink, so the compositor kernels do ~15-50% fewer waves at identical
    # output.
    gx, gy, r2_g = rows[:, -3], rows[:, -2], rows[:, -1]
    px0 = (tx * tile_w).astype(f32)
    py0 = (ty * tile_h).astype(f32)
    dx = jnp.clip(gx, px0, px0 + (tile_w - 1)) - gx
    dy = jnp.clip(gy, py0, py0 + (tile_h - 1)) - gy
    hit = dx * dx + dy * dy <= r2_g
    valid = in_range & hit

    shift = _packed_key_shift(counts.shape[0], num_tiles) if presorted else None
    if shift is not None:
        # Single-array u32 sort: key = tile_id << shift | g; the low bits are
        # the depth rank, so (tile, key) order == (tile, depth) order with
        # the same original-index tie-break as the 2-key path.
        key = (tile_id.astype(jnp.uint32) << shift) | g.astype(jnp.uint32)
        sentinel = jnp.uint32(num_tiles << shift)
        key = jnp.where(valid, key, sentinel)
        (sorted_key,) = jax.lax.sort((key,), num_keys=1)
        sorted_g = (sorted_key & jnp.uint32((1 << shift) - 1)).astype(jnp.int32)
        tids = jnp.arange(num_tiles, dtype=jnp.uint32)
        bounds = tids << shift
        tile_start = jnp.searchsorted(sorted_key, bounds, side="left").astype(
            jnp.int32
        )
        tile_stop = jnp.searchsorted(
            sorted_key, bounds + jnp.uint32(1 << shift), side="left"
        ).astype(jnp.int32)
        sorted_tile = jnp.minimum(sorted_key >> shift, num_tiles).astype(
            jnp.int32
        )
    elif presorted:
        # Ids don't fit one u32: 2-array int sort (still no depth array).
        tile_id = jnp.where(valid, tile_id, num_tiles)
        g_key = jnp.where(valid, g, counts.shape[0])
        sorted_tile, sorted_g = jax.lax.sort(
            (tile_id, g_key), num_keys=2, is_stable=False
        )
        sorted_g = jnp.minimum(sorted_g, counts.shape[0] - 1)
        tids = jnp.arange(num_tiles, dtype=jnp.int32)
        tile_start = jnp.searchsorted(sorted_tile, tids, side="left").astype(
            jnp.int32
        )
        tile_stop = jnp.searchsorted(sorted_tile, tids, side="right").astype(
            jnp.int32
        )
    else:
        # Invalid slots: sentinel tile sorts to the back.
        tile_id = jnp.where(valid, tile_id, num_tiles)
        depth = jnp.where(valid, rows[:, 4], jnp.inf)

        sorted_tile, _sorted_depth, sorted_g = jax.lax.sort(
            (tile_id, depth.astype(jnp.float32), g), num_keys=2, is_stable=True
        )
        tids = jnp.arange(num_tiles, dtype=jnp.int32)
        tile_start = jnp.searchsorted(sorted_tile, tids, side="left").astype(
            jnp.int32
        )
        tile_stop = jnp.searchsorted(sorted_tile, tids, side="right").astype(
            jnp.int32
        )

    return BinningResult(
        pair_gauss=sorted_g,
        pair_tile=sorted_tile,
        tile_start=tile_start,
        tile_stop=tile_stop,
        num_pairs=total,
        overflow=total > pair_capacity,
    )


def bin_gaussians_expand_kernel(
    proj: ProjectionOutput,
    img_w: int,
    img_h: int,
    tile_w: int,
    tile_h: int,
    pair_capacity: int,
    interpret: bool = False,
    presorted: bool = False,
    reduce_meta: bool = False,
    carry_attrs: bool = False,
    tile_row_lo=0,
    num_tile_rows: int = 0,
    quant_key_bits: int = 0,
) -> BinningResult:
    """bin_gaussians with the EXPANSION done by the Pallas kernel
    (ops/pallas/expand.py) instead of XLA's scatter + cumsum + [P, 8] row
    gather (~58 ms of a 118 ms 1080p/1M viewer frame in context).

    Bit-identical sorted segments (tests/test_expand_pallas.py): the kernel
    emits real pairs in the same gaussian-major slot order, padding slots
    carry the sentinel tile id, and the same sort puts them at the back.
    presorted=True requires `proj` from presort_by_depth (gaussian index ==
    depth rank) and sorts ONE packed u32 key built from the kernel's
    tile/gid rows — gap slots pack to exactly the sentinel key since their
    tile id is num_tiles and gid is 0. Falls back to the 2-key sort when
    ids don't fit 32 bits (same budget as bin_gaussians). The result arrays
    are expand.expand_capacity long (~12% over pair_capacity at GC=256)
    instead of pair_capacity — every consumer is shape-agnostic. Full-frame
    only (the tile-sharded slice path keeps the XLA expansion).

    reduce_meta=True additionally emits the pair->gaussian reduction
    metadata (exp_slot/red_start/red_count/exp_end fields): the sorts carry
    an iota payload recording each sorted pair's expansion slot, and the
    per-gaussian expansion intervals are derived elementwise from the chunk
    tables — no extra passes over [P]. Forward-only callers (viewer) leave
    it off and pay nothing.

    carry_attrs=True: the expand kernel also emits the 9 compositor
    attribute rows per pair (streamed SEQUENTIALLY — the expansion is
    gaussian-major) and the sorts carry them as payload operands (measured
    free, scripts/bench_sort_payload.py). The result's attr_c field is then
    the compact-sorted [11, P_out] attribute table (pack.pack_compact_attrs
    row layout: x y ca cb cc op r g b gid valid), bit-identical to the
    gathered path's, and the compositor skips its ~17 ms/frame latency-bound
    [P]-row pack gather (docs/PERF_NOTES.md r3).

    num_tile_rows > 0 (static; tile_row_lo may be traced): bin only the tile
    rows [tile_row_lo, tile_row_lo + num_tile_rows) with LOCAL tile ids —
    the tile-sharded distribution path (parallel/tile_shard.py), same
    contract as bin_gaussians. The kernel itself is slice-agnostic: it emits
    GLOBAL tile ids from the row-clipped rects (the corner cull stays in
    global pixel coords, bit-identical to the XLA slice path) and one
    elementwise [P_out] pass localizes them before the sort.

    quant_key_bits > 0 (non-presorted path only): pack (tile id, linearly
    quantized depth bin) into ONE u32 and run a single-key unstable sort
    instead of the 2-key (tile, depth, gid) stable sort — the [P] pair sort
    with attribute payloads is the co-dominant viewer cost (xprof r4:
    25.4 ms of a 68.8 ms 1080p/1M frame). BOUNDED approximation: only pairs
    whose depths fall in the same bin (depth range / 2^min(quant_key_bits,
    32 - tile bits) — 1/4Mth of the range at the default 22 effective bits)
    can composite out of exact depth order, and the unstable sort drops the
    original-index tie-break, so same-bin order is arbitrary (but
    deterministic per compiled program). Viewer-only knob; training and
    eval keep exact paths."""
    from tpugs.ops.pallas import expand as EX

    ntx = -(-img_w // tile_w)
    nty = -(-img_h // tile_h)
    sliced = num_tile_rows > 0
    # Kernel sentinel: first tile id past any valid GLOBAL tile (rects are
    # clipped to nty rows, so ntx*nty is static and safe in slice mode too).
    kernel_num_tiles = ntx * nty
    num_tiles = ntx * num_tile_rows if sliced else kernel_num_tiles
    tile_row_lo = jnp.asarray(tile_row_lo, jnp.int32)

    r2_cull = cull_radius_sq(proj)
    tx0, ty0, w_tiles, h_tiles = tile_rects(
        proj, img_w, img_h, tile_w, tile_h, r2_cull
    )
    if sliced:
        ty1 = jnp.minimum(ty0 + h_tiles, tile_row_lo + num_tile_rows)
        ty0 = jnp.maximum(ty0, tile_row_lo)
        h_tiles = jnp.maximum(ty1 - ty0, 0)
    counts = w_tiles * h_tiles
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]

    n = counts.shape[0]
    f32 = jnp.float32
    qbits = 0
    if quant_key_bits > 0 and not presorted:
        # Cap at 22 bits: the bin value rides an f32 table row, so it must
        # stay < 2^24 exactly (at 27 bits the clip bound 2^27-1 rounds UP to
        # 2^27 in f32 and the max-depth bin overflows into the tile bits).
        qbits = max(min(quant_key_bits, 32 - num_tiles.bit_length(), 22), 0)
    if qbits > 0:
        # Quantize depth at [N] into the key's depth bits; the kernel's
        # depth output row then IS the bin (integer-valued f32, exact).
        nbins = 1 << qbits
        d, vis = proj.depths, proj.visible
        dmin = jnp.min(jnp.where(vis, d, jnp.inf))
        dmax = jnp.max(jnp.where(vis, d, -jnp.inf))
        scale = (nbins - 1) / jnp.maximum(dmax - dmin, 1e-12)
        depth_row = jnp.floor(jnp.clip((d - dmin) * scale, 0, nbins - 1))
    else:
        depth_row = proj.depths
    rows = [offsets.astype(f32), counts.astype(f32), tx0.astype(f32),
            ty0.astype(f32), jnp.maximum(w_tiles, 1).astype(f32),
            proj.means2d[:, 0], proj.means2d[:, 1], r2_cull, depth_row,
            jnp.arange(n, dtype=f32)]
    if carry_attrs:
        # Pre-scaled conic + opac + rgb (pack_compact_attrs layout); x/y
        # reuse the cull's gx/gy rows 5/6.
        cs = proj.conic * jnp.asarray([-0.5, -1.0, -0.5], f32)
        rows += [cs[:, 0], cs[:, 1], cs[:, 2], proj.opac,
                 proj.rgb[:, 0], proj.rgb[:, 1], proj.rgb[:, 2]]
    table = jnp.stack(rows, axis=0)  # [10 or 17, N]
    trows = EX.ROWS_ATTR if carry_attrs else EX.ROWS
    n_pad = -(-n // EX.GC) * EX.GC
    table = jnp.pad(table, ((0, trows - table.shape[0]), (0, n_pad - n)))
    # Index plumbing only — no gradient flows through binning (booleans and
    # ints downstream); stop_gradient keeps autodiff from tracing the kernel.
    table = jax.lax.stop_gradient(table)

    nc = n_pad // EX.GC
    # Chunk pair-offsets; padded gaussians start at `total` with count 0.
    offsets_pad = jnp.concatenate(
        [offsets, jnp.full((n_pad - n,), total, offsets.dtype)]
    )
    coffs = jnp.concatenate([offsets_pad[:: EX.GC], total[None]])
    coffs = jnp.minimum(coffs, pair_capacity).astype(jnp.int32)
    spans = jnp.diff(coffs)
    pspan = -(-spans // EX.PAD_ALIGN) * EX.PAD_ALIGN
    abase = (jnp.cumsum(pspan) - pspan).astype(jnp.int32)
    fill_start = (abase[-1] + pspan[-1]).astype(jnp.int32)

    p_out = EX.expand_capacity(pair_capacity, n_pad)
    out = EX.expand_pairs_pallas(
        table, coffs, abase, fill_start[None], kernel_num_tiles, ntx,
        tile_w, tile_h, p_out, interpret=interpret,
    )
    tile_f = out[0]
    if sliced:
        # Localize tile ids: valid slots carry global ids in
        # [tile_row_lo*ntx, ...); sentinel/culled slots map to the LOCAL
        # sentinel. Integer-valued f32 arithmetic, exact (< 2^24).
        tile_f = jnp.where(
            out[3] > 0.0,
            tile_f - (tile_row_lo * ntx).astype(jnp.float32),
            jnp.float32(num_tiles),
        )

    meta = {}
    if reduce_meta:
        # Per-gaussian expansion interval [red_start, red_start+red_count),
        # with the kernel's exact per-chunk truncation semantics (a chunk's
        # slots are clipped to span = coffs[c+1]-coffs[c]). broadcast_to +
        # reshape replaces a [n_pad] gather at chunk_idx (repeat is free).
        rep = lambda a: jnp.broadcast_to(
            a[:, None], (nc, EX.GC)).reshape(-1)
        cbase = rep(coffs[:-1])
        cspan = rep(spans)
        cabase = rep(abase)
        counts_pad = jnp.concatenate(
            [counts, jnp.zeros((n_pad - n,), counts.dtype)]
        )
        lo = jnp.clip(offsets_pad - cbase, 0, cspan)
        hi = jnp.clip(offsets_pad + counts_pad - cbase, 0, cspan)
        meta = dict(
            red_start=(cabase + lo).astype(jnp.int32),
            red_count=(hi - lo).astype(jnp.int32),
            exp_end=fill_start,
        )

    # Attribute columns ride every sort as payload operands (measured free:
    # scripts/bench_sort_payload.py).
    attrs = tuple(out[4 + i] for i in range(9)) if carry_attrs else ()
    iota = (jnp.arange(p_out, dtype=jnp.int32),) if reduce_meta else ()

    def _attr_c(sorted_attrs, sorted_g, sorted_tile):
        if not carry_attrs:
            return {}
        gid = sorted_g.astype(f32)
        valid = (sorted_tile < num_tiles).astype(f32)
        return {"attr_c": jnp.stack([*sorted_attrs, gid, valid], axis=0)}

    shift = _packed_key_shift(n, num_tiles) if presorted else None
    if shift is not None:
        # gid IS the depth rank: one packed u32 key. Gap slots pack to the
        # sentinel (tile num_tiles, gid 0).
        key = (tile_f.astype(jnp.uint32) << shift) | out[2].astype(
            jnp.uint32
        )
        skey, *rest = jax.lax.sort((key, *attrs, *iota), num_keys=1)
        if reduce_meta:
            meta["exp_slot"] = rest[-1]
        sorted_g = (skey & jnp.uint32((1 << shift) - 1)).astype(jnp.int32)
        sorted_tile = jnp.minimum(skey >> shift, num_tiles).astype(jnp.int32)
        bounds = jnp.arange(num_tiles, dtype=jnp.uint32) << shift
        tile_start = jnp.searchsorted(skey, bounds, side="left").astype(
            jnp.int32
        )
        tile_stop = jnp.searchsorted(
            skey, bounds + jnp.uint32(1 << shift), side="left"
        ).astype(jnp.int32)
        return BinningResult(
            pair_gauss=sorted_g,
            pair_tile=sorted_tile,
            tile_start=tile_start,
            tile_stop=tile_stop,
            num_pairs=total,
            overflow=total > pair_capacity,
            **_attr_c(rest[:9], sorted_g, sorted_tile),
            **meta,
        )
    if qbits > 0:
        # Quantized single-u32 (tile << qbits | depth_bin) key, unstable
        # 1-key sort (see docstring for the bounded-reorder argument).
        valid_q = out[3] > 0.0
        tile_u = jnp.where(valid_q, tile_f, 0.0).astype(jnp.uint32)
        qd_u = jnp.where(valid_q, out[1], 0.0).astype(jnp.uint32)
        key = jnp.where(
            valid_q, (tile_u << qbits) | qd_u,
            jnp.uint32(num_tiles << qbits),
        )
        skey, sorted_g_f, *rest = jax.lax.sort(
            (key, out[2], *attrs, *iota), num_keys=1, is_stable=False
        )
        if reduce_meta:
            meta["exp_slot"] = rest[-1]
        sorted_g_i = sorted_g_f.astype(jnp.int32)
        sorted_tile_i = jnp.minimum(skey >> qbits, num_tiles).astype(
            jnp.int32
        )
        bounds = jnp.arange(num_tiles, dtype=jnp.uint32) << qbits
        tile_start = jnp.searchsorted(skey, bounds, side="left").astype(
            jnp.int32
        )
        tile_stop = jnp.searchsorted(
            skey, bounds + jnp.uint32(1 << qbits), side="left"
        ).astype(jnp.int32)
        return BinningResult(
            pair_gauss=sorted_g_i,
            pair_tile=sorted_tile_i,
            tile_start=tile_start,
            tile_stop=tile_stop,
            num_pairs=total,
            overflow=total > pair_capacity,
            **_attr_c(rest[:9], sorted_g_i, sorted_tile_i),
            **meta,
        )
    if presorted:
        # Ids don't fit one u32: 2-array (tile, gid) sort — gid order is
        # depth order, same as bin_gaussians' fallback.
        # (tile, gid) pairs are unique, so stability is irrelevant even
        # with payload operands.
        sorted_tile_f, sorted_g_f, *rest = jax.lax.sort(
            (tile_f, out[2], *attrs, *iota), num_keys=2, is_stable=False
        )
    else:
        sorted_tile_f, _sd, sorted_g_f, *rest = jax.lax.sort(
            (tile_f, out[1], out[2], *attrs, *iota), num_keys=2,
            is_stable=True,
        )
    if reduce_meta:
        meta["exp_slot"] = rest[-1]
    tids = jnp.arange(num_tiles, dtype=f32)
    tile_start = jnp.searchsorted(sorted_tile_f, tids, side="left").astype(
        jnp.int32
    )
    tile_stop = jnp.searchsorted(sorted_tile_f, tids, side="right").astype(
        jnp.int32
    )
    sorted_g_i = sorted_g_f.astype(jnp.int32)
    sorted_tile_i = jnp.minimum(sorted_tile_f, num_tiles).astype(jnp.int32)
    return BinningResult(
        pair_gauss=sorted_g_i,
        pair_tile=sorted_tile_i,
        tile_start=tile_start,
        tile_stop=tile_stop,
        num_pairs=total,
        overflow=total > pair_capacity,
        **_attr_c(rest[:9], sorted_g_i, sorted_tile_i),
        **meta,
    )


@struct.dataclass
class AlignedBinningResult:
    """Sorted pair list in the ALIGNED layout the Pallas kernels stream:
    every tile's segment starts on an `align`-column boundary of a
    [p_aligned] slot array (gap slots invalid). Produced directly from the
    sort — replaces the separate align_segments ownership pass
    (pallas.composite.align_segments) on the hot path, saving ~3 [P]-sized
    ops per frame (docs/PERF_NOTES.md: every [P]-op is ~10 ms at 2^20)."""

    pair_gauss: jnp.ndarray  # [P_al] gaussian index (0 where invalid)
    pair_valid: jnp.ndarray  # [P_al] bool
    tile_start: jnp.ndarray  # [T] aligned start offsets
    tile_stop: jnp.ndarray  # [T] aligned stop (start + count)
    num_pairs: jnp.ndarray  # [] true pre-cull pair count
    overflow: jnp.ndarray  # [] bool — pair or aligned capacity exceeded


def bin_gaussians_aligned(
    proj: ProjectionOutput,
    img_w: int,
    img_h: int,
    tile_w: int,
    tile_h: int,
    pair_capacity: int,
    p_aligned: int,
    align: int = 128,
    tile_row_lo=0,
    num_tile_rows: int = 0,
) -> AlignedBinningResult:
    """bin_gaussians, but emitting the kernel-ready aligned layout directly.

    Layout identical to align_segments(bin_gaussians(...)) — pinned by
    tests/test_binning_aligned.py — at the cost of one extra [T] histogram +
    one [P] scatter instead of the align pass's [P_al] ownership recompute.
    """
    ntx = -(-img_w // tile_w)
    nty = -(-img_h // tile_h)
    if num_tile_rows <= 0:
        num_tile_rows = nty
    num_tiles = ntx * num_tile_rows
    tile_row_lo = jnp.asarray(tile_row_lo, jnp.int32)
    tile_row_hi = tile_row_lo + num_tile_rows

    r2_cull = cull_radius_sq(proj)
    tx0, ty0, w_tiles, h_tiles = tile_rects(
        proj, img_w, img_h, tile_w, tile_h, r2_cull
    )
    ty1 = jnp.minimum(ty0 + h_tiles, tile_row_hi)
    ty0 = jnp.maximum(ty0, tile_row_lo)
    h_tiles = jnp.maximum(ty1 - ty0, 0)
    counts = w_tiles * h_tiles
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]

    slots = jnp.arange(pair_capacity, dtype=jnp.int32)
    ind = jnp.zeros((pair_capacity,), jnp.int32).at[offsets].add(1, mode="drop")
    g = jnp.clip(jnp.cumsum(ind) - 1, 0, counts.shape[0] - 1)
    in_range = slots < jnp.minimum(total, pair_capacity)

    f32 = jnp.float32
    table = jnp.stack(
        [offsets.astype(f32), tx0.astype(f32), ty0.astype(f32),
         w_tiles.astype(f32), proj.depths,
         proj.means2d[:, 0], proj.means2d[:, 1], r2_cull],
        axis=1,
    )
    rows = table[g]
    off_g = rows[:, 0].astype(jnp.int32)
    tx0_g = rows[:, 1].astype(jnp.int32)
    ty0_g = rows[:, 2].astype(jnp.int32)
    w_g = jnp.maximum(rows[:, 3].astype(jnp.int32), 1)

    local = slots - off_g
    tx = tx0_g + local % w_g
    ty = ty0_g + local // w_g
    tile_id = ((ty - tile_row_lo) * ntx + tx).astype(jnp.int32)

    gx, gy, r2_g = rows[:, 5], rows[:, 6], rows[:, 7]
    px0 = (tx * tile_w).astype(f32)
    py0 = (ty * tile_h).astype(f32)
    dx = jnp.clip(gx, px0, px0 + (tile_w - 1)) - gx
    dy = jnp.clip(gy, py0, py0 + (tile_h - 1)) - gy
    hit = dx * dx + dy * dy <= r2_g

    tile_id = jnp.where(in_range & hit, tile_id, num_tiles)
    depth = jnp.where(in_range & hit, rows[:, 4], jnp.inf)

    sorted_tile, _sd, sorted_g = jax.lax.sort(
        (tile_id, depth.astype(jnp.float32), g), num_keys=2, is_stable=True
    )

    # Post-cull per-tile counts (histogram; sentinel row dropped) -> aligned
    # segment starts.
    tcounts = jnp.zeros((num_tiles,), jnp.int32).at[tile_id].add(
        1, mode="drop"
    )
    padded = -(-tcounts // align) * align
    astart = (jnp.cumsum(padded) - padded).astype(jnp.int32)
    astop = astart + tcounts
    aligned_total = astart[-1] + padded[-1]

    # Compact sorted position -> aligned position: shift each tile's run by
    # (astart - compact start).
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start_c = jnp.searchsorted(sorted_tile, tids, side="left").astype(
        jnp.int32
    )
    delta = astart - tile_start_c  # [T]
    valid_pair = sorted_tile < num_tiles
    apos = slots + delta[jnp.clip(sorted_tile, 0, num_tiles - 1)]
    apos = jnp.where(valid_pair, apos, p_aligned)  # invalid -> dropped

    # One packed scatter: g+1 (0 = empty slot) gives gauss id + validity.
    packed = jnp.zeros((p_aligned,), jnp.int32).at[apos].set(
        sorted_g + 1, mode="drop"
    )
    return AlignedBinningResult(
        pair_gauss=jnp.maximum(packed - 1, 0),
        pair_valid=packed > 0,
        tile_start=astart,
        tile_stop=astop,
        num_pairs=total,
        overflow=(total > pair_capacity) | (aligned_total > p_aligned),
    )


def max_pairs_per_tile(binning: BinningResult) -> jnp.ndarray:
    """Largest per-tile run length (for choosing/checking K capacity)."""
    return jnp.max(binning.tile_stop - binning.tile_start)


def clamp_tile_segments(binning: BinningResult, max_hits: int):
    """Truncate every tile's segment to its first (front-most) max_hits
    entries and report the pre-clamp maximum.

    This pins ONE cross-backend truncation semantics: the scan compositor's
    static K loop and the Pallas kernels' dynamic segment walk both see the
    same clamped list, so an overloaded tile renders identically everywhere
    (front-most K win — the depth sort puts the nearest Gaussians first).
    The reference never truncates (exact realloc, sorting.cu:82-109); here
    truncation is observable (max_tile_hits / hit overflow in RenderOutput)
    and the Trainer auto-grows K on overflow.

    Returns (clamped BinningResult, max_tile_hits [] int32)."""
    hits = binning.tile_stop - binning.tile_start
    max_tile_hits = jnp.max(hits)
    stop = jnp.minimum(binning.tile_stop, binning.tile_start + max_hits)
    return binning.replace(tile_stop=stop), max_tile_hits
