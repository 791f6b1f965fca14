"""Cumulative end-to-end prefixes of the viewer render (1080p/1M): where the
time goes when XLA compiles the WHOLE pipeline (the isolated-stage profile
under-reports by ~100 ms — fusion/layout context matters).

Round-3 shape: stages mirror ops/render.py's presorted path (presort ->
expand -> 1-key sort -> ranges -> align -> pack -> kernel). The expand/sort/
ranges stages inline bin_gaussians(presorted=True) internals — keep in sync
with ops/binning.py.
"""
import jax
import jax.numpy as jnp

import tpugs.ops.binning as B
from tpugs.ops.binning import clamp_tile_segments, presort_by_depth
from tpugs.ops.pallas import pack as PK
from tpugs.ops.pallas.composite import _fwd_impl, _interpret
from tpugs.ops.projection import project_gaussians
from tpugs.ops.rasterize_tiled import RasterConfig, tiles_to_image
from tpugs.utils.profiling import device_time
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

import sys

img_w, img_h = 1920, 1088
n = 1_000_000
# argv: [tile_h tile_w pair_capacity max_hits presort(0/1)]
# (defaults = round-2 reference point, presorted path)
_a = [int(x) for x in sys.argv[1:]]
cfg = RasterConfig(img_h=img_h, img_w=img_w,
                   tile_h=_a[0] if _a else 32, tile_w=_a[1] if _a else 32,
                   pair_capacity=_a[2] if len(_a) > 2 else 3_407_872,
                   max_hits_per_tile=_a[3] if len(_a) > 3 else 4096)
PRESORT = bool(_a[4]) if len(_a) > 4 else True
params = synthetic_params(n, seed=0, scale_range=(0.002, 0.015))
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)


def feed(x):
    return jnp.tanh(jnp.sum(x).astype(jnp.float32)) * 1e-20


def upto(stage):
    tile_w, tile_h = cfg.tile_w, cfg.tile_h
    num_tiles = cfg.num_tiles
    ntx = cfg.ntx
    cap = cfg.pair_capacity

    def fn(c, it):
        z, p = c
        proj = project_gaussians(
            p["means"] + z, p["quats"], p["log_scales"],
            p["opacity_logits"], p["sh"], alive, viewmat, intr,
            img_w, img_h, 3, 1.0)
        if stage == "proj":
            return (feed(proj.means2d) + feed(proj.rgb), p)
        if PRESORT:
            _, proj_p = presort_by_depth(proj)
        else:
            proj_p = proj
        if stage == "presort":
            return (feed(proj_p.means2d) + feed(proj_p.opac), p)

        # ---- inlined bin_gaussians(presorted=True) internals ----
        r2_cull = B.cull_radius_sq(proj_p)
        tx0, ty0, w_tiles, h_tiles = B.tile_rects(
            proj_p, img_w, img_h, tile_w, tile_h, r2_cull)
        counts = w_tiles * h_tiles
        offsets = jnp.cumsum(counts) - counts
        total = offsets[-1] + counts[-1]
        slots = jnp.arange(cap, dtype=jnp.int32)
        ind = jnp.zeros((cap,), jnp.int32).at[offsets].add(1, mode="drop")
        g = jnp.clip(jnp.cumsum(ind) - 1, 0, counts.shape[0] - 1)
        in_range = slots < jnp.minimum(total, cap)
        f32 = jnp.float32
        cols = [offsets.astype(f32), tx0.astype(f32), ty0.astype(f32),
                w_tiles.astype(f32),
                proj_p.means2d[:, 0], proj_p.means2d[:, 1], r2_cull]
        if not PRESORT:
            cols.insert(4, proj_p.depths)
        table = jnp.stack(cols, axis=1)
        rows = table[g]
        off_g = rows[:, 0].astype(jnp.int32)
        w_g = jnp.maximum(rows[:, 3].astype(jnp.int32), 1)
        local = slots - off_g
        tx = rows[:, 1].astype(jnp.int32) + local % w_g
        ty = rows[:, 2].astype(jnp.int32) + local // w_g
        tile_id = (ty * ntx + tx).astype(jnp.int32)
        gx, gy, r2_g = rows[:, -3], rows[:, -2], rows[:, -1]
        px0 = (tx * tile_w).astype(f32)
        py0 = (ty * tile_h).astype(f32)
        dx = jnp.clip(gx, px0, px0 + (tile_w - 1)) - gx
        dy = jnp.clip(gy, py0, py0 + (tile_h - 1)) - gy
        valid = in_range & (dx * dx + dy * dy <= r2_g)
        if PRESORT:
            shift = B._packed_key_shift(counts.shape[0], num_tiles)
            key = (tile_id.astype(jnp.uint32) << shift) | g.astype(jnp.uint32)
            key = jnp.where(valid, key, jnp.uint32(num_tiles << shift))
            if stage == "expand":
                return (feed(key) + feed(total), p)
            (sorted_key,) = jax.lax.sort((key,), num_keys=1)
            if stage == "sort":
                return (feed(sorted_key), p)
            sorted_g = (sorted_key & jnp.uint32((1 << shift) - 1)).astype(
                jnp.int32)
            sorted_tile = (sorted_key >> shift).astype(jnp.int32)
            bounds = jnp.arange(num_tiles, dtype=jnp.uint32) << shift
            tile_start = jnp.searchsorted(
                sorted_key, bounds, side="left").astype(jnp.int32)
            tile_stop = jnp.searchsorted(
                sorted_key, bounds + jnp.uint32(1 << shift), side="left"
            ).astype(jnp.int32)
        else:
            tile_key = jnp.where(valid, tile_id, num_tiles)
            depth = jnp.where(valid, rows[:, 4], jnp.inf)
            if stage == "expand":
                return (feed(tile_key) + feed(depth) + feed(total), p)
            sorted_tile, _sd, sorted_g = jax.lax.sort(
                (tile_key, depth.astype(f32), g), num_keys=2, is_stable=True)
            if stage == "sort":
                return (feed(sorted_tile) + feed(sorted_g), p)
            tids = jnp.arange(num_tiles, dtype=jnp.int32)
            tile_start = jnp.searchsorted(
                sorted_tile, tids, side="left").astype(jnp.int32)
            tile_stop = jnp.searchsorted(
                sorted_tile, tids, side="right").astype(jnp.int32)
        # ---- end inlined internals ----
        b = B.BinningResult(
            pair_gauss=sorted_g, pair_tile=sorted_tile,
            tile_start=tile_start, tile_stop=tile_stop,
            num_pairs=total, overflow=total > cap)
        b, _mh = clamp_tile_segments(b, cfg.max_hits_per_tile)
        if stage == "ranges":
            return (feed(b.pair_gauss) + feed(b.tile_start), p)
        # ---- production ALIGN_KERNEL path (composite._pallas_fwd) ----
        a0, a1, cts = PK.aligned_offsets(b.tile_start, b.tile_stop)
        p_al = PK.p_aligned_chunked(cap, num_tiles)
        pc_pad = cap + PK.CHUNK + 2 * PK.LANE_ALIGN
        attr_c = PK.pack_compact_attrs(
            b.pair_gauss, proj_p.means2d, proj_p.conic, proj_p.rgb,
            proj_p.opac, pc_pad)
        if stage == "pack":
            return (feed(attr_c) + feed(a0), p)
        attr = PK.align_copy_pallas(attr_c, b.tile_start, a0, cts, p_al,
                                    interpret=_interpret())
        if stage == "align":
            return (feed(attr) + feed(a0), p)
        color, t, nc, kl = _fwd_impl(cfg, a0, a1, attr)
        if stage == "kernel":
            return (feed(color), p)
        img = tiles_to_image(cfg, color)[:img_h, :img_w]
        return (feed(img), p)

    return fn


prev = 0.0
for s in ["proj", "presort", "expand", "sort", "ranges", "pack", "align",
          "kernel", "full"]:
    ms = device_time(upto(s), (jnp.zeros(()), params), k=6, rounds=2) * 1e3
    print(f"e2e through {s:8s} {ms:8.2f} ms  (+{ms - prev:7.2f})", flush=True)
    prev = ms
