"""Frame-coherent cached rendering — the interactive viewer's fast path.

The exact 1080p/1M frame spends ~55% of its device time producing a sorted,
aligned (tile, gaussian) pair list (expand kernel + pair sort + attribute
gather + align copy) that changes only marginally between consecutive
interactive camera poses. This module splits the frame:

  build_frame_cache(...)   full exact binning at an ANCHOR camera, plus a
                           one-time gather of the CAMERA-INDEPENDENT per-pair
                           quantities (world mean, cov3d components, opacity,
                           anchor SH color) into the kernel's aligned layout.
  render_cached(cache, viewmat, ...)
                           one frame at a nearby camera: re-projects every
                           pair EXACTLY for the new camera with pure
                           [P_aligned]-elementwise VPU math (world->camera,
                           perspective, EWA -> conic) and streams the result
                           straight into the Pallas compositor. No binning,
                           no sort, NO [P]-row gather.

Approximation contract (viewer-only; quantified by the r5 drift ladder in
docs/PERF_NOTES.md, scripts/quantify_cached_drift.py):
- tile membership and front-to-back compositing order are the anchor
  camera's. Per-pair positions/footprints are exact for the new camera, so
  the error is (a) gaussians missing from tiles their footprint newly
  entered and (b) bounded alpha-blend order flips between near-equal depths.
  (a) dominates and kicks in at screen shifts of ~half a tile: at the
  1080p/1M bench geometry, 0.25 deg of orbit (~7 px) holds >= 35 dB vs the
  exact frame, 0.5 deg (~15 px) 27 dB, 1 deg (a full 32 px tile) 15 dB —
  hence the viewer's 0.25-deg re-anchor default (viewer/offline.py).
- rgb is the anchor's SH evaluation (view direction drifts during a drag).
At zero camera delta the output is bit-identical to
render(presort="qkey", need_grads=False) in interpret mode — pinned by
tests/test_render_cached.py. On TPU hardware the same comparison sits at a
~38 dB floor (mean |dC| 0.003): the exact path's projection chain compiles
into different fusions than the cached one, and with
--xla_allow_excess_precision ulp-level depth differences flip quantized
pair-key ties, reordering near-equal-depth splats (docs/PERF_NOTES.md).

This mirrors how the 3DGS ecosystem's interactive splat viewers render with
a stale global depth sort that a worker refreshes asynchronously; here the
refresh is the exact binning pass. The CUDA reference re-sorts every frame
(reference: src/viewer/viewer.cpp:601-688) and measured 0.7 FPS against its
30 FPS target (reference: ROADMAP.md:766-768).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from tpugs.core import transforms as tf
from tpugs.ops.projection import project_gaussians
from tpugs.ops.rasterize_tiled import RasterConfig, tiles_to_image

# Static per-pair row layout of FrameCache.static_attr ([pack.ATTR_ROWS=16,
# P_aligned], lane-major aligned layout, gap lanes zero):
#   0-2   world mean x y z
#   3-8   cov3d components c00 c01 c02 c11 c12 c22
#   9     activated opacity (0 for dead slots)
#   10-12 anchor SH color (clamped >= 0)
#   13    validity (1.0 real pair, 0.0 alignment gap)
_VALID = 13


@struct.dataclass
class FrameCache:
    """Anchor-frame binning + camera-independent per-pair table."""

    astart: jnp.ndarray  # [T] aligned segment starts
    astop: jnp.ndarray  # [T] aligned segment stops
    static_attr: jnp.ndarray  # [ATTR_ROWS, P_aligned]
    anchor_viewmat: jnp.ndarray  # [4, 4]
    num_pairs: jnp.ndarray  # [] int32 (honesty: same fields as RenderOutput)
    pair_overflow: jnp.ndarray  # [] bool
    max_tile_hits: jnp.ndarray  # [] int32 pre-clamp busiest tile


def build_frame_cache(
    means, quats, log_scales, opacity_logits, sh, alive,
    viewmat, intrinsics, cfg: RasterConfig, sh_degree: int,
    scale_modifier: float = 1.0,
) -> FrameCache:
    """Exact binning at the anchor camera + the static per-pair gather.

    Uses the viewer binning configuration (expand kernel, quantized single-
    u32 pair key, no reduce metadata) — the cached path is display-only."""
    from tpugs.ops.binning import bin_gaussians_expand_kernel, clamp_tile_segments
    from tpugs.ops.pallas import pack as _pack
    from tpugs.ops.pallas.composite import _interpret

    proj = project_gaussians(
        means, quats, log_scales, opacity_logits, sh, alive,
        viewmat, intrinsics, cfg.img_w, cfg.img_h, sh_degree, scale_modifier,
    )
    binning = bin_gaussians_expand_kernel(
        proj, cfg.img_w, cfg.img_h, cfg.tile_w, cfg.tile_h,
        cfg.pair_capacity, interpret=_interpret(), presorted=False,
        reduce_meta=False, carry_attrs=False, quant_key_bits=32,
    )
    binning, max_tile_hits = clamp_tile_segments(binning, cfg.max_hits_per_tile)

    astart, astop, counts = _pack.aligned_offsets(
        binning.tile_start, binning.tile_stop
    )
    p_aligned = _pack.p_aligned_chunked(cfg.pair_capacity, cfg.num_tiles)

    comps = tf.cov3d_components(log_scales, quats, scale_modifier)  # [N, 6]
    opac = jnp.where(alive, jax.nn.sigmoid(opacity_logits), 0.0)
    stat = jnp.concatenate(
        [means, comps, opac[:, None], proj.rgb], axis=1
    )  # [N, 13]

    # Valid pairs always occupy the first min(num_pairs, capacity) sorted
    # slots; gather only that prefix (same argument as render()'s pack path).
    pg = binning.pair_gauss[: min(binning.pair_gauss.shape[0],
                                  cfg.pair_capacity)]
    rows = stat[pg]  # [P, 13] — ONE row gather per cache refresh
    ones = jnp.ones((rows.shape[0], 1), rows.dtype)
    rows = jnp.concatenate([rows, ones], axis=1)  # valid at row _VALID
    pc_pad = pg.shape[0] + _pack.CHUNK + 2 * _pack.LANE_ALIGN
    attr_cp = jnp.pad(
        rows, ((0, pc_pad - rows.shape[0]), (0, _pack.ATTR_ROWS - rows.shape[1]))
    ).T
    static_attr = _pack.align_copy_pallas(
        attr_cp, binning.tile_start, astart, counts, p_aligned,
        interpret=_interpret(),
    )
    return FrameCache(
        astart=astart,
        astop=astop,
        static_attr=static_attr,
        anchor_viewmat=jnp.asarray(viewmat),
        num_pairs=binning.num_pairs,
        pair_overflow=binning.overflow,
        max_tile_hits=max_tile_hits,
    )


def render_cached(
    cache: FrameCache, viewmat, intrinsics, cfg: RasterConfig, background,
):
    """One cached frame: exact per-pair re-projection for `viewmat` +
    Pallas compositing in the anchor's tile order. Returns (color [H, W, 3],
    final_T [H, W]).

    Everything here is [P_aligned]-elementwise (one VPU loop fusion) — the
    same screen-space math as project_gaussians/pack_compact_attrs, computed
    per PAIR from the cached static table instead of per gaussian + gather."""
    from tpugs.ops.pallas.composite import _fwd_impl, _interpret

    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    W = viewmat[:3, :3]
    s = cache.static_attr
    means3 = jnp.stack([s[0], s[1], s[2]], axis=-1)  # [P_al, 3]
    comps = jnp.stack([s[3], s[4], s[5], s[6], s[7], s[8]], axis=-1)

    t_cam = tf.world_to_camera_points(means3, viewmat)
    tz = t_cam[..., 2]
    in_front = tz > tf.NEAR_PLANE
    safe_z = jnp.where(in_front, tz, 1.0)
    x_screen = fx * t_cam[..., 0] / safe_z + cx
    y_screen = fy * t_cam[..., 1] / safe_z + cy

    t_guard = jnp.where(in_front[..., None], t_cam, jnp.ones_like(t_cam))
    cov2d = tf.ewa_cov2d_from_comps(comps, W, t_guard, fx, fy)
    conic, det = tf.inv_cov2d(cov2d)
    # A pair culled at the NEW camera (behind near plane / degenerate)
    # contributes nothing — same gate the exact path applies at binning time.
    opac_eff = jnp.where(in_front & (det > 0.0), s[9], 0.0)

    zero = jnp.zeros_like(tz)
    attr = jnp.stack(
        [
            x_screen, y_screen,
            -0.5 * conic[..., 0], -conic[..., 1], -0.5 * conic[..., 2],
            opac_eff, s[10], s[11], s[12],
            zero,  # gid (backward-only; the cached path is forward-only)
            s[_VALID],
        ]
    )
    attr = jnp.pad(attr, ((0, s.shape[0] - attr.shape[0]), (0, 0)))

    color_t, t_t, _nc, _kl = _fwd_impl(
        cfg, cache.astart, cache.astop, attr, 0, interpret=_interpret()
    )
    bg = jnp.asarray(background, jnp.float32)
    color_t = color_t + t_t[..., None] * bg[None, None, :]
    color = tiles_to_image(cfg, color_t)[: cfg.img_h, : cfg.img_w]
    final_t = tiles_to_image(cfg, t_t)[: cfg.img_h, : cfg.img_w]
    return color, final_t
