"""Debug-mode NaN/OOB assertions around the compositor kernels.

SURVEY.md §5.2: XLA is race-free at the HLO level, but the Pallas kernels
consume a hand-built pair list (segments, indices, packed attributes) whose
invariants — finite attributes, in-bounds segment ranges, in-bounds gaussian
ids — the kernels assume without checking. This module is the TPU analogue
of the reference's debug-only CUDA_SYNC_CHECK (reference:
src/utils/cuda_utils.cuh:23-31): `checkify`-instrumented entry points that
raise a Python error naming the violated invariant instead of producing
silent garbage (or an opaque device fault).

Call checked_composite directly when debugging a suspect scene/kernel (it
must own the jit boundary — checkify errors are materialized values thrown
host-side, so it cannot run inside another traced region). The checks are
regular XLA ops around the kernel launch — zero cost when not used.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import checkify


def _input_checks(cfg, tile_start, tile_stop, pair_gauss,
                  means2d, conic, rgb, opac):
    n = means2d.shape[0]
    p = pair_gauss.shape[0]
    checkify.check(jnp.all(jnp.isfinite(means2d)),
                   "compositor input: non-finite means2d")
    checkify.check(jnp.all(jnp.isfinite(conic)),
                   "compositor input: non-finite conic")
    checkify.check(jnp.all(jnp.isfinite(rgb)),
                   "compositor input: non-finite rgb")
    checkify.check(jnp.all(jnp.isfinite(opac)),
                   "compositor input: non-finite opacity")
    checkify.check(jnp.all((opac >= 0.0) & (opac <= 1.0)),
                   "compositor input: opacity outside [0, 1]")
    checkify.check(jnp.all(tile_stop >= tile_start),
                   "compositor input: tile segment with stop < start")
    checkify.check(jnp.all((tile_start >= 0) & (tile_stop <= p)),
                   "compositor input: tile segment outside the pair list")
    checkify.check(jnp.all((pair_gauss >= 0) & (pair_gauss < n)),
                   "compositor input: pair gaussian index out of bounds")


def checked_composite(cfg, tile_start, tile_stop, pair_gauss, means2d, conic,
                      rgb, opac, background, row_offset=0,
                      compositor: str = "scan"):
    """Run the compositor with input/output invariant checks; raises
    jax.experimental.checkify.JaxRuntimeError naming the violated invariant.

    Works for both backends ("scan" | "pallas"; Pallas runs in interpret mode
    off-TPU as usual)."""
    if compositor == "pallas":
        from tpugs.ops.pallas.composite import composite_tiles_pallas as fn
    else:
        from tpugs.ops.rasterize_tiled import composite_tiles as fn

    def run(tile_start, tile_stop, pair_gauss, means2d, conic, rgb, opac,
            background):
        _input_checks(cfg, tile_start, tile_stop, pair_gauss,
                      means2d, conic, rgb, opac)
        color, final_t, nc = fn(cfg, tile_start, tile_stop, pair_gauss,
                                means2d, conic, rgb, opac, background,
                                row_offset)
        checkify.check(jnp.all(jnp.isfinite(color)),
                       "compositor output: non-finite color")
        checkify.check(
            jnp.all((final_t >= 0.0) & (final_t <= 1.0)),
            "compositor output: transmittance outside [0, 1]",
        )
        return color, final_t, nc

    err, out = checkify.checkify(run)(
        tile_start, tile_stop, pair_gauss, means2d, conic, rgb, opac,
        background,
    )
    err.throw()
    return out


def checked_render(params: dict, alive, viewmat, intrinsics, cfg, sh_degree,
                   background, compositor: str = "auto"):
    """Full debug render of one view through checked_composite: projection +
    binning (plain XLA), then the compositor with invariant checks. Slow
    (owns its own un-cached checkify/jit boundary) — this is what the CLIs'
    --debug-checks flag routes through to diagnose a suspect scene.

    Returns the [H, W, 3] color image."""
    import jax

    from tpugs.ops.binning import bin_gaussians, clamp_tile_segments
    from tpugs.ops.projection import project_gaussians
    from tpugs.ops.rasterize_tiled import tiles_to_image

    if compositor == "auto":
        compositor = "pallas" if jax.default_backend() == "tpu" else "scan"

    proj = project_gaussians(
        params["means"], params["quats"], params["log_scales"],
        params["opacity_logits"], params["sh"], alive,
        viewmat, intrinsics, cfg.img_w, cfg.img_h, sh_degree,
    )
    binning = bin_gaussians(
        proj, cfg.img_w, cfg.img_h, cfg.tile_w, cfg.tile_h, cfg.pair_capacity
    )
    binning, _max_hits = clamp_tile_segments(binning, cfg.max_hits_per_tile)
    color_t, _t, _nc = checked_composite(
        cfg, binning.tile_start, binning.tile_stop, binning.pair_gauss,
        proj.means2d, proj.conic, proj.rgb, proj.opac,
        jnp.asarray(background, jnp.float32), compositor=compositor,
    )
    return tiles_to_image(cfg, color_t)[: cfg.img_h, : cfg.img_w]
