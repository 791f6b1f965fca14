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
