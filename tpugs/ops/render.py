"""Top-level differentiable render() — projection -> binning -> compositing.

TPU equivalent of the reference host orchestration
(reference: src/rasterizer/rasterizer.cpp:22-186), with two deliberate design
changes:
- no intermediates are explicitly retained for backward: projection/SH
  differentiate by autodiff, and the compositor's custom VJP keeps only
  final_T + a per-pixel last-contributor index;
- the screen-space position gradient that densification needs (reference
  exports dL_dmeans_2d explicitly, rasterizer.hpp:65-72) is exposed with a
  zero-valued probe input: grad w.r.t. `means2d_probe` IS dL/d(screen xy).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from tpugs.ops.binning import bin_gaussians
from tpugs.ops.projection import project_gaussians
from tpugs.ops.rasterize_tiled import RasterConfig, composite_tiles, tiles_to_image


@struct.dataclass
class RenderOutput:
    """Reference: RenderOutput in rasterizer.hpp:27-46, minus retained
    intermediates (not needed under autodiff)."""

    color: jnp.ndarray  # [H, W, 3]
    final_T: jnp.ndarray  # [H, W]
    n_contrib: jnp.ndarray  # [H, W] int32
    radii: jnp.ndarray  # [N] int32 (0 = culled) — densification visibility
    means2d: jnp.ndarray  # [N, 2] screen positions
    depths: jnp.ndarray  # [N]
    visible: jnp.ndarray  # [N] bool
    num_pairs: jnp.ndarray  # [] int32 true pair count
    pair_overflow: jnp.ndarray  # [] bool — pair capacity exceeded
    max_tile_hits: jnp.ndarray  # [] int32 busiest tile's pre-clamp entries
    hit_overflow: jnp.ndarray  # [] bool — a tile exceeded max_hits_per_tile


def render(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    log_scales: jnp.ndarray,
    opacity_logits: jnp.ndarray,
    sh: jnp.ndarray,
    alive: jnp.ndarray,
    viewmat: jnp.ndarray,
    intrinsics: jnp.ndarray,
    cfg: RasterConfig,
    sh_degree: int,
    background: jnp.ndarray,
    scale_modifier: float = 1.0,
    means2d_probe: Optional[jnp.ndarray] = None,
    compositor: str = "auto",
    presort="auto",
    need_grads: bool = True,
    carry_attrs: bool = False,
) -> RenderOutput:
    """Differentiable render of one view. Static: cfg, sh_degree, scale_modifier,
    compositor ("auto" | "pallas" | "scan"): "auto" picks the Pallas kernels on
    TPU and the lax.scan reference path elsewhere. presort: depth-presort the
    gaussians once per frame so the [P]-sized pair sort runs on a single
    packed u32 key (binning.presort_by_depth). ALL modes render bit-identical
    images (pinned by tests/test_binning_presort.py) — this is purely a
    performance choice:
      "auto"          presort only when N <= 2^18. The presort's [N]-row
                      permutation gather is ~12 ms isolated but ~+56 ms IN
                      CONTEXT at N=1M (scripts/ab_presort.py: 177 vs 121 ms
                      full-frame at 1080p/1M) while the 2-key pair sort it
                      replaces costs ~10 ms at P=2.6M — so big-N workloads
                      are faster WITHOUT it, small-N training (50k: the
                      bench config) keeps the 1-key win.
      "exact" / True  always presort (stable 2-array argsort).
      "fast"          quantized single-u32 presort (12-bit depth bins,
                      bounded same-bin reorder) — measured SLOWER in context
                      than exact at 1M (192 vs 177 ms); kept as an A/B knob.
      False           the direct (tile, depth) 2-key sort.
      "qkey"          NO presort; the pair sort runs on ONE quantized u32
                      (tile << bits | depth_bin) key (pallas path only —
                      binning.bin_gaussians_expand_kernel quant_key_bits).
                      BOUNDED approximation: same-bin reorder at ~22
                      effective depth bits; viewer-only.
      "fastest"       viewer resolution of "auto": "exact" below N=2^18,
                      "qkey" above (the r4 A/B: 63.7 vs 68.9 ms at 1080p/1M
                      with carry_attrs=False on both). Display paths only —
                      eval/training keep exact modes.
    need_grads (static): emit the pair->gaussian reduction metadata that the
    backward's segment-sum reduction consumes (binning reduce_meta). Costs
    one sort payload in the forward; forward-only callers (viewer,
    bench_render) pass False. With False, taking gradients still works — the
    backward falls back to the XLA scatter-add.
    carry_attrs (static, pallas path only): stream the 9 compositor attribute
    rows from the expand kernel and sort them as payload, replacing the
    [P]-row pack gather. Default False: payload columns cost ~1.2 ms each
    per 2.4M pairs (scripts/bench_sort_payload.py, r4 fixed probe — the r3
    "free payloads" probe was DCE'd), and with the pack gather sliced to the
    capacity prefix the gather wins at BOTH measured scales (viewer 1080p/1M
    68.9 vs 71.7 ms; train bench 201.7x vs 192.9x). Kept as an A/B knob."""
    if presort == "auto":
        presort = "exact" if means.shape[0] <= (1 << 18) else False
    elif presort == "fastest":
        presort = "exact" if means.shape[0] <= (1 << 18) else "qkey"
    quant_key_bits = 0
    if presort == "qkey":
        presort = False
        quant_key_bits = 32
    proj = project_gaussians(
        means, quats, log_scales, opacity_logits, sh, alive,
        viewmat, intrinsics, cfg.img_w, cfg.img_h, sh_degree, scale_modifier,
    )
    # One truncation semantics for both compositor backends: segments clamped
    # to the front-most K entries, pre-clamp max reported (see
    # binning.clamp_tile_segments).
    from tpugs.ops.binning import clamp_tile_segments, presort_by_depth

    if compositor == "auto":
        compositor = "pallas" if jax.default_backend() == "tpu" else "scan"
    bg = jnp.asarray(background, jnp.float32)
    if presort:
        # The probe rides inside the permuted table so its gradient flows
        # back to original order through the gather's VJP.
        proj_b = proj
        if means2d_probe is not None:
            proj_b = proj_b.replace(means2d=proj.means2d + means2d_probe)
        quant = 12 if presort == "fast" else 0
        _, proj_b = presort_by_depth(proj_b, quant_bits=quant)
        means2d = proj_b.means2d
    else:
        proj_b = proj
        means2d = proj.means2d
        if means2d_probe is not None:
            means2d = means2d + means2d_probe
    # NOTE on binning layout: bin_gaussians_aligned can emit the kernels'
    # aligned layout directly (skipping align_segments), but its [P]->[P_al]
    # scatter measured SLOWER end-to-end than the align pass's gather
    # formulation (321 vs ~285 ms at 1080p/1M — scatters are the expensive
    # primitive on TPU, docs/PERF_NOTES.md round-2 negative results), so the
    # compact path stays.
    if compositor == "pallas":
        # Pallas expansion kernel: replaces the XLA scatter+cumsum+row-gather
        # expansion (~58 ms of a 118 ms 1080p/1M frame in context) with
        # sequential chunk writes + one-hot MXU ownership. Same sorted
        # segments bit-for-bit (tests/test_expand_pallas.py).
        from tpugs.ops.binning import bin_gaussians_expand_kernel
        from tpugs.ops.pallas.composite import _interpret, segred_needs_meta

        # carry_attrs: the expand kernel streams the 9 compositor attribute
        # rows sequentially (the expansion is gaussian-major) and the pair
        # sort carries them as free payload (scripts/bench_sort_payload.py),
        # replacing the latency-bound [P]-row pack gather (~17 ms of the
        # 1080p/1M viewer frame). Bit-identical attributes (one-hot matmul
        # at precision=HIGHEST), so images and gradients are unchanged.
        # reduce_meta only when the segred backward's CLASSIC branch will
        # run — the sorted-key default never reads the expansion metadata,
        # and its exp_slot sort payload alone costs ~1.2 ms/M pairs.
        meta_needed = segred_needs_meta(cfg, means.shape[0])
        binning = bin_gaussians_expand_kernel(
            proj_b, cfg.img_w, cfg.img_h, cfg.tile_w, cfg.tile_h,
            cfg.pair_capacity, interpret=_interpret(),
            presorted=bool(presort), reduce_meta=need_grads and meta_needed,
            carry_attrs=carry_attrs,
            quant_key_bits=quant_key_bits,
        )
        segred = need_grads
    else:
        binning = bin_gaussians(
            proj_b, cfg.img_w, cfg.img_h, cfg.tile_w, cfg.tile_h,
            cfg.pair_capacity, presorted=bool(presort),
        )
        segred = False
    binning, max_tile_hits = clamp_tile_segments(binning, cfg.max_hits_per_tile)
    if compositor == "pallas" and segred:
        # Segment-sum backward reduction (ops/pallas/segreduce.py): replaces
        # the XLA pair->gauss scatter-add — the train step's largest op
        # (225 ms of a 336 ms garden step, docs/PERF_NOTES.md r3).
        from tpugs.ops.pallas.composite import (
            composite_tiles_pallas_segred,
            segred_dummy_meta,
        )

        b = binning
        meta = (
            (b.exp_slot, b.red_start, b.red_count, b.exp_end)
            if b.exp_slot is not None
            else segred_dummy_meta()
        )

        def composite_fn(cfg_, ts, tp, pg, m2, cn, rg, op, bgv):
            return composite_tiles_pallas_segred(
                cfg_, ts, tp, pg, b.pair_tile, *meta, m2, cn, rg, op, bgv,
                attr_c=b.attr_c,
            )
    elif compositor == "pallas":
        from tpugs.ops.pallas.composite import composite_tiles_pallas

        b = binning

        def composite_fn(cfg_, ts, tp, pg, m2, cn, rg, op, bgv):
            return composite_tiles_pallas(
                cfg_, ts, tp, pg, m2, cn, rg, op, bgv, attr_c=b.attr_c,
            )
    else:
        composite_fn = composite_tiles
    color_t, t_t, nc_t = composite_fn(
        cfg, binning.tile_start, binning.tile_stop, binning.pair_gauss,
        means2d, proj_b.conic, proj_b.rgb, proj_b.opac, bg,
    )
    color = tiles_to_image(cfg, color_t)[: cfg.img_h, : cfg.img_w]
    final_t = tiles_to_image(cfg, t_t)[: cfg.img_h, : cfg.img_w]
    n_contrib = tiles_to_image(cfg, nc_t)[: cfg.img_h, : cfg.img_w]

    return RenderOutput(
        color=color,
        final_T=final_t,
        n_contrib=n_contrib,
        radii=proj.radii,
        means2d=proj.means2d,
        depths=proj.depths,
        visible=proj.visible,
        num_pairs=binning.num_pairs,
        pair_overflow=binning.overflow,
        max_tile_hits=max_tile_hits,
        hit_overflow=max_tile_hits > cfg.max_hits_per_tile,
    )


def render_state(state, viewmat, intrinsics, cfg, sh_degree, background, **kw):
    """Convenience: render a GaussianState pytree."""
    return render(
        state.means, state.quats, state.log_scales, state.opacity_logits,
        state.sh, state.alive, viewmat, intrinsics, cfg, sh_degree, background, **kw,
    )
