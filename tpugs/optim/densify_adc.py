"""Adaptive density control (clone / split / prune) — shape-stable, jittable.

Semantics of reference src/optimizer/densification.cpp:59-476 re-designed for
fixed capacity (SURVEY.md §7 hard parts #2): where the reference concatenates /
index-selects growable tensors (and rebuilds the optimizer), this version works
entirely in masked, capacity-padded arrays:

- accumulate ||dL/d(screen xy)||_2 and max screen radius for visible Gaussians;
- clone:  avg_grad >= 2e-4 AND max(exp(scale)) <  0.01 * extent -> 1 copy;
- split:  avg_grad >= 2e-4 AND max(exp(scale)) >= 0.01 * extent -> 2 children
          (scale - log(1.6), positions jittered by randn * exp(new_scale) —
          the reference does NOT rotate the jitter, densification.cpp:262-268);
- prune:  sigmoid(op) < 0.005; screen radius > 20 / world size > 0.1 * extent
          only after the first opacity reset (densification.cpp:415-440);
- opacity reset every 3000 iters to inverse_sigmoid(0.01) = -4.5951.

Slot allocation: pruned + already-dead slots form the free list; clone children
take free slots in descending-gradient priority; a granted split writes child 1
over the parent slot (the reference prunes split originals) and child 2 into a
free slot. Budget-trimmed requests simply don't fire this round — the analogue
of the reference's topk-by-gradient trimming (densification.cpp:122-139).

One deliberate improvement over the reference: Adam moments are preserved for
untouched Gaussians and zeroed only for rewritten slots (the reference rebuilds
the whole optimizer, trainer.cpp:283-289, losing all moments every densify).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

RESET_OPACITY = -4.59511985013459  # log(0.01 / 0.99), reference densification.cpp:26
SPLIT_SCALE_FACTOR = 1.6
WS_PRUNE_FRACTION = 0.1


@dataclasses.dataclass(frozen=True)
class ADCConfig:
    """reference: densification.hpp:23-44."""

    densify_from: int = 500
    densify_until: int = 15000
    densify_every: int = 100
    opacity_reset_every: int = 3000
    grad_threshold: float = 2e-4
    opacity_threshold: float = 0.005
    percent_dense: float = 0.01
    max_screen_size: int = 20
    max_gaussians: int = 0  # 0 = capacity-limited only
    # Skip any opacity reset that does not leave a full reset period of
    # densify events before densify_until. The reference fires resets at
    # every multiple of opacity_reset_every up to AND INCLUDING densify_until
    # (densification.hpp:25-28) — with the default schedule (3000/15000) the
    # last reset lands exactly at the last densify step, so nothing can
    # clone/split the near-transparent model back and PSNR craters ~13 dB
    # for thousands of steps (measured: 25.41 dB @10k -> 12.34 @15k on the
    # 30k row, docs/PERF_NOTES.md). True (default) = last reset at 12000,
    # leaving 3000 densify-active steps to recover; False = reference
    # schedule, kept for ablation.
    skip_final_reset: bool = True

    def should_densify(self, step: int) -> bool:
        return (
            self.densify_from <= step <= self.densify_until
            and step % self.densify_every == 0
        )

    def should_reset_opacity(self, step: int) -> bool:
        if self.skip_final_reset:
            last_ok = self.densify_until - self.opacity_reset_every
        else:
            last_ok = self.densify_until
        return (
            self.opacity_reset_every > 0
            and step > 0
            and step % self.opacity_reset_every == 0
            and step <= last_ok
        )


@struct.dataclass
class ADCState:
    grad_accum: jnp.ndarray  # [Nc] sum of screen-grad norms
    grad_count: jnp.ndarray  # [Nc] visibility counts
    max_radii: jnp.ndarray  # [Nc] max observed screen radius


def adc_init(capacity: int) -> ADCState:
    # Three distinct buffers (donation-safe: aliased leaves cannot be donated).
    return ADCState(
        grad_accum=jnp.zeros((capacity,), jnp.float32),
        grad_count=jnp.zeros((capacity,), jnp.float32),
        max_radii=jnp.zeros((capacity,), jnp.float32),
    )


def adc_accumulate(
    state: ADCState,
    d_means2d: jnp.ndarray,
    radii: jnp.ndarray,
    grad_scale=1.0,
) -> ADCState:
    """Per-iteration accumulation (reference: densification.cpp:59-88).

    `grad_scale` converts the gradient to the units the 2e-4 threshold was
    calibrated for. The INRIA threshold applies to viewspace (NDC-scale)
    gradients; d_means2d here is w.r.t. PIXEL coordinates, a factor of
    (W/2, H/2) smaller. The reference accumulates raw pixel gradients
    (densification.cpp:77) against the same 2e-4 — at its 489x272 dev
    resolution that under-triggers by ~250x and densification never fires
    (clone/split counts stay 0), leaving ADC as pure pruning. Pass
    grad_scale=(W/2, H/2) to restore the paper-calibrated behavior (the
    Trainer does)."""
    visible = radii > 0
    norms = jnp.linalg.norm(d_means2d * grad_scale, axis=-1)
    return ADCState(
        grad_accum=state.grad_accum + jnp.where(visible, norms, 0.0),
        grad_count=state.grad_count + visible.astype(jnp.float32),
        max_radii=jnp.maximum(state.max_radii, radii.astype(jnp.float32)),
    )


def reset_opacity(params: dict) -> dict:
    """All opacities <- inverse_sigmoid(0.01) (reference: densification.cpp:335-338)."""
    out = dict(params)
    out["opacity_logits"] = jnp.full_like(params["opacity_logits"], RESET_OPACITY)
    return out


def adc_densify(
    cfg: ADCConfig,
    params: dict,
    alive: jnp.ndarray,
    adc: ADCState,
    key: jax.Array,
    scene_extent: float,
    size_pruning_active: bool,
):
    """One densification event. Fully shape-stable; jittable.

    Returns (params, alive, changed_mask, new ADCState, stats dict).
    `changed_mask` marks slots whose Adam moments must be zeroed.
    `size_pruning_active` is static: step > opacity_reset_every
    (reference: densification.cpp:415-417).
    """
    nc = alive.shape[0]
    avg_grad = adc.grad_accum / jnp.maximum(adc.grad_count, 1.0)
    max_scale = jnp.max(jnp.exp(params["log_scales"]), axis=-1)
    size_thresh = cfg.percent_dense * scene_extent

    high_grad = alive & (avg_grad >= cfg.grad_threshold)
    clone_mask = high_grad & (max_scale < size_thresh)
    split_mask = high_grad & (max_scale >= size_thresh)

    # Prune decision (reference: compute_keep_mask, densification.cpp:400-443).
    opac = jax.nn.sigmoid(params["opacity_logits"])
    keep = opac >= cfg.opacity_threshold
    if size_pruning_active:
        keep &= adc.max_radii <= float(cfg.max_screen_size)
        keep &= max_scale <= WS_PRUNE_FRACTION * scene_extent

    # Free slots this round: already dead, or pruned non-split-candidates.
    dead_free = (~alive) | (alive & ~keep & ~split_mask)
    free_count = jnp.sum(dead_free.astype(jnp.int32))
    if cfg.max_gaussians > 0:
        headroom = cfg.max_gaussians - jnp.sum(alive.astype(jnp.int32))
        free_count = jnp.minimum(free_count, jnp.maximum(headroom, 0))

    # Free slot list: dead slots first (stable argsort of "not free").
    free_idx = jnp.argsort(jnp.where(dead_free, 0, 1), stable=True)

    # --- Clones (priority = avg_grad, reference: densification.cpp:122-139) ---
    n_clone = jnp.sum(clone_mask.astype(jnp.int32))
    clone_order = jnp.argsort(jnp.where(clone_mask, -avg_grad, jnp.inf), stable=True)
    grant_clone = jnp.arange(nc) < jnp.minimum(n_clone, free_count)
    clone_src = clone_order  # [Nc]; row j valid iff grant_clone[j]
    clone_dst = jnp.where(grant_clone, free_idx, nc)  # nc = dropped

    # --- Splits: child1 reuses parent slot, child2 takes a free slot ---
    g_clones = jnp.minimum(n_clone, free_count)
    n_split = jnp.sum(split_mask.astype(jnp.int32))
    split_order = jnp.argsort(jnp.where(split_mask, -avg_grad, jnp.inf), stable=True)
    g_splits = jnp.minimum(n_split, free_count - g_clones)
    grant_split_row = jnp.arange(nc) < g_splits
    split_src = split_order
    split_dst2 = jnp.where(
        grant_split_row, free_idx[jnp.clip(g_clones + jnp.arange(nc), 0, nc - 1)], nc
    )
    # Per-slot mask: this parent's split was granted.
    split_granted = (
        jnp.zeros((nc,), bool).at[jnp.where(grant_split_row, split_src, nc)]
        .set(True, mode="drop")
    )

    key_c1, key_c2 = jax.random.split(key)
    new_log_scales_parent = params["log_scales"] - jnp.log(SPLIT_SCALE_FACTOR)
    noise1 = jax.random.normal(key_c1, (nc, 3)) * jnp.exp(new_log_scales_parent)
    noise2 = jax.random.normal(key_c2, (nc, 3)) * jnp.exp(new_log_scales_parent)

    new_params = dict(params)

    def scatter_rows(arr, dst, src_rows):
        return arr.at[dst].set(src_rows, mode="drop")

    # Apply clones: copy all 5 params from clone_src rows into clone_dst slots.
    for k in new_params:
        new_params[k] = scatter_rows(new_params[k], clone_dst, new_params[k][clone_src])

    # Split child 2 -> free slots (jittered position, reduced scale).
    child2_means = params["means"][split_src] + noise2[split_src]
    child2_scales = new_log_scales_parent[split_src]
    new_params["means"] = scatter_rows(new_params["means"], split_dst2, child2_means)
    new_params["log_scales"] = scatter_rows(
        new_params["log_scales"], split_dst2, child2_scales
    )
    for k in ("quats", "sh", "opacity_logits"):
        new_params[k] = scatter_rows(new_params[k], split_dst2, params[k][split_src])

    # Split child 1 -> in place over granted parents.
    gm = split_granted
    new_params["means"] = jnp.where(
        gm[:, None], params["means"] + noise1, new_params["means"]
    )
    new_params["log_scales"] = jnp.where(
        gm[:, None], new_log_scales_parent, new_params["log_scales"]
    )

    # Alive bookkeeping.
    clone_written = jnp.zeros((nc,), bool).at[clone_dst].set(True, mode="drop")
    child2_written = jnp.zeros((nc,), bool).at[split_dst2].set(True, mode="drop")
    survivors = alive & keep & ~split_mask
    unsplit_parents = alive & split_mask & ~split_granted & keep
    new_alive = survivors | unsplit_parents | split_granted | clone_written | child2_written

    changed = clone_written | child2_written | split_granted
    n_pruned = jnp.sum((alive & ~keep).astype(jnp.int32))

    stats = {
        "num_cloned": g_clones,
        "num_split": g_splits,
        "num_pruned": n_pruned,
        "num_after": jnp.sum(new_alive.astype(jnp.int32)),
    }
    return new_params, new_alive, changed, adc_init(nc), stats
