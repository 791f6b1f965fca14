"""Tile-sharded rasterization — the SP/CP analogue (SURVEY.md §5.7 / §2.8).

Both the Gaussian SoA *and* the tile grid are sharded over the mesh "gauss"
axis; views are sharded over "data". This is the Ulysses-style all-to-all
re-partition applied to splats: the pipeline starts gaussian-sharded
(projection, SH, Adam, densification are embarrassingly parallel in N) and
re-partitions to tile-sharded (binning, compositing are embarrassingly
parallel in tiles) through one destination-aware `all_to_all`.

Per device, per frame:
  1. project the LOCAL Gaussian shard (N/g rows);
  2. compute each local Gaussian's touched-tile rect and the contiguous range
     of devices whose tile-row slice it overlaps;
  3. pack screen-space attributes (12 f32: x y depth conic3 radius rgb3 opac
     valid) into a [g, C, 12] send buffer — one capacity-C slot block per
     destination — and `all_to_all` it over "gauss";
  4. bin ONLY the local tile-row slice from the received working set
     (bin_gaussians with num_tile_rows=rows/g): every [P]-sized op — the
     dominant cost of the whole step (docs/PERF_NOTES.md) — shrinks by g;
  5. composite the local tiles in GLOBAL pixel coordinates (row_offset
     threaded into the compositor kernels for bit-exactness);
  6. `all_gather` the color tile rows to assemble the full image for the
     L1+SSIM loss (whose 11x11 window couples neighboring tile rows).

Backward rides autodiff: the all_to_all transposes to the reverse all_to_all
(pair-gradient return to the owning shard), the send-gather transposes to a
local segment-sum, and the color all_gather transposes to a reduce-scatter of
the image cotangent. On the pallas path the pair->working-set-row reduction
inside the compositor VJP is the segment-sum kernel
(composite_tiles_pallas_segred / ops/pallas/segreduce.py), NOT the XLA
scatter-add — the same replacement that was the single largest single-chip
backward win (docs/PERF_NOTES.md r3); tests/test_parallel.py pins that no
f32[*,9] scatter survives in the distributed backward HLO. Gradients from the d view rows are psum-combined over
"data"; the raw shard_map gradient is d(sum of all device losses)/dx — with
the loss replicated inside each gauss group it carries a factor g x d that is
normalized out explicitly in make_tile_sharded_train_step
(tests/test_parallel.py pins raw-gradient parity, not just post-Adam parity,
against single-device — a fresh-state Adam step is gradient-scale-invariant).

Compared to parallel/gauss_shard.py (kept as the simpler all-gather design):
there every device re-ran binning + compositing on the WHOLE image, so the
dominant cost was replicated; here it is 1/g per device. Reference: none —
the reference is strictly single-GPU (SURVEY.md §2.8); this is the net-new
charter axis.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpugs.ops.binning import bin_gaussians, tile_rects
from tpugs.ops.projection import ProjectionOutput, project_gaussians
from tpugs.ops.rasterize_tiled import (
    RasterConfig,
    composite_tiles,
    tiles_to_image,
)
from tpugs.optim.adam import AdamConfig, AdamState, adam_step
from tpugs.train.loss import combined_loss

# Exchange record: x, y, depth, conic a b c, radius, r, g, b, opac, valid.
EXCHANGE_ATTRS = 12

# Default per-device pair capacity = ceil(global / g) x this: tile rows are
# not equally loaded (measured 27.3k pairs on the busiest of 8 slices vs a
# 25.6k even split on the bench scene — scripts/comm_report.py).
PAIR_IMBALANCE_HEADROOM = 1.5


def default_local_pair_capacity(pair_capacity: int, g: int) -> int:
    return int(-(-pair_capacity // g) * PAIR_IMBALANCE_HEADROOM)


def rows_per_device(raster: RasterConfig, g: int) -> int:
    """Tile rows per device (grid padded up to a multiple of g rows)."""
    return -(-raster.nty // g)


def local_raster_config(raster: RasterConfig, g: int,
                        local_pair_capacity: int) -> RasterConfig:
    """The per-device tile-slice geometry: same tile size and image width,
    rows/g tile rows, 1/g-sized pair list."""
    rpd = rows_per_device(raster, g)
    return RasterConfig(
        img_h=rpd * raster.tile_h,
        img_w=raster.img_w,
        tile_h=raster.tile_h,
        tile_w=raster.tile_w,
        pair_capacity=local_pair_capacity,
        max_hits_per_tile=raster.max_hits_per_tile,
    )


def _pack_attrs(proj: ProjectionOutput) -> jnp.ndarray:
    """[N_loc, 12] exchange records (see EXCHANGE_ATTRS)."""
    return jnp.concatenate(
        [
            proj.means2d,
            proj.depths[:, None],
            proj.conic,
            proj.radii.astype(jnp.float32)[:, None],
            proj.rgb,
            proj.opac[:, None],
            proj.visible.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )


def _unpack_attrs(recv: jnp.ndarray) -> ProjectionOutput:
    """Inverse of _pack_attrs on the received [M, 12] working set."""
    visible = recv[:, 11] > 0.5
    return ProjectionOutput(
        means2d=recv[:, 0:2],
        depths=recv[:, 2],
        conic=recv[:, 3:6],
        radii=jnp.where(visible, recv[:, 6], 0.0).astype(jnp.int32),
        rgb=recv[:, 7:10],
        opac=recv[:, 10],
        visible=visible,
    )


def destination_range(proj: ProjectionOutput, raster: RasterConfig, g: int):
    """Per-gaussian contiguous destination-device range [d0, d1] (inclusive)
    covered by its touched tile rows; empty rects get d0 > d1."""
    rpd = rows_per_device(raster, g)
    _, ty0, w_tiles, h_tiles = tile_rects(
        proj, raster.img_w, raster.img_h, raster.tile_w, raster.tile_h
    )
    nonempty = proj.visible & (w_tiles > 0) & (h_tiles > 0)
    d0 = ty0 // rpd
    d1 = (ty0 + jnp.maximum(h_tiles, 1) - 1) // rpd
    d0 = jnp.where(nonempty, d0, g)  # empty -> sends nowhere
    d1 = jnp.where(nonempty, d1, -1)
    return d0, d1


def build_send_index(d0, d1, g: int, capacity: int):
    """[g, C] local-gaussian indices per destination (sentinel = N_loc), plus
    the true per-destination counts [g] (count > C means slots were dropped)."""
    n_loc = d0.shape[0]
    idx = jnp.arange(n_loc, dtype=jnp.int32)
    send_idx = []
    counts = []
    for dst in range(g):
        mask = (d0 <= dst) & (dst <= d1)
        pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
        slot = jnp.where(mask & (pos < capacity), pos, capacity)
        row = jnp.full((capacity,), n_loc, jnp.int32).at[slot].set(
            idx, mode="drop"
        )
        send_idx.append(row)
        counts.append(jnp.sum(mask.astype(jnp.int32)))
    return jnp.stack(send_idx), jnp.stack(counts)


def exchange_and_render_local(
    proj: ProjectionOutput,
    raster: RasterConfig,
    local_cfg: RasterConfig,
    g: int,
    send_capacity: int,
    background,
    compositor: str,
    axis_name: str = "gauss",
    need_grads: bool = True,
):
    """The tile-shard core, called INSIDE shard_map: exchange screen attrs to
    the tile-owning devices, bin + composite the local tile slice.

    Returns (color_tiles [T_loc, pix, 3], diag dict). Fully differentiable
    w.r.t. proj's float fields. need_grads=False (forward-only callers)
    skips the segment-sum reduction metadata, like render(need_grads=False)."""
    my = jax.lax.axis_index(axis_name)
    rpd = rows_per_device(raster, g)
    row_lo = my * rpd

    d0, d1 = destination_range(proj, raster, g)
    send_idx, send_counts = build_send_index(d0, d1, g, send_capacity)

    attrs = _pack_attrs(proj)  # [N_loc, 12]
    attrs_pad = jnp.concatenate(
        [attrs, jnp.zeros((1, EXCHANGE_ATTRS), attrs.dtype)], axis=0
    )
    send_buf = attrs_pad[send_idx]  # [g, C, 12]

    recv = jax.lax.all_to_all(
        send_buf, axis_name, split_axis=0, concat_axis=0
    )  # [g, C, 12]: recv[j] = what shard j sent to my tiles
    work = _unpack_attrs(recv.reshape(g * send_capacity, EXCHANGE_ATTRS))

    # Depth-presort the received working set so the per-device [P_loc] pair
    # sort runs on a single packed u32 key (binning.presort_by_depth — same
    # exactness argument as the single-device path; equal-depth ties already
    # broke by received-slot order here, which the stable presort preserves).
    from tpugs.ops.binning import clamp_tile_segments, presort_by_depth

    _, work = presort_by_depth(work)
    if compositor == "pallas":
        # Slice binning through the Pallas expand kernel (VERDICT r3 item 7:
        # the distributed path was still paying the XLA scatter + cumsum +
        # row-gather expansion — the round-3 single-chip win). Bit-identical
        # slice segments (tests/test_expand_pallas.py::TestExpandKernelSlice)
        # with LOCAL tile ids; attrs ride the sort and skip the pack gather.
        from tpugs.ops.binning import bin_gaussians_expand_kernel
        from tpugs.ops.pallas.composite import (
            _interpret,
            composite_tiles_pallas,
            composite_tiles_pallas_segred,
            segred_dummy_meta,
            segred_needs_meta,
        )

        # carry_attrs off: the sliced pack gather beats sort payloads at
        # every measured pair count (docs/PERF_NOTES.md r4 A/B).
        # reduce_meta on: the distributed backward reduces pair gradients to
        # working-set rows through the segment-sum kernel
        # (ops/pallas/segreduce.py) like the single-device path, not the XLA
        # pair->gauss scatter-add it replaced (225 ms of a 336 ms garden
        # step, docs/PERF_NOTES.md r3; VERDICT r4 item 4). The metadata is
        # slice-local by construction: counts/offsets come from the
        # row-clipped rects and exp_slot rides the slice-localized sort —
        # and is skipped entirely when the sorted-key backward will run
        # (segred_needs_meta, same predicate as the single-device path).
        meta_needed = segred_needs_meta(local_cfg, work.means2d.shape[0])
        binning = bin_gaussians_expand_kernel(
            work, raster.img_w, raster.img_h, raster.tile_w, raster.tile_h,
            local_cfg.pair_capacity, interpret=_interpret(), presorted=True,
            reduce_meta=need_grads and meta_needed,
            tile_row_lo=row_lo, num_tile_rows=rpd,
        )
        binning, max_tile_hits = clamp_tile_segments(
            binning, local_cfg.max_hits_per_tile
        )
        if need_grads:
            meta = (
                (binning.exp_slot, binning.red_start, binning.red_count,
                 binning.exp_end)
                if binning.exp_slot is not None
                else segred_dummy_meta()
            )
            color_t, final_t, nc_t = composite_tiles_pallas_segred(
                local_cfg, binning.tile_start, binning.tile_stop,
                binning.pair_gauss, binning.pair_tile, *meta,
                work.means2d, work.conic, work.rgb,
                work.opac, background, row_lo, attr_c=binning.attr_c,
            )
        else:
            color_t, final_t, nc_t = composite_tiles_pallas(
                local_cfg, binning.tile_start, binning.tile_stop,
                binning.pair_gauss, work.means2d, work.conic, work.rgb,
                work.opac, background, row_lo, attr_c=binning.attr_c,
            )
    else:
        binning = bin_gaussians(
            work, raster.img_w, raster.img_h, raster.tile_w, raster.tile_h,
            local_cfg.pair_capacity, tile_row_lo=row_lo, num_tile_rows=rpd,
            presorted=True,
        )
        binning, max_tile_hits = clamp_tile_segments(
            binning, local_cfg.max_hits_per_tile
        )
        color_t, final_t, nc_t = composite_tiles(
            local_cfg, binning.tile_start, binning.tile_stop,
            binning.pair_gauss, work.means2d, work.conic, work.rgb,
            work.opac, background, row_lo,
        )

    diag = {
        "send_overflow": jnp.any(send_counts > send_capacity),
        "max_send_count": jnp.max(send_counts),
        "pair_overflow": binning.overflow,
        "num_pairs": binning.num_pairs,
        "max_tile_hits": max_tile_hits,
    }
    return color_t, final_t, nc_t, diag


def assemble_image(raster: RasterConfig, g: int, color_t,
                   axis_name: str = "gauss"):
    """all_gather local color tile rows -> full [img_h, img_w, 3] image
    (replicated within the gauss group)."""
    rpd = rows_per_device(raster, g)
    full_t = jax.lax.all_gather(color_t, axis_name, axis=0, tiled=True)
    pad_cfg = RasterConfig(
        img_h=g * rpd * raster.tile_h, img_w=raster.img_w,
        tile_h=raster.tile_h, tile_w=raster.tile_w,
    )
    img = tiles_to_image(pad_cfg, full_t)
    return img[: raster.img_h, : raster.img_w]


def make_tile_sharded_train_step(
    mesh: Mesh,
    raster: RasterConfig,
    adam_cfg: AdamConfig = AdamConfig(),
    lambda_ssim: float = 0.2,
    sh_degree: int = 0,
    compositor: str = "auto",
    send_capacity: Optional[int] = None,
    local_pair_capacity: Optional[int] = None,
):
    """Train step with params+moments+tiles sharded over "gauss", views over
    "data" (same signature as gauss_shard.make_gauss_sharded_train_step):

      step_fn(params, alive, adam_state, images [B,H,W,3], viewmats [B,4,4],
              intrinsics [B,4], step) -> (params, adam_state, loss)

    send_capacity: per-(src, dst) exchange slots; default N_loc (never
    overflows — tune down from the logged max_send_count for less comm).
    local_pair_capacity: per-device pair list; default pair_capacity / g
    rounded up (the global list split evenly across tile slices).
    """
    if compositor == "auto":
        compositor = "pallas" if jax.default_backend() == "tpu" else "scan"
    d = mesh.shape["data"]
    g = mesh.shape["gauss"]
    if local_pair_capacity is None:
        local_pair_capacity = default_local_pair_capacity(
            raster.pair_capacity, g
        )
    local_cfg = local_raster_config(raster, g, local_pair_capacity)

    def step_impl(params, alive, adam_m, adam_v, adam_count,
                  images, viewmats, intrinsics, step):
        image = images[0]
        viewmat = viewmats[0]
        intr = intrinsics[0]
        n_loc = alive.shape[0]
        cap = send_capacity if send_capacity is not None else n_loc

        def loss_fn(local_params):
            proj = project_gaussians(
                local_params["means"], local_params["quats"],
                local_params["log_scales"], local_params["opacity_logits"],
                local_params["sh"], alive,
                viewmat, intr, raster.img_w, raster.img_h, sh_degree,
            )
            color_t, _, _, diag = exchange_and_render_local(
                proj, raster, local_cfg, g, cap, jnp.zeros((3,)), compositor
            )
            color = assemble_image(raster, g, color_t)
            return combined_loss(color, image, lambda_ssim), diag

        (loss, diag), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        # Raw shard_map grads are d(sum over ALL devices' losses)/d(local
        # shard) = g * sum over data rows; normalize to the mean-over-views
        # gradient (pmean over data is the cross-view reduction, /g removes
        # the replicated-loss inflation from the gauss group).
        grads = jax.tree.map(lambda t: jax.lax.pmean(t, "data") / g, grads)
        loss = jax.lax.pmean(loss, "data")

        adam_state = AdamState(m=adam_m, v=adam_v, count=adam_count)
        new_params, new_adam = adam_step(adam_cfg, adam_state, params, grads, step)
        return new_params, new_adam.m, new_adam.v, new_adam.count, loss

    gspec = {
        "means": P("gauss"), "quats": P("gauss"), "log_scales": P("gauss"),
        "opacity_logits": P("gauss"), "sh": P("gauss"),
    }
    mapped = jax.shard_map(
        step_impl,
        mesh=mesh,
        in_specs=(gspec, P("gauss"), gspec, gspec, P(),
                  P("data"), P("data"), P("data"), P()),
        out_specs=(gspec, gspec, gspec, P(), P()),
        check_vma=False,
    )

    def step_fn(params, alive, adam_state, images, viewmats, intrinsics, step):
        # One view per data row: step_impl renders images[0] of its local
        # block, so extra rows would be SILENTLY ignored. The full-batch
        # training loop is dist_train.make_dist_multi_step.
        if images.shape[0] != d:
            raise ValueError(
                f"batch must be exactly one view per data row ({d}); got "
                f"{images.shape[0]} — use dist_train.make_dist_multi_step "
                f"for batched training"
            )
        p, m, v, c, loss = mapped(
            params, alive, adam_state.m, adam_state.v, adam_state.count,
            images, viewmats, intrinsics, step,
        )
        return p, AdamState(m=m, v=v, count=c), loss

    return jax.jit(step_fn)


def comm_report(raster: RasterConfig, g: int, n_total: int,
                send_capacity: int, max_send_count: int,
                num_pairs: int) -> dict:
    """Analytic per-device communication-volume and padding-waste accounting
    for one frame (bytes), comparing the tile-shard all_to_all against the
    gauss_shard all-gather design it replaces."""
    n_loc = n_total // g
    a2a_sent = g * send_capacity * EXCHANGE_ATTRS * 4
    a2a_useful = max_send_count * g * EXCHANGE_ATTRS * 4  # upper bound
    allgather_recv = n_total * 11 * 4  # gauss_shard: 11 attrs, full N
    rpd = rows_per_device(raster, g)
    color_gather = g * rpd * raster.ntx * raster.pix * 3 * 4
    return {
        "all_to_all_bytes_per_device": a2a_sent,
        "all_to_all_padding_frac": 1.0 - min(
            1.0, (max_send_count or 1) / float(send_capacity)
        ),
        "color_all_gather_bytes": color_gather,
        "gauss_shard_all_gather_bytes": allgather_recv,
        "pairs_per_device": num_pairs,
        "n_local": n_loc,
    }
