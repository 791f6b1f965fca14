"""Phase-2 distribution: Gaussians sharded over the mesh "gauss" axis,
views over "data" (SURVEY.md §2.8 / §7).

Memory model: the Gaussian SoA and the Adam moments — the dominant state —
live sharded (N/g per device). Per frame, each device projects only its local
shard (projection, SH, Adam and densification are embarrassingly parallel in
N), then `all_gather`s the *screen-space* attributes (11 floats/gaussian, far
smaller than parameters + moments) over ICI for binning + compositing.
Autodiff through the all_gather yields the matching reduce_scatter on the
backward path, and gradients are `pmean`ed over "data" — the collectives XLA
rides over ICI, overlapped by the latency-hiding scheduler.

Written with shard_map (not vmap) so each device runs the Pallas compositor
unbatched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpugs.ops.binning import bin_gaussians
from tpugs.ops.projection import project_gaussians
from tpugs.ops.rasterize_tiled import RasterConfig, composite_tiles, tiles_to_image
from tpugs.optim.adam import AdamConfig, adam_step
from tpugs.train.loss import combined_loss


def _render_from_full(proj_full, cfg: RasterConfig, background, compositor: str):
    binning = bin_gaussians(
        proj_full, cfg.img_w, cfg.img_h, cfg.tile_w, cfg.tile_h, cfg.pair_capacity
    )
    if compositor == "pallas":
        from tpugs.ops.pallas.composite import composite_tiles_pallas as fn
    else:
        fn = composite_tiles
    color_t, _, _ = fn(
        cfg, binning.tile_start, binning.tile_stop, binning.pair_gauss,
        proj_full.means2d, proj_full.conic, proj_full.rgb, proj_full.opac,
        background,
    )
    return tiles_to_image(cfg, color_t)[: cfg.img_h, : cfg.img_w]


def make_gauss_sharded_train_step(
    mesh: Mesh,
    raster: RasterConfig,
    adam_cfg: AdamConfig = AdamConfig(),
    lambda_ssim: float = 0.2,
    sh_degree: int = 0,
    compositor: str = "auto",
):
    """Train step with params+moments sharded over "gauss", views over "data".

    step_fn(params, alive, adam_state, images [B,H,W,3], viewmats [B,4,4],
            intrinsics [B,4], step) -> (params, adam_state, loss)

    Array layouts: every [Nc, ...] leaf sharded on axis 0 over "gauss";
    batch B == size of "data" axis (one view per data-shard).
    """
    if compositor == "auto":
        compositor = "pallas" if jax.default_backend() == "tpu" else "scan"

    def step_impl(params, alive, adam_m, adam_v, adam_count,
                  images, viewmats, intrinsics, step):
        # Inside shard_map: leaves are the per-device local shards.
        image = images[0]
        viewmat = viewmats[0]
        intr = intrinsics[0]

        def loss_fn(local_params):
            proj = project_gaussians(
                local_params["means"], local_params["quats"],
                local_params["log_scales"], local_params["opacity_logits"],
                local_params["sh"], alive,
                viewmat, intr, raster.img_w, raster.img_h, sh_degree,
            )
            # Gather screen-space attributes across the gauss axis -> full set.
            full = jax.tree.map(
                lambda x: jax.lax.all_gather(x, "gauss", axis=0, tiled=True), proj
            )
            color = _render_from_full(
                full, raster, jnp.zeros((3,)), compositor
            )
            return combined_loss(color, image, lambda_ssim)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # Average loss and gradients over the data axis (each data-shard saw a
        # different view of the same sharded parameters). The raw shard_map
        # gradient is d(sum of ALL device losses)/d(local shard): the loss is
        # replicated within each gauss group (every device computed it from
        # the same all_gathered attributes), so the all_gather transpose
        # (psum_scatter) inflates it by the gauss-axis size — divide it back
        # out. (A single fresh-state Adam step is gradient-scale-invariant,
        # which is why parity tests must compare raw gradients —
        # tests/test_parallel.py::test_gauss_shard_grad_parity.)
        loss = jax.lax.pmean(loss, "data")
        gauss_size = mesh.shape["gauss"]
        grads = jax.tree.map(
            lambda g: jax.lax.pmean(g, "data") / gauss_size, grads
        )

        from tpugs.optim.adam import AdamState

        adam_state = AdamState(m=adam_m, v=adam_v, count=adam_count)
        new_params, new_adam = adam_step(adam_cfg, adam_state, params, grads, step)
        return new_params, new_adam.m, new_adam.v, new_adam.count, loss

    gspec = {  # params tree: all leaves sharded on gauss axis 0
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
        p, m, v, c, loss = mapped(
            params, alive, adam_state.m, adam_state.v, adam_state.count,
            images, viewmats, intrinsics, step,
        )
        from tpugs.optim.adam import AdamState

        return p, AdamState(m=m, v=v, count=c), loss

    return jax.jit(step_fn)


def shard_gauss_state(mesh: Mesh, params, alive, adam_state):
    """Device-put the Gaussian state sharded over the "gauss" axis."""
    gs = NamedSharding(mesh, P("gauss"))
    repl = NamedSharding(mesh, P())
    from tpugs.optim.adam import AdamState

    params = jax.tree.map(lambda a: jax.device_put(a, gs), params)
    alive = jax.device_put(alive, gs)
    adam = AdamState(
        m=jax.tree.map(lambda a: jax.device_put(a, gs), adam_state.m),
        v=jax.tree.map(lambda a: jax.device_put(a, gs), adam_state.v),
        count=jax.device_put(adam_state.count, repl),
    )
    return params, alive, adam
