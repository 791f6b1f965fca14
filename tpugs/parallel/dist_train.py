"""Distributed Trainer steps — the multi-step train scan and the
densification events under a ("data", "gauss") mesh.

This promotes distribution from one-step demos (sharded_train / gauss_shard /
tile_shard) into a full Trainer capability (the reference has nothing to
mirror — SURVEY.md §2.8: strictly single-GPU; this is the build's charter
axis). Layout:

  - Gaussian SoA, Adam moments, ADC accumulators, alive mask: sharded over
    "gauss" (N/g rows per device);
  - the tile grid: sharded over "gauss" too (tile_shard.py — the all_to_all
    re-partition from gaussian-sharded projection to tile-sharded
    compositing);
  - the view bank: sharded over "data" (V/d views per data row); each step
    processes d views, one per data row (camera-batch DP), gradients
    psum-combined over "data";
  - RNG: one replicated key chain; per-shard randomness folds in the gauss
    axis index so it is identical across data rows (params are replicated
    over "data" and must stay bitwise in sync).

ADC densification under sharding runs with SHARD-LOCAL free lists: each
shard clones/splits/prunes within its own slot range. This diverges from
single-device slot allocation order only (not from the math: thresholds are
per-gaussian) and keeps the event collective-free; a shard can be
clone-starved while another has free slots. For this to be livable the
INITIAL slots must be interleaved across shards (core/init.py mesh layout):
contiguous packing left low shards slot-full and high shards gaussian-empty,
structurally starving clone/split (-2.52 dB on the 2k-iteration mesh quality
row). With interleaving, the measured mesh-mode quality rows
(docs/PERF_NOTES.md "Mesh-mode quality rows", data=2,gauss=4 vs single,
2k iters) show NO quality loss: ADC 28.21 vs 26.80 single, MCMC 22.66 vs
22.31 single — the mesh arms train slightly BETTER because camera-batch DP
averages d views per step (lower gradient variance at equal iterations).
MCMC relocation/growth uses GLOBALLY-faithful sampling and granting
(parallel/dist_mcmc.py). Event statistics are psum'd over "gauss" for
logging.

Gradient normalization: the raw shard_map gradient is d(sum of ALL device
losses)/d(local shard). The render loss is replicated within each gauss group
(assembled from the same all_gathered color tiles), so raw grads carry a
factor g; pmean over "data" then averages the d camera views. The probe
(screen-xy) gradient for ADC is scaled by 1/g only — per-view accumulation
semantics — and the accumulator deltas are psum'd over "data" so all data
rows hold identical ADC state.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpugs.ops.projection import project_gaussians
from tpugs.ops.rasterize_tiled import RasterConfig
from tpugs.optim.adam import AdamState, adam_step, zero_slots
from tpugs.optim.densify_adc import ADCState, adc_densify
from tpugs.optim.densify_mcmc import inject_noise
from tpugs.parallel.tile_shard import (
    assemble_image,
    exchange_and_render_local,
    local_raster_config,
)
from tpugs.train.loss import combined_loss


def parse_mesh_spec(spec: str, n_devices: Optional[int] = None) -> Mesh:
    """Build a mesh from a CLI spec like "data=2,gauss=4".

    Axis product must equal the device count; a single missing axis size may
    be given as -1 to infer it."""
    from tpugs.parallel.mesh import make_mesh

    sizes = {"data": 1, "gauss": 1}
    for part in spec.split(","):
        if not part.strip():
            continue
        name, _, val = part.partition("=")
        name = name.strip()
        if name not in sizes:
            raise ValueError(f"unknown mesh axis {name!r} (use data/gauss)")
        sizes[name] = int(val)
    n = n_devices if n_devices is not None else len(jax.devices())
    inferred = [k for k, v in sizes.items() if v == -1]
    if len(inferred) > 1:
        raise ValueError(
            f"mesh spec {spec!r}: at most one axis may be -1 (inferred)"
        )
    if inferred:
        other = [v for k, v in sizes.items() if k != inferred[0]][0]
        if other <= 0 or n % other:
            raise ValueError(
                f"mesh spec {spec!r}: cannot infer {inferred[0]}=-1 — "
                f"{n} devices not divisible by {other}"
            )
        sizes[inferred[0]] = n // other
    if sizes["data"] * sizes["gauss"] != n:
        raise ValueError(
            f"mesh spec {spec!r}: axis product "
            f"{sizes['data']}*{sizes['gauss']} != {n} devices"
        )
    return make_mesh(axis_sizes=(sizes["data"], sizes["gauss"]))


def measure_max_send_count(mesh: Mesh, raster: RasterConfig, params: dict,
                           alive, viewmats, intrinsics) -> int:
    """Measure the worst per-destination exchange send count over sample
    views (host-side, at Trainer init): the auto-tune source for
    TrainConfig.dist_send_capacity. Counts only — no exchange, no binning;
    cost is one projection per sample view."""
    from tpugs.parallel.tile_shard import destination_range

    g = mesh.shape["gauss"]

    def one(means, quats, log_scales, opac, sh, alive_l, viewmat, intr):
        proj = project_gaussians(
            means, quats, log_scales, opac, sh, alive_l,
            viewmat, intr, raster.img_w, raster.img_h, 0,
        )
        d0, d1 = destination_range(proj, raster, g)
        dst = jnp.arange(g, dtype=jnp.int32)[:, None]
        counts = jnp.sum(
            (d0[None, :] <= dst) & (dst <= d1[None, :]), axis=1
        )
        return jax.lax.pmax(jnp.max(counts), ("data", "gauss"))

    gs = P("gauss")
    mapped = jax.jit(jax.shard_map(
        one, mesh=mesh,
        in_specs=(gs, gs, gs, gs, gs, gs, P(), P()),
        out_specs=P(),
        check_vma=False,
    ))
    worst = 0
    for vm, intr in zip(viewmats, intrinsics):
        worst = max(worst, int(mapped(
            params["means"], params["quats"], params["log_scales"],
            params["opacity_logits"], params["sh"], alive,
            jnp.asarray(vm, jnp.float32), jnp.asarray(intr, jnp.float32),
        )))
    return worst


def _state_specs(state_cls):
    """PartitionSpec pytree for TrainState: gaussian-sharded leaves over
    "gauss", scalars replicated."""
    gs = P("gauss")
    pspec = {"means": gs, "quats": gs, "log_scales": gs,
             "opacity_logits": gs, "sh": gs}
    return state_cls(
        params=pspec,
        alive=gs,
        adam=AdamState(m=pspec, v=pspec, count=P()),
        adc=ADCState(grad_accum=gs, grad_count=gs, max_radii=gs),
        key=P(),
    )


def shard_train_state(mesh: Mesh, state):
    """Device-put a TrainState with the distributed layout."""
    specs = _state_specs(type(state))
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), state, specs
    )


def make_dist_multi_step(cfg, raster: RasterConfig, mesh: Mesh,
                         scene_extent: float, compositor: str = "auto",
                         send_capacity: Optional[int] = None):
    """Sharded equivalent of trainer.make_train_multi_step: K steps inside one
    jitted lax.scan, state sharded per the module docstring.

    multi_step(state, images [V_pad,H,W,3] sharded over data,
               viewmats [V_pad,4,4], intrinsics [V_pad,4],
               view_idx [K, d] LOCAL view indices per data row, step0,
               sh_degree) -> (state, losses [K], last-step stats dict)

    send_capacity: exchange slots per (src, dst) pair; defaults to
    cfg.dist_send_capacity when set, else the safe N/gauss bound.
    """
    from tpugs.train.trainer import StepStats, TrainState

    if send_capacity is None and getattr(cfg, "dist_send_capacity", 0) > 0:
        send_capacity = cfg.dist_send_capacity

    if compositor == "auto":
        compositor = "pallas" if jax.default_backend() == "tpu" else "scan"
    d = mesh.shape["data"]
    g = mesh.shape["gauss"]
    from tpugs.parallel.tile_shard import default_local_pair_capacity

    local_pair_capacity = default_local_pair_capacity(raster.pair_capacity, g)
    local_cfg = local_raster_config(raster, g, local_pair_capacity)
    mcmc_mode = cfg.densify_mode == "mcmc"
    adc_mode = cfg.densify_mode == "adc"

    def one_step(state: TrainState, image, viewmat, intrinsics, step,
                 sh_degree: int):
        gauss_idx = jax.lax.axis_index("gauss")
        key, bg_key, noise_key = jax.random.split(state.key, 3)
        if cfg.random_background:
            background = jax.random.uniform(bg_key, (3,))
        else:
            background = jnp.zeros((3,))

        n_loc = state.alive.shape[0]
        cap = send_capacity if send_capacity is not None else n_loc
        probe = jnp.zeros((n_loc, 2))
        grad_scale = jnp.asarray([raster.img_w * 0.5, raster.img_h * 0.5])

        def loss_fn(params, probe):
            proj = project_gaussians(
                params["means"], params["quats"], params["log_scales"],
                params["opacity_logits"], params["sh"], state.alive,
                viewmat, intrinsics, raster.img_w, raster.img_h, sh_degree,
            )
            proj = dataclasses.replace(proj, means2d=proj.means2d + probe)
            color_t, _, _, diag = exchange_and_render_local(
                proj, raster, local_cfg, g, cap, background, compositor
            )
            color = assemble_image(raster, g, color_t)
            loss = combined_loss(color, image, cfg.lambda_ssim)
            l1 = jnp.mean(jnp.abs(color - image))
            if mcmc_mode:
                # Regularization means must be GLOBAL (psum'd over shards) so
                # the loss stays replicated within the gauss group — the
                # gradient-normalization factor g assumes replication.
                loss = loss + _sharded_regularization(
                    cfg.mcmc, params, state.alive
                )
            return loss, (diag, proj.radii, l1)

        (loss, (diag, radii, l1)), (grads, d_probe) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, probe)

        # Normalize raw shard_map grads (see module docstring).
        grads = jax.tree.map(lambda t: jax.lax.pmean(t, "data") / g, grads)
        loss = jax.lax.pmean(loss, "data")

        new_params, new_adam = adam_step(
            cfg.adam, state.adam, state.params, grads, step
        )

        adc = state.adc
        if adc_mode:
            # d_probe/g is THIS data row's per-view pixel gradient; accumulate
            # all d views of the step (psum over "data"), matching d
            # single-device accumulation events.
            norms = jnp.linalg.norm((d_probe / g) * grad_scale, axis=-1)
            visible = radii > 0
            norm_add = jax.lax.psum(
                jnp.where(visible, norms, 0.0), "data"
            )
            count_add = jax.lax.psum(visible.astype(jnp.float32), "data")
            radii_max = jax.lax.pmax(radii.astype(jnp.float32), "data")
            adc = ADCState(
                grad_accum=adc.grad_accum + norm_add,
                grad_count=adc.grad_count + count_add,
                max_radii=jnp.maximum(adc.max_radii, radii_max),
            )
        if mcmc_mode:
            shard_key = jax.random.fold_in(noise_key, gauss_idx)
            new_params = inject_noise(
                cfg.mcmc, new_params, state.alive, step, shard_key
            )

        # Diagnostics vary over BOTH axes (different views per data row,
        # different tile slices per gauss shard) — reduce over both so the
        # P() out-spec holds: totals summed over shards, worst view reported.
        max_hits = jax.lax.pmax(diag["max_tile_hits"], ("data", "gauss"))
        overflow = jax.lax.psum(
            diag["pair_overflow"].astype(jnp.int32), ("data", "gauss")
        ) > 0
        send_of = jax.lax.psum(
            diag["send_overflow"].astype(jnp.int32), ("data", "gauss")
        ) > 0
        stats = StepStats(
            loss=loss,
            l1=jax.lax.pmean(l1, "data"),
            num_pairs=jax.lax.pmax(
                jax.lax.psum(diag["num_pairs"], "gauss"), "data"
            ),
            pair_overflow=overflow,
            max_tile_hits=max_hits,
            # Compare against the RASTER capacity (what clamp_tile_segments
            # actually truncates at), NOT cfg.max_hits_per_tile: the Trainer's
            # grow policy enlarges raster.max_hits_per_tile and rebuilds this
            # step while TrainConfig keeps its static default — comparing
            # against the stale config raised a false "work dropped" overflow
            # every block after the first hit-capacity growth (observed on the
            # mesh-ADC quality run: busiest tile 2740/3456 flagged vs the
            # original 2048).
            hit_overflow=max_hits > raster.max_hits_per_tile,
            # Worst per-device local pair count / exchange send count: the
            # grow policy must size from these, not the global sum — a single
            # overloaded tile slice can overflow while global pairs still fit
            # (Trainer._handle_overflow).
            max_local_pairs=jax.lax.pmax(diag["num_pairs"], ("data", "gauss")),
            send_overflow=send_of,
            max_send_count=jax.lax.pmax(
                diag["max_send_count"], ("data", "gauss")
            ),
        )
        new_state = TrainState(
            params=new_params, alive=state.alive, adam=new_adam, adc=adc,
            key=key,
        )
        return new_state, stats

    def multi_step(sh_degree: int):
        def run(state, images, viewmats, intrinsics, view_idx, step0):
            def body(state, inp):
                vi, step = inp
                v = vi[0]
                state, stats = one_step(
                    state, images[v], viewmats[v], intrinsics[v], step,
                    sh_degree,
                )
                return state, stats

            steps = step0 + jnp.arange(view_idx.shape[0], dtype=jnp.float32)
            state, stats = jax.lax.scan(body, state, (view_idx, steps))
            last = jax.tree.map(lambda x: x[-1], stats)
            return state, stats.loss, last

        return run

    specs = _state_specs(TrainState)
    stats_spec = StepStats(loss=P(), l1=P(), num_pairs=P(), pair_overflow=P(),
                           max_tile_hits=P(), hit_overflow=P(),
                           max_local_pairs=P(), send_overflow=P(),
                           max_send_count=P())

    @functools.partial(jax.jit, static_argnums=(6,), donate_argnums=(0,))
    def stepper(state, images, viewmats, intrinsics, view_idx, step0,
                sh_degree):
        mapped = jax.shard_map(
            multi_step(sh_degree),
            mesh=mesh,
            in_specs=(specs, P("data"), P("data"), P("data"),
                      P(None, "data"), P()),
            out_specs=(specs, P(), stats_spec),
            check_vma=False,
        )
        return mapped(state, images, viewmats, intrinsics, view_idx, step0)

    return stepper


def _sharded_regularization(mcmc_cfg, params, alive):
    """MCMC opacity/scale regularization with GLOBAL means: per-shard sums
    psum'd over "gauss" so every device computes the identical value."""
    opac = jnp.where(alive, jax.nn.sigmoid(params["opacity_logits"]), 0.0)
    scales = jnp.where(alive[:, None], jnp.exp(params["log_scales"]), 0.0)
    n = jax.lax.psum(jnp.sum(alive.astype(jnp.float32)), "gauss")
    n = jnp.maximum(n, 1.0)
    s_op = jax.lax.psum(jnp.sum(opac), "gauss")
    s_sc = jax.lax.psum(jnp.sum(scales), "gauss")
    return mcmc_cfg.lambda_opacity * s_op / n + mcmc_cfg.lambda_scale * s_sc / (3.0 * n)


def make_dist_densify_step(cfg, mesh: Mesh, scene_extent: float):
    """ADC densify event under sharding: shard-local clone/split/prune (each
    shard manages its own slot range and free list); stats psum'd for logs."""
    from tpugs.train.trainer import TrainState

    def densify(size_pruning_active: bool):
        def run(state: TrainState):
            gauss_idx = jax.lax.axis_index("gauss")
            key, dkey = jax.random.split(state.key)
            dkey = jax.random.fold_in(dkey, gauss_idx)
            params, alive, changed, adc, stats = adc_densify(
                cfg.adc, state.params, state.alive, state.adc, dkey,
                scene_extent, size_pruning_active,
            )
            adam = zero_slots(state.adam, changed)
            stats = {k: jax.lax.psum(v, "gauss") for k, v in stats.items()}
            return (
                TrainState(params=params, alive=alive, adam=adam, adc=adc,
                           key=key),
                stats,
            )

        return run

    specs = _state_specs(TrainState)

    @functools.partial(jax.jit, static_argnames=("size_pruning_active",))
    def step(state, size_pruning_active):
        mapped = jax.shard_map(
            densify(size_pruning_active), mesh=mesh,
            in_specs=(specs,), out_specs=(specs, P()),
            check_vma=False,
        )
        return mapped(state)

    return step


def make_dist_relocate_step(cfg, mesh: Mesh, scene_extent: float):
    """MCMC relocate/grow event under sharding, with GLOBALLY-faithful
    source sampling (parallel/dist_mcmc.py: shard choice ~ psum'd opacity
    masses, then within-shard categorical — exactly the opacity-weighted
    global multinomial the single-device path samples)."""
    from tpugs.parallel.dist_mcmc import dist_grow, dist_relocate
    from tpugs.train.trainer import TrainState

    g = mesh.shape["gauss"]

    def reloc(state: TrainState):
        key, rkey, gkey = jax.random.split(state.key, 3)
        params, changed, stats = dist_relocate(
            cfg.mcmc, state.params, state.alive, rkey, scene_extent, g
        )
        alive = state.alive
        if cfg.mcmc.grow_factor > 0:
            params, alive, grown, n_new = dist_grow(
                cfg.mcmc, params, alive, gkey, scene_extent, g
            )
            changed = changed | grown
            stats = dict(stats, num_added=n_new)
        adam = zero_slots(state.adam, changed)
        stats = {k: jax.lax.psum(v, "gauss") for k, v in stats.items()}
        return (
            TrainState(params=params, alive=alive, adam=adam,
                       adc=state.adc, key=key),
            stats,
        )

    specs = _state_specs(TrainState)
    mapped = jax.shard_map(
        reloc, mesh=mesh,
        in_specs=(specs,),
        out_specs=(specs, P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_dist_reset_opacity_step(mesh: Mesh):
    from tpugs.train.trainer import TrainState, _reset_opacity_impl

    specs = _state_specs(TrainState)
    mapped = jax.shard_map(
        _reset_opacity_impl, mesh=mesh,
        in_specs=(specs,), out_specs=specs,
        check_vma=False,
    )
    return jax.jit(mapped)
