"""Training loop — one jitted, shape-stable train step.

TPU re-design of reference src/training/trainer.cpp:52-375. The reference's
per-iteration host work (disk image load, H2D copy, >=3 .item() syncs, §3.1 of
SURVEY.md) is eliminated: the image bank is resident on device, the step index
is a device scalar, and everything from render to Adam update is a single
jitted function. Densification events run as separately-jitted shape-stable
updates on their schedule.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tpugs.core.gaussians import GaussianState
from tpugs.core.init import init_from_sfm
from tpugs.data.dataset import Dataset
from tpugs.io.ply import write_gaussian_ply
from tpugs.ops.render import RasterConfig, render
from tpugs.optim.adam import AdamConfig, AdamState, adam_init, adam_step, zero_slots
from tpugs.optim.densify_adc import (
    ADCConfig,
    ADCState,
    adc_accumulate,
    adc_densify,
    adc_init,
    reset_opacity,
)
from tpugs.optim.densify_mcmc import MCMCConfig, inject_noise, regularization, relocate
from tpugs.optim.lr_schedule import active_sh_degree_for_step
from tpugs.train.loss import combined_loss


@dataclasses.dataclass
class TrainConfig:
    """All knobs (reference: trainer.hpp:38-75)."""

    iterations: int = 30000
    resolution_scale: int = 1
    sh_degree: int = 3
    lambda_ssim: float = 0.2
    save_every: int = 7000
    log_every: int = 100
    eval_every: int = 0  # 0 = only at end
    capacity: int = 1 << 17  # fixed Gaussian capacity (replaces max_gaussians)
    random_background: bool = False
    seed: int = 42
    densify_mode: str = "adc"  # "adc" | "mcmc" | "none"
    adam: AdamConfig = dataclasses.field(default_factory=AdamConfig)
    adc: ADCConfig = dataclasses.field(default_factory=ADCConfig)
    mcmc: MCMCConfig = dataclasses.field(default_factory=MCMCConfig)
    # Rasterizer geometry
    tile_h: int = 32
    tile_w: int = 32
    pair_capacity: int = 1 << 21
    max_hits_per_tile: int = 2048
    output_dir: str = "output"
    # Steps executed inside one jitted lax.scan per host call (amortizes
    # dispatch; must divide the active schedule periods — auto-clamped).
    steps_per_call: int = 25
    # When True, pair_capacity is auto-sized from the initial scene: every
    # pair-list op costs ~10 ms per 2^20 capacity (docs/PERF_NOTES.md), so a
    # right-sized capacity is a first-order perf knob. Densification growth is
    # covered by the headroom factor; overflow is reported in the train log.
    auto_pair_capacity: bool = True
    pair_capacity_headroom: float = 8.0
    # Device-mesh spec for distributed training, e.g. "data=2,gauss=4"
    # (parallel/dist_train.py): Gaussian state + tile grid sharded over
    # "gauss", view bank over "data". Empty = single device.
    mesh: str = ""
    # Tile-shard exchange slots per (src, dst) device pair. -1 (default) =
    # auto-tune at init: measure the worst per-destination send count over
    # sample views and size 1.3x that (~2x less all_to_all volume than the
    # safe bound on the bench scene; send_overflow auto-grows it if
    # densification later exceeds the measurement). 0 = the safe N/gauss
    # bound (never overflows, ~57% padding measured); >0 = explicit.
    dist_send_capacity: int = -1
    # Runtime HBM watchdog (utils.memory.MemoryWatchdog): checked on the
    # logging cadence; sustained over-limit readings checkpoint + abort
    # gracefully (reference: trainer.cpp:343-373). 0 = auto limit from the
    # device's reported HBM.
    hbm_watchdog: bool = True
    hbm_limit_mb: float = 0.0
    # Capacity-overflow policy. The pair list and per-tile hit count K are
    # fixed at jit time; when a frame exceeds them pairs are dropped
    # (front-most-K truncation, binning.clamp_tile_segments). "grow" = re-jit
    # with enlarged capacities and continue (default; the TPU analogue of the
    # reference's exact realloc, sorting.cu:145-160); "error" = checkpoint
    # and raise; "warn" = log and keep truncating.
    on_overflow: str = "grow"


def train_config_from_dict(d: dict) -> TrainConfig:
    """Build a TrainConfig from a (possibly partial) JSON-style dict. The
    nested "adam"/"adc"/"mcmc" sections map to their config dataclasses;
    unknown keys raise (typo protection). SURVEY.md §5.6: the reference's
    flag system is argparse-only; this adds the config-file layer."""
    d = dict(d)
    kwargs = {}
    nested = {"adam": AdamConfig, "adc": ADCConfig, "mcmc": MCMCConfig}
    for name, cls in nested.items():
        if name in d:
            sub = d.pop(name)
            fields = {f.name for f in dataclasses.fields(cls)}
            unknown = sorted(set(sub) - fields)
            if unknown:
                raise ValueError(
                    f"config section {name!r}: unknown keys {unknown}"
                )
            kwargs[name] = cls(**sub)
    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    unknown = sorted(set(d) - fields)
    if unknown:
        raise ValueError(f"config: unknown keys {unknown}")
    return TrainConfig(**d, **kwargs)


def load_train_config(path: str) -> TrainConfig:
    """Load a TrainConfig from a JSON file (see train_config_from_dict)."""
    import json

    with open(path) as f:
        return train_config_from_dict(json.load(f))


@struct.dataclass
class TrainState:
    params: dict
    alive: jnp.ndarray
    adam: AdamState
    adc: ADCState
    key: jax.Array


@struct.dataclass
class StepStats:
    loss: jnp.ndarray
    l1: jnp.ndarray
    num_pairs: jnp.ndarray
    pair_overflow: jnp.ndarray
    max_tile_hits: jnp.ndarray
    hit_overflow: jnp.ndarray
    # Mesh-mode extras (single-device: max_local_pairs == num_pairs, no
    # exchange): worst per-device pair count and tile-shard exchange
    # diagnostics — the grow policy sizes from the worst DEVICE, not the
    # global sum (parallel/dist_train.py).
    max_local_pairs: jnp.ndarray
    send_overflow: jnp.ndarray
    max_send_count: jnp.ndarray


def _single_device_stats(loss, l1, out) -> "StepStats":
    return StepStats(
        loss=loss, l1=l1, num_pairs=out.num_pairs,
        pair_overflow=out.pair_overflow,
        max_tile_hits=out.max_tile_hits, hit_overflow=out.hit_overflow,
        max_local_pairs=out.num_pairs,
        send_overflow=jnp.zeros((), bool),
        max_send_count=jnp.zeros((), jnp.int32),
    )


def make_train_step(cfg: TrainConfig, raster: RasterConfig, scene_extent: float):
    """Build the jitted train step. Static across steps except sh_degree
    (4 compiled variants over the run)."""

    mcmc_mode = cfg.densify_mode == "mcmc"
    adc_mode = cfg.densify_mode == "adc"

    def train_step(state: TrainState, image, viewmat, intrinsics, step, sh_degree: int):
        key, bg_key, noise_key = jax.random.split(state.key, 3)
        if cfg.random_background:
            background = jax.random.uniform(bg_key, (3,))
        else:
            background = jnp.zeros((3,))

        nc = state.alive.shape[0]
        probe = jnp.zeros((nc, 2))
        grad_scale = jnp.asarray([raster.img_w * 0.5, raster.img_h * 0.5])

        def loss_fn(params, probe):
            out = render(
                params["means"], params["quats"], params["log_scales"],
                params["opacity_logits"], params["sh"], state.alive,
                viewmat, intrinsics, raster, sh_degree, background,
                means2d_probe=probe,
            )
            loss = combined_loss(out.color, image, cfg.lambda_ssim)
            if mcmc_mode:
                loss = loss + regularization(cfg.mcmc, params, state.alive)
            return loss, out

        (loss, out), (grads, d_means2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, probe)

        new_params, new_adam = adam_step(cfg.adam, state.adam, state.params, grads, step)

        adc = state.adc
        if adc_mode:
            # NDC-unit gradient accumulation: the 2e-4 densify
            # threshold is calibrated for viewspace gradients, a
            # (W/2, H/2) factor above pixel-space (see adc_accumulate).
            adc = adc_accumulate(adc, d_means2d, out.radii, grad_scale)
        if mcmc_mode:
            new_params = inject_noise(cfg.mcmc, new_params, state.alive, step, noise_key)

        l1 = jnp.mean(jnp.abs(out.color - image))
        stats = _single_device_stats(loss, l1, out)
        new_state = TrainState(
            params=new_params, alive=state.alive, adam=new_adam, adc=adc, key=key
        )
        return new_state, stats

    return jax.jit(train_step, static_argnames=("sh_degree",), donate_argnums=(0,))


def make_train_multi_step(cfg: TrainConfig, raster: RasterConfig, scene_extent: float):
    """K train steps inside one jitted lax.scan — one dispatch per K steps.

    multi_step(state, image_bank [V,H,W,3], viewmats [V,4,4], intrinsics [V,4],
               view_idx [K] int32, step0, sh_degree) -> (state, losses [K],
               last StepStats)
    """
    mcmc_mode = cfg.densify_mode == "mcmc"
    adc_mode = cfg.densify_mode == "adc"

    def one_step(state: TrainState, image, viewmat, intrinsics, step, sh_degree):
        key, bg_key, noise_key = jax.random.split(state.key, 3)
        if cfg.random_background:
            background = jax.random.uniform(bg_key, (3,))
        else:
            background = jnp.zeros((3,))
        nc = state.alive.shape[0]
        probe = jnp.zeros((nc, 2))
        grad_scale = jnp.asarray([raster.img_w * 0.5, raster.img_h * 0.5])

        def loss_fn(params, probe):
            out = render(
                params["means"], params["quats"], params["log_scales"],
                params["opacity_logits"], params["sh"], state.alive,
                viewmat, intrinsics, raster, sh_degree, background,
                means2d_probe=probe,
            )
            loss = combined_loss(out.color, image, cfg.lambda_ssim)
            if mcmc_mode:
                loss = loss + regularization(cfg.mcmc, params, state.alive)
            return loss, out

        (loss, out), (grads, d_means2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, probe)
        new_params, new_adam = adam_step(cfg.adam, state.adam, state.params, grads, step)
        adc = state.adc
        if adc_mode:
            # NDC-unit gradient accumulation: the 2e-4 densify
            # threshold is calibrated for viewspace gradients, a
            # (W/2, H/2) factor above pixel-space (see adc_accumulate).
            adc = adc_accumulate(adc, d_means2d, out.radii, grad_scale)
        if mcmc_mode:
            new_params = inject_noise(cfg.mcmc, new_params, state.alive, step, noise_key)
        l1 = jnp.mean(jnp.abs(out.color - image))
        stats = _single_device_stats(loss, l1, out)
        return (
            TrainState(params=new_params, alive=state.alive, adam=new_adam,
                       adc=adc, key=key),
            stats,
        )

    def multi_step(state, images, viewmats, intrinsics, view_idx, step0,
                   sh_degree: int):
        def body(state, inp):
            vi, step = inp
            state, stats = one_step(
                state, images[vi], viewmats[vi], intrinsics[vi], step, sh_degree
            )
            return state, stats

        steps = step0 + jnp.arange(view_idx.shape[0], dtype=jnp.float32)
        state, stats = jax.lax.scan(body, state, (view_idx, steps))
        last = jax.tree.map(lambda x: x[-1], stats)
        return state, stats.loss, last

    return jax.jit(multi_step, static_argnames=("sh_degree",), donate_argnums=(0,))


def make_densify_step(cfg: TrainConfig, scene_extent: float):
    def densify(state: TrainState, size_pruning_active: bool):
        key, dkey = jax.random.split(state.key)
        params, alive, changed, adc, stats = adc_densify(
            cfg.adc, state.params, state.alive, state.adc, dkey,
            scene_extent, size_pruning_active,
        )
        adam = zero_slots(state.adam, changed)
        return (
            TrainState(params=params, alive=alive, adam=adam, adc=adc, key=key),
            stats,
        )

    return jax.jit(densify, static_argnames=("size_pruning_active",))


def make_relocate_step(cfg: TrainConfig, scene_extent: float):
    def reloc(state: TrainState):
        key, rkey, gkey = jax.random.split(state.key, 3)
        params, changed, stats = relocate(
            cfg.mcmc, state.params, state.alive, rkey, scene_extent
        )
        alive = state.alive
        if cfg.mcmc.grow_factor > 0:
            from tpugs.optim.densify_mcmc import grow

            params, alive, grown, n_new = grow(
                cfg.mcmc, params, alive, gkey, scene_extent
            )
            changed = changed | grown
            stats = dict(stats, num_added=n_new)
        adam = zero_slots(state.adam, changed)
        return (
            TrainState(params=params, alive=alive, adam=adam,
                       adc=state.adc, key=key),
            stats,
        )

    return jax.jit(reloc)


def _reset_opacity_impl(state: TrainState):
    params = reset_opacity(state.params)
    # Zero only the opacity moments (fresh logits shouldn't inherit momentum).
    adam = state.adam
    new_m = dict(adam.m)
    new_v = dict(adam.v)
    new_m["opacity_logits"] = jnp.zeros_like(adam.m["opacity_logits"])
    new_v["opacity_logits"] = jnp.zeros_like(adam.v["opacity_logits"])
    adam = AdamState(m=new_m, v=new_v, count=adam.count)
    return TrainState(params=params, alive=state.alive, adam=adam,
                      adc=state.adc, key=state.key)


_reset_opacity_step = jax.jit(_reset_opacity_impl)


class Trainer:
    """Orchestrates dataset loading, the jitted step, densification schedule,
    logging, and checkpoints (reference: Trainer, trainer.cpp:52-375)."""

    def __init__(self, data_dir: str, config: TrainConfig = TrainConfig(),
                 log_fn=print, resume_from: Optional[str] = None):
        # MCMC noise must track the optimizer's actual position LR schedule
        # (noise = noise_lr * xyz_lr(t) * ...); sync it so a customized
        # AdamConfig.position_lr can't silently drift from the noise schedule.
        if config.mcmc.position_lr != config.adam.position_lr:
            log_fn(
                "WARNING: MCMCConfig.position_lr differs from "
                "AdamConfig.position_lr; overriding the MCMC noise schedule "
                "with the optimizer's (noise must track the actual xyz LR). "
                "Customize AdamConfig.position_lr to change both."
            )
            config = dataclasses.replace(
                config,
                mcmc=dataclasses.replace(
                    config.mcmc, position_lr=config.adam.position_lr
                ),
            )
        self.cfg = config
        # Multi-host discipline: exactly one process (0) writes artifacts and
        # logs; the others run the same device program silently. Single
        # process => primary, so tests and local runs are unchanged.
        self._primary = jax.process_index() == 0
        self.log = log_fn if self._primary else (lambda *a, **k: None)
        self.start_step = 0
        self.dataset = Dataset(data_dir, config.resolution_scale)
        if self.dataset.num_train() == 0:
            raise ValueError("no training cameras")
        self.scene_extent = self.dataset.scene_bounds.extent

        cam0 = self.dataset.train_cameras[0]

        self.mesh = None
        if config.mesh:
            from tpugs.parallel.dist_train import parse_mesh_spec

            self.mesh = parse_mesh_spec(config.mesh)
            self.log(
                f"mesh: data={self.mesh.shape['data']} "
                f"gauss={self.mesh.shape['gauss']} "
                f"({len(self.mesh.devices.ravel())} devices)"
            )

        n_points = self.dataset.points_xyz.shape[0]
        capacity = max(config.capacity, 1 << int(np.ceil(np.log2(max(n_points, 1)))))
        if self.mesh is not None:
            g = self.mesh.shape["gauss"]
            capacity = -(-capacity // g) * g  # divisible by the gauss axis
        gs = init_from_sfm(
            self.dataset.points_xyz, self.dataset.points_rgb,
            capacity=capacity, max_sh_degree=config.sh_degree,
        )
        if self.mesh is not None and self.mesh.shape["gauss"] > 1:
            # Interleave initial slots across the gauss shards. init packs
            # the N0 alive gaussians into slots [0, N0) — contiguous
            # sharding then gives shard 0 a FULL slot range (no free slots:
            # cannot clone/split) and the tail shards ZERO alive gaussians
            # (nothing to clone from, ever — ADC free lists are
            # shard-local). Measured on the r4 mesh-mode quality row: the
            # packed layout lost 2.5 dB with N collapsing to one shard's
            # capacity. old slot i -> shard i%g, local slot i//g (a
            # transpose), so every shard starts with ~N0/g alive and an
            # equal free list.
            g = self.mesh.shape["gauss"]
            interleave = lambda a: jnp.swapaxes(
                a.reshape((capacity // g, g) + a.shape[1:]), 0, 1
            ).reshape(a.shape)
            gs = GaussianState(
                means=interleave(gs.means), quats=interleave(gs.quats),
                log_scales=interleave(gs.log_scales),
                opacity_logits=interleave(gs.opacity_logits),
                sh=interleave(gs.sh), alive=interleave(gs.alive),
            )

        pair_capacity = config.pair_capacity
        if config.auto_pair_capacity:
            pair_capacity = self._auto_pair_capacity(gs, cam0, config)
        self.raster = RasterConfig(
            img_h=cam0.height, img_w=cam0.width,
            tile_h=config.tile_h, tile_w=config.tile_w,
            pair_capacity=pair_capacity,
            max_hits_per_tile=config.max_hits_per_tile,
        )
        # Configuration-time HBM budget gate (the TPU analogue of the
        # reference's per-iteration VRAM safety system, trainer.cpp:343-373 —
        # with fixed-capacity state the check moves to construction).
        from tpugs.utils.memory import check_memory_budget

        est = check_memory_budget(
            capacity, (config.sh_degree + 1) ** 2, pair_capacity,
            cam0.height, cam0.width, self.dataset.num_train(),
        )
        self.log(f"memory budget: {est}")
        # Runtime monitor on top of the config-time lower-bound estimate
        # (autodiff residuals / SSIM buffers / compiler transients are not in
        # the estimate).
        self.watchdog = None
        if config.hbm_watchdog:
            from tpugs.utils.memory import MemoryWatchdog

            self.watchdog = MemoryWatchdog(
                limit_mb=config.hbm_limit_mb, log=self.log
            )

        params = gs.params()
        self.state = TrainState(
            params=params,
            alive=gs.alive,
            adam=adam_init(params),
            adc=adc_init(capacity),
            key=jax.random.PRNGKey(config.seed),
        )

        if resume_from is not None:
            from tpugs.io.checkpoint import load_train_checkpoint

            self.state, self.start_step = load_train_checkpoint(resume_from)
            self.log(f"resumed from {resume_from} at step {self.start_step}")

        if self.mesh is None:
            self._densify = make_densify_step(config, self.scene_extent)
            self._relocate = make_relocate_step(config, self.scene_extent)
            self._reset_opacity = _reset_opacity_step
        else:
            from tpugs.parallel.dist_train import (
                make_dist_densify_step,
                make_dist_relocate_step,
                make_dist_reset_opacity_step,
                shard_train_state,
            )

            self._densify = make_dist_densify_step(
                config, self.mesh, self.scene_extent
            )
            self._relocate = make_dist_relocate_step(
                config, self.mesh, self.scene_extent
            )
            self._reset_opacity = make_dist_reset_opacity_step(self.mesh)
            self.state = shard_train_state(self.mesh, self.state)
            if self.cfg.dist_send_capacity < 0:
                self._auto_send_capacity()
        self._build_render_steps()

        # Device-resident image bank: [V, H, W, 3]. Uniform camera resolution
        # is required (the common COLMAP case); mixed-size scenes should use
        # resolution_scale to normalize.
        sizes = {(c.height, c.width) for c in self.dataset.train_cameras}
        if len(sizes) != 1:
            raise ValueError(f"mixed camera resolutions unsupported: {sizes}")
        self._images = None  # lazy
        viewmats = np.stack([c.world_to_camera() for c in self.dataset.train_cameras])
        intrinsics = np.stack([c.intrinsics_array() for c in self.dataset.train_cameras])
        if self.mesh is not None:
            # Re-order + pad the view bank so each data row holds a
            # contiguous block of views_per_row views (wrap-around padding);
            # sampling draws a uniform LOCAL index per row.
            d = self.mesh.shape["data"]
            v = len(self.dataset.train_cameras)
            self._views_per_row = -(-v // d)
            order = np.asarray(
                [(r * self._views_per_row + j) % v
                 for r in range(d) for j in range(self._views_per_row)]
            )
            self._view_order = order
            viewmats = viewmats[order]
            intrinsics = intrinsics[order]
            from jax.sharding import NamedSharding, PartitionSpec as P

            dsh = NamedSharding(self.mesh, P("data"))
            self._viewmats = jax.device_put(jnp.asarray(viewmats, jnp.float32), dsh)
            self._intrinsics = jax.device_put(jnp.asarray(intrinsics, jnp.float32), dsh)
        else:
            self._viewmats = jnp.asarray(viewmats, jnp.float32)
            self._intrinsics = jnp.asarray(intrinsics, jnp.float32)
        self._rng = np.random.default_rng(config.seed)

    def _build_render_steps(self):
        """(Re)build the raster-geometry-dependent jitted steps — called at
        construction and again by _handle_overflow after growing capacities."""
        if self.mesh is None:
            self._train_step = make_train_step(
                self.cfg, self.raster, self.scene_extent
            )
            self._multi_step = make_train_multi_step(
                self.cfg, self.raster, self.scene_extent
            )
        else:
            from tpugs.parallel.dist_train import make_dist_multi_step

            self._multi_step = make_dist_multi_step(
                self.cfg, self.raster, self.mesh, self.scene_extent
            )

    def _handle_overflow(self, stats: StepStats, step: int):
        """Capacity-overflow policy (TrainConfig.on_overflow). The reference
        can never drop work — its pair list is exactly sized per frame
        (reference: sorting.cu:145-160); the fixed-capacity TPU design drops
        back-most pairs on overflow, so it must be loud and recoverable."""
        cfg = self.cfg
        msg = (
            f"[{step}] OVERFLOW: pairs {int(stats.num_pairs)}"
            f"/{self.raster.pair_capacity}, busiest tile "
            f"{int(stats.max_tile_hits)}/{self.raster.max_hits_per_tile}"
        )
        if self.mesh is not None:
            msg += (
                f", worst device pairs {int(stats.max_local_pairs)}, "
                f"exchange sends {int(stats.max_send_count)}"
                f"/{self._effective_send_capacity()}"
            )
        msg += " (work dropped this block)"
        if cfg.on_overflow == "warn":
            self.log(msg)
            return
        if cfg.on_overflow == "error":
            self.log(msg)
            self.save_checkpoint(step)
            raise RuntimeError(msg + " — on_overflow='error', checkpoint saved")
        # "grow": re-jit with enlarged capacities and continue.
        new_pairs = self.raster.pair_capacity
        new_hits = self.raster.max_hits_per_tile
        new_send = cfg.dist_send_capacity
        if bool(stats.pair_overflow):
            if self.mesh is None:
                target = int(1.3 * int(stats.num_pairs))
            else:
                # In mesh mode overflow is raised against the PER-DEVICE
                # local list (ceil(pair_capacity/g) * headroom); size the
                # global capacity so the derived local one covers the worst
                # slice — the global sum can fit while one slice overflows.
                from tpugs.parallel.tile_shard import PAIR_IMBALANCE_HEADROOM

                g = self.mesh.shape["gauss"]
                target_local = 1.3 * int(stats.max_local_pairs)
                target = int(
                    np.ceil(target_local * g / PAIR_IMBALANCE_HEADROOM)
                )
            new_pairs = max(new_pairs, -(-target // 512) * 512)
        if bool(stats.hit_overflow):
            target = int(1.2 * int(stats.max_tile_hits))
            new_hits = max(new_hits, -(-target // 128) * 128)
        if bool(stats.send_overflow) and cfg.dist_send_capacity > 0:
            # A tuned-down exchange capacity dropped gaussians in the
            # all_to_all (tile_shard.build_send_index); grow toward the safe
            # N/g bound.
            target = int(1.3 * int(stats.max_send_count))
            new_send = max(new_send, -(-target // 128) * 128)
        grew = (new_pairs, new_hits, new_send) != (
            self.raster.pair_capacity, self.raster.max_hits_per_tile,
            cfg.dist_send_capacity,
        )
        if not grew:
            # Overflow was reported but no dimension produced a larger
            # capacity (e.g. transient imbalance already inside the growth
            # margins): still be loud — truncation persisted this block.
            self.log(msg + " — capacities unchanged, no growth computed")
            return
        self.log(
            msg + f" -> growing pair_capacity "
            f"{self.raster.pair_capacity}->{new_pairs}, max_hits "
            f"{self.raster.max_hits_per_tile}->{new_hits}"
            + (f", send_capacity {cfg.dist_send_capacity}->{new_send}"
               if new_send != cfg.dist_send_capacity else "")
            + " (re-jit)"
        )
        self.raster = dataclasses.replace(
            self.raster, pair_capacity=new_pairs, max_hits_per_tile=new_hits
        )
        if new_send != cfg.dist_send_capacity:
            self.cfg = dataclasses.replace(cfg, dist_send_capacity=new_send)
        self._build_render_steps()

    def _auto_send_capacity(self):
        """Measure the exchange's worst per-destination send count over
        sample views and set dist_send_capacity to 1.3x that (VERDICT r2
        item 5: the safe N/g bound wastes ~57% of the all_to_all as padding).
        Under-measurement is recoverable: send_overflow feeds the 'grow'
        policy (_handle_overflow)."""
        from tpugs.parallel.dist_train import measure_max_send_count

        cams = self.dataset.train_cameras
        sample = cams[:: max(1, len(cams) // 4)][:4]
        worst = measure_max_send_count(
            self.mesh, self.raster, self.state.params, self.state.alive,
            [np.asarray(c.world_to_camera(), np.float32) for c in sample],
            [np.asarray(c.intrinsics_array()) for c in sample],
        )
        n_loc = self.state.alive.shape[0] // self.mesh.shape["gauss"]
        cap = min(-(-int(worst * 1.3) // 128) * 128, n_loc)
        cap = max(cap, 128)
        self.cfg = dataclasses.replace(self.cfg, dist_send_capacity=cap)
        self.log(
            f"auto exchange capacity: max initial send count {worst} -> "
            f"{cap} slots/(src,dst) (x1.3 headroom; safe bound {n_loc})"
        )

    def _effective_send_capacity(self) -> int:
        """The exchange slot count make_dist_multi_step will actually use."""
        if self.mesh is None:
            return 0
        if self.cfg.dist_send_capacity > 0:
            return self.cfg.dist_send_capacity
        g = self.mesh.shape["gauss"]
        return self.state.alive.shape[0] // g

    def _image_bank(self):
        if self._images is None:
            if self.mesh is not None:
                self._images = self._image_bank_multihost()
            else:
                imgs = np.stack(
                    [self.dataset.load_train_image(i)
                     for i in range(self.dataset.num_train())]
                )
                self._images = jax.device_put(jnp.asarray(imgs))
        return self._images

    def _image_bank_multihost(self):
        """Sharded image bank built per-host: each host's callback loads ONLY
        the views owned by its data rows (jax.make_array_from_callback) —
        the multi-host data-loading path (SURVEY.md §5.8). Works identically
        in single-process mesh mode (used by tests)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        cam0 = self.dataset.train_cameras[0]
        v_pad = len(self._view_order)
        shape = (v_pad, cam0.height, cam0.width, 3)
        sharding = NamedSharding(self.mesh, P("data"))
        order = self._view_order

        def cb(index):
            rows = order[index[0]]
            return np.stack(
                [self.dataset.load_train_image(int(i)) for i in rows]
            ).astype(np.float32)

        return jax.make_array_from_callback(shape, sharding, cb)

    def train(self, iterations: Optional[int] = None):
        cfg = self.cfg
        iters = iterations if iterations is not None else cfg.iterations
        images = self._image_bank()
        os.makedirs(cfg.output_dir, exist_ok=True)

        t0 = time.perf_counter()
        window_start = t0
        history = []
        # Incremental metrics artifact: appended + flushed per log event so a
        # crash mid-run keeps the prefix (SURVEY.md §5.5).
        import json

        hist_path = os.path.join(cfg.output_dir, "history.jsonl")
        # Multi-host: only the primary process writes the metrics artifact.
        hist_f = (
            open(hist_path, "a" if self.start_step > 0 else "w")
            if self._primary else open(os.devnull, "w")
        )
        k_max = self._effective_steps_per_call()

        step = self.start_step
        while step < iters:
            # Block length: aligned to K, never crossing an SH-degree boundary.
            k_blk = k_max - (step % k_max) if step % k_max else k_max
            k_blk = min(k_blk, iters - step, 1000 - step % 1000)
            if self.mesh is None:
                vi = self._rng.integers(0, self.dataset.num_train(), size=k_blk)
            else:
                # One LOCAL view index per data row per step (each step
                # processes d views, camera-batch DP).
                vi = self._rng.integers(
                    0, self._views_per_row,
                    size=(k_blk, self.mesh.shape["data"]),
                )
            sh_deg = active_sh_degree_for_step(step, cfg.sh_degree)
            self.state, losses, stats = self._multi_step(
                self.state, images, self._viewmats, self._intrinsics,
                jnp.asarray(vi, jnp.int32), jnp.asarray(step, jnp.float32),
                sh_deg,
            )
            prev, step = step, step + k_blk

            if (bool(stats.pair_overflow) or bool(stats.hit_overflow)
                    or bool(stats.send_overflow)):
                self._handle_overflow(stats, step)

            # Host-side events for every step covered by the block. With K
            # dividing all schedule periods at most one event of each kind
            # fires per block, delayed by < K steps relative to the reference
            # per-step schedule.
            for s in range(prev, step):
                if cfg.densify_mode == "adc":
                    if cfg.adc.should_reset_opacity(s):
                        self.state = self._reset_opacity(self.state)
                        self.log(f"[{s}] opacity reset")
                    if cfg.adc.should_densify(s):
                        self.state, dstats = self._densify(
                            self.state,
                            size_pruning_active=s > cfg.adc.opacity_reset_every,
                        )
                        self.log(
                            f"[{s}] densify: +{int(dstats['num_cloned'])} cloned, "
                            f"+{int(dstats['num_split'])} split, "
                            f"-{int(dstats['num_pruned'])} pruned, "
                            f"N={int(dstats['num_after'])}"
                        )
                elif cfg.densify_mode == "mcmc":
                    if cfg.mcmc.should_relocate(s):
                        self.state, rstats = self._relocate(self.state)
                        added = int(rstats.get("num_added", 0))
                        self.log(
                            f"[{s}] mcmc relocate: {int(rstats['num_relocated'])} "
                            f"of {int(rstats['num_dead'])} dead, +{added} grown "
                            f"(N={int(rstats['num_total']) + added})"
                        )

                if cfg.log_every > 0 and s % cfg.log_every == 0:
                    loss = float(losses[s - prev])
                    now = time.perf_counter()
                    its = cfg.log_every / max(now - window_start, 1e-9) if s else 0.0
                    window_start = now
                    n_alive = int(jnp.sum(self.state.alive))
                    self.log(
                        f"[{s}] loss={loss:.4f} l1={float(stats.l1):.4f} "
                        f"N={n_alive} sh={sh_deg} pairs={int(stats.num_pairs)} "
                        f"{'OVERFLOW ' if bool(stats.pair_overflow) else ''}"
                        f"{its:.2f} it/s"
                    )
                    rec = {"step": s, "loss": loss, "l1": float(stats.l1),
                           "n": n_alive}
                    history.append(rec)
                    hist_f.write(json.dumps(rec) + "\n")
                    hist_f.flush()

                if (self.watchdog is not None and cfg.log_every > 0
                        and s % cfg.log_every == 0):
                    self.watchdog.check()
                    if self.watchdog.should_abort():
                        self.log(
                            f"[{s}] HBM over limit "
                            f"{self.watchdog.max_critical_streak} consecutive "
                            f"checks — checkpointing and aborting gracefully"
                        )
                        self.save_checkpoint(s)
                        hist_f.close()
                        return history

                if cfg.save_every > 0 and s > 0 and s % cfg.save_every == 0:
                    self.save_checkpoint(s)
                if cfg.eval_every > 0 and s > 0 and s % cfg.eval_every == 0:
                    # Evaluate at the CURRENT warmup degree, not the final one.
                    res = self.evaluate(
                        sh_degree=active_sh_degree_for_step(s, cfg.sh_degree)
                    )
                    self.log(
                        f"[{s}] eval: PSNR {res.mean_psnr:.2f} dB  "
                        f"SSIM {res.mean_ssim:.4f} ({len(res.images)} views)"
                    )

        hist_f.close()
        self.save_checkpoint(iters)
        total = time.perf_counter() - t0
        done = iters - self.start_step
        self.log(f"trained {done} iters in {total:.1f}s ({done / max(total, 1e-9):.2f} it/s)")
        return history

    def _auto_pair_capacity(self, gs, cam0, config) -> int:
        """Size the pair list from the initial scene's actual pair count over
        a few views, with headroom for densification growth."""
        from tpugs.ops.binning import tile_rects
        from tpugs.ops.projection import project_gaussians

        @jax.jit
        def count_pairs(viewmat, intr):
            proj = project_gaussians(
                gs.means, gs.quats, gs.log_scales, gs.opacity_logits, gs.sh,
                gs.alive, viewmat, intr, cam0.width, cam0.height, 0,
            )
            _, _, w, h = tile_rects(
                proj, cam0.width, cam0.height, config.tile_w, config.tile_h
            )
            return jnp.sum(w * h)

        cams = self.dataset.train_cameras
        sample = cams[:: max(1, len(cams) // 4)][:4]
        worst = max(
            int(count_pairs(
                jnp.asarray(c.world_to_camera(), jnp.float32),
                jnp.asarray(c.intrinsics_array()),
            ))
            for c in sample
        )
        target = int(max(worst, 1) * config.pair_capacity_headroom)
        cap = 1 << int(np.ceil(np.log2(max(target, 1 << 14))))
        cap = min(cap, config.pair_capacity)
        self.log(
            f"auto pair capacity: max initial pairs {worst} -> capacity {cap} "
            f"(x{config.pair_capacity_headroom:.0f} headroom)"
        )
        return cap

    def _effective_steps_per_call(self) -> int:
        """Largest K <= cfg.steps_per_call dividing every active schedule
        period (so events land on block boundaries)."""
        import math

        cfg = self.cfg
        periods = [1000]  # SH degree schedule
        for p in (cfg.log_every, cfg.save_every, cfg.eval_every):
            if p > 0:
                periods.append(p)
        if cfg.densify_mode == "adc":
            periods += [cfg.adc.densify_every, max(cfg.adc.densify_from, 1)]
            if cfg.adc.opacity_reset_every > 0:
                periods.append(cfg.adc.opacity_reset_every)
        elif cfg.densify_mode == "mcmc":
            periods += [cfg.mcmc.relocate_every, max(cfg.mcmc.relocate_from, 1)]
        g = 0
        for p in periods:
            g = math.gcd(g, p)
        k = max(1, min(self.cfg.steps_per_call, g))
        while g % k:
            k -= 1
        return max(k, 1)

    def _eval_raster_config(self):
        """Eval-only raster config: starts at the training config and grows
        independently (growing it never re-jits the train step), but always
        covers at least the training capacities (elementwise max — training
        growth is folded in)."""
        er = getattr(self, "_eval_raster", None)
        if er is None:
            er = self.raster
        else:
            er = dataclasses.replace(
                er,
                pair_capacity=max(er.pair_capacity, self.raster.pair_capacity),
                max_hits_per_tile=max(
                    er.max_hits_per_tile, self.raster.max_hits_per_tile
                ),
            )
        self._eval_raster = er
        return er

    def _handle_eval_overflow(self, name, num_pairs, pair_of, tile_hits,
                              hit_of) -> bool:
        """Overflow policy for a test view (same honesty contract as the
        train step's _handle_overflow and OfflineRenderer._handle_overflow:
        a post-growth test view must never silently depress PSNR —
        truncation drops back-most pairs, reference exactness contract
        src/rasterizer/sorting.cu:145-160). Returns True if capacities grew
        (caller re-renders)."""
        er = self._eval_raster
        msg = (
            f"eval view {name} OVERFLOW: pairs {num_pairs}"
            f"/{er.pair_capacity}, busiest tile {tile_hits}"
            f"/{er.max_hits_per_tile} (back-most pairs dropped)"
        )
        if self.cfg.on_overflow == "error":
            raise RuntimeError(msg)
        new_pairs, new_hits = er.pair_capacity, er.max_hits_per_tile
        if self.cfg.on_overflow == "grow":
            if pair_of:
                new_pairs = max(new_pairs, -(-int(1.3 * num_pairs) // 512) * 512)
            if hit_of:
                new_hits = max(new_hits, -(-int(1.2 * tile_hits) // 128) * 128)
        if (new_pairs, new_hits) == (er.pair_capacity, er.max_hits_per_tile):
            self.log(msg + " — capacities unchanged (policy "
                     f"{self.cfg.on_overflow!r})")
            return False
        self.log(msg + f" -> growing eval pair_capacity {er.pair_capacity}->"
                 f"{new_pairs}, max_hits {er.max_hits_per_tile}->{new_hits}"
                 " (re-jit, eval only)")
        self._eval_raster = dataclasses.replace(
            er, pair_capacity=new_pairs, max_hits_per_tile=new_hits
        )
        return True

    def evaluate(self, sh_degree: Optional[int] = None):
        """PSNR/SSIM over the dataset's test views with the current model
        (reference: evaluate(), metrics.cpp:93-163).

        The jitted renderer takes params as arguments (cached per raster
        config + SH degree across evaluate() calls — closing over params
        would re-trace on every eval event). Overflow-honest: every view's
        pair/hit overflow flags are checked, and an overflowing view grows
        the eval capacities and re-renders (or warns loudly) — never a
        silently truncated PSNR."""
        from tpugs.train.metrics import evaluate_views

        deg = self.cfg.sh_degree if sh_degree is None else sh_degree

        def get_render():
            raster = self._eval_raster_config()
            cache_key = (raster, deg)
            if getattr(self, "_eval_render_key", None) != cache_key:

                @jax.jit
                def render_view(params, alive, viewmat, intr):
                    out = render(
                        params["means"], params["quats"], params["log_scales"],
                        params["opacity_logits"], params["sh"], alive,
                        viewmat, intr, raster, deg, jnp.zeros((3,)),
                    )
                    return (out.color, out.num_pairs, out.pair_overflow,
                            out.max_tile_hits, out.hit_overflow)

                self._eval_render = render_view
                self._eval_render_key = cache_key
            return self._eval_render

        p = self.state.params
        alive = self.state.alive

        def render_checked(name, args):
            for _ in range(8):  # growth converges: capacities only increase
                fn = get_render()
                color, num_pairs, pair_of, tile_hits, hit_of = fn(
                    p, alive, *args
                )
                if not (bool(pair_of) or bool(hit_of)):
                    break
                if not self._handle_eval_overflow(
                    name, int(num_pairs), bool(pair_of), int(tile_hits),
                    bool(hit_of),
                ):
                    break
            return color

        views = []
        for i, cam in enumerate(self.dataset.test_cameras):
            target = self.dataset.load_test_image(i)
            views.append((
                cam.image_name, target,
                (jnp.asarray(cam.world_to_camera(), jnp.float32),
                 jnp.asarray(cam.intrinsics_array())),
            ))
        return evaluate_views(
            None, views,
            num_gaussians=int(jnp.sum(alive)),
            render_named=render_checked,
        )

    def gaussian_state(self) -> GaussianState:
        p = self.state.params
        return GaussianState(
            means=p["means"], quats=p["quats"], log_scales=p["log_scales"],
            opacity_logits=p["opacity_logits"], sh=p["sh"], alive=self.state.alive,
        )

    def _host_state(self):
        """Fetch the full TrainState to host memory, multi-host safe.

        In a multi-process run the mesh-sharded arrays are not fully
        addressable, so `np.asarray` on them would fail — gather across
        processes first (every host receives the full array; only the
        primary then writes). Single-process (incl. single-process mesh
        mode) skips the collective."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return jax.tree.map(
                lambda x: np.asarray(
                    multihost_utils.process_allgather(x, tiled=True)
                ),
                self.state,
            )
        return jax.tree.map(np.asarray, self.state)

    def save_checkpoint(self, step: int, full: bool = True):
        """PLY export (interop, reference: trainer.cpp:318-328) + full resume
        checkpoint (params + optimizer + accumulators + RNG + step).

        Multi-host: state is gathered on every process (collective — all
        processes must call this together), files are written by process 0
        only."""
        path = os.path.join(self.cfg.output_dir, f"model_{step:07d}.ply")
        host = self._host_state()
        if not self._primary:
            return path
        p = host.params
        alive = np.asarray(host.alive).astype(bool)
        idx = np.nonzero(alive)[0]
        write_gaussian_ply(
            path, p["means"][idx], p["sh"][idx], p["opacity_logits"][idx],
            p["log_scales"][idx], p["quats"][idx],
        )
        if full:
            from tpugs.io.checkpoint import save_train_checkpoint

            save_train_checkpoint(
                os.path.join(self.cfg.output_dir, f"ckpt_{step:07d}.npz"),
                host, step,
            )
        self.log(f"[{step}] checkpoint -> {path}")
        return path
