"""MCMC densification (Kheradmand et al., NeurIPS 2024) — fixed-N relocation.

Behavioral equivalent of reference src/optimizer/mcmc_densification.cpp:75-186.
This strategy is *naturally* shape-stable (N never changes), which makes it the
flagship densifier for the TPU build (SURVEY.md §7):

- relocate: dead (sigmoid(op) < 0.005) Gaussians teleport to sources sampled
  from alive ones with probability ∝ opacity; SH + rotation copied, position =
  source + randn * 0.01 * extent, scale = source - log(10), opacity =
  inverse_sigmoid(0.01); at most 5% of N per event;
- noise injection every iteration (paper eq. 9): pos += noise_lr *
  xyz_lr(t) * Sigma @ (gate * randn), gate = sigmoid(-100 (sigmoid(op) -
  0.995)), Sigma the full 3D covariance. NOTE: this deliberately diverges
  from the reference, whose formula (mcmc_densification.cpp:144-161)
  `noise_lr(t) * exp(scales) * gate * randn` with noise_lr(0)=5e5 drops the
  paper's xyz-learning-rate factor and uses sigma instead of Sigma —
  displacements of ~5e5*sigma destroy any scene in the first steps (measured:
  pair count 13k -> 392 within 25 iterations). The paper/upstream
  3dgs-mcmc semantics used here keep displacements at ~80*sigma^2 early,
  decaying with the position LR;
- regularization 0.01*mean(sigmoid(op)) + 0.01*mean(exp(scales)) — here simply
  added to the jitted loss (autodiff replaces the reference's detached-clone
  gradient-injection machinery, mcmc_densification.cpp:167-186).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpugs.core import transforms as tf
from tpugs.optim.lr_schedule import PositionLRConfig, position_lr

RELOCATE_OPACITY = -4.59511985013459  # inverse_sigmoid(0.01)
RELOCATE_SCALE_SHRINK = 10.0


@dataclasses.dataclass(frozen=True)
class MCMCConfig:
    """reference: mcmc_densification.hpp:27-51."""

    relocate_from: int = 500
    relocate_until: int = 15000
    relocate_every: int = 100
    dead_opacity_threshold: float = 0.005
    relocate_cap: float = 0.05
    # Paper semantics: noise scale = noise_lr * xyz_lr(step), with xyz_lr the
    # decaying position learning rate (5e5 * 1.6e-4 = 80 at step 0). The
    # reference's separate 5e5->1e3 schedule is its (scene-destroying)
    # mis-translation of the same upstream default — see module docstring.
    noise_lr: float = 5e5
    # Must track the OPTIMIZER's position LR schedule (the Trainer syncs this
    # from AdamConfig.position_lr at construction so the two cannot drift).
    position_lr: PositionLRConfig = dataclasses.field(
        default_factory=PositionLRConfig
    )
    noise_gate_k: float = 100.0
    noise_gate_t: float = 0.995
    # Per-step displacement cap, in units of the Gaussian's own largest axis
    # stddev. The Sigma-scaled paper noise is calibrated for converged splat
    # sizes; at SfM init the sparse-point scales are ~10x larger and the same
    # formula yields ~20*sigma per step, which destroys the scene during
    # warmup. Calibrated on the GT quality benchmark (1.5k iters): cap
    # 0.5/0.2/0.05 -> PSNR 14.95/17.01/18.73 vs 18.99 with noise off.
    noise_max_sigma: float = 0.05
    lambda_opacity: float = 0.01
    lambda_scale: float = 0.01
    # Fraction of N added into free capacity per relocate event, enabled by
    # default (upstream 3dgs-mcmc behavior, +0.5 dB on the quality benchmark);
    # 0 = reference-faithful strictly-fixed N.
    grow_factor: float = 0.05

    def should_relocate(self, step: int) -> bool:
        return (
            self.relocate_from <= step <= self.relocate_until
            and step % self.relocate_every == 0
        )


def noise_scale(step, cfg: MCMCConfig = MCMCConfig()):
    """Effective noise magnitude: noise_lr * decaying position LR (paper
    semantics; the factor the reference drops — see module docstring)."""
    return cfg.noise_lr * position_lr(step, cfg.position_lr)


def inject_noise(cfg: MCMCConfig, params: dict, alive: jnp.ndarray, step, key):
    """Per-iteration position noise (paper eq. 9 / upstream 3dgs-mcmc):
    pos += noise_scale(step) * Sigma @ (gate * randn)."""
    lr = noise_scale(step, cfg)
    opac = jax.nn.sigmoid(params["opacity_logits"])
    gate = jax.nn.sigmoid(-cfg.noise_gate_k * (opac - cfg.noise_gate_t))
    eps = gate[:, None] * jax.random.normal(key, params["means"].shape)
    cov3d = tf.compute_cov3d(params["log_scales"], params["quats"])  # [N,3,3]
    noise = lr * jnp.einsum("nij,nj->ni", cov3d, eps)
    # Norm clamp at noise_max_sigma * sigma_max (see config comment).
    sigma_max = jnp.exp(jnp.max(params["log_scales"], axis=-1))
    norm = jnp.sqrt(jnp.sum(noise * noise, axis=-1) + 1e-20)
    factor = jnp.minimum(1.0, cfg.noise_max_sigma * sigma_max / norm)
    noise = noise * factor[:, None]
    out = dict(params)
    out["means"] = params["means"] + jnp.where(alive[:, None], noise, 0.0)
    return out


def regularization(cfg: MCMCConfig, params: dict, alive: jnp.ndarray):
    """Added directly to the training loss (replaces reference grad injection)."""
    n = jnp.maximum(jnp.sum(alive.astype(jnp.float32)), 1.0)
    opac = jnp.where(alive, jax.nn.sigmoid(params["opacity_logits"]), 0.0)
    scales = jnp.where(alive[:, None], jnp.exp(params["log_scales"]), 0.0)
    return (
        cfg.lambda_opacity * jnp.sum(opac) / n
        + cfg.lambda_scale * jnp.sum(scales) / (3.0 * n)
    )


def relocate(cfg: MCMCConfig, params: dict, alive: jnp.ndarray, key, scene_extent: float):
    """One relocation event; shape-stable. Returns (params, changed_mask, stats).

    Dead slots are *within the alive population* here (opacity collapsed) —
    MCMC never changes the alive mask itself.
    """
    nc = alive.shape[0]
    opac = jax.nn.sigmoid(params["opacity_logits"])
    dead = alive & (opac < cfg.dead_opacity_threshold)
    living = alive & ~dead

    n_total = jnp.sum(alive.astype(jnp.int32))
    n_dead = jnp.sum(dead.astype(jnp.int32))
    n_living = n_total - n_dead
    cap = (cfg.relocate_cap * n_total.astype(jnp.float32)).astype(jnp.int32)
    n_relocate = jnp.minimum(n_dead, cap)
    # Nothing to do if no dead or no alive sources.
    n_relocate = jnp.where((n_dead == 0) | (n_living == 0), 0, n_relocate)

    # Target list: first n_relocate dead slots (reference takes dead indices in
    # order, mcmc_densification.cpp:99-105).
    dead_order = jnp.argsort(jnp.where(dead, 0, 1), stable=True)
    grant = jnp.arange(nc) < n_relocate
    targets = jnp.where(grant, dead_order, nc)

    # Opacity-weighted categorical sampling over living sources (Gumbel-max:
    # the jittable equivalent of torch::multinomial with replacement).
    key_src, key_jit = jax.random.split(key)
    logits = jnp.where(living, jnp.log(jnp.maximum(opac, 1e-12)), -jnp.inf)
    src = jax.random.categorical(key_src, logits, shape=(nc,))  # [Nc] source ids

    jitter = jax.random.normal(key_jit, (nc, 3)) * (0.01 * scene_extent)
    out = dict(params)
    out["sh"] = params["sh"].at[targets].set(params["sh"][src], mode="drop")
    out["quats"] = params["quats"].at[targets].set(params["quats"][src], mode="drop")
    out["means"] = params["means"].at[targets].set(
        params["means"][src] + jitter, mode="drop"
    )
    out["log_scales"] = params["log_scales"].at[targets].set(
        params["log_scales"][src] - jnp.log(RELOCATE_SCALE_SHRINK), mode="drop"
    )
    out["opacity_logits"] = params["opacity_logits"].at[targets].set(
        RELOCATE_OPACITY, mode="drop"
    )

    changed = jnp.zeros((nc,), bool).at[targets].set(True, mode="drop")
    stats = {"num_relocated": n_relocate, "num_dead": n_dead, "num_total": n_total}
    return out, changed, stats


def grow(cfg: MCMCConfig, params: dict, alive: jnp.ndarray, key,
         scene_extent: float, max_gaussians: int = 0):
    """Add up to grow_factor*N new Gaussians into free capacity slots,
    initialized exactly like relocation targets (sampled from alive sources
    with probability proportional to opacity).

    The upstream 3dgs-mcmc grows N toward a target cap this way each event;
    the reference is strictly fixed-N (mcmc_densification.hpp:15-16). Growth
    is ON by default (grow_factor=0.05, +0.5 dB on the quality benchmark);
    set MCMCConfig.grow_factor=0 for the reference-faithful fixed-N behavior.
    Returns (params, alive, changed_mask, num_added)."""
    nc = alive.shape[0]
    opac = jax.nn.sigmoid(params["opacity_logits"])
    living = alive & (opac >= cfg.dead_opacity_threshold)
    n_alive = jnp.sum(alive.astype(jnp.int32))
    n_free = nc - n_alive
    cap = max_gaussians if max_gaussians > 0 else nc
    budget = jnp.maximum(cap - n_alive, 0)
    n_new = jnp.minimum(
        (cfg.grow_factor * n_alive.astype(jnp.float32)).astype(jnp.int32),
        jnp.minimum(n_free, budget),
    )
    n_new = jnp.where(jnp.sum(living.astype(jnp.int32)) == 0, 0, n_new)

    free_order = jnp.argsort(jnp.where(alive, 1, 0), stable=True)
    grant = jnp.arange(nc) < n_new
    targets = jnp.where(grant, free_order, nc)

    key_src, key_jit = jax.random.split(key)
    logits = jnp.where(living, jnp.log(jnp.maximum(opac, 1e-12)), -jnp.inf)
    src = jax.random.categorical(key_src, logits, shape=(nc,))
    jitter = jax.random.normal(key_jit, (nc, 3)) * (0.01 * scene_extent)

    out = dict(params)
    out["sh"] = params["sh"].at[targets].set(params["sh"][src], mode="drop")
    out["quats"] = params["quats"].at[targets].set(params["quats"][src], mode="drop")
    out["means"] = params["means"].at[targets].set(
        params["means"][src] + jitter, mode="drop"
    )
    out["log_scales"] = params["log_scales"].at[targets].set(
        params["log_scales"][src] - jnp.log(RELOCATE_SCALE_SHRINK), mode="drop"
    )
    out["opacity_logits"] = params["opacity_logits"].at[targets].set(
        RELOCATE_OPACITY, mode="drop"
    )
    written = jnp.zeros((nc,), bool).at[targets].set(True, mode="drop")
    return out, alive | written, written, n_new
