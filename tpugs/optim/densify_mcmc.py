"""MCMC densification (Kheradmand et al., NeurIPS 2024) — fixed-N relocation.

Behavioral equivalent of reference src/optimizer/mcmc_densification.cpp:75-186.
This strategy is *naturally* shape-stable (N never changes), which makes it the
flagship densifier for the TPU build (SURVEY.md §7):

- relocate: dead (sigmoid(op) < 0.005) Gaussians teleport to sources sampled
  from alive ones with probability ∝ opacity; SH + rotation copied, position =
  source + randn * 0.01 * extent, scale = source - log(10), opacity =
  inverse_sigmoid(0.01); at most 5% of N per event;
- noise injection every iteration: pos += lr(t) * exp(scales) *
  sigmoid(-100 (sigmoid(op) - 0.995)) * randn, lr log-linear 5e5 -> 1e3;
- regularization 0.01*mean(sigmoid(op)) + 0.01*mean(exp(scales)) — here simply
  added to the jitted loss (autodiff replaces the reference's detached-clone
  gradient-injection machinery, mcmc_densification.cpp:167-186).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

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
    noise_lr_init: float = 5e5
    noise_lr_final: float = 1e3
    noise_lr_max_steps: int = 30000
    noise_gate_k: float = 100.0
    noise_gate_t: float = 0.995
    lambda_opacity: float = 0.01
    lambda_scale: float = 0.01

    def should_relocate(self, step: int) -> bool:
        return (
            self.relocate_from <= step <= self.relocate_until
            and step % self.relocate_every == 0
        )


def noise_lr(step, cfg: MCMCConfig = MCMCConfig()):
    """Log-linear decay (reference: mcmc_densification.cpp:41-50)."""
    t = jnp.clip(step / cfg.noise_lr_max_steps, 0.0, 1.0)
    return cfg.noise_lr_init * jnp.exp(
        t * jnp.log(cfg.noise_lr_final / cfg.noise_lr_init)
    )


def inject_noise(cfg: MCMCConfig, params: dict, alive: jnp.ndarray, step, key):
    """Per-iteration position noise (reference: mcmc_densification.cpp:144-161)."""
    lr = noise_lr(step, cfg)
    opac = jax.nn.sigmoid(params["opacity_logits"])
    gate = jax.nn.sigmoid(-cfg.noise_gate_k * (opac - cfg.noise_gate_t))
    noise = (
        lr
        * jnp.exp(params["log_scales"])
        * gate[:, None]
        * jax.random.normal(key, params["means"].shape)
    )
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
