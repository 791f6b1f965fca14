"""Gaussian Adam — 5 parameter groups, one fused XLA update.

The reference needs a hand-written CUDA kernel to fuse Adam's ~10 elementwise
ops into one launch per group (reference: src/optimizer/fused_adam.cu:44-76).
On TPU the same jnp expressions are fused by XLA into the jitted train step —
this module IS the FusedAdam equivalent, validated against optax the way the
reference validates against libtorch Adam (reference: tests/test_fused_adam.cpp).

Config matches the reference exactly: betas (0.9, 0.999), eps=1e-15 (the 3DGS
paper value, reference: adam.hpp:38-40), per-group LRs with the position group
on the log-linear decay schedule.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from tpugs.optim import lr_schedule


@dataclasses.dataclass(frozen=True)
class AdamConfig:
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-15
    position_lr: lr_schedule.PositionLRConfig = dataclasses.field(
        default_factory=lr_schedule.PositionLRConfig
    )
    lr_sh: float = lr_schedule.LR_SH
    lr_opacity: float = lr_schedule.LR_OPACITY
    lr_scale: float = lr_schedule.LR_SCALE
    lr_rotation: float = lr_schedule.LR_ROTATION


@struct.dataclass
class AdamState:
    m: dict  # first moments, same tree as params
    v: dict  # second moments
    count: jnp.ndarray  # [] int32 — number of steps taken


def adam_init(params: dict) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def group_lrs(config: AdamConfig, step) -> dict:
    """Per-group learning rates at `step` (traced ok)."""
    return {
        "means": lr_schedule.position_lr(step, config.position_lr),
        "sh": config.lr_sh,
        "opacity_logits": config.lr_opacity,
        "log_scales": config.lr_scale,
        "quats": config.lr_rotation,
    }


def adam_step(
    config: AdamConfig, state: AdamState, params: dict, grads: dict, step
):
    """One Adam update. `step` is the schedule step (the trainer's iteration),
    `state.count` the bias-correction step. Returns (params, state)."""
    t = state.count + 1
    tf = t.astype(jnp.float32)
    bc1 = 1.0 - jnp.power(config.beta1, tf)
    bc2 = 1.0 - jnp.power(config.beta2, tf)
    lrs = group_lrs(config, step)

    new_params, new_m, new_v = {}, {}, {}
    for k in params:
        g = grads[k]
        m = config.beta1 * state.m[k] + (1.0 - config.beta1) * g
        v = config.beta2 * state.v[k] + (1.0 - config.beta2) * g * g
        m_hat = m / bc1
        v_hat = v / bc2
        new_params[k] = params[k] - lrs[k] * m_hat / (jnp.sqrt(v_hat) + config.eps)
        new_m[k] = m
        new_v[k] = v

    return new_params, AdamState(m=new_m, v=new_v, count=t)


def zero_slots(state: AdamState, mask: jnp.ndarray) -> AdamState:
    """Zero Adam moments for slots where mask is True — the shape-stable
    equivalent of the reference rebuilding the optimizer after densification
    (reference: trainer.cpp:283-289; SURVEY.md §7 hard part #2)."""

    def zap(x):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
        return jnp.where(m, 0.0, x)

    return AdamState(
        m=jax.tree.map(zap, state.m), v=jax.tree.map(zap, state.v), count=state.count
    )
