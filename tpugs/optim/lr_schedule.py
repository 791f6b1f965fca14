"""Per-group learning-rate schedules (reference: src/training/lr_schedule.hpp).

jnp versions are traced (step is a device scalar inside the jitted train step —
no host round-trip per iteration, unlike the reference's host-side schedule).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PositionLRConfig:
    """lr(t) = lr_init * (lr_final/lr_init)^(t/max_steps), clamped at the ends
    (reference: lr_schedule.hpp:35-57)."""

    lr_init: float = 1.6e-4
    lr_final: float = 1.6e-6
    max_steps: int = 30000


# Constant LRs for the other 4 groups (reference: lr_schedule.hpp:75-80).
LR_SH = 2.5e-3
LR_OPACITY = 0.05
LR_SCALE = 5e-3
LR_ROTATION = 1e-3


def position_lr(step, config: PositionLRConfig = PositionLRConfig()):
    """Log-linear decay; `step` may be a traced scalar."""
    t = jnp.clip(step / config.max_steps, 0.0, 1.0)
    log_ratio = jnp.log(config.lr_final / config.lr_init)
    return config.lr_init * jnp.exp(t * log_ratio)


def active_sh_degree_for_step(step: int, max_degree: int) -> int:
    """Progressive SH: +1 degree every 1000 iters (reference:
    lr_schedule.hpp:70-72). Python ints — this picks the compiled variant."""
    return min(step // 1000, max_degree)
