"""Fixed-capacity Gaussian state — the central shape-stable pytree.

The reference stores the model as 5 growable libtorch tensors and reallocates
on densification (reference: src/core/gaussian.hpp:34-39,
src/optimizer/densification.cpp:459-474). On TPU, reallocation would retrace /
recompile, so we allocate a fixed capacity once and carry an `alive` mask:
dead slots are never rendered (opacity contribution masked out) and densify
writes children into dead slots by scatter. Everything stays one static shape
for the whole run.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from tpugs.core import sh as sh_lib

MAX_SH_DEGREE = 3


def inverse_sigmoid(x):
    return jnp.log(x) - jnp.log1p(-x)


@struct.dataclass
class GaussianState:
    """Structure-of-arrays Gaussian model, capacity-padded.

    means          [Nc, 3]  world positions
    quats          [Nc, 4]  (w,x,y,z) rotations (un-normalized; normalized on use)
    log_scales     [Nc, 3]  log-space scales
    opacity_logits [Nc]     logit-space opacities
    sh             [Nc, 3, C]  SH coefficients, C = (max_degree+1)^2
    alive          [Nc]     bool validity mask (False = free slot)
    """

    means: jnp.ndarray
    quats: jnp.ndarray
    log_scales: jnp.ndarray
    opacity_logits: jnp.ndarray
    sh: jnp.ndarray
    alive: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def max_sh_degree(self) -> int:
        c = self.sh.shape[-1]
        return int(round(c**0.5)) - 1

    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    def params(self) -> dict:
        """The 5 learnable arrays as a dict (the optimizer's pytree)."""
        return {
            "means": self.means,
            "sh": self.sh,
            "opacity_logits": self.opacity_logits,
            "log_scales": self.log_scales,
            "quats": self.quats,
        }

    def replace_params(self, p: dict) -> "GaussianState":
        return self.replace(
            means=p["means"],
            sh=p["sh"],
            opacity_logits=p["opacity_logits"],
            log_scales=p["log_scales"],
            quats=p["quats"],
        )

    @staticmethod
    def create(
        means,
        quats,
        log_scales,
        opacity_logits,
        sh,
        capacity: Optional[int] = None,
    ) -> "GaussianState":
        """Build from dense arrays of N live Gaussians, padding to `capacity`."""
        n = means.shape[0]
        cap = capacity if capacity is not None else n
        assert cap >= n, f"capacity {cap} < n {n}"

        def pad(x):
            pads = [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(jnp.asarray(x, jnp.float32), pads)

        alive = jnp.arange(cap) < n
        op = jnp.asarray(opacity_logits, jnp.float32).reshape(n)
        return GaussianState(
            means=pad(means),
            quats=pad(quats),
            log_scales=pad(log_scales),
            opacity_logits=jnp.pad(op, (0, cap - n)),
            sh=pad(sh),
            alive=alive,
        )

    @staticmethod
    def empty(capacity: int, sh_degree: int = MAX_SH_DEGREE) -> "GaussianState":
        c = sh_lib.sh_coeff_count(sh_degree)
        return GaussianState(
            means=jnp.zeros((capacity, 3), jnp.float32),
            quats=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (capacity, 1)),
            log_scales=jnp.zeros((capacity, 3), jnp.float32),
            opacity_logits=jnp.zeros((capacity,), jnp.float32),
            sh=jnp.zeros((capacity, 3, c), jnp.float32),
            alive=jnp.zeros((capacity,), bool),
        )

    def compact_arrays(self) -> dict:
        """Host-side: gather the live Gaussians into dense numpy arrays
        (for PLY export). Not jittable (data-dependent size)."""
        import numpy as np

        alive = np.asarray(self.alive)
        idx = np.nonzero(alive)[0]
        return {
            "means": np.asarray(self.means)[idx],
            "quats": np.asarray(self.quats)[idx],
            "log_scales": np.asarray(self.log_scales)[idx],
            "opacity_logits": np.asarray(self.opacity_logits)[idx],
            "sh": np.asarray(self.sh)[idx],
        }
