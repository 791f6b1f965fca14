"""Multi-chip data-parallel training step (phase-1 distribution, SURVEY.md §7).

Camera-batch DP over the mesh "data" axis: each device renders a different
training view against replicated Gaussian parameters; per-Gaussian gradients
are psum-reduced by XLA (emitted from the sharding annotations, overlapped with
backward by the latency-hiding scheduler); the Adam update runs replicated.

The reference is strictly single-GPU (SURVEY.md §2.8) — this module is the
net-new scaling dimension. It is exercised on an N-virtual-device CPU mesh in
tests and by the driver's dryrun (see __graft_entry__.dryrun_multichip).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpugs.ops.render import RasterConfig, render
from tpugs.optim.adam import AdamConfig, adam_step
from tpugs.train.loss import combined_loss


def make_dp_train_step(
    mesh: Mesh,
    raster: RasterConfig,
    adam_cfg: AdamConfig = AdamConfig(),
    lambda_ssim: float = 0.2,
    sh_degree: int = 0,
):
    """Build a jitted DP train step over `mesh` ("data" axis shards the view
    batch). Signature:
      step_fn(params, alive, adam_state, images [B,H,W,3], viewmats [B,4,4],
              intrinsics [B,4], step) -> (params, adam_state, loss)
    B must be a multiple of the data-axis size.
    """
    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P("data"))

    def step_fn(params, alive, adam_state, images, viewmats, intrinsics, step):
        def loss_one(params, image, viewmat, intr):
            out = render(
                params["means"], params["quats"], params["log_scales"],
                params["opacity_logits"], params["sh"], alive,
                viewmat, intr, raster, sh_degree, jnp.zeros((3,)),
            )
            return combined_loss(out.color, image, lambda_ssim)

        def loss_fn(params):
            losses = jax.vmap(loss_one, in_axes=(None, 0, 0, 0))(
                params, images, viewmats, intrinsics
            )
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_params, new_adam = adam_step(adam_cfg, adam_state, params, grads, step)
        return new_params, new_adam, loss

    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, repl, batch, batch, batch, repl),
        out_shardings=(repl, repl, repl),
    )


def shard_batch(mesh: Mesh, *arrays):
    """Device-put arrays with the leading axis sharded over "data"."""
    sh = NamedSharding(mesh, P("data"))
    return tuple(jax.device_put(a, sh) for a in arrays)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
