"""Multi-device training tests on the virtual 8-CPU mesh (SURVEY.md §4):
camera-batch DP and Gaussian-sharded (shard_map) steps must match the
single-device batched reference step exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugs.ops.render import RasterConfig, render
from tpugs.optim.adam import AdamConfig, adam_init, adam_step
from tpugs.parallel.mesh import make_mesh
from tpugs.parallel.sharded_train import make_dp_train_step, replicate, shard_batch
from tpugs.train.loss import combined_loss
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

W, H = 64, 48
CFG = RasterConfig(img_h=H, img_w=W, tile_h=16, tile_w=16,
                   pair_capacity=1 << 13, max_hits_per_tile=128)
N = 64


@pytest.fixture(scope="module")
def scene():
    params = synthetic_params(N, seed=0, sh_coeffs=4)
    alive = jnp.ones((N,), bool)
    rng = np.random.default_rng(1)
    b = 8
    images = jnp.asarray(rng.uniform(0, 1, (b, H, W, 3)), jnp.float32)
    viewmats = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    intr = jnp.tile(synthetic_intrinsics(W, H)[None], (b, 1))
    return params, alive, images, viewmats, intr


def reference_step(params, alive, images, viewmats, intr, step=0.0):
    """Single-device batched-mean reference."""
    acfg = AdamConfig()
    adam = adam_init(params)

    def loss_fn(p):
        def one(img, vm, it):
            out = render(p["means"], p["quats"], p["log_scales"],
                         p["opacity_logits"], p["sh"], alive, vm, it, CFG, 1,
                         jnp.zeros((3,)))
            return combined_loss(out.color, img, 0.2)

        return jnp.mean(jax.vmap(one)(images, viewmats, intr))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    new_params, _ = adam_step(acfg, adam, params, grads, jnp.asarray(step))
    return new_params, loss


class TestDataParallel:
    def test_dp_matches_reference(self, scene):
        params, alive, images, viewmats, intr = scene
        mesh = make_mesh(axis_sizes=(8, 1))
        step_fn = make_dp_train_step(mesh, CFG, AdamConfig(), sh_degree=1)
        p_r, alive_r, adam_r = replicate(mesh, (params, alive, adam_init(params)))
        im, vm, it = shard_batch(mesh, images, viewmats, intr)
        new_params, _, loss = step_fn(p_r, alive_r, adam_r, im, vm, it,
                                      jnp.zeros(()))
        ref_params, ref_loss = reference_step(params, alive, images, viewmats, intr)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(new_params[k]), np.asarray(ref_params[k]),
                atol=2e-6, err_msg=k,
            )


class TestGaussSharded:
    def test_gauss_shard_matches_reference(self, scene):
        from tpugs.parallel.gauss_shard import (
            make_gauss_sharded_train_step,
            shard_gauss_state,
        )

        params, alive, images, viewmats, intr = scene
        mesh = make_mesh(axis_sizes=(2, 4))  # 2-way data x 4-way gauss
        step_fn = make_gauss_sharded_train_step(
            mesh, CFG, AdamConfig(), sh_degree=1, compositor="scan"
        )
        p_s, alive_s, adam_s = shard_gauss_state(mesh, params, alive, adam_init(params))
        b = 2
        new_params, new_adam, loss = step_fn(
            p_s, alive_s, adam_s, images[:b], viewmats[:b], intr[:b], jnp.zeros(())
        )
        ref_params, ref_loss = reference_step(
            params, alive, images[:b], viewmats[:b], intr[:b]
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(new_params[k]), np.asarray(ref_params[k]),
                atol=2e-6, err_msg=k,
            )
