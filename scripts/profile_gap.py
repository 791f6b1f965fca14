"""Localize the gap between sum-of-stage costs and the full train step."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpugs.ops.render import RasterConfig, render
from tpugs.optim.adam import AdamConfig, adam_init, adam_step
from tpugs.train.loss import combined_loss, l1_loss, ssim
from tpugs.utils.profiling import device_time
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 489, 272
n = 50_000
cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=16, tile_w=16,
                   pair_capacity=1 << 19, max_hits_per_tile=1024)
params = synthetic_params(n, seed=0)
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.zeros((3,))
target = jax.random.uniform(jax.random.PRNGKey(0), (img_h, img_w, 3))
adam_cfg = AdamConfig()
adam_state = adam_init(params)


def stage(name, fn, carry):
    ms = device_time(fn, carry, k=10, rounds=2) * 1e3
    print(f"{name:40s} {ms:8.2f} ms", flush=True)


def rendr(p):
    return render(p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
                  p["sh"], alive, viewmat, intr, cfg, 3, bg)


# a. full real loss fwd+bwd (no adam)
def s_vg(c, it):
    def loss_fn(p):
        return combined_loss(rendr(p).color, target, 0.2)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    return (c[0] + loss + grads["means"][0, 0],)

stage("value_and_grad(render+combined)", s_vg, (jnp.zeros(()),))


# b. same with L1 only
def s_vg_l1(c, it):
    def loss_fn(p):
        return l1_loss(rendr(p).color, target)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    return (c[0] + loss + grads["means"][0, 0],)

stage("value_and_grad(render+l1)", s_vg_l1, (jnp.zeros(()),))


# c. adam alone
def s_adam(carry, it):
    p, st = carry
    grads = jax.tree.map(lambda x: x * 1e-6, p)
    p, st = adam_step(adam_cfg, st, p, grads, it)
    return (p, st)

stage("adam step alone", s_adam, (params, adam_state))


# d. full train step (reconfirm)
def s_step(carry, it):
    p, st = carry
    def loss_fn(pp):
        return combined_loss(rendr(pp).color, target, 0.2)
    loss, grads = jax.value_and_grad(loss_fn)(p)
    p, st = adam_step(adam_cfg, st, p, grads, it)
    return (p, st)

stage("full train step", s_step, (params, adam_state))
