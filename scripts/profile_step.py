"""Per-stage device timing of the train step on the bench workload.

Each stage is timed with the scan-trick (tpugs.utils.profiling.device_time):
K iterations inside one jitted lax.scan, scalar fetch, divide by K.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpugs.ops.binning import bin_gaussians
from tpugs.ops.pallas.composite import (
    _p_aligned,
    align_segments,
    composite_backward_pallas,
    composite_forward_pallas,
    composite_tiles_pallas,
    pack_sorted_attrs,
)
from tpugs.ops.projection import project_gaussians
from tpugs.ops.render import RasterConfig, render
from tpugs.optim.adam import AdamConfig, adam_init, adam_step
from tpugs.train.loss import combined_loss
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
rng = jax.random.PRNGKey(0)
target = jax.random.uniform(rng, (img_h, img_w, 3))
adam_cfg = AdamConfig()

proj = jax.jit(lambda p: project_gaussians(
    p["means"], p["quats"], p["log_scales"], p["opacity_logits"], p["sh"],
    alive, viewmat, intr, img_w, img_h, 3, 1.0))(params)
binning = jax.jit(lambda pr: bin_gaussians(pr, img_w, img_h, 16, 16,
                                           cfg.pair_capacity))(proj)
p_aligned = _p_aligned(cfg)
astart, astop, aligned_gauss, avalid = jax.jit(
    lambda b: align_segments(b.tile_start, b.tile_stop, b.pair_gauss, p_aligned)
)(binning)
attr = jax.jit(lambda: pack_sorted_attrs(aligned_gauss, proj.means2d, proj.conic,
                                         proj.rgb, proj.opac, p_aligned))()


def stage(name, fn, carry):
    ms = device_time(fn, carry, k=10, rounds=2) * 1e3
    print(f"{name:28s} {ms:8.2f} ms")


# 1. projection (+SH)
def s_proj(c, it):
    pr = project_gaussians(
        params["means"], params["quats"], params["log_scales"],
        params["opacity_logits"], params["sh"], alive, viewmat, intr,
        img_w, img_h, 3, 1.0)
    return (c[0] + pr.depths.sum(),)

stage("projection+SH fwd", s_proj, (jnp.zeros(()),))


# 2. binning
def s_bin(c, it):
    b = bin_gaussians(proj, img_w, img_h, 16, 16, cfg.pair_capacity)
    return (c[0] + b.num_pairs.astype(jnp.float32),)

stage("binning (expand+sort)", s_bin, (jnp.zeros(()),))


# 3. align + pack
def s_align(c, it):
    a0, a1, ag, av = align_segments(binning.tile_start, binning.tile_stop,
                                    binning.pair_gauss, p_aligned)
    at = pack_sorted_attrs(ag, proj.means2d, proj.conic, proj.rgb, proj.opac,
                           p_aligned)
    return (c[0] + at[0, 0],)

stage("align+pack", s_align, (jnp.zeros(()),))


# 4. pallas forward
def s_fwd(c, it):
    color, t, nc, kl = composite_forward_pallas(cfg, astart, astop, attr)
    return (c[0] + color.sum() * 0 + t[0, 0],)

stage("pallas fwd", s_fwd, (jnp.zeros(()),))


# 5. full fwd render
def s_render(c, it):
    out = render(params["means"], params["quats"], params["log_scales"],
                 params["opacity_logits"], params["sh"], alive, viewmat, intr,
                 cfg, 3, bg)
    return (c[0] + out.color[0, 0, 0],)

stage("full render fwd", s_render, (jnp.zeros(()),))


# 6. loss fwd (render + ssim)
def s_lossf(c, it):
    out = render(params["means"], params["quats"], params["log_scales"],
                 params["opacity_logits"], params["sh"], alive, viewmat, intr,
                 cfg, 3, bg)
    return (c[0] + combined_loss(out.color, target, 0.2),)

stage("render+loss fwd", s_lossf, (jnp.zeros(()),))


# 7. full value_and_grad
def s_grad(c, it):
    def loss_fn(p):
        out = render(p["means"], p["quats"], p["log_scales"],
                     p["opacity_logits"], p["sh"], alive, viewmat, intr,
                     cfg, 3, bg)
        return combined_loss(out.color, target, 0.2)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    return (c[0] + loss,)

stage("value_and_grad", s_grad, (jnp.zeros(()),))


# 8. full train step (grad + adam)
adam_state = adam_init(params)

def s_step(carry, it):
    p, st = carry
    def loss_fn(pp):
        out = render(pp["means"], pp["quats"], pp["log_scales"],
                     pp["opacity_logits"], pp["sh"], alive, viewmat, intr,
                     cfg, 3, bg)
        return combined_loss(out.color, target, 0.2)
    loss, grads = jax.value_and_grad(loss_fn)(p)
    p, st = adam_step(adam_cfg, st, p, grads, it)
    return (p, st)

stage("full train step", s_step, (params, adam_state))
