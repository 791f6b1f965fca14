"""Honest per-stage timings: every stage's inputs depend on the scan carry
(a tiny perturbation), so XLA cannot hoist the work out of the measuring loop.
Without this, any stage with fixed inputs is loop-invariant and the scan-trick
clock under-reports it (observed: 22 ms "value_and_grad" vs 97 ms true step).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpugs.ops.binning import bin_gaussians
from tpugs.ops.pallas.composite import (
    NUM_ATTR,
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
cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
                   pair_capacity=204800, max_hits_per_tile=1024)
params = synthetic_params(n, seed=0)
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.zeros((3,))
target = jax.random.uniform(jax.random.PRNGKey(0), (img_h, img_w, 3))

proj = jax.jit(lambda p: project_gaussians(
    p["means"], p["quats"], p["log_scales"], p["opacity_logits"], p["sh"],
    alive, viewmat, intr, img_w, img_h, 3, 1.0))(params)
binning = jax.jit(lambda pr: bin_gaussians(pr, img_w, img_h, 32, 32,
                                           cfg.pair_capacity))(proj)
p_aligned = _p_aligned(cfg)
astart, astop, aligned_gauss, avalid = jax.jit(
    lambda b: align_segments(b.tile_start, b.tile_stop, b.pair_gauss, p_aligned)
)(binning)
attr = jax.jit(lambda: pack_sorted_attrs(aligned_gauss, proj.means2d, proj.conic,
                                         proj.rgb, proj.opac, p_aligned))()
color_t, final_t, nc_t, kl_t = jax.jit(
    lambda: composite_forward_pallas(cfg, astart, astop, attr))()
d_color = jnp.ones_like(color_t) / color_t.size
r0 = final_t * 0.0
d_attr_rows = jax.jit(lambda: composite_backward_pallas(
    cfg, astart, astop, attr, d_color, r0, final_t, kl_t))()


def feed(x):
    """Carry-dependence injector: tiny data-dependent scalar."""
    return jnp.tanh(jnp.sum(x).astype(jnp.float32)) * 1e-20


def stage(name, fn):
    ms = device_time(fn, (jnp.zeros(()),), k=10, rounds=2) * 1e3
    print(f"{name:36s} {ms:8.2f} ms", flush=True)


stage("projection+SH fwd", lambda c, it: (feed(project_gaussians(
    params["means"] + c[0], params["quats"], params["log_scales"],
    params["opacity_logits"], params["sh"], alive, viewmat, intr,
    img_w, img_h, 3, 1.0).means2d),))

stage("binning", lambda c, it: (feed(bin_gaussians(
    proj.replace(depths=proj.depths + c[0]), img_w, img_h, 32, 32,
    cfg.pair_capacity).pair_tile),))


def s_align(c, it):
    a0, a1, ag, av = align_segments(
        binning.tile_start, binning.tile_stop, binning.pair_gauss, p_aligned)
    at = pack_sorted_attrs(ag, proj.means2d + c[0], proj.conic, proj.rgb,
                           proj.opac, p_aligned)
    return (feed(at),)

stage("align+pack", s_align)

stage("pallas fwd kernel", lambda c, it: (feed(composite_forward_pallas(
    cfg, astart, astop, attr + c[0])[0]),))

stage("pallas bwd kernel", lambda c, it: (feed(composite_backward_pallas(
    cfg, astart, astop, attr, d_color + c[0], r0, final_t, kl_t)),))


def s_scatter(c, it):
    d_attr = d_attr_rows[:NUM_ATTR, :].T + c[0]
    valid = avalid & (jnp.arange(d_attr.shape[0]) < astop[-1])
    rows = jnp.where(valid[:, None], d_attr, 0.0)
    safe_g = jnp.where(valid, aligned_gauss, 0)
    acc = jnp.zeros((n, NUM_ATTR), jnp.float32).at[safe_g].add(rows)
    return (feed(acc),)

stage("pair->gauss scatter-add", s_scatter)


def s_comp(c, it):
    def f(m2d, conic, rgb, opac):
        col, t, nc = composite_tiles_pallas(
            cfg, binning.tile_start, binning.tile_stop, binning.pair_gauss,
            m2d, conic, rgb, opac, bg)
        return jnp.sum(col)
    g = jax.grad(f, argnums=(0, 1, 2, 3))(proj.means2d + c[0], proj.conic,
                                          proj.rgb, proj.opac)
    return (feed(g[0]),)

stage("composite fwd+bwd (custom vjp)", s_comp)


def rendr(p):
    return render(p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
                  p["sh"], alive, viewmat, intr, cfg, 3, bg)


def s_fwd_full(c, it):
    p = dict(params, means=params["means"] + c[0])
    return (feed(rendr(p).color),)

stage("full render fwd", s_fwd_full)


def s_vg(c, it):
    p = dict(params, means=params["means"] + c[0])
    def loss_fn(pp):
        return combined_loss(rendr(pp).color, target, 0.2)
    loss, grads = jax.value_and_grad(loss_fn)(p)
    return (feed(grads["means"]) + feed(loss),)

stage("value_and_grad(render+combined)", s_vg)


adam_state = adam_init(params)

def s_step(carry, it):
    p, st = carry
    def loss_fn(pp):
        return combined_loss(rendr(pp).color, target, 0.2)
    loss, grads = jax.value_and_grad(loss_fn)(p)
    p, st = adam_step(AdamConfig(), st, p, grads, it)
    return (p, st)

ms = device_time(s_step, (params, adam_state), k=10, rounds=2) * 1e3
print(f"{'full train step':36s} {ms:8.2f} ms", flush=True)
