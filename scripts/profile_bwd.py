"""Backward-path breakdown on the bench workload."""
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
color_t, final_t, nc_t, kl_t = jax.jit(
    lambda: composite_forward_pallas(cfg, astart, astop, attr))()
d_color = jnp.ones_like(color_t) / color_t.size
r0 = final_t * 0.0
print(f"p_aligned={p_aligned}  num_pairs={int(binning.num_pairs)}  "
      f"astop[-1]={int(astop[-1])}")


def stage(name, fn, carry):
    ms = device_time(fn, carry, k=10, rounds=2) * 1e3
    print(f"{name:34s} {ms:8.2f} ms")


# 1. bwd pallas kernel alone
def s_bwdk(c, it):
    d_attr = composite_backward_pallas(cfg, astart, astop, attr, d_color, r0,
                                       final_t, kl_t)
    return (c[0] + d_attr[0, 0],)

stage("pallas bwd kernel", s_bwdk, (jnp.zeros(()),))


# 2. scatter-add reduction alone
d_attr_rows = jax.jit(lambda: composite_backward_pallas(
    cfg, astart, astop, attr, d_color, r0, final_t, kl_t))()

def s_scatter(c, it):
    d_attr = d_attr_rows[:NUM_ATTR, :].T
    valid = avalid & (jnp.arange(d_attr.shape[0]) < astop[-1])
    rows = jnp.where(valid[:, None], d_attr, 0.0)
    safe_g = jnp.where(valid, aligned_gauss, 0)
    acc = jnp.zeros((n, NUM_ATTR), jnp.float32).at[safe_g].add(rows)
    return (c[0] + acc[0, 0],)

stage("pair->gauss scatter-add", s_scatter, (jnp.zeros(()),))


# 3. composite fwd+bwd via custom vjp (includes align+pack in fwd)
def s_comp(c, it):
    def f(m2d, conic, rgb, opac):
        col, t, nc = composite_tiles_pallas(
            cfg, binning.tile_start, binning.tile_stop, binning.pair_gauss,
            m2d, conic, rgb, opac, bg)
        return jnp.sum(col)
    g = jax.grad(f, argnums=(0, 1, 2, 3))(proj.means2d, proj.conic, proj.rgb,
                                          proj.opac)
    return (c[0] + g[0][0, 0],)

stage("composite fwd+bwd (custom vjp)", s_comp, (jnp.zeros(()),))


# 4. projection fwd+bwd (autodiff through EWA + SH)
def s_projb(c, it):
    def f(p):
        pr = project_gaussians(
            p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
            p["sh"], alive, viewmat, intr, img_w, img_h, 3, 1.0)
        return (jnp.sum(pr.means2d) + jnp.sum(pr.conic) + jnp.sum(pr.rgb)
                + jnp.sum(pr.opac))
    g = jax.grad(f)(params)
    return (c[0] + g["means"][0, 0],)

stage("projection fwd+bwd", s_projb, (jnp.zeros(()),))


# 5. ssim loss fwd+bwd on a fixed image
img0 = jax.random.uniform(jax.random.PRNGKey(1), (img_h, img_w, 3))

def s_ssim(c, it):
    g = jax.grad(lambda im: combined_loss(im, target, 0.2))(img0 + c[0])
    return (jnp.sum(g) * 0.0,)

stage("loss fwd+bwd", s_ssim, (jnp.zeros(()),))


# 6. full render fwd+bwd (sum-of-color loss; no ssim)
def s_render_fb(c, it):
    def f(p):
        out = render(p["means"], p["quats"], p["log_scales"],
                     p["opacity_logits"], p["sh"], alive, viewmat, intr,
                     cfg, 3, bg)
        return jnp.sum(out.color)
    g = jax.grad(f)(params)
    return (c[0] + g["means"][0, 0],)

stage("render fwd+bwd (sum loss)", s_render_fb, (jnp.zeros(()),))
