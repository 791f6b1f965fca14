"""Tile-size / pair-capacity sweep of the full train step on the bench scene."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpugs.ops.binning import bin_gaussians, tile_rects
from tpugs.ops.projection import project_gaussians
from tpugs.ops.render import RasterConfig, render
from tpugs.optim.adam import AdamConfig, adam_init, adam_step
from tpugs.train.loss import combined_loss
from tpugs.utils.profiling import device_time
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 489, 272
n = 50_000
params = synthetic_params(n, seed=0)
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.zeros((3,))
target = jax.random.uniform(jax.random.PRNGKey(0), (img_h, img_w, 3))
adam_cfg = AdamConfig()

CHUNK = 512

for tile_h, tile_w in [(32, 64), (64, 32), (48, 32)]:
    # measure actual pairs for this tile size
    proj = jax.jit(lambda p: project_gaussians(
        p["means"], p["quats"], p["log_scales"], p["opacity_logits"], p["sh"],
        alive, viewmat, intr, img_w, img_h, 3, 1.0))(params)
    _, _, w_t, h_t = jax.jit(lambda pr: tile_rects(
        pr, img_w, img_h, tile_w, tile_h))(proj)
    pairs = int(jnp.sum(w_t * h_t))
    cap = -(-int(pairs * 1.15) // CHUNK) * CHUNK  # 15% headroom, CHUNK-aligned
    cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=tile_h, tile_w=tile_w,
                       pair_capacity=cap, max_hits_per_tile=1024)

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

    ms = device_time(s_step, (params, adam_state), k=10, rounds=2) * 1e3
    print(f"tile {tile_h:2d}x{tile_w:2d}  pairs={pairs:7d} cap={cap:7d} "
          f"tiles={cfg.num_tiles:4d}  step {ms:7.2f} ms", flush=True)
