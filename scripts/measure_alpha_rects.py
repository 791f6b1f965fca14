"""Effect of alpha-aware tile rects (min(3-sigma, alpha radius)) on the
viewer workload: pair-count reduction -> capacity right-sizing -> FPS."""
import jax
import jax.numpy as jnp
import numpy as np

from tpugs.ops.render import RasterConfig, render
from tpugs.utils.profiling import device_time
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 1920, 1088
n = 1_000_000
params = synthetic_params(n, seed=0, scale_range=(0.002, 0.015))
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.zeros((3,))

probe_cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
                         pair_capacity=1 << 22, max_hits_per_tile=4096)
out = jax.jit(lambda p: render(
    p["means"], p["quats"], p["log_scales"], p["opacity_logits"], p["sh"],
    alive, viewmat, intr, probe_cfg, 3, bg))(params)
pairs = int(out.num_pairs)
print(f"alpha-rect pairs: {pairs} (was 2598198 with 3-sigma rects) "
      f"max/tile {int(out.max_tile_hits)}", flush=True)

cap = (int(pairs * 1.3) // 512 + 1) * 512
cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
                   pair_capacity=cap, max_hits_per_tile=4096)


def frame(c, it):
    z, p = c
    o = render(p["means"] + z, p["quats"], p["log_scales"],
               p["opacity_logits"], p["sh"], alive, viewmat, intr,
               cfg, 3, bg)
    return (jnp.tanh(jnp.sum(o.color)) * 1e-20, p)


ms = device_time(frame, (jnp.zeros(()), params), k=8, rounds=2) * 1e3
print(f"capacity {cap}: {ms:.2f} ms/frame = {1e3/ms:.1f} FPS", flush=True)

# Exactness vs the wide-capacity render
img2 = np.asarray(jax.jit(lambda p: render(
    p["means"], p["quats"], p["log_scales"], p["opacity_logits"], p["sh"],
    alive, viewmat, intr, cfg, 3, bg))(params).color)
err = np.abs(img2 - np.asarray(out.color)).max()
print(f"max |dC| vs 4.2M-capacity render: {err:.3e}", flush=True)
