"""Viewer-workload tile-shape sweep (1080p, 1M Gaussians, realistic
footprints): bigger tiles = fewer (tile, gaussian) pairs (every [P]-sized op
shrinks) but more masked pixels per wave — measure end-to-end."""
import jax
import jax.numpy as jnp

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


def bench(th, tw, cap):
    cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=th, tile_w=tw,
                       pair_capacity=cap, max_hits_per_tile=4096)

    def frame(c, it):
        z, p = c
        out = render(p["means"] + z, p["quats"], p["log_scales"],
                     p["opacity_logits"], p["sh"], alive, viewmat, intr,
                     cfg, 3, bg)
        return (jnp.tanh(jnp.sum(out.color)) * 1e-20, p)

    try:
        ms = device_time(frame, (jnp.zeros(()), params), k=6, rounds=2) * 1e3
    except Exception as e:
        print(f"tile {th}x{tw} cap {cap:>8}: FAILED {type(e).__name__}: "
              f"{str(e)[:120]}", flush=True)
        return
    out = jax.jit(
        lambda p: render(p["means"], p["quats"], p["log_scales"],
                         p["opacity_logits"], p["sh"], alive, viewmat, intr,
                         cfg, 3, bg), static_argnums=()
    )(params)
    print(f"tile {th}x{tw} cap {cap:>8}: {ms:7.2f} ms = {1e3/ms:4.1f} FPS  "
          f"pairs {int(out.num_pairs):>8} max/tile {int(out.max_tile_hits)} "
          f"ovf {bool(out.pair_overflow)}", flush=True)


# Measured 2026-08-17 (1080p/1M realistic footprints): 32x32 = 221-261 ms
# best; 16x32 = 291 ms; pix>=2048 tiles fail scoped-VMEM compile regardless
# of pixel sub-blocking — the (pix, 1) per-pixel carries/outputs are
# lane-padded 128x by Mosaic (root cause; see composite._fwd_pix_limit and
# docs/NEXT.md).
bench(32, 32, 3_407_872)   # reference point
bench(32, 64, 2_621_440)   # half the tile columns (fails: VMEM, see above)
bench(64, 64, 2_097_152)   # (fails: VMEM)
