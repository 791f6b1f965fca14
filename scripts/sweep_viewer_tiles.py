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


def bench(th, tw, cap, max_hits=4096):
    cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=th, tile_w=tw,
                       pair_capacity=cap, max_hits_per_tile=max_hits)

    def frame(c, it):
        z, p = c
        out = render(p["means"] + z, p["quats"], p["log_scales"],
                     p["opacity_logits"], p["sh"], alive, viewmat, intr,
                     cfg, 3, bg, need_grads=False, presort="fastest")
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


# Round-2 (lane-wave geometry): 32x32 = 221-261 ms best; 16x32 = 291 ms;
# pix>=2048 tiles failed scoped-VMEM compile — the (pix, 1) per-pixel
# carries/outputs are lane-padded 128x by Mosaic (composite._fwd_pix_limit).
# Round-3 transposed geometry (pixels on lanes) lifts that: every tile-size
# doubling halves the pair count, so sweep the whole ladder.
# Honest r3 ladder (exact caps, presort="exact"): 32x32 187.2 / 32x64 175.9
# / 64x32 176.0 / 64x64 188.1 / 64x128 227.1 ms. With presort=auto (off at
# 1M): 32x32 131.4 / 32x64 119.0 / 64x32 118.3 / 64x64 130.4. After the
# scalar EWA chain + Pallas expand kernel the [P]-plumbing collapsed and
# the composite kernel (which evaluates every entry against ALL tile
# pixels) dominates — smaller tiles trade pair count for lane utilization,
# so sweep down the ladder too:
bench(16, 32, 4_194_304)                   # pix 512
bench(16, 64, 3_407_872)                   # pix 1024
bench(32, 32, 3_407_872)                   # pairs 2.56M, max/tile 3878
bench(32, 64, 2_621_440, max_hits=8192)    # pairs 2.03M, max/tile 6415
bench(64, 32, 2_621_440, max_hits=8192)    # pairs 2.03M, max/tile 6389
bench(64, 64, 2_097_152, max_hits=16384)   # pairs 1.61M, max/tile 10611
