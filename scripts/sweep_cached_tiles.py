"""Tile-shape ladder for the CACHED viewer path (ops/render_cached.py).

The exact frame's ladder optimum (64x32) balances composite work against the
[P]-sized binning plumbing. A cached frame pays NO per-frame plumbing — its
cost is ~composite + [P_al]-elementwise re-projection — so the optimum moves
toward SMALLER tiles (composite work ~ pairs x tile_pixels falls even as the
pair count rises). Refresh cost moves the other way; print both.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpugs.ops.render import RasterConfig
from tpugs.ops.render_cached import build_frame_cache, render_cached
from tpugs.utils.profiling import device_time
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 1920, 1088
n = 1_000_000
params = synthetic_params(n, seed=0, scale_range=(0.002, 0.015))
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.zeros((3,))


def bench(th, tw, cap, max_hits=8192):
    cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=th, tile_w=tw,
                       pair_capacity=cap, max_hits_per_tile=max_hits)

    def build(p, z):
        return build_frame_cache(
            p["means"] + z, p["quats"], p["log_scales"], p["opacity_logits"],
            p["sh"], alive, viewmat, intr, cfg, 3,
        )

    try:
        cache = jax.jit(lambda p: build(p, jnp.zeros(())))(params)

        def cached_frame(c, it):
            z, cc = c
            color, _ = render_cached(cc, viewmat + z, intr, cfg, bg)
            return (jnp.tanh(jnp.sum(color)) * 1e-20, cc)

        ms = device_time(cached_frame, (jnp.zeros(()), cache), k=8,
                         rounds=2) * 1e3

        def refresh(c, it):
            z, p = c
            cc = build(p, z)
            return (jnp.tanh(jnp.sum(cc.static_attr[0])) * 1e-20, p)

        ms_r = device_time(refresh, (jnp.zeros(()), params), k=4,
                           rounds=2) * 1e3
    except Exception as e:
        print(f"tile {th}x{tw} cap {cap:>8}: FAILED {type(e).__name__}: "
              f"{str(e)[:120]}", flush=True)
        return
    print(f"tile {th:>2}x{tw:<2} cap {cap:>8}: cached {ms:7.2f} ms = "
          f"{1e3 / ms:5.1f} FPS | refresh {ms_r:6.1f} ms | amortized/8 "
          f"{ms + ms_r / 8:6.2f} | pairs {int(cache.num_pairs):>8} "
          f"max/tile {int(cache.max_tile_hits)} "
          f"ovf {bool(cache.pair_overflow)}", flush=True)


bench(16, 16, 5_242_880, max_hits=2048)
bench(16, 32, 4_194_304, max_hits=4096)
bench(32, 32, 3_407_872, max_hits=4096)
bench(32, 16, 4_194_304, max_hits=2048)
bench(64, 32, 2_621_440, max_hits=8192)
