"""Cached-frame viewer throughput (ops/render_cached.py) at 1080p / 1M.

Measures, with the honest scan clock (docs/PERF_NOTES.md):
  1. the exact full frame (reference point — bench_render.py's number);
  2. one CACHED frame (per-pair re-projection + composite, no binning);
  3. one cache REFRESH (build_frame_cache);
and prints the refresh-amortized frame time for several re-anchor periods.

The per-frame viewmat is perturbed by a carry-dependent epsilon so the
projection chain cannot be hoisted out of the measuring scan; the cache's
~170 MB static table rides the carry (closed-over arrays become HLO
constants and overflow the tunneled remote-compile request).
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpugs.ops.render import RasterConfig, render
from tpugs.ops.render_cached import build_frame_cache, render_cached
from tpugs.utils.profiling import device_time
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 1920, 1088
n = 1_000_000
# 32x32 wins the CACHED ladder (scripts/sweep_cached_tiles.py: 24.9 ms vs
# 31.9 at the exact path's 64x32): cached frames pay no per-frame
# [P]-plumbing, so smaller tiles trade pair count for composite work.
cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
                   pair_capacity=3_407_872, max_hits_per_tile=4096)
params = synthetic_params(n, seed=0, scale_range=(0.002, 0.015))
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.zeros((3,))


def exact_frame(c, it):
    z, p = c
    out = render(p["means"] + z, p["quats"], p["log_scales"],
                 p["opacity_logits"], p["sh"], alive, viewmat, intr,
                 cfg, 3, bg, need_grads=False, presort="fastest")
    return (jnp.tanh(jnp.sum(out.color)) * 1e-20, p)


def cached_frame(c, it):
    z, cache = c
    vm = viewmat + z  # carry-dependent camera: no hoisting
    color, _ = render_cached(cache, vm, intr, cfg, bg)
    return (jnp.tanh(jnp.sum(color)) * 1e-20, cache)


def refresh(c, it):
    z, p = c
    cache = build_frame_cache(
        p["means"] + z, p["quats"], p["log_scales"], p["opacity_logits"],
        p["sh"], alive, viewmat, intr, cfg, 3,
    )
    return (jnp.tanh(jnp.sum(cache.static_attr[0])) * 1e-20, p)


cache = jax.jit(
    lambda p: build_frame_cache(
        p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
        p["sh"], alive, viewmat, intr, cfg, 3,
    )
)(params)
print(f"pairs {int(cache.num_pairs)}  overflow {bool(cache.pair_overflow)}  "
      f"max/tile {int(cache.max_tile_hits)}", flush=True)

ms_cached = device_time(cached_frame, (jnp.zeros(()), cache), k=8, rounds=2) * 1e3
print(f"cached frame : {ms_cached:7.2f} ms = {1e3 / ms_cached:5.1f} FPS", flush=True)

ms_exact = device_time(exact_frame, (jnp.zeros(()), params), k=6, rounds=2) * 1e3
print(f"exact frame  : {ms_exact:7.2f} ms = {1e3 / ms_exact:5.1f} FPS", flush=True)

ms_refresh = device_time(refresh, (jnp.zeros(()), params), k=4, rounds=2) * 1e3
print(f"cache refresh: {ms_refresh:7.2f} ms", flush=True)

for m in (4, 8, 16):
    amort = ms_cached + ms_refresh / m
    print(f"amortized (re-anchor every {m:2d}): {amort:6.2f} ms = "
          f"{1e3 / amort:5.1f} FPS", flush=True)
