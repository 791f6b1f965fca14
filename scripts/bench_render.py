"""Pure forward render throughput (the viewer workload): 1080p, 1M Gaussians.

Reference viewer target: >=30 FPS @1080p with ~1M Gaussians on an RTX 3060
(ROADMAP.md:766-768); measured 0.7 FPS before optimization on 50k
(docs/issues.md:367)."""
import os
import time

import jax
import jax.numpy as jnp

from tpugs.ops.render import RasterConfig, render
from tpugs.utils.profiling import device_time
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 1920, 1088
n = 1_000_000
# Tile 64x32 is the r3 ladder winner (scripts/sweep_viewer_tiles.py: 118 ms
# vs 131 at 32x32); capacity 1.05x the scene's 2.03M pairs (every [P]-sized
# binning op scales with capacity — overflow asserted below), max_hits above
# the busiest tile's 6389 entries (no truncation).
cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=64, tile_w=32,
                   pair_capacity=2_129_920, max_hits_per_tile=8192)
# Realistic trained-scene statistics: a converged 1M-Gaussian model has
# few-pixel screen footprints (the default synthetic scale_range is sized for
# ~0.13 Mpix views and produces a pathological 19.7M pairs at 1080p).
params = synthetic_params(n, seed=0, scale_range=(0.002, 0.015))
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.zeros((3,))


def frame(c, it):
    # params ride the carry: closed-over 1M-row arrays (~250 MB) become HLO
    # constants and blow up the tunneled remote-compile request; the +z
    # perturbation keeps the stage carry-dependent (hoisting hazard,
    # docs/PERF_NOTES.md).
    z, p = c
    out = render(p["means"] + z, p["quats"], p["log_scales"],
                 p["opacity_logits"], p["sh"], alive, viewmat, intr,
                 cfg, 3, bg, need_grads=False,
                 presort=os.environ.get("PRESORT", "fastest"),
                 carry_attrs=os.environ.get("CARRY_ATTRS", "0") == "1")
    return (jnp.tanh(jnp.sum(out.color)) * 1e-20, p)


ms = device_time(frame, (jnp.zeros(()), params), k=10, rounds=2) * 1e3
print(f"1080p 1M-gaussian forward render: {ms:.2f} ms/frame = {1e3/ms:.1f} FPS",
      flush=True)

# Honesty check: the tuned capacity must cover this scene exactly.
out = jax.jit(lambda p: render(p["means"], p["quats"], p["log_scales"],
                               p["opacity_logits"], p["sh"], alive, viewmat,
                               intr, cfg, 3, bg, need_grads=False))(params)
assert not bool(out.pair_overflow), f"pair overflow ({int(out.num_pairs)})"
assert not bool(out.hit_overflow), (
    f"hit overflow ({int(out.max_tile_hits)} in busiest tile)")
