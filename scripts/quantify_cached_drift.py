"""Quantify the cached-path approximation at drag scale (VERDICT r5 item 7).

ops/render_cached.py trades exactness for frame rate: tile membership,
compositing order, and SH color stay at the ANCHOR camera while positions/
footprints are re-projected exactly. This script measures the resulting
image error as a function of camera delta from the anchor on the standard
1080p/1M synthetic viewer scene (same scene as bench_render_cached.py).

Trajectory model: an interactive drag orbits the camera around the scene
center. The viewer re-anchors every K frames (K = 8 gives the 31.6 FPS
amortized headline), so the WORST frame of a drag at rate r deg/frame sits
K * r degrees from the anchor. We render cached frames at a ladder of yaw
deltas, compare each against the EXACT frame at the same camera, and report
mean/max per-channel |dC| (0-1 scale) and PSNR.

Reading the table for a cadence: at a typical 0.125 deg/frame drag
(~30 deg over an 8 s sweep at 30 FPS), re-anchor every 8 -> worst frame at
1.0 deg; every 16 -> worst at 2.0 deg.

Run on TPU (the only place the kernels + 1M scene are practical).
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpugs.ops.render import RasterConfig, render
from tpugs.ops.render_cached import build_frame_cache, render_cached
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 1920, 1088
n = 1_000_000
cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
                   pair_capacity=3_407_872, max_hits_per_tile=4096)
params = synthetic_params(n, seed=0, scale_range=(0.002, 0.015))
alive = jnp.ones((n,), bool)
intr = synthetic_intrinsics(img_w, img_h)
bg = jnp.zeros((3,))

# Scene center: synthetic_params places gaussians around the origin a few
# units in front of the camera; orbit about the cloud's mean.
center = np.asarray(jax.jit(lambda m: jnp.mean(m, axis=0))(params["means"]))


def orbit_viewmat(yaw_deg: float) -> jnp.ndarray:
    """Anchor camera (identity) orbited yaw_deg around the scene center's
    vertical axis — the shape of a horizontal drag."""
    th = np.deg2rad(yaw_deg)
    c, s = np.cos(th), np.sin(th)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    # world -> camera: x_cam = R (x - center) + center  (rotate about center)
    vm = np.eye(4, dtype=np.float32)
    vm[:3, :3] = R
    vm[:3, 3] = center - R @ center
    return jnp.asarray(vm)


@jax.jit
def exact_frame(vm):
    out = render(params["means"], params["quats"], params["log_scales"],
                 params["opacity_logits"], params["sh"], alive, vm, intr,
                 cfg, 3, bg, need_grads=False, presort="fastest")
    return out.color


@jax.jit
def cached_frame(cache, vm):
    color, _ = render_cached(cache, vm, intr, cfg, bg)
    return color


anchor_vm = orbit_viewmat(0.0)
cache = jax.jit(
    lambda p: build_frame_cache(
        p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
        p["sh"], alive, anchor_vm, intr, cfg, 3,
    )
)(params)
print(f"pairs {int(cache.num_pairs)}  overflow {bool(cache.pair_overflow)}",
      flush=True)

print(f"{'yaw_deg':>8} {'mean|dC|':>10} {'max|dC|':>9} {'PSNR_dB':>8}"
      f"   (cached vs exact at the same camera)")
for yaw in [0.0, 0.125, 0.25, 0.5, 1.0, 2.0, 4.0]:
    vm = orbit_viewmat(yaw)
    ex = np.asarray(exact_frame(vm))
    ca = np.asarray(cached_frame(cache, vm))
    d = np.abs(ca - ex)
    mse = float(np.mean((ca - ex) ** 2))
    psnr = 10.0 * np.log10(1.0 / mse) if mse > 0 else float("inf")
    print(f"{yaw:8.3f} {float(d.mean()):10.6f} {float(d.max()):9.4f} "
          f"{psnr:8.2f}", flush=True)
