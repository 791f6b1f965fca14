"""Quantify pair reduction from (a) circle-vs-rect distance cull and
(b) opacity-aware alpha cull, on the bench scene. Both are pixel-exact:
a pair is culled only if every pixel in the tile would fail the compositor's
alpha >= 1/255 skip test."""
import jax
import jax.numpy as jnp
import numpy as np

from tpugs.ops.binning import tile_rects
from tpugs.ops.projection import project_gaussians
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 489, 272
n = 50_000
tile_w = tile_h = 32
params = synthetic_params(n, seed=0)
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)

proj = jax.jit(lambda p: project_gaussians(
    p["means"], p["quats"], p["log_scales"], p["opacity_logits"], p["sh"],
    alive, viewmat, intr, img_w, img_h, 3, 1.0))(params)

tx0, ty0, w_t, h_t = tile_rects(proj, img_w, img_h, tile_w, tile_h)
tx0, ty0, w_t, h_t = map(np.asarray, (tx0, ty0, w_t, h_t))
m2d = np.asarray(proj.means2d)
conic = np.asarray(proj.conic)  # a, b, c of inverse cov
op = np.asarray(proj.opac)

# lambda_max of Sigma = 1 / lambda_min of conic
a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
lmin_conic = (a + c) / 2 - np.sqrt(((a - c) / 2) ** 2 + b * b)
lam_max = np.where(lmin_conic > 0, 1.0 / np.maximum(lmin_conic, 1e-12), 0.0)
r2_alpha = 2.0 * lam_max * np.log(np.maximum(255.0 * op, 1.0))
r2_3sig = 9.0 * lam_max
r2_cull = np.minimum(r2_alpha, r2_3sig)

total = 0
kept_circle = 0
kept_alpha = 0
for g in range(n):
    if w_t[g] == 0:
        continue
    for ty in range(ty0[g], ty0[g] + h_t[g]):
        for tx in range(tx0[g], tx0[g] + w_t[g]):
            total += 1
            x0, y0 = tx * tile_w, ty * tile_h
            cx = np.clip(m2d[g, 0], x0, x0 + tile_w - 1)
            cy = np.clip(m2d[g, 1], y0, y0 + tile_h - 1)
            d2 = (cx - m2d[g, 0]) ** 2 + (cy - m2d[g, 1]) ** 2
            if d2 <= r2_3sig[g]:
                kept_circle += 1
            if d2 <= r2_cull[g]:
                kept_alpha += 1

print(f"total rect pairs:   {total}")
print(f"circle-cull keeps:  {kept_circle} ({100*kept_circle/total:.1f}%)")
print(f"alpha-cull keeps:   {kept_alpha} ({100*kept_alpha/total:.1f}%)")
print(f"opacity stats: min {op.min():.4f} mean {op.mean():.4f} max {op.max():.4f}")
