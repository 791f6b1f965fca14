"""Oracle renderer — O(N * H * W) dense compositing, differentiable by autodiff.

This is the trusted reference for the tiled/Pallas rasterizer: it implements
*exactly* the compositing semantics of the reference CUDA forward kernel
(reference: src/rasterizer/forward.cu:80-180) with no tiling, so `jax.grad`
through it is the gradient oracle the analytic backward is checked against
(the role the finite-difference suite plays in reference tests/test_backward.cpp).

Semantics reproduced exactly:
- global front-to-back depth order;
- skip if power > 0;
- alpha = min(opac * exp(power), 0.99), skip if alpha < 1/255;
- a pixel stops compositing once its transmittance drops below 1/255
  (the Gaussian that drops it below IS composited, subsequent ones are not);
- final color = accumulated + T_final * background.

Only for tests / small scenes: it materializes [N, H*W].
"""
from __future__ import annotations

import jax.numpy as jnp

from tpugs.ops.projection import ProjectionOutput

ALPHA_CLAMP = 0.99
ALPHA_MIN = 1.0 / 255.0
T_THRESHOLD = 1.0 / 255.0


def composite_dense(
    means2d, conic, rgb, opac, visible, depths, radii,
    img_h: int, img_w: int, background, tile_h: int = 16, tile_w: int = 16,
):
    """Dense front-to-back compositing. Returns (color [H,W,3], final_T [H,W],
    n_contrib [H,W] int32).

    Tile-membership semantics: like the CUDA rasterizer, a Gaussian is only
    composited against pixels whose tile lies inside its 3-sigma tile rect
    (reference: projection.cu:172-188 + forward.cu tile lists) — so the oracle
    is the exact semantic spec of the tiled renderer.
    """
    n = means2d.shape[0]
    # Depth order, invisible last.
    order = jnp.argsort(jnp.where(visible, depths, jnp.inf))
    xy = means2d[order]
    con = conic[order]
    col = rgb[order]
    op = opac[order]
    vis = visible[order]
    rad = radii[order].astype(jnp.float32)

    px = jnp.arange(img_w, dtype=jnp.float32)[None, :]  # [1, W]
    py = jnp.arange(img_h, dtype=jnp.float32)[:, None]  # [H, 1]
    dx = px[None] - xy[:, 0, None, None]  # [N, H, W]
    dy = py[None] - xy[:, 1, None, None]
    a = con[:, 0, None, None]
    b = con[:, 1, None, None]
    c = con[:, 2, None, None]
    power = -0.5 * (dx * (a * dx + b * dy) + dy * (b * dx + c * dy))

    alpha = jnp.minimum(op[:, None, None] * jnp.exp(jnp.minimum(power, 0.0)), ALPHA_CLAMP)

    # Tile-rect membership (same int math as binning.tile_rects).
    x, y = xy[:, 0], xy[:, 1]
    tx0 = jnp.clip(jnp.floor(x - rad), 0, img_w).astype(jnp.int32) // tile_w
    ty0 = jnp.clip(jnp.floor(y - rad), 0, img_h).astype(jnp.int32) // tile_h
    rmx = jnp.clip(jnp.floor(x + rad + 1.0), 0, img_w).astype(jnp.int32)
    rmy = jnp.clip(jnp.floor(y + rad + 1.0), 0, img_h).astype(jnp.int32)
    tx1 = jnp.minimum(-(-img_w // tile_w), -(-rmx // tile_w))
    ty1 = jnp.minimum(-(-img_h // tile_h), -(-rmy // tile_h))
    ptx = (jnp.arange(img_w) // tile_w)[None, None, :]  # [1, 1, W]
    pty = (jnp.arange(img_h) // tile_h)[None, :, None]  # [1, H, 1]
    member = (
        (ptx >= tx0[:, None, None]) & (ptx < tx1[:, None, None])
        & (pty >= ty0[:, None, None]) & (pty < ty1[:, None, None])
    )

    valid = vis[:, None, None] & member & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha_eff = jnp.where(valid, alpha, 0.0)

    # Transmittance before each Gaussian: exclusive cumprod over depth order.
    log1m = jnp.log1p(-alpha_eff)  # alpha <= 0.99 so this is finite
    t_before = jnp.exp(jnp.cumsum(log1m, axis=0) - log1m)  # exclusive
    gate = t_before >= T_THRESHOLD

    contrib = valid & gate
    w = jnp.where(contrib, alpha_eff * t_before, 0.0)  # [N, H, W]
    color = jnp.einsum("nhw,nc->hwc", w, col)
    final_t = jnp.exp(jnp.sum(jnp.where(contrib, log1m, 0.0), axis=0))
    n_contrib = jnp.sum(contrib, axis=0).astype(jnp.int32)

    color = color + final_t[..., None] * background[None, None, :]
    return color, final_t, n_contrib


def render_reference(
    proj: ProjectionOutput, img_h: int, img_w: int, background,
    tile_h: int = 16, tile_w: int = 16,
):
    """Render from projection outputs with the dense oracle compositor."""
    return composite_dense(
        proj.means2d,
        proj.conic,
        proj.rgb,
        proj.opac,
        proj.visible,
        proj.depths,
        proj.radii,
        img_h,
        img_w,
        jnp.asarray(background, jnp.float32),
        tile_h=tile_h,
        tile_w=tile_w,
    )
