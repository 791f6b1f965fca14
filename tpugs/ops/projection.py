"""Stage 1 — project all Gaussians to screen space (vectorized, differentiable).

The reference runs this one-CUDA-thread-per-Gaussian with a hand-written
backward kernel (reference: src/rasterizer/projection.cu:60-188,
projection_backward.cu). Here it is plain batched jnp: XLA vectorizes it over
the whole array on the VPU and autodiff provides the exact backward, including
the reference's zero-gradient gates (culled entries are where-guarded).

Culling writes masks instead of early returns: `visible` is False for dead
slots, near-plane culls (z <= 0.2), degenerate 2D covariances (det <= 0), and
zero radii. radii is 0 for culled entries, matching the reference contract
used by densification (radii > 0 == "visible this frame").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from tpugs.core import sh as sh_lib
from tpugs.core import transforms as tf


@struct.dataclass
class ProjectionOutput:
    """Per-Gaussian screen-space quantities (reference: projection.hpp:15-23)."""

    means2d: jnp.ndarray  # [N, 2] pixel coords
    depths: jnp.ndarray  # [N] camera-space z
    conic: jnp.ndarray  # [N, 3] inverse 2D covariance (a, b, c)
    radii: jnp.ndarray  # [N] int32 pixel radius, 0 = culled
    rgb: jnp.ndarray  # [N, 3] SH-evaluated color, clamped >= 0
    opac: jnp.ndarray  # [N] activated (sigmoid) opacity
    visible: jnp.ndarray  # [N] bool


def project_gaussians(
    means: jnp.ndarray,
    quats: jnp.ndarray,
    log_scales: jnp.ndarray,
    opacity_logits: jnp.ndarray,
    sh: jnp.ndarray,
    alive: jnp.ndarray,
    viewmat: jnp.ndarray,
    intrinsics: jnp.ndarray,
    img_w: int,
    img_h: int,
    sh_degree: int,
    scale_modifier: float = 1.0,
) -> ProjectionOutput:
    """Project [N]-batched Gaussians through a 4x4 world->camera matrix.

    intrinsics = (fx, fy, cx, cy). `sh_degree` and image dims are static.
    """
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    W = viewmat[:3, :3]

    t_cam = tf.world_to_camera_points(means, viewmat)  # [N, 3]
    tz = t_cam[..., 2]
    in_front = tz > tf.NEAR_PLANE
    safe_z = jnp.where(in_front, tz, 1.0)

    x_screen = fx * t_cam[..., 0] / safe_z + cx
    y_screen = fy * t_cam[..., 1] / safe_z + cy
    means2d = jnp.stack([x_screen, y_screen], axis=-1)

    # Guard the EWA Jacobian against z ~ 0 for culled points.
    t_guard = jnp.where(in_front[..., None], t_cam, jnp.ones_like(t_cam))
    # Fused component-wise EWA chain — same math as
    # compute_cov2d(compute_cov3d(...)) but no [N,3,3]/[N,2,3] intermediates
    # (those compile to bf16 MXU batched tiny dots + layout copies, ~36 ms
    # per 1M-gaussian frame; see ewa_cov2d_scalar).
    cov2d = tf.ewa_cov2d_scalar(
        log_scales, quats, W, t_guard, fx, fy, scale_modifier
    )
    conic, det = tf.inv_cov2d(cov2d)

    radius = tf.radius_from_cov2d(cov2d)
    # Cap: one Gaussian may not cover more than the whole image
    # (reference: projection.cu:164-167).
    radius = jnp.minimum(radius, max(img_w, img_h))

    visible = alive & in_front & (det > 0.0) & (radius > 0)
    radii = jnp.where(visible, radius, 0)

    opac = jnp.where(alive, jax.nn.sigmoid(opacity_logits), 0.0)

    # View-dependent color: SH evaluated along normalize(mean - camera_center),
    # clamped at 0 (reference: projection.cu:271-284). The direction is treated
    # as a constant w.r.t. position, matching the reference's "no grad through
    # SH direction" choice (reference: ROADMAP.md:380).
    cam_center = -viewmat[:3, :3].T @ viewmat[:3, 3]
    dirs = means - cam_center
    dirs = dirs / jnp.sqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-12)
    dirs = jax.lax.stop_gradient(dirs)
    rgb = jnp.maximum(sh_lib.eval_sh(sh_degree, sh, dirs), 0.0)

    return ProjectionOutput(
        means2d=means2d,
        depths=tz,
        conic=conic,
        radii=radii,
        rgb=rgb,
        opac=opac,
        visible=visible,
    )
