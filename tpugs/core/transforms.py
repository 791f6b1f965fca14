"""Core 3DGS geometry: quaternions, covariances, EWA projection.

Pure, vectorized jax.numpy — differentiable end-to-end by autodiff. Semantics
mirror the reference CUDA device math (reference: src/rasterizer/projection.cuh)
but are written batch-first so XLA vectorizes them over the whole Gaussian array
instead of one-thread-per-Gaussian scalar code.

Conventions
-----------
- Quaternions are (w, x, y, z) and are normalized before use.
- 2x2 symmetric matrices are packed as (a, b, c) == [[a, b], [b, c]] in a
  trailing dim of size 3 ("conic" when it is the inverse covariance).
- 3x3 symmetric covariances are kept as full [..., 3, 3] (XLA is happy with
  small trailing matmul dims; no need for the 6-value upper-triangle packing
  the CUDA code uses to save registers).
"""
from __future__ import annotations

import jax.numpy as jnp

# Low-pass filter added to the projected 2D covariance (EWA anti-aliasing),
# reference: src/rasterizer/projection.cuh:162-164.
COV2D_LOWPASS = 0.3
# Near-plane cull distance, reference: src/rasterizer/projection.cu:104.
NEAR_PLANE = 0.2


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(w,x,y,z) quaternion [..., 4] -> rotation matrix [..., 3, 3].

    Normalizes the quaternion first (reference: projection.cuh:28-49).
    """
    q = q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def compute_cov3d(
    log_scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float = 1.0
) -> jnp.ndarray:
    """3D covariance Sigma = M M^T with M = R diag(exp(log_s * mod)).

    log_scales [..., 3], quats [..., 4] -> [..., 3, 3].
    Reference: projection.cuh:65-90; the scale modifier is applied in log space
    (projection.cu:128-132).
    """
    s = jnp.exp(log_scales + jnp.log(scale_modifier + 1e-8))
    R = quat_to_rotmat(quats)
    M = R * s[..., None, :]  # M[i][j] = R[i][j] * s[j]
    return M @ jnp.swapaxes(M, -1, -2)


def perspective_jacobian(t_cam: jnp.ndarray, fx, fy) -> jnp.ndarray:
    """Jacobian of pinhole projection at camera-space point t [..., 3] -> [..., 2, 3].

    J = [[fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2]]
    (reference: projection.cuh:126-141, incl. the 1e-6 z-guard).
    """
    tx, ty, tz = t_cam[..., 0], t_cam[..., 1], t_cam[..., 2]
    tz_inv = 1.0 / (tz + 1e-6)
    tz_inv2 = tz_inv * tz_inv
    zero = jnp.zeros_like(tx)
    row0 = jnp.stack([fx * tz_inv, zero, -fx * tx * tz_inv2], axis=-1)
    row1 = jnp.stack([zero, fy * tz_inv, -fy * ty * tz_inv2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def compute_cov2d(
    cov3d: jnp.ndarray,
    W: jnp.ndarray,
    t_cam: jnp.ndarray,
    fx,
    fy,
) -> jnp.ndarray:
    """EWA projection Sigma' = J W Sigma W^T J^T + 0.3 I -> packed (a, b, c) [..., 3].

    W is the world->camera rotation [3, 3] (broadcast over the batch).
    Reference: projection.cuh:113-165.
    """
    J = perspective_jacobian(t_cam, fx, fy)  # [..., 2, 3]
    T = J @ W  # [..., 2, 3]
    cov = T @ cov3d @ jnp.swapaxes(T, -1, -2)  # [..., 2, 2]
    a = cov[..., 0, 0] + COV2D_LOWPASS
    b = cov[..., 0, 1]
    c = cov[..., 1, 1] + COV2D_LOWPASS
    return jnp.stack([a, b, c], axis=-1)


def radius_from_cov2d(cov2d: jnp.ndarray) -> jnp.ndarray:
    """3-sigma pixel radius from packed 2D covariance [..., 3] -> int32 [...].

    ceil(3 * sqrt(lambda_max)); 0 if degenerate (reference: projection.cuh:178-195).
    """
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    trace = a + c
    disc = jnp.maximum(trace * trace - 4.0 * det, 0.0)
    lam_max = 0.5 * (trace + jnp.sqrt(disc))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam_max, 0.0)))
    return jnp.where(lam_max > 0.0, radius, 0.0).astype(jnp.int32)


def inv_cov2d(cov2d: jnp.ndarray):
    """Inverse of packed symmetric 2x2 [..., 3] -> (conic [..., 3], det [...]).

    Entries are zeroed where det <= 0 (degenerate — caller culls those;
    reference: projection.cuh:208-226). Division is double-where guarded so
    autodiff produces no NaNs for culled entries.
    """
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    ok = det > 0.0
    safe_det = jnp.where(ok, det, 1.0)
    inv_det = jnp.where(ok, 1.0 / safe_det, 0.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)
    return conic, det


def world_to_camera_points(positions: jnp.ndarray, viewmat: jnp.ndarray) -> jnp.ndarray:
    """Transform world points [..., 3] by a 4x4 world->camera matrix."""
    return positions @ viewmat[:3, :3].T + viewmat[:3, 3]


def cov3d_components(log_scales, quats, scale_modifier: float = 1.0):
    """Static half of the component-wise EWA chain: the 6 unique entries of
    Sigma = M M^T packed as [..., 6] = (c00, c01, c02, c11, c12, c22).

    Camera-independent — the viewer's cached-frame path precomputes this per
    (tile, gaussian) pair once per binning refresh (ops/render_cached.py)."""
    s = jnp.exp(log_scales + jnp.log(scale_modifier + 1e-8))  # [N, 3]
    q = quats / jnp.sqrt(jnp.sum(quats * quats, -1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    s0, s1, s2 = s[..., 0], s[..., 1], s[..., 2]
    # M = R diag(s), m_ij = r_ij * s_j (reference: projection.cuh:65-90).
    m00 = (1.0 - 2.0 * (y * y + z * z)) * s0
    m01 = (2.0 * (x * y - w * z)) * s1
    m02 = (2.0 * (x * z + w * y)) * s2
    m10 = (2.0 * (x * y + w * z)) * s0
    m11 = (1.0 - 2.0 * (x * x + z * z)) * s1
    m12 = (2.0 * (y * z - w * x)) * s2
    m20 = (2.0 * (x * z - w * y)) * s0
    m21 = (2.0 * (y * z + w * x)) * s1
    m22 = (1.0 - 2.0 * (x * x + y * y)) * s2
    # Sigma = M M^T, 6 unique components.
    c00 = m00 * m00 + m01 * m01 + m02 * m02
    c01 = m00 * m10 + m01 * m11 + m02 * m12
    c02 = m00 * m20 + m01 * m21 + m02 * m22
    c11 = m10 * m10 + m11 * m11 + m12 * m12
    c12 = m10 * m20 + m11 * m21 + m12 * m22
    c22 = m20 * m20 + m21 * m21 + m22 * m22
    return jnp.stack([c00, c01, c02, c11, c12, c22], axis=-1)


def ewa_cov2d_scalar(log_scales, quats, W, t_cam, fx, fy,
                     scale_modifier: float = 1.0):
    """Fused component-wise EWA chain: (log_scales [N,3], quats [N,4],
    W [3,3], t_cam [N,3]) -> packed 2D covariance (a, b, c) [N, 3].

    Same math as compute_cov2d(compute_cov3d(...), ...) — pinned to ~1e-5 by
    tests/test_core_math.py — but written as [N]-vector component arithmetic
    with NO [N, 3, 3] / [N, 2, 3] intermediates. The matrix form compiles to
    batched tiny dot_generals on TPU: bf16 MXU passes over T(2,128)/T(4,128)
    layouts plus relayout copies and layout-strided component extraction —
    measured ~36 ms/frame at N=1M of a 108 ms viewer frame (round-3 xprof
    trace, docs/PERF_NOTES.md). The component form is one VPU loop fusion
    (~100 multiply-adds/gaussian, f32 end to end — also removes the MXU's
    bf16 rounding from the forward covariance).
    """
    comps = cov3d_components(log_scales, quats, scale_modifier)
    return ewa_cov2d_from_comps(comps, W, t_cam, fx, fy)


def ewa_cov2d_from_comps(comps, W, t_cam, fx, fy):
    """Dynamic half of the component-wise EWA chain: packed cov3d components
    [..., 6] + camera (W [3,3], t_cam [..., 3]) -> packed 2D covariance
    [..., 3]. Identical operations (and therefore bits) to the fused
    ewa_cov2d_scalar after its Sigma components."""
    c00, c01, c02 = comps[..., 0], comps[..., 1], comps[..., 2]
    c11, c12, c22 = comps[..., 3], comps[..., 4], comps[..., 5]
    # T = J W with J = [[fx/tz, 0, -fx tx/tz^2], [0, fy/tz, -fy ty/tz^2]]
    # (reference: projection.cuh:113-165). W rows are per-frame scalars.
    tx, ty, tz = t_cam[..., 0], t_cam[..., 1], t_cam[..., 2]
    tz_inv = 1.0 / (tz + 1e-6)
    j00 = fx * tz_inv
    j02 = -fx * tx * tz_inv * tz_inv
    j11 = fy * tz_inv
    j12 = -fy * ty * tz_inv * tz_inv
    t00 = j00 * W[0, 0] + j02 * W[2, 0]
    t01 = j00 * W[0, 1] + j02 * W[2, 1]
    t02 = j00 * W[0, 2] + j02 * W[2, 2]
    t10 = j11 * W[1, 0] + j12 * W[2, 0]
    t11 = j11 * W[1, 1] + j12 * W[2, 1]
    t12 = j11 * W[1, 2] + j12 * W[2, 2]
    # cov2d = T Sigma T^T via u_i = Sigma T_i^T.
    u00 = c00 * t00 + c01 * t01 + c02 * t02
    u01 = c01 * t00 + c11 * t01 + c12 * t02
    u02 = c02 * t00 + c12 * t01 + c22 * t02
    u10 = c00 * t10 + c01 * t11 + c02 * t12
    u11 = c01 * t10 + c11 * t11 + c12 * t12
    u12 = c02 * t10 + c12 * t11 + c22 * t12
    a = t00 * u00 + t01 * u01 + t02 * u02 + COV2D_LOWPASS
    b = t10 * u00 + t11 * u01 + t12 * u02
    c = t10 * u10 + t11 * u11 + t12 * u12 + COV2D_LOWPASS
    return jnp.stack([a, b, c], axis=-1)
