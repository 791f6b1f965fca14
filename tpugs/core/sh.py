"""Real spherical harmonics (degree 0-3) color evaluation.

Vectorized jnp (differentiable by autodiff — replacing the reference's
hand-written forward/backward CUDA kernel pair, reference: src/core/sh.cu and
src/core/sh_backward.cu). The basis convention and constants follow the 3DGS /
Ramamoorthi-Hanrahan convention (reference: src/core/sh.hpp:51-70).
"""
from __future__ import annotations

import jax.numpy as jnp

MAX_SH_DEGREE = 3

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, 1.0925484305920792, 0.31539156525252005,
         1.0925484305920792, 0.5462742152960396)
SH_C3 = (0.5900435899266435, 2.890611442640554, 0.4570457994644658,
         0.3731763325901154, 0.4570457994644658, 1.4453057213202769,
         0.5900435899266435)


def sh_coeff_count(degree: int) -> int:
    """Coefficients per channel for a given degree: (d+1)^2."""
    return (degree + 1) * (degree + 1)


def sh_basis(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """SH basis values Y_k(dir) for k < (degree+1)^2. dirs [..., 3] -> [..., C].

    `degree` must be a static Python int (it selects how many basis columns are
    built — progressive SH training recompiles 4 times total).
    """
    assert 0 <= degree <= MAX_SH_DEGREE
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    cols = [jnp.full_like(x, SH_C0)]
    if degree >= 1:
        cols += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, xz, yz = x * y, x * z, y * z
        cols += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        cols += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * x * y * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(cols, axis=-1)


def eval_sh(degree: int, sh_coeffs: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH color. sh_coeffs [..., 3, C], dirs [..., 3] -> rgb [..., 3].

    Adds the +0.5 bias (reference: sh.cu:77). NOT clamped here — the projection
    stage clamps at 0 (reference: projection.cu:284) so the clamp's gradient
    gate lives with the caller.
    """
    basis = sh_basis(dirs, degree)  # [..., K], K = (degree+1)^2
    k = basis.shape[-1]
    return jnp.einsum("...ck,...k->...c", sh_coeffs[..., :k], basis) + 0.5


def rgb_to_sh_dc(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC term: coefficients such that eval at degree 0 gives rgb.

    (rgb - 0.5) / C0 — reference: src/core/gaussian_init.cpp:106-119.
    """
    return (rgb - 0.5) / SH_C0


def sh_dc_to_rgb(dc: jnp.ndarray) -> jnp.ndarray:
    return dc * SH_C0 + 0.5
