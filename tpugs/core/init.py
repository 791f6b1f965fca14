"""Gaussian initialization from SfM sparse points.

Semantics of reference src/core/gaussian_init.cpp:72-154:
- position = point XYZ;
- SH DC = (rgb - 0.5)/C0, higher bands zero;
- opacity = inverse_sigmoid(0.1);
- rotation = identity quaternion;
- scale = log(mean distance to k=3 nearest neighbors), isotropic, >= 1e-7.

The reference's k-NN is a single-threaded O(N^2) CPU loop that takes ~4 min at
136k points (reference: ROADMAP.md:479). Here the same O(N^2) math runs as a
blocked, jitted distance computation on the accelerator — seconds, not minutes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpugs.core import sh as sh_lib
from tpugs.core.gaussians import GaussianState, inverse_sigmoid

INIT_OPACITY = 0.1
KNN_K = 3
MIN_SCALE = 1e-7


def mean_knn_distance(points: jnp.ndarray, k: int = KNN_K, block: int = 2048) -> jnp.ndarray:
    """Mean distance to each point's k nearest neighbors (excluding itself).

    Blocked O(N^2) on device: for each block of queries, compute distances to
    all points, take top-(k+1) smallest via -top_k on negated distances.
    """
    n = points.shape[0]
    k_eff = min(k, max(n - 1, 1))
    pad = (-n) % block
    pts_pad = jnp.pad(points, ((0, pad), (0, 0)))
    nb = (n + pad) // block

    def one_block(i):
        q = jax.lax.dynamic_slice(pts_pad, (i * block, 0), (block, 3))  # [B, 3]
        d2 = jnp.sum((q[:, None, :] - points[None, :, :]) ** 2, axis=-1)  # [B, N]
        # exclude self (distance 0) by taking k+1 smallest and dropping the first
        neg_top, _ = jax.lax.top_k(-d2, k_eff + 1)
        dists = jnp.sqrt(jnp.maximum(-neg_top[:, 1:], 0.0))
        return jnp.mean(dists, axis=-1)

    out = jax.lax.map(one_block, jnp.arange(nb))
    return out.reshape(-1)[:n]


def init_from_sfm(
    points_xyz: np.ndarray,
    points_rgb: np.ndarray,
    capacity: int,
    max_sh_degree: int = 3,
    max_points: int | None = None,
) -> GaussianState:
    """Build a capacity-padded GaussianState from SfM points + colors [0,1]."""
    pts = np.asarray(points_xyz, np.float32)
    rgb = np.asarray(points_rgb, np.float32)
    if max_points is not None and pts.shape[0] > max_points:
        sel = np.random.default_rng(0).choice(pts.shape[0], max_points, replace=False)
        pts, rgb = pts[sel], rgb[sel]
    n = pts.shape[0]
    assert capacity >= n

    c = sh_lib.sh_coeff_count(max_sh_degree)
    sh = np.zeros((n, 3, c), np.float32)
    sh[:, :, 0] = np.asarray(sh_lib.rgb_to_sh_dc(jnp.asarray(rgb)))

    mean_dist = np.asarray(mean_knn_distance(jnp.asarray(pts)))
    scales = np.log(np.maximum(mean_dist, MIN_SCALE))[:, None].repeat(3, axis=1)

    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0

    op = np.full((n,), float(inverse_sigmoid(INIT_OPACITY)), np.float32)

    return GaussianState.create(
        means=pts,
        quats=quats,
        log_scales=scales.astype(np.float32),
        opacity_logits=op,
        sh=sh,
        capacity=capacity,
    )
