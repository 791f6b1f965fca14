"""Synthetic Gaussian scenes for benchmarks, entry checks, and tests."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def synthetic_params(n: int, seed: int = 0, sh_coeffs: int = 16, depth_range=(2.0, 10.0),
                     xy_extent: float = 1.5, scale_range=(0.01, 0.08)):
    """Random cloud of Gaussians in front of an identity camera."""
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [
            rng.uniform(-xy_extent, xy_extent, (n, 2)),
            rng.uniform(*depth_range, (n, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    log_scales = np.log(rng.uniform(*scale_range, (n, 3))).astype(np.float32)
    opacity_logits = rng.uniform(-2.0, 3.0, n).astype(np.float32)
    sh = (rng.normal(size=(n, 3, sh_coeffs)) * 0.3).astype(np.float32)
    sh[:, :, 0] += 0.8
    return {
        "means": jnp.asarray(means),
        "quats": jnp.asarray(quats),
        "log_scales": jnp.asarray(log_scales),
        "opacity_logits": jnp.asarray(opacity_logits),
        "sh": jnp.asarray(sh),
    }


def synthetic_intrinsics(img_w: int, img_h: int, fov_deg: float = 60.0):
    f = 0.5 * img_w / np.tan(np.radians(fov_deg) / 2)
    return jnp.asarray([f, f, img_w / 2.0, img_h / 2.0], jnp.float32)
