"""Training losses: L1 + SSIM (reference: src/training/loss.cpp:83-135).

SSIM is Wang et al. with an 11x11 Gaussian window (sigma=1.5), SAME padding,
per-channel (depthwise) convolution, C1=1e-4, C2=9e-4, dynamic range 1.0 —
identical constants so PSNR/quality numbers are comparable. The conv is
`lax.conv_general_dilated` with feature_group_count=3, which XLA maps to the
TPU convolution path and differentiates for free (the reference leans on
libtorch autograd + cuDNN here, its only non-custom-kernel hot path).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax


def l1_loss(rendered: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute difference over all pixels/channels."""
    return jnp.mean(jnp.abs(rendered - target))


@functools.lru_cache(maxsize=8)
def _gaussian_kernel_np(window_size: int, sigma: float = 1.5):
    """Normalized 2D Gaussian window [3, 1, size, size] (OIHW, depthwise).

    Cached as numpy (caching a jnp array created under a trace would leak
    tracers across jit boundaries); converted to jnp per call — a free
    constant inside any trace.
    """
    import numpy as np

    half = window_size // 2
    x = np.arange(window_size, dtype=np.float32) - half
    k1 = np.exp(-(x**2) / (2.0 * sigma * sigma))
    k1 /= k1.sum()
    k2 = np.outer(k1, k1)
    k2 /= k2.sum()
    return np.tile(k2[None, None], (3, 1, 1, 1))


def _gaussian_kernel(window_size: int, sigma: float = 1.5):
    return jnp.asarray(_gaussian_kernel_np(window_size, sigma))


def _depthwise_blur(img_chw: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """[1, 3, H, W] -> [1, 3, H, W], SAME padding, groups=3."""
    kernel = _gaussian_kernel(window_size)
    pad = window_size // 2
    return lax.conv_general_dilated(
        img_chw,
        kernel,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        feature_group_count=3,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def ssim(rendered: jnp.ndarray, target: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Per-pixel SSIM map [H, W] (channel-averaged), inputs [H, W, 3] in [0,1]."""
    x = jnp.transpose(rendered, (2, 0, 1))[None]  # [1, 3, H, W]
    y = jnp.transpose(target, (2, 0, 1))[None]

    mu_x = _depthwise_blur(x, window_size)
    mu_y = _depthwise_blur(y, window_size)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    # Variances clamped at 0: on flat patches the E[x^2]-mu^2 estimate can go
    # slightly negative in f32, which can blow up the SSIM ratio (observed as
    # a transient negative training loss). Wang et al. variances are >= 0 by
    # definition; the clamp only removes float error.
    sigma_x2 = jnp.maximum(_depthwise_blur(x * x, window_size) - mu_x2, 0.0)
    sigma_y2 = jnp.maximum(_depthwise_blur(y * y, window_size) - mu_y2, 0.0)
    sigma_xy = _depthwise_blur(x * y, window_size) - mu_xy

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sigma_x2 + sigma_y2 + c2)
    )
    return jnp.mean(ssim_map[0], axis=0)  # [H, W]


def ssim_loss(rendered, target, window_size: int = 11):
    return 1.0 - jnp.mean(ssim(rendered, target, window_size))


def combined_loss(rendered, target, lambda_ssim: float = 0.2):
    """(1 - l) * L1 + l * (1 - SSIM), l = 0.2 (reference: loss.cpp:131-135)."""
    return (1.0 - lambda_ssim) * l1_loss(rendered, target) + lambda_ssim * ssim_loss(
        rendered, target
    )
