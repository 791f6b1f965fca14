"""Training losses: L1 + SSIM (reference: src/training/loss.cpp:83-135).

SSIM is Wang et al. with an 11x11 Gaussian window (sigma=1.5), SAME padding,
per-channel blur, C1=1e-4, C2=9e-4, dynamic range 1.0 — identical constants
so PSNR/quality numbers are comparable (the reference leans on libtorch
autograd + cuDNN conv2d here, loss.cpp:88-124).

TPU re-design: the depthwise conv2d formulation is the wrong shape for TPU —
XLA pads the 3-channel feature dim to the 128-lane vector width (~40x wasted
VPU work; measured ~53 ms of a 97 ms train step). The Gaussian window is
separable, so the blur is expressed as two banded-matrix multiplies instead:
blur(X) = A_h @ X @ A_wᵀ with A built from the 1D window and zero boundary
rows (exactly SAME zero-padding semantics). All five blurred moment maps run
as one batched einsum on the MXU (~0.5 ms fwd+bwd, and autodiff of a matmul
is a matmul).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax


def l1_loss(rendered: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute difference over all pixels/channels."""
    return jnp.mean(jnp.abs(rendered - target))


@functools.lru_cache(maxsize=32)
def _blur_matrix_np(dim: int, window_size: int, sigma: float = 1.5):
    """Banded blur matrix [dim, dim]: out = A @ x == 1D SAME-padded Gaussian
    convolution along that axis. Cached as numpy (caching a jnp array created
    under a trace would leak tracers); converted per call — a free constant
    inside any trace."""
    import numpy as np

    half = window_size // 2
    t = np.arange(window_size, dtype=np.float64) - half
    k1 = np.exp(-(t**2) / (2.0 * sigma * sigma))
    k1 /= k1.sum()
    a = np.zeros((dim, dim), dtype=np.float32)
    i = np.arange(dim)
    for off in range(-half, half + 1):
        j = i + off
        m = (j >= 0) & (j < dim)
        a[i[m], j[m]] = k1[off + half]
    return a


def _blur_maps(maps: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """[B, H, W] -> [B, H, W]: separable Gaussian blur as two MXU matmuls."""
    h, w = maps.shape[1], maps.shape[2]
    a_h = jnp.asarray(_blur_matrix_np(h, window_size))
    a_w = jnp.asarray(_blur_matrix_np(w, window_size))
    return jnp.einsum(
        "Hh,bhw,Ww->bHW", a_h, maps, a_w, precision=lax.Precision.HIGHEST
    )


def ssim(rendered: jnp.ndarray, target: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Per-pixel SSIM map [H, W] (channel-averaged), inputs [H, W, 3] in [0,1]."""
    x = jnp.transpose(rendered, (2, 0, 1))  # [3, H, W]
    y = jnp.transpose(target, (2, 0, 1))

    # One batched blur over the five moment maps (x, y, x^2, y^2, xy).
    moments = jnp.concatenate([x, y, x * x, y * y, x * y], axis=0)  # [15, H, W]
    blurred = _blur_maps(moments, window_size)
    mu_x, mu_y = blurred[0:3], blurred[3:6]
    e_x2, e_y2, e_xy = blurred[6:9], blurred[9:12], blurred[12:15]

    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    # Variances clamped at 0: on flat patches the E[x^2]-mu^2 estimate can go
    # slightly negative in f32, which can blow up the SSIM ratio (observed as
    # a transient negative training loss). Wang et al. variances are >= 0 by
    # definition; the clamp only removes float error.
    sigma_x2 = jnp.maximum(e_x2 - mu_x2, 0.0)
    sigma_y2 = jnp.maximum(e_y2 - mu_y2, 0.0)
    sigma_xy = e_xy - mu_xy

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sigma_x2 + sigma_y2 + c2)
    )
    return jnp.mean(ssim_map, axis=0)  # [H, W]


def ssim_loss(rendered, target, window_size: int = 11):
    return 1.0 - jnp.mean(ssim(rendered, target, window_size))


def combined_loss(rendered, target, lambda_ssim: float = 0.2):
    """(1 - l) * L1 + l * (1 - SSIM), l = 0.2 (reference: loss.cpp:131-135)."""
    return (1.0 - lambda_ssim) * l1_loss(rendered, target) + lambda_ssim * ssim_loss(
        rendered, target
    )
