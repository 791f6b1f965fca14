"""Evaluation metrics: PSNR / SSIM + JSON results
(reference: src/training/metrics.cpp)."""
from __future__ import annotations

import dataclasses
import json
import time
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from tpugs.train.loss import ssim as ssim_map


def compute_psnr(rendered: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """10 * log10(1 / MSE), clamped at 100 dB (reference: metrics.cpp:21-35)."""
    mse = jnp.mean((rendered - target) ** 2)
    psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-10))
    return jnp.minimum(psnr, 100.0)


def compute_ssim(rendered: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean SSIM (same windowed SSIM as the training loss)."""
    return jnp.mean(ssim_map(rendered, target))


@dataclasses.dataclass
class ImageResult:
    name: str
    psnr: float
    ssim: float
    render_ms: float


@dataclasses.dataclass
class EvalResults:
    """Per-image + aggregate results (reference: metrics.cpp:52-87)."""

    images: List[ImageResult] = dataclasses.field(default_factory=list)
    mean_psnr: float = 0.0
    mean_ssim: float = 0.0
    total_time_s: float = 0.0
    num_gaussians: int = 0

    def finalize(self):
        if self.images:
            self.mean_psnr = float(np.mean([r.psnr for r in self.images]))
            self.mean_ssim = float(np.mean([r.ssim for r in self.images]))
        return self

    def to_json(self) -> dict:
        return {
            "mean_psnr": self.mean_psnr,
            "mean_ssim": self.mean_ssim,
            "num_images": len(self.images),
            "num_gaussians": self.num_gaussians,
            "total_time_s": self.total_time_s,
            "images": [dataclasses.asdict(r) for r in self.images],
        }

    def save_json(self, path: str):
        with open(path, "w") as f:
            json.dump(self.to_json(), f, indent=2)


def evaluate_views(render_fn, views, num_gaussians: int = 0,
                   render_named=None) -> EvalResults:
    """Render each (name, target_image, view_args) and collect PSNR/SSIM.

    render_fn(view_args) -> [H, W, 3]. Mirrors the eval loop of
    reference metrics.cpp:93-163. render_named(name, view_args), when given,
    takes precedence — callers that per-view check overflow flags use the
    name in their log messages (Trainer.evaluate).
    """
    results = EvalResults(num_gaussians=num_gaussians)
    t0 = time.perf_counter()
    for name, target, view_args in views:
        ti = time.perf_counter()
        img = (render_named(name, view_args) if render_named is not None
               else render_fn(view_args))
        img = jnp.clip(img, 0.0, 1.0)
        img.block_until_ready()
        render_ms = (time.perf_counter() - ti) * 1e3
        tgt = jnp.asarray(target, jnp.float32)
        results.images.append(
            ImageResult(
                name=name,
                psnr=float(compute_psnr(img, tgt)),
                ssim=float(compute_ssim(img, tgt)),
                render_ms=render_ms,
            )
        )
    results.total_time_s = time.perf_counter() - t0
    return results.finalize()
