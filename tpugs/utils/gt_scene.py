"""Synthetic ground-truth scenes: render a known Gaussian model into a COLMAP
dataset, so full-pipeline quality (train-from-scratch PSNR) is measurable
without external data. This plays the role the reference's Tanks&Temples runs
play in its dev logs (BASELINE.md) in a zero-egress environment: the target
images are exactly representable by the model class, so converged PSNR is
limited only by the optimizer/densification pipeline.
"""
from __future__ import annotations

import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tpugs.core.camera import CameraInfo
from tpugs.core.sh import rgb_to_sh_dc
from tpugs.ops.render import RasterConfig, render
from tpugs.viewer.camera import OrbitCamera


def make_gt_model(n: int = 8000, seed: int = 0, sh_coeffs: int = 16):
    """A structured, colorful Gaussian model: many small clustered blobs with
    per-Gaussian color detail — fine structure keeps training gradients alive
    so densification stays active, and screen footprints stay below ADC's
    20 px size-prune threshold (both are properties of real converged scenes;
    a coarse fat-splat scene collapses under reference ADC semantics — the
    post-reset size prune repeatedly and correctly removes >20 px splats)."""
    rng = np.random.default_rng(seed)
    n_clusters = max(16, n // 60)
    centers = rng.uniform(-1.0, 1.0, (n_clusters, 3)) * np.array([1.2, 0.6, 1.2])
    cluster_colors = rng.uniform(0.1, 0.9, (n_clusters, 3))
    which = rng.integers(0, n_clusters, n)

    means = centers[which] + rng.normal(0, 0.08, (n, 3))
    colors = np.clip(
        cluster_colors[which] + rng.normal(0, 0.15, (n, 3)), 0.02, 0.98
    )
    sh = np.zeros((n, 3, sh_coeffs), np.float32)
    sh[:, :, 0] = np.asarray(rgb_to_sh_dc(jnp.asarray(colors, jnp.float32)))
    if sh_coeffs > 1:  # mild view dependence in band 1
        sh[:, :, 1:4] = rng.normal(0, 0.04, (n, 3, 3))

    return {
        "means": jnp.asarray(means, jnp.float32),
        "quats": jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        # 3*sigma*f/z ~ 3-9 px at the default 488x272 orbit — the typical
        # converged-splat regime, safely under the 20 px size-prune threshold.
        "log_scales": jnp.asarray(
            np.log(rng.uniform(0.004, 0.018, (n, 3))), jnp.float32
        ),
        "opacity_logits": jnp.asarray(rng.uniform(0.0, 3.0, n), jnp.float32),
        "sh": jnp.asarray(sh),
    }


def _rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    return np.array([
        w,
        (R[2, 1] - R[1, 2]) / (4 * w + 1e-12),
        (R[0, 2] - R[2, 0]) / (4 * w + 1e-12),
        (R[1, 0] - R[0, 1]) / (4 * w + 1e-12),
    ])


def write_gt_dataset(
    root: str,
    model: dict,
    num_views: int = 24,
    width: int = 488,
    height: int = 272,
    radius: float = 3.2,
    elevation_deg: float = 18.0,
    sparse_points: int = 1500,
    seed: int = 1,
    sh_degree: int = 1,
    jitter: float = 0.0,
    elevation_rings: int = 1,
):
    """Render `model` from an orbit and write a complete COLMAP dataset.

    jitter > 0 perturbs each view's azimuth/elevation/radius (fraction of the
    view spacing / ~12 deg / ~8% radius at jitter=1) and elevation_rings > 1
    alternates orbit heights — both raise the test-PSNR ceiling by breaking
    the single-ring overfit regime (docs/PERF_NOTES.md quality notes)."""
    rng = np.random.default_rng(seed)
    sparse = os.path.join(root, "sparse", "0")
    images_dir = os.path.join(root, "images")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(images_dir, exist_ok=True)

    cfg = RasterConfig(
        img_h=height, img_w=width, tile_h=16, tile_w=16,
        pair_capacity=1 << 19, max_hits_per_tile=1024,
    )
    n = model["means"].shape[0]
    alive = jnp.ones((n,), bool)
    bg = jnp.zeros((3,))

    @jax.jit
    def render_view(viewmat, intr):
        out = render(
            model["means"], model["quats"], model["log_scales"],
            model["opacity_logits"], model["sh"], alive,
            viewmat, intr, cfg, sh_degree, bg,
        )
        return jnp.clip(out.color, 0.0, 1.0)

    cam = OrbitCamera(
        target=np.asarray(jnp.mean(model["means"], axis=0)),
        radius=radius,
        fov_y_deg=50.0,
    )
    cam.elevation = np.radians(elevation_deg)

    infos = []
    base_el = np.radians(elevation_deg)
    ring_els = [
        base_el + np.radians(24.0) * r for r in range(elevation_rings)
    ]
    for i in range(num_views):
        spacing = 2 * np.pi / num_views
        cam.azimuth = spacing * i + jitter * rng.uniform(-0.5, 0.5) * spacing
        cam.elevation = (
            ring_els[i % elevation_rings]
            + jitter * np.radians(12.0) * rng.uniform(-1, 1)
        )
        cam.radius = radius * (1.0 + jitter * 0.08 * rng.uniform(-1, 1))
        info = cam.build_camera(width, height)
        img = np.asarray(render_view(
            jnp.asarray(info.world_to_camera(), jnp.float32),
            jnp.asarray(info.intrinsics_array()),
        ))
        name = f"render_{i:03d}.png"
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(images_dir, name)
        )
        infos.append((name, info))

    fx = infos[0][1].fx
    cx, cy = width / 2.0, height / 2.0
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, width, height))
        f.write(np.asarray([fx, fx, cx, cy], "<f8").tobytes())

    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(infos)))
        for i, (name, info) in enumerate(infos):
            f.write(struct.pack("<i", i + 1))
            f.write(np.asarray(_rotmat_to_qvec(info.R), "<f8").tobytes())
            f.write(np.asarray(info.t, "<f8").tobytes())
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))

    # Sparse points: noisy subsample of the true means (SfM-like input).
    means = np.asarray(model["means"])
    sh0 = np.asarray(model["sh"][:, :, 0])
    colors = np.clip(sh0 * 0.28209479177387814 + 0.5, 0, 1)
    sel = rng.choice(n, min(sparse_points, n), replace=False)
    pts = means[sel] + rng.normal(0, 0.01, (len(sel), 3))
    cols = (colors[sel] * 255).astype(np.uint8)
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(sel)))
        for i in range(len(sel)):
            f.write(struct.pack("<q", i))
            f.write(np.asarray(pts[i], "<f8").tobytes())
            f.write(np.asarray(cols[i], "u1").tobytes())
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))

    return infos
