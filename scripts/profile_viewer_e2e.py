"""Cumulative end-to-end prefixes of the viewer render (1080p/1M): where the
time goes when XLA compiles the WHOLE pipeline (the isolated-stage profile
under-reports by ~100 ms — fusion/layout context matters)."""
import jax
import jax.numpy as jnp

from tpugs.ops.binning import bin_gaussians, clamp_tile_segments
from tpugs.ops.pallas.composite import (
    _p_aligned, align_segments, composite_forward_pallas, pack_sorted_attrs,
)
from tpugs.ops.projection import project_gaussians
from tpugs.ops.rasterize_tiled import RasterConfig, tiles_to_image
from tpugs.utils.profiling import device_time
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 1920, 1088
n = 1_000_000
cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
                   pair_capacity=3_407_872, max_hits_per_tile=4096)
params = synthetic_params(n, seed=0, scale_range=(0.002, 0.015))
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)


def feed(x):
    return jnp.tanh(jnp.sum(x).astype(jnp.float32)) * 1e-20


def upto(stage):
    def fn(c, it):
        z, p = c
        proj = project_gaussians(
            p["means"] + z, p["quats"], p["log_scales"],
            p["opacity_logits"], p["sh"], alive, viewmat, intr,
            img_w, img_h, 3, 1.0)
        if stage == "proj":
            return (feed(proj.means2d) + feed(proj.rgb), p)
        b = bin_gaussians(proj, img_w, img_h, cfg.tile_w, cfg.tile_h,
                          cfg.pair_capacity)
        b, _mh = clamp_tile_segments(b, cfg.max_hits_per_tile)
        if stage == "bin":
            return (feed(b.pair_gauss) + feed(b.tile_start), p)
        p_al = _p_aligned(cfg)
        a0, a1, ag, av = align_segments(b.tile_start, b.tile_stop,
                                        b.pair_gauss, p_al)
        attr = pack_sorted_attrs(ag, proj.means2d, proj.conic, proj.rgb,
                                 proj.opac, p_al)
        if stage == "pack":
            return (feed(attr) + feed(a0), p)
        color, t, nc, kl = composite_forward_pallas(cfg, a0, a1, attr)
        if stage == "kernel":
            return (feed(color), p)
        img = tiles_to_image(cfg, color)[:img_h, :img_w]
        return (feed(img), p)

    return fn


for s in ["proj", "bin", "pack", "kernel", "full"]:
    ms = device_time(upto(s), (jnp.zeros(()), params), k=6, rounds=2) * 1e3
    print(f"e2e through {s:7s} {ms:8.2f} ms", flush=True)
