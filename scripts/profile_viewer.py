"""Stage profile of the viewer workload: 1080p, 1M Gaussians, forward only."""
import jax
import jax.numpy as jnp

from tpugs.ops.binning import bin_gaussians, tile_rects
from tpugs.ops.pallas.composite import (
    _p_aligned, align_segments, composite_forward_pallas, pack_sorted_attrs,
)
from tpugs.ops.projection import project_gaussians
from tpugs.ops.render import RasterConfig, render
from tpugs.utils.profiling import device_time
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 1920, 1088
n = 1_000_000
cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
                   pair_capacity=1 << 22, max_hits_per_tile=4096)
# Realistic trained-scene footprints (matches scripts/bench_render.py; the
# default synthetic scale_range is pathological at 1080p — 19.7M pairs).
params = synthetic_params(n, seed=0, scale_range=(0.002, 0.015))
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)

proj = jax.jit(lambda p: project_gaussians(
    p["means"], p["quats"], p["log_scales"], p["opacity_logits"], p["sh"],
    alive, viewmat, intr, img_w, img_h, 3, 1.0))(params)
binning = jax.jit(lambda pr: bin_gaussians(pr, img_w, img_h, 32, 32,
                                           cfg.pair_capacity))(proj)
_, _, w_t, h_t = jax.jit(lambda: tile_rects(proj, img_w, img_h, 32, 32))()
print(f"actual pairs {int(jnp.sum(w_t * h_t))}  capacity {cfg.pair_capacity}  "
      f"overflow {bool(binning.overflow)}  max/tile "
      f"{int(jnp.max(binning.tile_stop - binning.tile_start))}")

p_aligned = _p_aligned(cfg)
astart, astop, aligned_gauss, avalid = jax.jit(
    lambda b: align_segments(b.tile_start, b.tile_stop, b.pair_gauss, p_aligned)
)(binning)
attr = jax.jit(lambda: pack_sorted_attrs(aligned_gauss, proj.means2d, proj.conic,
                                         proj.rgb, proj.opac, p_aligned))()


def feed(x):
    return jnp.tanh(jnp.sum(x).astype(jnp.float32)) * 1e-20


def stage(name, fn):
    ms = device_time(fn, (jnp.zeros(()),), k=5, rounds=2) * 1e3
    print(f"{name:28s} {ms:8.2f} ms", flush=True)


stage("projection+SH (N=1M)", lambda c, it: (feed(project_gaussians(
    params["means"] + c[0], params["quats"], params["log_scales"],
    params["opacity_logits"], params["sh"], alive, viewmat, intr,
    img_w, img_h, 3, 1.0).means2d),))

stage("binning (P=4M)", lambda c, it: (feed(bin_gaussians(
    proj.replace(depths=proj.depths + c[0]), img_w, img_h, 32, 32,
    cfg.pair_capacity).pair_tile),))


def s_align(c, it):
    a0, a1, ag, av = align_segments(
        binning.tile_start, binning.tile_stop, binning.pair_gauss, p_aligned)
    at = pack_sorted_attrs(ag, proj.means2d + c[0], proj.conic, proj.rgb,
                           proj.opac, p_aligned)
    return (feed(at),)

stage("align+pack", s_align)

def s_kernel(c, it):
    # attr rides the carry: closed-over it would be inlined as a ~280 MB HLO
    # constant and overflow the tunneled remote-compile request. The +z
    # perturbation keeps the kernel carry-dependent (hoisting hazard,
    # docs/PERF_NOTES.md) at the cost of one [16, P] add (~1 ms) per iter.
    z, at = c
    out = composite_forward_pallas(cfg, astart, astop, at + z)[0]
    return (feed(out), at)

ms = device_time(s_kernel, (jnp.zeros(()), attr), k=5, rounds=2) * 1e3
print(f"{'pallas fwd kernel':28s} {ms:8.2f} ms", flush=True)
