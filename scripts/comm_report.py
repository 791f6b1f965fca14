"""Tile-shard communication accounting on the bench-scene shape.

Runs the tile-sharded forward on the 8-virtual-CPU mesh and reports measured
per-device comm volume + padding waste for the all_to_all exchange, against
the gauss_shard all-gather design it replaces (numbers land in
docs/PERF_NOTES.md)."""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpugs.ops.projection import project_gaussians
from tpugs.ops.render import RasterConfig
from tpugs.parallel.mesh import make_mesh
from tpugs.parallel.tile_shard import (
    EXCHANGE_ATTRS,
    assemble_image,
    comm_report,
    exchange_and_render_local,
    local_raster_config,
    rows_per_device,
)
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

img_w, img_h = 489, 272
n = 50_000
cfg = RasterConfig(img_h=img_h, img_w=img_w, tile_h=32, tile_w=32,
                   pair_capacity=204800, max_hits_per_tile=1024)
g = 8
mesh = make_mesh(axis_sizes=(1, g))
params = synthetic_params(n, seed=0)
alive = jnp.ones((n,), bool)
viewmat = jnp.eye(4)
intr = synthetic_intrinsics(img_w, img_h)
local_cfg = local_raster_config(cfg, g, -(-cfg.pair_capacity // g))
send_cap = n // g  # the safe default


def impl(params, alive):
    proj = project_gaussians(
        params["means"], params["quats"], params["log_scales"],
        params["opacity_logits"], params["sh"], alive,
        viewmat, intr, img_w, img_h, 3,
    )
    color_t, _, _, diag = exchange_and_render_local(
        proj, cfg, local_cfg, g, send_cap, jnp.zeros((3,)), "scan"
    )
    return assemble_image(cfg, g, color_t), diag


gspec = {k: P("gauss") for k in params}
diag_spec = {k: P() for k in ["send_overflow", "max_send_count",
                              "pair_overflow", "num_pairs", "max_tile_hits"]}
mapped = jax.jit(jax.shard_map(
    impl, mesh=mesh, in_specs=(gspec, P("gauss")),
    out_specs=(P(), diag_spec), check_vma=False,
))
color, diag = mapped(params, alive)

max_send = int(diag["max_send_count"])
num_pairs = int(diag["num_pairs"])
rep = comm_report(cfg, g, n, send_cap, max_send, num_pairs)
mb = 1.0 / (1024 * 1024)
print(f"scene: N={n}, {img_w}x{img_h}, tile 32x32, g={g} "
      f"({rows_per_device(cfg, g)} tile rows/device)")
print(f"max send count (one src->dst): {max_send} / capacity {send_cap} "
      f"-> padding waste {rep['all_to_all_padding_frac']:.1%}")
print(f"all_to_all bytes/device/frame:  "
      f"{rep['all_to_all_bytes_per_device'] * mb:8.2f} MB "
      f"({EXCHANGE_ATTRS} f32/record)")
print(f"  (at a tuned capacity 1.3x max: "
      f"{g * int(1.3 * max_send) * EXCHANGE_ATTRS * 4 * mb:8.2f} MB)")
print(f"color all_gather bytes/frame:   "
      f"{rep['color_all_gather_bytes'] * mb:8.2f} MB")
print(f"gauss_shard all-gather (old):   "
      f"{rep['gauss_shard_all_gather_bytes'] * mb:8.2f} MB")
print(f"pairs on this device's tiles:   {num_pairs} "
      f"(vs whole-frame binning in gauss_shard)")
print(f"send_overflow={bool(diag['send_overflow'])} "
      f"pair_overflow={bool(diag['pair_overflow'])} "
      f"max_tile_hits={int(diag['max_tile_hits'])}")
