"""eval CLI (reference: apps/eval_main.cpp): load a Gaussian PLY, render the
dataset's test views, report PSNR/SSIM and write metrics.json.

  python -m tpugs.apps.eval -m model.ply -d <colmap_dir> [-r N] [-o metrics.json]
"""
from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("tpugs-eval")
    p.add_argument("-m", "--model", required=True, help="Gaussian PLY checkpoint")
    p.add_argument("-d", "--data", required=True, help="COLMAP dataset dir")
    p.add_argument("-r", "--resolution-scale", type=int, default=1)
    p.add_argument("-o", "--output", default="metrics.json")
    p.add_argument("--sh-degree", type=int, default=-1, help="-1 = model max")
    p.add_argument("--tile", type=int, default=32,
                   help="tile size (32 matches the tuned train default; 16 "
                        "renders ~2.2x more pairs)")
    p.add_argument("--pair-capacity", type=int, default=1 << 21)
    p.add_argument("--max-hits", type=int, default=2048)
    args = p.parse_args(argv)

    from tpugs.data.dataset import Dataset
    from tpugs.io.ply import read_gaussian_ply
    from tpugs.ops.render import RasterConfig, render
    from tpugs.train.metrics import evaluate_views

    model = read_gaussian_ply(args.model)
    n = model["means"].shape[0]
    max_deg = int(round(model["sh"].shape[-1] ** 0.5)) - 1
    sh_degree = max_deg if args.sh_degree < 0 else min(args.sh_degree, max_deg)

    ds = Dataset(args.data, args.resolution_scale)
    if ds.num_test() == 0:
        print("no test cameras", file=sys.stderr)
        return 1

    cam0 = ds.test_cameras[0]
    cfg = RasterConfig(
        img_h=cam0.height, img_w=cam0.width, tile_h=args.tile, tile_w=args.tile,
        pair_capacity=args.pair_capacity, max_hits_per_tile=args.max_hits,
    )
    params = {k: jnp.asarray(v) for k, v in model.items()}
    alive = jnp.ones((n,), bool)
    bg = jnp.zeros((3,))

    @jax.jit
    def render_view(viewmat, intr):
        out = render(
            params["means"], params["quats"], params["log_scales"],
            params["opacity_logits"], params["sh"], alive,
            viewmat, intr, cfg, sh_degree, bg,
        )
        return out.color

    views = []
    for i, cam in enumerate(ds.test_cameras):
        target = ds.load_test_image(i)
        vm = jnp.asarray(cam.world_to_camera(), jnp.float32)
        intr = jnp.asarray(cam.intrinsics_array())
        views.append((cam.image_name, target, (vm, intr)))

    results = evaluate_views(lambda a: render_view(*a), views, num_gaussians=n)
    for r in results.images:
        print(f"  {r.name}: PSNR {r.psnr:.2f} dB  SSIM {r.ssim:.4f}  ({r.render_ms:.1f} ms)")
    print(f"mean: PSNR {results.mean_psnr:.2f} dB  SSIM {results.mean_ssim:.4f}  "
          f"({len(results.images)} views, {n} gaussians)")
    results.save_json(args.output)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
