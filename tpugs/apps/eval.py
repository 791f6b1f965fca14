"""eval CLI (reference: apps/eval_main.cpp): load a Gaussian PLY, render the
dataset's test views, report PSNR/SSIM and write metrics.json.

  python -m tpugs.apps.eval -m model.ply -d <colmap_dir> [-r N] [-o metrics.json]
"""
from __future__ import annotations

import argparse
import sys

import jax.numpy as jnp


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
    p.add_argument("--on-overflow", choices=["grow", "warn", "error"],
                   default="grow",
                   help="capacity-overflow policy: grow = re-jit larger "
                        "(default), warn = log + truncate, error = raise")
    p.add_argument("--debug-checks", action="store_true",
                   help="route every view through the checkify-instrumented "
                        "compositor (utils.checks.checked_render): slow, "
                        "raises naming the violated kernel invariant")
    args = p.parse_args(argv)

    from tpugs.data.dataset import Dataset
    from tpugs.io.ply import read_gaussian_ply
    from tpugs.train.metrics import evaluate_views
    from tpugs.viewer.offline import OfflineRenderer

    model = read_gaussian_ply(args.model)
    n = model["means"].shape[0]

    ds = Dataset(args.data, args.resolution_scale)
    if ds.num_test() == 0:
        print("no test cameras", file=sys.stderr)
        return 1

    # OfflineRenderer owns the overflow honesty: pair/hit overflow on any
    # view auto-grows capacities and re-renders (never a silently truncated
    # metric) — or warns/raises per --on-overflow.
    renderer = OfflineRenderer(
        model, sh_degree=args.sh_degree, tile=args.tile,
        pair_capacity=args.pair_capacity, max_hits=args.max_hits,
        on_overflow=args.on_overflow,
    )
    sh_degree = renderer.sh_degree
    bg = jnp.zeros((3,))

    views = []
    for i, cam in enumerate(ds.test_cameras):
        target = ds.load_test_image(i)
        vm = jnp.asarray(cam.world_to_camera(), jnp.float32)
        intr = jnp.asarray(cam.intrinsics_array())
        views.append((cam.image_name, target, (cam.height, cam.width, vm, intr)))

    if args.debug_checks:
        from tpugs.ops.render import RasterConfig
        from tpugs.utils.checks import checked_render

        def render_view(a):
            h, w, vm, intr = a
            cfg = RasterConfig(
                img_h=h, img_w=w, tile_h=args.tile, tile_w=args.tile,
                pair_capacity=renderer.pair_capacity,
                max_hits_per_tile=renderer.max_hits,
            )
            return checked_render(
                renderer.params, renderer.alive, vm, intr, cfg, sh_degree, bg
            )
    else:
        def render_view(a):
            h, w, vm, intr = a
            return renderer.render_arrays(h, w, vm, intr, bg)[0]

    results = evaluate_views(render_view, views, num_gaussians=n)
    for r in results.images:
        print(f"  {r.name}: PSNR {r.psnr:.2f} dB  SSIM {r.ssim:.4f}  ({r.render_ms:.1f} ms)")
    print(f"mean: PSNR {results.mean_psnr:.2f} dB  SSIM {results.mean_ssim:.4f}  "
          f"({len(results.images)} views, {n} gaussians)")
    results.save_json(args.output)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
