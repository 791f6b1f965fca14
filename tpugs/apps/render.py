"""render CLI — the offline viewer (TPU stand-in for apps/viewer_main.cpp):
render an orbit trajectory (or the dataset's cameras) from a Gaussian PLY.

  python -m tpugs.apps.render -m model.ply -o frames/ [--frames 60]
      [--width 1280 --height 720] [--mode rgb|depth|heatmap] [-d dataset]
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser("tpugs-render")
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-o", "--output", default="frames")
    p.add_argument("-d", "--data", default=None,
                   help="COLMAP dir: render its test cameras instead of an orbit")
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--mode", choices=["rgb", "depth", "heatmap"], default="rgb")
    p.add_argument("--background", type=float, nargs=3, default=[0.0, 0.0, 0.0])
    p.add_argument("--sh-degree", type=int, default=-1)
    p.add_argument("--elevation", type=float, default=15.0)
    p.add_argument("--tile", type=int, default=32,
                   help="tile size (32 = tuned default; 16 renders ~2.2x more pairs)")
    p.add_argument("--pair-capacity", type=int, default=1 << 21)
    p.add_argument("--max-hits", type=int, default=2048)
    p.add_argument("--on-overflow", choices=["grow", "warn", "error"],
                   default="grow",
                   help="capacity-overflow policy: grow = re-jit larger "
                        "(default), warn = log + truncate, error = raise")
    args = p.parse_args(argv)

    from tpugs.io.ply import read_gaussian_ply
    from tpugs.viewer.camera import orbit_trajectory
    from tpugs.viewer.offline import OfflineRenderer

    model = read_gaussian_ply(args.model)
    renderer = OfflineRenderer(
        model, sh_degree=args.sh_degree, tile=args.tile,
        pair_capacity=args.pair_capacity, max_hits=args.max_hits,
        on_overflow=args.on_overflow,
    )

    if args.data:
        from tpugs.data.dataset import Dataset

        cams = Dataset(args.data).test_cameras
    else:
        cams = orbit_trajectory(
            model["means"], args.frames, args.width, args.height,
            elevation_deg=args.elevation,
        )

    paths = renderer.render_trajectory(
        cams, args.output, mode=args.mode, background=tuple(args.background)
    )
    print(f"wrote {len(paths)} frames to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
