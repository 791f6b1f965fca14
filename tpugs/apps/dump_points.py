"""dump_points CLI (reference: apps/dump_points.cpp): write the sparse points
plus train/test camera centers to PLY for visual verification.

  python -m tpugs.apps.dump_points -d <colmap_dir> -o points.ply
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("tpugs-dump-points")
    p.add_argument("-d", "--data", required=True)
    p.add_argument("-o", "--output", default="points.ply")
    args = p.parse_args(argv)

    from tpugs.data.dataset import Dataset
    from tpugs.io.ply import write_points_ply

    ds = Dataset(args.data)
    pts = [ds.points_xyz]
    cols = [ds.points_rgb]
    # Train cameras: green; test cameras: red.
    for cams, color in ((ds.train_cameras, [0, 1, 0]), (ds.test_cameras, [1, 0, 0])):
        if cams:
            pts.append(np.stack([c.camera_center() for c in cams]).astype(np.float32))
            cols.append(np.tile(np.asarray(color, np.float32), (len(cams), 1)))
    write_points_ply(args.output, np.concatenate(pts), np.concatenate(cols))
    print(f"wrote {args.output}: {sum(len(x) for x in pts)} vertices "
          f"({len(ds.points_xyz)} points, {ds.num_train()} train cams, "
          f"{ds.num_test()} test cams); extent={ds.scene_bounds.extent:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
