"""Synthetic COLMAP scene generator — the reference's fake-backend test pattern
(tests/test_dataset.cpp:33-123): a complete on-disk scene (cameras.bin,
images.bin, points3D.bin + images) built bit-by-bit so loaders are tested
against a known producer."""
import os
import struct

import numpy as np
from PIL import Image


def make_scene(root, num_images=16, width=64, height=48, num_points=100, seed=0):
    rng = np.random.default_rng(seed)
    sparse = os.path.join(root, "sparse", "0")
    images_dir = os.path.join(root, "images")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(images_dir, exist_ok=True)

    fx = fy = 60.0
    cx, cy = width / 2.0, height / 2.0

    # cameras.bin: one PINHOLE camera
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, width, height))
        f.write(np.asarray([fx, fy, cx, cy], "<f8").tobytes())

    # Cameras on a ring looking at the origin.
    names = []
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", num_images))
        for i in range(num_images):
            ang = 2 * np.pi * i / num_images
            center = np.array([3 * np.sin(ang), 0.0, -3 * np.cos(ang)])
            # look-at: z axis towards origin
            z = -center / np.linalg.norm(center)
            up = np.array([0.0, -1.0, 0.0])
            x = np.cross(up, z)
            x /= np.linalg.norm(x)
            y = np.cross(z, x)
            R = np.stack([x, y, z], axis=0)  # world->camera rows
            t = -R @ center
            # rotation matrix -> quaternion (w, x, y, z)
            w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
            qx = (R[2, 1] - R[1, 2]) / (4 * w + 1e-12)
            qy = (R[0, 2] - R[2, 0]) / (4 * w + 1e-12)
            qz = (R[1, 0] - R[0, 1]) / (4 * w + 1e-12)
            name = f"img_{i:03d}.png"
            names.append(name)
            f.write(struct.pack("<i", i + 1))
            f.write(np.asarray([w, qx, qy, qz], "<f8").tobytes())
            f.write(np.asarray(t, "<f8").tobytes())
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))

    # points3D.bin: colored cube of points around origin
    pts = rng.uniform(-0.5, 0.5, (num_points, 3))
    cols = (rng.uniform(0, 1, (num_points, 3)) * 255).astype(np.uint8)
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", num_points))
        for i in range(num_points):
            f.write(struct.pack("<q", i))
            f.write(np.asarray(pts[i], "<f8").tobytes())
            f.write(np.asarray(cols[i], "u1").tobytes())
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))

    # images: simple gradient + noise pictures
    for name in names:
        img = rng.uniform(0, 1, (height, width, 3))
        gy = np.linspace(0, 1, height)[:, None, None]
        img = 0.5 * img + 0.5 * gy
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(images_dir, name)
        )

    return {"points": pts, "colors": cols, "names": names,
            "intrinsics": (fx, fy, cx, cy), "size": (width, height)}
