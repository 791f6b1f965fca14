"""PLY + COLMAP loader tests against hand-written binary fixtures (the
reference's synthetic-producer pattern, tests/test_colmap_loader.cpp:17-117
and tests/test_ply_io.cpp:45-168)."""
import struct

import numpy as np

from tpugs.data.colmap import (
    merge_cameras_images,
    parse_cameras_bin,
    parse_images_bin,
    parse_points3d_bin,
)
from tpugs.io.ply import read_gaussian_ply, write_gaussian_ply, write_points_ply


def write_cameras_bin(path, cams):
    """cams: list of (id, model_id, w, h, params)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cid, model, w, h, params in cams:
            f.write(struct.pack("<iiQQ", cid, model, w, h))
            f.write(np.asarray(params, "<f8").tobytes())


def write_images_bin(path, images):
    """images: list of (id, qvec, tvec, cam_id, name, points2d)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for iid, q, t, cid, name, p2d in images:
            f.write(struct.pack("<i", iid))
            f.write(np.asarray(q, "<f8").tobytes())
            f.write(np.asarray(t, "<f8").tobytes())
            f.write(struct.pack("<i", cid))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", len(p2d)))
            for x, y, pid in p2d:
                f.write(struct.pack("<ddq", x, y, pid))


def write_points3d_bin(path, points):
    """points: list of (id, xyz, rgb, err, track)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for pid, xyz, rgb, err, track in points:
            f.write(struct.pack("<q", pid))
            f.write(np.asarray(xyz, "<f8").tobytes())
            f.write(np.asarray(rgb, "u1").tobytes())
            f.write(struct.pack("<d", err))
            f.write(struct.pack("<Q", len(track)))
            for im, p2 in track:
                f.write(struct.pack("<ii", im, p2))


class TestColmap:
    def test_cameras_roundtrip(self, tmp_path):
        p = str(tmp_path / "cameras.bin")
        write_cameras_bin(
            p,
            [
                (1, 1, 640, 480, [500.0, 510.0, 320.0, 240.0]),  # PINHOLE
                (2, 0, 100, 100, [80.0, 50.0, 50.0]),  # SIMPLE_PINHOLE
                (3, 4, 64, 48, [60.0, 61.0, 32.0, 24.0, 0.1, 0.0, 0.0, 0.0]),  # OPENCV
            ],
        )
        cams = parse_cameras_bin(p)
        assert len(cams) == 3
        assert cams[1].width == 640 and cams[1].params[0] == 500.0
        assert cams[2].model == 0
        assert cams[3].params.shape == (8,)

    def test_images_roundtrip_skips_points(self, tmp_path):
        p = str(tmp_path / "images.bin")
        write_images_bin(
            p,
            [
                (7, [1, 0, 0, 0], [0.5, -1.0, 2.0], 1, "img_007.png",
                 [(1.0, 2.0, 3), (4.0, 5.0, -1)]),
                (8, [0.7, 0.7, 0, 0], [0, 0, 0], 1, "img_008.png", []),
            ],
        )
        images = parse_images_bin(p)
        assert len(images) == 2
        assert images[0].name == "img_007.png"
        np.testing.assert_allclose(images[0].tvec, [0.5, -1.0, 2.0])
        assert images[1].image_id == 8

    def test_points_roundtrip_skips_tracks(self, tmp_path):
        p = str(tmp_path / "points3D.bin")
        write_points3d_bin(
            p,
            [
                (1, [0.0, 1.0, 2.0], [255, 0, 0], 0.5, [(1, 2), (3, 4)]),
                (2, [5.0, 6.0, 7.0], [0, 255, 0], 0.1, []),
            ],
        )
        xyz, rgb = parse_points3d_bin(p)
        assert xyz.shape == (2, 3)
        np.testing.assert_allclose(xyz[1], [5.0, 6.0, 7.0])
        assert rgb[0, 0] == 255 and rgb[1, 1] == 255

    def test_merge(self, tmp_path):
        cp = str(tmp_path / "cameras.bin")
        ip = str(tmp_path / "images.bin")
        write_cameras_bin(cp, [(1, 1, 640, 480, [500.0, 510.0, 320.0, 240.0])])
        write_images_bin(ip, [(1, [1, 0, 0, 0], [0, 0, 4.0], 1, "a.png", [])])
        infos = merge_cameras_images(parse_cameras_bin(cp), parse_images_bin(ip))
        assert len(infos) == 1
        c = infos[0]
        assert (c.fx, c.fy, c.cx, c.cy) == (500.0, 510.0, 320.0, 240.0)
        np.testing.assert_allclose(c.R, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(c.camera_center(), [0, 0, -4.0], atol=1e-12)
        m = c.world_to_camera()
        np.testing.assert_allclose(m[:3, 3], [0, 0, 4.0])


class TestPly:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        n, c = 17, 16
        means = rng.normal(size=(n, 3)).astype(np.float32)
        sh = rng.normal(size=(n, 3, c)).astype(np.float32)
        op = rng.normal(size=(n,)).astype(np.float32)
        scales = rng.normal(size=(n, 3)).astype(np.float32)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        p = str(tmp_path / "model.ply")
        write_gaussian_ply(p, means, sh, op, scales, quats)
        out = read_gaussian_ply(p)
        np.testing.assert_array_equal(out["means"], means)
        np.testing.assert_array_equal(out["sh"], sh)
        np.testing.assert_array_equal(out["opacity_logits"], op)
        np.testing.assert_array_equal(out["log_scales"], scales)
        np.testing.assert_array_equal(out["quats"], quats)

    def test_header_layout(self, tmp_path):
        """Verify exact property names/order — the interop contract."""
        p = str(tmp_path / "m.ply")
        write_gaussian_ply(
            p,
            np.zeros((1, 3)), np.zeros((1, 3, 4)), np.zeros(1),
            np.zeros((1, 3)), np.zeros((1, 4)),
        )
        header = open(p, "rb").read().split(b"end_header")[0].decode()
        props = [l.split()[-1] for l in header.splitlines() if l.startswith("property")]
        assert props[:6] == ["x", "y", "z", "nx", "ny", "nz"]
        assert props[6:9] == ["f_dc_0", "f_dc_1", "f_dc_2"]
        assert props[9:18] == [f"f_rest_{i}" for i in range(9)]
        assert props[18:] == ["opacity", "scale_0", "scale_1", "scale_2",
                              "rot_0", "rot_1", "rot_2", "rot_3"]

    def test_rest_interleave_coeff_major(self, tmp_path):
        """f_rest order: for coeff k, channels 0..2 (reference: ply_io.cpp:178-183)."""
        n, c = 1, 4
        sh = np.zeros((n, 3, c), np.float32)
        for ch in range(3):
            for k in range(c):
                sh[0, ch, k] = 10 * ch + k
        p = str(tmp_path / "m.ply")
        write_gaussian_ply(p, np.zeros((1, 3)), sh, np.zeros(1),
                           np.zeros((1, 3)), np.zeros((1, 4)))
        body = open(p, "rb").read().split(b"end_header\n")[1]
        vals = np.frombuffer(body, "<f4")
        rest = vals[9:18]  # after xyz, normals, dc
        np.testing.assert_array_equal(rest, [1, 11, 21, 2, 12, 22, 3, 13, 23])

    def test_points_ply(self, tmp_path):
        p = str(tmp_path / "pts.ply")
        write_points_ply(p, np.zeros((5, 3)), np.ones((5, 3)) * 0.5)
        data = open(p, "rb").read()
        assert b"element vertex 5" in data
