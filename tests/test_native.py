"""Native C++ data layer vs the pure-Python oracle parsers."""
import numpy as np
import pytest

from tests.test_io import write_cameras_bin, write_images_bin, write_points3d_bin
from tpugs.data import colmap, native


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


@requires_native
class TestNativeColmap:
    def test_points3d_matches_python(self, tmp_path):
        p = str(tmp_path / "points3D.bin")
        rng = np.random.default_rng(0)
        pts = [
            (i, rng.normal(size=3), rng.integers(0, 256, 3), 0.5,
             [(1, 2)] * int(rng.integers(0, 4)))
            for i in range(50)
        ]
        write_points3d_bin(p, pts)
        nat = native.parse_points3d(p)
        assert nat is not None
        xyz_n, rgb_n = nat
        # Python fallback oracle
        import tpugs.data.colmap as cm

        old = cm.USE_NATIVE
        cm.USE_NATIVE = False
        try:
            xyz_p, rgb_p = cm.parse_points3d_bin(p)
        finally:
            cm.USE_NATIVE = old
        np.testing.assert_array_equal(xyz_n, xyz_p)
        np.testing.assert_array_equal(rgb_n, rgb_p)

    def test_cameras_match_python(self, tmp_path):
        p = str(tmp_path / "cameras.bin")
        write_cameras_bin(
            p,
            [
                (1, 1, 640, 480, [500.0, 510.0, 320.0, 240.0]),
                (2, 0, 100, 100, [80.0, 50.0, 50.0]),
                (5, 4, 64, 48, [60.0, 61.0, 32.0, 24.0, 0.1, 0.2, 0.3, 0.4]),
            ],
        )
        cams = colmap.parse_cameras_bin(p)  # native path (wired in)
        assert len(cams) == 3
        assert cams[1].params[1] == 510.0
        assert cams[2].model == colmap.CameraModel.SIMPLE_PINHOLE
        np.testing.assert_allclose(cams[5].params[4:], [0.1, 0.2, 0.3, 0.4])

    def test_images_match_python(self, tmp_path):
        p = str(tmp_path / "images.bin")
        write_images_bin(
            p,
            [
                (7, [1, 0, 0, 0], [0.5, -1.0, 2.0], 1, "a_photo.png",
                 [(1.0, 2.0, 3)]),
                (9, [0.7, 0.7, 0, 0], [1, 2, 3], 2, "z.png", []),
            ],
        )
        images = colmap.parse_images_bin(p)
        assert [im.image_id for im in images] == [7, 9]
        assert images[0].name == "a_photo.png"
        np.testing.assert_allclose(images[1].tvec, [1, 2, 3])
        assert images[1].camera_id == 2

    def test_native_ply_matches_python_bytes(self, tmp_path):
        # The numpy writer is the byte-exactness oracle (the public
        # write_gaussian_ply routes through the native path when available).
        from tpugs.io.ply import write_gaussian_ply_numpy as write_gaussian_ply

        rng = np.random.default_rng(1)
        n, c = 7, 4
        means = rng.normal(size=(n, 3)).astype(np.float32)
        sh = rng.normal(size=(n, 3, c)).astype(np.float32)
        op = rng.normal(size=(n,)).astype(np.float32)
        scales = rng.normal(size=(n, 3)).astype(np.float32)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        p_py = str(tmp_path / "py.ply")
        p_nat = str(tmp_path / "nat.ply")
        write_gaussian_ply(p_py, means, sh, op, scales, quats)
        assert native.write_gaussian_ply(p_nat, means, sh, op, scales, quats)
        assert open(p_py, "rb").read() == open(p_nat, "rb").read()
