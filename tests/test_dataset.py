"""Dataset tests on a synthetic on-disk scene (mirrors reference
tests/test_dataset.cpp)."""
import numpy as np
import pytest

from tests.synthetic_scene import make_scene
from tpugs.data.dataset import Dataset


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    meta = make_scene(root, num_images=16, width=64, height=48, num_points=120)
    return root, meta


class TestDataset:
    def test_split_every_8th(self, scene):
        root, meta = scene
        ds = Dataset(root)
        assert ds.num_test() == 2  # images 0 and 8
        assert ds.num_train() == 14
        test_names = {c.image_name for c in ds.test_cameras}
        assert test_names == {"img_000.png", "img_008.png"}

    def test_cameras_sorted(self, scene):
        root, _ = scene
        ds = Dataset(root)
        names = [c.image_name for c in ds.train_cameras]
        assert names == sorted(names)

    def test_points_loaded(self, scene):
        root, meta = scene
        ds = Dataset(root)
        assert ds.points_xyz.shape == (120, 3)
        np.testing.assert_allclose(ds.points_xyz, meta["points"], atol=1e-6)

    def test_lazy_image_load(self, scene):
        root, _ = scene
        ds = Dataset(root)
        img = ds.load_train_image(0)
        assert img.shape == (48, 64, 3)
        assert img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0

    def test_resolution_scale(self, scene):
        root, _ = scene
        ds = Dataset(root, resolution_scale=2)
        cam = ds.train_cameras[0]
        assert (cam.width, cam.height) == (32, 24)
        assert abs(cam.fx - 30.0) < 1e-6
        img = ds.load_train_image(0)
        assert img.shape == (24, 32, 3)

    def test_scene_bounds(self, scene):
        root, _ = scene
        ds = Dataset(root)
        b = ds.scene_bounds
        # Cameras on radius-3 ring => extent ~3.
        assert 2.5 < b.extent < 3.5
        assert np.all(b.min <= b.max)

    def test_camera_sees_origin(self, scene):
        root, _ = scene
        ds = Dataset(root)
        cam = ds.train_cameras[0]
        # Origin should project near the principal point for a look-at camera.
        p_cam = cam.R @ np.zeros(3) + cam.t
        assert p_cam[2] > 0  # in front
        x = cam.fx * p_cam[0] / p_cam[2] + cam.cx
        y = cam.fy * p_cam[1] / p_cam[2] + cam.cy
        assert abs(x - cam.cx) < 1.0 and abs(y - cam.cy) < 1.0
