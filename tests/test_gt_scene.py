"""Synthetic ground-truth scene pipeline: render-from-known-model dataset is a
valid COLMAP scene and training on it recovers quality (full-system test)."""
import numpy as np
import pytest

from tpugs.utils.gt_scene import make_gt_model, write_gt_dataset


class TestGTScene:
    def test_dataset_loads_and_projects(self, tmp_path):
        root = str(tmp_path / "gt")
        model = make_gt_model(300, seed=0)
        infos = write_gt_dataset(root, model, num_views=6, width=64, height=48,
                                 sparse_points=100)
        from tpugs.data.dataset import Dataset

        ds = Dataset(root)
        assert ds.num_train() + ds.num_test() == 6
        assert ds.points_xyz.shape[0] == 100
        img = ds.load_train_image(0)
        assert img.shape == (48, 64, 3)
        # Rendered images aren't empty/black.
        assert img.max() > 0.1

        # The written COLMAP pose reprojects the scene center near the image
        # center (the orbit camera looks at the scene).
        cam = ds.train_cameras[0]
        center = np.asarray(model["means"]).mean(axis=0)
        p = cam.R @ center + cam.t
        assert p[2] > 0
        x = cam.fx * p[0] / p[2] + cam.cx
        assert abs(x - cam.cx) < 10

    def test_short_training_improves_psnr(self, tmp_path):
        root = str(tmp_path / "gt")
        model = make_gt_model(200, seed=1)
        write_gt_dataset(root, model, num_views=8, width=64, height=48,
                         sparse_points=150)
        from tpugs.train.trainer import TrainConfig, Trainer

        cfg = TrainConfig(
            iterations=200, capacity=256, sh_degree=1, log_every=0,
            save_every=0, densify_mode="none",
            pair_capacity=1 << 14, max_hits_per_tile=128,
            output_dir=str(tmp_path / "out"),
        )
        tr = Trainer(root, cfg, log_fn=lambda *_: None)

        def train_view_psnr():
            import jax.numpy as jnp

            from tpugs.ops.render import render
            from tpugs.train.metrics import compute_psnr

            p = tr.state.params
            vals = []
            for i, cam in enumerate(tr.dataset.train_cameras):
                tgt = tr.dataset.load_train_image(i)
                out = render(
                    p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
                    p["sh"], tr.state.alive,
                    jnp.asarray(cam.world_to_camera(), jnp.float32),
                    jnp.asarray(cam.intrinsics_array()),
                    tr.raster, 1, jnp.zeros(3),
                )
                vals.append(float(compute_psnr(jnp.clip(out.color, 0, 1),
                                               jnp.asarray(tgt))))
            return float(np.mean(vals))

        psnr0 = train_view_psnr()
        tr.train(200)
        psnr1 = train_view_psnr()
        # Train-view PSNR (optimizer correctness). With only 7 tiny training
        # views the held-out view overfits — generalization is covered by the
        # 24-view quality benchmark (tpugs.apps.quality), not this unit test.
        assert psnr1 > psnr0 + 3.0, (psnr0, psnr1)
