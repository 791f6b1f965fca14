"""Capacity-overflow semantics: per-tile hit truncation must be identical
across compositor backends and loudly reported; the Trainer must auto-grow
capacities (re-jit) or fail cleanly per on_overflow. (The reference never
truncates — exact per-frame realloc, reference: src/rasterizer/sorting.cu:
145-160 — so the fixed-capacity TPU design owes observability + recovery.)"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.synthetic_scene import make_scene
from tpugs.ops.render import RasterConfig, render
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params


def _busy_scene(n=300):
    """All Gaussians stacked on one spot -> one tile segment of ~n entries."""
    params = synthetic_params(n, seed=0, sh_coeffs=1)
    params["means"] = jnp.tile(jnp.asarray([[0.0, 0.0, 5.0]]), (n, 1)) + \
        params["means"] * 0.001
    alive = jnp.ones((n,), bool)
    return params, alive


class TestHitOverflow:
    W, H = 64, 48

    def _render(self, params, alive, max_hits, compositor):
        cfg = RasterConfig(img_h=self.H, img_w=self.W, tile_h=16, tile_w=16,
                           pair_capacity=1 << 13, max_hits_per_tile=max_hits)
        return render(
            params["means"], params["quats"], params["log_scales"],
            params["opacity_logits"], params["sh"], alive,
            jnp.eye(4), synthetic_intrinsics(self.W, self.H), cfg, 0,
            jnp.zeros((3,)), compositor=compositor,
        )

    def test_overflow_reported(self):
        params, alive = _busy_scene()
        out = self._render(params, alive, max_hits=64, compositor="scan")
        assert bool(out.hit_overflow)
        assert int(out.max_tile_hits) > 64

    def test_no_overflow_not_reported(self):
        params, alive = _busy_scene(n=30)
        out = self._render(params, alive, max_hits=512, compositor="scan")
        assert not bool(out.hit_overflow)
        assert 0 < int(out.max_tile_hits) <= 512

    def test_truncation_identical_across_backends(self):
        """With a busy tile exceeding K, scan and Pallas must render the SAME
        truncated result (front-most K win; clamp happens at binning)."""
        params, alive = _busy_scene()
        out_s = self._render(params, alive, max_hits=64, compositor="scan")
        out_p = self._render(params, alive, max_hits=64, compositor="pallas")
        assert bool(out_s.hit_overflow) and bool(out_p.hit_overflow)
        np.testing.assert_allclose(
            np.asarray(out_s.color), np.asarray(out_p.color), atol=1e-5
        )

    def test_truncation_keeps_front(self):
        """Truncation drops the BACK of the depth-sorted list: pixels whose
        transmittance saturated within the first K splats render identically
        with and without the tail."""
        params, alive = _busy_scene(n=200)
        params["opacity_logits"] = jnp.full((200,), 4.0)  # opaque
        params["log_scales"] = jnp.full((200, 3), jnp.log(0.8))  # wide blob
        full = self._render(params, alive, max_hits=2048, compositor="scan")
        trunc = self._render(params, alive, max_hits=128, compositor="scan")
        sat = np.asarray(trunc.final_T) < 1.0 / 255.0
        assert sat.sum() > 50, "scene produced no saturated pixels"
        np.testing.assert_allclose(
            np.asarray(full.color)[sat], np.asarray(trunc.color)[sat],
            atol=1e-5,
        )


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ovf_scene"))
    make_scene(root, num_images=8, width=64, height=48, num_points=80)
    return root


class TestTrainerOverflow:
    def _cfg(self, out, **kw):
        from tpugs.optim.densify_adc import ADCConfig
        from tpugs.train.trainer import TrainConfig

        base = dict(
            iterations=20, sh_degree=0, capacity=128, save_every=0,
            log_every=10, tile_h=16, tile_w=16, auto_pair_capacity=False,
            pair_capacity=128, max_hits_per_tile=128,  # far too small
            densify_mode="none", output_dir=out,
        )
        base.update(kw)
        return TrainConfig(**base)

    def test_auto_grow(self, scene_dir, tmp_path):
        from tpugs.train.trainer import Trainer

        logs = []
        t = Trainer(scene_dir, self._cfg(str(tmp_path / "grow")),
                    log_fn=logs.append)
        assert t.raster.pair_capacity == 128
        t.train()
        assert t.raster.pair_capacity > 128, "capacity did not grow"
        assert any("OVERFLOW" in l and "growing" in l for l in logs)

    def test_error_mode_checkpoints_and_raises(self, scene_dir, tmp_path):
        from tpugs.train.trainer import Trainer

        out = str(tmp_path / "err")
        t = Trainer(scene_dir, self._cfg(out, on_overflow="error"),
                    log_fn=lambda *_: None)
        with pytest.raises(RuntimeError, match="OVERFLOW"):
            t.train()
        assert any(f.startswith("ckpt_") for f in os.listdir(out)), (
            "no checkpoint written before abort"
        )


class TestOfflineRendererOverflow:
    """Forward-only paths must be overflow-honest (VERDICT r2 item 3): an
    undersized OfflineRenderer must grow (never a silently wrong image) or
    warn loudly per policy."""

    W, H = 64, 48

    def _camera(self):
        from tpugs.core.camera import CameraInfo

        intr = np.asarray(synthetic_intrinsics(self.W, self.H))
        return CameraInfo(
            image_name="t", width=self.W, height=self.H,
            fx=float(intr[0]), fy=float(intr[1]),
            cx=float(intr[2]), cy=float(intr[3]),
            R=np.eye(3), t=np.zeros(3),
        )

    def _renderer(self, params, **kw):
        from tpugs.viewer.offline import OfflineRenderer

        return OfflineRenderer(
            {k: np.asarray(v) for k, v in params.items()}, tile=16, **kw
        )

    def test_grow_matches_right_sized(self):
        params, _ = _busy_scene(n=300)
        logs = []
        small = self._renderer(
            params, pair_capacity=256, max_hits=64, log=logs.append
        )
        big = self._renderer(params, pair_capacity=1 << 13, max_hits=1024)
        cam = self._camera()
        img_small = small.render_camera(cam)
        img_big = big.render_camera(cam)
        assert small.pair_capacity > 256, "pair capacity did not grow"
        assert any("OVERFLOW" in l and "growing" in l for l in logs)
        np.testing.assert_allclose(img_small, img_big, atol=1e-5)

    def test_warn_mode_warns_once(self):
        params, _ = _busy_scene(n=300)
        logs = []
        r = self._renderer(
            params, pair_capacity=256, max_hits=64, on_overflow="warn",
            log=logs.append,
        )
        cam = self._camera()
        r.render_camera(cam)
        r.render_camera(cam)
        assert r.pair_capacity == 256
        warned = [l for l in logs if "OVERFLOW" in l]
        assert len(warned) == 1, logs

    def test_error_mode_raises(self):
        params, _ = _busy_scene(n=300)
        r = self._renderer(
            params, pair_capacity=256, max_hits=64, on_overflow="error",
            log=lambda *_: None,
        )
        with pytest.raises(RuntimeError, match="OVERFLOW"):
            r.render_camera(self._camera())
