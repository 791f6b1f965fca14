"""Runtime HBM watchdog (utils.memory.MemoryWatchdog): sustained over-limit
readings must end training with a checkpoint on disk, not an XLA OOM
(reference: trainer.cpp:343-373 graceful VRAM abort)."""
import os

import pytest

from tests.synthetic_scene import make_scene
from tpugs.utils.memory import MemoryWatchdog


class TestWatchdogUnit:
    def test_inert_without_stats(self):
        wd = MemoryWatchdog(stats_fn=lambda: {}, log=lambda *_: None)
        assert not wd.enabled
        assert wd.check() == "ok"
        assert not wd.should_abort()

    def test_streak_and_abort(self):
        mb = 1024 * 1024
        wd = MemoryWatchdog(
            limit_mb=100.0, max_critical_streak=3,
            stats_fn=lambda: {"bytes_in_use": 200 * mb},
            log=lambda *_: None,
        )
        assert wd.enabled
        for i in range(3):
            assert not wd.should_abort()
            assert wd.check() == "critical"
        assert wd.should_abort()

    def test_streak_resets_on_recovery(self):
        mb = 1024 * 1024
        readings = iter([200 * mb, 200 * mb, 50 * mb, 200 * mb])
        wd = MemoryWatchdog(
            limit_mb=100.0, max_critical_streak=3, critical_margin_mb=10.0,
            stats_fn=lambda: {"bytes_in_use": next(readings)},
            log=lambda *_: None,
        )
        assert wd.check() == "critical"
        assert wd.check() == "critical"
        assert wd.check() == "ok"
        assert wd.streak == 0
        assert wd.check() == "critical"
        assert not wd.should_abort()

    def test_warning_band(self):
        mb = 1024 * 1024
        wd = MemoryWatchdog(
            limit_mb=100.0, critical_margin_mb=20.0,
            stats_fn=lambda: {"bytes_in_use": 90 * mb},
            log=lambda *_: None,
        )
        assert wd.check() == "warning"
        assert wd.streak == 0

    def test_auto_limit_from_device(self):
        gb = 1024 * 1024 * 1024
        wd = MemoryWatchdog(
            auto_margin_mb=600.0,
            stats_fn=lambda: {"bytes_limit": 16 * gb, "bytes_in_use": 0},
            log=lambda *_: None,
        )
        assert wd.enabled
        assert abs(wd.limit_mb - (16 * 1024 - 600)) < 1


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wd_scene"))
    make_scene(root, num_images=8, width=64, height=48, num_points=80)
    return root


class TestTrainerWatchdog:
    def test_graceful_abort_with_checkpoint(self, scene_dir, tmp_path):
        from tpugs.optim.densify_adc import ADCConfig
        from tpugs.train.trainer import TrainConfig, Trainer

        out = str(tmp_path / "wd")
        cfg = TrainConfig(
            iterations=100, sh_degree=0, capacity=128, save_every=0,
            log_every=5, steps_per_call=5, tile_h=16, tile_w=16,
            pair_capacity=1 << 14, auto_pair_capacity=False,
            max_hits_per_tile=128, densify_mode="none", output_dir=out,
        )
        logs = []
        t = Trainer(scene_dir, cfg, log_fn=logs.append)
        mb = 1024 * 1024
        # Inject a too-small budget: every reading is over the limit.
        t.watchdog = MemoryWatchdog(
            limit_mb=1.0, max_critical_streak=2,
            stats_fn=lambda: {"bytes_in_use": 10 * mb},
            log=logs.append,
        )
        t.train()  # must return (graceful), not raise
        ckpts = [f for f in os.listdir(out)
                 if f.startswith("ckpt_") and f.endswith(".npz")]
        assert ckpts, "no checkpoint written on watchdog abort"
        # Aborted well before the configured 100 iterations.
        steps = [int(f[5:-4]) for f in ckpts]
        assert max(steps) < 100
        assert any("aborting" in str(l) for l in logs)
