"""Full-checkpoint round-trip + trainer resume (the capability the reference
lacks — SURVEY.md §5.4)."""
import jax
import jax.numpy as jnp
import numpy as np

from tests.synthetic_scene import make_scene
from tpugs.io.checkpoint import load_train_checkpoint, save_train_checkpoint
from tpugs.train.trainer import TrainConfig, Trainer


def small_cfg(tmp_path, iters=10):
    return TrainConfig(
        iterations=iters, capacity=128, sh_degree=0, log_every=0, save_every=0,
        densify_mode="none", pair_capacity=1 << 14, max_hits_per_tile=128,
        output_dir=str(tmp_path / "out"),
    )


class TestCheckpoint:
    def test_state_roundtrip(self, tmp_path):
        root = str(tmp_path / "scene")
        make_scene(root, num_images=10, width=64, height=48, num_points=40)
        tr = Trainer(root, small_cfg(tmp_path), log_fn=lambda *_: None)
        tr.train(5)

        path = str(tmp_path / "ckpt.npz")
        save_train_checkpoint(path, tr.state, 5)
        state2, step = load_train_checkpoint(path)
        assert step == 5
        for k in tr.state.params:
            np.testing.assert_array_equal(
                np.asarray(state2.params[k]), np.asarray(tr.state.params[k]), err_msg=k
            )
            np.testing.assert_array_equal(
                np.asarray(state2.adam.m[k]), np.asarray(tr.state.adam.m[k])
            )
        np.testing.assert_array_equal(np.asarray(state2.alive), np.asarray(tr.state.alive))
        assert int(state2.adam.count) == int(tr.state.adam.count)
        np.testing.assert_array_equal(np.asarray(state2.key), np.asarray(tr.state.key))

    def test_resume_continues_identically(self, tmp_path):
        """10 straight iters == 5 iters + checkpoint + resume + 5 iters."""
        root = str(tmp_path / "scene")
        make_scene(root, num_images=10, width=64, height=48, num_points=40)

        # Straight run.
        tr_a = Trainer(root, small_cfg(tmp_path), log_fn=lambda *_: None)
        tr_a.train(10)

        # Interrupted run. (The data-sampling RNG is host-side and re-seeded
        # per Trainer, so the view sequence differs after resume — parameters
        # won't be bitwise equal to the straight run, but training state
        # [step, moments, key] continues exactly.)
        tr_b = Trainer(root, small_cfg(tmp_path), log_fn=lambda *_: None)
        tr_b.train(5)
        ckpt = str(tmp_path / "ckpt5.npz")
        save_train_checkpoint(ckpt, tr_b.state, 5)

        tr_c = Trainer(root, small_cfg(tmp_path), log_fn=lambda *_: None,
                       resume_from=ckpt)
        assert tr_c.start_step == 5
        hist = tr_c.train(10)
        assert int(tr_c.state.adam.count) == int(tr_a.state.adam.count)
        assert np.isfinite(np.asarray(tr_c.state.params["means"])).all()
