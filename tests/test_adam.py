"""Adam oracle-equivalence vs optax (mirrors reference tests/test_fused_adam.cpp:
custom implementation vs trusted library, single-step + multi-step trajectories)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpugs.optim.adam import AdamConfig, adam_init, adam_step, zero_slots
from tpugs.optim.lr_schedule import position_lr, PositionLRConfig


def make_params(seed=0, n=64):
    rng = np.random.default_rng(seed)
    return {
        "means": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        "sh": jnp.asarray(rng.normal(size=(n, 3, 16)).astype(np.float32)),
        "opacity_logits": jnp.asarray(rng.normal(size=(n,)).astype(np.float32)),
        "log_scales": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        "quats": jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
    }


def rand_grads(seed, params):
    rng = np.random.default_rng(seed)
    return {k: jnp.asarray(rng.normal(size=v.shape).astype(np.float32)) for k, v in params.items()}


def optax_for_group(lr, cfg: AdamConfig):
    return optax.adam(lr, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps, eps_root=0.0)


class TestAdamVsOptax:
    def test_single_step_matches(self):
        cfg = AdamConfig()
        params = make_params()
        grads = rand_grads(1, params)
        state = adam_init(params)
        new_params, _ = adam_step(cfg, state, params, grads, step=0)

        from tpugs.optim.adam import group_lrs

        lrs = group_lrs(cfg, 0)
        for k in params:
            opt = optax_for_group(lrs[k], cfg)
            ost = opt.init(params[k])
            upd, _ = opt.update(grads[k], ost, params[k])
            expected = optax.apply_updates(params[k], upd)
            np.testing.assert_allclose(
                np.asarray(new_params[k]), np.asarray(expected), rtol=1e-5, atol=1e-7,
                err_msg=k,
            )

    def test_ten_step_trajectory_matches(self):
        cfg = AdamConfig()
        params = make_params(2)
        state = adam_init(params)
        p_mine = params

        from tpugs.optim.adam import group_lrs

        # optax per-group states
        opts, osts = {}, {}
        p_ref = dict(params)
        for t in range(10):
            grads = rand_grads(100 + t, params)
            p_mine, state = adam_step(cfg, state, p_mine, grads, step=t)
            lrs = group_lrs(cfg, t)
            for k in params:
                opt = optax_for_group(float(lrs[k]), cfg)
                if k not in osts:
                    opts[k], osts[k] = opt, opt.init(p_ref[k])
                # rebuild update fn each step with the scheduled lr
                upd, osts[k] = opt.update(grads[k], osts[k], p_ref[k])
                p_ref[k] = optax.apply_updates(p_ref[k], upd)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(p_mine[k]), np.asarray(p_ref[k]), rtol=1e-4, atol=1e-6,
                err_msg=k,
            )

    def test_position_lr_schedule(self):
        cfg = PositionLRConfig()
        assert abs(float(position_lr(0, cfg)) - 1.6e-4) < 1e-9
        assert abs(float(position_lr(30000, cfg)) - 1.6e-6) < 1e-9
        assert abs(float(position_lr(60000, cfg)) - 1.6e-6) < 1e-9
        mid = float(position_lr(15000, cfg))
        assert abs(mid - np.sqrt(1.6e-4 * 1.6e-6)) / mid < 1e-4  # geometric midpoint

    def test_zero_slots(self):
        params = make_params(3, n=8)
        state = adam_init(params)
        grads = rand_grads(4, params)
        _, state = adam_step(AdamConfig(), state, params, grads, step=0)
        mask = jnp.asarray([True, False] * 4)
        state2 = zero_slots(state, mask)
        for k in params:
            m = np.asarray(state2.m[k])
            assert (m[0] == 0).all() and (m[2] == 0).all()
            assert np.abs(m[1]).max() > 0


class TestShDegreeSchedule:
    def test_progressive(self):
        from tpugs.optim.lr_schedule import active_sh_degree_for_step

        assert active_sh_degree_for_step(0, 3) == 0
        assert active_sh_degree_for_step(999, 3) == 0
        assert active_sh_degree_for_step(1000, 3) == 1
        assert active_sh_degree_for_step(2500, 3) == 2
        assert active_sh_degree_for_step(9999, 3) == 3
        assert active_sh_degree_for_step(5000, 2) == 2
