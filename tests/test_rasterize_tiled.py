"""Tiled rasterizer vs dense oracle — pixels AND analytic-vs-autodiff gradients.

This is the TPU build's version of the reference finite-difference suite
(reference: tests/test_backward.cpp:266-336), but stronger: the oracle is a
pure-jnp renderer with identical semantics, so `jax.grad` through it gives the
exact expected gradient for the custom VJP, not a finite-difference estimate.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugs.core.sh import rgb_to_sh_dc
from tpugs.ops.projection import project_gaussians
from tpugs.ops.rasterize_ref import render_reference
from tpugs.ops.render import RasterConfig, render

W, H = 48, 32
INTR = jnp.array([40.0, 40.0, W / 2.0, H / 2.0], jnp.float32)
CFG = RasterConfig(img_h=H, img_w=W, tile_h=16, tile_w=16,
                   pair_capacity=4096, max_hits_per_tile=128)


def make_scene(n=40, seed=0, opac_logit_range=(-2.0, 3.0)):
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [rng.uniform(-1.2, 1.2, (n, 2)), rng.uniform(2.0, 8.0, (n, 1))], axis=1
    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    log_scales = np.log(rng.uniform(0.05, 0.3, (n, 3))).astype(np.float32)
    op = rng.uniform(*opac_logit_range, n).astype(np.float32)
    sh = rng.normal(size=(n, 3, 1)).astype(np.float32) * 0.7
    return dict(
        means=jnp.asarray(means),
        quats=jnp.asarray(quats),
        log_scales=jnp.asarray(log_scales),
        opacity_logits=jnp.asarray(op),
        sh=jnp.asarray(sh),
    )


BG = jnp.array([0.15, 0.25, 0.35])


def render_tiled(params, alive=None):
    n = params["means"].shape[0]
    alive = jnp.ones((n,), bool) if alive is None else alive
    return render(
        params["means"], params["quats"], params["log_scales"],
        params["opacity_logits"], params["sh"], alive,
        jnp.eye(4), INTR, CFG, 0, BG,
    )


def render_oracle(params, alive=None):
    n = params["means"].shape[0]
    alive = jnp.ones((n,), bool) if alive is None else alive
    proj = project_gaussians(
        params["means"], params["quats"], params["log_scales"],
        params["opacity_logits"], params["sh"], alive,
        jnp.eye(4), INTR, W, H, 0,
    )
    return render_reference(proj, H, W, BG)


class TestForwardParity:
    def test_pixels_match_oracle(self):
        params = make_scene(60, seed=1)
        out = render_tiled(params)
        color_o, t_o, nc_o = render_oracle(params)
        np.testing.assert_allclose(
            np.asarray(out.color), np.asarray(color_o), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.final_T), np.asarray(t_o), atol=2e-5
        )
        np.testing.assert_array_equal(np.asarray(out.n_contrib), np.asarray(nc_o))
        assert not bool(out.pair_overflow)

    def test_pixels_match_heavy_overlap(self):
        # Many overlapping near-opaque splats => early termination paths active.
        params = make_scene(80, seed=2, opac_logit_range=(2.0, 6.0))
        out = render_tiled(params)
        color_o, t_o, nc_o = render_oracle(params)
        np.testing.assert_allclose(np.asarray(out.color), np.asarray(color_o), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(out.n_contrib), np.asarray(nc_o))

    def test_dead_mask_respected(self):
        params = make_scene(30, seed=3)
        alive = jnp.asarray(np.arange(30) % 3 != 0)
        out = render_tiled(params, alive)
        color_o, _, _ = render_oracle(params, alive)
        np.testing.assert_allclose(np.asarray(out.color), np.asarray(color_o), atol=2e-5)

    def test_empty_scene(self):
        params = make_scene(8, seed=4)
        out = render_tiled(params, alive=jnp.zeros((8,), bool))
        np.testing.assert_allclose(
            np.asarray(out.color), np.tile(np.asarray(BG), (H, W, 1)), atol=1e-6
        )


class TestGradientParity:
    """Analytic custom-VJP grads == autodiff-of-oracle grads."""

    def _grads(self, params, target):
        def loss_tiled(p):
            out = render_tiled(p)
            return jnp.mean((out.color - target) ** 2)

        def loss_oracle(p):
            color, _, _ = render_oracle(p)
            return jnp.mean((color - target) ** 2)

        gt = jax.grad(loss_tiled)(params)
        go = jax.grad(loss_oracle)(params)
        return gt, go

    def test_all_param_grads_match(self):
        params = make_scene(40, seed=5)
        rng = np.random.default_rng(6)
        target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
        gt, go = self._grads(params, target)
        for k in params:
            a, b = np.asarray(gt[k]), np.asarray(go[k])
            assert np.isfinite(a).all(), k
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a, b, atol=3e-4 * scale, err_msg=k)

    def test_grads_match_with_saturation(self):
        # Opaque overlapping scene: exercises the T-threshold gate and the
        # 0.99 alpha clamp's zero-grad path in backward.
        params = make_scene(50, seed=7, opac_logit_range=(3.0, 12.0))
        target = jnp.zeros((H, W, 3))
        gt, go = self._grads(params, target)
        for k in params:
            a, b = np.asarray(gt[k]), np.asarray(go[k])
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a, b, atol=3e-4 * scale, err_msg=k)

    def test_culled_gaussians_zero_grad(self):
        params = make_scene(10, seed=8)
        params["means"] = params["means"].at[0].set(jnp.array([0.0, 0.0, -5.0]))

        def loss(p):
            return jnp.sum(render_tiled(p).color)

        g = jax.grad(loss)(params)
        for k in ["means", "quats", "log_scales", "opacity_logits", "sh"]:
            np.testing.assert_allclose(np.asarray(g[k][0]), 0.0, err_msg=k)

    def test_final_t_grad_flows(self):
        params = make_scene(20, seed=9)

        def loss(p):
            return jnp.sum(render_tiled(p).final_T)

        def loss_o(p):
            _, t, _ = render_oracle(p)
            return jnp.sum(t)

        gt = jax.grad(loss)(params)
        go = jax.grad(loss_o)(params)
        for k in params:
            a, b = np.asarray(gt[k]), np.asarray(go[k])
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a, b, atol=3e-4 * scale, err_msg=k)

    def test_means2d_probe_exports_screen_grad(self):
        params = make_scene(25, seed=10)
        n = 25
        probe = jnp.zeros((n, 2))

        def loss(probe):
            out = render(
                params["means"], params["quats"], params["log_scales"],
                params["opacity_logits"], params["sh"], jnp.ones((n,), bool),
                jnp.eye(4), INTR, CFG, 0, BG, means2d_probe=probe,
            )
            return jnp.sum(out.color**2)

        g = np.asarray(jax.grad(loss)(probe))
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0  # visible gaussians get screen-space grads
