"""Oracle renderer semantics tests (mirrors reference tests/test_rasterizer.cpp)."""
import jax
import jax.numpy as jnp
import numpy as np

from tpugs.ops.projection import project_gaussians
from tpugs.ops.rasterize_ref import render_reference

W, H = 32, 32
INTR = jnp.array([50.0, 50.0, W / 2.0, H / 2.0], jnp.float32)


def project(means, **kw):
    n = means.shape[0]
    defaults = dict(
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        log_scales=jnp.log(jnp.full((n, 3), 0.1)),
        opacity_logits=jnp.full((n,), 4.0),  # near-opaque
        sh=jnp.zeros((n, 3, 1)),
        alive=jnp.ones((n,), bool),
    )
    defaults.update(kw)
    return project_gaussians(
        jnp.asarray(means, jnp.float32),
        viewmat=jnp.eye(4),
        intrinsics=INTR,
        img_w=W,
        img_h=H,
        sh_degree=0,
        **defaults,
    )


def red_sh(n):
    """SH DC giving rgb ~ (1, 0, 0) pre-clamp (0.5/C0 for R, -0.5/C0 else)."""
    from tpugs.core.sh import rgb_to_sh_dc

    sh = np.zeros((n, 3, 1), np.float32)
    sh[:, :, 0] = np.asarray(rgb_to_sh_dc(jnp.array([1.0, 0.0, 0.0])))
    return jnp.asarray(sh)


class TestOracle:
    def test_empty_scene_is_background(self):
        p = project(jnp.zeros((1, 3)), alive=jnp.zeros((1,), bool))
        bg = jnp.array([0.1, 0.6, 0.3])
        color, final_t, n_contrib = render_reference(p, H, W, bg)
        np.testing.assert_allclose(
            np.asarray(color), np.tile(np.asarray(bg), (H, W, 1)), atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(final_t), 1.0)
        assert int(np.asarray(n_contrib).sum()) == 0

    def test_single_gaussian_center(self):
        p = project(jnp.array([[0.0, 0.0, 3.0]]), sh=red_sh(1))
        color, final_t, n_contrib = render_reference(p, H, W, jnp.zeros(3))
        c = np.asarray(color)
        assert c[H // 2, W // 2, 0] > 0.5  # red at center
        assert c[H // 2, W // 2, 1] < 0.05
        assert c[0, 0, 0] < 0.1  # corner mostly background
        assert float(final_t[H // 2, W // 2]) < 0.2
        assert int(n_contrib[H // 2, W // 2]) == 1

    def test_depth_ordering_front_wins(self):
        from tpugs.core.sh import rgb_to_sh_dc

        sh = np.zeros((2, 3, 1), np.float32)
        sh[0, :, 0] = np.asarray(rgb_to_sh_dc(jnp.array([1.0, 0.0, 0.0])))  # near: red
        sh[1, :, 0] = np.asarray(rgb_to_sh_dc(jnp.array([0.0, 1.0, 0.0])))  # far: green
        p = project(
            jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 6.0]]),
            sh=jnp.asarray(sh),
            opacity_logits=jnp.full((2,), 8.0),
        )
        color, _, _ = render_reference(p, H, W, jnp.zeros(3))
        c = np.asarray(color)[H // 2, W // 2]
        assert c[0] > 0.9 and c[1] < 0.1

    def test_transmittance_range(self):
        rng = np.random.default_rng(0)
        means = np.concatenate(
            [rng.uniform(-0.5, 0.5, (20, 2)), rng.uniform(2, 6, (20, 1))], axis=1
        )
        p = project(jnp.asarray(means, jnp.float32))
        _, final_t, _ = render_reference(p, H, W, jnp.zeros(3))
        t = np.asarray(final_t)
        assert (t >= 0).all() and (t <= 1.0 + 1e-6).all()

    def test_background_blend(self):
        # Semi-transparent Gaussian over a white background.
        p = project(jnp.array([[0.0, 0.0, 3.0]]), opacity_logits=jnp.array([0.0]))
        color, final_t, _ = render_reference(p, H, W, jnp.ones(3))
        c = np.asarray(color)[H // 2, W // 2]
        t = float(final_t[H // 2, W // 2])
        # center: 0.5-color gaussian with alpha ~0.5 over white
        expected = (1 - t) * 0.5 + t * 1.0
        np.testing.assert_allclose(c, expected, atol=0.05)

    def test_differentiable(self):
        def loss_fn(logits):
            p = project(jnp.array([[0.0, 0.0, 3.0]]), opacity_logits=logits)
            color, _, _ = render_reference(p, H, W, jnp.zeros(3))
            return jnp.sum(color)

        g = jax.grad(loss_fn)(jnp.array([1.0]))
        assert np.isfinite(np.asarray(g)).all()
        assert abs(float(g[0])) > 0

    def test_alpha_clamp_caps_contribution(self):
        # Enormous opacity still yields alpha <= 0.99 => final_T >= 0.01 after 1 splat.
        p = project(jnp.array([[0.0, 0.0, 3.0]]), opacity_logits=jnp.array([50.0]))
        _, final_t, n = render_reference(p, H, W, jnp.zeros(3))
        assert float(final_t[H // 2, W // 2]) >= 0.01 - 1e-6
