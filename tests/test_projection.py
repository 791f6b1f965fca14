"""Projection-stage tests (mirrors reference tests/test_projection.cpp)."""
import jax.numpy as jnp
import numpy as np

from tpugs.ops.projection import project_gaussians

W, H = 64, 48
INTR = jnp.array([100.0, 100.0, W / 2.0, H / 2.0], jnp.float32)


def make_proj(means, viewmat=None, sh_degree=0, **kw):
    n = means.shape[0]
    viewmat = jnp.eye(4) if viewmat is None else viewmat
    defaults = dict(
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        log_scales=jnp.log(jnp.full((n, 3), 0.05)),
        opacity_logits=jnp.zeros((n,)),
        sh=jnp.zeros((n, 3, 1)),
        alive=jnp.ones((n,), bool),
    )
    defaults.update(kw)
    return project_gaussians(
        jnp.asarray(means, jnp.float32),
        viewmat=viewmat,
        intrinsics=INTR,
        img_w=W,
        img_h=H,
        sh_degree=sh_degree,
        **defaults,
    )


class TestProjection:
    def test_center_point(self):
        p = make_proj(jnp.array([[0.0, 0.0, 5.0]]))
        np.testing.assert_allclose(np.asarray(p.means2d[0]), [W / 2, H / 2], atol=1e-4)
        assert float(p.depths[0]) == 5.0
        assert bool(p.visible[0])
        assert int(p.radii[0]) > 0

    def test_behind_camera_culled(self):
        p = make_proj(jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 0.1]]))
        assert not bool(p.visible[0])  # behind
        assert not bool(p.visible[1])  # closer than near plane 0.2
        assert int(p.radii[0]) == 0 and int(p.radii[1]) == 0

    def test_dead_slot_culled(self):
        p = make_proj(
            jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, 5.0]]),
            alive=jnp.array([True, False]),
        )
        assert bool(p.visible[0]) and not bool(p.visible[1])
        assert float(p.opac[1]) == 0.0

    def test_pinhole_offsets(self):
        # x = fx * X/Z + cx
        p = make_proj(jnp.array([[1.0, 0.5, 10.0]]))
        np.testing.assert_allclose(
            np.asarray(p.means2d[0]),
            [100.0 * 1.0 / 10.0 + W / 2, 100.0 * 0.5 / 10.0 + H / 2],
            rtol=1e-5,
        )

    def test_opacity_sigmoid(self):
        p = make_proj(
            jnp.array([[0.0, 0.0, 5.0]]), opacity_logits=jnp.array([0.0])
        )
        np.testing.assert_allclose(float(p.opac[0]), 0.5, atol=1e-6)

    def test_farther_is_smaller(self):
        p = make_proj(jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, 20.0]]))
        assert int(p.radii[0]) > int(p.radii[1])

    def test_scale_modifier_radius(self):
        means = jnp.array([[0.0, 0.0, 5.0]])
        p1 = make_proj(means)
        kw = dict(
            quats=jnp.array([[1.0, 0, 0, 0]]),
            log_scales=jnp.log(jnp.full((1, 3), 0.05)),
            opacity_logits=jnp.zeros((1,)),
            sh=jnp.zeros((1, 3, 1)),
            alive=jnp.ones((1,), bool),
        )
        p2 = project_gaussians(
            means, viewmat=jnp.eye(4), intrinsics=INTR, img_w=W, img_h=H,
            sh_degree=0, scale_modifier=3.0, **kw
        )
        assert int(p2.radii[0]) > int(p1.radii[0])

    def test_sh_color_clamped_nonneg(self):
        p = make_proj(
            jnp.array([[0.0, 0.0, 5.0]]),
            sh=jnp.full((1, 3, 1), -100.0),
        )
        assert (np.asarray(p.rgb) >= 0).all()

    def test_view_matrix_translation(self):
        # Camera shifted so the point lands off-center.
        vm = jnp.eye(4).at[0, 3].set(1.0)  # t_x = 1
        p = make_proj(jnp.array([[0.0, 0.0, 4.0]]), viewmat=vm)
        np.testing.assert_allclose(
            float(p.means2d[0, 0]), 100.0 * 1.0 / 4.0 + W / 2, rtol=1e-5
        )

    def test_anisotropic_conic(self):
        p = make_proj(
            jnp.array([[0.0, 0.0, 5.0]]),
            log_scales=jnp.log(jnp.array([[0.5, 0.05, 0.05]])),
        )
        conic = np.asarray(p.conic[0])
        # Wide in x => small inverse-covariance a, larger c.
        assert conic[0] < conic[2]
        assert bool(p.visible[0])
