"""Core math tests (mirrors reference tests/test_sh.cpp & parts of
test_projection.cpp)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugs.core import sh as sh_lib
from tpugs.core import transforms as tf


class TestQuat:
    def test_identity(self):
        R = tf.quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_orthonormal(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(32, 4)).astype(np.float32)
        R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)

    def test_unnormalized_equals_normalized(self):
        q = jnp.array([2.0, 1.0, -0.5, 0.3])
        R1 = tf.quat_to_rotmat(q)
        R2 = tf.quat_to_rotmat(q / jnp.linalg.norm(q))
        np.testing.assert_allclose(R1, R2, atol=1e-5)

    def test_z_rotation_90(self):
        # 90 deg about z: q = (cos45, 0, 0, sin45)
        s = np.sin(np.pi / 4)
        R = np.asarray(tf.quat_to_rotmat(jnp.array([np.cos(np.pi / 4), 0, 0, s])))
        np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)


class TestCov3D:
    def test_isotropic(self):
        cov = tf.compute_cov3d(
            jnp.log(jnp.array([[0.5, 0.5, 0.5]])), jnp.array([[1.0, 0, 0, 0]])
        )
        np.testing.assert_allclose(cov[0], 0.25 * np.eye(3), atol=1e-6)

    def test_rotation_invariant_trace(self):
        rng = np.random.default_rng(1)
        log_s = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32) * 0.3)
        q = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
        cov = np.asarray(tf.compute_cov3d(log_s, q))
        s2 = np.sum(np.exp(np.asarray(log_s)) ** 2, axis=-1)
        np.testing.assert_allclose(np.trace(cov, axis1=-2, axis2=-1), s2, rtol=1e-2)

    def test_psd(self):
        rng = np.random.default_rng(2)
        cov = np.asarray(
            tf.compute_cov3d(
                jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32)),
                jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32)),
            )
        )
        eig = np.linalg.eigvalsh(cov)
        assert (eig > -1e-5).all()

    def test_scale_modifier(self):
        log_s = jnp.zeros((1, 3))
        q = jnp.array([[1.0, 0, 0, 0]])
        c1 = tf.compute_cov3d(log_s, q, scale_modifier=1.0)
        c2 = tf.compute_cov3d(log_s, q, scale_modifier=2.0)
        np.testing.assert_allclose(np.asarray(c2), 4.0 * np.asarray(c1), rtol=1e-4)


class TestCov2D:
    def test_lowpass_floor(self):
        # A vanishingly small Gaussian still gets the 0.3 low-pass diagonal.
        cov3d = tf.compute_cov3d(jnp.full((1, 3), -10.0), jnp.array([[1.0, 0, 0, 0]]))
        cov2d = tf.compute_cov2d(
            cov3d, jnp.eye(3), jnp.array([[0.0, 0.0, 5.0]]), 100.0, 100.0
        )
        np.testing.assert_allclose(
            np.asarray(cov2d[0]), [tf.COV2D_LOWPASS, 0.0, tf.COV2D_LOWPASS], atol=1e-4
        )

    def test_isotropic_circular(self):
        cov3d = tf.compute_cov3d(jnp.log(jnp.full((1, 3), 0.1)), jnp.array([[1.0, 0, 0, 0]]))
        cov2d = np.asarray(
            tf.compute_cov2d(cov3d, jnp.eye(3), jnp.array([[0.0, 0.0, 4.0]]), 200.0, 200.0)
        )[0]
        assert abs(cov2d[0] - cov2d[2]) < 1e-4  # a == c
        assert abs(cov2d[1]) < 1e-4  # b == 0

    def test_radius_grows_with_scale(self):
        q = jnp.array([[1.0, 0, 0, 0]])
        t = jnp.array([[0.0, 0.0, 3.0]])
        r = []
        for s in (0.05, 0.1, 0.4):
            cov3d = tf.compute_cov3d(jnp.log(jnp.full((1, 3), s)), q)
            cov2d = tf.compute_cov2d(cov3d, jnp.eye(3), t, 300.0, 300.0)
            r.append(int(tf.radius_from_cov2d(cov2d)[0]))
        assert r[0] < r[1] < r[2]

    def test_inverse(self):
        cov2d = jnp.array([[2.0, 0.3, 1.0]])
        conic, det = tf.inv_cov2d(cov2d)
        m = np.array([[2.0, 0.3], [0.3, 1.0]])
        inv = np.linalg.inv(m)
        np.testing.assert_allclose(
            np.asarray(conic[0]), [inv[0, 0], inv[0, 1], inv[1, 1]], rtol=1e-5
        )
        np.testing.assert_allclose(float(det[0]), np.linalg.det(m), rtol=1e-5)

    def test_inverse_degenerate_zeroed(self):
        conic, det = tf.inv_cov2d(jnp.array([[1.0, 2.0, 1.0]]))  # det = -3
        assert float(det[0]) < 0
        np.testing.assert_allclose(np.asarray(conic[0]), 0.0)


class TestSH:
    def test_degree0_direction_independent(self):
        # Mirrors reference test_sh.cpp: deg-0 == C0*c + 0.5 for any direction.
        coeffs = jnp.zeros((4, 3, 1)).at[:, :, 0].set(jnp.array([1.0, -0.5, 2.0]))
        rng = np.random.default_rng(3)
        dirs = rng.normal(size=(4, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        rgb = np.asarray(sh_lib.eval_sh(0, coeffs, jnp.asarray(dirs, jnp.float32)))
        expected = sh_lib.SH_C0 * np.array([1.0, -0.5, 2.0]) + 0.5
        np.testing.assert_allclose(rgb, np.tile(expected, (4, 1)), atol=1e-6)

    def test_degree1_known_direction(self):
        # dir = +z: only the C1*z basis term (index 2) is nonzero among deg-1.
        c = np.zeros((1, 3, 4), np.float32)
        c[0, 0, 2] = 1.0
        rgb = np.asarray(sh_lib.eval_sh(1, jnp.asarray(c), jnp.array([[0.0, 0.0, 1.0]])))
        np.testing.assert_allclose(rgb[0, 0], sh_lib.SH_C1 * 1.0 + 0.5, atol=1e-6)
        np.testing.assert_allclose(rgb[0, 1:], 0.5, atol=1e-6)

    def test_linearity(self):
        rng = np.random.default_rng(4)
        c1 = jnp.asarray(rng.normal(size=(5, 3, 16)).astype(np.float32))
        c2 = jnp.asarray(rng.normal(size=(5, 3, 16)).astype(np.float32))
        d = rng.normal(size=(5, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d, jnp.float32)
        # eval(a+b) - 0.5 == (eval(a)-0.5) + (eval(b)-0.5)
        lhs = sh_lib.eval_sh(3, c1 + c2, d) - 0.5
        rhs = (sh_lib.eval_sh(3, c1, d) - 0.5) + (sh_lib.eval_sh(3, c2, d) - 0.5)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)

    def test_higher_degree_ignores_extra_coeffs(self):
        rng = np.random.default_rng(5)
        c = jnp.asarray(rng.normal(size=(2, 3, 16)).astype(np.float32))
        d = jnp.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
        r1 = sh_lib.eval_sh(1, c, d)
        r1b = sh_lib.eval_sh(1, c[..., :4], d)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r1b), atol=1e-6)

    def test_dc_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(
            np.asarray(sh_lib.sh_dc_to_rgb(sh_lib.rgb_to_sh_dc(rgb))), np.asarray(rgb),
            atol=1e-6,
        )


class TestScalarEWAChain:
    """ewa_cov2d_scalar (the fused component-wise projection chain) must
    match the matrix-form compute_cov2d(compute_cov3d(...)) oracle."""

    def test_matches_matrix_form(self):
        rng = np.random.default_rng(3)
        n = 500
        log_s = jnp.asarray(rng.uniform(-4, 0, (n, 3)).astype(np.float32))
        q = jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32))
        t = jnp.asarray(
            np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                      rng.uniform(0.5, 10, n)], -1).astype(np.float32))
        th = 0.3
        W = jnp.asarray(np.array(
            [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
             [-np.sin(th), 0, np.cos(th)]], np.float32))
        for mod in (1.0, 2.0):
            ref = tf.compute_cov2d(
                tf.compute_cov3d(log_s, q, mod), W, t, 120.0, 110.0)
            got = tf.ewa_cov2d_scalar(log_s, q, W, t, 120.0, 110.0, mod)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_grad_matches_matrix_form(self):
        rng = np.random.default_rng(4)
        n = 64
        log_s = jnp.asarray(rng.uniform(-3, -1, (n, 3)).astype(np.float32))
        q = jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32))
        t = jnp.asarray(
            np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                      rng.uniform(1, 5, n)], -1).astype(np.float32))
        W = jnp.eye(3)

        def loss_m(ls, qq, tt):
            return jnp.sum(
                tf.compute_cov2d(tf.compute_cov3d(ls, qq), W, tt, 100.0,
                                 100.0) ** 2)

        def loss_s(ls, qq, tt):
            return jnp.sum(
                tf.ewa_cov2d_scalar(ls, qq, W, tt, 100.0, 100.0) ** 2)

        gm = jax.grad(loss_m, argnums=(0, 1, 2))(log_s, q, t)
        gs = jax.grad(loss_s, argnums=(0, 1, 2))(log_s, q, t)
        # f32 association-order noise only (finite-diff suite is the
        # authoritative gradient pin).
        for a, b in zip(gm, gs):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-2, atol=1e-4)
