"""Loss & metric property tests (mirrors reference tests/test_loss.cpp and
test_metrics.cpp)."""
import jax
import jax.numpy as jnp
import numpy as np

from tpugs.train.loss import combined_loss, l1_loss, ssim, ssim_loss
from tpugs.train.metrics import compute_psnr, compute_ssim, EvalResults, ImageResult


def rand_img(seed, h=32, w=32):
    return jnp.asarray(np.random.default_rng(seed).uniform(0, 1, (h, w, 3)).astype(np.float32))


class TestL1:
    def test_identical_zero(self):
        img = rand_img(0)
        assert float(l1_loss(img, img)) == 0.0

    def test_known_value(self):
        a = jnp.zeros((4, 4, 3))
        b = jnp.full((4, 4, 3), 0.25)
        np.testing.assert_allclose(float(l1_loss(a, b)), 0.25, rtol=1e-6)

    def test_symmetric(self):
        a, b = rand_img(1), rand_img(2)
        assert abs(float(l1_loss(a, b)) - float(l1_loss(b, a))) < 1e-7


class TestBlurMatmulParity:
    """The separable banded-matmul blur must match the depthwise-conv2d
    formulation it replaced (reference SSIM conv: loss.cpp:88-124)."""

    def test_matches_conv_oracle(self):
        from jax import lax

        from tpugs.train.loss import _blur_maps

        window, sigma = 11, 1.5
        half = window // 2
        t = np.arange(window, dtype=np.float64) - half
        k1 = np.exp(-(t**2) / (2 * sigma * sigma))
        k1 /= k1.sum()
        k2 = np.outer(k1, k1)
        k2 /= k2.sum()
        kernel = jnp.asarray(np.tile(k2[None, None], (3, 1, 1, 1)), jnp.float32)

        img = jnp.asarray(
            np.random.default_rng(7).uniform(0, 1, (3, 37, 53)), jnp.float32
        )
        conv = lax.conv_general_dilated(
            img[None], kernel, (1, 1), [(half, half), (half, half)],
            feature_group_count=3,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0]
        mm = _blur_maps(img, window)
        np.testing.assert_allclose(np.asarray(mm), np.asarray(conv), atol=2e-6)


class TestSSIM:
    def test_identical_is_one(self):
        img = rand_img(3)
        m = ssim(img, img)
        np.testing.assert_allclose(np.asarray(m), 1.0, atol=1e-4)
        assert float(ssim_loss(img, img)) < 1e-4

    def test_range(self):
        a, b = rand_img(4), rand_img(5)
        m = np.asarray(ssim(a, b))
        assert (m >= -1 - 1e-5).all() and (m <= 1 + 1e-5).all()

    def test_symmetric(self):
        a, b = rand_img(6), rand_img(7)
        np.testing.assert_allclose(
            float(ssim_loss(a, b)), float(ssim_loss(b, a)), atol=1e-6
        )

    def test_differentiable(self):
        a, b = rand_img(8), rand_img(9)
        g = jax.grad(lambda x: combined_loss(x, b))(a)
        assert np.isfinite(np.asarray(g)).all()

    def test_combined_lambda(self):
        a, b = rand_img(10), rand_img(11)
        l1 = float(l1_loss(a, b))
        sl = float(ssim_loss(a, b))
        c = float(combined_loss(a, b, 0.2))
        np.testing.assert_allclose(c, 0.8 * l1 + 0.2 * sl, rtol=1e-5)


class TestPSNR:
    def test_identical_clamped_100(self):
        img = rand_img(12)
        assert float(compute_psnr(img, img)) == 100.0

    def test_known_mse(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)  # mse = 0.01 -> psnr = 20
        np.testing.assert_allclose(float(compute_psnr(a, b)), 20.0, rtol=1e-5)

    def test_json_roundtrip(self, tmp_path):
        r = EvalResults(images=[ImageResult("a.png", 25.0, 0.9, 12.0)]).finalize()
        p = tmp_path / "metrics.json"
        r.save_json(str(p))
        import json

        loaded = json.loads(p.read_text())
        assert loaded["mean_psnr"] == 25.0
        assert loaded["images"][0]["name"] == "a.png"
