"""Frame-coherent cached rendering (ops/render_cached.py).

Contract under test:
- at ZERO camera delta the cached frame equals the exact qkey render
  bit-for-bit (same binning, same per-pair math, different dataflow);
- under a small camera delta the error is small and bounded (the anchor's
  tile membership / compositing order with exact re-projection);
- cache honesty fields mirror RenderOutput's.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tpugs.ops.render import RasterConfig, render
from tpugs.ops.render_cached import build_frame_cache, render_cached

W, H = 64, 48
INTR = jnp.array([40.0, 40.0, W / 2, H / 2], jnp.float32)
CFG = RasterConfig(img_h=H, img_w=W, tile_h=16, tile_w=16,
                   pair_capacity=4096, max_hits_per_tile=256)
BG = jnp.array([0.2, 0.3, 0.4])


def make_params(n=120, seed=0, opac=(-1.0, 5.0)):
    rng = np.random.default_rng(seed)
    return dict(
        means=jnp.asarray(
            np.concatenate(
                [rng.uniform(-1.5, 1.5, (n, 2)), rng.uniform(2, 8, (n, 1))], 1
            ),
            jnp.float32,
        ),
        quats=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        log_scales=jnp.log(
            jnp.asarray(rng.uniform(0.05, 0.3, (n, 3)), jnp.float32)
        ),
        opacity_logits=jnp.asarray(rng.uniform(*opac, n), jnp.float32),
        sh=jnp.asarray(rng.normal(size=(n, 3, 1)), jnp.float32) * 0.5,
    )


def _rot_y(theta):
    c, s = np.cos(theta), np.sin(theta)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    return jnp.asarray(m)


def _exact(params, viewmat, alive=None):
    n = params["means"].shape[0]
    alive = jnp.ones((n,), bool) if alive is None else alive
    return render(
        params["means"], params["quats"], params["log_scales"],
        params["opacity_logits"], params["sh"], alive, viewmat, INTR,
        CFG, 0, BG, compositor="pallas", presort="qkey", need_grads=False,
    )


def _cache(params, viewmat, alive=None):
    n = params["means"].shape[0]
    alive = jnp.ones((n,), bool) if alive is None else alive
    return build_frame_cache(
        params["means"], params["quats"], params["log_scales"],
        params["opacity_logits"], params["sh"], alive, viewmat, INTR, CFG, 0,
    )


def _psnr(a, b):
    mse = float(jnp.mean((a - b) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


class TestRenderCached:
    def test_zero_delta_bit_identical(self):
        params = make_params(120, seed=1)
        anchor = jnp.eye(4)
        exact = _exact(params, anchor)
        cache = _cache(params, anchor)
        color, final_t = render_cached(cache, anchor, INTR, CFG, BG)
        np.testing.assert_array_equal(
            np.asarray(color), np.asarray(exact.color)
        )
        np.testing.assert_array_equal(
            np.asarray(final_t), np.asarray(exact.final_T)
        )

    def test_cache_honesty_fields_match_exact_render(self):
        params = make_params(120, seed=2)
        anchor = jnp.eye(4)
        exact = _exact(params, anchor)
        cache = _cache(params, anchor)
        assert int(cache.num_pairs) == int(exact.num_pairs)
        assert bool(cache.pair_overflow) == bool(exact.pair_overflow)
        assert int(cache.max_tile_hits) == int(exact.max_tile_hits)

    def test_small_delta_bounded_error(self):
        """A small rotation between anchor and render camera: exact per-pair
        re-projection keeps the cached frame close to the exact frame; a big
        rotation degrades it (so the viewer must re-anchor)."""
        params = make_params(200, seed=3, opac=(1.0, 5.0))
        anchor = jnp.eye(4)
        cache = _cache(params, anchor)

        small = _rot_y(0.005)  # ~0.3 degrees
        exact_small = _exact(params, small)
        cached_small, _ = render_cached(cache, small, INTR, CFG, BG)
        psnr_small = _psnr(cached_small, exact_small.color)
        assert psnr_small > 34.0, psnr_small

        big = _rot_y(0.15)  # ~8.6 degrees — membership visibly stale
        exact_big = _exact(params, big)
        cached_big, _ = render_cached(cache, big, INTR, CFG, BG)
        psnr_big = _psnr(cached_big, exact_big.color)
        assert psnr_small > psnr_big, (psnr_small, psnr_big)

    def test_offline_interactive_anchor_policy(self):
        """OfflineRenderer.render_interactive: cache reused within the
        re-anchor thresholds, rebuilt past them."""
        from tpugs.viewer.offline import OfflineRenderer

        p = {k: np.asarray(v) for k, v in make_params(120, seed=5).items()}
        r = OfflineRenderer(p, tile=16, pair_capacity=4096, max_hits=256)
        r.render_interactive(H, W, np.eye(4, dtype=np.float32), INTR,
                             (0.0, 0.0, 0.0))
        st = r._icache
        assert st is not None and st["age"] == 1
        # ~0.06 degrees: well inside reanchor_deg=0.25 -> same anchor.
        r.render_interactive(H, W, _rot_y(0.001), INTR, (0.0, 0.0, 0.0))
        assert r._icache is st and st["age"] == 2
        # ~11 degrees: re-anchors.
        r.render_interactive(H, W, _rot_y(0.2), INTR, (0.0, 0.0, 0.0))
        assert r._icache is not st
        # FOV change invalidates too (binning depends on intrinsics).
        st2 = r._icache
        r.render_interactive(H, W, _rot_y(0.2), INTR * 1.5, (0.0, 0.0, 0.0))
        assert r._icache is not st2

    def test_offline_interactive_overflow_grows(self):
        from tpugs.viewer.offline import OfflineRenderer

        p = {k: np.asarray(v) for k, v in make_params(120, seed=6).items()}
        logs = []
        r = OfflineRenderer(p, tile=16, pair_capacity=64, max_hits=16,
                            log=logs.append)
        color, _ = r.render_interactive(H, W, np.eye(4, dtype=np.float32),
                                        INTR, (0.0, 0.0, 0.0))
        assert r.pair_capacity > 64
        assert not bool(r._icache["cache"].pair_overflow)

    def test_dead_slots_stay_dead(self):
        params = make_params(60, seed=4)
        alive = jnp.arange(60) < 30
        anchor = jnp.eye(4)
        exact = _exact(params, anchor, alive=alive)
        cache = _cache(params, anchor, alive=alive)
        color, _ = render_cached(cache, anchor, INTR, CFG, BG)
        np.testing.assert_array_equal(
            np.asarray(color), np.asarray(exact.color)
        )
