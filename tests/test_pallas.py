"""Pallas compositor kernels vs the scan compositor (interpret mode on CPU).

The scan path is itself validated against the dense oracle + autodiff
(test_rasterize_tiled.py), so agreement here closes the chain:
oracle -> scan custom-VJP -> Pallas kernels.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugs.ops.render import RasterConfig, render

W, H = 64, 48
INTR = jnp.array([40.0, 40.0, W / 2, H / 2], jnp.float32)
CFG = RasterConfig(img_h=H, img_w=W, tile_h=16, tile_w=16,
                   pair_capacity=4096, max_hits_per_tile=256)
CFG32 = RasterConfig(img_h=H, img_w=W, tile_h=32, tile_w=32,
                     pair_capacity=4096, max_hits_per_tile=256)
BG = jnp.array([0.2, 0.3, 0.4])


def make_params(n=60, seed=0, opac=(-1.0, 5.0)):
    rng = np.random.default_rng(seed)
    return dict(
        means=jnp.asarray(
            np.concatenate(
                [rng.uniform(-1.5, 1.5, (n, 2)), rng.uniform(2, 8, (n, 1))], 1
            ),
            jnp.float32,
        ),
        quats=jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        log_scales=jnp.log(jnp.asarray(rng.uniform(0.05, 0.3, (n, 3)), jnp.float32)),
        opacity_logits=jnp.asarray(rng.uniform(*opac, n), jnp.float32),
        sh=jnp.asarray(rng.normal(size=(n, 3, 1)), jnp.float32) * 0.5,
    )


def run(params, comp, alive=None, cfg=CFG):
    n = params["means"].shape[0]
    alive = jnp.ones((n,), bool) if alive is None else alive
    return render(
        params["means"], params["quats"], params["log_scales"],
        params["opacity_logits"], params["sh"], alive,
        jnp.eye(4), INTR, cfg, 0, BG, compositor=comp,
    )


class TestPallasForward:
    def test_pixels_match_scan(self):
        params = make_params(60, seed=1)
        op = run(params, "pallas")
        os_ = run(params, "scan")
        np.testing.assert_allclose(
            np.asarray(op.color), np.asarray(os_.color), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(op.final_T), np.asarray(os_.final_T), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(op.n_contrib), np.asarray(os_.n_contrib)
        )

    def test_saturated_scene(self):
        params = make_params(80, seed=2, opac=(3.0, 10.0))
        op = run(params, "pallas")
        os_ = run(params, "scan")
        np.testing.assert_allclose(
            np.asarray(op.color), np.asarray(os_.color), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(op.n_contrib), np.asarray(os_.n_contrib)
        )

    def test_empty_scene(self):
        params = make_params(8, seed=3)
        out = run(params, "pallas", alive=jnp.zeros((8,), bool))
        np.testing.assert_allclose(
            np.asarray(out.color), np.tile(np.asarray(BG), (H, W, 1)), atol=1e-6
        )


class TestPallas32x32Tiles:
    """The tile size is a tuning knob (SURVEY.md §7 hard part #4); 32x32 maps
    the flattened tile to (8, 128) VPU shape."""

    def test_forward_and_grads_match_scan(self):
        params = make_params(60, seed=11)
        op = run(params, "pallas", cfg=CFG32)
        os_ = run(params, "scan", cfg=CFG32)
        np.testing.assert_allclose(np.asarray(op.color), np.asarray(os_.color), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(op.n_contrib), np.asarray(os_.n_contrib))

        def loss(p, comp):
            out = run(p, comp, cfg=CFG32)
            return jnp.sum(out.color**2) + jnp.sum(out.final_T)

        gp = jax.grad(lambda p: loss(p, "pallas"))(params)
        gs = jax.grad(lambda p: loss(p, "scan"))(params)
        for k in params:
            a, b = np.asarray(gp[k]), np.asarray(gs[k])
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a, b, atol=1e-5 * scale, err_msg=k)


class TestPallasBackward:
    def test_grads_match_scan(self):
        params = make_params(50, seed=4)
        rng = np.random.default_rng(5)
        target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

        def loss(p, comp):
            out = run(p, comp)
            return jnp.mean((out.color - target) ** 2) + 0.1 * jnp.mean(out.final_T)

        gp = jax.grad(lambda p: loss(p, "pallas"))(params)
        gs = jax.grad(lambda p: loss(p, "scan"))(params)
        for k in params:
            a, b = np.asarray(gp[k]), np.asarray(gs[k])
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a, b, atol=1e-5 * scale, err_msg=k)

    def test_grads_match_saturated(self):
        params = make_params(60, seed=6, opac=(4.0, 12.0))

        def loss(p, comp):
            out = run(p, comp)
            return jnp.sum(out.color**2)

        gp = jax.grad(lambda p: loss(p, "pallas"))(params)
        gs = jax.grad(lambda p: loss(p, "scan"))(params)
        for k in params:
            a, b = np.asarray(gp[k]), np.asarray(gs[k])
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a, b, atol=1e-5 * scale, err_msg=k)


class TestLargeTiles:
    """pix >= 2048 tiles — uncompilable in the lane-wave geometry (Mosaic
    lane-pads (pix, 1) carries 128x past the VMEM limit; composite.py
    _fwd_pix_limit) — must be exact in the transposed geometry, where
    per-pixel state is (1, pix) rows. Each tile-size doubling halves the
    pair count, the dominant viewer cost (docs/PERF_NOTES.md)."""

    CFG64 = RasterConfig(img_h=128, img_w=128, tile_h=64, tile_w=64,
                         pair_capacity=8192, max_hits_per_tile=512)

    def test_tile64_forward_and_grads(self):
        params = make_params(80, seed=9)
        op = run(params, "pallas", cfg=self.CFG64)
        os_ = run(params, "scan", cfg=self.CFG64)
        np.testing.assert_allclose(
            np.asarray(op.color), np.asarray(os_.color), atol=1e-5
        )

        def loss(p, comp):
            out = run(p, comp, cfg=self.CFG64)
            return jnp.mean(out.color ** 2)

        gp = jax.grad(lambda p: loss(p, "pallas"))(params)
        gs = jax.grad(lambda p: loss(p, "scan"))(params)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(gp[k]), np.asarray(gs[k]),
                rtol=1e-4, atol=1e-7, err_msg=k,
            )


class TestOddTileSizes:
    """Non-power-of-two tiles exercise the pixel sub-block divisor walk in
    BOTH kernels (tile 40 => pix 1600: fwd blocks of 800, bwd blocks of 100 —
    a naive ceil-divide block count would silently skip tail pixels)."""

    CFG40 = RasterConfig(img_h=H, img_w=W, tile_h=40, tile_w=40,
                         pair_capacity=4096, max_hits_per_tile=256)

    def test_tile40_forward_and_grads(self):
        params = make_params(60, seed=4)
        op = run(params, "pallas", cfg=self.CFG40)
        os_ = run(params, "scan", cfg=self.CFG40)
        np.testing.assert_allclose(
            np.asarray(op.color), np.asarray(os_.color), atol=1e-5
        )

        def loss(p, comp):
            out = run(p, comp, cfg=self.CFG40)
            return jnp.mean(out.color ** 2)

        gp = jax.grad(lambda p: loss(p, "pallas"))(params)
        gs = jax.grad(lambda p: loss(p, "scan"))(params)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(gp[k]), np.asarray(gs[k]),
                rtol=1e-4, atol=1e-7, err_msg=k,
            )


class TestAlignCopyClamp:
    """The align-copy DMA kernel (pallas/pack.py) must honor clamped
    segments (max_hits small), not the raw sort runs. (The round-2 XLA
    align_segments + pack_sorted_attrs production path and the lane-wave
    kernel geometry were deleted in round 4 after losing every A/B since
    round 3; align_segments survives as the oracle for
    tests/test_binning_aligned.py.)"""

    def test_undersized_capacity_still_matches_scan(self):
        cfg = RasterConfig(img_h=H, img_w=W, tile_h=16, tile_w=16,
                           pair_capacity=4096, max_hits_per_tile=16)
        params = make_params(120, seed=9, opac=(3.0, 8.0))
        op = run(params, "pallas", cfg=cfg)
        os_ = run(params, "scan", cfg=cfg)
        np.testing.assert_allclose(
            np.asarray(op.color), np.asarray(os_.color), atol=1e-5
        )


class TestEwaveKnob:
    """TPUGS_EWAVE (sub-wave depth) is a pure perf knob — every value must
    be exact. Pins the non-default shapes the TPU sweep uses."""

    @pytest.mark.parametrize("ewave,ewave_bwd", [(8, 8), (16, 32), (32, 128)])
    def test_ewave_parity(self, monkeypatch, ewave, ewave_bwd):
        from tpugs.ops.pallas import composite_t as ct

        monkeypatch.setattr(ct, "EWAVE", ewave)
        monkeypatch.setattr(ct, "GSUB", ct.GROUP // ewave)
        monkeypatch.setattr(ct, "EWAVE_BWD", ewave_bwd)
        monkeypatch.setattr(ct, "GSUB_BWD", ct.GROUP // ewave_bwd)
        params = make_params(60, seed=13)
        op = run(params, "pallas", cfg=CFG32)
        os_ = run(params, "scan", cfg=CFG32)
        np.testing.assert_allclose(
            np.asarray(op.color), np.asarray(os_.color), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(op.n_contrib), np.asarray(os_.n_contrib)
        )

        def loss(p, c):
            return jnp.sum(run(p, c, cfg=CFG32).color ** 2)

        gp = jax.grad(lambda p: loss(p, "pallas"))(params)
        gs = jax.grad(lambda p: loss(p, "scan"))(params)
        for k in params:
            a, b = np.asarray(gp[k]), np.asarray(gs[k])
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a, b, atol=1e-5 * scale, err_msg=k)


class TestSortedSegred:
    """Both segred reduction paths must produce the same gradients as the
    scan compositor: the sorted-key variant (segreduce.segment_reduce_
    sorted_pallas — the default, threshold 0) and the classic inversion-
    sort + gather path (the automatic n >= 2^24 fallback, forced here by
    raising the threshold so it keeps parity coverage)."""

    @pytest.mark.parametrize("threshold", [0, 1 << 62])
    def test_grads_match_scan(self, monkeypatch, threshold):
        from tpugs.ops.pallas import composite as cp

        monkeypatch.setattr(cp, "_SORTED_SEGRED_MIN", threshold)
        params = make_params(60, seed=21)
        rng = np.random.default_rng(22)
        target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

        def loss(p, comp):
            out = run(p, comp)
            return jnp.mean((out.color - target) ** 2) + 0.1 * jnp.mean(
                out.final_T
            )

        gp = jax.grad(lambda p: loss(p, "pallas"))(params)
        gs = jax.grad(lambda p: loss(p, "scan"))(params)
        for k in params:
            a, b = np.asarray(gp[k]), np.asarray(gs[k])
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a, b, atol=1e-5 * scale, err_msg=k)

    @pytest.mark.parametrize("threshold", [0, 1 << 62])
    def test_grads_match_saturated_clamped(self, monkeypatch, threshold):
        """Saturated scene + tight hit cap: front-K-clamped entries must be
        excluded from the reduction exactly as the forward excludes them —
        on both paths (sorted-key masking / expansion-domain masking)."""
        from tpugs.ops.pallas import composite as cp

        monkeypatch.setattr(cp, "_SORTED_SEGRED_MIN", threshold)
        params = make_params(60, seed=23, opac=(4.0, 12.0))
        cfg = RasterConfig(img_h=H, img_w=W, tile_h=16, tile_w=16,
                           pair_capacity=CFG.pair_capacity,
                           max_hits_per_tile=24)

        def loss(p, comp):
            out = run(p, comp, cfg=cfg)
            return jnp.sum(out.color ** 2)

        gp = jax.grad(lambda p: loss(p, "pallas"))(params)
        gs = jax.grad(lambda p: loss(p, "scan"))(params)
        for k in params:
            a, b = np.asarray(gp[k]), np.asarray(gs[k])
            scale = np.abs(b).max() + 1e-12
            np.testing.assert_allclose(a, b, atol=1e-5 * scale, err_msg=k)
