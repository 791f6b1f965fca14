"""Fused aligned binning: bin_gaussians_aligned must reproduce the
align_segments(bin_gaussians(...)) layout exactly, and the pre-aligned
Pallas render path must stay pixel/gradient-equal to the scan reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugs.ops.binning import (
    bin_gaussians,
    bin_gaussians_aligned,
    clamp_tile_segments,
)
from tpugs.ops.pallas.composite import _p_aligned, align_segments
from tpugs.ops.projection import project_gaussians
from tpugs.ops.rasterize_tiled import RasterConfig
from tpugs.ops.render import render
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

W, H = 96, 64
CFG = RasterConfig(img_h=H, img_w=W, tile_h=16, tile_w=16,
                   pair_capacity=1 << 13, max_hits_per_tile=256)
N = 200


@pytest.fixture(scope="module")
def proj():
    params = synthetic_params(N, seed=2, sh_coeffs=1)
    alive = jnp.ones((N,), bool)
    return params, alive, project_gaussians(
        params["means"], params["quats"], params["log_scales"],
        params["opacity_logits"], params["sh"], alive,
        jnp.eye(4), synthetic_intrinsics(W, H), W, H, 0,
    )


class TestAlignedBinning:
    def test_matches_align_segments(self, proj):
        _, _, pr = proj
        p_al = _p_aligned(CFG)
        compact = bin_gaussians(pr, W, H, 16, 16, CFG.pair_capacity)
        astart, astop, agauss, avalid = align_segments(
            compact.tile_start, compact.tile_stop, compact.pair_gauss, p_al
        )
        fused = bin_gaussians_aligned(
            pr, W, H, 16, 16, CFG.pair_capacity, p_al
        )
        np.testing.assert_array_equal(np.asarray(fused.tile_start),
                                      np.asarray(astart))
        np.testing.assert_array_equal(np.asarray(fused.tile_stop),
                                      np.asarray(astop))
        np.testing.assert_array_equal(np.asarray(fused.pair_valid),
                                      np.asarray(avalid))
        fv = np.asarray(fused.pair_valid)
        np.testing.assert_array_equal(
            np.asarray(fused.pair_gauss)[fv], np.asarray(agauss)[fv]
        )
        assert not bool(fused.overflow)
        assert int(fused.num_pairs) == int(compact.num_pairs)

    def test_aligned_overflow_flag(self, proj):
        _, _, pr = proj
        fused = bin_gaussians_aligned(pr, W, H, 16, 16, CFG.pair_capacity,
                                      p_aligned=256)
        assert bool(fused.overflow)

    def test_pallas_render_path_matches_scan(self, proj):
        params, alive, _ = proj

        def run(compositor):
            return render(
                params["means"], params["quats"], params["log_scales"],
                params["opacity_logits"], params["sh"], alive,
                jnp.eye(4), synthetic_intrinsics(W, H), CFG, 0,
                jnp.zeros((3,)), compositor=compositor,
            )

        out_p = run("pallas")
        out_s = run("scan")
        np.testing.assert_allclose(np.asarray(out_p.color),
                                   np.asarray(out_s.color), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_p.final_T),
                                   np.asarray(out_s.final_T), atol=1e-5)
        assert int(out_p.max_tile_hits) == int(out_s.max_tile_hits)

    def test_pallas_render_grads_match_scan(self, proj):
        params, alive, _ = proj
        target = jnp.zeros((H, W, 3))

        def loss(p, compositor):
            out = render(
                p["means"], p["quats"], p["log_scales"], p["opacity_logits"],
                p["sh"], alive, jnp.eye(4), synthetic_intrinsics(W, H), CFG,
                0, jnp.zeros((3,)), compositor=compositor,
            )
            return jnp.mean((out.color - target) ** 2)

        g_p = jax.grad(lambda p: loss(p, "pallas"))(params)
        g_s = jax.grad(lambda p: loss(p, "scan"))(params)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(g_p[k]), np.asarray(g_s[k]),
                rtol=1e-4, atol=1e-7, err_msg=k,
            )
