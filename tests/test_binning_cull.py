"""Pixel-exactness of the alpha-aware pair cull (binning.cull_radius_sq).

Property under test: every (tile, gaussian) pair dropped by the cull would
have been skipped by the compositor's per-pixel alpha >= 1/255 test at every
pixel of that tile — i.e. the cull can never change a rendered pixel.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tpugs.ops.binning import bin_gaussians, cull_radius_sq, tile_rects
from tpugs.ops.projection import project_gaussians
from tpugs.utils.synthetic import synthetic_intrinsics, synthetic_params

W, H = 96, 64
TILE = 16
ALPHA_MIN = 1.0 / 255.0


def _project(n, seed):
    params = synthetic_params(n, seed=seed, scale_range=(0.02, 0.3))
    return project_gaussians(
        params["means"], params["quats"], params["log_scales"],
        params["opacity_logits"], params["sh"], jnp.ones((n,), bool),
        jnp.eye(4), synthetic_intrinsics(W, H), W, H, 2,
    )


class TestCullExactness:
    def test_culled_pairs_have_subthreshold_alpha_everywhere(self):
        n = 120
        proj = _project(n, seed=11)
        tx0, ty0, wt, ht = tile_rects(proj, W, H, TILE, TILE)
        r2 = np.asarray(cull_radius_sq(proj))
        m2d = np.asarray(proj.means2d)
        conic = np.asarray(proj.conic)
        opac = np.asarray(proj.opac)
        tx0, ty0, wt, ht = map(np.asarray, (tx0, ty0, wt, ht))

        checked = culled = 0
        for g in range(n):
            for ty in range(ty0[g], ty0[g] + ht[g]):
                for tx in range(tx0[g], tx0[g] + wt[g]):
                    x0, y0 = tx * TILE, ty * TILE
                    cx = np.clip(m2d[g, 0], x0, x0 + TILE - 1)
                    cy = np.clip(m2d[g, 1], y0, y0 + TILE - 1)
                    d2 = (cx - m2d[g, 0]) ** 2 + (cy - m2d[g, 1]) ** 2
                    if d2 <= r2[g]:
                        continue  # kept pair
                    culled += 1
                    # brute-force: max alpha over every pixel of the tile
                    a, b, c = conic[g]
                    for py in range(y0, y0 + TILE):
                        for px in range(x0, x0 + TILE):
                            dx, dy = px - m2d[g, 0], py - m2d[g, 1]
                            power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                            alpha = opac[g] * np.exp(min(power, 0.0))
                            assert alpha < ALPHA_MIN, (
                                f"culled pair (g={g}, tile={tx},{ty}) has a pixel "
                                f"with alpha {alpha:.5f} >= 1/255"
                            )
                            checked += 1
        assert culled > 0, "test scene produced no culled pairs - not probing anything"

    def test_cull_shrinks_segments_and_alpha_rects_shrink_accounting(self):
        n = 200
        proj = _project(n, seed=12)
        binning = bin_gaussians(proj, W, H, TILE, TILE, pair_capacity=1 << 14)
        from tpugs.ops.binning import cull_radius_sq

        _, _, wt3, ht3 = tile_rects(proj, W, H, TILE, TILE)  # 3-sigma rects
        _, _, wt, ht = tile_rects(proj, W, H, TILE, TILE, cull_radius_sq(proj))
        rect3_pairs = int(jnp.sum(wt3 * ht3))
        rect_pairs = int(jnp.sum(wt * ht))
        # Capacity accounting follows the alpha-aware rects (min(3-sigma,
        # alpha radius)) — never larger than pure 3-sigma rects.
        assert int(binning.num_pairs) == rect_pairs
        assert rect_pairs <= rect3_pairs
        # The corner cull shrinks the sorted segments further still.
        seg_total = int(jnp.sum(binning.tile_stop - binning.tile_start))
        assert seg_total <= rect_pairs
        assert seg_total > 0
